"""Sparse bipartite aggregation ops: CSR/COO SpMM and SDDMM.

TPU-native replacement for torch_sparse's ``spmm`` (the fwd/bwd hot kernel
behind PyG ``GraphConv.propagate``, reference arch.py:65-81 via
torch_geometric; see SURVEY.md §2.2). Design:

- Edges live in COO sorted by destination, so aggregation is a *sorted*
  ``jax.ops.segment_sum`` — XLA's fast path, no atomics (TPU has none).
- The backward of "gather from src, segment-sum into dst" is exactly the
  transpose SpMM, which we compute with the *other* pre-sorted edge ordering
  (see data/batching.py) instead of scatter-adds — race-free by construction,
  mirroring how the reference keeps CSR and its transpose (arch.py:71-74).
- ``custom_vjp`` wires the pair together so autodiff never emits an
  unsorted scatter.

A fused Pallas kernel for the contraction was built, benchmarked, and
removed: the hot path is bound by the XLA row gather (~6.3 ns/row,
measured in scripts/probe_spmm.py / probe_vmem_gather*.py), which XLA
fuses with the val-multiply and one-hot contraction so messages never
touch HBM. A Pallas consumer forces that (E, D) message tensor through
HBM (Mosaic cannot lower an in-kernel dynamic table gather), costing a
measured ~8% end to end (bench.py: 128.2M vs 139.3M trav/s on the real
chip). The blocked-einsum path below sits within ~20% of the gather
floor; see RESULTS.md "SpMM roofline" for the full probe evidence.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def segment_spmm(dst, src, val, x, dst_sorted_of_transpose, num_dst):
    """out[d] = sum over edges e with dst[e]==d of val[e] * x[src[e]].

    Args:
      dst: (E,) int32 destination ids, sorted ascending.
      src: (E,) int32 source ids.
      val: (E,) float edge weights (A entries).
      x:   (S, D) source features.
      dst_sorted_of_transpose: tuple (t_dst, t_src, t_val) — the same edge set
        sorted by ``src`` (so the VJP is also a sorted segment-sum). ``t_dst``
        are source ids sorted ascending, ``t_src`` the matching destination
        ids, ``t_val`` the matching values.
      num_dst: static int — number of destination nodes (padded).
    Returns:
      (num_dst, D) aggregated features.
    """
    msg = x[src] * val[:, None].astype(x.dtype)
    return jax.ops.segment_sum(msg, dst, num_segments=num_dst,
                               indices_are_sorted=True)


def _segment_spmm_fwd(dst, src, val, x, tr, num_dst):
    out = segment_spmm(dst, src, val, x, tr, num_dst)
    return out, (tr, x.shape[0])


def _segment_spmm_bwd(num_dst, res, g):
    (t_dst, t_src, t_val), num_src = res
    # dL/dx[s] = sum over edges with src==s of val * g[dst]  == transpose SpMM
    dx = jax.ops.segment_sum(g[t_src] * t_val[:, None].astype(g.dtype),
                             t_dst, num_segments=num_src,
                             indices_are_sorted=True)
    return None, None, None, dx, None


segment_spmm.defvjp(_segment_spmm_fwd, _segment_spmm_bwd)


import os as _os


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def blocked_spmm(blk_src, blk_dst, blk_val, blk_out, x, transpose_blocks,
                 num_blocks):
    """Scatter-free SpMM on the MXU via chunked one-hot contraction.

    The destination axis is pre-cut into blocks of R=128 rows, each block's
    edges split into K-slot chunks (data/batching.py block_layout). Per
    chunk, the K messages are contracted against a (K, R) one-hot matrix
    built on the fly — a batched matmul XLA maps straight onto the MXU —
    then chunk partials are combined per destination block with a cheap
    sorted segment-sum over B' chunks. No TPU scatter-adds on the edge axis.
    This is the framework's replacement for torch_sparse spmm
    (SURVEY.md §2.2); it spends E*R*D extra MACs to buy matrix-unit
    throughput instead of scatter serialization.

    Args:
      blk_src: (B', K) int32 source-node ids per chunk.
      blk_dst: (B', K) int32 local destination row in [0, R).
      blk_val: (B', K) float edge values (0 = padding).
      blk_out: (B',) int32 destination block of each chunk (sorted).
      x:       (S, D) source features.
      transpose_blocks: (t_src, t_dst, t_val, t_out) for the VJP.
      num_blocks: static int — number of destination blocks.
    Returns: (num_blocks*R, D).
    """
    R = 128
    Bp, K = blk_src.shape
    D = x.shape[-1]
    budget = int(_os.environ.get("LP_GNN_SPMM_BUDGET", 2 << 30))
    if Bp * K * D * 4 > budget:
        return _blocked_spmm_scan(blk_src, blk_dst, blk_val, blk_out, x,
                                  num_blocks, budget)
    msg = x[blk_src] * blk_val[..., None].astype(x.dtype)      # (B', K, D)
    onehot = (blk_dst[..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)).astype(x.dtype)
    part = jnp.einsum("bkr,bkd->brd", onehot, msg,
                      preferred_element_type=jnp.float32)      # (B', R, D)
    out = jax.ops.segment_sum(part, blk_out, num_segments=num_blocks,
                              indices_are_sorted=True)
    return out.reshape(-1, x.shape[-1]).astype(x.dtype)


def _blocked_spmm_scan(blk_src, blk_dst, blk_val, blk_out, x, num_blocks,
                       budget):
    """HBM-streaming blocked SpMM: lax.scan over chunk slices so peak memory
    stays within ``budget`` regardless of edge count (enables 10M+-edge
    full-graph execution on one chip). Each scan step gathers one slice of
    chunks, contracts on the MXU, and accumulates into the output at the
    slice's (contiguous, sorted) destination-block range via dynamic slices
    — no full-size partials are ever materialized."""
    R = 128
    x = jnp.asarray(x)
    Bp, K = blk_src.shape
    D = x.shape[-1]
    slice_chunks = max(int(budget // (K * D * 4 * 4)), 8)
    n_slices = -(-Bp // slice_chunks)
    pad_to = n_slices * slice_chunks
    pad = pad_to - Bp

    def padc(a, fill):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    src = padc(blk_src, 0).reshape(n_slices, slice_chunks, K)
    dst = padc(blk_dst, R - 1).reshape(n_slices, slice_chunks, K)
    val = padc(blk_val, 0.0).reshape(n_slices, slice_chunks, K)
    outb = padc(blk_out, num_blocks - 1).reshape(n_slices, slice_chunks)

    # out padded with slice_chunks+1 spill blocks for border dynamic slices
    out0 = jnp.zeros((num_blocks + slice_chunks + 1, R, D), jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)

    def step(out, sl):
        s_src, s_dst, s_val, s_out = sl
        msg = x[s_src] * s_val[..., None].astype(x.dtype)
        onehot = (s_dst[..., None] == iota_r).astype(x.dtype)
        part = jnp.einsum("bkr,bkd->brd", onehot, msg,
                          preferred_element_type=jnp.float32)
        b0 = s_out[0]
        local = jax.ops.segment_sum(part.astype(jnp.float32), s_out - b0,
                                    num_segments=slice_chunks + 1,
                                    indices_are_sorted=True)
        cur = jax.lax.dynamic_slice(out, (b0, 0, 0),
                                    (slice_chunks + 1, R, D))
        out = jax.lax.dynamic_update_slice(out, cur + local, (b0, 0, 0))
        return out, None

    out, _ = jax.lax.scan(step, out0, (src, dst, val, outb))
    return out[:num_blocks].reshape(-1, D).astype(x.dtype)


def _blocked_spmm_fwd(blk_src, blk_dst, blk_val, blk_out, x, tr, num_blocks):
    out = blocked_spmm(blk_src, blk_dst, blk_val, blk_out, x, tr, num_blocks)
    return out, (tr, x.shape[0])


def _blocked_spmm_bwd(num_blocks, res, g):
    (t_src, t_dst, t_val, t_out), num_src = res
    t_blocks = -(-num_src // 128)
    dx = blocked_spmm(t_src, t_dst, t_val, t_out, g, None, t_blocks)[:num_src]
    return None, None, None, None, dx, None


blocked_spmm.defvjp(_blocked_spmm_fwd, _blocked_spmm_bwd)


def _blocked_call(pg, x, side):
    """Dispatch one SpMM direction through the blocked-einsum path.

    side='c2v': dst = vars (blkc layout); side='v2c': dst = cons (blkr)."""
    if side == "c2v":
        own = (pg.blkc_src, pg.blkc_dst, pg.blkc_val, pg.blkc_out)
        tr = (pg.blkr_src, pg.blkr_dst, pg.blkr_val, pg.blkr_out)
        n_out = pg.v_feas.shape[0]
    else:
        own = (pg.blkr_src, pg.blkr_dst, pg.blkr_val, pg.blkr_out)
        tr = (pg.blkc_src, pg.blkc_dst, pg.blkc_val, pg.blkc_out)
        n_out = pg.c_feas.shape[0]
    # ceil-div: block layouts are built with ceil(num_dst/128) blocks
    # (data/batching.py block_layout), and pad_graph accepts node pads that
    # are not 128-multiples — a floor here would silently drop the last
    # partial destination block
    nblk = -(-n_out // 128)
    out = blocked_spmm(own[0], own[1], own[2], own[3], x, tr, nblk)
    return out[:n_out]


def spmm_cons_to_vars(pg, x_cons):
    """out[j] = sum_i A_ij * x_cons[i]  — (N_pad, D).

    Uses the blocked MXU path when the graph carries a block layout,
    else the sorted segment-sum path."""
    if getattr(pg, "blkc_src", None) is not None and \
            getattr(pg, "blkr_src", None) is not None:
        return _blocked_call(pg, x_cons, "c2v")
    tr = (pg.row_r, pg.col_r, pg.val_r)
    return segment_spmm(pg.col_c, pg.row_c, pg.val_c, x_cons, tr,
                        pg.v_feas.shape[0])


def spmm_vars_to_cons(pg, x_vars):
    """out[i] = sum_j A_ij * x_vars[j]  — (M_pad, D)."""
    if getattr(pg, "blkr_src", None) is not None and \
            getattr(pg, "blkc_src", None) is not None:
        return _blocked_call(pg, x_vars, "v2c")
    tr = (pg.col_c, pg.row_c, pg.val_c)
    return segment_spmm(pg.row_r, pg.col_r, pg.val_r, x_vars, tr,
                        pg.c_feas.shape[0])


def bidir_spmm(pg, x_cons, x_vars):
    """Both directions of the two-tower aggregation in one call."""
    return spmm_vars_to_cons(pg, x_vars), spmm_cons_to_vars(pg, x_cons)


def attach_input_agg(pg, dtype=jnp.float32):
    """Precompute the input layer's aggregations once per graph.

    The first conv of every model aggregates the *raw node features*
    (reference arch.py:179-185: conv1 consumes the 8-dim features), which
    are constants of the graph — so ``A x_vars_feas`` and ``A^T x_cons_feas``
    never change across steps or epochs. Computing them once here (in the
    model's compute dtype, so the result is bit-identical to what the conv
    would produce) removes two full edge traversals from every train and
    inference step; the inputs receive no gradient, so backward is
    unaffected. Call after ``jax.device_put`` so the SpMMs run on-device.
    """
    import dataclasses
    xl = pg.c_feas.astype(dtype)
    xr = pg.v_feas.astype(dtype)
    agg_v = spmm_cons_to_vars(pg, xl)     # (N_pad, p) into variables
    agg_c = spmm_vars_to_cons(pg, xr)     # (M_pad, q) into constraints
    return dataclasses.replace(pg, in_agg_c=agg_c, in_agg_v=agg_v)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_src(x, src_ids, t_seg, perm_to_t, num_src):
    """``x[src_ids]`` with a transpose-ordered backward.

    For per-edge messages that are *functions* of the gathered features
    (e.g. GEN's relu(x_src + e), models/gen.py) the plain gather's autodiff
    backward is an unsorted TPU scatter-add over ``src_ids``. This wrapper
    instead permutes the edge cotangent into the transpose edge ordering
    (``perm_to_t``, precomputed host-side in data/batching.py pad_graph) and
    segment-sums over the *sorted* source ids ``t_seg`` — the same
    race-free dual-ordering trick segment_spmm uses for its VJP.

    Args:
      x: (S, D) source features.
      src_ids: (E,) source id per edge, in this direction's edge ordering.
      t_seg: (E,) the same edges' source ids in the transpose ordering
        (sorted ascending).
      perm_to_t: (E,) permutation with Y_t = Y[perm_to_t] for any
        edge-aligned Y.
      num_src: static int — S.
    """
    return x[src_ids]


def _gather_src_fwd(x, src_ids, t_seg, perm_to_t, num_src):
    return x[src_ids], (t_seg, perm_to_t)


def _gather_src_bwd(num_src, res, g):
    t_seg, perm_to_t = res
    dx = jax.ops.segment_sum(g[perm_to_t], t_seg, num_segments=num_src,
                             indices_are_sorted=True)
    return dx, None, None, None


gather_src.defvjp(_gather_src_fwd, _gather_src_bwd)


def sddmm(row, col, x_cons, x_vars):
    """Sampled dense-dense matmul: per-edge <x_cons[row], x_vars[col]>.

    The edge-value gradient primitive (SURVEY.md §2.2): if loss depends on
    SpMM with learnable edge weights, dval = sddmm(row, col, grad_out, x_src).
    """
    return jnp.sum(x_cons[row] * x_vars[col], axis=-1)
