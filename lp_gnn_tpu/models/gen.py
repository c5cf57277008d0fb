"""GENConv-equivalent two-direction layer (reference arch.py:84-105 with the
monkeypatched forward at arch.py:11-48).

Per direction (GENConv, aggr='softmax', learn_t, num_layers=2, norm='layer',
edge_dim=1), matching PyG GENConv's dimension plumbing: when the source /
destination width differs from the output width, optional ``lin_src`` /
``lin_dst`` projections map into output space first (the reference
monkeypatch honors exactly these optional projections, arch.py:17-18,39-44),
so messages and the MLP always live in out-channel space:

    x_s   = lin_src(x_src)   if d_src != d_out
    x_d   = lin_dst(x_dst)   if d_dst != d_out
    e     = W_e * a_ij + b_e                      (edge encoder, 1 -> d_out)
    msg_j = relu(x_s_j + e) + 1e-7
    alpha = segment_softmax(t * msg)              (channel-wise, learnable t)
    aggr  = sum_j alpha_j * msg_j                 (padding edges excluded)
    out   = MLP([d_out, 2*d_out, d_out])(aggr + x_d)

Segment softmax is computed with sorted segment max/sum — the TPU-safe
replacement for torch_scatter's softmax aggregation (SURVEY.md §2.2).
Padding edges are masked out positionally (first ``nnz`` slots are real,
data/batching.py): unlike the value-weighted SpMM, GEN's message is nonzero
for val=0 edges, so without the mask a full bucket's last real node would
absorb fake messages. The feature gather goes through ops/spmm.py
``gather_src`` so the backward reuses the transpose edge ordering instead
of an unsorted TPU scatter (CLAUDE.md convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import linear_init, linear_apply, layer_norm_init, layer_norm_apply
from ..ops.spmm import gather_src

EPS = 1e-7


def _segment_softmax_agg(logits, values, seg, num_seg, emask):
    """sum_e softmax_within_segment(logits)[e] * values[e], channel-wise.
    Edges with ``emask`` False contribute to neither the denominator nor
    the aggregate.

    Two r05 levers on the HBM-pass-bound GEN step (VERDICT r04 item 1):
    the edge-space streams run in the INPUT dtype (bf16 at bench tier —
    the max-subtracted ``ex`` is bounded in [0, 1], so bf16's ~2^-8
    relative element error is benign; accumulation below is fp32), and the
    ``num``/``den`` segment-sums are fused into ONE pass over stacked
    values (den is constant within a segment, so the divide happens after
    aggregating — r04's divide-after rewrite — and both sums read the same
    ``ex`` stream, so one (E, 2D) scatter replaces two (E, D) ones)."""
    em = emask[:, None]
    ninf = jnp.array(-jnp.inf, logits.dtype)
    import os
    if os.environ.get("LP_GNN_GEN_MAX", "seg") == "global":
        # r5 probe finding (scripts/probe_gen_floor.py): the per-segment
        # max is a full sorted-scatter pass (~12.9 ms at bench shapes,
        # ~40 GB/s-equivalent) whose ONLY role is numeric range control —
        # softmax is shift-invariant, so any constant shared by a
        # segment's edges yields the IDENTICAL aggregate in exact
        # arithmetic. A per-channel GLOBAL max is such a constant and
        # costs one stream reduce (~0.6 ms, 948 GB/s). Underflow safety is
        # unchanged vs fp32: bf16 carries fp32's 8-bit exponent, so
        # exp(logits - gmax) underflows only past a ~87-unit logit spread
        # within one segment — far beyond the layer-normed, eps-floored
        # GEN message range (models/gen.py gen_dir_apply). Default stays
        # "seg" because the distributed softmax twins
        # (parallel/edge_partition.py) combine per-OWNER maxes and the
        # dist-vs-single-chip parity suite asserts bitwise agreement;
        # bench.py opts GEN archs into "global" (disclosed in its JSON).
        mx = jnp.max(jnp.where(em, logits, ninf), axis=0)
        mx = jnp.where(jnp.isfinite(mx), mx, jnp.zeros((), logits.dtype))
        mx = jax.lax.stop_gradient(mx)
        ex = jnp.where(em, jnp.exp(logits - mx[None, :]),
                       jnp.zeros((), logits.dtype))
    else:
        mx = jax.ops.segment_max(jnp.where(em, logits, ninf), seg,
                                 num_segments=num_seg,
                                 indices_are_sorted=True)
        mx = jnp.where(jnp.isfinite(mx), mx, jnp.zeros((), logits.dtype))
        # the max shift cancels exactly in the softmax (per-segment alphas
        # sum to 1), so its gradient is identically zero — stop it
        # explicitly, as jax.nn.softmax does (also what makes the
        # distributed pmax analog differentiable,
        # parallel/edge_partition.py)
        mx = jax.lax.stop_gradient(mx)
        ex = jnp.where(em, jnp.exp(logits - mx[seg]),
                       jnp.zeros((), logits.dtype))
    if os.environ.get("LP_GNN_GEN_FUSE", "1") == "1":
        # fp32 ACCUMULATION over the low-precision edge stream: the cast is
        # element-wise and fuses into the scatter's operand, so HBM still
        # only carries the input-dtype tensors. LP_GNN_GEN_ACC=input keeps
        # the accumulator in the input dtype too (probe knob: measures how
        # much of the step the fp32 accumulate/cotangent width costs).
        acc = (logits.dtype if os.environ.get("LP_GNN_GEN_ACC", "") == "input"
               else jnp.float32)
        stacked = jnp.concatenate([ex * values, ex], axis=1).astype(acc)
        s = jax.ops.segment_sum(stacked, seg, num_segments=num_seg,
                                indices_are_sorted=True).astype(jnp.float32)
        d = values.shape[1]
        return s[:, :d] / jnp.maximum(s[:, d:], 1e-16)
    num = jax.ops.segment_sum((ex * values).astype(jnp.float32), seg,
                              num_segments=num_seg, indices_are_sorted=True)
    den = jax.ops.segment_sum(ex.astype(jnp.float32), seg,
                              num_segments=num_seg, indices_are_sorted=True)
    return num / jnp.maximum(den, 1e-16)


def gen_dir_init(key, d_src: int, d_dst: int, d_out: int):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = {
        "edge": linear_init(k1, 1, d_out, bias=True),
        "t": jnp.ones((), jnp.float32),
        "mlp": {
            "l1": linear_init(k2, d_out, 2 * d_out, bias=True),
            "ln": layer_norm_init(2 * d_out),
            "l2": linear_init(k3, 2 * d_out, d_out, bias=True),
        },
    }
    if d_src != d_out:
        p["lin_src"] = linear_init(k4, d_src, d_out, bias=True)
    if d_dst != d_out:
        p["lin_dst"] = linear_init(k5, d_dst, d_out, bias=True)
    return p


def gen_dir_apply(p, src_ids, dst_ids, val, x_src, x_dst, num_dst, nnz,
                  t_seg, perm_to_t, num_src):
    """One GENConv direction over edges (sorted by dst). ``t_seg`` /
    ``perm_to_t`` describe the transpose edge ordering for the gather's
    backward (ops/spmm.py gather_src); ``nnz`` masks padding edges."""
    if "lin_src" in p:
        x_src = linear_apply(p["lin_src"], x_src)
    if "lin_dst" in p:
        x_dst = linear_apply(p["lin_dst"], x_dst)
    e = linear_apply(p["edge"], val[:, None].astype(x_src.dtype))
    xs = gather_src(x_src, src_ids, t_seg, perm_to_t, num_src)
    msg = jax.nn.relu(xs + e) + EPS
    emask = jnp.arange(val.shape[0]) < nnz
    # edge streams stay in the model dtype (bf16 at bench tier); only the
    # segment-sum accumulation inside _segment_softmax_agg is fp32 — the
    # reference's fp16-NaN guard concerns decode softmax over raw logits,
    # not this max-subtracted, [0,1]-bounded stream (arch.py:84-105)
    t = p["t"].astype(msg.dtype)
    aggr = _segment_softmax_agg(msg * t, msg, dst_ids, num_dst, emask)
    h = aggr.astype(x_dst.dtype) + x_dst
    h = linear_apply(p["mlp"]["l1"], h)
    h = layer_norm_apply(p["mlp"]["ln"], h)
    h = jax.nn.relu(h)
    return linear_apply(p["mlp"]["l2"], h)


def gen_bidir_init(key, left_dim: int, right_dim: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {"l2r": gen_dir_init(k1, left_dim, right_dim, out_dim),
            "r2l": gen_dir_init(k2, right_dim, left_dim, out_dim)}


def gen_bidir_apply(p, pg, left, right):
    n_pad = pg.v_feas.shape[0]
    m_pad = pg.c_feas.shape[0]
    # l2r: edges in col-sorted order (dst = vars); transpose ordering is the
    # row-sorted set, whose source ids row_r are ascending
    right_updated = gen_dir_apply(p["l2r"], pg.row_c, pg.col_c, pg.val_c,
                                  left, right, n_pad, pg.nnz,
                                  pg.row_r, pg.eperm_r, m_pad)
    left_updated = gen_dir_apply(p["r2l"], pg.col_r, pg.row_r, pg.val_r,
                                 right, left, m_pad, pg.nnz,
                                 pg.col_c, pg.eperm_c, n_pad)
    return left_updated, right_updated
