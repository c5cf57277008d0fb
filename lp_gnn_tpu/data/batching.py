"""Static-shape padding / bucketing of bipartite graphs for XLA.

This replaces the reference's dynamic-shape PyG pipeline (MyToBipartite,
dataset.py:268-332 and NeighborLoader batches, train.py:102-116): every graph
is padded host-side to a *bucket* shape so jit-compiled device code compiles
once per bucket, not once per graph.

A ``PaddedGraph`` carries both edge orientations precomputed:

- ``(row_r, col_r, val_r)`` edges sorted by constraint (row)  -> used for
  aggregating variable features into constraints (out[i] = sum_j A_ij x_j)
- ``(row_c, col_c, val_c)`` edges sorted by variable (col)    -> used for the
  transpose direction (out[j] = sum_i A_ij x_i)

Sorted segment ids make ``jax.ops.segment_sum`` take the fast path
(``indices_are_sorted=True``), and the transpose aggregation needs no
atomics/scatter races — the TPU answer to torch_sparse's CSR/CSC dual
(reference arch.py:71-74 transpose trick).

Padding edges have val=0 and point at the last (padded) node of each side, so
they contribute nothing; padded nodes are excluded via ``cons_mask`` /
``vars_mask`` in losses, metrics and decoding.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax

from .dataset import BipartiteGraph


@partial(jax.tree_util.register_dataclass,
         data_fields=["row_r", "col_r", "val_r", "row_c", "col_c", "val_c",
                      "c_feas", "v_feas", "y_s", "y_t",
                      "cons_mask", "vars_mask", "ncons", "nvars", "nnz",
                      "s_bs", "t_bs",
                      "blkr_src", "blkr_dst", "blkr_val", "blkr_out",
                      "blkr_ptr",
                      "blkc_src", "blkc_dst", "blkc_val", "blkc_out",
                      "blkc_ptr", "in_agg_c", "in_agg_v",
                      "eperm_r", "eperm_c"],
         meta_fields=[])
@dataclasses.dataclass
class PaddedGraph:
    # edges sorted by row (constraint)
    row_r: np.ndarray      # (E,) int32
    col_r: np.ndarray      # (E,) int32
    val_r: np.ndarray      # (E,) float32
    # same edges sorted by col (variable)
    row_c: np.ndarray      # (E,) int32
    col_c: np.ndarray      # (E,) int32
    val_c: np.ndarray      # (E,) float32
    c_feas: np.ndarray     # (M, 8) float32
    v_feas: np.ndarray     # (N, 8) float32
    y_s: np.ndarray        # (M,) int32
    y_t: np.ndarray        # (N,) int32
    cons_mask: np.ndarray  # (M,) bool — True for real constraints
    vars_mask: np.ndarray  # (N,) bool — True for real variables
    ncons: np.ndarray      # () int32 actual m
    nvars: np.ndarray      # () int32 actual n
    nnz: np.ndarray        # () int32 actual edge count
    # seed-node counts for loss slicing on sampled subgraphs
    # (reference dataset.py:319-326); == ncons/nvars for full graphs
    s_bs: np.ndarray       # () int32
    t_bs: np.ndarray       # () int32
    # Chunked blocked edge layout for the MXU (one-hot einsum) SpMM path
    # (ops/spmm.py blocked_spmm): destination rows cut into BLOCK_R-row
    # blocks, each block's edges split into BLOCK_K-slot chunks; *_out maps
    # chunks to destination blocks (skew-proof). None disables the path.
    blkr_src: np.ndarray | None = None   # (B', K) int32 source (var) ids
    blkr_dst: np.ndarray | None = None   # (B', K) int32 local dst in [0,R)
    blkr_val: np.ndarray | None = None   # (B', K) float32
    blkr_out: np.ndarray | None = None   # (B',) int32 dst block id
    blkr_ptr: np.ndarray | None = None   # (M_pad/R + 1,) int32 chunk ranges
    blkc_src: np.ndarray | None = None   # (C', K) int32 source (cons) ids
    blkc_dst: np.ndarray | None = None   # (C', K) int32
    blkc_val: np.ndarray | None = None   # (C', K) float32
    blkc_out: np.ndarray | None = None   # (C',) int32
    blkc_ptr: np.ndarray | None = None   # (N_pad/R + 1,) int32
    # Precomputed input-layer aggregations (ops/spmm.py attach_input_agg):
    # the first conv's SpMM operates on the *raw node features*, which are
    # constant per graph — so A^T x_cons and A x_vars can be computed once
    # and reused every train/inference step (exact same math and gradients;
    # the input features receive no gradient, so no backward SpMM is lost).
    # This removes 2 of the 6 per-step edge traversals.
    in_agg_c: np.ndarray | None = None   # (M_pad, p) = A x_vars_feas
    in_agg_v: np.ndarray | None = None   # (N_pad, q) = A^T x_cons_feas
    # Permutations between the two edge orderings, for ops whose per-edge
    # messages are value-dependent (GEN softmax aggregation): a gather's
    # backward can then reorder edge-cotangents into the transpose ordering
    # and segment-sum over sorted source ids instead of emitting an unsorted
    # TPU scatter (ops/spmm.py gather_src). X_r = X_c[eperm_r] and
    # X_c = X_r[eperm_c] for any edge-aligned vector X.
    eperm_r: np.ndarray | None = None    # (E,) int32
    eperm_c: np.ndarray | None = None    # (E,) int32

    @property
    def m_pad(self) -> int:
        return self.c_feas.shape[0]

    @property
    def n_pad(self) -> int:
        return self.v_feas.shape[0]

    @property
    def e_pad(self) -> int:
        return self.row_r.shape[0]

    def bucket_key(self):
        return (self.m_pad, self.n_pad, self.e_pad)


def _round_up(x: int, mult: int) -> int:
    return ((max(x, 1) + mult - 1) // mult) * mult


BLOCK_R = 128    # dst rows per block (MXU tile height)
BLOCK_K = 512    # min edges per chunk (MXU contraction depth)
BLOCK_K_MAX = 1024   # on-chip sweep optimum (round 2, bench shape):
                     # 1024 -> 148.5M trav/s vs 2048 -> 139.3M (slot fill
                     # collapses: K=2048 pads the gather by ~33%) and
                     # 512 -> 146.6M (chunk count overhead)


def pick_block_k(e_pad: int, num_dst: int, R: int = BLOCK_R) -> int:
    """Chunk depth adapted to the bucket's mean edges-per-block: K grows
    (512 -> 2048) while blocks stay full. Derived from *padded* sizes only,
    so every graph in a bucket gets the same K (stable jit signatures)."""
    nblk = max(_round_up(num_dst, R) // R, 1)
    per_block = e_pad / nblk
    k = BLOCK_K
    while k < per_block and k < BLOCK_K_MAX:
        k *= 2
    return k


def block_layout(dst: np.ndarray, src: np.ndarray, val: np.ndarray,
                 num_dst: int, R: int = BLOCK_R, K: int = BLOCK_K):
    """Pack edges into the chunked per-dst-block layout for blocked_spmm.

    Each R-row destination block's edges are split into ceil(cnt/K) chunks of
    exactly K slots; ``out_blk`` maps every chunk back to its destination
    block, so skewed rows cost extra chunks instead of inflating K (padding
    waste is bounded by one chunk per block).

    Returns (blk_src (B',K), blk_dst (B',K), blk_val (B',K), out_blk (B',),
    n_blocks).

    The per-block loop is deliberate: it copies contiguous slices (memcpy),
    which measures ~4x faster at 10M edges than the "vectorized"
    fancy-indexed scatter equivalent (cache-hostile random 2-D writes).
    """
    nblk = _round_up(num_dst, R) // R
    if len(dst) == 0:
        z = np.zeros((nblk, K), np.int32)
        return (z, np.full((nblk, K), R - 1, np.int32),
                np.zeros((nblk, K), np.float32),
                np.arange(nblk, dtype=np.int32), nblk)
    blk_of = dst // R
    counts = np.bincount(blk_of, minlength=nblk)
    starts = np.zeros(nblk + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    chunks_per_blk = np.maximum((counts + K - 1) // K, 1)
    n_chunks = int(chunks_per_blk.sum())
    blk_src = np.zeros((n_chunks, K), np.int32)
    blk_dst = np.full((n_chunks, K), R - 1, np.int32)
    blk_val = np.zeros((n_chunks, K), np.float32)
    out_blk = np.zeros(n_chunks, np.int32)
    ci = 0
    for b in range(nblk):
        s, e = int(starts[b]), int(starts[b + 1])
        if s == e:
            out_blk[ci] = b
            ci += 1
            continue
        for cs in range(s, e, K):
            ce = min(cs + K, e)
            k = ce - cs
            blk_src[ci, :k] = src[cs:ce]
            blk_dst[ci, :k] = dst[cs:ce] - b * R
            blk_val[ci, :k] = val[cs:ce]
            out_blk[ci] = b
            ci += 1
    assert ci == n_chunks
    return blk_src, blk_dst, blk_val, out_blk, nblk


def make_buckets(base: int = 256, growth: float = 1.5, max_size: int = 1 << 28):
    """Geometric bucket sizes snapped to multiples of 128 (TPU lane width)."""
    sizes = []
    s = float(base)
    while s < max_size:
        sizes.append(_round_up(int(s), 128))
        s *= growth
    return sizes


_DEFAULT_BUCKETS = make_buckets()


def bucket_for(size: int, buckets=None) -> int:
    """Smallest bucket >= size."""
    buckets = buckets or _DEFAULT_BUCKETS
    for b in buckets:
        if b >= size:
            return b
    return _round_up(size, 128)


def pad_graph(g: BipartiteGraph, m_pad: int | None = None, n_pad: int | None = None,
              e_pad: int | None = None, buckets=None,
              s_bs: int | None = None, t_bs: int | None = None) -> PaddedGraph:
    """Pad a host graph to (bucketed) static shapes."""
    m, n, e = g.ncons, g.nvars, g.nnz
    m_pad = m_pad or bucket_for(m, buckets)
    n_pad = n_pad or bucket_for(n, buckets)
    e_pad = e_pad or bucket_for(e, buckets)
    assert m_pad >= m and n_pad >= n and e_pad >= e

    def pad_edges(row, col, val):
        pr = np.full(e_pad, m_pad - 1, dtype=np.int32)
        pc = np.full(e_pad, n_pad - 1, dtype=np.int32)
        pv = np.zeros(e_pad, dtype=np.float32)
        pr[:e], pc[:e], pv[:e] = row, col, val
        return pr, pc, pv

    order_r = np.lexsort((g.col, g.row))
    order_c = np.lexsort((g.row, g.col))
    row_r, col_r, val_r = pad_edges(g.row[order_r], g.col[order_r], g.val[order_r])
    row_c, col_c, val_c = pad_edges(g.row[order_c], g.col[order_c], g.val[order_c])

    # cross-ordering permutations (padding slots are identical in both
    # orderings, so they map to themselves)
    inv_r = np.empty(e, np.int64)
    inv_r[order_r] = np.arange(e)
    inv_c = np.empty(e, np.int64)
    inv_c[order_c] = np.arange(e)
    tail = np.arange(e, e_pad)
    eperm_r = np.concatenate([inv_c[order_r], tail]).astype(np.int32)
    eperm_c = np.concatenate([inv_r[order_c], tail]).astype(np.int32)

    def pad2(x, size, fill=0.0):
        out = np.full((size,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out

    blk_r = block_layout(row_r[:e] if e else row_r[:0],
                         col_r[:e] if e else col_r[:0],
                         val_r[:e] if e else val_r[:0], m_pad,
                         K=pick_block_k(e_pad, m_pad))
    blk_c = block_layout(col_c[:e] if e else col_c[:0],
                         row_c[:e] if e else row_c[:0],
                         val_c[:e] if e else val_c[:0], n_pad,
                         K=pick_block_k(e_pad, n_pad))
    return PaddedGraph(
        row_r=row_r, col_r=col_r, val_r=val_r,
        row_c=row_c, col_c=col_c, val_c=val_c,
        c_feas=pad2(g.c_feas, m_pad), v_feas=pad2(g.v_feas, n_pad),
        y_s=pad2(g.y_s.astype(np.int32), m_pad),
        y_t=pad2(g.y_t.astype(np.int32), n_pad),
        cons_mask=np.arange(m_pad) < m,
        vars_mask=np.arange(n_pad) < n,
        ncons=np.int32(m), nvars=np.int32(n), nnz=np.int32(e),
        s_bs=np.int32(m if s_bs is None else s_bs),
        t_bs=np.int32(n if t_bs is None else t_bs),
        blkr_src=blk_r[0], blkr_dst=blk_r[1], blkr_val=blk_r[2],
        blkr_out=blk_r[3], blkr_ptr=_chunk_ptr(blk_r[3], blk_r[4]),
        blkc_src=blk_c[0], blkc_dst=blk_c[1], blkc_val=blk_c[2],
        blkc_out=blk_c[3], blkc_ptr=_chunk_ptr(blk_c[3], blk_c[4]),
        eperm_r=eperm_r, eperm_c=eperm_c,
    )


def _chunk_ptr(blk_out: np.ndarray, num_blocks: int) -> np.ndarray:
    """Chunk ranges per destination block from the sorted blk_out table."""
    cnt = np.bincount(np.asarray(blk_out), minlength=num_blocks)
    ptr = np.zeros(num_blocks + 1, np.int32)
    np.cumsum(cnt, out=ptr[1:])
    return ptr


def strip_coo(pg: PaddedGraph) -> PaddedGraph:
    """Drop the plain COO edge arrays from a graph that carries the blocked
    layout — the blocked SpMM path (and its transpose VJP) never reads
    them, and at 10^8 edges the six arrays cost ~2.4 GB of HBM. The edge
    count stays recorded in ``nnz``. Only do this for device-resident
    training graphs; host-side consumers (partitioning, sampling, export)
    need the COO."""
    assert pg.blkr_src is not None and pg.blkc_src is not None
    z = np.zeros(1, np.int32)
    zf = np.zeros(1, np.float32)
    return dataclasses.replace(pg, row_r=z, col_r=z, val_r=zf,
                               row_c=z, col_c=z, val_c=zf,
                               eperm_r=None, eperm_c=None)
