"""Edge-partitioned execution of one large bipartite graph across a mesh.

The flagship distributed feature (SURVEY.md §2.3): where the reference
handles graphs too big for one device by neighbor-sampled minibatching
(train.py:111-116), the TPU build executes the FULL graph across chips:

- Constraint rows are range-partitioned into D blocks; each shard owns its
  rows, their features, and *all edges incident to them* (1D row partition
  of A). Variable features are likewise block-sharded.
- Per bidirectional layer the collective pattern is the classic
  all-gather / reduce-scatter decomposition of row-partitioned SpMM:

      right_full = all_gather(right_local)          # vars for local gathers
      left_new   = W (segsum_rows A_d right_full) + ...   # no comm, sharded
      part       = segsum_cols A_d^T left_local           # (N,) partials
      agg_v      = psum_scatter(part)               # summed var block
      right_new  = W agg_v + ...                    # sharded linears

  XLA lowers all_gather/psum_scatter onto ICI rings; dense linears run
  D-way parallel on both sides.
- ``halo=True`` replaces both full-width collectives with **boundary
  halo exchange** (the SURVEY.md §2.3 flagship): each shard receives only
  the variable rows its own edges reference (host-precomputed per-pair
  send lists, one ``all_to_all``), runs the same blocked SpMMs against the
  compact halo buffer, and routes the transpose partial sums back with a
  second ``all_to_all`` + sorted segment-sum. Per shard per layer the wire
  volume drops from 2·N_pad·F (all_gather + psum_scatter) to 2·H·F where
  H = padded halo size — on banded LPs (mirp's time-period structure)
  H ≪ N_pad. ``halo_gather``/``halo_reduce`` are exact mutual transposes
  wired as each other's custom VJP, so the backward pass is scatter-free
  and the gradients stay bit-comparable to the all-gather path.
- Every parameter path touches shard-local tensors exactly once, so the
  exact global gradient is ``psum`` of per-shard grads — no replicated
  compute, no double counting.
- The loss is computed from psum-reduced global sums (counts, weighted CE),
  making it bit-equivalent to the single-chip ``balanced`` loss.

Both shard-local edge orderings are precomputed host-side (row-sorted for
the local direction, col-sorted for the partial-sum direction) so every
``segment_sum`` stays on the sorted fast path — the distributed analog of
data/batching.py's dual ordering.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..data.batching import PaddedGraph, _round_up
from ..models.layers import linear_apply, add_knowledge, dropout

SHARD_FIELDS = ["row_r", "col_r", "val_r", "row_c", "col_c", "val_c",
                "c_feas", "y_s", "cons_mask", "v_feas", "y_t", "vars_mask",
                "nnz_s", "eperm_r", "eperm_c",
                "blkr_src", "blkr_dst", "blkr_val", "blkr_out",
                "blkc_src", "blkc_dst", "blkc_val", "blkc_out",
                "halo_send", "halo_perm", "halo_ids",
                "hcol_r", "hseg", "hrow", "hval", "eperm_r2h", "eperm_h2r",
                "blkl_r_src", "blkl_r_dst", "blkl_r_val", "blkl_r_out",
                "blkl_c_src", "blkl_c_dst", "blkl_c_val", "blkl_c_out",
                "blkh_r_src", "blkh_r_dst", "blkh_r_val", "blkh_r_out",
                "blkh_c_src", "blkh_c_dst", "blkh_c_val", "blkh_c_out",
                "in_agg_c", "in_agg_v"]


@partial(jax.tree_util.register_dataclass,
         data_fields=SHARD_FIELDS, meta_fields=["n_shards"])
@dataclasses.dataclass
class PartitionedGraph:
    """Edge-partitioned padded graph. Leading axis = shard."""
    # per-shard edges, row-sorted; row ids LOCAL to the shard's row block,
    # col ids GLOBAL (used to gather from the all-gathered var features)
    row_r: np.ndarray      # (D, Es) int32
    col_r: np.ndarray      # (D, Es) int32
    val_r: np.ndarray      # (D, Es) float32
    # the same edges col-sorted (row local, col global)
    row_c: np.ndarray      # (D, Es)
    col_c: np.ndarray      # (D, Es)
    val_c: np.ndarray      # (D, Es)
    c_feas: np.ndarray     # (D, Ms, 8)
    y_s: np.ndarray        # (D, Ms)
    cons_mask: np.ndarray  # (D, Ms)
    v_feas: np.ndarray     # (D, Ns, 8)
    y_t: np.ndarray        # (D, Ns)
    vars_mask: np.ndarray  # (D, Ns)
    # per-shard real edge count (padding edges are positional: the first
    # nnz_s slots of both orderings are real) and the permutations between
    # the two orderings (X_r = X_c[eperm_r], X_c = X_r[eperm_c]) — the
    # distributed GEN layer's edge mask and scatter-free gather backward
    nnz_s: np.ndarray | None = None      # (D,) int32
    eperm_r: np.ndarray | None = None    # (D, Es) int32
    eperm_c: np.ndarray | None = None    # (D, Es) int32
    # per-shard chunked block layouts for the MXU SpMM path
    # (data/batching.py block_layout semantics, chunk counts padded equal
    # across shards): blkr = dst local cons rows / src global vars;
    # blkc = dst global vars / src local cons rows
    blkr_src: np.ndarray | None = None   # (D, B1, K)
    blkr_dst: np.ndarray | None = None
    blkr_val: np.ndarray | None = None
    blkr_out: np.ndarray | None = None   # (D, B1)
    blkc_src: np.ndarray | None = None   # (D, B2, K)
    blkc_dst: np.ndarray | None = None
    blkc_val: np.ndarray | None = None
    blkc_out: np.ndarray | None = None
    # halo exchange (partition_graph(halo=True)): per-pair send lists, the
    # shard-local (own-block, zero-comm) layouts blkl_*, and the compact
    # off-diagonal halo layouts blkh_* — together replacing blkr/blkc
    halo_send: np.ndarray | None = None  # (D, D, Bh) int32 local var rows
    halo_perm: np.ndarray | None = None  # (D, D*Bh) int32 sort perm
    halo_ids: np.ndarray | None = None   # (D, D*Bh) int32 sorted local ids
    # GEN halo: per-edge compact indices into [local (ns); halo slots (nh)]
    hcol_r: np.ndarray | None = None     # (D, Es) int32, row-sorted order
    hseg: np.ndarray | None = None       # (D, Es) int32 sorted compact ids
    hrow: np.ndarray | None = None       # (D, Es) int32 local cons, h-order
    hval: np.ndarray | None = None       # (D, Es) float32, h-order
    eperm_r2h: np.ndarray | None = None  # (D, Es) Y_h = Y_r[eperm_r2h]
    eperm_h2r: np.ndarray | None = None  # (D, Es) Y_r = Y_h[eperm_h2r]
    blkl_r_src: np.ndarray | None = None  # dst local cons / src LOCAL var
    blkl_r_dst: np.ndarray | None = None
    blkl_r_val: np.ndarray | None = None
    blkl_r_out: np.ndarray | None = None
    blkl_c_src: np.ndarray | None = None  # dst LOCAL var / src local cons
    blkl_c_dst: np.ndarray | None = None
    blkl_c_val: np.ndarray | None = None
    blkl_c_out: np.ndarray | None = None
    blkh_r_src: np.ndarray | None = None  # dst local cons / src halo slot
    blkh_r_dst: np.ndarray | None = None
    blkh_r_val: np.ndarray | None = None
    blkh_r_out: np.ndarray | None = None
    blkh_c_src: np.ndarray | None = None  # dst halo slot / src local cons
    blkh_c_dst: np.ndarray | None = None
    blkh_c_val: np.ndarray | None = None
    blkh_c_out: np.ndarray | None = None
    # precomputed input-conv aggregations (attach_dist_input_agg): the raw
    # node features are per-graph constants, so the input conv's
    # all_gather + both SpMMs + psum_scatter can run once, not every step
    in_agg_c: np.ndarray | None = None   # (D, Ms, 8)
    in_agg_v: np.ndarray | None = None   # (D, Ns, 8)
    n_shards: int = 1

    @property
    def ms(self) -> int:
        return self.c_feas.shape[-2]

    @property
    def ns(self) -> int:
        return self.v_feas.shape[-2]

    @property
    def n_pad(self) -> int:
        return self.ns * self.n_shards


def _shard_sizes(pg: PaddedGraph, n_shards: int) -> tuple[int, int]:
    """Per-shard row/var block sizes, rounded to the 128-row MXU block so
    the blocked SpMM path applies shard-locally.

    Sized from the REAL node counts, not the bucket-padded shapes: bucket
    padding (up to 50% per axis) would otherwise skew the cut points away
    from the graph's structure — on banded LPs that misalignment alone
    inflates the boundary sets by whole blocks. Rows beyond D*ms are
    guaranteed padding (no nonzero edges) and are simply dropped."""
    ms = _round_up(-(-int(pg.ncons) // n_shards), 128)
    ns = _round_up(-(-int(pg.nvars) // n_shards), 128)
    return ms, ns


def compute_halo_width(pg: PaddedGraph, n_shards: int, ms: int | None = None,
                       ns: int | None = None) -> int:
    """Max boundary-set size over all (requester, owner) shard pairs —
    the padded per-pair halo width Bh for ``partition_graph(halo=True)``.
    Exposed so a batch of graphs can share one width (partition_batch).
    ``ms``/``ns`` must match the sizes the partition will be built with."""
    ms0, ns0 = _shard_sizes(pg, n_shards)
    ms, ns = ms or ms0, ns or ns0
    row = np.asarray(pg.row_r)
    col = np.asarray(pg.col_r)
    val = np.asarray(pg.val_r)
    # one pass over the edge list instead of D^2 per-pair masks+uniques:
    # encode each off-diagonal edge as (requester d, owner e, owned col) and
    # count distinct columns per (d, e) with a single sort (r04 item 5 —
    # the per-pair loop was O(D^2 * E) and minutes at 10^8 edges)
    valid = (val != 0) & (row < n_shards * ms) & (col < n_shards * ns)
    d = row[valid] // ms
    c = col[valid]
    e = c // ns
    off = d != e
    key = ((d[off] * n_shards + e[off]).astype(np.int64) * (n_shards * ns)
           + c[off])
    uk = np.unique(key)
    if len(uk) == 0:
        return _round_up(1, 8)
    cnt = np.bincount(uk // (n_shards * ns),
                      minlength=n_shards * n_shards)
    return _round_up(max(int(cnt.max()), 1), 8)


def partition_graph(pg: PaddedGraph, n_shards: int, halo: bool = False,
                    halo_width: int | None = None, ms: int | None = None,
                    ns: int | None = None) -> PartitionedGraph:
    """Host-side 1D row partition of a padded graph into ``n_shards``.

    ``halo=True`` additionally precomputes the boundary halo exchange
    (SURVEY.md §2.3 flagship): per-pair send lists ``halo_send[d, e]`` =
    local var rows shard ``d`` sends to shard ``e`` (= the vars of ``d``
    that ``e``'s edges reference), the sorted reduce permutation
    ``halo_perm``/``halo_ids``, and compact-halo block layouts ``blkh_*``
    whose var axis is halo slots ``owner*Bh + rank`` instead of the full
    global var axis. Per layer the wire volume drops from 2*N_pad*F
    (all_gather + psum_scatter) to 2*D*Bh*F.
    """
    ms0, ns0 = _shard_sizes(pg, n_shards)
    ms = ms or ms0
    ns = ns or ns0
    assert ms * n_shards >= int(pg.ncons) and ns * n_shards >= int(pg.nvars)
    n_pad = ns * n_shards
    row = np.asarray(pg.row_r)
    col = np.asarray(pg.col_r)
    val = np.asarray(pg.val_r)
    shards = []
    es = 1
    for d in range(n_shards):
        lo, hi = d * ms, (d + 1) * ms
        sel = (row >= lo) & (row < hi) & (val != 0)
        shards.append((row[sel], col[sel], val[sel]))
        es = max(es, int(sel.sum()))
    es = _round_up(es, 128)

    def pack(r, c, v, lo):
        rr = np.full(es, ms - 1, np.int32)
        cc = np.full(es, n_pad - 1, np.int32)
        vv = np.zeros(es, np.float32)
        k = len(r)
        rr[:k] = r - lo
        cc[:k] = c
        vv[:k] = v
        return rr, cc, vv

    def shard_nodes(x, per, fill=0):
        tot = per * n_shards
        out = np.full((tot,) + x.shape[1:], fill, dtype=x.dtype)
        k = min(x.shape[0], tot)   # rows beyond tot are bucket padding
        out[:k] = x[:k]
        return out.reshape(n_shards, per, *x.shape[1:])

    R_r, C_r, V_r, R_c, C_c, V_c = [], [], [], [], [], []
    EP_r, EP_c, NNZ = [], [], []
    for d, (r, c, v) in enumerate(shards):
        lo = d * ms
        k = len(r)
        o1 = np.lexsort((c, r))
        rr, cc, vv = pack(r[o1], c[o1], v[o1], lo)
        R_r.append(rr), C_r.append(cc), V_r.append(vv)
        o2 = np.lexsort((r, c))
        rr, cc, vv = pack(r[o2], c[o2], v[o2], lo)
        R_c.append(rr), C_c.append(cc), V_c.append(vv)
        # cross-ordering permutations (both orderings place real edges in
        # the first k slots, so padding maps to itself)
        inv1 = np.empty(k, np.int64)
        inv1[o1] = np.arange(k)
        inv2 = np.empty(k, np.int64)
        inv2[o2] = np.arange(k)
        tail = np.arange(k, es)
        EP_r.append(np.concatenate([inv2[o1], tail]).astype(np.int32))
        EP_c.append(np.concatenate([inv1[o2], tail]).astype(np.int32))
        NNZ.append(np.int32(k))

    # per-shard blocked layouts (equalize chunk counts by padding with
    # no-op chunks aimed at the last block)
    from ..data.batching import block_layout

    def stacked_blocks(edge_lists, num_dst):
        """edge_lists: per-shard (dst, src, val) with dst in [0, num_dst)."""
        outs = []
        for dst, src, v in edge_lists:
            o = np.argsort(dst, kind="stable")
            outs.append(block_layout(dst[o], src[o].astype(np.int32),
                                     v[o].astype(np.float32), num_dst))
        bmax = max(o[0].shape[0] for o in outs)
        nblk = outs[0][4]

        def padb(a, fill):
            out = np.full((bmax,) + a.shape[1:], fill, dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        return (np.stack([padb(o[0], 0) for o in outs]),
                np.stack([padb(o[1], 127) for o in outs]),
                np.stack([padb(o[2], 0.0) for o in outs]),
                np.stack([padb(o[3], nblk - 1) for o in outs]))

    blkr = stacked_blocks([(r - d * ms, c, v)
                           for d, (r, c, v) in enumerate(shards)], ms)
    blkc = stacked_blocks([(c, r - d * ms, v)
                           for d, (r, c, v) in enumerate(shards)], n_pad)

    halo_fields = {}
    if halo:
        # boundary lists B[d][e]: sorted unique local var ids (in shard e's
        # block) referenced by shard d's edges. The diagonal stays empty:
        # own-block edges run against right_local with zero communication
        # (blkl_* layouts below), so the halo carries only true boundary
        # columns. Built with ONE sort over the off-diagonal edges (encode
        # (d, e, local col) into a scalar key, np.unique, split by pair)
        # instead of D^2 per-pair np.unique calls, and each edge's rank in
        # its boundary list falls out of the same unique() — r04 item 5
        # (the per-pair loops dominated partition time at 10^7+ edges).
        lens = [len(c) for (_, c, _) in shards]
        ds_all = np.repeat(np.arange(n_shards), lens)
        cs_all = (np.concatenate([c for (_, c, _) in shards])
                  if sum(lens) else np.zeros(0, np.int64))
        owner_all = (cs_all // ns).astype(np.int64)
        offmask = owner_all != ds_all
        pair_off = ds_all[offmask] * n_shards + owner_all[offmask]
        cloc_off = cs_all[offmask] - owner_all[offmask] * ns
        key = pair_off.astype(np.int64) * ns + cloc_off
        uk, inv = np.unique(key, return_inverse=True)
        pair_u = uk // ns
        counts = np.bincount(pair_u, minlength=n_shards * n_shards)
        starts = np.concatenate([[0], np.cumsum(counts)])
        blists = [[(uk[starts[d * n_shards + e]:
                       starts[d * n_shards + e] + counts[d * n_shards + e]]
                    % ns).astype(np.int32) if e != d else
                   np.zeros(0, np.int32)
                   for e in range(n_shards)] for d in range(n_shards)]
        # rank of each off-diagonal edge's column within its B[d][e]
        # (== the searchsorted the per-shard loops below used to do)
        rank_all = inv - starts[pair_u[inv]]
        req = int(counts.max()) if len(uk) else 1
        bh = halo_width or _round_up(max(req, 1), 8)
        assert bh >= req, (bh, req)
        nh = n_shards * bh
        # halo_send[d, e] = what d SENDS to e = B[e][d]; padding entries
        # point at local row 0 — they only ever carry zero partials in the
        # reduce direction and are never referenced in the gather direction
        halo_send = np.zeros((n_shards, n_shards, bh), np.int32)
        for d in range(n_shards):
            for e in range(n_shards):
                ids = blists[e][d]
                halo_send[d, e, : len(ids)] = ids
        halo_perm = np.zeros((n_shards, nh), np.int32)
        halo_ids = np.zeros((n_shards, nh), np.int32)
        for d in range(n_shards):
            flat = halo_send[d].reshape(-1)
            p = np.argsort(flat, kind="stable").astype(np.int32)
            halo_perm[d] = p
            halo_ids[d] = flat[p]
        # split each shard's edges into own-block (local var ids, no comm)
        # and off-diagonal (halo slot owner*bh + rank in B[d][owner]);
        # ranks come precomputed from the unique() above — off_info keeps
        # them per shard for the GEN compact-index pass below
        local_edges, slot_edges, off_info = [], [], []
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        off_ptr = 0
        for d, (r, c, v) in enumerate(shards):
            om = offmask[offsets[d]: offsets[d + 1]]
            own = ~om
            local_edges.append((r[own] - d * ms, c[own] - d * ns, v[own]))
            k_off = int(om.sum())
            owner = owner_all[offsets[d]: offsets[d + 1]][om]
            rank = rank_all[off_ptr: off_ptr + k_off]
            off_ptr += k_off
            off_info.append((om, owner, rank))
            slot_edges.append((r[om] - d * ms, owner * bh + rank, v[om]))
        blkl_r = stacked_blocks([(dst, src, v)
                                 for dst, src, v in local_edges], ms)
        blkl_c = stacked_blocks([(src, dst, v)
                                 for dst, src, v in local_edges], ns)
        blkh_r = stacked_blocks([(dst, slot, v)
                                 for dst, slot, v in slot_edges], ms)
        blkh_c = stacked_blocks([(slot, dst, v)
                                 for dst, slot, v in slot_edges], nh)
        # per-edge compact-index arrays for the GEN halo path: edges address
        # the concatenated [local vars (ns); halo slots (nh)] feature space
        # instead of the global var axis. hcol_r is in the row-sorted
        # ordering; the h-ordering (sorted by compact id, padding at the
        # max id so real edges stay first) carries the vars<-cons direction:
        # hseg (sorted segments), hrow/hval (edge data), and the two
        # cross-ordering permutations (Y_h = Y_r[eperm_r2h],
        # Y_r = Y_h[eperm_h2r]).
        HC_r, HSEG, HROW, HVAL, EP_r2h, EP_h2r = [], [], [], [], [], []
        for d, (r, c, v) in enumerate(shards):
            k = len(r)
            o1 = np.lexsort((c, r))          # the row-sorted real ordering
            rr_loc = (r[o1] - d * ms).astype(np.int32)
            # compact ids in original edge order from the precomputed
            # boundary ranks, then permuted into the row-sorted ordering
            om, owner, rank = off_info[d]
            comp0 = np.empty(k, np.int64)
            comp0[~om] = c[~om] - d * ns
            comp0[om] = ns + owner * bh + rank
            comp = comp0[o1]
            pad_id = ns + nh - 1
            hcol = np.full(es, pad_id, np.int32)
            hcol[:k] = comp
            oh = np.argsort(hcol, kind="stable").astype(np.int32)
            inv = np.empty(es, np.int32)
            inv[oh] = np.arange(es, dtype=np.int32)
            hrow = np.full(es, ms - 1, np.int32)
            hrow[:k] = rr_loc
            hval = np.zeros(es, np.float32)
            hval[:k] = v[o1]
            HC_r.append(hcol)
            HSEG.append(hcol[oh])
            HROW.append(hrow[oh])
            HVAL.append(hval[oh])
            EP_r2h.append(oh)
            EP_h2r.append(inv)
        halo_fields = dict(
            hcol_r=np.stack(HC_r), hseg=np.stack(HSEG),
            hrow=np.stack(HROW), hval=np.stack(HVAL),
            eperm_r2h=np.stack(EP_r2h), eperm_h2r=np.stack(EP_h2r),
            halo_send=halo_send, halo_perm=halo_perm, halo_ids=halo_ids,
            blkl_r_src=blkl_r[0], blkl_r_dst=blkl_r[1], blkl_r_val=blkl_r[2],
            blkl_r_out=blkl_r[3],
            blkl_c_src=blkl_c[0], blkl_c_dst=blkl_c[1], blkl_c_val=blkl_c[2],
            blkl_c_out=blkl_c[3],
            blkh_r_src=blkh_r[0], blkh_r_dst=blkh_r[1], blkh_r_val=blkh_r[2],
            blkh_r_out=blkh_r[3],
            blkh_c_src=blkh_c[0], blkh_c_dst=blkh_c[1], blkh_c_val=blkh_c[2],
            blkh_c_out=blkh_c[3],
        )

    return PartitionedGraph(
        **halo_fields,
        row_r=np.stack(R_r), col_r=np.stack(C_r), val_r=np.stack(V_r),
        row_c=np.stack(R_c), col_c=np.stack(C_c), val_c=np.stack(V_c),
        c_feas=shard_nodes(np.asarray(pg.c_feas), ms),
        y_s=shard_nodes(np.asarray(pg.y_s), ms),
        cons_mask=shard_nodes(np.asarray(pg.cons_mask), ms, fill=False),
        v_feas=shard_nodes(np.asarray(pg.v_feas), ns),
        y_t=shard_nodes(np.asarray(pg.y_t), ns),
        vars_mask=shard_nodes(np.asarray(pg.vars_mask), ns, fill=False),
        nnz_s=np.asarray(NNZ, np.int32),
        eperm_r=np.stack(EP_r), eperm_c=np.stack(EP_c),
        blkr_src=blkr[0], blkr_dst=blkr[1], blkr_val=blkr[2], blkr_out=blkr[3],
        blkc_src=blkc[0], blkc_dst=blkc[1], blkc_val=blkc[2], blkc_out=blkc[3],
        n_shards=n_shards,
    )


# ---------------------------------------------------------- partition caching
def _graph_fingerprint(pg: PaddedGraph) -> str:
    """Cheap content fingerprint for the partition disk cache: shapes +
    CRC32 of a strided sample of the edge arrays AND of the node
    features/labels/masks (the cached PartitionedGraph embeds those too —
    a re-prepped dataset whose sparsity is unchanged but whose
    features/labels moved, e.g. bound-only regeneration or a relabeling
    solver upgrade, must miss the cache). Sampled, not full-scan (a
    10^8-edge scan would cost a large fraction of what the cache saves),
    so invalidation is with high probability, not certainty — acceptable
    for a cache keyed primarily by dataset file name (processed/*.pk
    blobs are immutable once written)."""
    import zlib
    h = 0
    for a in (pg.row_r, pg.col_r, pg.val_r, pg.c_feas, pg.v_feas,
              pg.y_s, pg.y_t, pg.cons_mask, pg.vars_mask):
        a = np.ascontiguousarray(np.asarray(a))
        flat = a.reshape(-1)
        step = max(flat.shape[0] // 65536, 1)
        h = zlib.crc32(np.ascontiguousarray(flat[::step]).tobytes(), h)
    # exact aggregates of the full edge arrays (one streaming pass, ~0.3 s
    # at 10^8 edges — negligible vs the partition itself): a stale-cache
    # collision now requires an edit that both lands between the CRC's
    # sample points AND preserves these sums exactly
    agg = np.array([np.asarray(pg.row_r, np.int64).sum(),
                    np.asarray(pg.col_r, np.int64).sum()], np.int64)
    vs = np.float64(np.asarray(pg.val_r, np.float64).sum())
    h = zlib.crc32(agg.tobytes() + vs.tobytes(), h)
    return f"{int(pg.ncons)}x{int(pg.nvars)}x{len(np.asarray(pg.row_r))}" \
           f"-{h:08x}"


#: fields NOT serialized by the partition cache — each is an exact gather
#: of a stored array through a stored permutation (X_c = X_r[eperm_c];
#: Y_h = Y_r[eperm_r2h]; eperm_r / eperm_h2r are the inverse permutations;
#: padding maps to itself in every ordering, partition_graph pack()), so
#: storing them would write ~30% more bytes to save a ~1 s/GB gather at
#: load (VERDICT r04 item 6: the store wrote 2.4 GB of derivable arrays
#: per 100M-edge graph).
_CACHE_DERIVED = ("row_c", "col_c", "val_c", "eperm_r",
                  "hval", "hrow", "hseg", "eperm_h2r")


def _inverse_perm_rows(p: np.ndarray) -> np.ndarray:
    """Row-wise inverse of a (D, E) stack of permutations, scatter-form."""
    inv = np.empty_like(p)
    ar = np.broadcast_to(np.arange(p.shape[1], dtype=p.dtype), p.shape)
    np.put_along_axis(inv, p, ar, axis=1)
    return inv


def _store_partition(path: str, dg: "PartitionedGraph") -> None:
    """Serialize ``dg`` minus the derivable fields (atomic rename)."""
    import os
    import pickle
    state = {f.name: getattr(dg, f.name) for f in dataclasses.fields(dg)}
    for k in _CACHE_DERIVED:
        state[k] = None
    state["__pcache_v2__"] = True
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def _load_partition(path: str) -> "PartitionedGraph":
    """Load a cached partition, rebuilding the derived orderings."""
    import pickle
    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, PartitionedGraph):   # pre-r05 full-object cache
        return obj
    assert obj.pop("__pcache_v2__", False), path
    take = lambda x, p: np.take_along_axis(x, p, axis=1)
    ep_c = obj["eperm_c"]
    if ep_c is not None:
        obj["row_c"] = take(obj["row_r"], ep_c)
        obj["col_c"] = take(obj["col_r"], ep_c)
        obj["val_c"] = take(obj["val_r"], ep_c)
        obj["eperm_r"] = _inverse_perm_rows(ep_c)
    ep_r2h = obj["eperm_r2h"]
    if ep_r2h is not None:
        obj["hval"] = take(obj["val_r"], ep_r2h)
        obj["hrow"] = take(obj["row_r"], ep_r2h)
        obj["hseg"] = take(obj["hcol_r"], ep_r2h)
        obj["eperm_h2r"] = _inverse_perm_rows(ep_r2h)
    return PartitionedGraph(**obj)


def cached_partition_graph(pg: PaddedGraph, n_shards: int, halo: bool = False,
                           cache_dir: str | None = None,
                           fn: str | None = None,
                           **kw) -> "PartitionedGraph":
    """``partition_graph`` with an on-disk cache.

    Partitioning is a per-graph constant but real wall time at scale
    (measured: ~16 s host work per 10^7-edge graph, scripts/
    bench_partition.py) and was recomputed by every training run's epoch 0
    and every inference pass. Keyed by (graph file name, content
    fingerprint, shard count, halo flag, explicit widths), stored beside
    the dataset's ``processed/`` blobs — the same role the reference's
    processed/*.pk cache plays for its host prep (dataset.py:178-224).
    The store skips the derivable orderings (``_CACHE_DERIVED``); the load
    rebuilds them exactly.
    """
    import os
    if not cache_dir or not fn:
        return partition_graph(pg, n_shards, halo=halo, **kw)
    wid = "-".join(f"{k}{v}" for k, v in sorted(kw.items())
                   if v is not None)
    key = (f"{fn}-D{n_shards}-h{int(halo)}"
           + (f"-{wid}" if wid else "")
           + f"-{_graph_fingerprint(pg)}.pk")
    path = os.path.join(cache_dir, key)
    if os.path.exists(path):
        return _load_partition(path)
    dg = partition_graph(pg, n_shards, halo=halo, **kw)
    os.makedirs(cache_dir, exist_ok=True)
    _store_partition(path, dg)
    return dg


# --------------------------------------------------------------- halo exchange
def _halo_a2a(x, ax):
    """The halo transport: XLA ``all_to_all`` (async start/done pairs the
    latency-hiding scheduler overlaps with the interior SpMM), or the direct
    inter-chip RDMA kernel (parallel/pallas_halo.py, LP_GNN_HALO=pallas) —
    numerically identical, bit-compared in tests/test_parallel.py."""
    from .pallas_halo import use_pallas_halo, pallas_all_to_all
    if use_pallas_halo():
        ndev = int(jax.lax.axis_size(ax))
        return pallas_all_to_all(x, ax, ndev, x.shape[0] // ndev)
    return jax.lax.all_to_all(x, ax, split_axis=0, concat_axis=0, tiled=True)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def halo_gather(x, halo_send, halo_perm, halo_ids, ax):
    """Collect the remote var rows this shard's edges reference.

    One ``all_to_all`` moves only boundary rows: shard d sends
    ``x[halo_send[e]]`` to each peer e and receives the compact halo buffer
    H (D*Bh, F) whose slot ``e*Bh + k`` holds the feature of the k-th
    boundary var owned by shard e (the blkh_* layouts index this buffer).
    Backward = :func:`halo_reduce`'s comm pattern (exact transpose): route
    slot cotangents back to their owners and segment-sum over the sorted
    local ids — no unsorted TPU scatter.

    Args (per-shard views inside shard_map):
      x: (ns, F) local var features.
      halo_send: (D, Bh) int32 local var rows to send to each peer.
      halo_perm: (D*Bh,) int32 sort permutation of halo_send.flatten().
      halo_ids:  (D*Bh,) int32 = halo_send.flatten()[halo_perm] (ascending).
      ax: mesh axis name (static).
    """
    send = x[halo_send.reshape(-1)]
    return _halo_a2a(send, ax)


def _halo_gather_fwd(x, halo_send, halo_perm, halo_ids, ax):
    out = halo_gather(x, halo_send, halo_perm, halo_ids, ax)
    return out, (halo_perm, halo_ids, x.shape[0])


def _halo_gather_bwd(ax, res, g):
    halo_perm, halo_ids, ns = res
    back = _halo_a2a(g, ax)
    dx = jax.ops.segment_sum(back[halo_perm], halo_ids, num_segments=ns,
                             indices_are_sorted=True)
    return dx, None, None, None


halo_gather.defvjp(_halo_gather_fwd, _halo_gather_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def halo_reduce(part, halo_send, halo_perm, halo_ids, ns, ax):
    """Route transpose partial sums back to their owner shards.

    ``part`` (D*Bh, F) holds this shard's partial aggregates for remote
    boundary vars, in halo-slot layout. One ``all_to_all`` returns each
    partial to the var's owner, where a *sorted* segment-sum folds the
    (possibly repeated, since several peers may reference the same var)
    contributions into the local (ns, F) block. Padding slots carry exact
    zeros (no edges target them), so their landing at local row 0 is a
    no-op. Backward = :func:`halo_gather`'s comm pattern (exact transpose).
    """
    back = _halo_a2a(part, ax)
    return jax.ops.segment_sum(back[halo_perm], halo_ids, num_segments=ns,
                               indices_are_sorted=True)


def _halo_reduce_fwd(part, halo_send, halo_perm, halo_ids, ns, ax):
    out = halo_reduce(part, halo_send, halo_perm, halo_ids, ns, ax)
    return out, (halo_send,)


def _halo_reduce_bwd(ns, ax, res, g):
    (halo_send,) = res
    send = g[halo_send.reshape(-1)]
    return _halo_a2a(send, ax), None, None, None


halo_reduce.defvjp(_halo_reduce_fwd, _halo_reduce_bwd)


# ----------------------------------------------------------- per-shard kernels
def _dist_aggs(shard, left_local, right_local, ms, n_pad, ax):
    """Both aggregation directions of one distributed bidir conv:
    agg_c = (A right)_local rows, agg_v = reduce-scattered (A^T left).

    With halo layouts present (partition_graph(halo=True)) both full-width
    collectives are replaced by the boundary exchange: halo_gather feeds the
    local-rows SpMM from the compact halo buffer, and the transpose SpMM
    emits halo-slot partials that halo_reduce returns to their owners.

    Compute/comm overlap (SURVEY §2.3/§7 step 7): the dataflow is ordered so
    each collective is independent of the interior (own-block, zero-comm)
    SpMMs that follow its start — halo_gather depends only on right_local
    and is issued first; the boundary partials feeding halo_reduce are
    computed before the interior agg_v. XLA's async collective pairs
    (all_to_all-start/done) then fly both exchanges over ICI while the MXU
    runs the interior contraction; only the small boundary SpMM / final add
    waits on the done."""
    from ..ops.spmm import blocked_spmm
    if shard.get("blkh_r_src") is not None:
        ns = right_local.shape[0]
        nh = shard["halo_perm"].shape[0]
        # issue the forward exchange first: nothing below depends on it
        # until the boundary SpMM
        h = halo_gather(right_local, shard["halo_send"], shard["halo_perm"],
                        shard["halo_ids"], ax)
        # boundary partials next, so the return exchange can start while
        # the interior SpMMs run
        tr_hr = (shard["blkh_r_src"], shard["blkh_r_dst"],
                 shard["blkh_r_val"], shard["blkh_r_out"])
        part = blocked_spmm(shard["blkh_c_src"], shard["blkh_c_dst"],
                            shard["blkh_c_val"], shard["blkh_c_out"],
                            left_local, tr_hr, -(-nh // 128))[:nh]
        red = halo_reduce(part, shard["halo_send"], shard["halo_perm"],
                          shard["halo_ids"], ns, ax)
        # interior (own-block, zero-comm) SpMMs — the overlap window
        tr_l = (shard["blkl_c_src"], shard["blkl_c_dst"],
                shard["blkl_c_val"], shard["blkl_c_out"])
        agg_c = blocked_spmm(shard["blkl_r_src"], shard["blkl_r_dst"],
                             shard["blkl_r_val"], shard["blkl_r_out"],
                             right_local, tr_l, ms // 128)[:ms]
        tr_lr = (shard["blkl_r_src"], shard["blkl_r_dst"],
                 shard["blkl_r_val"], shard["blkl_r_out"])
        agg_v = blocked_spmm(shard["blkl_c_src"], shard["blkl_c_dst"],
                             shard["blkl_c_val"], shard["blkl_c_out"],
                             left_local, tr_lr, ns // 128)[:ns]
        # consumers of the exchanged buffers come last
        tr_h = (shard["blkh_c_src"], shard["blkh_c_dst"],
                shard["blkh_c_val"], shard["blkh_c_out"])
        agg_c = agg_c + blocked_spmm(
            shard["blkh_r_src"], shard["blkh_r_dst"],
            shard["blkh_r_val"], shard["blkh_r_out"],
            h, tr_h, ms // 128)[:ms]
        agg_v = agg_v + red
        return agg_c, agg_v
    right_full = jax.lax.all_gather(right_local, ax, axis=0, tiled=True)
    use_blocked = shard.get("blkr_src") is not None
    # cons <- vars: purely local rows
    if use_blocked:
        tr = (shard["blkc_src"], shard["blkc_dst"], shard["blkc_val"],
              shard["blkc_out"])
        agg_c = blocked_spmm(shard["blkr_src"], shard["blkr_dst"],
                             shard["blkr_val"], shard["blkr_out"],
                             right_full, tr, ms // 128)[:ms]
    else:
        msg = right_full[shard["col_r"]] * shard["val_r"][:, None].astype(
            right_full.dtype)
        agg_c = jax.ops.segment_sum(msg, shard["row_r"], num_segments=ms,
                                    indices_are_sorted=True)
    # vars <- cons: partial sums over the full var axis, then reduce-scatter
    if use_blocked:
        tr = (shard["blkr_src"], shard["blkr_dst"], shard["blkr_val"],
              shard["blkr_out"])
        part = blocked_spmm(shard["blkc_src"], shard["blkc_dst"],
                            shard["blkc_val"], shard["blkc_out"],
                            left_local, tr, n_pad // 128)[:n_pad]
    else:
        msg2 = left_local[shard["row_c"]] * shard["val_c"][:, None].astype(
            left_local.dtype)
        part = jax.ops.segment_sum(msg2, shard["col_c"], num_segments=n_pad,
                                   indices_are_sorted=True)
    agg_v = jax.lax.psum_scatter(part, ax, scatter_dimension=0, tiled=True)
    return agg_c, agg_v


def _dist_bidir_conv(p, shard, left_local, right_local, ms, n_pad, ax,
                     aggs=None):
    """Distributed GraphConvTwoDirection (models/layers.py semantics).

    Uses the chunked MXU blocked SpMM (ops/spmm.py) shard-locally when the
    partition carries block layouts, else sorted segment-sums. ``aggs``
    short-circuits both SpMMs and both collectives with precomputed
    (agg_c, agg_v) — used for the input conv whose aggregation is a
    per-graph constant (attach_dist_input_agg)."""
    agg_c, agg_v = aggs if aggs is not None else _dist_aggs(
        shard, left_local, right_local, ms, n_pad, ax)
    left_new = linear_apply(p["r2l"]["rel"], agg_c) + \
        linear_apply(p["r2l"]["root"], left_local)
    right_new = linear_apply(p["l2r"]["rel"], agg_v) + \
        linear_apply(p["l2r"]["root"], right_local)
    return left_new, right_new


def dist_gcn_fc_apply(params, shard, ms, n_pad, ax, dp_rate=0.1,
                      train=False, rng=None):
    """Distributed GCN_FC forward on one shard (models/gcn.py make_gcn_fc)."""
    x_left = shard["c_feas"]
    x_right = shard["v_feas"]
    aggs = None
    if shard.get("in_agg_c") is not None and shard.get("in_agg_v") is not None:
        aggs = (shard["in_agg_c"], shard["in_agg_v"])
    left, right = _dist_bidir_conv(params["conv1"], shard, x_left, x_right,
                                   ms, n_pad, ax, aggs=aggs)
    left, right = jax.nn.relu(left), jax.nn.relu(right)
    n_hidden = len(params["layers"])
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # the rng enters the shard_map replicated — fold in the shard index so
    # each row/var block draws an independent dropout mask (otherwise global
    # rows i, i+ms, i+2ms, ... share one mask across shards)
    rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
    keys = jax.random.split(rng, 2 * max(n_hidden, 1))
    for i, conv in enumerate(params["layers"]):
        left, right = _dist_bidir_conv(conv, shard, left, right, ms, n_pad, ax)
        left = dropout(left, dp_rate, keys[2 * i], train)
        right = dropout(right, dp_rate, keys[2 * i + 1], train)
        left, right = jax.nn.relu(left), jax.nn.relu(right)
    left = linear_apply(params["lin_left"], left)
    right = linear_apply(params["lin_right"], right)
    return add_knowledge(left, right, x_left, x_right)


# ----------------------------------------------------- other model families
# Distributed forwards for the rest of the model zoo (reference
# arch.py:144-289), so every arch can run edge-partitioned — not only the
# flagship (round-1 gate at infer/predict.py dropped).

def dist_gcn_apply(params, shard, ms, n_pad, ax, dp_rate=0.1,
                   train=False, rng=None):
    """Distributed GCN forward (models/gcn.py make_gcn: 3 fixed convs)."""
    x_left = shard["c_feas"]
    x_right = shard["v_feas"]
    aggs = None
    if shard.get("in_agg_c") is not None and shard.get("in_agg_v") is not None:
        aggs = (shard["in_agg_c"], shard["in_agg_v"])
    left, right = _dist_bidir_conv(params["conv1"], shard, x_left, x_right,
                                   ms, n_pad, ax, aggs=aggs)
    left, right = jax.nn.relu(left), jax.nn.relu(right)
    left, right = _dist_bidir_conv(params["conv2"], shard, left, right,
                                   ms, n_pad, ax)
    left, right = jax.nn.relu(left), jax.nn.relu(right)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
    k1, k2 = jax.random.split(rng)
    left = dropout(left, dp_rate, k1, train)
    right = dropout(right, dp_rate, k2, train)
    left, right = _dist_bidir_conv(params["conv3"], shard, left, right,
                                   ms, n_pad, ax)
    return add_knowledge(left, right, x_left, x_right)


def dist_gcn_rand_apply(params, shard, ms, n_pad, ax, dp_rate=0.1,
                        train=False, rng=None):
    """Distributed random-logit control (models/gcn.py make_gcn_rand):
    per-shard uniforms through the local knowledge mask — no comm at all."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
    k1, k2 = jax.random.split(rng)
    left = jax.random.uniform(k1, (shard["c_feas"].shape[0], 3))
    right = jax.random.uniform(k2, (shard["v_feas"].shape[0], 3))
    return add_knowledge(left, right, shard["c_feas"], shard["v_feas"])


def _dist_gen_softmax_agg_local(logits, values, seg, num_seg, emask):
    """Shard-local segment softmax (dst side fully owned by this shard) —
    same math as models/gen.py _segment_softmax_agg: input-dtype edge
    streams, ONE fused num/den segment-sum with fp32 accumulation."""
    em = emask[:, None]
    ninf = jnp.array(-jnp.inf, logits.dtype)
    mx = jax.ops.segment_max(jnp.where(em, logits, ninf), seg,
                             num_segments=num_seg, indices_are_sorted=True)
    mx = jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(mx), mx, jnp.zeros((), logits.dtype)))
    ex = jnp.where(em, jnp.exp(logits - mx[seg]), jnp.zeros((), logits.dtype))
    stacked = jnp.concatenate([ex * values, ex], axis=1).astype(jnp.float32)
    s = jax.ops.segment_sum(stacked, seg, num_segments=num_seg,
                            indices_are_sorted=True)
    d = values.shape[1]
    return s[:, :d] / jnp.maximum(s[:, d:], 1e-16)


def _dist_gen_softmax_agg_global(logits, values, seg, n_pad, emask, ax):
    """Cross-shard segment softmax over the full var axis: per-shard
    segment max -> pmax; the fused num/den partials ride ONE psum_scatter
    (models/gen.py _segment_softmax_agg semantics: the per-segment
    denominator is constant within a segment, so num/den ==
    segsum(alpha * values))."""
    em = emask[:, None]
    ninf = jnp.array(-jnp.inf, logits.dtype)
    mx_part = jax.ops.segment_max(jnp.where(em, logits, ninf), seg,
                                  num_segments=n_pad, indices_are_sorted=True)
    # pmax has no differentiation rule; the shift's gradient is exactly
    # zero (models/gen.py stop-gradients the single-chip max identically)
    mx = jax.lax.pmax(jax.lax.stop_gradient(mx_part), ax)
    mx = jnp.where(jnp.isfinite(mx), mx, jnp.zeros((), logits.dtype))
    ex = jnp.where(em, jnp.exp(logits - mx[seg]), jnp.zeros((), logits.dtype))
    stacked = jnp.concatenate([ex * values, ex], axis=1).astype(jnp.float32)
    s_part = jax.ops.segment_sum(stacked, seg, num_segments=n_pad,
                                 indices_are_sorted=True)
    s = jax.lax.psum_scatter(s_part, ax, scatter_dimension=0, tiled=True)
    d = values.shape[1]
    return s[:, :d] / jnp.maximum(s[:, d:], 1e-16)


def _gen_mlp(p, aggr, x_dst):
    from ..models.gen import EPS  # noqa: F401  (doc anchor)
    h = aggr.astype(x_dst.dtype) + x_dst
    h = linear_apply(p["mlp"]["l1"], h)
    from ..models.layers import layer_norm_apply
    h = layer_norm_apply(p["mlp"]["ln"], h)
    h = jax.nn.relu(h)
    return linear_apply(p["mlp"]["l2"], h)


def _dist_gen_bidir_halo(p, shard, left, right, ms, n_pad, ax):
    """GEN two-direction layer over the boundary halo exchange.

    cons <- vars: one halo_gather of the projected source features replaces
    the all_gather; per-edge gathers index the concatenated
    [local vars; halo slots] space (``hcol_r``), and the shard-local
    softmax is unchanged (every edge of a local row is local).
    vars <- cons: per-edge messages are built in the h-ordering (sorted by
    compact destination), the segment max / exp-sum / weighted-sum run over
    the compact space, the max is combined at the owners and broadcast back
    through the halo (both legs under stop_gradient, matching the
    single-chip stop-gradient on the shift), and the den/num partials ride
    ``halo_reduce`` home. Comm per layer: 4 halo exchanges of H rows vs the
    decomposition's 3 full-width (N_pad) collectives."""
    from ..ops.spmm import gather_src
    from ..models.gen import EPS
    ns = right.shape[0]
    nh = shard["halo_perm"].shape[0]
    C = ns + nh
    es = shard["hseg"].shape[0]
    emask = jnp.arange(es) < shard["nnz_s"]
    hs, hp, hi = shard["halo_send"], shard["halo_perm"], shard["halo_ids"]

    # ---- r2l: dst = cons (local softmax), sources via the halo
    pr = p["r2l"]
    r_src = linear_apply(pr["lin_src"], right) if "lin_src" in pr else right
    x_dst_l = linear_apply(pr["lin_dst"], left) if "lin_dst" in pr else left
    hbuf = halo_gather(r_src, hs, hp, hi, ax)
    right_cat = jnp.concatenate([r_src, hbuf], axis=0)
    e_r = linear_apply(pr["edge"], shard["val_r"][:, None].astype(right.dtype))
    xs = gather_src(right_cat, shard["hcol_r"], shard["hseg"],
                    shard["eperm_r2h"], C)
    msg = jax.nn.relu(xs + e_r) + EPS
    t_r = pr["t"].astype(msg.dtype)
    aggr_c = _dist_gen_softmax_agg_local(msg * t_r, msg, shard["row_r"],
                                         ms, emask)
    left_new = _gen_mlp(pr, aggr_c, x_dst_l)

    # ---- l2r: dst = vars (compact segments), local sources, h-ordering
    pl = p["l2r"]
    l_src = linear_apply(pl["lin_src"], left) if "lin_src" in pl else left
    x_dst_r = linear_apply(pl["lin_dst"], right) if "lin_dst" in pl else right
    e_c = linear_apply(pl["edge"], shard["hval"][:, None].astype(left.dtype))
    xs2 = gather_src(l_src, shard["hrow"], shard["row_r"],
                     shard["eperm_h2r"], ms)
    msg2 = jax.nn.relu(xs2 + e_c) + EPS
    t_l = pl["t"].astype(msg2.dtype)
    logits = msg2 * t_l
    em = emask[:, None]
    ninf = jnp.array(-jnp.inf, logits.dtype)
    mx_part = jax.ops.segment_max(jnp.where(em, logits, ninf),
                                  shard["hseg"], num_segments=C,
                                  indices_are_sorted=True)
    mx_part = jax.lax.stop_gradient(mx_part)
    # combine per-var maxes at the owners (max over incoming slot partials
    # and the local partial), then broadcast back through the halo — the
    # same shift the single-chip path stop-gradients (models/gen.py)
    back = _halo_a2a(mx_part[ns:], ax)
    mx_own = jnp.maximum(
        mx_part[:ns],
        jax.ops.segment_max(back[hp], hi, num_segments=ns,
                            indices_are_sorted=True))
    mx_own = jnp.where(jnp.isfinite(mx_own), mx_own,
                       jnp.zeros((), logits.dtype))
    mx_slots = jax.lax.stop_gradient(halo_gather(mx_own, hs, hp, hi, ax))
    mx_cat = jnp.concatenate([mx_own, mx_slots], axis=0)
    ex = jnp.where(em, jnp.exp(logits - mx_cat[shard["hseg"]]),
                   jnp.zeros((), logits.dtype))
    # fused num/den: one (es, 2D) fp32-accumulating segment-sum and ONE
    # halo_reduce of the stacked partials (models/gen.py semantics)
    stacked = jnp.concatenate([ex * msg2, ex], axis=1).astype(jnp.float32)
    s_part = jax.ops.segment_sum(stacked, shard["hseg"], num_segments=C,
                                 indices_are_sorted=True)
    s = s_part[:ns] + halo_reduce(s_part[ns:], hs, hp, hi, ns, ax)
    dch = msg2.shape[1]
    aggr_v = s[:, :dch] / jnp.maximum(s[:, dch:], 1e-16)
    right_new = _gen_mlp(pl, aggr_v, x_dst_r)
    return left_new, right_new


def _dist_gen_bidir(p, shard, left, right, ms, n_pad, ax):
    """Distributed GENConv two-direction layer (models/gen.py semantics).

    cons <- vars: every edge of a local constraint row lives on this shard,
    so the softmax is shard-local; only the source features cross shards
    (projected locally first, then one all_gather). vars <- cons: the
    destination segments span shards — per-shard max is pmax-combined and
    the exp-sums ride the same psum_scatter the GraphConv path uses.
    With halo layouts present (partition_graph(halo=True)) the boundary
    halo exchange replaces every full-width collective
    (:func:`_dist_gen_bidir_halo`)."""
    from ..ops.spmm import gather_src
    from ..models.gen import EPS
    if shard.get("hseg") is not None:
        return _dist_gen_bidir_halo(p, shard, left, right, ms, n_pad, ax)
    ns = right.shape[0]
    emask = jnp.arange(shard["val_r"].shape[0]) < shard["nnz_s"]

    # ---- r2l: dst = cons (local), edges row-sorted
    pr = p["r2l"]
    r_src = linear_apply(pr["lin_src"], right) if "lin_src" in pr else right
    x_dst_l = linear_apply(pr["lin_dst"], left) if "lin_dst" in pr else left
    right_full = jax.lax.all_gather(r_src, ax, axis=0, tiled=True)
    e_r = linear_apply(pr["edge"], shard["val_r"][:, None].astype(right.dtype))
    xs = gather_src(right_full, shard["col_r"], shard["col_c"],
                    shard["eperm_c"], n_pad)
    msg = jax.nn.relu(xs + e_r) + EPS
    t_r = pr["t"].astype(msg.dtype)
    aggr_c = _dist_gen_softmax_agg_local(msg * t_r, msg, shard["row_r"],
                                         ms, emask)
    left_new = _gen_mlp(pr, aggr_c, x_dst_l)

    # ---- l2r: dst = vars (global segments), edges col-sorted
    pl = p["l2r"]
    l_src = linear_apply(pl["lin_src"], left) if "lin_src" in pl else left
    x_dst_r = linear_apply(pl["lin_dst"], right) if "lin_dst" in pl else right
    e_c = linear_apply(pl["edge"], shard["val_c"][:, None].astype(left.dtype))
    xs2 = gather_src(l_src, shard["row_c"], shard["row_r"],
                     shard["eperm_r"], ms)
    msg2 = jax.nn.relu(xs2 + e_c) + EPS
    t_l = pl["t"].astype(msg2.dtype)
    aggr_v = _dist_gen_softmax_agg_global(msg2 * t_l, msg2,
                                          shard["col_c"], n_pad, emask, ax)
    right_new = _gen_mlp(pl, aggr_v, x_dst_r)
    return left_new, right_new


def _make_dist_deeper_apply(conv_fn):
    """Distributed res+ DeepGCN stack (models/gcn.py _make_deeper)."""
    from ..models.layers import layer_norm_apply

    def apply(params, shard, ms, n_pad, ax, dp_rate=0.1, train=False,
              rng=None):
        x_left = shard["c_feas"]
        x_right = shard["v_feas"]
        left, right = conv_fn(params["conv_in"], shard, x_left, x_right,
                              ms, n_pad, ax)
        n_mid = len(params["blocks"])
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
        keys = jax.random.split(rng, 2 * max(n_mid, 1))
        for i, blk in enumerate(params["blocks"]):
            h_l = layer_norm_apply(blk["norm_l"], left)
            h_r = layer_norm_apply(blk["norm_r"], right)
            h_l, h_r = jax.nn.relu(h_l), jax.nn.relu(h_r)
            h_l = dropout(h_l, dp_rate, keys[2 * i], train)
            h_r = dropout(h_r, dp_rate, keys[2 * i + 1], train)
            h_l, h_r = conv_fn(blk["conv"], shard, h_l, h_r, ms, n_pad, ax)
            left, right = left + h_l, right + h_r
        left, right = conv_fn(params["conv_out"], shard, left, right,
                              ms, n_pad, ax)
        return add_knowledge(left, right, x_left, x_right)

    return apply


dist_gcn_deeper_apply = _make_dist_deeper_apply(_dist_bidir_conv)
dist_gen_deeper_apply = _make_dist_deeper_apply(_dist_gen_bidir)

#: model-name -> per-shard distributed forward (same signature as
#: dist_gcn_fc_apply) — the dispatch that replaces the round-1
#: model.name == "GCN_FC" gate
DIST_MODELS = {
    "GCN_FC": dist_gcn_fc_apply,
    "GCN": dist_gcn_apply,
    "GCNRand": dist_gcn_rand_apply,
    "GCNDeeper": dist_gcn_deeper_apply,
    "GENDeeper": dist_gen_deeper_apply,
}

#: archs whose distributed forward takes the boundary halo exchange — every
#: arch with a communication path. GCNRand communicates nothing (per-shard
#: uniforms through the local knowledge mask), so halo layouts would be dead
#: weight. Single source of truth for the trainer / predict halo switch: a
#: new DIST_MODELS entry is halo-capable by default instead of silently
#: losing halo in a forgotten string-tuple copy.
DIST_HALO_ARCHS = frozenset(DIST_MODELS) - {"GCNRand"}


# -------------------------------------------------------------- dist. losses
# one CE primitive shared with the single-chip losses, so the documented
# bit-equivalence between dist_* and train/losses.* cannot drift
from ..train.losses import _ce_per_node as _ce


def dist_balanced_loss(lc, lv, y_s, y_t, mask_s, mask_t, ax):
    """Distributed 'balanced' loss: identical value to train/losses.balanced
    on the gathered graph; all reductions via psum."""
    fs = mask_s.astype(jnp.float32)
    ft = mask_t.astype(jnp.float32)
    m = jax.lax.psum(jnp.sum(fs), ax)
    n = jax.lax.psum(jnp.sum(ft), ax)

    def side(logits, y, f):
        cnt = jnp.stack([jax.lax.psum(jnp.sum((y == k) * f), ax)
                         for k in range(3)])
        total = cnt.sum()
        wei = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)
        n_present = jnp.sum(cnt > 0)
        merged = wei.at[0].set((wei[0] + wei[2]) / 2.0).at[2].set(
            (wei[0] + wei[2]) / 2.0)
        wei = jnp.where(n_present != 2, merged, wei)
        w = wei[y] * f
        num = jax.lax.psum(jnp.sum(w * _ce(logits, y)), ax)
        den = jax.lax.psum(jnp.sum(w), ax)
        return num / jnp.maximum(den, 1e-12)

    loss = (m + n) / jnp.maximum(m, 1.0) * side(lc, y_s, fs)
    loss += (m + n) / jnp.maximum(n, 1.0) * side(lv, y_t, ft)
    return loss


def dist_unbalanced_loss(lc, lv, y_s, y_t, mask_s, mask_t, ax):
    fs = mask_s.astype(jnp.float32)
    ft = mask_t.astype(jnp.float32)
    num = jax.lax.psum(jnp.sum(_ce(lc, y_s) * fs) + jnp.sum(_ce(lv, y_t) * ft), ax)
    den = jax.lax.psum(jnp.sum(fs) + jnp.sum(ft), ax)
    return num / jnp.maximum(den, 1e-12)


def dist_focal_loss(lc, lv, y_s, y_t, mask_s, mask_t, ax,
                    gamma: float = 2.0):
    """Distributed focal loss, preserving the reference's quirk of applying
    the (1-pt)^gamma modulation to the *mean* CE (train.py:18-28,
    train/losses.focal). The mean CE is the psum-reduced unbalanced loss —
    a replicated scalar — so the modulation is identical on every shard and
    the value matches the single-chip focal bit-for-bit."""
    ce = dist_unbalanced_loss(lc, lv, y_s, y_t, mask_s, mask_t, ax)
    pt = jnp.exp(-ce)
    return (1.0 - pt) ** gamma * ce


def dist_critical_loss(lc, lv, y_s, y_t, mask_s, mask_t, ax,
                       alpha: float = 4.0, tau: float = 0.05):
    """Distributed basis-criticality-weighted loss — identical value to
    train/losses.critical on the gathered graph. The decode threshold
    (the m-th largest P(basic)) is a global order statistic, so the single
    P(basic) CHANNEL is all-gathered (1 float per node — negligible next
    to the layer collectives) and theta computed identically on every
    shard; the criticality weights then multiply the local class weights
    inside the psum-reduced weighted CE."""
    fs = mask_s.astype(jnp.float32)
    ft = mask_t.astype(jnp.float32)
    m = jax.lax.psum(jnp.sum(fs), ax)
    n = jax.lax.psum(jnp.sum(ft), ax)
    p_c = jax.nn.softmax(lc.astype(jnp.float32), axis=-1)[:, 1]
    p_v = jax.nn.softmax(lv.astype(jnp.float32), axis=-1)[:, 1]
    pm_loc = jnp.concatenate([jnp.where(mask_s, p_c, -jnp.inf),
                              jnp.where(mask_t, p_v, -jnp.inf)])
    # bisection threshold with psum'ed counts — same iteration count and
    # arithmetic as the serial _decode_threshold, so theta is bit-identical
    # to the single-chip loss (and no full-width all_gather is needed)
    m_int = m.astype(jnp.int32)

    def bis(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jax.lax.psum(jnp.sum(pm_loc >= mid), ax)
        take = cnt >= m_int
        return (jnp.where(take, mid, lo), jnp.where(take, hi, mid))

    theta, _hi = jax.lax.fori_loop(
        0, 24, bis, (jnp.zeros((), jnp.float32), jnp.ones((), jnp.float32)))

    def crit(p):
        w = 1.0 + alpha * jnp.exp(-(p - theta) ** 2 / (2.0 * tau * tau))
        return jax.lax.stop_gradient(jnp.where(jnp.isfinite(w), w, 1.0))

    def side(logits, y, f, node_w):
        cnt = jnp.stack([jax.lax.psum(jnp.sum((y == k) * f), ax)
                         for k in range(3)])
        total = cnt.sum()
        wei = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)
        n_present = jnp.sum(cnt > 0)
        merged = wei.at[0].set((wei[0] + wei[2]) / 2.0).at[2].set(
            (wei[0] + wei[2]) / 2.0)
        wei = jnp.where(n_present != 2, merged, wei)
        w = wei[y] * f * node_w
        num = jax.lax.psum(jnp.sum(w * _ce(logits, y)), ax)
        den = jax.lax.psum(jnp.sum(w), ax)
        return num / jnp.maximum(den, 1e-12)

    loss = (m + n) / jnp.maximum(m, 1.0) * side(lc, y_s, fs, crit(p_c))
    loss += (m + n) / jnp.maximum(n, 1.0) * side(lv, y_t, ft, crit(p_v))
    return loss


DIST_LOSSES = {"balanced": dist_balanced_loss,
               "unbalanced": dist_unbalanced_loss,
               "focal": dist_focal_loss,
               "critical": dist_critical_loss}


# ------------------------------------------------------------------- wrappers
def _data_dict(dg: PartitionedGraph):
    return {f: getattr(dg, f) for f in SHARD_FIELDS
            if getattr(dg, f) is not None}


def _unshard(d):
    return {k: v[0] for k, v in d.items()}


def attach_dist_input_agg(dg: PartitionedGraph, mesh: Mesh,
                          ax: str = "edge") -> PartitionedGraph:
    """Precompute the input conv's aggregations once for a partitioned
    graph — the distributed analog of ops/spmm.py attach_input_agg. Runs
    the exact same all_gather/SpMM/psum_scatter the input conv would, so
    subsequent steps are bit-identical while skipping 2 of the 6 per-step
    edge traversals *and* the input conv's two collectives."""
    ms, n_pad = dg.ms, dg.n_pad
    data = _data_dict(dg)

    def body(data):
        shard = _unshard(data)
        agg_c, agg_v = _dist_aggs(shard, shard["c_feas"], shard["v_feas"],
                                  ms, n_pad, ax)
        return agg_c[None], agg_v[None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=({f: P(ax) for f in data},),
                   out_specs=(P(ax), P(ax)), check_vma=False)
    agg_c, agg_v = fn(data)
    return dataclasses.replace(dg, in_agg_c=agg_c, in_agg_v=agg_v)


def dist_apply(params, dg: PartitionedGraph, mesh: Mesh, ax: str = "edge",
               dp_rate: float = 0.1, train: bool = False, rng=None,
               arch: str = "GCN_FC"):
    """Full-graph distributed forward for any registered arch
    (``DIST_MODELS``). Returns gathered logits
    ((m_pad_total, 3), (n_pad_total, 3))."""
    ms, n_pad = dg.ms, dg.n_pad
    apply_fn = DIST_MODELS[arch]
    data = _data_dict(dg)

    def body(params, data):
        shard = _unshard(data)
        lc, lv = apply_fn(params, shard, ms, n_pad, ax,
                          dp_rate, train, rng)
        return lc[None], lv[None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), {f: P(ax) for f in data}),
                   out_specs=(P(ax), P(ax)), check_vma=False)
    lc, lv = fn(params, data)
    return lc.reshape(-1, 3), lv.reshape(-1, 3)


def make_dist_train_step(loss_name: str, optimizer, mesh: Mesh,
                         ax: str = "edge", dp_rate: float = 0.1,
                         arch: str = "GCN_FC"):
    """Distributed training step over the ``edge`` axis; jit-able."""
    dist_loss = DIST_LOSSES[loss_name]
    apply_fn = DIST_MODELS[arch]

    def body(params, data, rng, lr, n_shards):
        shard = _unshard(data)
        ms = shard["c_feas"].shape[0]
        n_pad = shard["v_feas"].shape[0] * n_shards

        def compute_loss(params):
            lc, lv = apply_fn(params, shard, ms, n_pad, ax,
                              dp_rate, train=True, rng=rng)
            loss = dist_loss(lc, lv, shard["y_s"], shard["y_t"],
                             shard["cons_mask"], shard["vars_mask"], ax)
            # Under check_vma=False the transpose of a plain psum is another
            # psum, which inflates the cotangent by D for the loss-reduction
            # psums (every shard re-computes the same replicated scalar).
            # Scaling the per-shard loss by 1/D cancels that inflation
            # exactly, so psum(per-shard grads) is the exact global gradient;
            # all_gather/psum_scatter in the layers are true transposes of
            # each other and need no correction.
            return loss / n_shards

        loss, grads = jax.value_and_grad(compute_loss)(params)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, ax), grads)
        return loss * n_shards, grads

    def train_step(params, opt_state, dg: PartitionedGraph, rng, lr):
        data = _data_dict(dg)
        fn = shard_map(partial(body, n_shards=dg.n_shards), mesh=mesh,
                       in_specs=(P(), {f: P(ax) for f in data},
                                 P(), P()),
                       out_specs=(P(), P()), check_vma=False)
        loss, grads = fn(params, data, rng, lr)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
