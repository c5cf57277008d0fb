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
                "blkr_src", "blkr_dst", "blkr_val", "blkr_out",
                "blkc_src", "blkc_dst", "blkc_val", "blkc_out",
                "halo_send", "halo_perm", "halo_ids",
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
    # halo exchange (partition_graph(halo=True)): per-pair send lists and
    # the compact-halo blocked layouts replacing blkr/blkc
    halo_send: np.ndarray | None = None  # (D, D, Bh) int32 local var rows
    halo_perm: np.ndarray | None = None  # (D, D*Bh) int32 sort perm
    halo_ids: np.ndarray | None = None   # (D, D*Bh) int32 sorted local ids
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


def partition_graph(pg: PaddedGraph, n_shards: int) -> PartitionedGraph:
    """Host-side 1D row partition of a padded graph into ``n_shards``."""
    m_pad = pg.c_feas.shape[0]
    n_pad0 = pg.v_feas.shape[0]
    # per-shard sizes rounded to the 128-row MXU block so the blocked SpMM
    # path applies shard-locally
    ms = _round_up(-(-m_pad // n_shards), 128)
    ns = _round_up(-(-n_pad0 // n_shards), 128)
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
        out[: x.shape[0]] = x
        return out.reshape(n_shards, per, *x.shape[1:])

    R_r, C_r, V_r, R_c, C_c, V_c = [], [], [], [], [], []
    for d, (r, c, v) in enumerate(shards):
        lo = d * ms
        o1 = np.lexsort((c, r))
        rr, cc, vv = pack(r[o1], c[o1], v[o1], lo)
        R_r.append(rr), C_r.append(cc), V_r.append(vv)
        o2 = np.lexsort((r, c))
        rr, cc, vv = pack(r[o2], c[o2], v[o2], lo)
        R_c.append(rr), C_c.append(cc), V_c.append(vv)

    # per-shard blocked layouts (equalize chunk counts by padding with
    # no-op chunks aimed at the last block)
    from ..data.batching import block_layout

    def stacked_blocks(shard_edges, num_dst, local_dst):
        outs = []
        for d, (r, c, v) in enumerate(shard_edges):
            lo = d * ms
            if local_dst:
                dst, src = r - lo, c
            else:
                dst, src = c, r - lo
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

    blkr = stacked_blocks(shards, ms, local_dst=True)
    blkc = stacked_blocks(shards, n_pad, local_dst=False)

    return PartitionedGraph(
        row_r=np.stack(R_r), col_r=np.stack(C_r), val_r=np.stack(V_r),
        row_c=np.stack(R_c), col_c=np.stack(C_c), val_c=np.stack(V_c),
        c_feas=shard_nodes(np.asarray(pg.c_feas), ms),
        y_s=shard_nodes(np.asarray(pg.y_s), ms),
        cons_mask=shard_nodes(np.asarray(pg.cons_mask), ms, fill=False),
        v_feas=shard_nodes(np.asarray(pg.v_feas), ns),
        y_t=shard_nodes(np.asarray(pg.y_t), ns),
        vars_mask=shard_nodes(np.asarray(pg.vars_mask), ns, fill=False),
        blkr_src=blkr[0], blkr_dst=blkr[1], blkr_val=blkr[2], blkr_out=blkr[3],
        blkc_src=blkc[0], blkc_dst=blkc[1], blkc_val=blkc[2], blkc_out=blkc[3],
        n_shards=n_shards,
    )


# ----------------------------------------------------------- per-shard kernels
def _dist_aggs(shard, left_local, right_local, ms, n_pad, ax):
    """Both aggregation directions of one distributed bidir conv:
    agg_c = (A right)_local rows, agg_v = reduce-scattered (A^T left)."""
    from ..ops.spmm import blocked_spmm
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


DIST_LOSSES = {"balanced": dist_balanced_loss, "unbalanced": dist_unbalanced_loss}


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
               dp_rate: float = 0.1, train: bool = False, rng=None):
    """Full-graph distributed forward. Returns gathered logits
    ((m_pad_total, 3), (n_pad_total, 3))."""
    ms, n_pad = dg.ms, dg.n_pad
    data = _data_dict(dg)

    def body(params, data):
        shard = _unshard(data)
        lc, lv = dist_gcn_fc_apply(params, shard, ms, n_pad, ax,
                                   dp_rate, train, rng)
        return lc[None], lv[None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), {f: P(ax) for f in data}),
                   out_specs=(P(ax), P(ax)), check_vma=False)
    lc, lv = fn(params, data)
    return lc.reshape(-1, 3), lv.reshape(-1, 3)


def make_dist_train_step(loss_name: str, optimizer, mesh: Mesh,
                         ax: str = "edge", dp_rate: float = 0.1):
    """Distributed training step over the ``edge`` axis; jit-able."""
    dist_loss = DIST_LOSSES[loss_name]

    def body(params, data, rng, lr, n_shards):
        shard = _unshard(data)
        ms = shard["c_feas"].shape[0]
        n_pad = shard["v_feas"].shape[0] * n_shards

        def compute_loss(params):
            lc, lv = dist_gcn_fc_apply(params, shard, ms, n_pad, ax,
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
