"""Combined 2-D (dp x edge) training step: a batch of graphs sharded over
the ``dp`` axis, each graph edge-partitioned over the ``edge`` axis.

This is the framework's full multi-chip configuration (SURVEY.md §2.3):
``dp`` plays the reference-absent DataParallel role (train.py:81-83), and
``edge`` is the sequence-parallel analog for graphs — edge-partitioned
full-graph execution with all_gather / reduce-scatter collectives per layer
(parallel/edge_partition.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .edge_partition import (
    SHARD_FIELDS, PartitionedGraph, partition_graph, compute_halo_width,
    _shard_sizes, attach_dist_input_agg, DIST_MODELS, DIST_LOSSES,
)
from ..data.batching import PaddedGraph


def partition_batch(pgs: list[PaddedGraph], n_edge: int,
                    halo: bool = False, input_agg_mesh: Mesh | None = None,
                    input_agg_ax: str = "edge") -> dict:
    """Partition each same-bucket graph and stack: leaves (B, D, ...).

    All graphs share one per-shard block size (the batch max of
    ``_shard_sizes``) and, with ``halo=True``, one halo width (the batch
    max), so the slot layout — and therefore every node/halo field's shape —
    is identical across the batch. The per-shard edge pad (Es) and the
    blocked-layout chunk counts are still data-dependent, so same-bucket
    graphs generally partition to different shapes; every such field is
    padded to the batch maximum with the same no-op fill conventions
    partition_graph uses internally (padding edges target the shard's last
    row / the last var or compact halo slot with val 0; padding chunks aim
    at the last destination block with val 0 — all fills keep the sorted
    segment ids ascending so ``indices_are_sorted`` stays truthful).

    ``input_agg_mesh`` (an edge-axis mesh over one mesh row) additionally
    precomputes each graph's input-conv aggregation
    (:func:`attach_dist_input_agg`) so the dp x edge step skips the input
    conv's 2 edge traversals and 2 collectives — exact for the GraphConv
    archs (the GEN softmax aggregation is params-dependent; don't pass a
    mesh for those)."""
    ms_sh = max(_shard_sizes(pg, n_edge)[0] for pg in pgs)
    ns_sh = max(_shard_sizes(pg, n_edge)[1] for pg in pgs)
    hw = max(compute_halo_width(pg, n_edge, ms=ms_sh, ns=ns_sh)
             for pg in pgs) if halo else None
    dgs = [partition_graph(pg, n_edge, halo=halo, halo_width=hw,
                           ms=ms_sh, ns=ns_sh)
           for pg in pgs]
    if input_agg_mesh is not None:
        dgs = [attach_dist_input_agg(dg, input_agg_mesh, input_agg_ax)
               for dg in dgs]
    ms = dgs[0].ms
    n_pad = dgs[0].n_pad
    nh = n_edge * hw if halo else 0
    fills = {"row_r": ms - 1, "row_c": ms - 1,
             "col_r": n_pad - 1, "col_c": n_pad - 1,
             "hcol_r": ns_sh + nh - 1, "hseg": ns_sh + nh - 1,
             "hrow": ms - 1,
             "blkr_src": 0, "blkr_dst": 127, "blkr_out": ms // 128 - 1,
             "blkc_src": 0, "blkc_dst": 127, "blkc_out": n_pad // 128 - 1,
             "blkl_r_src": 0, "blkl_r_dst": 127,
             "blkl_r_out": ms // 128 - 1,
             "blkl_c_src": 0, "blkl_c_dst": 127,
             "blkl_c_out": (n_pad // n_edge) // 128 - 1,
             "blkh_r_src": 0, "blkh_r_dst": 127,
             "blkh_r_out": ms // 128 - 1,
             "blkh_c_src": 0, "blkh_c_dst": 127,
             "blkh_c_out": -(-nh // 128) - 1}

    def pad_to(v, tgt, fill, identity_tail=False):
        if v.shape == tgt:
            return v
        if identity_tail:
            # permutation fields: padded edge positions must map to
            # themselves (a constant fill would route real positions'
            # cotangents into padded segments in the gather backwards)
            out = np.tile(np.arange(tgt[-1], dtype=v.dtype),
                          tgt[:-1] + (1,)).reshape(tgt)
        else:
            out = np.full(tgt, fill, dtype=v.dtype)
        out[tuple(slice(0, s) for s in v.shape)] = v
        return out

    batch = {}
    for f in SHARD_FIELDS:
        vals = [getattr(dg, f) for dg in dgs]
        if vals[0] is None:
            continue
        vals = [np.asarray(v) for v in vals]
        tgt = tuple(max(v.shape[i] for v in vals)
                    for i in range(vals[0].ndim))
        batch[f] = np.stack([pad_to(v, tgt, fills.get(f, 0),
                                    identity_tail=f.startswith("eperm"))
                             for v in vals])
    return batch


def make_dp_edge_train_step(loss_name: str, optimizer, mesh: Mesh,
                            dp_ax: str = "dp", edge_ax: str = "edge",
                            dp_rate: float = 0.1, train: bool = True,
                            arch: str = "GCN_FC"):
    """step(params, opt_state, batch_dict, rng, lr) over a (dp, edge) mesh.

    ``batch_dict`` comes from :func:`partition_batch`; leaf shapes are
    (B, D_edge, ...) with B divisible by the dp axis size. ``arch``
    dispatches the per-shard forward through ``DIST_MODELS`` — every
    registered arch (reference arch.py:144-289) runs dp x edge, with the
    boundary halo exchange whenever the batch carries halo layouts.
    """
    dist_loss = DIST_LOSSES[loss_name]
    apply_fn = DIST_MODELS[arch]
    n_edge = dict(zip(mesh.axis_names, mesh.devices.shape))[edge_ax]

    def body(params, data, rngs, lr):
        # local leaves: (B_local, 1, ...) -> per-graph dicts
        local = {k: v[:, 0] for k, v in data.items()}
        ms = local["c_feas"].shape[-2]
        n_pad = local["v_feas"].shape[-2] * n_edge

        def one_graph_loss(params, shard, rng):
            lc, lv = apply_fn(params, shard, ms, n_pad, edge_ax,
                              dp_rate, train=train, rng=rng)
            loss = dist_loss(lc, lv, shard["y_s"], shard["y_t"],
                             shard["cons_mask"], shard["vars_mask"], edge_ax)
            return loss / n_edge   # psum-transpose correction (edge axis)

        def mean_loss(params):
            losses = jax.vmap(partial(one_graph_loss, params))(local, rngs)
            return jax.lax.pmean(jnp.mean(losses), dp_ax)

        loss, grads = jax.value_and_grad(mean_loss)(params)
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.psum(g, edge_ax), dp_ax), grads)
        return loss * n_edge, grads

    @jax.jit
    def step(params, opt_state, batch, rng, lr):
        nb = next(iter(batch.values())).shape[0]
        rngs = jax.random.split(rng, nb)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(), {f: P(dp_ax, edge_ax) for f in batch},
                      P(dp_ax), P()),
            out_specs=(P(), P()), check_vma=False)
        loss, grads = fn(params, batch, rngs, lr)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
