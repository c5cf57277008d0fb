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
    SHARD_FIELDS, PartitionedGraph, partition_graph, dist_gcn_fc_apply,
    DIST_LOSSES,
)
from ..data.batching import PaddedGraph


def partition_batch(pgs: list[PaddedGraph], n_edge: int) -> dict:
    """Partition each same-bucket graph and stack: leaves (B, D, ...)."""
    dgs = [partition_graph(pg, n_edge) for pg in pgs]
    return {f: np.stack([getattr(dg, f) for dg in dgs])
            for f in SHARD_FIELDS if getattr(dgs[0], f) is not None}


def make_dp_edge_train_step(loss_name: str, optimizer, mesh: Mesh,
                            dp_ax: str = "dp", edge_ax: str = "edge",
                            dp_rate: float = 0.1, train: bool = True):
    """step(params, opt_state, batch_dict, rng, lr) over a (dp, edge) mesh.

    ``batch_dict`` comes from :func:`partition_batch`; leaf shapes are
    (B, D_edge, ...) with B divisible by the dp axis size.
    """
    dist_loss = DIST_LOSSES[loss_name]
    n_edge = dict(zip(mesh.axis_names, mesh.devices.shape))[edge_ax]

    def body(params, data, rngs, lr):
        # local leaves: (B_local, 1, ...) -> per-graph dicts
        local = {k: v[:, 0] for k, v in data.items()}
        ms = local["c_feas"].shape[-2]
        n_pad = local["v_feas"].shape[-2] * n_edge

        def one_graph_loss(params, shard, rng):
            lc, lv = dist_gcn_fc_apply(params, shard, ms, n_pad, edge_ax,
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
