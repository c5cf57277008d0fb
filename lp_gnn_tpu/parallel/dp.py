"""Data-parallel training over graphs.

The reference is single-device (DataParallel commented out, train.py:81-83);
the TPU build shards a *batch of same-bucket padded graphs* over the ``dp``
mesh axis: params replicated, graphs split, loss averaged and grads psum'ed.
Composes with edge partitioning on a 2-D (dp, edge) mesh — see
tests/test_parallel.py and __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..data.batching import PaddedGraph
from ..models.gcn import Model
from ..train.losses import LOSS_REGISTRY
from ..train.trainer import seed_masks


def stack_graphs(pgs: list[PaddedGraph]) -> PaddedGraph:
    """Stack padded graphs with identical leaf shapes on a leading batch axis.

    Sharing a bucket (m_pad, n_pad, e_pad) is NOT sufficient: the chunked
    blocked-layout fields have data-dependent chunk counts, so two
    same-bucket graphs with different row skew cannot stack. Group by the
    full leaf-shape signature (as train/trainer.py does) before calling."""
    def sig(pg):
        return tuple(np.shape(leaf) for leaf in jax.tree.leaves(pg))
    sigs = {sig(pg) for pg in pgs}
    assert len(sigs) == 1, (
        "graphs must share identical padded leaf shapes (same bucket AND "
        f"same blocked-layout chunk counts); got {len(sigs)} signatures — "
        "group by full shape signature first (see trainer.py)")
    return jax.tree.map(lambda *xs: np.stack(xs), *pgs)


def make_dp_train_step(model: Model, loss_name: str, optimizer, mesh: Mesh,
                       ax: str = "dp", train: bool = True):
    """Returns step(params, opt_state, batch, rng, lr) where ``batch`` is a
    stacked PaddedGraph whose leading axis is divisible by mesh.shape[ax]."""
    loss_fn = LOSS_REGISTRY[loss_name]

    def per_graph_loss(params, pg, rng):
        lc, lv = model.apply(params, pg, train=train, rng=rng)
        ms, mt = seed_masks(pg)
        return loss_fn(lc, lv, pg.y_s, pg.y_t, ms, mt)

    def body(params, batch, rngs, lr):
        # batch leading axis = local graphs on this dp shard
        def mean_loss(params):
            losses = jax.vmap(lambda pg, r: per_graph_loss(params, pg, r))(
                batch, rngs)
            return jax.lax.pmean(jnp.mean(losses), ax)

        loss, grads = jax.value_and_grad(mean_loss)(params)
        # Under check_vma=False the pmean transpose (psum of 1/D) delivers
        # cotangent 1 to each local mean, so the per-shard grad equals the
        # grad of the *local* mean loss; averaging across shards gives the
        # exact grad of the global mean.
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, ax), grads)
        return loss, grads

    @jax.jit
    def step(params, opt_state, batch, rng, lr):
        nb = batch.y_s.shape[0]
        rngs = jax.random.split(rng, nb)
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(), P(ax), P(ax), P()),
                       out_specs=(P(), P()), check_vma=False)
        loss, grads = fn(params, batch, rngs, lr)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
