"""Pallas inter-chip RDMA backend for the halo exchange.

SURVEY.md §2.3/§7 step 7 maps the reference's neighbor-sampling escape hatch
(train.py:111-116) to edge-partitioned execution with boundary exchange via
``make_async_remote_copy``. This module implements that collective: a direct
point-to-point all-to-all where each shard DMAs its per-peer boundary block
straight into the peer's receive buffer over ICI — no ring hops, every link
carries exactly one block (the halo buffers are tiny, D*Bh rows, so latency
matters more than bisection packing).

It is numerically identical to ``jax.lax.all_to_all(..., tiled=True)`` and
is selected with ``LP_GNN_HALO=pallas`` (parallel/edge_partition.py
``_halo_a2a``). On the CPU backend it runs in interpret mode, which fully
emulates the remote DMAs + semaphores — the parity tests in
tests/test_parallel.py bit-compare it against the XLA collective on the
8-device virtual mesh.

Overlap note: within the layer, XLA's async collective pairs already let the
boundary exchange fly while the interior (own-block) SpMM computes — the
dataflow in ``_dist_aggs`` is ordered so the gather is issued before the
interior work and only its consumer waits. This kernel keeps that property:
it is one program whose DMAs the scheduler can overlap the same way.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_pallas_halo() -> bool:
    return os.environ.get("LP_GNN_HALO", "") == "pallas"


def _a2a_kernel(x_ref, out_ref, send_sem, recv_sem, copy_sem, *, bh, ndev,
                ax):
    me = jax.lax.axis_index(ax)
    # own block: local DMA, no network
    local = pltpu.make_async_copy(
        x_ref.at[pl.ds(me * bh, bh)], out_ref.at[pl.ds(me * bh, bh)],
        copy_sem)
    local.start()
    # block for peer (me+s) -> that device's slot `me`; the static loop is
    # over OFFSETS so every device posts the same ndev-1 sends (uniform SPMD
    # semaphore accounting) while the peer ids stay dynamic. All transfers
    # start before any wait, so the ICI links run concurrently.
    ops = []
    for s in range(1, ndev):
        peer = jax.lax.rem(me + s, ndev)
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(peer * bh, bh)],
            dst_ref=out_ref.at[pl.ds(me * bh, bh)],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=peer,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        ops.append(rdma)
    local.wait()
    for rdma in ops:
        rdma.wait()


def pallas_all_to_all(x, ax: str, n_dev: int, bh: int):
    """Drop-in for ``lax.all_to_all(x, ax, 0, 0, tiled=True)`` on (D*Bh, F)
    halo buffers, built on inter-chip RDMA (interpret-emulated on CPU)."""
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        partial(_a2a_kernel, bh=bh, ndev=n_dev, ax=ax),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 3,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(collective_id=7),
    )(x)
