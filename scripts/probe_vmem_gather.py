"""Probe 2: Mosaic VMEM dynamic-gather rate + XLA lax.gather hint flags.

Decides the next SpMM design (see scripts/probe_spmm.py for round 1):
 A. Pallas kernel with an x-shard resident in VMEM, gathering K rows per
    grid step by an int32 index vector — the primitive behind a fully
    fused shard-resident SpMM.
 B. jax.lax.gather with indices_are_sorted / unique_indices /
    PROMISE_IN_BOUNDS, in case XLA has a faster path behind hints.
 C. gather rate vs row byte-width (int8 / bf16 / f32) at D=256.
"""
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lp_gnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D = 256


def timeit(name, fn, *args, n_warm=2, n_iter=10):
    try:
        fn = jax.jit(fn)
        for _ in range(n_warm):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(n_iter):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.time() - t0) / n_iter
        print(f"{name:<52s} {dt*1e3:8.2f} ms")
        return dt
    except Exception as ex:
        print(f"{name:<52s} FAILED: {type(ex).__name__}: {str(ex)[:160]}")
        return None


# ---------------- A. Pallas VMEM-table gather ----------------

def vmem_gather_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[0, 0], axis=0)


def pallas_vmem_gather(idx, table, K):
    C = idx.shape[0] // K
    S = table.shape[0]
    return pl.pallas_call(
        vmem_gather_kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, D), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * K, D), table.dtype),
    )(idx.reshape(C, 1, K), table)


def vmem_gather_loop_kernel(idx_ref, table_ref, out_ref, *, K):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[0, 0, i], 1), :]
        return 0
    jax.lax.fori_loop(0, K, body, 0)


def pallas_vmem_gather_loop(idx, table, K):
    C = idx.shape[0] // K
    S = table.shape[0]
    return pl.pallas_call(
        partial(vmem_gather_loop_kernel, K=K),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, D), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * K, D), table.dtype),
    )(idx.reshape(C, 1, K), table)


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}")

    S = 8192                      # VMEM table rows (8192x256 bf16 = 4 MiB)
    E = 1 << 20
    table = jax.device_put(
        rng.randn(S, D).astype(np.float32).astype(jnp.bfloat16), dev)
    idx = jax.device_put(rng.randint(0, S, E).astype(np.int32), dev)

    for K in (512, 2048):
        d = timeit(f"A1. pallas VMEM take-gather (K={K}, S={S})",
                   partial(pallas_vmem_gather, K=K), idx, table)
        if d:
            print(f"     -> {E/d/1e6:8.1f} Mrow/s")
    d = timeit(f"A2. pallas VMEM per-row loop gather (K=512)",
               partial(pallas_vmem_gather_loop, K=512), idx, table)
    if d:
        print(f"     -> {E/d/1e6:8.1f} Mrow/s")

    # XLA gather from the same small table, for comparison
    d = timeit("A3. XLA gather from 4MiB table", lambda t, i: t[i], table, idx)
    if d:
        print(f"     -> {E/d/1e6:8.1f} Mrow/s")

    # ---------------- B. lax.gather hint flags ----------------
    N = 131_072
    x = jax.device_put(
        rng.randn(N, D).astype(np.float32).astype(jnp.bfloat16), dev)
    bidx = jax.device_put(rng.randint(0, N, E).astype(np.int32), dev)
    sidx = jax.device_put(np.sort(rng.randint(0, N, E)).astype(np.int32), dev)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def hinted(x, i, sorted_):
        return jax.lax.gather(
            x, i[:, None], dnums, slice_sizes=(1, D),
            indices_are_sorted=sorted_, unique_indices=False,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    d = timeit("B1. lax.gather hints (random idx)",
               partial(hinted, sorted_=False), x, bidx)
    if d:
        print(f"     -> {E/d/1e6:8.1f} Mrow/s")
    d = timeit("B2. lax.gather hints (sorted idx + flag)",
               partial(hinted, sorted_=True), x, sidx)
    if d:
        print(f"     -> {E/d/1e6:8.1f} Mrow/s")

    # ---------------- C. byte-width dependence ----------------
    for nm, dt in [("int8", jnp.int8), ("bf16", jnp.bfloat16),
                   ("f32", jnp.float32)]:
        xx = jax.device_put(
            (rng.randn(N, D) * 10).astype(np.float32).astype(dt), dev)
        d = timeit(f"C. gather rate {nm} (D={D})", lambda x, i: x[i], xx, bidx)
        if d:
            print(f"     -> {E/d/1e6:8.1f} Mrow/s")

    # D. streaming ceiling: elementwise copy of 1 GiB
    big = jax.device_put(
        rng.randn(2048, 256, 1024).astype(np.float32).astype(jnp.bfloat16), dev)
    d = timeit("D. stream x+1 on 1 GiB bf16", lambda a: a + 1, big)
    if d:
        print(f"     -> {2*big.size*2/d/2**30:7.1f} GiB/s (r+w)")


if __name__ == "__main__":
    main()
