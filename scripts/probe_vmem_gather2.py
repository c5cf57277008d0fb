"""Probe 2b: which in-kernel VMEM gather forms lower on this Mosaic, and
their rates. V1 = take_along_axis (indices shaped like output)."""
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


def run(name, make, *args, n_iter=10):
    try:
        fn = jax.jit(make)
        out = fn(*args)
        out.block_until_ready()
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(n_iter):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / n_iter
        print(f"{name:<56s} {dt*1e3:8.2f} ms")
        return dt, out
    except Exception as ex:
        print(f"{name:<56s} FAILED: {type(ex).__name__}: {str(ex)[:200]}")
        return None, None


def make_call(kernel, C, K, S, dtype):
    return pl.pallas_call(
        partial(kernel, K=K),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, D), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * K, D), dtype),
    )


def k_take_along(idx_ref, table_ref, out_ref, *, K):
    idx = idx_ref[0, 0]                                   # (K,)
    idx2 = jnp.broadcast_to(idx[:, None], (K, D))
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)


def k_vector_index(idx_ref, table_ref, out_ref, *, K):
    out_ref[:] = table_ref[idx_ref[0, 0], :]


def main():
    rng = np.random.RandomState(0)
    S = 8192
    E = 1 << 20
    table = jnp.asarray(rng.randn(S, D).astype(np.float32),
                        dtype=jnp.bfloat16)
    idxs = rng.randint(0, S, E).astype(np.int32)
    ref = np.asarray(table)[idxs[:2048]]

    for K in (512, 2048):
        C = E // K
        idx = jnp.asarray(idxs).reshape(C, 1, K)
        for nm, kern in [("take_along_axis", k_take_along),
                         ("vector-index", k_vector_index)]:
            d, out = run(f"{nm} K={K} S={S}",
                         make_call(kern, C, K, S, table.dtype), idx, table)
            if d:
                ok = np.allclose(np.asarray(out[:2048], np.float32),
                                 ref.astype(np.float32))
                print(f"     -> {E/d/1e6:8.1f} Mrow/s   correct={ok}")

    # bigger table: 8 MiB (16384 rows) and 2048 rows
    for S2 in (2048, 16384, 32768):
        table2 = jnp.asarray(rng.randn(S2, D).astype(np.float32),
                             dtype=jnp.bfloat16)
        idx2 = jnp.asarray(rng.randint(0, S2, E).astype(np.int32)
                           ).reshape(E // 2048, 1, 2048)
        d, out = run(f"take_along_axis K=2048 S={S2}",
                     make_call(k_take_along, E // 2048, 2048, S2,
                               table2.dtype), idx2, table2)
        if d:
            print(f"     -> {E/d/1e6:8.1f} Mrow/s")


if __name__ == "__main__":
    main()
