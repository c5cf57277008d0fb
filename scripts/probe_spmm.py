"""On-chip microbenchmarks for SpMM formulation candidates.

Probes the primitives a gather-free SpMM would be built from, to decide
whether the measured XLA row-gather ceiling (~135 Mrow/s, RESULTS.md) is
hardware or a lowering artifact:

  1. row gather        y = x[idx]            (the current hot cost)
  2. window gather     y = xw[win_idx]       (coarse gather of 128-row blocks)
  3. HBM transpose     swapaxes on a ~1 GB array (permutation-pass cost)
  4. one-hot window contraction (XLA einsum)  (gather-as-matmul cost)
  5. isolated blocked_spmm einsum traversal   (current path, for reference)
  6. dense bmm of equal FLOPs                 (MXU attainable rate)

Run on the real chip:  python scripts/probe_spmm.py
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lp_gnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

E = 1_000_000
M = 65_536
N = 131_072
D = 256


def timeit(name, fn, *args, n_warm=2, n_iter=10):
    fn = jax.jit(fn)
    for _ in range(n_warm):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n_iter):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / n_iter
    print(f"{name:<44s} {dt*1e3:8.2f} ms")
    return dt


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # host xfer = true sync on axon


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}")

    for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        x = jax.device_put(rng.randn(N, D).astype(np.float32).astype(dt), dev)
        idx = jax.device_put(rng.randint(0, N, E).astype(np.int32), dev)
        d = timeit(f"1. row gather (E={E/1e6:.0f}M, D={D}, {dt_name})",
                   lambda x, i: x[i], x, idx)
        print(f"     -> {E/d/1e6:8.1f} Mrow/s, {E*D*x.dtype.itemsize/d/2**30:7.1f} GiB/s")

    # 2. window gather: 128-row aligned windows as single gathered rows
    x = jax.device_put(rng.randn(N, D).astype(np.float32).astype(jnp.bfloat16), dev)
    for nwin, rows in [(2048, 128), (1024, 256)]:
        xw = x.reshape(N // rows, rows * D)
        widx = jax.device_put(rng.randint(0, N // rows, nwin).astype(np.int32), dev)
        nbytes = nwin * rows * D * 2
        d = timeit(f"2. window gather ({nwin} x {rows} rows, bf16)",
                   lambda xw, w: xw[w], xw, widx)
        print(f"     -> {nbytes/d/2**30:7.1f} GiB/s effective")

    # 3. permutation-pass transpose, ~1 GiB bf16
    a = jax.device_put(rng.randn(2048, 32, 32, D).astype(np.float32).astype(jnp.bfloat16), dev)
    nbytes = a.size * 2
    d = timeit("3. HBM transpose (2048,32,32,256)->(1,0,2,3)",
               lambda a: jnp.swapaxes(a, 0, 1), a)
    print(f"     -> {2*nbytes/d/2**30:7.1f} GiB/s (r+w)")

    # 4. one-hot window contraction: gather-as-matmul (XLA einsum)
    #    C chunks of K edges, each chunk's srcs inside a W-row window
    K, W = 512, 256
    C = E // K
    loc = jax.device_put(rng.randint(0, W, (C, K)).astype(np.int32), dev)
    win = jax.device_put(
        rng.randn(C, W, D).astype(np.float32).astype(jnp.bfloat16), dev)

    def onehot_contract(loc, win):
        oh = (loc[..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
              ).astype(win.dtype)
        return jnp.einsum("ckw,cwd->ckd", oh, win,
                          preferred_element_type=jnp.float32)
    d = timeit(f"4. one-hot window contract C={C} K={K} W={W}",
               onehot_contract, loc, win)
    print(f"     -> {2*C*K*W*D/d/1e12:7.1f} TFLOP/s effective (E rows produced: "
          f"{E/d/1e6:.0f} Mrow/s)")

    # 5. current blocked_spmm einsum traversal (v2c shape: 512 chunks x K=2048)
    from lp_gnn_tpu.ops.spmm import blocked_spmm
    from lp_gnn_tpu.data.batching import block_layout, pick_block_k
    row = np.sort(rng.randint(0, M, E).astype(np.int32))
    col = rng.randint(0, N, E).astype(np.int32)
    val = rng.rand(E).astype(np.float32)
    Kb = pick_block_k(E, M)
    bs, bd, bv, bo, nblk = block_layout(row, col, val, M, K=Kb)
    print(f"   [blocked layout: {bs.shape[0]} chunks x K={Kb}, {nblk} blocks]")
    args = [jax.device_put(a, dev) for a in (bs, bd, bv, bo)]
    xv = jax.device_put(rng.randn(N, D).astype(np.float32).astype(jnp.bfloat16), dev)
    d = timeit("5. blocked_spmm einsum traversal (v2c)",
               lambda s, dd, v, o, x: blocked_spmm(s, dd, v, o, x, None, nblk),
               *args, xv)
    print(f"     -> {E/d/1e6:8.1f} Medge/s")

    # 5b. its pieces: gather+mul alone, contraction alone
    d = timeit("5b. gather+mul msg build alone",
               lambda s, v, x: x[s] * v[..., None].astype(x.dtype),
               args[0], args[2], xv)
    msg = (xv[args[0]] * args[2][..., None].astype(xv.dtype))
    d = timeit("5c. one-hot dst contract alone (R=128)",
               lambda dd, m: jnp.einsum(
                   "bkr,bkd->brd",
                   (dd[..., None] == jax.lax.broadcasted_iota(
                       jnp.int32, (1, 1, 128), 2)).astype(m.dtype), m,
                   preferred_element_type=jnp.float32),
               args[1], msg)

    # 6. dense bmm at the window-contract shape = MXU attainable
    a6 = jax.device_put(rng.randn(C, K, W).astype(np.float32).astype(jnp.bfloat16), dev)
    d = timeit("6. dense bmm (C,K,W)@(C,W,D)",
               lambda a, b: jnp.einsum("ckw,cwd->ckd", a, b,
                                       preferred_element_type=jnp.float32),
               a6, win)
    print(f"     -> {2*C*K*W*D/d/1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
