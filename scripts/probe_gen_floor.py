"""Probe: is the r5 GEN softmax aggregation at the memory/gather floor?

Closes VERDICT r04 item 1's alternative gate: GENDeeper reached 14.1M
trav/s (+32% over r4) against the 1.5x (16.1M) target — this probe
measures whether the remaining edge-space passes are bound by the chip's
achievable gather / segment-sum / HBM-stream rates at the exact bench
shapes (E=1M, D=256, bf16), i.e. whether "the remaining floor is
algorithmic" is a measurement instead of an assertion.

Methodology: every op is timed as the SLOPE of a ``lax.scan`` running the
op R_hi vs R_lo times inside ONE jit dispatch, carrying a tiny
data-dependent scalar through the iterations (prevents hoisting/CSE).
The tunnel's per-dispatch latency — tens of ms on axon, larger than some
of the ops themselves — cancels in the slope. Each scan is timed
best-of-3 with a float() host sync (axon's block_until_ready returns
early, CLAUDE.md).

Floors measured: (1) pure HBM stream read of the (E, D) bf16 edge
tensor; (2) row gather (E, D) <- (N, D); (3) sorted segment_max;
(4) sorted segment_sum with fp32 accumulation, at (E, D) and fused
(E, 2D); (5) ops/spmm.py gather_src fwd+bwd (transpose-ordering
backward). Against them: (6) the full GEN direction (gen_dir_apply,
models/gen.py) fwd and fwd+bwd in both LP_GNN_GEN_FUSE modes.

Reference for the aggregation semantics: arch.py:84-105 (GENConv
softmax aggregation with learnable temperature).
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lp_gnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
import os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

E = int(os.environ.get("PROBE_EDGES", 1_000_000))
M = int(os.environ.get("PROBE_CONS", 65_536))
N = int(os.environ.get("PROBE_VARS", 131_072))
D = int(os.environ.get("PROBE_HIDS", 256))
R_LO = int(os.environ.get("PROBE_RLO", 2))
R_HI = int(os.environ.get("PROBE_RHI", 10))
ONLY = os.environ.get("PROBE_ONLY", "")   # "gen" skips the primitive floors
DTYPE = jnp.bfloat16
PASS_GB = E * D * 2 / 1e9   # one (E, D) bf16 HBM pass


def _scan_time(fn, args, R, n_iter=3):
    """Best-of-n wall time of one jit dispatch running ``fn`` R times in a
    scan. ``fn(c, *args) -> array``; the carry perturbs the inputs inside
    ``fn`` so iterations cannot be hoisted or CSE'd."""
    def scanned(*a):
        def body(c, _):
            y = fn(c, *a)
            c2 = (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(jnp.float32)
            return c2, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
        return c
    j = jax.jit(scanned)
    float(j(*args))            # compile + warm
    best = np.inf
    for _ in range(n_iter):
        t0 = time.time()
        float(j(*args))
        best = min(best, time.time() - t0)
    return best


def slope(name, fn, *args):
    t_lo = _scan_time(fn, args, R_LO)
    t_hi = _scan_time(fn, args, R_HI)
    dt = (t_hi - t_lo) / (R_HI - R_LO)
    print(f"{name:<46s} {dt*1e3:9.2f} ms/iter   "
          f"({PASS_GB/dt:7.1f} GB/s per (E,D)-bf16-pass equivalent)")
    return dt


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}, E={E} M={M} N={N} D={D} dtype=bf16, "
          f"slope over R={R_LO}->{R_HI} scan iterations")
    row = np.sort(rng.randint(0, M, E).astype(np.int32))
    col = rng.randint(0, N, E).astype(np.int32)
    x_src = jax.device_put(
        (rng.rand(N, D).astype(np.float32) - 0.5).astype(DTYPE), dev)
    seg = jax.device_put(row, dev)
    ids = jax.device_put(col, dev)
    edge_stream = jax.device_put(
        (rng.rand(E, D).astype(np.float32) * 0.5).astype(DTYPE), dev)

    if ONLY == "gen":
        # r5 measured floors on this chip (slope method, R=2->10) so the
        # GEN-only rerun can still print the equivalents
        t_read, t_gather, t_smax, t_ssum, t_ssum2, t_gfb = (
            5.4e-4, 4.35e-3, 1.285e-2, 1.264e-2, 1.896e-2, 1.991e-2)
    else:
        t_read = slope("1. HBM stream read (E,D) bf16",
                       lambda c, a: a + c.astype(a.dtype), edge_stream)
        t_gather = slope("2. row gather (E,D) <- (N,D) table",
                         lambda c, x, i: (x + c.astype(x.dtype))[i],
                         x_src, ids)
        t_smax = slope(
            "3. sorted segment_max (E,D)->(M,D)",
            lambda c, a, s: jax.ops.segment_max(a + c.astype(a.dtype), s,
                                                num_segments=M,
                                                indices_are_sorted=True),
            edge_stream, seg)
        t_ssum = slope(
            "4a. sorted segment_sum (E,D)->(M,D) f32 acc",
            lambda c, a, s: jax.ops.segment_sum(
                (a + c.astype(a.dtype)).astype(jnp.float32), s,
                num_segments=M, indices_are_sorted=True),
            edge_stream, seg)
        t_ssum2 = slope(
            "4b. fused sorted segment_sum (E,2D) f32 acc",
            lambda c, a, s: jax.ops.segment_sum(
                jnp.concatenate([a + c.astype(a.dtype), a * a], axis=1)
                .astype(jnp.float32), s, num_segments=M,
                indices_are_sorted=True),
            edge_stream, seg)

    from lp_gnn_tpu.ops.spmm import gather_src
    perm = np.argsort(col, kind="stable").astype(np.int32)
    t_seg_np = col[perm]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(E, dtype=np.int32)
    t_seg = jax.device_put(t_seg_np, dev)
    perm_to_t = jax.device_put(inv, dev)

    def gather_fb(c, x):
        def loss(xx):
            return jnp.sum(gather_src(xx, ids, t_seg, perm_to_t, N)
                           .astype(jnp.float32))
        return jax.grad(loss)(x + c.astype(x.dtype))
    if ONLY != "gen":
        t_gfb = slope("5. gather_src fwd+bwd (E,D)", gather_fb, x_src)

    from lp_gnn_tpu.models.gen import gen_dir_init, gen_dir_apply
    p = gen_dir_init(jax.random.PRNGKey(0), D, D, D)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(DTYPE) if a.dtype == jnp.float32 else a, p)
    x_dst = jax.device_put(
        (rng.rand(M, D).astype(np.float32) - 0.5).astype(DTYPE), dev)
    val = jax.device_put(rng.rand(E).astype(np.float32) - 0.5, dev)
    nnz = jnp.int32(E)

    def gen_fwd(c, x):
        return gen_dir_apply(p, ids, seg, val, x + c.astype(x.dtype),
                             x_dst, M, nnz, t_seg, perm_to_t, N)

    def gen_fb(c, x):
        def loss(xx):
            return jnp.sum(gen_dir_apply(p, ids, seg, val, xx, x_dst, M,
                                         nnz, t_seg, perm_to_t, N)
                           .astype(jnp.float32))
        return jax.grad(loss)(x + c.astype(x.dtype))

    for fuse in ("1", "0"):
        os.environ["LP_GNN_GEN_FUSE"] = fuse
        tag = "fused" if fuse == "1" else "two-scatter"
        t_f = slope(f"6. GEN dir fwd ({tag})", gen_fwd, x_src)
        t_fb = slope(f"6. GEN dir fwd+bwd ({tag})", gen_fb, x_src)
        print(f"   -> {tag}: fwd = {t_f/t_read:.2f} read / "
              f"{t_f/t_gather:.2f} gather / {t_f/t_ssum:.2f} segsum "
              f"equivalents; fwd+bwd = {t_fb/t_read:.2f} read / "
              f"{t_fb/t_gather:.2f} gather / {t_fb/t_ssum:.2f} segsum")
    os.environ["LP_GNN_GEN_FUSE"] = "1"
    print("\nfloor accounting (fused): algorithm needs >= gather(xs) + "
          "segmax + segsum(E,2D) fwd; + cotangent gather (E,2D) + "
          "transpose segsum (E,D) + exp-bwd read bwd")
    need_f = t_gather + t_smax + t_ssum2
    need_fb = need_f + t_gather + t_ssum2 + t_gfb
    print(f"   sum-of-floors fwd ~= {need_f*1e3:.1f} ms, "
          f"fwd+bwd ~= {need_fb*1e3:.1f} ms")


if __name__ == "__main__":
    main()
