"""Single-chip full-graph training at 10^7-10^8 edges.

Measures the HBM-streaming scan SpMM path (ops/spmm.py _blocked_spmm_scan)
on one chip at scales where the reference abandons full-graph execution
for neighbor sampling (edge_num_thresh = 1.2e7, utils.py:808). Device
memory diet: COO edge arrays stripped (data/batching.py strip_coo),
input-conv aggregation precomputed (attach_input_agg), streaming budget
capped via LP_GNN_SPMM_BUDGET.

Usage:
  python scripts/bench_big.py --edges 100000000 --cons 262144 \
      --vars 524288 --hids 256 [--steps 2] [--budget 1073741824]

Prints one JSON line with step time and edge-traversals/s (x6 semantic
counting; see bench.py).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--cons", type=int, default=262_144)
    ap.add_argument("--vars", type=int, default=524_288)
    ap.add_argument("--hids", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--budget", type=int, default=1 << 30)
    ap.add_argument("--remat", type=int, default=0)
    args = ap.parse_args()
    os.environ["LP_GNN_SPMM_BUDGET"] = str(args.budget)
    os.environ["BENCH_EDGES"] = str(args.edges)
    os.environ["BENCH_CONS"] = str(args.cons)
    os.environ["BENCH_VARS"] = str(args.vars)
    os.environ["BENCH_HIDS"] = str(args.hids)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/lp_gnn_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import bench
    from lp_gnn_tpu.data.batching import strip_coo
    from lp_gnn_tpu.models.gcn import build_model
    from lp_gnn_tpu.ops.spmm import attach_input_agg
    from lp_gnn_tpu.train.trainer import make_optimizer, make_train_step

    t0 = time.time()
    pg = strip_coo(bench.make_graph())
    print(f"host graph build: {time.time()-t0:.1f}s", file=sys.stderr)

    dev = jax.devices()[0]
    remat = ",remat=True" if args.remat else ""
    model = build_model(
        f"GCN_FC(8,8,hids={args.hids},depth=3,dtype='bfloat16'{remat})")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("adam")
    opt_state = optimizer.init(params)
    step = make_train_step(model, "balanced", optimizer)
    t0 = time.time()
    pg_d = attach_input_agg(jax.device_put(pg, dev), jnp.bfloat16)
    print(f"upload+input-agg: {time.time()-t0:.1f}s", file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)
    # compile + 3 warmup steps: the first executions of a freshly compiled
    # program are up to 10x slow on the tunneled runtime (one-time server-
    # side warm); steady state needs ~2 executions
    for _ in range(3):
        params, opt_state, loss, _ = step(params, opt_state, pg_d, rng, lr)
    float(loss)
    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, loss, _ = step(params, opt_state, pg_d, rng, lr)
    float(loss)
    dt = (time.time() - t0) / args.steps
    print(json.dumps({
        "edges": args.edges, "step_time_s": round(dt, 3),
        "traversals_per_s": round(args.edges * 6 / dt, 1),
        "remat": bool(args.remat), "budget": args.budget,
    }))


if __name__ == "__main__":
    main()
