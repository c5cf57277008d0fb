"""Edge-partition scaling harness: step time of the distributed training
step at 1..D shards (BASELINE.json scaling-efficiency configs).

On a real multi-chip slice this measures ICI scaling of the
all-gather/reduce-scatter layer collectives; on a single-chip or CPU host it
runs the same program over a virtual device mesh (functional validation +
collective overhead visibility, not a hardware scaling claim — the harness
prints which mode it ran in).

Usage: python bench_scaling.py [--devices 8] [--edges 200000] [--hids 128]
"""
import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="0 = all available real devices; with "
                         "LP_GNN_PLATFORM=cpu, size of the virtual CPU mesh")
    ap.add_argument("--edges", type=int, default=200_000)
    ap.add_argument("--cons", type=int, default=16_384)
    ap.add_argument("--vars", type=int, default=32_768)
    ap.add_argument("--hids", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--halo", action="store_true",
                    help="boundary halo exchange instead of the "
                         "all-gather/reduce-scatter decomposition")
    args = ap.parse_args()

    # decide the platform BEFORE the first backend touch: a virtual mesh
    # needs the host-device-count XLA flag set pre-initialization.
    # LP_GNN_PLATFORM=cpu selects the virtual CPU mesh; otherwise the REAL
    # backend is always used (a multi-chip slice measures ICI scaling) and
    # --devices is capped to the hardware count.
    force_cpu = os.environ.get("LP_GNN_PLATFORM", "") == "cpu"
    if force_cpu and args.devices > 1:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    # multi-host: LP_GNN_DIST_* env vars connect this process to the fleet
    # before any device query (scripts/dryrun_multihost.py is the launcher
    # template); jax.devices() then spans every host over DCN
    from lp_gnn_tpu.parallel.mesh import maybe_init_distributed
    multihost = maybe_init_distributed()
    n_real = len(jax.devices())
    if args.devices > n_real:
        print(f"# requested {args.devices} devices, capping to {n_real} "
              "(set LP_GNN_PLATFORM=cpu to simulate a larger virtual mesh)")
    want = min(args.devices or n_real, n_real)
    virtual = jax.devices()[0].platform == "cpu"

    import numpy as np
    import jax.numpy as jnp
    from bench import make_graph
    import bench as B
    B.E, B.M, B.N, B.HIDS = args.edges, args.cons, args.vars, args.hids
    from lp_gnn_tpu.models.gcn import build_model
    from lp_gnn_tpu.parallel.mesh import make_mesh
    from lp_gnn_tpu.parallel.edge_partition import (
        partition_graph, make_dist_train_step, attach_dist_input_agg)
    from lp_gnn_tpu.train.trainer import make_optimizer

    pg = make_graph()
    model = build_model(f"GCN_FC(8,8,hids={args.hids},depth=3)")
    params0 = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("adam")

    results = {}
    d = 1
    while d <= want:
        mesh = make_mesh({"edge": d}, devices=jax.devices()[:d])
        dg = attach_dist_input_agg(
            partition_graph(pg, d, halo=args.halo), mesh)
        step = jax.jit(make_dist_train_step("balanced", optimizer, mesh,
                                            dp_rate=0.0))
        params = params0
        opt_state = optimizer.init(params)
        params, opt_state, loss = step(params, opt_state, dg,
                                       jax.random.PRNGKey(0), jnp.float32(1e-3))
        float(loss)
        t0 = time.time()
        for i in range(args.steps):
            params, opt_state, loss = step(params, opt_state, dg,
                                           jax.random.PRNGKey(i),
                                           jnp.float32(1e-3))
        float(loss)
        results[d] = (time.time() - t0) / args.steps
        d *= 2

    base = results[1]
    out = {
        "mode": "virtual-cpu" if virtual else "hardware",
        "multihost": multihost,
        "collectives": "halo" if args.halo else "all-gather",
        "edges": args.edges,
        "step_time_s": {str(k): round(v, 4) for k, v in results.items()},
        "scaling_efficiency": {str(k): round(base / (v * k), 3)
                               for k, v in results.items()},
    }
    if jax.process_index() == 0:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
