"""Multi-host (DCN) dry run: one dp x edge distributed train step executed by
N cooperating processes (SURVEY.md §5 comm-backend row: "DCN across hosts via
``jax.distributed.initialize``").

Each process contributes its local devices to one global mesh; the training
step itself is the same shard_map program the single-process path uses —
collectives cross process boundaries transparently once
``jax.distributed.initialize`` has run.

Launch one process per host (CPU simulation of 2 hosts x 4 devices):

    for i in 0 1; do
      LP_GNN_DIST_COORD=localhost:9911 LP_GNN_DIST_NPROCS=2 \
      LP_GNN_DIST_PROC_ID=$i LP_GNN_PLATFORM=cpu \
      python scripts/dryrun_multihost.py --local_devices 4 --mesh dp=2,edge=4 &
    done; wait

Prints one JSON line from process 0: {"ok": true, "mesh": ..., "loss": ...}.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local_devices", type=int, default=4,
                    help="virtual CPU devices per process (CPU mode only)")
    ap.add_argument("--mesh", type=str, default="dp=2,edge=4")
    ap.add_argument("--edges", type=int, default=320)
    args = ap.parse_args()

    # device-count flag must precede backend init (CPU simulation only)
    if os.environ.get("LP_GNN_PLATFORM", "") == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.local_devices}")
    import jax
    if os.environ.get("LP_GNN_PLATFORM", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from lp_gnn_tpu.parallel.mesh import (maybe_init_distributed, make_mesh,
                                          parse_mesh_shape)
    dist = maybe_init_distributed()
    shape = parse_mesh_shape(args.mesh)
    n_want = 1
    for v in shape.values():
        n_want *= v
    assert len(jax.devices()) >= n_want, (
        f"{len(jax.devices())} global devices < mesh {shape}")

    import numpy as np
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_graph
    from lp_gnn_tpu.models.gcn import build_model
    from lp_gnn_tpu.parallel.combined import (partition_batch,
                                              make_dp_edge_train_step)
    from lp_gnn_tpu.train.trainer import make_optimizer

    mesh = make_mesh(shape)
    dp = shape.get("dp", 1)
    n_edge = shape.get("edge", 1)
    # identical host data in every process (the documented jit contract for
    # replicated numpy inputs under multi-process JAX)
    pgs = [_tiny_graph(seed=s, e=args.edges) for s in range(dp)]
    batch = partition_batch(pgs, n_edge)

    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("adam")
    opt_state = optimizer.init(params)
    step = make_dp_edge_train_step("balanced", optimizer, mesh, dp_rate=0.0)
    params, opt_state, loss = step(params, opt_state, batch,
                                   jax.random.PRNGKey(0), jnp.float32(1e-3))
    loss = float(loss)
    assert np.isfinite(loss), loss
    if jax.process_index() == 0:
        print(json.dumps({
            "ok": True, "distributed": dist,
            "num_processes": jax.process_count(),
            "global_devices": len(jax.devices()),
            "mesh": {k: int(v) for k, v in shape.items()},
            "loss": round(loss, 6),
        }))


if __name__ == "__main__":
    main()
