"""Produce SCALING_r{N}.json: virtual-mesh step times for both collective
modes at 1/2/4/8 shards plus the banded-graph halo wire volume, on the
CURRENT halo/partition code (VERDICT r05 item 8 — SCALING_r03.json predates
the r4 vectorized-halo/partition-cache changes and the r5 GEN fusion).

    LP_GNN_PLATFORM=cpu PYTHONPATH=/root/repo python \
        scripts/make_scaling_artifact.py --round 5

Step times run bench_scaling.py in subprocesses (each mesh width needs its
own XLA host-device-count, set before backend init). Honestly labeled: on a
2-core host the virtual mesh validates the distributed program and shows
collective overhead; it is NOT a hardware scaling claim.
"""
import argparse
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_mode(devices: int, halo: bool) -> dict:
    """One bench_scaling.py subprocess sweeps widths 1..devices (doubling)
    for one collective mode and prints a JSON line with step_time_s."""
    env = dict(os.environ, LP_GNN_PLATFORM="cpu")
    cmd = [sys.executable, osp.join(ROOT, "bench_scaling.py"),
           "--devices", str(devices)] + (["--halo"] if halo else [])
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=3600).stdout.strip().splitlines()
    return json.loads(out[-1])


def wire_volume():
    """Halo vs all-gather rows moved per shard per layer on the banded
    mirp-like graph (same construction as tests/test_parallel.py)."""
    from lp_gnn_tpu.data.batching import pad_graph
    from lp_gnn_tpu.data.dataset import BipartiteGraph
    from lp_gnn_tpu.parallel.edge_partition import partition_graph
    rng = np.random.RandomState(0)
    m, n, e, band = 2048, 4096, 16384, 64
    row = rng.randint(0, m, e).astype(np.int32)
    center = (row.astype(np.int64) * n) // m
    col = np.clip(center + rng.randint(-band // 2, band // 2 + 1, e),
                  0, n - 1).astype(np.int32)
    g = BipartiteGraph(row=row, col=col,
                       val=(rng.rand(e).astype(np.float32) - 0.5),
                       c_feas=rng.rand(m, 8).astype(np.float32),
                       v_feas=rng.rand(n, 8).astype(np.float32),
                       y_s=rng.randint(0, 3, m).astype(np.int32),
                       y_t=rng.randint(0, 3, n).astype(np.int32))
    pg = pad_graph(g)
    out = {}
    for d in (2, 4, 8):
        dg = partition_graph(pg, d, halo=True)
        bh = int(dg.halo_send.shape[-1])
        out[str(d)] = {
            "halo_rows_per_shard_layer": 2 * d * bh,
            "allgather_rows_per_shard_layer": 2 * int(dg.n_pad),
            "ratio": round(d * bh / float(dg.n_pad), 4),
        }
    return {"graph": f"banded m={m} n={n} e={e} band={band} "
                     "(tests/_banded_pg construction)",
            "unit": "feature rows moved per shard per layer (x F floats)",
            "by_shards": out}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()
    steps = {}
    cfg = None
    for halo in (False, True):
        cell = run_mode(args.devices, halo)
        cfg = cfg or {k: cell[k] for k in ("edges",) if k in cell}
        key = "halo" if halo else "all-gather"
        steps[key] = cell["step_time_s"]
        print(f"{key}: {steps[key]}", flush=True)
    art = {
        "round": args.round,
        "mode": "virtual-cpu (2 physical cores, "
                "xla_force_host_platform_device_count)",
        "caveat": "step times are functional validation of the distributed "
                  "program, NOT a hardware scaling claim: virtual devices "
                  "share 2 physical cores. The halo win is wire volume over "
                  "ICI (measured below + asserted in tests).",
        "step_time_s": steps,
        "config": cfg,
        "wire_volume_banded_mirp_like": wire_volume(),
    }
    out = osp.join(ROOT, f"SCALING_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
