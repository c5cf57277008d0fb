"""Generate a synthetic LP family into the dataset layout.

Role of reference scripts/generate_mps_files.py (whose CPLEX path is dead in
the snapshot) — here fully self-contained.

Usage:
    python scripts/generate_data.py --dataset mirp_like --n_instances 40 \
        [--family mirp_like] [--size small|demo|bench]
"""
import argparse
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from lp_gnn_tpu.config import parse_args  # noqa: E402
from lp_gnn_tpu import pipeline  # noqa: E402

SIZES = {
    # family -> kwargs per size tier
    "mirp_like": {
        "small": dict(n_ports=4, n_periods=6),
        "demo": dict(n_ports=15, n_periods=30, arc_density=0.4),
        "bench": dict(n_ports=30, n_periods=60, arc_density=0.3),
    },
    "mirp_mix": {
        # hardness-mixed family (VERDICT r03 item 1): per-instance draws of
        # ports/periods/density/tightness — ranges ARE the size knobs
        "small": dict(n_ports_range=(3, 6), n_periods_range=(4, 10),
                      arc_density_range=(0.4, 0.6),
                      tightness_range=(0.8, 1.2)),
        "demo": dict(n_ports_range=(10, 20), n_periods_range=(15, 45),
                     arc_density_range=(0.3, 0.5),
                     tightness_range=(0.8, 1.2)),
        "bench": dict(),   # generator defaults: the reference-population mix
    },
    "mirp_degen": {
        # degeneracy-controlled mirp (VERDICT r04 item 2): bench-tier
        # structure fixed to the mirp_bench knobs, the dataset *name*
        # selects the dual-degeneracy level
        "small": dict(n_ports=4, n_periods=6, degeneracy=0.5),
        "bench_d3": dict(n_ports=30, n_periods=60, arc_density=0.3,
                         degeneracy=0.3),
        "bench_d6": dict(n_ports=30, n_periods=60, arc_density=0.3,
                         degeneracy=0.6),
        "bench_d9": dict(n_ports=30, n_periods=60, arc_density=0.3,
                         degeneracy=0.9),
    },
    "transport": {
        "small": dict(m_src=6, n_dst=9),
        "demo": dict(m_src=40, n_dst=60),
        "bench": dict(m_src=120, n_dst=200),
    },
    "netflow": {
        "small": dict(n_nodes=20, density=0.2),
        "demo": dict(n_nodes=150, density=0.08),
        "bench": dict(n_nodes=600, density=0.02),
    },
    "packing": {
        "small": dict(m=20, n=40),
        "demo": dict(m=200, n=400),
        "bench": dict(m=800, n=1600),
    },
    "stoch": {
        "small": dict(n_first=6, n_scen=4, m_scen=8),
        "demo": dict(n_first=30, n_scen=25, m_scen=40),
        "bench": dict(n_first=60, n_scen=60, m_scen=60),
    },
    "svm": {
        "small": dict(m_samples=40, n_features=12),
        "demo": dict(m_samples=300, n_features=60),
        "bench": dict(m_samples=1500, n_features=200),
    },
    "miplib_like": {
        "small": dict(n_items=12, n_bins=4, n_knap=5, n_cover=5),
        "demo": dict(n_items=60, n_bins=12, n_knap=30, n_cover=30),
        "bench": dict(n_items=200, n_bins=25, n_knap=120, n_cover=120,
                      density=0.1),
    },
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_instances", type=int, default=40)
    ap.add_argument("--family", type=str, default=None)
    ap.add_argument("--size", type=str, default="demo")
    known, rest = ap.parse_known_args()
    cfg = parse_args(rest, make_log_dir=False)
    family = known.family or cfg.dataset.split("-")[0]
    kwargs = SIZES.get(family, {}).get(known.size, {})
    fns = pipeline.stage_generate(cfg, family, known.n_instances, **kwargs)
    print(f"wrote {len(fns)} instances under {cfg.dataset_prefix}/mps")
