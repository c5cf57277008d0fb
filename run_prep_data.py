"""Dataset preparation orchestrator: [generate] -> solve -> pkl -> process
(reference run_prep_data.py).

    python run_prep_data.py --dataset mirp_like --n_instances 40 --size demo
"""
import argparse

from lp_gnn_tpu.config import parse_args
from lp_gnn_tpu import pipeline
from scripts.generate_data import SIZES

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_instances", type=int, default=0,
                    help="generate this many instances first (0 = use existing mps)")
    ap.add_argument("--family", type=str, default=None)
    ap.add_argument("--size", type=str, default="demo")
    known, rest = ap.parse_known_args()
    cfg = parse_args(rest, make_log_dir=False)
    family = known.family or cfg.dataset.split("-")[0]
    kwargs = SIZES.get(family, {}).get(known.size, {})
    pipeline.stage_prep_data(cfg, family=family, n_instances=known.n_instances,
                             **kwargs)
