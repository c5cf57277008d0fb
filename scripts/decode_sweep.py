"""Decode-strategy sweep over ONE trained checkpoint: rerun predict ->
warm-start -> report for each inference manager without retraining.

The reference exposes the same choice as a CLI arg re-run per strategy
(val.py:167-197 InferenceManager; scripts/pred_basis.py:124); this driver
loops the strategies so family studies (e.g. does the sparsity-blend decode
fix repair-prone families like svm?) are one command:

    python scripts/decode_sweep.py --dataset svm --exp_nm svm-ep300 \
        --arch "GCN_FC(8,8,hids=256,depth=3)" \
        --load_from runs/svm-ep300/mdl.ckpt \
        --managers "InferenceManager(0,)" \
                   "InferenceManager(2,mode='add',gnn_wei=0.5)" \
                   "InferenceManager(2,mode='mult')"

Each manager writes its own basis/log folders (val.py get_basis_folder
naming) into the SAME run dir, so the final extract table compares every
strategy side by side against the shared cold/crash baselines.
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lp_gnn_tpu.config import parse_args
from lp_gnn_tpu import pipeline

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--managers", type=str, nargs="+",
                    default=["InferenceManager(0,)",
                             "InferenceManager(2,mode='add',gnn_wei=0.5)",
                             "InferenceManager(2,mode='mult')"])
    known, rest = ap.parse_known_args()
    cfg = parse_args(rest)
    assert cfg.load_from.lower() != "none", "--load_from ckpt required"
    for mng in known.managers:
        c = dataclasses.replace(cfg, inference_manager=mng)
        print(f"=== decode {mng}")
        pipeline.stage_pred_basis(c)
        pipeline.stage_warm_start(c)
    df, summary = pipeline.stage_extract(cfg)
    print(summary)
