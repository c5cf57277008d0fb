"""Aggregate solver logs into the results table
(reference scripts/extract_time.py)."""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from lp_gnn_tpu.config import parse_args  # noqa: E402
from lp_gnn_tpu import pipeline  # noqa: E402

if __name__ == "__main__":
    cfg = parse_args()
    pipeline.stage_extract(cfg)
