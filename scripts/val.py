"""Validation metrics vs labels into time.h5 (reference val.py __main__)."""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from lp_gnn_tpu.config import parse_args  # noqa: E402
from lp_gnn_tpu import pipeline  # noqa: E402

if __name__ == "__main__":
    cfg = parse_args()
    pipeline.stage_val(cfg)
