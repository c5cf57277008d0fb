"""End-to-end orchestrator: train -> predict -> warm start -> val -> report
(reference run_train_test.py).

    python run_train_test.py --dataset mirp_like \
        --exp_nm mirp_like-balance-ep800 --arch "GCN_FC(8,8,hids=1024,depth=3)" \
        --epochs 800 --loss balanced
"""
from lp_gnn_tpu.config import parse_args
from lp_gnn_tpu import pipeline

if __name__ == "__main__":
    cfg = parse_args()
    out = pipeline.run_train_test(cfg)
    print(out["summary"])
