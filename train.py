"""Training entry point (reference train.py).

    python train.py --dataset mirp_like --exp_nm myexp \
        --arch "GCN_FC(8,8,hids=1024,depth=3)" --epochs 800 --loss balanced
"""
from lp_gnn_tpu.config import parse_args
from lp_gnn_tpu.train.trainer import run_exp

if __name__ == "__main__":
    cfg = parse_args()
    print(run_exp(cfg))
