#!/bin/bash
# Refresh the seven-family results table on the round-4 stack (warm-start
# gate + auto decode): demo-tier prep + 300-epoch train + predict ->
# warm-start -> report per family, all CPU (demo LPs are tiny; the
# bench-tier mirp headline is the TPU configuration). For the families the
# gate is expected to DECLINE (svm, stoch), a second gate-off pass records
# the negative result the gate prevents (run=1 folders).
set -e
cd "$(dirname "$0")/.."
export LP_GNN_PLATFORM=cpu
ARCH="GCN_FC(8,8,hids=256,depth=3)"

for fam in miplib_like transport packing netflow svm stoch; do
  echo "=== $fam ==="
  python run_prep_data.py --dataset "$fam" --n_instances 40 --size demo \
      --num_workers 2 --skip_exist 1
  python run_train_test.py --dataset "$fam" --exp_nm "r4-$fam-ep300" \
      --arch "$ARCH" --epochs 300 --loss balanced \
      --inference_manager auto --warm_gate auto
done

# gate-off confirmation rows for the repair-prone families (the honest
# negative results the gate exists to prevent; reuses the checkpoints)
for fam in svm stoch; do
  echo "=== $fam gate-off ==="
  python scripts/pred_basis.py --dataset "$fam" --exp_nm "r4-$fam-ep300" \
      --arch "$ARCH" --load_from "runs/r4-$fam-ep300/mdl.ckpt" \
      --inference_manager "InferenceManager(0, run=1)" --warm_gate off
  python scripts/run_solver_from_basis.py --dataset "$fam" \
      --exp_nm "r4-$fam-ep300" \
      --inference_manager "InferenceManager(0, run=1)" --warm_gate off
  python scripts/extract_time.py --dataset "$fam" --exp_nm "r4-$fam-ep300"
done
echo "family table done"
