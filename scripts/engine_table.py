"""Cold/warm iteration table for BOTH solver engines on one experiment.

For every val-split LP of the experiment's dataset, solve cold and
warm-started from the experiment's predicted basis with the HiGHS bridge
AND the native C++ engine (tpulp), and print a mean-iteration table plus
one JSON line. This is how the RESULTS.md engine-comparison rows are
produced (the pipeline's own stages write one engine's logs at a time;
this script measures both side by side on identical instances and bases).

    PYTHONPATH=/root/repo python scripts/engine_table.py \
        --dataset mirp_bench --exp_nm <exp> --lp_method 4
"""
import json
import sys
import os.path as osp

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from lp_gnn_tpu.config import parse_args  # noqa: E402
from lp_gnn_tpu.utils.serialize import df_load  # noqa: E402
from lp_gnn_tpu.solver import native as native_solver  # noqa: E402
from lp_gnn_tpu.solver.highs_bridge import solve_mps as highs_solve  # noqa: E402


def main():
    cfg = parse_args(make_log_dir=False)
    method = cfg.normalized_lp_method()
    dump = osp.join(cfg.log_prefix, cfg.exp_nm, "time.h5")
    df = df_load(dump)
    fns = list(df.loc[df.split == "val", "fn"])
    engines = {"highs": highs_solve}
    if native_solver.available():
        engines["native"] = native_solver.solve_mps
    rows = {}
    import time
    for eng, solve in engines.items():
        cold, warm, tc, tw, failed = [], [], [], [], 0
        for nm in fns:
            mps = f"{cfg.dataset_prefix}/mps/{nm}.mps"
            if not osp.exists(mps):
                mps += ".gz"
            bas = osp.join(cfg.log_prefix, cfg.exp_nm, "pred-basis",
                           f"{nm}.bas")
            t0 = time.time()
            rc = solve(mps, method=method)
            t_c = time.time() - t0
            t0 = time.time()
            rw = solve(mps, method=method, basis_in_path=bas)
            t_w = time.time() - t0
            ok = (rc.status == rw.status == "Optimal"
                  and rc.niter >= 0 and rw.niter >= 0)
            print(f"{eng:7s} {nm}: cold {rc.niter:6d} warm {rw.niter:6d} "
                  f"{'' if ok else 'STATUS ' + rc.status + '/' + rw.status}",
                  flush=True)
            if not ok:
                # a failed solve (niter sentinel -1 / non-Optimal) must not
                # enter the aggregates — it would deflate mean iterations
                # and inflate impr
                failed += 1
                continue
            cold.append(rc.niter)
            warm.append(rw.niter)
            tc.append(t_c)
            tw.append(t_w)
        if not cold:
            # every solve failed: an all-NaN row would read as silent data;
            # record the failure count explicitly instead
            rows[eng] = {"n": 0, "failed": failed}
            continue
        c, w = np.mean(cold), np.mean(warm)
        rows[eng] = {"cold_niter": round(float(c), 1),
                     "warm_niter": round(float(w), 1),
                     "impr": round(float((c - w) / c), 4),
                     "cold_s_per_lp": round(float(np.mean(tc)), 3),
                     "warm_s_per_lp": round(float(np.mean(tw)), 3),
                     "n": len(cold), "failed": failed}
    print(json.dumps({"dataset": cfg.dataset, "exp": cfg.exp_nm,
                      "method": method, "engines": rows}))


if __name__ == "__main__":
    main()
