"""Solver-log parsing and results aggregation.

Roles of reference utils.py:571-660 (parsers) and scripts/extract_time.py
(time.h5 aggregation + improvement-vs-baseline columns). The log format
contract is shared by the highspy bridge and the native C++ solver runtime.

Error codes (reference utils.py:621-626): -1 optimal not found, -2 parse
failure, -3 missing file.
"""
from __future__ import annotations

import os
import os.path as osp
import re

import numpy as np
import pandas as pd

from ..io.bas import read_bas_highs
from ..utils.misc import extract_fn
from ..utils.serialize import df_dump, df_load


def _read_lines(out: str) -> list[str]:
    if out.endswith(".log"):
        assert osp.exists(out), out
        with open(out) as f:
            return f.read().split("\n")
    return out.split("\n")


def extract_time(out: str):
    """Parse (iterations, run_time) from a solver log
    (reference utils.py:621-660). Handles both log dialects the reference
    does: HiGHS-shaped ('Model status' / 'iterations' / 'run time' lines)
    and CPLEX-shaped ('Solution time =  T sec.  Iterations = N' lines,
    utils.py:641-645); the dialect is tracked from the banner."""
    lines = _read_lines(out)
    whose_log = "cplex"   # reference default until a banner says otherwise
    iters, tm = 0, None
    for line in lines:
        if "CPLEX" in line:
            whose_log = "cplex"
        if "HiGHS" in line:
            whose_log = "highs"
        if whose_log == "cplex" and line[:13] == "Solution time":
            parts = [x for x in line.split(" ") if x != ""]
            return int(parts[7]), float(parts[3])
        if "unable open file" in line:
            return -3, -3
        if whose_log != "highs":
            continue
        if "status" in line and "Model" in line:
            if "Optimal" not in line:
                return -1, -1
        if "iterations" in line:
            m = re.findall(r"\d+", line)
            if m:
                iters = int(m[0])
        if "run time" in line:
            m = re.findall(r"\d*\.\d*", line)
            if m:
                tm = float(m[0])
                return iters, tm
    return -2, -2


def basis_folder_for_log(log_folder: str) -> str:
    """Invert ``InferenceManager.get_log_folder`` (plus the ``-m{method}``
    suffix ``stage_warm_start`` appends for non-dual methods): the
    ``gnn-bas-{run}`` log folders map to ``pred-basis[-{run}]``; the
    all-slacks / sparsity decodes use one name for logs and bases.

    The reference hard-codes ``pred-basis`` (utils.py:587); this repo
    generalized the basis folders (decode.InferenceManager), so the repair
    columns must resolve the right one for ``run>0`` and sparsity decodes."""
    name = re.sub(r"-m\d+$", "", log_folder)
    m = re.fullmatch(r"gnn-bas-(\d+)", name)
    if m:
        run = int(m.group(1))
        return "pred-basis" if run == 0 else f"pred-basis-{run}"
    return name


def extract_nrepair(out: str):
    """(num_basis, n_slack_basis_begin, n_add_slack) for a warm-start log
    (reference utils.py:571-597): n_add_slack from the 'Rank_deficiency N'
    line printed by the native runtime during basis repair; the starting
    composition is read from the predicted-basis file matching the log's
    folder (``basis_folder_for_log``)."""
    lines = _read_lines(out)
    num_basis, n_slack_begin, n_add_slack = -1, -1, -1
    n_add_slack = 0
    if out.endswith(".log"):
        folder = basis_folder_for_log(osp.basename(osp.dirname(out)))
        pred_basis = f"{osp.dirname(out)}/../../{folder}/{extract_fn(out)}.bas"
        if osp.exists(pred_basis):
            cs, _vs = read_bas_highs(pred_basis)
            num_basis = len(cs)
            n_slack_begin = int((cs == 1).sum())
    for line in lines:
        m = re.findall(r"Rank_deficiency (\d+)", line)
        if m:
            n_add_slack = int(m[0])
    return num_basis, n_slack_begin, n_add_slack


def extract_fact_time(out: str) -> float:
    """Factorization time from 'time elapsed for factorize: X'
    (reference utils.py:599-619; a native-runtime log line)."""
    for line in _read_lines(out):
        m = re.findall(r"time elapsed for factorize: ([e\-\d\.]+)", line)
        if m:
            return float(m[0])
    return -1.0


def map_back_to_baseline(log_fdl_nm: str, solver_pref: str = "highs-") -> str:
    """Map a warm-start log folder to its cold baseline folder
    (reference scripts/extract_time.py:8-22 — whose regex is a character
    class, not the intended alternation; this is the fixed rule, extended
    to the all-slacks and sparsity-decode folders)."""
    name = log_fdl_nm.split("/")[0]
    is_warm = (name.startswith(("gnn-", "all-slacks-"))
               or "ca-bas" in name)
    if not is_warm:
        return ""
    for method in ("m2", "m4"):
        if name.endswith(f"-{method}"):
            return f"{solver_pref}no-bas-{method}"
    return f"{solver_pref}no-bas"


#: log/ subdirectories that are NOT solve methods and must not become
#: time.h5 summary columns: the warm-gate calibration logs are measured on
#: TRAIN-split LPs (pipeline.calibrate_warm_gate) and would pollute the
#: val-split aggregates with spurious niter/time rows.
NON_METHOD_LOG_DIRS = ("warm-gate-calib",)


def collect_results(log_dir: str, time_h5: str, solver_prefix: str = "highs-",
                    mps_names=None) -> pd.DataFrame:
    """Walk ``{log_dir}/log/*/*.log`` into time.h5 columns
    ``{method}/niter|time`` plus repair/fact columns for gnn logs, then
    compute ``impr_*`` vs the matched cold baseline
    (reference scripts/extract_time.py:47-92). Non-method folders
    (``NON_METHOD_LOG_DIRS``) are excluded from the sweep."""
    df = df_load(time_h5)
    log_root = osp.join(log_dir, "log")
    methods = sorted(d for d in os.listdir(log_root)
                     if d not in NON_METHOD_LOG_DIRS) \
        if osp.isdir(log_root) else []
    names = mps_names if mps_names is not None else list(df.fn)
    for fn in names:
        for method in methods:
            tgt = osp.join(log_root, method, f"{fn}.log")
            if not osp.exists(tgt):
                continue
            iters, tm = extract_time(tgt)
            df.loc[df.fn == fn, f"{method}/niter"] = iters
            df.loc[df.fn == fn, f"{method}/time"] = tm
            if "gnn" in method:
                num_basis, n_slack_begin, n_add = extract_nrepair(tgt)
                if num_basis > 0:
                    df.loc[df.fn == fn, f"{method}/repair_p"] = n_add / num_basis
                    n_var_begin = num_basis - n_slack_begin
                    df.loc[df.fn == fn, f"{method}/repair_p2"] = (
                        n_add / n_var_begin if n_var_begin else np.inf)
                ft = extract_fact_time(tgt)
                df.loc[df.fn == fn, f"{method}/fact_time"] = ft
    for colnm in list(df.columns):
        bs_method = map_back_to_baseline(colnm, solver_prefix)
        if not bs_method:
            continue
        method, impr = colnm.split("/")
        if impr not in ("time", "niter"):
            continue
        base_col = f"{bs_method}/{impr}"
        if base_col not in df:
            continue
        # the -1/-2/-3 sentinels (and zero baselines) must not enter the
        # improvement arithmetic — a -1 warm niter against a 500 baseline
        # would read as a fake ~+100% improvement in the summary means
        cur = pd.to_numeric(df[colnm], errors="coerce")
        base = pd.to_numeric(df[base_col], errors="coerce")
        cur = cur.mask(cur < 0)
        base = base.mask(base <= 0)
        df[f"{method}/impr_{impr}"] = -(cur - base) / base
    df_dump(df, time_h5)
    return df


# ------------------------------------------------------- LaTeX table helpers
def fmt_large_int(x: float) -> str:
    """29_900 -> '29.9K', 1_740_000 -> '1.7M' (reference utils.py:948-956)."""
    for cut, suffix in ((1e6, "M"), (1e3, "K")):
        if x >= cut:
            return f"{x / cut:.1f}{suffix}"
    return f"{x:.1f}"


def fmt_float(x: float) -> str:
    """>=0.05 -> one decimal; smaller -> exponent notation with the LaTeX
    'e-' escape (reference utils.py:957-964)."""
    if float(x) >= 0.05:
        return f"{x:.1f}"
    s = f"{x:.0e}".replace("-0", "-")
    return s.replace("e-", r"\text{e-}")


def _mean_pm_std(mean: float, std: float, fmt) -> str:
    out = f"${fmt(mean)}"
    if np.isfinite(std) and abs(std) > 1e-5:
        out += r"{\scriptscriptstyle \pm " + fmt(std) + "}"
    return out + "$"


def proc(s: pd.Series) -> str:
    """Format one (mean, std) row of :func:`summarize` as a LaTeX cell,
    dispatching on the metric name — percentages for acc/prec/recl/repair/
    impr, floats for inf/fact times, K/M-reduced ints for iteration counts
    (reference utils.py:917-971)."""
    nm = str(s.name)
    mean, std = float(s["mean"]), float(s.get("std", np.nan))
    if any(k in nm for k in ("acc", "prec", "recl", "repair", "impr")):
        return _proc_percent(mean, std)
    if any(k in nm for k in ("inf_time", "fact_time")):
        return _mean_pm_std(mean, std, fmt_float)
    return _mean_pm_std(mean, std, fmt_large_int)


def _proc_percent(mean: float, std: float) -> str:
    out = f"${mean * 100:.1f} "
    if np.isfinite(std) and abs(std * 100) > 1e-5:
        out += r"{\scriptscriptstyle \pm " + fmt_float(std * 100) + "}"
    return out + "$"


def to_latex_table(summary: pd.DataFrame) -> pd.DataFrame:
    """Apply :func:`proc` over a :func:`summarize` result: one formatted
    '$mean{\\pm std}$' cell per (metric, split)."""
    wide = summary.unstack(level=-1)   # rows = metric, cols = (split, stat)
    out = {}
    for split in wide.columns.get_level_values(0).unique():
        sub = wide[split]
        out[split] = sub.apply(lambda s: proc(s), axis=1)
    return pd.DataFrame(out)


def summarize(df: pd.DataFrame) -> pd.DataFrame:
    """Per-split mean/std over metric columns
    (reference scripts/extract_time.py:82-91)."""
    cols = [c for c in df.columns
            if c in ("acc", "prec", "recl") or "/niter" in c or "/time" in c
            or "/impr" in c]
    num = df[cols + ["split"]].copy()
    for c in cols:
        num[c] = pd.to_numeric(num[c], errors="coerce")
        num.loc[num[c].isin([-1, -2, -3]), c] = np.nan
    return num.groupby("split").agg(["mean", "std"]).T
