"""End-to-end pipeline stages (roles of the reference's scripts/ drivers and
run_prep_data.py / run_train_test.py orchestrators).

Each stage is an importable function over a :class:`Config`; the thin CLIs in
``scripts/`` call these. Stages communicate through the on-disk layout of
SURVEY.md §1 (identical to the reference):

    {data_prefix}/{dataset}/mps/*.mps
    {data_prefix}/{dataset}/{sv}basis[-mM]/*.bas         cold optimal bases
    {data_prefix}/{dataset}/log/{sv}no-bas[-mM]/*.log    cold logs
    {data_prefix}/{dataset}/log/{sv}ca-bas-m1/*.log      crash warm-start logs
    {data_prefix}/{dataset}/{sv}inp_tgt[-mM]/{raw,processed}/*.pk
    {log_prefix}/{exp_nm}/{pred-basis,opt-from-pred-basis,log/gnn-bas-0}/
    {log_prefix}/{exp_nm}/time.h5
"""
from __future__ import annotations

import glob
import logging
import os
import os.path as osp
import shutil

import numpy as np

from .config import Config
from .data.dataset import LPDataset, process_raw_dir, split_train_val
from .data.generator import generate_dataset
from .io.bas import check_lb, check_ub, read_bas, write_bas_highs
from .io.mps import read_mps
from .infer.decode import parse_inference_manager
from .infer.predict import (model_inference, predict_and_write_bases,
                            timed_inference, validation)
from .models.gcn import build_model
from .reporting.extract import (collect_results, extract_time, summarize,
                                to_latex_table)
from .solver.crash import bixby_crash_basis
from .solver import native as native_solver
from .train.trainer import load_ckpt, run_exp
from .utils.misc import extract_fn, mkdir_p
from .utils.serialize import (df_dump, df_load, json_dump, json_load,
                              msgpack_dump)


def _mps_files(cfg: Config) -> list[str]:
    from .utils.misc import split_out_chunk
    fns = sorted(glob.glob(f"{cfg.dataset_prefix}/mps/*.mps"),
                 key=lambda nm: (len(nm), nm))
    if not fns:
        fns = sorted(glob.glob(f"{cfg.dataset_prefix}/mps/*.mps.gz"),
                     key=lambda nm: (len(nm), nm))
    if not fns:
        raise ValueError(f"no mps under {cfg.dataset_prefix}/mps")
    # --chunk "k/N" splits solver work across processes (run_solver.py:46)
    return split_out_chunk(fns, cfg.chunk)


def _solve_backend(cfg: Config):
    """Select the solver engine: the native C++ runtime when built, else the
    highspy bridge (both share the log contract)."""
    engine = getattr(cfg, "engine", "highs")
    if engine == "native" or (engine == "auto" and native_solver.available()):
        return native_solver.solve_mps
    from .solver.highs_bridge import solve_mps
    return solve_mps


# ------------------------------------------------------------------ L1 stages
def stage_generate(cfg: Config, family: str | None = None,
                   n_instances: int = 40, **kwargs) -> list[str]:
    """Generate a synthetic LP family into the dataset layout."""
    return generate_dataset(cfg.dataset, cfg.data_prefix,
                            n_instances=n_instances, seed=cfg.seed,
                            family=family, **kwargs)


def stage_run_solver(cfg: Config) -> None:
    """Cold-solve every instance, save optimal basis + log; also run the
    crash-basis warm-start baseline (reference scripts/run_solver.py).
    ``--num_workers K`` fans the per-LP solves out over K processes (the
    reference only parallelizes preprocessing, cvt_to_pkl.py:292-298; both
    engines here are single-threaded per solve, so this scales ~linearly)."""
    fns = _mps_files(cfg)
    if cfg.num_workers and cfg.num_workers > 1:
        from multiprocessing import Pool
        from functools import partial
        with Pool(cfg.num_workers) as pool:
            pool.map(partial(_solve_one_cold, cfg=cfg), fns)
        return
    for mps in fns:
        _solve_one_cold(mps, cfg)


def _solve_one_cold(mps: str, cfg: Config) -> None:
    solve_mps = _solve_backend(cfg)
    method = cfg.normalized_lp_method()
    sfx = cfg.get_method_sfx()
    path = cfg.dataset_prefix
    nm = extract_fn(mps)
    bas = f"{path}/{cfg.solver_prefix}basis{sfx}/{nm}.bas"
    log = f"{path}/log/{cfg.solver_prefix}no-bas{sfx}/{nm}.log"
    if cfg.skip_exist and osp.exists(log) and osp.exists(bas):
        return
    res = solve_mps(mps, method=method, basis_out_path=bas, log_path=log)
    logging.info("cold %s: %s %d iters", nm, res.status, res.niter)
    # crash-basis baseline (run_solver.py:56)
    lp = read_mps(mps)
    colb, rowb = bixby_crash_basis(lp)
    ca_bas = f"{path}/{cfg.solver_prefix}ca-init-bas-m1/{nm}.bas"
    write_bas_highs(ca_bas, vbas=colb, cbas=rowb)
    ca_log = f"{path}/log/{cfg.solver_prefix}ca-bas-m1/{nm}.log"
    solve_mps(mps, method=method, basis_in_path=ca_bas, log_path=ca_log)


def stage_cvt_to_pkl(cfg: Config) -> None:
    """MPS + optimal .bas -> raw/*.pk graph blobs
    (reference scripts/cvt_to_pkl.py:220-277)."""
    sfx = cfg.get_method_sfx()
    raw_dir = f"{cfg.dataset_processed_prefix}/raw"
    mkdir_p(raw_dir)
    fns = _mps_files(cfg)
    if cfg.num_workers and cfg.num_workers > 1:
        # per-LP process fan-out (reference cvt_to_pkl.py:292-298)
        from multiprocessing import Pool
        from functools import partial
        with Pool(cfg.num_workers) as pool:
            pool.map(partial(_cvt_one, cfg=cfg), fns)
        return
    for mps in fns:
        _cvt_one(mps, cfg)


def _cvt_one(mps: str, cfg: Config) -> None:
    sfx = cfg.get_method_sfx()
    path = cfg.dataset_prefix
    raw_dir = f"{cfg.dataset_processed_prefix}/raw"
    nm = extract_fn(mps)
    dst = f"{raw_dir}/{nm}.pk"
    if cfg.skip_exist and osp.exists(dst):
        return
    bas_fn = f"{path}/{cfg.solver_prefix}basis{sfx}/{nm}.bas"
    if not osp.exists(bas_fn):
        logging.error("no basis for %s — skipped", nm)
        return
    # labels only from instances the cold solve actually optimized
    # (an Infeasible/limit run's basis is not a training target)
    cold_log = f"{path}/log/{cfg.solver_prefix}no-bas{sfx}/{nm}.log"
    if osp.exists(cold_log):
        iters, _tm = extract_time(cold_log)
        if iters < 0:
            logging.error("cold solve of %s not Optimal — skipped", nm)
            return
    lp = read_mps(mps)
    b_u = lp.b_u.copy()
    b_l = lp.b_l.copy()
    u = lp.ub.copy()
    l = lp.lb.copy()
    b_u[b_u > 1e308] = np.inf
    b_l[b_l < -1e308] = -np.inf
    u[u > 1e308] = np.inf
    l[l < -1e308] = -np.inf
    con_lbls, var_lbls = read_bas(bas_fn, lp.con_nms, lp.var_nms)
    con_lbls = np.asarray(con_lbls, dtype=np.int64)
    var_lbls = np.asarray(var_lbls, dtype=np.int64)
    check_lb(var_lbls, l, lp.var_nms)
    check_ub(var_lbls, u, lp.var_nms)
    # constraint labels must be consistent with infinite row bounds
    # (cvt_to_pkl.py:257-258)
    assert (con_lbls[b_l == -np.inf] != 0).all()
    assert (con_lbls[b_u == np.inf] != 2).all()
    A = lp.A.tocoo()
    msgpack_dump(
        [lp.c, b_l, (A.row, A.col, A.data), b_u, l, u,
         con_lbls, var_lbls,
         np.asarray([str(s) for s in lp.con_nms], dtype=object).tolist(),
         np.asarray([str(s) for s in lp.var_nms], dtype=object).tolist()],
        dst)


def stage_process(cfg: Config) -> None:
    """raw -> processed feature graphs (reference dataset.py:178-224)."""
    process_raw_dir(cfg.dataset_processed_prefix, skip_exist=bool(cfg.skip_exist))
    ds = LPDataset(cfg.dataset_processed_prefix)
    ds.cache_size_info(recache=not cfg.skip_exist)


def stage_prep_data(cfg: Config, family: str | None = None,
                    n_instances: int = 0, **kwargs) -> None:
    """run_prep_data.py equivalent: [generate] -> solve -> pkl -> process."""
    if n_instances:
        stage_generate(cfg, family, n_instances, **kwargs)
    stage_run_solver(cfg)
    stage_cvt_to_pkl(cfg)
    stage_process(cfg)


# ------------------------------------------------------------------ L4 stages
def stage_train(cfg: Config) -> str:
    return run_exp(cfg)


# ------------------------------------------------------------------ L5 stages
# two-sided 90% Student-t critical values by degrees of freedom (df 1-30;
# the normal 1.645 beyond) — self-contained so the gate does not depend on
# scipy being installed
_T90 = {1: 6.314, 2: 2.920, 3: 2.353, 4: 2.132, 5: 2.015, 6: 1.943,
        7: 1.895, 8: 1.860, 9: 1.833, 10: 1.812, 11: 1.796, 12: 1.782,
        13: 1.771, 14: 1.761, 15: 1.753, 16: 1.746, 17: 1.740, 18: 1.734,
        19: 1.729, 20: 1.725, 25: 1.708, 30: 1.697}


def _t_interval(xs) -> tuple[float, float, float]:
    """(mean, lo, hi): two-sided 90% t-interval on the mean of ``xs``."""
    n = len(xs)
    mean = float(np.mean(xs))
    if n < 2:
        return mean, -np.inf, np.inf
    sem = float(np.std(xs, ddof=1)) / np.sqrt(n)
    df = n - 1
    crit = _T90.get(df, min((_T90[c] for c in _T90 if c >= df),
                            default=1.645))
    return mean, mean - crit * sem, mean + crit * sem


def calibrate_warm_gate(model, params, train_ds, cfg: Config, inf_mng,
                        k: int | None = None) -> dict:
    """Measure the warm start's payback on TRAIN-split LPs, adaptively.

    The system-policy gate (VERDICT r03 item 2): decode each calibration
    LP with the configured inference manager, warm-start the solver from
    it, and compare iterations against the cold log the prep stage already
    recorded. Repair-dominated families (short cold solves where the
    basis-repair fixed cost cannot pay, e.g. demo-tier svm/stoch,
    RESULTS.md family table) measure negative here and the val warm starts
    are declined, so no family regresses below its cold baseline.

    Decision rule (VERDICT r04 item 3 — the fixed k=5 mean>0 rule made
    decisions inside its own noise on heterogeneous families, per-LP
    calibration spreads of ±60%): starting at ``cfg.warm_gate_k`` LPs,
    keep sampling while the two-sided 90% t-interval on the mean
    improvement straddles 0, up to ``cfg.warm_gate_kmax``; DECLINE only
    when the interval's upper bound is <= 0 (measured harm), PROCEED when
    the lower bound is > 0 or the budget runs out with the interval still
    straddling 0 (ambiguity is not evidence of harm — the warm start is
    the system's default behavior). A failed warm solve scores
    impr = -1.0 (one full cold solve wasted; bounded, unlike the old
    cold*2 score that let a single failure outweigh four strong
    positives, ADVICE r04) and is also counted in ``failures``.

    Calibration uses only training data (no val leakage); note the model
    has seen these LPs, so the estimate is optimistic — a family gated out
    by its own training split is unambiguously negative.
    """
    from .infer.predict import (model_inference, _nnzs_for_decode,
                                mesh_from_cfg, part_cache_dir)
    solve_mps = _solve_backend(cfg)
    method = cfg.normalized_lp_method()
    sfx = cfg.get_method_sfx()
    decode_fn, decode_kwargs = inf_mng.decode_fn(), inf_mng.decode_kwargs()
    calib_bas_dir = osp.join(cfg.log_dir, "warm-gate-calib")
    calib_log_dir = osp.join(cfg.log_dir, "log", "warm-gate-calib")
    mkdir_p(calib_bas_dir), mkdir_p(calib_log_dir)
    # same inference configuration as the val predictions this gate gates:
    # oversize graphs go through the (cached) edge-partitioned forward, not
    # the exact-sampled fallback
    mesh = mesh_from_cfg(cfg)
    dist_cache: dict = {}
    part_dir = part_cache_dir(cfg)
    k_min = k if k is not None else int(getattr(cfg, "warm_gate_k", 5))
    k_max = max(int(getattr(cfg, "warm_gate_kmax", 12)), k_min)
    lps, imprs = [], []
    failures = 0
    mean_impr, lo, hi = 0.0, -np.inf, np.inf
    for i in range(len(train_ds)):
        if len(lps) >= k_min:
            mean_impr, lo, hi = _t_interval(imprs)
            if lo > 0.0 or hi <= 0.0 or len(lps) >= k_max:
                break   # interval excludes 0, or budget exhausted
        g = train_ds[i]
        cold_log = (f"{cfg.dataset_prefix}/log/"
                    f"{cfg.solver_prefix}no-bas{sfx}/{g.fn}.log")
        if not osp.exists(cold_log):
            continue
        cold_niter, _ = extract_time(cold_log)
        if cold_niter < 0:
            continue
        mps = f"{cfg.dataset_prefix}/mps/{g.fn}.mps"
        if not osp.exists(mps) and osp.exists(mps + ".gz"):
            mps = mps + ".gz"
        lc, lv = model_inference(model, params, g, cfg.edge_num_thresh,
                                 cfg.batch_size, cfg.arch_depth(),
                                 mesh=mesh, dist_cache=dist_cache,
                                 part_dir=part_dir)
        logits = np.concatenate([lc, lv]).astype(np.float32)
        pred = decode_fn(logits, g.ncons,
                         nnzs=_nnzs_for_decode(g, decode_fn),
                         **decode_kwargs)
        bas = osp.join(calib_bas_dir, f"{g.fn}.bas")
        write_bas_highs(bas, vbas=pred[g.ncons:], cbas=pred[:g.ncons])
        res = solve_mps(mps, method=method, basis_in_path=bas,
                        log_path=osp.join(calib_log_dir, f"{g.fn}.log"))
        if res.niter >= 0:
            impr = (cold_niter - res.niter) / max(cold_niter, 1)
        else:
            impr = -1.0   # failed warm start = one cold solve wasted
            failures += 1
        imprs.append(impr)
        lps.append({"fn": g.fn, "cold_niter": int(cold_niter),
                    "warm_niter": int(res.niter), "impr": float(impr)})
    if imprs:
        mean_impr, lo, hi = _t_interval(imprs)
    # DECLINE only on measured harm (upper bound <= 0); no data => proceed
    # (nothing to calibrate on is not evidence against the warm start)
    gate = {"proceed": not (imprs and hi <= 0.0),
            "mean_impr": mean_impr,
            "ci90": [float(lo), float(hi)], "k": len(lps),
            "k_min": k_min, "k_max": k_max, "failures": failures,
            "rule": "decline iff 90% t-interval upper bound <= 0",
            "lps": lps, "decode": inf_mng.get_basis_folder()}
    logging.info(
        "warm gate: %s (mean train impr %+.1f%%, 90%% CI [%+.1f%%, %+.1f%%] "
        "over %d LPs, %d failed warm solves)",
        "PROCEED" if gate["proceed"] else "DECLINE", 100 * mean_impr,
        100 * lo, 100 * hi, len(lps), failures)
    return gate


def stage_pred_basis(cfg: Config, ckpt_path: str | None = None) -> str:
    """Predict bases for the chosen split and write .bas files
    (reference scripts/pred_basis.py main)."""
    inf_mng = parse_inference_manager(cfg.inference_manager,
                                  cfg.dataset)
    out_dir = osp.join(cfg.log_dir, inf_mng.get_basis_folder())
    model = build_model(cfg.arch_with_dtype())
    src = ckpt_path or cfg.load_from
    if str(src).lower() == "none":
        # control baselines (GCNRand / all-slacks decode) need no weights
        import jax
        params = model.init(jax.random.PRNGKey(cfg.seed))
    else:
        params = load_ckpt(src)["params"]
    ds = LPDataset(cfg.dataset_processed_prefix, load_meta=True)
    train_ds, val_ds = split_train_val(ds, cfg.seed)
    target = val_ds if cfg.split == "val" else ds
    predict_and_write_bases(model, params, target, cfg, out_dir,
                            decode_fn=inf_mng.decode_fn(),
                            decode_kwargs=inf_mng.decode_kwargs())
    if getattr(cfg, "warm_gate", "off") == "auto":
        gate = calibrate_warm_gate(model, params, train_ds, cfg, inf_mng)
        json_dump(gate, osp.join(cfg.log_dir, "warm_gate.json"))
    # timing pass (pred_basis.py:158-176)
    dump_info = osp.join(cfg.log_dir, "time.h5")
    if not osp.exists(dump_info):
        ds_plain = LPDataset(cfg.dataset_processed_prefix)
        ds_plain.dump_size_info(dump_info)
    timed_inference(model, params, target, cfg, dump_info)
    return out_dir


# ------------------------------------------------------------------ L6 stages
def stage_warm_start(cfg: Config) -> None:
    """Warm-start the solver from predicted bases for the val split
    (reference scripts/run_solver_from_basis.py)."""
    solve_mps = _solve_backend(cfg)
    inf_mng = parse_inference_manager(cfg.inference_manager,
                                  cfg.dataset)
    basis_folder = inf_mng.get_basis_folder()
    log_folder = inf_mng.get_log_folder()
    method = cfg.normalized_lp_method()
    if method != 1:
        log_folder += f"-m{method}"
    mkdir_p(f"{cfg.log_dir}/log/{log_folder}")
    # copy the data-side baseline logs into the run dir (extract_time.py:35-36)
    data_log = f"{cfg.dataset_prefix}/log"
    if osp.isdir(data_log):
        for d in os.listdir(data_log):
            dst = f"{cfg.log_dir}/log/{d}"
            if not osp.exists(dst):
                shutil.copytree(f"{data_log}/{d}", dst)
        ca = f"{cfg.log_dir}/log/{cfg.solver_prefix}ca-bas-m1"
        ca_alias = f"{cfg.log_dir}/log/{cfg.solver_prefix}ca-bas"
        if osp.isdir(ca) and not osp.exists(ca_alias):
            shutil.copytree(ca, ca_alias)

    # warm-start payback gate (calibrated on the train split at predict
    # time, calibrate_warm_gate): when it declined, the system solves the
    # val LPs COLD — the predicted bases stay on disk, but the solver is
    # never started from a basis measured to cost more than it saves
    gated_off = False
    if getattr(cfg, "warm_gate", "off") == "auto":
        gate_path = osp.join(cfg.log_dir, "warm_gate.json")
        if osp.exists(gate_path):
            gate = json_load(gate_path)
            if gate.get("decode", basis_folder) != basis_folder:
                # calibrated for a DIFFERENT decode (manager changed since
                # predict): a stale gate must neither force cold solves nor
                # wrongly proceed for this decode — ignore it
                logging.warning(
                    "warm_gate.json was calibrated for decode %r but this "
                    "run uses %r — ignoring the stale gate (re-run the "
                    "predict stage to recalibrate)",
                    gate.get("decode"), basis_folder)
                gate = {}
            gated_off = not gate.get("proceed", True) if gate else False
            if gated_off:
                logging.warning(
                    "warm gate DECLINED (mean train impr %+.1f%% over %d "
                    "LPs) — val split solves cold; rerun with "
                    "--warm_gate off to force the warm starts",
                    100 * gate.get("mean_impr", 0.0), gate.get("k", 0))
        else:
            logging.warning("warm_gate auto but no warm_gate.json under %s "
                            "(predict stage not run?) — warm starts proceed",
                            cfg.log_dir)

    dump_info = osp.join(cfg.log_dir, "time.h5")
    ds = LPDataset(cfg.dataset_processed_prefix)
    ds.dump_size_info(dump_info)
    df = df_load(dump_info)
    if cfg.split == "val":
        fns = list(df.loc[df.split == "val", "fn"])
    else:
        fns = list(df["fn"])
    for nm in fns:
        mps = f"{cfg.dataset_prefix}/mps/{nm}.mps"
        if not osp.exists(mps) and osp.exists(mps + ".gz"):
            mps = mps + ".gz"
        bas = f"{cfg.log_dir}/{basis_folder}/{nm}.bas"
        if not osp.exists(bas):
            logging.error("missing predicted basis %s", bas)
            continue
        out_bas = f"{cfg.log_dir}/opt-from-{basis_folder}/{nm}.bas"
        log = f"{cfg.log_dir}/log/{log_folder}/{nm}.log"
        res = solve_mps(mps, method=method,
                        basis_in_path=None if gated_off else bas,
                        basis_out_path=out_bas, log_path=log)
        logging.info("%s %s: %s %d iters",
                     "cold (gated)" if gated_off else "warm",
                     nm, res.status, res.niter)


# ------------------------------------------------------------------ L7 stages
def stage_val(cfg: Config, ckpt_path: str | None = None,
              wrt_converged: bool = False) -> float:
    """Classification metrics vs labels into time.h5 (reference val.py main).

    With ``wrt_converged`` also scores predictions against the basis the
    solver converged to after the warm start (reference val.py:70-104),
    writing ``cvg/acc|prec|recl`` columns."""
    model = build_model(cfg.arch_with_dtype())
    params = load_ckpt(ckpt_path or cfg.load_from)["params"]
    ds = LPDataset(cfg.dataset_processed_prefix)
    train_ds, val_ds = split_train_val(ds, cfg.seed)
    dump_info = osp.join(cfg.log_dir, "time.h5")
    if not osp.exists(dump_info):
        ds.dump_size_info(dump_info)
    _, avg_acc = validation(model, params, val_ds, cfg, dump_info)
    logging.info("avg val acc %.4f", avg_acc)
    if wrt_converged:
        _, cvg_acc = validation(model, params, val_ds, cfg, dump_info,
                                wrt_converged=True)
        logging.info("avg val acc wrt converged %.4f", cvg_acc)
    return avg_acc


def stage_extract(cfg: Config):
    """Aggregate all logs into time.h5 + print the summary
    (reference scripts/extract_time.py)."""
    dump_info = osp.join(cfg.log_dir, "time.h5")
    if not osp.exists(dump_info):
        ds = LPDataset(cfg.dataset_processed_prefix)
        ds.dump_size_info(dump_info)
    df = collect_results(cfg.log_dir, dump_info, cfg.solver_prefix)
    summary = summarize(df)
    print(summary)
    # paper-style LaTeX cells (reference utils.py:917-971 proc*), kept as an
    # artifact next to time.h5
    try:
        to_latex_table(summary).to_csv(osp.join(cfg.log_dir, "summary.tex.csv"))
    except Exception as e:   # formatting must never fail the pipeline
        logging.warning("latex summary skipped: %s", e)
    return df, summary


def run_train_test(cfg: Config) -> dict:
    """Full run_train_test.py pipeline: train -> predict -> warm start ->
    val -> extract (reference run_train_test.py:11-19)."""
    ckpt = stage_train(cfg)
    stage_pred_basis(cfg, ckpt)
    stage_warm_start(cfg)
    stage_val(cfg, ckpt, wrt_converged=True)
    df, summary = stage_extract(cfg)
    return {"ckpt": ckpt, "summary": summary, "df": df}
