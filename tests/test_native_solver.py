"""Native C++ simplex runtime tests: oracle parity vs vendored HiGHS,
warm start, rank-deficiency repair, log contract (reference custom-fork
capabilities, SURVEY.md §2.2)."""
import subprocess

import numpy as np
import pytest

from lp_gnn_tpu.data.generator import generate_instance, GENERATORS
from lp_gnn_tpu.solver import native
from lp_gnn_tpu.solver.crash import bixby_crash_basis
from lp_gnn_tpu.solver.highs_bridge import solve_lp, HAVE_HIGHS


@pytest.fixture(scope="module", autouse=True)
def build_native():
    import os.path as osp
    d = osp.join(osp.dirname(native.__file__), "native")
    subprocess.run(["make", "-C", d], check=True, capture_output=True)
    assert native.available()


@pytest.mark.skipif(not HAVE_HIGHS, reason="no oracle")
@pytest.mark.parametrize("family", sorted(GENERATORS))
@pytest.mark.parametrize("method", [1, 4])
def test_native_matches_highs_objective(family, method):
    lp = generate_instance(family, seed=1, instance=0)
    h = solve_lp(lp, method=1)
    r = native.solve_lp_native(lp, method=method)
    assert r.status == "Optimal"
    assert np.isclose(r.objective, h.objective, rtol=1e-6, atol=1e-6)
    # basis validity
    nb = (r.col_status == 1).sum() + (r.row_status == 1).sum()
    assert nb == lp.shape[0]


def test_native_warm_start_zero_iters():
    lp = generate_instance("mirp_like", seed=0, instance=0)
    cold = native.solve_lp_native(lp, method=1)
    warm = native.solve_lp_native(
        lp, method=1, basis_in=(cold.col_status, cold.row_status))
    assert warm.status == "Optimal"
    assert warm.niter == 0
    assert np.isclose(warm.objective, cold.objective, rtol=1e-8)


def test_native_repair_counted():
    lp = generate_instance("transport", seed=0, instance=0)
    cold = native.solve_lp_native(lp, method=1)
    colb = cold.col_status.copy()
    colb[np.nonzero(colb == 1)[0][:4]] = 0   # invalidate 4 basics
    rep = native.solve_lp_native(lp, method=1,
                                 basis_in=(colb, cold.row_status))
    assert rep.status == "Optimal"
    assert rep.n_repair >= 4
    assert np.isclose(rep.objective, cold.objective, rtol=1e-7)
    assert f"Rank_deficiency {rep.n_repair}" in rep.log


def test_native_crash_basis():
    lp = generate_instance("mirp_like", seed=0, instance=1)
    cold = native.solve_lp_native(lp, method=1)
    cb = bixby_crash_basis(lp)
    ca = native.solve_lp_native(lp, method=1, basis_in=cb)
    assert ca.status == "Optimal"
    assert np.isclose(ca.objective, cold.objective, rtol=1e-7)


def test_native_log_contract(tmp_path):
    """Logs must satisfy the reference parsers (utils.py:571-660)."""
    from lp_gnn_tpu.reporting.extract import (extract_time, extract_fact_time)
    from lp_gnn_tpu.io.mps import write_mps
    lp = generate_instance("netflow", seed=0, instance=0)
    mps = str(tmp_path / "a.mps")
    write_mps(lp, mps)
    log = str(tmp_path / "a.log")
    bas = str(tmp_path / "a.bas")
    res = native.solve_mps(mps, method=1, basis_out_path=bas, log_path=log)
    assert res.status == "Optimal"
    iters, tm = extract_time(log)
    assert iters == res.niter
    assert tm is not None and tm >= 0
    assert extract_fact_time(log) >= 0
    # warm start through files
    res2 = native.solve_mps(mps, method=1, basis_in_path=bas)
    assert res2.niter == 0


def test_native_infeasible_and_unbounded():
    from lp_gnn_tpu.io.mps import LPData
    from scipy.sparse import csr_matrix
    # infeasible: x >= 2, x <= 1
    lp = LPData(c=np.array([1.0]), b_l=np.array([2.0]),
                A=csr_matrix(np.array([[1.0]])), b_u=np.array([np.inf]),
                lb=np.array([0.0]), ub=np.array([1.0]),
                con_nms=np.array(["r0"], dtype=object),
                var_nms=np.array(["x0"], dtype=object))
    r = native.solve_lp_native(lp, method=4)
    assert r.status == "Infeasible"
    # unbounded: min -x, x >= 0, no upper
    lp2 = LPData(c=np.array([-1.0]), b_l=np.array([0.0]),
                 A=csr_matrix(np.array([[1.0]])), b_u=np.array([np.inf]),
                 lb=np.array([0.0]), ub=np.array([np.inf]),
                 con_nms=np.array(["r0"], dtype=object),
                 var_nms=np.array(["x0"], dtype=object))
    r2 = native.solve_lp_native(lp2, method=4)
    assert r2.status == "Unbounded"


@pytest.mark.skipif(not HAVE_HIGHS, reason="no oracle")
def test_native_engine_pipeline(tmp_path):
    """stage_run_solver with engine=native produces parity labels."""
    from lp_gnn_tpu.config import Config
    from lp_gnn_tpu import pipeline
    cfg = Config(dataset="nf", data_prefix=str(tmp_path / "lp-dataset"),
                 log_prefix=str(tmp_path / "runs"), engine="native",
                 ).finalize(make_log_dir=False)
    pipeline.stage_generate(cfg, "netflow", 3, n_nodes=15, density=0.25)
    pipeline.stage_run_solver(cfg)
    pipeline.stage_cvt_to_pkl(cfg)
    pipeline.stage_process(cfg)
    from lp_gnn_tpu.data.dataset import LPDataset
    ds = LPDataset(cfg.dataset_processed_prefix)
    assert len(ds) == 3
    g = ds[0]
    assert (np.asarray(g.y_t) == 1).sum() + (np.asarray(g.y_s) == 1).sum() \
        == g.ncons


def test_native_dual_artificial_bounds():
    """Dual warm start with a dual-infeasible unbounded-above column
    exercises the artificial-bound phase-1 + primal cleanup path."""
    from lp_gnn_tpu.io.mps import LPData
    from scipy.sparse import csr_matrix
    # min -x  s.t. x <= 5, x >= 0 (u = +inf: not boxed -> artificial bound)
    lp = LPData(c=np.array([-1.0]), b_l=np.array([-np.inf]),
                A=csr_matrix(np.array([[1.0]])), b_u=np.array([5.0]),
                lb=np.array([0.0]), ub=np.array([np.inf]),
                con_nms=np.array(["r0"], dtype=object),
                var_nms=np.array(["x0"], dtype=object))
    # all-slack warm basis: x nonbasic at lower with d = -1 < 0
    r = native.solve_lp_native(lp, method=1,
                               basis_in=(np.array([0]), np.array([1])))
    assert r.status == "Optimal"
    assert np.isclose(r.objective, -5.0)


def test_native_bfrt_boxed_heavy():
    """Boxed-variable-rich LP (packing: all vars in [0,1]) exercises the
    bound-flipping ratio test; warm start from a partially-correct basis
    must stay exact."""
    lp = generate_instance("packing", seed=2, instance=0, m=60, n=120)
    cold = native.solve_lp_native(lp, method=1)
    h = solve_lp(lp, method=1)
    assert np.isclose(cold.objective, h.objective, rtol=1e-7)
    # corrupt 10% of the optimal basis
    colb = cold.col_status.copy()
    basic_idx = np.nonzero(colb == 1)[0]
    colb[basic_idx[: max(len(basic_idx) // 10, 1)]] = 0
    warm = native.solve_lp_native(lp, method=1, basis_in=(colb, cold.row_status))
    assert warm.status == "Optimal"
    assert np.isclose(warm.objective, cold.objective, rtol=1e-7)


def test_prof_main_dump_roundtrip(tmp_path):
    """dump_lp_bin + prof_main: the profiling driver must read the dump and
    reproduce the ctypes path's result (same niter and objective)."""
    import os.path as osp
    d = osp.join(osp.dirname(native.__file__), "native")
    subprocess.run(["make", "-C", d, "prof_main"], check=True,
                   capture_output=True)
    lp = generate_instance("transport", seed=3, instance=0)
    ref = native.solve_lp_native(lp, method=1)
    dump = str(tmp_path / "lp_dump.bin")
    native.dump_lp_bin(lp, dump)
    out = subprocess.run([osp.join(d, "prof_main"), dump], check=True,
                         capture_output=True, text=True).stdout
    assert "rc=0" in out
    assert f"niter={ref.niter}" in out
    obj = float(out.split("obj=")[1].split()[0])
    # prof_main reports the raw objective (no obj_const offset)
    assert np.isclose(obj + lp.obj_const, ref.objective, rtol=1e-6, atol=1e-6)


def test_host_spmm_rejects_out_of_range_indices():
    """The C++ host SpMM does raw pointer writes: the wrapper must reject
    indices device segment_sum would silently drop."""
    from lp_gnn_tpu.ops import host_spmm
    if not host_spmm.available():
        pytest.skip("libtpulp.so not built")
    x = np.ones((4, 2))
    with pytest.raises(AssertionError):
        host_spmm.spmm_host(np.array([0, 3]), np.array([0, 1]),
                            np.ones(2), x, num_dst=3)  # dst 3 >= num_dst
    with pytest.raises(AssertionError):
        host_spmm.sddmm_host(np.array([0, 1]), np.array([0, 4]),
                             np.ones((2, 2)), x)       # src 4 >= len(x)


def test_native_rejected_warm_basis_masked(tmp_path):
    """An unreadable or size-mismatched warm basis is recorded as a failed
    warm solve (-1 sentinel log), mirroring the bridge's behavior."""
    from lp_gnn_tpu.io.mps import write_mps
    from lp_gnn_tpu.io.bas import write_bas_highs
    from lp_gnn_tpu.reporting.extract import extract_time
    lp = generate_instance("netflow", seed=0, instance=0)
    mps = str(tmp_path / "a.mps")
    write_mps(lp, mps)
    bad = str(tmp_path / "bad.bas")
    write_bas_highs(bad, vbas=np.zeros(3, np.int64), cbas=np.ones(2, np.int64))
    log = str(tmp_path / "a.log")
    res = native.solve_mps(mps, method=1, basis_in_path=bad, log_path=log)
    assert extract_time(log) == (-1, -1)
    assert res.status == "Optimal"   # the cold fallback itself succeeded


def test_native_ft_update_long_solve_parity():
    """Forrest-Tomlin stress: a solve spanning several full update/refresh
    cycles (niter >> the refresh interval, default 200) must keep the factorization exact — the
    objective matches the vendored-HiGHS oracle to full precision."""
    lp = generate_instance("mirp_like", seed=1, instance=0, n_ports=15,
                           n_periods=30, arc_density=0.4)
    res = native.solve_lp_native(lp, method=1)
    assert res.status == "Optimal"
    assert res.niter > 1200   # many FT cycles exercised
    if HAVE_HIGHS:
        oracle = solve_lp(lp, method=1)
        np.testing.assert_allclose(res.objective, oracle.objective, rtol=1e-9)
    # warm restart from the FT-built optimal basis is free
    warm = native.solve_lp_native(
        lp, method=1, basis_in=(res.col_status, res.row_status))
    assert warm.niter <= 2


def test_dse_pricing_beats_devex_on_netflow(monkeypatch):
    """Exact dual steepest-edge (the default; TPULP_PRICING=devex restores
    the approximation) must reach the same optimum and price equality-heavy
    netflow LPs in no more iterations than devex — the round-2 gap was
    devex wandering ~2x on spanning-tree bases."""
    lp = generate_instance("netflow", seed=3, instance=0)
    monkeypatch.setenv("TPULP_PRICING", "devex")
    rdx = native.solve_lp_native(lp, method=1)
    monkeypatch.delenv("TPULP_PRICING")
    rse = native.solve_lp_native(lp, method=1)
    assert rdx.status == "Optimal" and rse.status == "Optimal"
    assert np.isclose(rse.objective, rdx.objective, rtol=1e-6, atol=1e-6)
    assert rse.niter <= rdx.niter
