"""HiGHS bridge + generator + crash tests: solve, warm-start, baselines."""
import numpy as np
import pytest

from lp_gnn_tpu.data.generator import generate_instance, GENERATORS
from lp_gnn_tpu.solver.highs_bridge import solve_lp, solve_mps, HAVE_HIGHS
from lp_gnn_tpu.solver.crash import bixby_crash_basis
from lp_gnn_tpu.io.mps import write_mps
from lp_gnn_tpu.io.bas import write_bas_highs

pytestmark = pytest.mark.skipif(not HAVE_HIGHS, reason="no vendored highspy")


@pytest.mark.parametrize("family", sorted(GENERATORS))
def test_generated_lps_solve(family):
    lp = generate_instance(family, seed=0, instance=0)
    res = solve_lp(lp, method=1)
    assert res.status == "Optimal", (family, res.status)
    assert res.niter > 0
    assert len(res.col_status) == lp.shape[1]
    assert len(res.row_status) == lp.shape[0]
    # basis validity: #basic == m
    nb = (res.col_status == 1).sum() + (res.row_status == 1).sum()
    assert nb == lp.shape[0]


def test_family_structure_fixed():
    a = generate_instance("mirp_like", seed=0, instance=0)
    b = generate_instance("mirp_like", seed=0, instance=1)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a.A.indices, b.A.indices)  # same pattern
    assert not np.allclose(a.b_l, b.b_l)                     # different data


def test_mirp_mix_families_deterministic_and_mixed():
    """The r4 hardness-mix families: deterministic in (seed, instance);
    mirp_mix varies the structure per instance (different shapes with
    high probability), while mirp_mix_s keeps ONE shared network — equal
    horizons imply an identical sparsity pattern with only the rd-driven
    data differing (the invariant its causal analysis rests on)."""
    a1 = generate_instance("mirp_mix", seed=0, instance=3,
                           n_ports_range=(6, 12), n_periods_range=(6, 16))
    a2 = generate_instance("mirp_mix", seed=0, instance=3,
                           n_ports_range=(6, 12), n_periods_range=(6, 16))
    assert a1.shape == a2.shape
    np.testing.assert_array_equal(a1.A.toarray(), a2.A.toarray())
    shapes = {generate_instance("mirp_mix", seed=0, instance=k,
                                n_ports_range=(6, 12),
                                n_periods_range=(6, 16)).shape
              for k in range(6)}
    assert len(shapes) > 1   # the mix actually mixes

    # shared-structure variant: force equal horizons via a 1-wide range
    kw = dict(n_ports=5, n_periods_range=(8, 8), arc_density=0.6)
    s1 = generate_instance("mirp_mix_s", seed=0, instance=0, **kw)
    s2 = generate_instance("mirp_mix_s", seed=0, instance=1, **kw)
    assert s1.shape == s2.shape
    np.testing.assert_array_equal(s1.A.indices, s2.A.indices)
    np.testing.assert_array_equal(s1.A.indptr, s2.A.indptr)
    assert not np.allclose(s1.b_l, s2.b_l)   # data varies per instance
    # tightness is per-instance: the capacity bounds differ too
    assert not np.allclose(s1.ub[np.isfinite(s1.ub)],
                           s2.ub[np.isfinite(s2.ub)])


def test_warm_start_from_optimal_is_free():
    lp = generate_instance("transport", seed=0, instance=0)
    cold = solve_lp(lp, method=1)
    warm = solve_lp(lp, method=1, basis_in=(cold.col_status, cold.row_status))
    assert warm.status == "Optimal"
    assert warm.niter <= max(2, cold.niter // 10)


def test_crash_basis_valid_and_helps():
    lp = generate_instance("mirp_like", seed=0, instance=0)
    colb, rowb = bixby_crash_basis(lp)
    assert ((colb == 1).sum() + (rowb == 1).sum()) == lp.shape[0]
    cold = solve_lp(lp, method=1)
    warm = solve_lp(lp, method=1, basis_in=(colb, rowb))
    assert warm.status == "Optimal"
    assert np.isclose(warm.objective, cold.objective, rtol=1e-6)


def test_solve_mps_files(tmp_path):
    lp = generate_instance("netflow", seed=0, instance=0)
    mps = str(tmp_path / "a.mps")
    write_mps(lp, mps)
    bas = str(tmp_path / "a.bas")
    log = str(tmp_path / "a.log")
    res = solve_mps(mps, method=1, basis_out_path=bas, log_path=log)
    assert res.status == "Optimal"
    # log must satisfy the reference parser contract (utils.py:621-660)
    text = open(log).read()
    assert "HiGHS" in text
    import re
    it_line = [l for l in text.splitlines() if "iterations" in l][0]
    assert int(re.findall(r"\d+", it_line)[0]) == res.niter
    stat_line = [l for l in text.splitlines() if "status" in l and "Model" in l][0]
    assert "Optimal" in stat_line
    tm_line = [l for l in text.splitlines() if "run time" in l][0]
    assert re.findall(r"\d*\.\d*", tm_line)
    # warm start from file
    res2 = solve_mps(mps, method=1, basis_in_path=bas)
    assert res2.niter <= 2


def test_rejected_warm_basis_records_failure(tmp_path):
    """A corrupt warm-start basis must be recorded as a failed warm solve
    (log parses to the -1 sentinel; reference utils.py:621-626), never as a
    genuine warm result that pollutes the impr columns."""
    from lp_gnn_tpu.reporting.extract import extract_time
    lp = generate_instance("netflow", seed=0, instance=0)
    mps = str(tmp_path / "a.mps")
    write_mps(lp, mps)
    # wrong-size basis: statuses for 3 vars / 2 rows on a bigger LP
    bad_bas = str(tmp_path / "bad.bas")
    write_bas_highs(bad_bas, vbas=np.zeros(3, np.int64),
                    cbas=np.ones(2, np.int64))
    log = str(tmp_path / "a.log")
    res = solve_mps(mps, method=1, basis_in_path=bad_bas, log_path=log)
    assert res.basis_rejected
    assert extract_time(log) == (-1, -1)
    # an unreadable (garbage) basis file takes the same path
    garbage = str(tmp_path / "garbage.bas")
    with open(garbage, "w") as f:
        f.write("this is not a basis file\n")
    log2 = str(tmp_path / "b.log")
    res2 = solve_mps(mps, method=1, basis_in_path=garbage, log_path=log2)
    assert res2.basis_rejected
    assert extract_time(log2) == (-1, -1)


def test_primal_vs_dual_same_objective():
    lp = generate_instance("packing", seed=0, instance=0)
    d = solve_lp(lp, method=1)
    p = solve_lp(lp, method=4)
    assert np.isclose(d.objective, p.objective, rtol=1e-8)


def test_scipy_linprog_oracle():
    """Cross-check objective vs scipy.linprog on a generated instance."""
    from scipy.optimize import linprog
    lp = generate_instance("transport", seed=1, instance=0)
    res = solve_lp(lp, method=1)
    m = lp.shape[0]
    A = lp.A
    # convert two-sided rows to ub/eq form
    import scipy.sparse as sp
    rows_ub, rhs_ub = [], []
    rows_eq, rhs_eq = [], []
    for i in range(m):
        lo, hi = lp.b_l[i], lp.b_u[i]
        if lo == hi:
            rows_eq.append(i)
            rhs_eq.append(lo)
        else:
            if np.isfinite(hi):
                rows_ub.append((1.0, i, hi))
            if np.isfinite(lo):
                rows_ub.append((-1.0, i, -lo))
    A_ub = sp.vstack([s * A[i] for s, i, _ in rows_ub]) if rows_ub else None
    b_ub = np.array([r for _, _, r in rows_ub]) if rows_ub else None
    A_eq = A[rows_eq] if rows_eq else None
    b_eq = np.array(rhs_eq) if rows_eq else None
    out = linprog(lp.c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                  bounds=np.stack([lp.lb, lp.ub], axis=1), method="highs")
    assert out.status == 0
    assert np.isclose(out.fun, res.objective, rtol=1e-7)


def test_perm_variant_preserves_objective():
    """-perm instances are row/col relabelings: same optimum, shuffled names
    (reference's medium-perm dataset variants, utils.py:862-865)."""
    base = generate_instance("transport", seed=3, instance=0)
    perm = generate_instance("transport", seed=3, instance=0, perm=True)
    assert perm.shape == base.shape
    assert not np.array_equal(perm.con_nms, base.con_nms)
    a, b = solve_lp(base, method=1), solve_lp(perm, method=1)
    assert a.status == b.status == "Optimal"
    np.testing.assert_allclose(a.objective, b.objective, rtol=1e-7)


def test_svm_family_shape_and_margin_rows():
    lp = generate_instance("svm", seed=0, instance=0)
    m, n = lp.shape
    # one margin row per sample; vars = xi + w+/w- + split bias
    assert n == m + 2 * 20 + 2
    assert np.all(lp.b_l == 1.0) and np.all(np.isinf(lp.b_u))
    assert np.all(lp.lb == 0.0)


def test_crash_basis_free_variable_status():
    """A free variable that stays nonbasic must get FZ (HiGHS kZero), never
    LL — nonbasic at a bound that does not exist is an invalid basis."""
    import numpy as np
    from scipy.sparse import csr_matrix
    from lp_gnn_tpu.io.mps import LPData
    from lp_gnn_tpu.io.bas import BS, FZ
    # x0 free, x1 in [0, inf); one constraint each so only one can be basic
    lp = LPData(c=np.array([1.0, 1.0]), b_l=np.array([1.0]),
                A=csr_matrix(np.array([[1.0, 1e-6]])), b_u=np.array([np.inf]),
                lb=np.array([-np.inf, 0.0]), ub=np.array([np.inf, np.inf]),
                con_nms=np.array(["r0"], dtype=object),
                var_nms=np.array(["x0", "x1"], dtype=object))
    colb, rowb = bixby_crash_basis(lp)
    assert all(s in (BS, FZ) for j, s in enumerate(colb)
               if not np.isfinite(lp.lb[j]) and not np.isfinite(lp.ub[j]))
    # the basis must be structurally valid and accepted by the solver
    nb = (colb == 1).sum() + (rowb == 1).sum()
    assert nb == lp.shape[0]
    res = solve_lp(lp, method=1, basis_in=(colb, rowb))
    assert res.status == "Optimal"
