"""MPS / .bas round-trip tests (reference parity: scripts/cvt_to_pkl.py)."""
import numpy as np
import pytest

from lp_gnn_tpu.io.mps import read_mps, write_mps
from lp_gnn_tpu.io.bas import (
    read_bas, read_bas_highs, write_bas_highs, write_bas_cplex,
    check_lb, check_ub,
)
from tests.conftest import random_lp


def test_mps_roundtrip(tmp_path, rng):
    lp = random_lp(rng, m=9, n=15, two_sided=True)
    fn = str(tmp_path / "a.mps")
    write_mps(lp, fn)
    lp2 = read_mps(fn)
    assert list(lp2.con_nms) == list(lp.con_nms)
    assert list(lp2.var_nms) == list(lp.var_nms)
    np.testing.assert_allclose(lp2.c, lp.c, rtol=1e-12)
    np.testing.assert_allclose(lp2.b_l, lp.b_l, rtol=1e-12)
    np.testing.assert_allclose(lp2.b_u, lp.b_u, rtol=1e-12)
    np.testing.assert_allclose(lp2.lb, lp.lb, rtol=1e-12)
    np.testing.assert_allclose(lp2.ub, lp.ub, rtol=1e-12)
    np.testing.assert_allclose(lp2.A.toarray(), lp.A.toarray(), rtol=1e-12)


def test_mps_fixed_sample(tmp_path):
    """Hand-written MPS exercising E/L/G rows, RANGES, BOUNDS."""
    text = """* comment
NAME          TEST
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  EQ1
COLUMNS
    X1  COST  1.0  LIM1  1.0
    X1  LIM2  1.0
    X2  COST  2.0  LIM1  1.0
    X2  EQ1  -1.0
    X3  COST  -1.0  LIM2  1.0  EQ1  1.0
RHS
    RHS  LIM1  4.0  LIM2  1.0
    RHS  EQ1  7.0
RANGES
    RNG  LIM1  2.5
BOUNDS
 UP BND  X1  4.0
 LO BND  X2  -1.0
 FR BND  X3
ENDATA
"""
    fn = tmp_path / "t.mps"
    fn.write_text(text)
    lp = read_mps(str(fn))
    assert lp.shape == (3, 3)
    np.testing.assert_allclose(lp.c, [1, 2, -1])
    np.testing.assert_allclose(lp.b_l, [4.0 - 2.5, 1.0, 7.0])
    np.testing.assert_allclose(lp.b_u, [4.0, np.inf, 7.0])
    np.testing.assert_allclose(lp.lb, [0, -1, -np.inf])
    np.testing.assert_allclose(lp.ub, [4, np.inf, np.inf])
    A = lp.A.toarray()
    np.testing.assert_allclose(A, [[1, 1, 0], [1, 0, 1], [0, -1, 1]])


def test_bas_highs_roundtrip(tmp_path):
    fn = str(tmp_path / "b.bas")
    vbas = [0, 1, 2, 1, 0]
    cbas = [1, 0, 2]
    write_bas_highs(fn, vbas=vbas, cbas=cbas)
    con, var = read_bas_highs(fn)
    np.testing.assert_array_equal(con, cbas)
    np.testing.assert_array_equal(var, vbas)
    # read_bas dispatches on the header (cvt_to_pkl.py:187)
    con2, var2 = read_bas(fn)
    np.testing.assert_array_equal(con2, cbas)
    np.testing.assert_array_equal(var2, vbas)


def test_bas_cplex_roundtrip(tmp_path):
    fn = str(tmp_path / "c.bas")
    con_nms = [f"c{i}" for i in range(4)]
    var_nms = [f"x{j}" for j in range(6)]
    # valid basis: #basic vars == #nonbasic rows
    pred_con = np.array([0, 1, 2, 1])  # rows: LL, BS, UL, BS
    pred_var = np.array([1, 0, 1, 0, 2, 0])  # 2 basic, one UL
    write_bas_cplex(fn, var_nms, con_nms, pred_var, pred_con)
    con, var = read_bas(fn, con_nms, var_nms)
    np.testing.assert_array_equal(con, pred_con)
    np.testing.assert_array_equal(var, pred_var)


def test_bas_cplex_invalid_raises(tmp_path):
    with pytest.raises(AssertionError):
        write_bas_cplex(str(tmp_path / "d.bas"), ["x0"], ["c0"],
                        np.array([1]), np.array([1]))  # basic var, basic row


def test_check_lb_ub():
    lbls = np.array([0, 0, 2, 2])
    l = np.array([-np.inf, 0.0, -np.inf, 0.0])
    u = np.array([np.inf, np.inf, 1.0, np.inf])
    check_lb(lbls, l)
    assert lbls.tolist() == [2, 0, 2, 2]
    # index 0 (now UL with u=+inf) and index 3 flip to LL
    check_ub(lbls, u)
    assert lbls.tolist() == [0, 0, 2, 0]


def test_mps_free_row_and_empty_column_roundtrip(tmp_path):
    """Free rows survive as N rows; zero-cost empty columns survive via an
    explicit OBJ entry (code-review findings)."""
    from lp_gnn_tpu.io.mps import LPData
    from scipy.sparse import csr_matrix
    A = csr_matrix(np.array([[1.0, 0.0], [2.0, 0.0]]))
    lp = LPData(c=np.array([1.0, 0.0]),
                b_l=np.array([-np.inf, -np.inf]),
                A=A, b_u=np.array([np.inf, 3.0]),    # row 0 is free
                lb=np.zeros(2), ub=np.array([np.inf, 4.0]),
                con_nms=np.array(["r0", "r1"], dtype=object),
                var_nms=np.array(["x0", "x1"], dtype=object))
    fn = str(tmp_path / "f.mps")
    write_mps(lp, fn)
    lp2 = read_mps(fn)
    assert lp2.shape == (2, 2)
    np.testing.assert_allclose(lp2.b_l, [-np.inf, -np.inf])
    np.testing.assert_allclose(lp2.b_u, [np.inf, 3.0])
    np.testing.assert_allclose(lp2.c, [1.0, 0.0])
    np.testing.assert_allclose(lp2.ub, [np.inf, 4.0])


def test_mps_ranges_objsense_bounds_gz(tmp_path):
    """RANGES on L/G/E rows, OBJSENSE MAX flip, MI/FX/FR bounds, and .gz
    decompression in one fixed-format file (reference cvt_to_pkl.py:61-133
    sense-normalization semantics)."""
    import gzip
    import numpy as np
    from lp_gnn_tpu.io.mps import read_mps
    text = """NAME          T
OBJSENSE
    MAX
ROWS
 N  COST
 L  R1
 G  R2
 E  R3
COLUMNS
    X1  COST  2.0  R1  1.0
    X1  R2    1.0  R3  1.0
    X2  COST  1.0  R1  2.0
RHS
    RHS  R1  10.0  R2  2.0
    RHS  R3  5.0
RANGES
    RNG  R1  4.0   R2  3.0
    RNG  R3  6.0
BOUNDS
 MI BND  X1
 FX BND  X2  2.5
ENDATA
"""
    fn = str(tmp_path / "t.mps.gz")
    with gzip.open(fn, "wt") as f:
        f.write(text)
    lp = read_mps(fn)
    # MAX -> negated c
    np.testing.assert_allclose(lp.c, [-2.0, -1.0])
    i1 = list(lp.con_nms).index("R1")
    i2 = list(lp.con_nms).index("R2")
    i3 = list(lp.con_nms).index("R3")
    # L row + range: b_l = rhs - |r|
    assert lp.b_l[i1] == 6.0 and lp.b_u[i1] == 10.0
    # G row + range: b_u = rhs + |r|
    assert lp.b_l[i2] == 2.0 and lp.b_u[i2] == 5.0
    # E row + positive range r: [rhs, rhs + r]
    assert lp.b_l[i3] == 5.0 and lp.b_u[i3] == 11.0
    # MI: lower -inf, upper default; FX: both 2.5
    assert np.isneginf(lp.lb[0]) and lp.ub[0] == np.inf
    assert lp.lb[1] == 2.5 and lp.ub[1] == 2.5


def test_write_mps_negative_upper_zero_lower(tmp_path):
    """lb=0 with a negative upper bound must survive the round trip: a bare
    negative UP makes MPS readers set lb=-inf by convention, so the writer
    emits an explicit LO 0."""
    from scipy.sparse import csr_matrix
    from lp_gnn_tpu.io.mps import LPData
    lp = LPData(c=np.array([1.0]), b_l=np.array([-np.inf]),
                A=csr_matrix(np.array([[1.0]])), b_u=np.array([5.0]),
                lb=np.array([0.0]), ub=np.array([-2.0]),
                con_nms=np.array(["r0"], dtype=object),
                var_nms=np.array(["x0"], dtype=object))
    fn = str(tmp_path / "neg_up.mps")
    write_mps(lp, fn)
    lp2 = read_mps(fn)
    assert lp2.lb[0] == 0.0 and lp2.ub[0] == -2.0
