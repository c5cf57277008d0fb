"""Scaling + feature parity tests against independent dense-numpy oracles
(reference dataset.py:23-96, utils.py:323-383)."""
import numpy as np

from lp_gnn_tpu.data.scaling import scaling, sparse_mat_div_by_vec
from lp_gnn_tpu.data.features import (
    cvt_to_features, expand_inf, cos_sim_vec_and_sparse_mat,
    count_nonzero_sparse_mat,
)
from tests.conftest import random_lp


def test_sparse_div(rng):
    lp = random_lp(rng)
    A = lp.A
    v = rng.rand(A.shape[0]) + 0.5
    B = sparse_mat_div_by_vec(A, v, "row")
    np.testing.assert_allclose(B.toarray(), A.toarray() / v[:, None])
    w = rng.rand(A.shape[1]) + 0.5
    C = sparse_mat_div_by_vec(A, w, "col")
    np.testing.assert_allclose(C.toarray(), A.toarray() / w[None, :])


def test_expand_inf():
    x = np.array([1.5, np.inf, -np.inf, 0.0])
    out = expand_inf(x)
    np.testing.assert_allclose(out, [[1.5, 0], [0, 1], [0, -1], [0, 0]])


def test_cos_sim(rng):
    lp = random_lp(rng)
    A = lp.A
    v = rng.randn(A.shape[0])
    got = cos_sim_vec_and_sparse_mat(v, A)
    Ad = A.toarray()
    want = (v @ Ad) / (np.linalg.norm(v) * np.linalg.norm(Ad, axis=0) + 0)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_cos_sim_inf_clip(rng):
    """+-inf entries clip to +-1e8 (utils.py:352)."""
    lp = random_lp(rng)
    A = lp.A
    v = np.full(A.shape[0], -np.inf)
    got = cos_sim_vec_and_sparse_mat(v, A)
    assert np.isfinite(got).all()
    vc = np.full(A.shape[0], -1e8)
    want = cos_sim_vec_and_sparse_mat(vc, A)
    np.testing.assert_allclose(got, want)


def test_scaling_ranges(rng):
    lp = random_lp(rng, m=11, n=17, two_sided=True)
    c, b_l, A, b_u, l, u = scaling(lp.c.copy(), lp.b_l.copy(), lp.A.copy(),
                                   lp.b_u.copy(), lp.lb.copy(), lp.ub.copy())
    # contract asserted on every load (dataset.py:235-238)
    assert np.abs(A.data).max() <= 1 + 1e-12
    assert np.abs(c).max() <= 1 + 1e-12
    fin = np.isfinite(b_l)
    assert (np.abs(b_l[fin]) <= 1 + 1e-12).all()
    fin = np.isfinite(b_u)
    assert (np.abs(b_u[fin]) <= 1 + 1e-12).all()


def test_scaling_solution_invariance(rng):
    """Scaling is a diagonal row/col transform: x feasible for the original
    iff D_c x feasible for the scaled problem."""
    lp = random_lp(rng, m=6, n=9, two_sided=True)
    A0 = lp.A.toarray().copy()
    c, b_l, A, b_u, l, u = scaling(lp.c.copy(), lp.b_l.copy(), lp.A.copy(),
                                   lp.b_u.copy(), lp.lb.copy(), lp.ub.copy())
    # recover the diagonal scalings
    As = A.toarray()
    # rows of A0 and As are proportional: A0 = diag(r) As diag(s)
    # solve r_i s_j from entries; verify consistency via reconstruction
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(As != 0, A0 / As, np.nan)
    # each row of ratio = r_i * s_j -> log-decompose on the nonzero pattern
    mask = ~np.isnan(ratio)
    assert mask.any()
    # use first nonzero of first row as anchor
    i0, j0 = np.argwhere(mask)[0]
    s = np.full(A0.shape[1], np.nan)
    r = np.full(A0.shape[0], np.nan)
    r[i0] = ratio[i0, j0]
    s[j0] = 1.0
    for _ in range(A0.shape[0] + A0.shape[1]):
        for i in range(A0.shape[0]):
            for j in range(A0.shape[1]):
                if mask[i, j]:
                    if np.isnan(r[i]) and not np.isnan(s[j]):
                        r[i] = ratio[i, j] / s[j]
                    elif np.isnan(s[j]) and not np.isnan(r[i]):
                        s[j] = ratio[i, j] / r[i]
    ok = ~np.isnan(r[:, None] * s[None, :])
    np.testing.assert_allclose((r[:, None] * s[None, :])[mask & ok],
                               ratio[mask & ok], rtol=1e-8)


def test_features_shapes(rng):
    lp = random_lp(rng, m=11, n=17, two_sided=True)
    c, b_l, A, b_u, l, u = scaling(lp.c.copy(), lp.b_l.copy(), lp.A.copy(),
                                   lp.b_u.copy(), lp.lb.copy(), lp.ub.copy())
    v, cf = cvt_to_features(c, b_l, A, b_u, l, u)
    assert v.shape == (17, 8)
    assert cf.shape == (11, 8)
    assert np.isfinite(v).all() and np.isfinite(cf).all()
    # column layout: var side [c, nnz/m, cos, cos, l_val, l_tag, u_val, u_tag]
    np.testing.assert_allclose(v[:, 0], c)
    np.testing.assert_allclose(v[:, 1], count_nonzero_sparse_mat(A, "col") / 11)
    np.testing.assert_allclose(v[:, 4:6], expand_inf(l))
    np.testing.assert_allclose(v[:, 6:8], expand_inf(u))
    np.testing.assert_allclose(cf[:, 4:6], expand_inf(b_l))
    np.testing.assert_allclose(cf[:, 6:8], expand_inf(b_u))
