"""SpMM / SDDMM parity vs dense numpy (oracle for the device hot path)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lp_gnn_tpu.data.batching import pad_graph
from lp_gnn_tpu.data.dataset import BipartiteGraph
from lp_gnn_tpu.ops.spmm import (
    spmm_cons_to_vars, spmm_vars_to_cons, sddmm,
)


def make_graph(rng, m=5, n=7, e=12):
    row = rng.randint(0, m, e).astype(np.int32)
    col = rng.randint(0, n, e).astype(np.int32)
    val = (rng.randn(e) * 0.1).astype(np.float32)
    g = BipartiteGraph(
        row=row, col=col, val=val,
        c_feas=np.zeros((m, 8), np.float32), v_feas=np.zeros((n, 8), np.float32),
        y_s=np.zeros(m, np.int32), y_t=np.zeros(n, np.int32))
    pg = pad_graph(g)
    Af = np.zeros((pg.m_pad, pg.n_pad), np.float32)
    for r, c, v in zip(row, col, val):
        Af[r, c] += v
    return pg, Af


def test_spmm_forward(rng):
    pg, Af = make_graph(rng)
    x_cons = rng.randn(pg.m_pad, 4).astype(np.float32)
    x_vars = rng.randn(pg.n_pad, 4).astype(np.float32)
    out_v = np.asarray(spmm_cons_to_vars(pg, x_cons))
    out_c = np.asarray(spmm_vars_to_cons(pg, x_vars))
    np.testing.assert_allclose(out_v, Af.T @ x_cons, atol=1e-5)
    np.testing.assert_allclose(out_c, Af @ x_vars, atol=1e-5)


def test_spmm_custom_vjp(rng):
    """The backward must equal the dense transpose product."""
    pg, Af = make_graph(rng)
    x_cons = rng.randn(pg.m_pad, 4).astype(np.float32)

    def f(x):
        return (spmm_cons_to_vars(pg, x) ** 2).sum()

    g = np.asarray(jax.grad(f)(x_cons))
    want = 2 * Af @ (Af.T @ x_cons)
    np.testing.assert_allclose(g, want, atol=1e-4)

    x_vars = rng.randn(pg.n_pad, 4).astype(np.float32)

    def h(x):
        return (spmm_vars_to_cons(pg, x) ** 2).sum()

    g2 = np.asarray(jax.grad(h)(x_vars))
    want2 = 2 * Af.T @ (Af @ x_vars)
    np.testing.assert_allclose(g2, want2, atol=1e-4)


def test_spmm_jit_and_duplicates(rng):
    """Duplicate (row,col) edges must accumulate; jit must agree with eager."""
    pg, Af = make_graph(rng, m=3, n=3, e=20)  # many duplicates
    x = rng.randn(pg.m_pad, 2).astype(np.float32)
    eager = np.asarray(spmm_cons_to_vars(pg, x))
    jitted = np.asarray(jax.jit(spmm_cons_to_vars)(pg, x))
    np.testing.assert_allclose(eager, Af.T @ x, atol=1e-5)
    np.testing.assert_allclose(jitted, eager, atol=1e-6)


def test_sddmm(rng):
    pg, Af = make_graph(rng)
    xc = rng.randn(pg.m_pad, 4).astype(np.float32)
    xv = rng.randn(pg.n_pad, 4).astype(np.float32)
    out = np.asarray(sddmm(pg.row_r, pg.col_r, xc, xv))
    want = (xc[np.asarray(pg.row_r)] * xv[np.asarray(pg.col_r)]).sum(-1)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_blocked_spmm_matches_segment(rng):
    """The MXU blocked path must agree with the segment path fwd and bwd."""
    from lp_gnn_tpu.ops.spmm import blocked_spmm, segment_spmm
    pg, Af = make_graph(rng, m=5, n=7, e=40)
    assert pg.blkr_src is not None and pg.blkc_src is not None
    x_cons = rng.randn(pg.m_pad, 4).astype(np.float32)
    out = np.asarray(spmm_cons_to_vars(pg, x_cons))
    np.testing.assert_allclose(out, Af.T @ x_cons, atol=1e-5)

    def f(x):
        return (spmm_cons_to_vars(pg, x) ** 2).sum()

    g = np.asarray(jax.grad(f)(x_cons))
    np.testing.assert_allclose(g, 2 * Af @ (Af.T @ x_cons), atol=1e-4)


def test_blocked_layout_skew_fallback(rng):
    """Extreme skew disables the blocked layout; segment path still exact."""
    from lp_gnn_tpu.data.batching import pad_graph as _pad
    from lp_gnn_tpu.data.dataset import BipartiteGraph
    m, n, e = 600, 600, 1200
    row = np.zeros(e, np.int32)            # all edges on one row: max skew
    row[:600] = np.arange(600)
    col = rng.randint(0, n, e).astype(np.int32)
    val = rng.randn(e).astype(np.float32)
    g = BipartiteGraph(row=row, col=col, val=val,
                       c_feas=np.zeros((m, 8), np.float32),
                       v_feas=np.zeros((n, 8), np.float32),
                       y_s=np.zeros(m, np.int32), y_t=np.zeros(n, np.int32))
    pg = _pad(g)
    # row direction is skewed (row 0 has ~600 edges in one 128-block)
    Af = np.zeros((pg.m_pad, pg.n_pad), np.float32)
    for r, c, v in zip(row, col, val):
        Af[r, c] += v
    x = rng.randn(pg.n_pad, 3).astype(np.float32)
    out = np.asarray(spmm_vars_to_cons(pg, x))
    np.testing.assert_allclose(out, Af @ x, atol=1e-4)


def test_blocked_spmm_scan_matches(rng):
    """HBM-streaming scan path == in-memory einsum path (forced via a tiny
    memory budget)."""
    import os
    pg, Af = make_graph(rng, m=300, n=260, e=2000)
    x = rng.randn(pg.n_pad, 16).astype(np.float32)
    want = np.asarray(spmm_vars_to_cons(pg, x))
    os.environ["LP_GNN_SPMM_BUDGET"] = "2048"   # force the scan path
    try:
        got = np.asarray(spmm_vars_to_cons(pg, x))
        np.testing.assert_allclose(got, want, atol=1e-4)

        def f(xx):
            return (spmm_vars_to_cons(pg, xx) ** 2).sum()

        g_scan = np.asarray(jax.grad(f)(x))
    finally:
        del os.environ["LP_GNN_SPMM_BUDGET"]

    def f2(xx):
        return (spmm_vars_to_cons(pg, xx) ** 2).sum()

    g_ref = np.asarray(jax.grad(f2)(x))
    np.testing.assert_allclose(g_scan, g_ref, atol=1e-3)


def test_strip_coo_train_step_runs(rng):
    """Graphs with COO arrays stripped (device memory diet for 1e8-edge
    training, data/batching.py strip_coo) must still train through the
    blocked path and produce the same loss."""
    import jax
    import jax.numpy as jnp
    from lp_gnn_tpu.data.batching import strip_coo
    from lp_gnn_tpu.models.gcn import build_model
    from lp_gnn_tpu.ops.spmm import attach_input_agg
    from lp_gnn_tpu.train.trainer import make_optimizer, make_train_step
    from tests.test_models import make_pg

    pg = make_pg(rng, m=12, n=20, e=60)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    opt = make_optimizer("adam")
    step = make_train_step(model, "balanced", opt)
    r = jax.random.PRNGKey(3)
    lr = jnp.float32(1e-3)
    # fresh params per call: the train step donates params/opt_state
    p0 = model.init(jax.random.PRNGKey(0))
    _, _, loss0, _ = step(p0, opt.init(p0), pg, r, lr)
    pgs = attach_input_agg(strip_coo(pg), jnp.float32)
    p1 = model.init(jax.random.PRNGKey(0))
    _, _, loss1, _ = step(p1, opt.init(p1), pgs, r, lr)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)


def test_host_spmm_matches_dense(rng):
    """C++ host fallback (ops/host_spmm.py) vs dense numpy — the no-JAX
    mirror of segment_spmm's contract (SURVEY.md §2.2 torch_sparse row)."""
    from lp_gnn_tpu.ops import host_spmm
    if not host_spmm.available():
        pytest.skip("libtpulp.so not built")
    m, n, e, d = 6, 9, 20, 4
    dst = np.sort(rng.randint(0, m, e)).astype(np.int32)
    src = rng.randint(0, n, e).astype(np.int32)
    val = rng.randn(e)
    x = rng.randn(n, d)
    out = host_spmm.spmm_host(dst, src, val, x, m)
    ref = np.zeros((m, d))
    for k in range(e):
        ref[dst[k]] += val[k] * x[src[k]]
    np.testing.assert_allclose(out, ref, rtol=1e-12)
    gout = rng.randn(m, d)
    gval = host_spmm.sddmm_host(dst, src, gout, x)
    ref_g = np.array([gout[dst[k]] @ x[src[k]] for k in range(e)])
    np.testing.assert_allclose(gval, ref_g, rtol=1e-12)


def test_host_spmm_matches_device_op(rng):
    """Independent C++ oracle vs the jnp segment_spmm device op."""
    from lp_gnn_tpu.ops import host_spmm
    from lp_gnn_tpu.ops.spmm import segment_spmm
    if not host_spmm.available():
        pytest.skip("libtpulp.so not built")
    m, n, e, d = 5, 8, 17, 3
    dst = np.sort(rng.randint(0, m, e)).astype(np.int32)
    src = rng.randint(0, n, e).astype(np.int32)
    val = rng.randn(e).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32)
    order = np.argsort(src, kind="stable")
    tr = (src[order], dst[order], val[order])
    dev = segment_spmm(jnp.asarray(dst), jnp.asarray(src), jnp.asarray(val),
                       jnp.asarray(x), tuple(map(jnp.asarray, tr)), m)
    host = host_spmm.spmm_host(dst, src, val, x, m)
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-6)


def test_blocked_spmm_non_128_multiple_pads(rng):
    """pad_graph accepts node pads that are not multiples of 128; the
    blocked dispatch must not drop the last partial destination block."""
    m, n, e = 260, 300, 500
    row = rng.randint(0, m, e).astype(np.int32)
    row[:4] = m - 1                      # ensure the last block has mass
    col = rng.randint(0, n, e).astype(np.int32)
    val = (rng.randn(e) * 0.1).astype(np.float32)
    g = BipartiteGraph(
        row=row, col=col, val=val,
        c_feas=np.zeros((m, 8), np.float32),
        v_feas=np.zeros((n, 8), np.float32),
        y_s=np.zeros(m, np.int32), y_t=np.zeros(n, np.int32))
    pg = pad_graph(g, m_pad=300, n_pad=324, e_pad=512)
    Af = np.zeros((300, 324), np.float32)
    for r, c, v in zip(row, col, val):
        Af[r, c] += v
    x_vars = rng.randn(324, 4).astype(np.float32)
    out_c = np.asarray(spmm_vars_to_cons(pg, x_vars))
    assert out_c.shape == (300, 4)
    np.testing.assert_allclose(out_c, Af @ x_vars, atol=1e-4)
    x_cons = rng.randn(300, 4).astype(np.float32)
    out_v = np.asarray(spmm_cons_to_vars(pg, x_cons))
    assert out_v.shape == (324, 4)
    np.testing.assert_allclose(out_v, Af.T @ x_cons, atol=1e-4)
    # backward through the non-aligned transpose block count
    gr = np.asarray(jax.grad(lambda x: (spmm_vars_to_cons(pg, x) ** 2).sum())(
        jnp.asarray(x_vars)))
    np.testing.assert_allclose(gr, 2 * Af.T @ (Af @ x_vars), atol=1e-3)


def test_gather_src_grad_matches_plain_gather(rng):
    """gather_src (transpose-ordered backward) must have the exact gradient
    of a plain x[src] gather."""
    from lp_gnn_tpu.ops.spmm import gather_src
    pg, _ = make_graph(rng)
    x = jnp.asarray(rng.randn(pg.m_pad, 6).astype(np.float32))

    def f1(x):
        xs = gather_src(x, pg.row_c, pg.row_r, pg.eperm_r, pg.m_pad)
        return jnp.sum(jnp.sin(xs) * jnp.arange(xs.shape[0])[:, None])

    def f2(x):
        return jnp.sum(jnp.sin(x[pg.row_c]) *
                       jnp.arange(pg.row_c.shape[0])[:, None])

    np.testing.assert_allclose(np.asarray(f1(x)), np.asarray(f2(x)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(f1)(x)),
                               np.asarray(jax.grad(f2)(x)), atol=1e-5)
    # and the other direction (r-order edges, transpose = c-order)
    xv = jnp.asarray(rng.randn(pg.n_pad, 6).astype(np.float32))

    def h1(x):
        xs = gather_src(x, pg.col_r, pg.col_c, pg.eperm_c, pg.n_pad)
        return jnp.sum(xs ** 2)

    def h2(x):
        return jnp.sum(x[pg.col_r] ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(h1)(xv)),
                               np.asarray(jax.grad(h2)(xv)), atol=1e-5)
