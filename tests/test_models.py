"""Model zoo, knowledge masking, decode, loss tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lp_gnn_tpu.data.batching import pad_graph
from lp_gnn_tpu.data.dataset import BipartiteGraph
from lp_gnn_tpu.models.gcn import build_model
from lp_gnn_tpu.models.layers import add_knowledge
from lp_gnn_tpu.infer.decode import (
    inference_gnn, inference_all_slacks, decode_topm_device,
    parse_inference_manager,
)
from lp_gnn_tpu.train.losses import balanced, unbalanced, focal
from lp_gnn_tpu.train.metrics import accuracy


def make_pg(rng, m=6, n=10, e=18):
    row = rng.randint(0, m, e).astype(np.int32)
    col = rng.randint(0, n, e).astype(np.int32)
    val = (rng.rand(e).astype(np.float32) - 0.5)
    c_feas = (rng.rand(m, 8).astype(np.float32) - 0.5)
    v_feas = (rng.rand(n, 8).astype(np.float32) - 0.5)
    # bound tags in {-1, 0, 1}
    for fe in (c_feas, v_feas):
        fe[:, -3] = rng.randint(-1, 2, fe.shape[0])
        fe[:, -1] = rng.randint(-1, 2, fe.shape[0])
    g = BipartiteGraph(row=row, col=col, val=val, c_feas=c_feas, v_feas=v_feas,
                      y_s=rng.randint(0, 3, m).astype(np.int32),
                      y_t=rng.randint(0, 3, n).astype(np.int32))
    return pad_graph(g)


@pytest.mark.parametrize("arch", [
    "GCN_FC(8,8,hids=16,depth=3)",
    "GCN_FC(8,8,hids=16,depth=5)",
    "GCN(8,8,hids=16)",
    "GCNRand()",
    "GCNDeeper(8,8,hids=16,depth=4)",
    "GENDeeper(8,8,hids=16,depth=3)",
])
def test_model_forward(rng, arch):
    pg = make_pg(rng)
    model = build_model(arch)
    params = model.init(jax.random.PRNGKey(0))
    lc, lv = model.apply(params, pg, train=False)
    assert lc.shape == (pg.m_pad, 3)
    assert lv.shape == (pg.n_pad, 3)
    assert np.isfinite(np.asarray(lc)).all()
    assert np.isfinite(np.asarray(lv)).all()
    # jit agrees with eager
    lc2, lv2 = jax.jit(lambda p, g: model.apply(p, g))(params, pg)
    np.testing.assert_allclose(np.asarray(lc2), np.asarray(lc), atol=2e-5)


def test_train_mode_dropout_differs(rng):
    pg = make_pg(rng)
    model = build_model("GCN_FC(8,8,hids=32,depth=4)")
    params = model.init(jax.random.PRNGKey(0))
    l1, _ = model.apply(params, pg, train=True, rng=jax.random.PRNGKey(1))
    l2, _ = model.apply(params, pg, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_add_knowledge(rng):
    left = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(7, 3).astype(np.float32))
    lf = np.zeros((5, 8), np.float32)
    rf = np.zeros((7, 8), np.float32)
    lf[0, -3] = -1.0   # lower bound -inf -> class LL infeasible
    lf[1, -1] = 1.0    # upper bound +inf -> class UL infeasible
    lo, ro = add_knowledge(left, right, jnp.asarray(lf), jnp.asarray(rf))
    lo, ro = np.asarray(lo), np.asarray(ro)
    # rows are L2-normalized * 10 before masking (arch.py:133-135)
    np.testing.assert_allclose(np.linalg.norm(ro, axis=1), 10.0, rtol=1e-5)
    base = np.asarray(left[0] / np.linalg.norm(left[0]) * 10)
    assert np.isclose(lo[0, 0], base[0] - 10, atol=1e-5)
    assert np.isclose(lo[0, 2], base[2], atol=1e-5)
    base1 = np.asarray(left[1] / np.linalg.norm(left[1]) * 10)
    assert np.isclose(lo[1, 2], base1[2] - 10, atol=1e-5)


def test_decode_validity(rng):
    m, n = 9, 21
    logits = rng.randn(m + n, 3)
    pred = inference_gnn(logits, m)
    assert (pred == 1).sum() == m
    assert (pred[m:] == 1).sum() == ((pred[:m] == 0) | (pred[:m] == 2)).sum()


def test_decode_device_matches_numpy(rng):
    m, n = 9, 21
    m_pad, n_pad = 16, 32
    logits = rng.randn(m + n, 3).astype(np.float32)
    lc = np.zeros((m_pad, 3), np.float32)
    lv = np.zeros((n_pad, 3), np.float32)
    lc[:m] = logits[:m]
    lv[:n] = logits[m:]
    cm = np.arange(m_pad) < m
    vm = np.arange(n_pad) < n
    pc, pv = decode_topm_device(jnp.asarray(lc), jnp.asarray(lv),
                                jnp.asarray(cm), jnp.asarray(vm), m)
    got = np.concatenate([np.asarray(pc)[:m], np.asarray(pv)[:n]])
    want = inference_gnn(logits, m)
    np.testing.assert_array_equal(got, want)
    # pads marked -1
    assert (np.asarray(pc)[m:] == -1).all()


def test_decode_all_slacks(rng):
    m, n = 5, 8
    logits = rng.randn(m + n, 3)
    pred = inference_all_slacks(logits, m)
    assert (pred[:m] == 1).all()
    assert (pred[m:] != 1).all()


def test_inference_manager_parse():
    im = parse_inference_manager("InferenceManager(0, run=0)")
    assert im.get_basis_folder() == "pred-basis"
    assert im.get_log_folder() == "gnn-bas-0"
    im2 = parse_inference_manager("InferenceManager(2,1)")
    assert im2.mode == "mult"
    assert "gnn-sparsity-mult" in im2.get_basis_folder()


def test_losses_against_torch_semantics(rng):
    """Oracle: replicate torch CrossEntropyLoss(weight=w) by hand."""
    m, n = 6, 9
    lc = rng.randn(m, 3).astype(np.float32)
    lv = rng.randn(n, 3).astype(np.float32)
    ys = rng.randint(0, 3, m)
    yt = rng.randint(0, 3, n)
    ms = np.ones(m, bool)
    mt = np.ones(n, bool)

    def ce(logits, y):
        ex = np.exp(logits - logits.max(-1, keepdims=True))
        logp = np.log(ex / ex.sum(-1, keepdims=True))
        return -logp[np.arange(len(y)), y]

    # unbalanced == plain mean
    got = float(unbalanced(jnp.asarray(lc), jnp.asarray(lv),
                           jnp.asarray(ys), jnp.asarray(yt),
                           jnp.asarray(ms), jnp.asarray(mt)))
    want = np.concatenate([ce(lc, ys), ce(lv, yt)]).mean()
    assert np.isclose(got, want, rtol=1e-5)

    # balanced: per-side weighted CE with class weights total/cnt (merged 0,2)
    def wts(y):
        cnt = np.bincount(y, minlength=3).astype(float)
        w = np.where(cnt > 0, len(y) / np.maximum(cnt, 1), 0.0)
        if (cnt > 0).sum() != 2:
            w[0] = w[2] = (w[0] + w[2]) / 2
        return w

    def wce(logits, y):
        w = wts(y)[y]
        return (w * ce(logits, y)).sum() / w.sum()

    want_b = (m + n) / m * wce(lc, ys) + (m + n) / n * wce(lv, yt)
    got_b = float(balanced(jnp.asarray(lc), jnp.asarray(lv),
                           jnp.asarray(ys), jnp.asarray(yt),
                           jnp.asarray(ms), jnp.asarray(mt)))
    assert np.isclose(got_b, want_b, rtol=1e-5)

    # focal applies (1-exp(-mean_ce))^2 to the mean ce (reference quirk)
    got_f = float(focal(jnp.asarray(lc), jnp.asarray(lv),
                        jnp.asarray(ys), jnp.asarray(yt),
                        jnp.asarray(ms), jnp.asarray(mt)))
    want_f = (1 - np.exp(-want)) ** 2 * want
    assert np.isclose(got_f, want_f, rtol=1e-5)


def test_loss_padding_invariance(rng):
    """Padding must not change the loss value."""
    m, n = 6, 9
    lc = rng.randn(m, 3).astype(np.float32)
    lv = rng.randn(n, 3).astype(np.float32)
    ys = rng.randint(0, 3, m)
    yt = rng.randint(0, 3, n)
    base = float(balanced(jnp.asarray(lc), jnp.asarray(lv), jnp.asarray(ys),
                          jnp.asarray(yt), jnp.ones(m, bool), jnp.ones(n, bool)))
    lc_p = np.concatenate([lc, rng.randn(4, 3).astype(np.float32)])
    lv_p = np.concatenate([lv, rng.randn(2, 3).astype(np.float32)])
    ys_p = np.concatenate([ys, np.zeros(4, np.int64)])
    yt_p = np.concatenate([yt, np.zeros(2, np.int64)])
    ms = np.concatenate([np.ones(m, bool), np.zeros(4, bool)])
    mt = np.concatenate([np.ones(n, bool), np.zeros(2, bool)])
    padded = float(balanced(jnp.asarray(lc_p), jnp.asarray(lv_p),
                            jnp.asarray(ys_p), jnp.asarray(yt_p),
                            jnp.asarray(ms), jnp.asarray(mt)))
    assert np.isclose(base, padded, rtol=1e-5)


def test_accuracy_metric(rng):
    m, n = 8, 12
    gt = np.concatenate([rng.randint(0, 3, m), rng.randint(0, 3, n)])
    logits = np.zeros((m + n, 3), np.float32)
    logits[np.arange(m + n), gt] = 5.0  # strongly peaked at gt
    acc, prec, recl = accuracy(logits, gt, m, return_pr=True)
    # decode forces exactly m basic so acc may be < 1, but must be within [0,1]
    assert 0 <= acc <= 1 and 0 <= prec <= 1 and 0 <= recl <= 1
    # if gt itself is a valid basis, peaked logits decode perfectly
    gt2 = np.concatenate([np.ones(m, np.int64), np.zeros(n, np.int64)])
    logits2 = np.zeros((m + n, 3), np.float32)
    logits2[np.arange(m + n), gt2] = 5.0
    acc2 = accuracy(logits2, gt2, m)
    assert acc2 == 1.0


def test_accuracy_metric_stoch_mode(rng):
    """'stoch' datasets score the variable side only (reference
    val.py:211-213,226-229: constraint labels are all-nonbasic there, so
    acc1/p1/r1 are replaced by the var side's values)."""
    m, n = 10, 30
    # a valid basis: all m basic on the var side, constraints all nonbasic
    basic_vars = np.zeros(n, np.int64)
    basic_vars[:m] = 1
    gt = np.concatenate([np.zeros(m, np.int64), basic_vars])
    logits = np.zeros((m + n, 3), np.float32)
    logits[np.arange(m + n), gt] = 5.0
    # mislabel every constraint in gt: with stoch mode the score must ignore it
    gt_bad_cons = gt.copy()
    gt_bad_cons[:m] = 2
    acc_plain, prec_plain, recl_plain = accuracy(
        logits, gt_bad_cons, m, return_pr=True)
    acc_stoch, prec_stoch, recl_stoch = accuracy(
        logits, gt_bad_cons, m, return_pr=True, dataset_name="stoch")
    assert acc_plain < 1.0 and acc_stoch == 1.0
    assert prec_stoch == 1.0 and recl_stoch == 1.0
    # non-stoch names keep two-sided scoring
    assert accuracy(logits, gt_bad_cons, m, dataset_name="mirp") == acc_plain


def test_bf16_compute_close_to_fp32(rng):
    """bf16 stack must stay close to fp32 (mask applied in fp32 keeps logits
    bounded, arch.py:133-135 rationale)."""
    pg = make_pg(rng, m=12, n=20, e=60)
    m32 = build_model("GCN_FC(8,8,hids=32,depth=3)")
    m16 = build_model("GCN_FC(8,8,hids=32,depth=3,dtype='bfloat16')")
    params = m32.init(jax.random.PRNGKey(0))
    lc32, lv32 = m32.apply(params, pg)
    lc16, lv16 = m16.apply(params, pg)
    assert np.asarray(lc16).dtype == np.float32  # mask output is fp32
    np.testing.assert_allclose(np.asarray(lc16), np.asarray(lc32), atol=0.4)
    # decode agreement on a clear-margin case is not guaranteed under bf16,
    # but unmasked rows must keep the L2=10 normalized scale
    vf = np.asarray(pg.v_feas)
    unmasked = (np.abs(vf[:, -3]) == 0) & (np.abs(vf[:, -1]) == 0) & \
        np.asarray(pg.vars_mask)
    norms = np.linalg.norm(np.asarray(lv16)[unmasked], axis=1)
    np.testing.assert_allclose(norms, 10.0, rtol=0.05)


def test_remat_matches_plain(rng):
    """remat=True (jax.checkpoint per conv) must be numerically identical
    in both forward logits and gradients."""
    pg = make_pg(rng, m=12, n=20, e=60)
    m0 = build_model("GCN_FC(8,8,hids=16,depth=3)")
    m1 = build_model("GCN_FC(8,8,hids=16,depth=3,remat=True)")
    params = m0.init(jax.random.PRNGKey(1))

    def loss(mdl, p):
        lc, lv = mdl.apply(p, pg)
        return jnp.sum(lc ** 2) + jnp.sum(lv ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


@pytest.mark.parametrize("arch", [
    "GCN_FC(8,8,hids=16,depth=3)",
    "GCN_FC(8,8,hids=16,depth=3,dtype='bfloat16')",
    "GCN(8,8,hids=16)",
    "GCNDeeper(8,8,hids=16,depth=4)",
])
def test_input_agg_cache_exact(rng, arch):
    """attach_input_agg must leave forward logits and parameter gradients
    bit-identical: the input conv's aggregation is a per-graph constant
    (ops/spmm.py attach_input_agg)."""
    from lp_gnn_tpu.ops.spmm import attach_input_agg
    pg = make_pg(rng, m=12, n=20, e=60)
    model = build_model(arch)
    pgc = attach_input_agg(pg, jnp.dtype(model.dtype))
    assert pgc.in_agg_c is not None and pgc.in_agg_v is not None
    params = model.init(jax.random.PRNGKey(2))

    def loss(p, g):
        lc, lv = model.apply(p, g, train=True, rng=jax.random.PRNGKey(5))
        return jnp.sum(lc ** 2) + jnp.sum(lv ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, pg)
    l1, g1 = jax.value_and_grad(loss)(params, pgc)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_input_agg_dtype_mismatch_falls_back(rng):
    """A cache in the wrong dtype must be ignored, not silently used."""
    from lp_gnn_tpu.ops.spmm import attach_input_agg
    pg = make_pg(rng)
    model = build_model("GCN_FC(8,8,hids=16,depth=3,dtype='bfloat16')")
    pgc = attach_input_agg(pg, jnp.float32)   # wrong dtype on purpose
    params = model.init(jax.random.PRNGKey(0))
    lc0, _ = model.apply(params, pg)
    lc1, _ = model.apply(params, pgc)
    np.testing.assert_array_equal(np.asarray(lc0), np.asarray(lc1))


def test_train_step_traversal_count(rng):
    """The traced train step runs 6 SpMM traversals without the input-agg
    cache and 4 with it (bench.py's SPMM_PER_EDGE=6 accounting)."""
    import lp_gnn_tpu.ops.spmm as spmm_mod
    from lp_gnn_tpu.ops.spmm import attach_input_agg
    from lp_gnn_tpu.train.trainer import make_optimizer, make_train_step

    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer("adam")

    counts = {"fwd": 0, "bwd": 0}
    orig_call, orig_bwd = spmm_mod._blocked_call, spmm_mod._blocked_spmm_bwd

    def counted_call(pg, x, side):
        counts["fwd"] += 1
        return orig_call(pg, x, side)

    def counted_bwd(num_blocks, res, g):
        counts["bwd"] += 1
        return orig_bwd(num_blocks, res, g)

    spmm_mod._blocked_call = counted_call
    spmm_mod.blocked_spmm.defvjp(spmm_mod._blocked_spmm_fwd, counted_bwd)
    try:
        for expect, attach in [(6, False), (4, True)]:
            pg = make_pg(rng, m=12, n=20, e=60)
            if attach:
                pg = attach_input_agg(pg, jnp.dtype(model.dtype))
            counts["fwd"] = counts["bwd"] = 0
            step = make_train_step(model, "balanced", opt)
            step.lower(params, opt.init(params), pg, jax.random.PRNGKey(0),
                       jnp.float32(1e-3))
            assert counts["fwd"] + counts["bwd"] == expect, counts
    finally:
        spmm_mod._blocked_call = orig_call
        spmm_mod.blocked_spmm.defvjp(spmm_mod._blocked_spmm_fwd, orig_bwd)


def test_input_agg_stacks_and_vmaps(rng):
    """Graphs with attached input aggregations stack (dp/graph_batch) and
    vmapped application equals per-graph application."""
    from lp_gnn_tpu.ops.spmm import attach_input_agg
    from lp_gnn_tpu.parallel.dp import stack_graphs
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    pgs = [attach_input_agg(make_pg(np.random.RandomState(s), m=12, n=20,
                                    e=60), jnp.dtype(model.dtype))
           for s in range(3)]
    pgs = [jax.tree.map(np.asarray, p) for p in pgs]
    batch = stack_graphs(pgs)
    lcb, lvb = jax.vmap(lambda g: model.apply(params, g))(batch)
    for i, pg in enumerate(pgs):
        lc, lv = model.apply(params, pg)
        np.testing.assert_allclose(np.asarray(lcb[i]), np.asarray(lc),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(lvb[i]), np.asarray(lv),
                                   atol=1e-5)


def test_gen_padding_edges_do_not_contaminate(rng):
    """GEN's softmax aggregation must exclude padding edges: when the real
    node count fills the bucket exactly, padding edges target a REAL node
    (the last one) and would corrupt its output without the mask."""
    from lp_gnn_tpu.models.gen import gen_bidir_init, gen_bidir_apply
    m, n, e = 128, 128, 60
    row = rng.randint(0, m, e).astype(np.int32)
    col = rng.randint(0, n, e).astype(np.int32)
    val = (rng.rand(e).astype(np.float32) - 0.5)
    g = BipartiteGraph(row=row, col=col, val=val,
                       c_feas=rng.rand(m, 8).astype(np.float32),
                       v_feas=rng.rand(n, 8).astype(np.float32),
                       y_s=np.zeros(m, np.int32), y_t=np.zeros(n, np.int32))
    pg_nopad = pad_graph(g, m_pad=m, n_pad=n, e_pad=e)     # no padding edges
    pg_pad = pad_graph(g, m_pad=m, n_pad=n, e_pad=e + 68)  # 68 padding edges
    params = gen_bidir_init(jax.random.PRNGKey(0), 8, 8, 16)
    l1, r1 = gen_bidir_apply(params, pg_nopad, jnp.asarray(g.c_feas),
                             jnp.asarray(g.v_feas))
    l2, r2 = gen_bidir_apply(params, pg_pad, jnp.asarray(g.c_feas),
                             jnp.asarray(g.v_feas))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_gen_global_max_mode_matches_segment_max(rng, monkeypatch):
    """LP_GNN_GEN_MAX=global replaces the per-segment softmax max with a
    per-channel global max (r5 probe lever, scripts/probe_gen_floor.py).
    Softmax is shift-invariant, so outputs AND gradients must agree with
    the default segment-max mode to fp32 rounding."""
    from lp_gnn_tpu.models.gen import gen_bidir_init, gen_bidir_apply
    m, n, e = 64, 96, 300
    g = BipartiteGraph(row=rng.randint(0, m, e).astype(np.int32),
                       col=rng.randint(0, n, e).astype(np.int32),
                       val=(rng.rand(e).astype(np.float32) - 0.5),
                       c_feas=rng.rand(m, 8).astype(np.float32),
                       v_feas=rng.rand(n, 8).astype(np.float32),
                       y_s=np.zeros(m, np.int32), y_t=np.zeros(n, np.int32))
    pg = pad_graph(g)
    params = gen_bidir_init(jax.random.PRNGKey(0), 8, 8, 16)
    xl, xr = jnp.asarray(pg.c_feas), jnp.asarray(pg.v_feas)

    def loss(ps):
        l, r = gen_bidir_apply(ps, pg, xl, xr)
        return jnp.sum(l ** 2) + jnp.sum(r ** 2)

    outs = {}
    for mode in ("seg", "global"):
        monkeypatch.setenv("LP_GNN_GEN_MAX", mode)
        (l, r), gr = (gen_bidir_apply(params, pg, xl, xr),
                      jax.grad(loss)(params))
        outs[mode] = (np.asarray(l), np.asarray(r), gr)
    np.testing.assert_allclose(outs["seg"][0], outs["global"][0], atol=1e-5)
    np.testing.assert_allclose(outs["seg"][1], outs["global"][1], atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs["seg"][2]),
                    jax.tree_util.tree_leaves(outs["global"][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gen_mismatched_side_dims(rng):
    """lin_src/lin_dst projections (reference GENConv dimension plumbing)
    let the two sides carry different widths."""
    from lp_gnn_tpu.models.gen import gen_bidir_init, gen_bidir_apply
    pg = make_pg(rng)
    left = jnp.asarray(np.random.RandomState(0).randn(
        pg.m_pad, 6).astype(np.float32))
    right = jnp.asarray(np.random.RandomState(1).randn(
        pg.n_pad, 10).astype(np.float32))
    params = gen_bidir_init(jax.random.PRNGKey(0), 6, 10, 16)
    l, r = gen_bidir_apply(params, pg, left, right)
    assert l.shape == (pg.m_pad, 16) and r.shape == (pg.n_pad, 16)
    assert np.isfinite(np.asarray(l)).all()
    # gradients flow through the transpose-ordered gather
    def loss(ps):
        a, b = gen_bidir_apply(ps, pg, left, right)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)
    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_build_model_rejects_unknown_options():
    with pytest.raises(TypeError):
        build_model("GCN(8,8,hids=16,depth=9)")   # GCN has fixed depth
    with pytest.raises(TypeError):
        build_model("GCNRand(hids=4)")
    # dtype is honored everywhere (--fp16 appends it to any arch string)
    for arch in ["GCN(8,8,hids=16,dtype='bfloat16')",
                 "GCNRand(dtype='bfloat16')",
                 "GCNDeeper(8,8,hids=16,depth=4,dtype='bfloat16')",
                 "GENDeeper(8,8,hids=16,depth=3,dtype='bfloat16')"]:
        m = build_model(arch)
        assert m.init is not None


def test_inference_manager_auto_per_family():
    """'auto' picks the per-family decode default measured in the round-3
    study: sparsity-mult for repair-prone short-solve families (svm,
    stoch), plain top-m otherwise."""
    im = parse_inference_manager("auto", dataset="svm")
    assert im.which_func == "inference_gnn_sparsity" and im.mode == "mult"
    im = parse_inference_manager("auto", dataset="stoch-sc")
    assert im.which_func == "inference_gnn_sparsity"
    im = parse_inference_manager("auto", dataset="mirp_bench")
    assert im.which_func == "inference_gnn"
    im = parse_inference_manager("auto", dataset="packing")
    assert im.which_func == "inference_gnn"


def test_critical_loss_boundary_weighting(rng):
    """The criticality loss (VERDICT r05 item 7) is a valid weighted CE:
    finite, differentiable, padding-invariant, and it upweights errors at
    the decode boundary — a wrong node NEAR the top-m threshold must cost
    more than the same wrong node far from it."""
    import jax
    from lp_gnn_tpu.train.losses import critical
    m, n = 12, 20
    lc = jnp.asarray(rng.randn(m, 3), jnp.float32)
    lv = jnp.asarray(rng.randn(n, 3), jnp.float32)
    ys = jnp.asarray(rng.randint(0, 3, m))
    yt = jnp.asarray(rng.randint(0, 3, n))
    ms_, mt = jnp.ones(m, bool), jnp.ones(n, bool)
    val = critical(lc, lv, ys, yt, ms_, mt)
    assert np.isfinite(float(val))
    g = jax.grad(lambda a: critical(a, lv, ys, yt, ms_, mt))(lc)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
    # padding invariance: appending masked-out nodes must not change it
    lc_p = jnp.concatenate([lc, jnp.full((5, 3), 7.0)])
    lv_p = jnp.concatenate([lv, jnp.full((8, 3), -3.0)])
    ys_p = jnp.concatenate([ys, jnp.zeros(5, ys.dtype)])
    yt_p = jnp.concatenate([yt, jnp.zeros(8, yt.dtype)])
    ms_p = jnp.concatenate([ms_, jnp.zeros(5, bool)])
    mt_p = jnp.concatenate([mt, jnp.zeros(8, bool)])
    val_p = critical(lc_p, lv_p, ys_p, yt_p, ms_p, mt_p)
    assert np.isclose(float(val), float(val_p), rtol=1e-5)
    # boundary sensitivity: make every prediction confidently correct
    # except ONE variable node; placing that node's P(basic) at the decode
    # threshold must cost more than placing it far below
    ys0 = jnp.zeros(m, ys.dtype)
    yt0 = jnp.zeros(n, yt.dtype)
    strong = jnp.tile(jnp.asarray([[8.0, 0.0, 0.0]], jnp.float32), (n, 1))
    lc0 = jnp.tile(jnp.asarray([[8.0, 0.0, 0.0]], jnp.float32), (m, 1))
    # m rows -> threshold sits among the m highest P(basic); the wrong node
    # predicted "basic" with logit near the implied boundary
    near = strong.at[0].set(jnp.asarray([0.0, 8.0, 0.0]))   # p~1: top of rank
    far = strong.at[0].set(jnp.asarray([2.0, -8.0, 0.0]))   # p~0: far below
    loss_near = float(critical(lc0, near, ys0, yt0, ms_, mt))
    loss_far = float(critical(lc0, far, ys0, yt0, ms_, mt))
    assert np.isfinite(loss_near) and np.isfinite(loss_far)
