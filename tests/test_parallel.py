"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4):
edge-partitioned execution and DP must match single-chip bit-for-bit
(same math, same collectives decomposition)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lp_gnn_tpu.data.batching import pad_graph
from lp_gnn_tpu.models.gcn import build_model
from lp_gnn_tpu.parallel.mesh import make_mesh, parse_mesh_shape
from lp_gnn_tpu.parallel.edge_partition import (
    partition_graph, dist_apply, make_dist_train_step,
)
from lp_gnn_tpu.parallel.dp import stack_graphs, make_dp_train_step
from lp_gnn_tpu.train.trainer import make_optimizer, make_train_step
from lp_gnn_tpu.train.losses import balanced
from lp_gnn_tpu.train.trainer import seed_masks
from tests.test_models import make_pg


def test_parse_mesh_shape():
    assert parse_mesh_shape("dp=2,edge=4") == {"dp": 2, "edge": 4}
    assert parse_mesh_shape("") == {}


@pytest.mark.parametrize("n_shards", [
    2,
    pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow),
])
def test_dist_forward_matches_single_chip(rng, n_shards):
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    lc_ref, lv_ref = model.apply(params, pg, train=False)

    mesh = make_mesh({"edge": n_shards})
    dg = partition_graph(pg, n_shards)
    lc, lv = dist_apply(params, dg, mesh)
    m_pad = pg.c_feas.shape[0]
    n_pad = pg.v_feas.shape[0]
    np.testing.assert_allclose(np.asarray(lc)[:m_pad], np.asarray(lc_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(lv)[:n_pad], np.asarray(lv_ref),
                               atol=5e-4)


def test_dist_train_step_matches_single_chip(rng):
    """Loss and updated params after one distributed step must equal the
    single-chip step (dropout disabled via dp_rate=0)."""
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    # SGD-style optimizer (g + wd*p) so the param delta is an affine image of
    # the gradient — Adam's first step is ~sign(g), which amplifies fp32
    # reduction-order noise on near-zero grads into full-lr differences.
    optimizer = make_optimizer("sgd")
    opt_state = optimizer.init(params)

    # single-chip reference step without dropout
    def single_loss(p):
        lc, lv = model.apply(p, pg, train=False)
        ms, mt = seed_masks(pg)
        return balanced(lc, lv, pg.y_s, pg.y_t, ms, mt)

    loss_ref, grads_ref = jax.value_and_grad(single_loss)(params)

    mesh = make_mesh({"edge": 2})
    dg = partition_graph(pg, 2)
    step = make_dist_train_step("balanced", optimizer, mesh, dp_rate=0.0)
    p2, _, loss = step(params, opt_state, dg, jax.random.PRNGKey(1),
                       jnp.float32(1e-3))
    assert np.isclose(float(loss), float(loss_ref), rtol=1e-5)
    import optax
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    upd_ref = jax.tree.map(lambda u: -1e-3 * u, upd_ref)
    p_ref = optax.apply_updates(params, upd_ref)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_halo_forward_matches_all_gather(rng, n_shards):
    # fast-profile cover: test_halo_train_step_matches_single_chip[2]
    # runs the same halo forward inside the loss plus the gather/reduce
    # VJPs (r5 test-budget rebalance, VERDICT item 9)
    """partition_graph(halo=True) must reproduce both the single-chip and
    the all-gather-path logits: the compact halo buffer carries exactly the
    boundary rows each shard's edges reference."""
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    lc_ref, lv_ref = model.apply(params, pg, train=False)

    mesh = make_mesh({"edge": n_shards})
    dg_ag = partition_graph(pg, n_shards)
    dg_h = partition_graph(pg, n_shards, halo=True)
    assert dg_h.halo_send is not None and dg_h.blkh_r_src is not None
    lc_ag, lv_ag = dist_apply(params, dg_ag, mesh)
    lc_h, lv_h = dist_apply(params, dg_h, mesh)
    m_pad, n_pad = pg.c_feas.shape[0], pg.v_feas.shape[0]
    np.testing.assert_allclose(np.asarray(lc_h)[:m_pad],
                               np.asarray(lc_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(lv_h)[:n_pad],
                               np.asarray(lv_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(lc_h), np.asarray(lc_ag),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(lv_h), np.asarray(lv_ag),
                               atol=5e-5)


@pytest.mark.parametrize("n_shards", [
    2,
    pytest.param(8, marks=pytest.mark.slow),
])
def test_halo_train_step_matches_single_chip(rng, n_shards):
    """One halo-exchange training step == the single-chip step: the
    halo_gather / halo_reduce custom VJPs are exact mutual transposes."""
    import optax
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")

    def single_loss(p):
        lc, lv = model.apply(p, pg, train=False)
        ms, mt = seed_masks(pg)
        return balanced(lc, lv, pg.y_s, pg.y_t, ms, mt)

    loss_ref, grads_ref = jax.value_and_grad(single_loss)(params)
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    p_ref = optax.apply_updates(params,
                                jax.tree.map(lambda u: -1e-3 * u, upd_ref))

    mesh = make_mesh({"edge": n_shards})
    dg = partition_graph(pg, n_shards, halo=True)
    step = make_dist_train_step("balanced", optimizer, mesh, dp_rate=0.0)
    p2, _, loss = step(params, optimizer.init(params), dg,
                       jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert np.isclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _banded_pg(rng, m=2048, n=4096, nnz_per_row=8, band=64):
    """mirp-like banded LP: each constraint references vars inside a
    sliding window (time-period structure) — the shape whose boundary sets
    are small relative to the var axis."""
    from lp_gnn_tpu.data.dataset import BipartiteGraph
    rows, cols = [], []
    for i in range(m):
        c0 = int(i * (n - band) / max(m - 1, 1))
        cols.append(c0 + rng.randint(0, band, nnz_per_row))
        rows.append(np.full(nnz_per_row, i))
    row = np.concatenate(rows).astype(np.int32)
    col = np.concatenate(cols).astype(np.int32)
    e = len(row)
    g = BipartiteGraph(row=row, col=col,
                       val=(rng.rand(e).astype(np.float32) - 0.5),
                       c_feas=rng.rand(m, 8).astype(np.float32),
                       v_feas=rng.rand(n, 8).astype(np.float32),
                       y_s=rng.randint(0, 3, m).astype(np.int32),
                       y_t=rng.randint(0, 3, n).astype(np.int32))
    return pad_graph(g)


@pytest.mark.slow
def test_halo_wire_volume_small_on_banded_graph(rng):
    """On banded LP families the halo volume must be a small fraction of
    the full-width collectives: 2*D*Bh*F (halo) vs 2*N_pad*F (all-gather +
    psum_scatter) per shard per layer."""
    from lp_gnn_tpu.parallel.edge_partition import compute_halo_width
    pg = _banded_pg(rng)
    n_shards = 8
    dg = partition_graph(pg, n_shards, halo=True)
    bh = dg.halo_send.shape[-1]
    assert bh == compute_halo_width(pg, n_shards)
    nh = n_shards * bh
    n_pad = dg.n_pad
    assert nh < n_pad / 4, (nh, n_pad)
    # and the halo path still matches the all-gather decomposition
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"edge": n_shards})
    lc_ag, lv_ag = dist_apply(params, partition_graph(pg, n_shards), mesh)
    lc_h, lv_h = dist_apply(params, dg, mesh)
    np.testing.assert_allclose(np.asarray(lc_h), np.asarray(lc_ag), atol=5e-5)
    np.testing.assert_allclose(np.asarray(lv_h), np.asarray(lv_ag), atol=5e-5)


@pytest.mark.parametrize("arch,halo", [
    # fast profile keeps only GENDeeper+halo — the one arch exercising the
    # compact-halo segment softmax, which no other fast test covers; the
    # GraphConv-family dist behavior is covered fast by the flagship
    # GCN_FC parity tests above (r5 profile rebalance, VERDICT r04 item 9)
    pytest.param("GCN(8,8,hids=16)", True, marks=pytest.mark.slow),
    pytest.param("GCNDeeper(8,8,hids=16,depth=5)", True,
                 marks=pytest.mark.slow),
    pytest.param("GENDeeper(8,8,hids=16,depth=4)", False,
                 marks=pytest.mark.slow),
    ("GENDeeper(8,8,hids=16,depth=4)", True),
])
def test_dist_forward_all_archs(rng, arch, halo):
    """Every registered arch runs edge-partitioned and matches its
    single-chip logits (reference arch.py:144-289; round-1 gated the
    distributed path to GCN_FC only). GEN's softmax aggregation runs either
    over the cross-shard pmax/psum decomposition (halo=False) or over the
    compact halo space with owner-combined maxes (halo=True)."""
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model(arch)
    params = model.init(jax.random.PRNGKey(0))
    lc_ref, lv_ref = model.apply(params, pg, train=False)
    mesh = make_mesh({"edge": 2})
    dg = partition_graph(pg, 2, halo=halo)
    lc, lv = dist_apply(params, dg, mesh, arch=model.name)
    m_pad, n_pad = pg.c_feas.shape[0], pg.v_feas.shape[0]
    np.testing.assert_allclose(np.asarray(lc)[:m_pad], np.asarray(lc_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(lv)[:n_pad], np.asarray(lv_ref),
                               atol=5e-4)


@pytest.mark.slow
def test_dist_gen_train_step_matches_single_chip(rng):
    """One distributed GENDeeper step == the single-chip step: the
    cross-shard segment softmax (pmax of per-shard maxes, psum_scatter of
    exp-sums) backpropagates identically to the local softmax."""
    import optax
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GENDeeper(8,8,hids=16,depth=4)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")

    def single_loss(p):
        lc, lv = model.apply(p, pg, train=False)
        ms, mt = seed_masks(pg)
        return balanced(lc, lv, pg.y_s, pg.y_t, ms, mt)

    loss_ref, grads_ref = jax.value_and_grad(single_loss)(params)
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    p_ref = optax.apply_updates(params,
                                jax.tree.map(lambda u: -1e-3 * u, upd_ref))
    mesh = make_mesh({"edge": 4})
    step = make_dist_train_step("balanced", optimizer, mesh, dp_rate=0.0,
                                arch=model.name)
    for halo in (False, True):
        dg = partition_graph(pg, 4, halo=halo)
        p2, _, loss = step(params, optimizer.init(params), dg,
                           jax.random.PRNGKey(1), jnp.float32(1e-3))
        assert np.isclose(float(loss), float(loss_ref), rtol=1e-5), halo
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, err_msg=f"halo={halo}")


@pytest.mark.slow
def test_dist_focal_train_step_matches_single_chip(rng):
    """--loss focal --mesh_shape edge=K must work (round-2 VERDICT: focal
    was missing from DIST_LOSSES and KeyError'ed) and one edge-partitioned
    focal step must equal the single-chip focal step."""
    import optax
    from lp_gnn_tpu.train.losses import focal
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")

    def single_loss(p):
        lc, lv = model.apply(p, pg, train=False)
        ms, mt = seed_masks(pg)
        return focal(lc, lv, pg.y_s, pg.y_t, ms, mt)

    loss_ref, grads_ref = jax.value_and_grad(single_loss)(params)
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    p_ref = optax.apply_updates(params,
                                jax.tree.map(lambda u: -1e-3 * u, upd_ref))
    mesh = make_mesh({"edge": 2})
    dg = partition_graph(pg, 2, halo=True)
    step = make_dist_train_step("focal", optimizer, mesh, dp_rate=0.0)
    p2, _, loss = step(params, optimizer.init(params), dg,
                       jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert np.isclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dist_halo_archs_single_source():
    """DIST_HALO_ARCHS must track DIST_MODELS (minus the comm-free control)
    so a new distributed arch cannot silently lose halo."""
    from lp_gnn_tpu.parallel.edge_partition import (DIST_MODELS,
                                                    DIST_HALO_ARCHS)
    assert DIST_HALO_ARCHS == frozenset(DIST_MODELS) - {"GCNRand"}
    from lp_gnn_tpu.parallel.edge_partition import DIST_LOSSES
    from lp_gnn_tpu.train.losses import LOSS_REGISTRY
    assert set(DIST_LOSSES) == set(LOSS_REGISTRY)


def test_dp_train_step_runs_and_improves(rng):
    graphs = [make_pg(np.random.RandomState(i), m=6, n=10, e=18)
              for i in range(8)]
    batch = stack_graphs(graphs)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("adam")
    opt_state = optimizer.init(params)
    mesh = make_mesh({"dp": 8})
    step = make_dp_train_step(model, "balanced", optimizer, mesh)
    losses = []
    for i in range(15):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i), jnp.float32(1e-3))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dp_step_matches_serial(rng):
    """One DP step (dropout off) == one step on the serial mean-loss."""
    import optax
    graphs = [make_pg(np.random.RandomState(i), m=6, n=10, e=18)
              for i in range(4)]
    batch = stack_graphs(graphs)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("adam")
    mesh = make_mesh({"dp": 4})

    from lp_gnn_tpu.train.losses import balanced as bal

    def serial_mean_loss(p):
        tot = 0.0
        for pg in graphs:
            lc, lv = model.apply(p, pg, train=False)
            ms, mt = seed_masks(pg)
            tot = tot + bal(lc, lv, pg.y_s, pg.y_t, ms, mt)
        return tot / len(graphs)

    loss_ref, g_ref = jax.value_and_grad(serial_mean_loss)(params)
    upd, _ = optimizer.update(g_ref, optimizer.init(params), params)
    p_ref = optax.apply_updates(params, jax.tree.map(lambda u: -1e-3 * u, upd))

    step = make_dp_train_step(model, "balanced", optimizer, mesh, train=False)
    p2, _, loss_d = step(params, optimizer.init(params), batch,
                         jax.random.PRNGKey(0), jnp.float32(1e-3))
    assert np.isclose(float(loss_d), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dist_inference_via_model_inference(rng):
    """model_inference with a mesh runs edge-partitioned full-graph
    inference and matches single-chip logits."""
    from lp_gnn_tpu.infer.predict import model_inference
    from tests.test_sampling import make_graph
    g = make_graph(rng, m=40, n=70, e=300)
    model = build_model("GCN_FC(8,8,hids=8,depth=2)")
    params = model.init(jax.random.PRNGKey(0))
    lc_ref, lv_ref = model_inference(model, params, g)
    mesh = make_mesh({"edge": 4})
    lc, lv = model_inference(model, params, g, edge_num_thresh=0, mesh=mesh)
    np.testing.assert_allclose(lc, lc_ref, atol=5e-4)
    np.testing.assert_allclose(lv, lv_ref, atol=5e-4)


def test_inference_partition_cached_once(rng, monkeypatch):
    """The inference drivers partition each oversize graph ONCE per dataset
    pass (round-2 VERDICT: model_inference re-partitioned on every call,
    charging O(D^2) host work to the reported inf_time)."""
    from lp_gnn_tpu.infer import predict as P
    from lp_gnn_tpu.parallel import edge_partition as EP
    from tests.test_sampling import make_graph
    g = make_graph(rng, m=40, n=70, e=300)
    calls = {"n": 0}
    orig = EP.partition_graph

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(EP, "partition_graph", counted)
    # cache-count behavior is model-independent: the comm-free GCNRand
    # dist apply keeps this a seconds-scale fast test (r5 rebalance)
    model = build_model("GCNRand()")
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"edge": 2})
    cache: dict = {}
    lc1, lv1 = P.model_inference(model, params, g, edge_num_thresh=0,
                                 mesh=mesh, dist_cache=cache)
    lc2, lv2 = P.model_inference(model, params, g, edge_num_thresh=0,
                                 mesh=mesh, dist_cache=cache)
    assert calls["n"] == 1
    np.testing.assert_array_equal(lc1, lc2)
    np.testing.assert_array_equal(lv1, lv2)


def test_partition_disk_cache_roundtrip(rng, tmp_path, monkeypatch):
    """cached_partition_graph persists the partition beside the dataset and
    the second call loads it from disk without recomputing (r04 item 5 —
    the reference analog is the processed/*.pk host-prep cache,
    dataset.py:178-224), bit-identical to the computed one."""
    from lp_gnn_tpu.parallel import edge_partition as EP
    from tests.test_sampling import make_graph
    g = make_graph(rng, m=40, n=70, e=300)
    pg = pad_graph(g)
    calls = {"n": 0}
    orig = EP.partition_graph

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(EP, "partition_graph", counted)
    d1 = EP.cached_partition_graph(pg, 2, halo=True,
                                   cache_dir=str(tmp_path), fn="g0")
    assert calls["n"] == 1
    d2 = EP.cached_partition_graph(pg, 2, halo=True,
                                   cache_dir=str(tmp_path), fn="g0")
    assert calls["n"] == 1   # loaded from disk, not recomputed
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a different shard count misses the cache
    EP.cached_partition_graph(pg, 4, halo=True, cache_dir=str(tmp_path),
                              fn="g0")
    assert calls["n"] == 2
    # a changed graph (same name) misses via the content fingerprint
    g2 = make_graph(np.random.RandomState(7), m=40, n=70, e=300)
    EP.cached_partition_graph(pad_graph(g2), 2, halo=True,
                              cache_dir=str(tmp_path), fn="g0")
    assert calls["n"] == 3


@pytest.mark.slow
def test_dist_input_agg_cache_exact(rng):
    """attach_dist_input_agg must leave the distributed forward and one
    train step bit-identical (the input conv's aggregation is constant)."""
    from lp_gnn_tpu.parallel.edge_partition import attach_dist_input_agg
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"edge": 4})
    dg = partition_graph(pg, 4)
    dgc = attach_dist_input_agg(dg, mesh)
    assert dgc.in_agg_c is not None and dgc.in_agg_v is not None

    lc0, lv0 = dist_apply(params, dg, mesh)
    lc1, lv1 = dist_apply(params, dgc, mesh)
    np.testing.assert_array_equal(np.asarray(lc0), np.asarray(lc1))
    np.testing.assert_array_equal(np.asarray(lv0), np.asarray(lv1))

    optimizer = make_optimizer("sgd")
    step = make_dist_train_step("balanced", optimizer, mesh, dp_rate=0.0)
    p0, _, l0 = step(params, optimizer.init(params), dg,
                     jax.random.PRNGKey(1), jnp.float32(1e-3))
    p1, _, l1 = step(params, optimizer.init(params), dgc,
                     jax.random.PRNGKey(1), jnp.float32(1e-3))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _skewed_pg(rng, skew: bool):
    """Two same-bucket graphs whose blocked-layout chunk counts differ:
    the skewed one concentrates >K edges in the first 128-row block."""
    m, n, e = 200, 220, 600
    if skew:
        row = rng.randint(0, 100, e).astype(np.int32)
    else:
        row = rng.randint(0, m, e).astype(np.int32)
    col = rng.randint(0, n, e).astype(np.int32)
    val = (rng.rand(e).astype(np.float32) - 0.5)
    from lp_gnn_tpu.data.dataset import BipartiteGraph
    g = BipartiteGraph(row=row, col=col, val=val,
                       c_feas=rng.rand(m, 8).astype(np.float32),
                       v_feas=rng.rand(n, 8).astype(np.float32),
                       y_s=rng.randint(0, 3, m).astype(np.int32),
                       y_t=rng.randint(0, 3, n).astype(np.int32))
    return pad_graph(g)


def test_stack_graphs_rejects_mismatched_chunk_counts(rng):
    """Same bucket is not enough to stack: data-dependent blocked-layout
    chunk counts must match, and the assert must say so instead of letting
    np.stack crash."""
    pg1 = _skewed_pg(rng, skew=True)
    pg2 = _skewed_pg(rng, skew=False)
    assert pg1.bucket_key() == pg2.bucket_key()
    if pg1.blkr_src.shape == pg2.blkr_src.shape:
        pytest.skip("rng did not produce differing chunk counts")
    with pytest.raises(AssertionError, match="chunk counts"):
        stack_graphs([pg1, pg2])


def test_partition_batch_equalizes_shapes(rng):
    """partition_batch must stack same-bucket graphs whose per-shard edge
    pads / chunk counts differ, and the dp x edge step must run on the
    padded batch."""
    from lp_gnn_tpu.parallel.combined import (
        partition_batch, make_dp_edge_train_step)
    pg1 = _skewed_pg(rng, skew=True)
    pg2 = _skewed_pg(rng, skew=False)
    batch = partition_batch([pg1, pg2], n_edge=2)
    for f, v in batch.items():
        assert v.shape[0] == 2, f
    mesh = make_mesh({"dp": 2, "edge": 2})
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")
    opt_state = optimizer.init(params)
    step = make_dp_edge_train_step("balanced", optimizer, mesh, dp_rate=0.0)
    p2, _, loss = step(params, opt_state, batch, jax.random.PRNGKey(1),
                       jnp.float32(1e-3))
    assert np.isfinite(float(loss))
    # params actually moved
    d = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(), params, p2)
    assert max(jax.tree.leaves(d)) > 0


@pytest.mark.parametrize("arch,halo", [
    ("GCN_FC(8,8,hids=16,depth=3)", True),
    pytest.param("GCN_FC(8,8,hids=16,depth=3)", False,
                 marks=pytest.mark.slow),
    pytest.param("GENDeeper(8,8,hids=16,depth=4)", True,
                 marks=pytest.mark.slow),
])
def test_dp_edge_step_matches_serial(rng, arch, halo):
    """One combined dp x edge step (parallel/combined.py) on a 2x2 grid ==
    one step on the serial mean loss over the same graphs — for the flagship
    GCN_FC and a GEN arch (round-2 VERDICT: make_dp_edge_train_step
    hard-coded dist_gcn_fc_apply)."""
    import optax
    from lp_gnn_tpu.parallel.combined import (partition_batch,
                                              make_dp_edge_train_step)
    from lp_gnn_tpu.train.losses import balanced as bal
    graphs = [make_pg(np.random.RandomState(i), m=24, n=40, e=150)
              for i in range(2)]
    model = build_model(arch)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")

    def serial_mean_loss(p):
        tot = 0.0
        for pg in graphs:
            lc, lv = model.apply(p, pg, train=False)
            ms, mt = seed_masks(pg)
            tot = tot + bal(lc, lv, pg.y_s, pg.y_t, ms, mt)
        return tot / len(graphs)

    loss_ref, g_ref = jax.value_and_grad(serial_mean_loss)(params)
    upd, _ = optimizer.update(g_ref, optimizer.init(params), params)
    p_ref = optax.apply_updates(params,
                                jax.tree.map(lambda u: -1e-3 * u, upd))

    mesh = make_mesh({"dp": 2, "edge": 2})
    batch = partition_batch(graphs, n_edge=2, halo=halo)
    step = make_dp_edge_train_step("balanced", optimizer, mesh,
                                   dp_rate=0.0, train=False,
                                   arch=model.name)
    p2, _, loss = step(params, optimizer.init(params), batch,
                       jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert np.isclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_dp_edge_input_agg_cache_exact(rng):
    """partition_batch(input_agg_mesh=...) must leave the combined step
    bit-identical: the input conv's aggregation is a per-graph constant
    (round-2 VERDICT: combined.py ignored the input-agg cache)."""
    from jax.sharding import Mesh
    from lp_gnn_tpu.parallel.combined import (partition_batch,
                                              make_dp_edge_train_step)
    graphs = [make_pg(np.random.RandomState(i), m=24, n=40, e=150)
              for i in range(2)]
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")
    mesh = make_mesh({"dp": 2, "edge": 2})
    edge_mesh = Mesh(mesh.devices[0], ("edge",))
    b0 = partition_batch(graphs, n_edge=2, halo=True)
    b1 = partition_batch(graphs, n_edge=2, halo=True,
                         input_agg_mesh=edge_mesh)
    assert "in_agg_c" in b1 and "in_agg_c" not in b0
    step = make_dp_edge_train_step("balanced", optimizer, mesh,
                                   dp_rate=0.0, train=False)
    p0, _, l0 = step(params, optimizer.init(params), b0,
                     jax.random.PRNGKey(1), jnp.float32(1e-3))
    p1, _, l1 = step(params, optimizer.init(params), b1,
                     jax.random.PRNGKey(1), jnp.float32(1e-3))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partition_batch_mixed_real_sizes(rng):
    """Same-bucket graphs with different REAL node counts must share one
    per-shard block size (the batch max) so the stacked fields agree."""
    from lp_gnn_tpu.parallel.combined import (partition_batch,
                                              make_dp_edge_train_step)
    graphs = [make_pg(np.random.RandomState(0), m=24, n=40, e=150),
              make_pg(np.random.RandomState(1), m=30, n=52, e=150)]
    assert graphs[0].bucket_key() == graphs[1].bucket_key()
    batch = partition_batch(graphs, n_edge=2, halo=True)
    mesh = make_mesh({"dp": 2, "edge": 2})
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")
    step = make_dp_edge_train_step("balanced", optimizer, mesh, dp_rate=0.0)
    _, _, loss = step(params, optimizer.init(params), batch,
                      jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_multihost_dryrun_two_processes(tmp_path):
    """Multi-host (DCN) scaffolding (SURVEY §5 comm-backend row): 2
    cooperating processes x 4 virtual CPU devices run one dp x edge train
    step through jax.distributed.initialize; process 0 must report a finite
    loss over the 8-device global mesh."""
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:   # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for i in range(2):
        env = dict(os.environ,
                   LP_GNN_DIST_COORD=f"localhost:{port}",
                   LP_GNN_DIST_NPROCS="2", LP_GNN_DIST_PROC_ID=str(i),
                   LP_GNN_PLATFORM="cpu")
        env.pop("XLA_FLAGS", None)   # child sets its own device count
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "scripts/dryrun_multihost.py"),
             "--local_devices", "4", "--mesh", "dp=2,edge=4"],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    line = [l for l in outs[0].splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["ok"] and rep["distributed"]
    assert rep["num_processes"] == 2 and rep["global_devices"] == 8
    assert np.isfinite(rep["loss"])


@pytest.mark.slow
def test_multihost_run_exp_two_processes(tmp_path):
    """Multi-host training through the PRODUCTION entry point (train.py):
    2 cooperating processes x 4 virtual devices join via the LP_GNN_DIST_*
    env contract (config.apply_platform_env -> maybe_init_distributed) and
    train 2 epochs over a dp=2,edge=4 global mesh to a finite loss and one
    checkpoint (round-2 VERDICT: no production entry point could join a
    multi-host job)."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from lp_gnn_tpu.solver.highs_bridge import HAVE_HIGHS
    if not HAVE_HIGHS:
        pytest.skip("no vendored highspy")
    from lp_gnn_tpu.config import Config
    from lp_gnn_tpu import pipeline
    cfg = Config(exp_nm="t-mh", dataset="mirp_like",
                 data_prefix=str(tmp_path / "lp-dataset"),
                 log_prefix=str(tmp_path / "runs")).finalize(
                     make_log_dir=False)
    pipeline.stage_prep_data(cfg, family="mirp_like", n_instances=6,
                             n_ports=4, n_periods=6)

    with socket.socket() as s:   # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [sys.executable, os.path.join(repo, "train.py"),
            "--dataset", "mirp_like",
            "--data_prefix", str(tmp_path / "lp-dataset"),
            "--log_prefix", str(tmp_path / "runs"), "--exp_nm", "t-mh",
            "--arch", "GCN_FC(8,8,hids=16,depth=3)", "--epochs", "2",
            "--loss", "balanced", "--mesh_shape", "dp=2,edge=4",
            "--edge_num_thresh", "1"]
    procs = []
    for i in range(2):
        env = dict(os.environ,
                   LP_GNN_DIST_COORD=f"localhost:{port}",
                   LP_GNN_DIST_NPROCS="2", LP_GNN_DIST_PROC_ID=str(i),
                   LP_GNN_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4")
        procs.append(subprocess.Popen(args, env=env, cwd=repo,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    run_dir = tmp_path / "runs" / "t-mh"
    assert (run_dir / "mdl.ckpt").exists()
    losses = [json.loads(l)["value"]
              for l in open(run_dir / "metrics.jsonl")
              if json.loads(l)["tag"] == "train/loss"]
    assert losses and np.isfinite(losses[-1])


@pytest.mark.slow
def test_pallas_halo_a2a_matches_xla(rng):
    """LP_GNN_HALO=pallas routes the halo exchange through the inter-chip
    RDMA kernel (parallel/pallas_halo.py, interpret-emulated on the CPU
    mesh); forward logits and one train step must bit-match the XLA
    all_to_all transport."""
    import os
    from lp_gnn_tpu.data.batching import pad_graph
    from lp_gnn_tpu.models.gcn import build_model
    from lp_gnn_tpu.parallel.mesh import make_mesh
    from lp_gnn_tpu.parallel.edge_partition import (partition_graph,
                                                    dist_apply)
    pg = make_pg(rng, m=96, n=160, e=640)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"edge": 4}, devices=jax.devices()[:4])
    dg = partition_graph(pg, 4, halo=True)
    lc0, lv0 = dist_apply(params, dg, mesh)
    os.environ["LP_GNN_HALO"] = "pallas"
    try:
        lc1, lv1 = dist_apply(params, dg, mesh)
    finally:
        del os.environ["LP_GNN_HALO"]
    np.testing.assert_array_equal(np.asarray(lc0), np.asarray(lc1))
    np.testing.assert_array_equal(np.asarray(lv0), np.asarray(lv1))


@pytest.mark.slow
def test_dist_critical_train_step_matches_single_chip(rng):
    """--loss critical --mesh_shape edge=K: one edge-partitioned critical
    step must equal the single-chip critical step (the decode threshold is
    a global order statistic — the dist loss all-gathers the P(basic)
    channel to compute it identically on every shard).

    slow: the critical loss keeps its fast test single-chip
    (test_models.py::test_critical_loss_boundary_weighting) and the
    generic dist train parity stays fast
    (test_dist_train_step_matches_single_chip); this twin re-verifies
    their composition, an ~80 s shard_map compile (r5 profile rebalance).
    """
    import optax
    from lp_gnn_tpu.train.losses import critical
    pg = make_pg(rng, m=24, n=40, e=150)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer("sgd")

    def single_loss(p):
        lc, lv = model.apply(p, pg, train=False)
        ms, mt = seed_masks(pg)
        return critical(lc, lv, pg.y_s, pg.y_t, ms, mt)

    loss_ref, grads_ref = jax.value_and_grad(single_loss)(params)
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    p_ref = optax.apply_updates(params,
                                jax.tree.map(lambda u: -1e-3 * u, upd_ref))
    mesh = make_mesh({"edge": 2})
    dg = partition_graph(pg, 2, halo=True)
    step = make_dist_train_step("critical", optimizer, mesh, dp_rate=0.0)
    p2, _, loss = step(params, optimizer.init(params), dg,
                       jax.random.PRNGKey(1), jnp.float32(1e-3))
    assert np.isclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
