"""Subgraph sampler tests (NeighborLoader replacement, data/sampling.py).

The exactness oracle the reference left as a commented check (val.py:37-41):
exact-fanout sampled inference must reproduce full-graph logits for seeds.
"""
import numpy as np
import jax
import pytest

from lp_gnn_tpu.config import Config
from lp_gnn_tpu.data.sampling import sample_subgraphs, _BipartiteCSR
from lp_gnn_tpu.infer.predict import model_inference
from lp_gnn_tpu.models.gcn import build_model
from tests.test_models import make_pg
from lp_gnn_tpu.data.dataset import BipartiteGraph


def make_graph(rng, m=30, n=50, e=200):
    row = rng.randint(0, m, e).astype(np.int32)
    col = rng.randint(0, n, e).astype(np.int32)
    val = (rng.rand(e).astype(np.float32) - 0.5)
    c_feas = (rng.rand(m, 8).astype(np.float32) - 0.5)
    v_feas = (rng.rand(n, 8).astype(np.float32) - 0.5)
    for fe in (c_feas, v_feas):
        fe[:, -3] = rng.randint(-1, 2, fe.shape[0])
        fe[:, -1] = rng.randint(-1, 2, fe.shape[0])
    return BipartiteGraph(row=row, col=col, val=val, c_feas=c_feas,
                          v_feas=v_feas,
                          y_s=rng.randint(0, 3, m).astype(np.int32),
                          y_t=rng.randint(0, 3, n).astype(np.int32))


def test_sampled_batches_cover_all_seeds(rng):
    g = make_graph(rng)
    batches = sample_subgraphs(g, rng, fanout=[2, 2], batch_size=16,
                               shuffle=True, drop_last=False)
    seeds = sum(int(pg.s_bs) + int(pg.t_bs) for pg in batches)
    assert seeds == g.ncons + g.nvars


def test_fanout_limits_degree(rng):
    g = make_graph(rng, m=10, n=10, e=300)  # dense
    batches = sample_subgraphs(g, rng, fanout=[2], batch_size=5,
                               shuffle=False, drop_last=False)
    for pg in batches:
        e_real = int(pg.nnz)
        # each of <=5 seed nodes samples <=2 neighbors
        assert e_real <= 5 * 2


def test_exact_sampled_inference_matches_full(rng):
    """model_inference with edge_num_thresh=0 (forced sampling, fanout -1)
    must equal the full-graph forward (reference val.py:37-41 oracle)."""
    g = make_graph(rng)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    params = model.init(jax.random.PRNGKey(0))
    lc_full, lv_full = model_inference(model, params, g,
                                       edge_num_thresh=np.inf)
    lc_s, lv_s = model_inference(model, params, g, edge_num_thresh=0,
                                 batch_size=17, depth=3,
                                 rng=np.random.RandomState(1))
    np.testing.assert_allclose(lc_s, lc_full, atol=5e-4)
    np.testing.assert_allclose(lv_s, lv_full, atol=5e-4)


def test_csr_adjacency(rng):
    g = make_graph(rng, m=5, n=7, e=20)
    adj = _BipartiteCSR(g)
    # each cons's neighbor list matches the edge set
    for i in range(g.ncons):
        nbrs = sorted(adj.c2v_idx[adj.c2v_ptr[i]: adj.c2v_ptr[i + 1]])
        want = sorted(g.col[g.row == i])
        assert nbrs == list(want)
