"""Host-side neighbor-sampled subgraph batching with static padded shapes.

Replaces PyG NeighborLoader (reference train.py:111-116 fanout [6]*(depth-1)
for training; val.py:22-27 fanout [-1] exact for inference). Sampling happens
on host in numpy at batch-build time; every emitted subgraph is padded to
bucket shapes so the jitted step compiles once per bucket (SURVEY.md §7's
"pre-compiled static-shape subgraph batcher").

Semantics mirrored from NeighborLoader:
- seeds iterate over *all* nodes (both sides) in shuffled batches of up to
  ``batch_size`` seeds;
- L hops of fanout-k sampling on the undirected bipartite graph; sampled
  edges form the subgraph;
- seed nodes come first on each side; the loss/metrics slice is the seed
  prefix (``s_bs``/``t_bs``, reference dataset.py:319-326).
"""
from __future__ import annotations

import numpy as np

from .dataset import BipartiteGraph
from .batching import PaddedGraph, pad_graph


class _BipartiteCSR:
    """Adjacency of one bipartite graph in both directions."""

    def __init__(self, g: BipartiteGraph):
        m, n, e = g.ncons, g.nvars, g.nnz
        order_r = np.argsort(g.row, kind="stable")
        self.c2v_ptr = np.zeros(m + 1, np.int64)
        np.add.at(self.c2v_ptr[1:], g.row, 1)
        self.c2v_ptr = np.cumsum(self.c2v_ptr)
        self.c2v_idx = g.col[order_r]
        self.c2v_val = g.val[order_r]
        self.c2v_eid = order_r
        order_c = np.argsort(g.col, kind="stable")
        self.v2c_ptr = np.zeros(n + 1, np.int64)
        np.add.at(self.v2c_ptr[1:], g.col, 1)
        self.v2c_ptr = np.cumsum(self.v2c_ptr)
        self.v2c_idx = g.row[order_c]
        self.v2c_eid = order_c


def _take_all(ptr, nodes):
    """Vectorized CSR multi-range expansion: all slot indices of ``nodes``."""
    starts = ptr[nodes]
    counts = ptr[nodes + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    csum = np.zeros(len(nodes), np.int64)
    np.cumsum(counts[:-1], out=csum[1:])
    return np.repeat(starts - csum, counts) + np.arange(total)


def _sample_neighbors(ptr, idx, eid, nodes, k, rng):
    """For each node, up to k sampled (neighbor, edge-id) pairs; k<0 = all."""
    nodes = np.asarray(nodes, dtype=np.int64)
    if len(nodes) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if k < 0:
        sel = _take_all(ptr, nodes)
        return idx[sel], eid[sel]
    degs = ptr[nodes + 1] - ptr[nodes]
    small = nodes[degs <= k]
    big = nodes[degs > k]
    sels = [_take_all(ptr, small)]
    for u in big:     # only high-degree nodes need per-node sampling
        s = ptr[u]
        sels.append(s + rng.choice(int(ptr[u + 1] - s), size=k, replace=False))
    sel = np.concatenate(sels)
    return idx[sel], eid[sel]


def sample_one_batch(g: BipartiteGraph, adj: _BipartiteCSR,
                     seed_cons: np.ndarray, seed_vars: np.ndarray,
                     fanout, rng) -> PaddedGraph:
    """One sampled bipartite subgraph from the given seed sets."""
    in_cons = np.zeros(g.ncons, bool)
    in_vars = np.zeros(g.nvars, bool)
    in_cons[seed_cons] = True
    in_vars[seed_vars] = True
    edge_ids = []
    frontier_c, frontier_v = seed_cons, seed_vars
    for k in fanout:
        nv, ev = _sample_neighbors(adj.c2v_ptr, adj.c2v_idx, adj.c2v_eid,
                                   frontier_c, k, rng)
        nc, ec = _sample_neighbors(adj.v2c_ptr, adj.v2c_idx, adj.v2c_eid,
                                   frontier_v, k, rng)
        edge_ids.append(ev)
        edge_ids.append(ec)
        new_v = np.unique(nv[~in_vars[nv]]) if nv.size else np.empty(0, np.int64)
        new_c = np.unique(nc[~in_cons[nc]]) if nc.size else np.empty(0, np.int64)
        in_vars[new_v] = True
        in_cons[new_c] = True
        frontier_c, frontier_v = new_c, new_v
    edge_ids = np.unique(np.concatenate(edge_ids)) if edge_ids else \
        np.empty(0, np.int64)

    # node relabeling: seeds first on each side (NeighborLoader contract)
    other_cons = np.setdiff1d(np.nonzero(in_cons)[0], seed_cons)
    other_vars = np.setdiff1d(np.nonzero(in_vars)[0], seed_vars)
    cons_ids = np.concatenate([seed_cons, other_cons])
    vars_ids = np.concatenate([seed_vars, other_vars])
    cmap = np.full(g.ncons, -1, np.int64)
    vmap = np.full(g.nvars, -1, np.int64)
    cmap[cons_ids] = np.arange(len(cons_ids))
    vmap[vars_ids] = np.arange(len(vars_ids))

    row = cmap[g.row[edge_ids]]
    col = vmap[g.col[edge_ids]]
    val = g.val[edge_ids]
    keep = (row >= 0) & (col >= 0)
    row, col, val = row[keep], col[keep], val[keep]

    sub = BipartiteGraph(
        row=row.astype(np.int32), col=col.astype(np.int32),
        val=val.astype(np.float32),
        c_feas=g.c_feas[cons_ids], v_feas=g.v_feas[vars_ids],
        y_s=g.y_s[cons_ids], y_t=g.y_t[vars_ids], fn=g.fn)
    return pad_graph(sub, s_bs=len(seed_cons), t_bs=len(seed_vars))


def sample_subgraphs(g: BipartiteGraph, rng, fanout, batch_size: int,
                     shuffle: bool = True, drop_last: bool = True,
                     exact: bool = False) -> list[PaddedGraph]:
    """Cover all nodes as seeds in batches (train: shuffled fanout-k,
    reference train.py:111-116; eval: ``exact=True`` = fanout -1,
    val.py:22-27)."""
    adj = _BipartiteCSR(g)
    nodes = np.arange(g.ncons + g.nvars)
    if shuffle:
        nodes = rng.permutation(nodes)
    if exact:
        fanout = [-1] * len(fanout)
    out = []
    bs = min(batch_size, len(nodes))
    for s in range(0, len(nodes), bs):
        chunk = nodes[s: s + bs]
        if len(chunk) < bs and drop_last and s > 0:
            break
        seed_cons = chunk[chunk < g.ncons]
        seed_vars = chunk[chunk >= g.ncons] - g.ncons
        out.append(sample_one_batch(g, adj, seed_cons, seed_vars, fanout, rng))
    return out
