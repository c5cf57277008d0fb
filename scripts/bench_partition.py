"""Measure host-side graph-partition cost at scale (VERDICT r03 item 5).

The edge-partitioned path's host prep — ``compute_halo_width`` +
``partition_graph(halo=True)`` — is pure numpy and a per-graph constant,
but at the framework's claimed scale (10^7-10^8 edges) it is real wall
time that had never been measured. This script times it on a banded
mirp-like bipartite graph (the structure the halo path is designed for,
same construction idea as bench_scaling.py's wire-volume check) at
configurable edge counts and shard counts, and prints one JSON line per
(edges, shards) cell.

    PYTHONPATH=/root/repo python scripts/bench_partition.py \
        --edges 10_000_000 100_000_000 --shards 2 8

``--naive`` additionally times the pre-r04 per-pair algorithms (the
O(D^2) python loops over np.unique/searchsorted) for the two halo
hot spots, for the before/after table in RESULTS.md.
"""
import argparse
import json
import sys
import time
import os.path as osp

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from lp_gnn_tpu.data.batching import pad_graph  # noqa: E402
from lp_gnn_tpu.data.dataset import BipartiteGraph  # noqa: E402
from lp_gnn_tpu.parallel.edge_partition import (  # noqa: E402
    partition_graph, compute_halo_width, _shard_sizes, _round_up)


def banded_graph(E, M=None, N=None, band=4096, seed=0):
    """Banded mirp-like bipartite graph: constraint i's nonzeros cluster
    around variable i*(N/M) within ±band/2 (multi-period LPs couple only
    nearby periods — the locality the halo exchange exploits)."""
    M = M or max(E // 16, 1024)
    N = N or 2 * M
    rng = np.random.RandomState(seed)
    row = rng.randint(0, M, E).astype(np.int32)
    center = (row.astype(np.int64) * N) // M
    off = rng.randint(-band // 2, band // 2 + 1, E)
    col = np.clip(center + off, 0, N - 1).astype(np.int32)
    val = (rng.rand(E).astype(np.float32) - 0.5)
    val[val == 0] = 0.5
    c_feas = (rng.rand(M, 8).astype(np.float32) - 0.5)
    v_feas = (rng.rand(N, 8).astype(np.float32) - 0.5)
    g = BipartiteGraph(row=row, col=col, val=val, c_feas=c_feas,
                       v_feas=v_feas,
                       y_s=rng.randint(0, 3, M).astype(np.int32),
                       y_t=rng.randint(0, 3, N).astype(np.int32))
    return g


def naive_halo_width(pg, n_shards):
    """Pre-r04 compute_halo_width: O(D) full-edge masks + O(D^2) np.unique
    over per-pair subsets (kept verbatim for the before/after table)."""
    ms, ns = _shard_sizes(pg, n_shards)
    row = np.asarray(pg.row_r)
    col = np.asarray(pg.col_r)
    val = np.asarray(pg.val_r)
    w = 1
    for d in range(n_shards):
        sel = (row >= d * ms) & (row < (d + 1) * ms) & (val != 0)
        c = col[sel]
        for e in range(n_shards):
            if e == d:
                continue
            ce = c[(c >= e * ns) & (c < (e + 1) * ns)]
            w = max(w, len(np.unique(ce)))
    return _round_up(w, 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, nargs="+",
                    default=[1_000_000, 10_000_000])
    ap.add_argument("--shards", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--band", type=int, default=4096)
    ap.add_argument("--naive", action="store_true",
                    help="also time the pre-r04 per-pair halo-width loop")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cache_dir", type=str, default="",
                    help="also time the disk cache store + load roundtrip")
    args = ap.parse_args()

    for E in args.edges:
        t0 = time.time()
        g = banded_graph(E, band=args.band)
        pg = pad_graph(g)
        pad_t = time.time() - t0
        for D in args.shards:
            cell = {"edges": E, "shards": D,
                    "pad_graph_s": round(pad_t, 2)}
            best_w = np.inf
            for _ in range(args.reps):
                t0 = time.time()
                bh = compute_halo_width(pg, D)
                best_w = min(best_w, time.time() - t0)
            cell["halo_width_s"] = round(best_w, 3)
            cell["bh"] = int(bh)
            best_p = np.inf
            for _ in range(args.reps):
                t0 = time.time()
                dg = partition_graph(pg, D, halo=True, halo_width=bh)
                best_p = min(best_p, time.time() - t0)
            cell["partition_s"] = round(best_p, 3)
            del dg
            if args.cache_dir:
                import os
                import shutil
                from lp_gnn_tpu.parallel.edge_partition import (
                    _store_partition, _load_partition)
                # time the store and load ALONE — the r04 table's
                # "cache store" cell went through cached_partition_graph on
                # an empty cache and therefore INCLUDED the partition
                # recompute (~6 min at 100M edges), overstating the store
                # cost ~8x (VERDICT r05 item 6)
                shutil.rmtree(args.cache_dir, ignore_errors=True)
                os.makedirs(args.cache_dir)
                dg = partition_graph(pg, D, halo=True, halo_width=bh)
                path = osp.join(args.cache_dir, "bench.pk")
                t0 = time.time()
                _store_partition(path, dg)
                cell["cache_store_s"] = round(time.time() - t0, 3)
                cell["cache_bytes"] = os.path.getsize(path)
                del dg
                t0 = time.time()
                dg = _load_partition(path)
                cell["cache_load_s"] = round(time.time() - t0, 3)
                del dg
                shutil.rmtree(args.cache_dir, ignore_errors=True)
            if args.naive:
                t0 = time.time()
                bh2 = naive_halo_width(pg, D)
                cell["halo_width_naive_s"] = round(time.time() - t0, 3)
                assert bh2 == bh, (bh2, bh)
            print(json.dumps(cell), flush=True)
        del g, pg


if __name__ == "__main__":
    main()
