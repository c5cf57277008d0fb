"""LP graph dataset: raw -> processed blobs, and in-memory bipartite graphs.

Covers the roles of reference ``LPDataset`` (dataset.py:99-264) and
``MyToBipartite`` (dataset.py:268-332), redesigned TPU-first:

- No unipartite detour: the processed blob *is* the bipartite graph
  (the reference builds an undirected unipartite graph in ``get`` then
  re-splits it in the transform; here graphs stay bipartite end-to-end).
- Blob formats are byte-compatible with the reference
  (``processed/*.pk`` = [row, col, data, c_feas, v_feas, y_s, y_t, nnodes],
  dataset.py:213-224, plus the ``.meta`` sidecar) so data prepared by either
  implementation loads in both.
- Device-facing graphs are padded to static bucket shapes (see batching.py)
  so XLA compiles once per bucket.
"""
from __future__ import annotations

import dataclasses
import glob
import logging
import os
import os.path as osp

import numpy as np
import pandas as pd
from scipy.sparse import coo_matrix, csr_matrix

from ..utils.serialize import msgpack_dump, msgpack_load, json_dump, json_load
from ..utils.misc import split_idxs_train_val, extract_fn
from .scaling import scaling
from .features import cvt_to_features


@dataclasses.dataclass
class BipartiteGraph:
    """One LP as a constraint<->variable bipartite graph (host-side, unpadded).

    Edges are stored in COO sorted by (row, col) — i.e. grouped by constraint.
    ``col_perm`` (computed lazily) re-orders edges grouped by variable for the
    transpose aggregation direction.
    """
    row: np.ndarray        # (nnz,) int32 constraint index
    col: np.ndarray        # (nnz,) int32 variable index
    val: np.ndarray        # (nnz,) float32 scaled A value
    c_feas: np.ndarray     # (m, 8) float32
    v_feas: np.ndarray     # (n, 8) float32
    y_s: np.ndarray        # (m,) int32 constraint labels
    y_t: np.ndarray        # (n,) int32 variable labels
    fn: str = ""           # instance name
    con_nms: list | None = None
    var_nms: list | None = None

    @property
    def ncons(self) -> int:
        return self.c_feas.shape[0]

    @property
    def nvars(self) -> int:
        return self.v_feas.shape[0]

    @property
    def nnz(self) -> int:
        return len(self.val)

    def validate(self) -> None:
        """Range checks the reference applies on load (dataset.py:235-238)."""
        assert self.val.max() <= 1 + 1e-6 and self.val.min() >= -1 - 1e-6
        assert self.c_feas.max() <= 1 + 1e-6 and self.c_feas.min() >= -1 - 1e-6


def process_one_raw(raw_path: str, processed_path: str) -> None:
    """raw/*.pk -> processed/*.pk + .meta (reference dataset.py:178-224)."""
    [c, b_l, (row, col, data), b_u, l, u,
     con_lbls, var_lbls, con_nms, var_nms] = msgpack_load(raw_path, copy=True)
    ncons, nvars = len(con_nms), len(var_nms)
    A = coo_matrix((data, (row, col)), shape=(ncons, nvars)).tocsr()
    c, b_l, A, b_u, l, u = scaling(c, b_l, A, b_u, l, u)
    v_feas, c_feas = cvt_to_features(c, b_l, A, b_u, l, u)
    v_feas = v_feas.astype(np.float32)
    c_feas = c_feas.astype(np.float32)
    y_s = np.asarray(con_lbls, dtype=np.int64)
    y_t = np.asarray(var_lbls, dtype=np.int64)

    # label/bound consistency (dataset.py:201-207): a constraint with finite
    # lower bound tag cannot be labeled LL=0 etc.
    cons_l_mask = np.abs(c_feas[:, -3]) > 0
    cons_u_mask = np.abs(c_feas[:, -1]) > 0
    vars_l_mask = np.abs(v_feas[:, -3]) > 0
    vars_u_mask = np.abs(v_feas[:, -1]) > 0
    assert (y_s[cons_l_mask] != 0).all()
    assert (y_s[cons_u_mask] != 2).all()
    violates = int((y_t[vars_l_mask] == 0).sum())
    if violates:
        logging.warning("label violations on var lower-bound side: %d", violates)
    assert (y_t[vars_u_mask] != 2).all()

    Ac = A.tocoo()
    msgpack_dump(
        [Ac.row, Ac.col, Ac.data.astype(np.float64), c_feas, v_feas,
         y_s, y_t, ncons + nvars],
        processed_path,
    )
    msgpack_dump(
        dict(num_cons=ncons, num_vars=nvars, raw_path=raw_path,
             processed_path=processed_path,
             con_nms=list(map(str, con_nms)), var_nms=list(map(str, var_nms))),
        processed_path + ".meta",
    )


def process_raw_dir(root: str, skip_exist: bool = True) -> list[str]:
    """Process every raw/*.pk under ``root`` into processed/. Returns the
    processed paths (reference LPDataset.process, dataset.py:178-224)."""
    raw_dir = osp.join(root, "raw")
    out_dir = osp.join(root, "processed")
    os.makedirs(out_dir, exist_ok=True)
    fns = sorted(glob.glob(osp.join(raw_dir, "*.pk")), key=lambda p: (len(p), p))
    out = []
    for raw_path in fns:
        dst = osp.join(out_dir, osp.basename(raw_path))
        if not (skip_exist and osp.exists(dst) and osp.exists(dst + ".meta")):
            process_one_raw(raw_path, dst)
        out.append(dst)
    return out


class LPDataset:
    """Random-access collection of processed LP graphs.

    Matches reference ``LPDataset`` (dataset.py:99-264): stable name-sorted
    file order, 70/30 split with seed hard-forced to 0, per-graph size-stats
    cache (``size.json``).
    """

    def __init__(self, root: str, load_meta: bool = False):
        self.root = root
        self.load_meta = load_meta
        self.processed_dir = osp.join(root, "processed")
        fns = [f for f in os.listdir(self.processed_dir)
               if f.endswith(".pk")] if osp.isdir(self.processed_dir) else []
        self.fns = sorted(fns, key=lambda nm: (len(nm), nm))
        if not self.fns:
            raise ValueError(f"no processed .pk under {self.processed_dir}")
        self._indices = list(range(len(self.fns)))

    # -------------------------------------------------------------- container
    def __len__(self) -> int:
        return len(self._indices)

    def indices(self) -> list[int]:
        return list(self._indices)

    def subset(self, idxs) -> "LPDataset":
        import copy
        ds = copy.copy(self)
        ds._indices = [self._indices[i] for i in idxs]
        return ds

    def __getitem__(self, i):
        if isinstance(i, (list, np.ndarray)):
            return self.subset(list(i))
        return self.get(self._indices[i])

    def get(self, file_idx: int) -> BipartiteGraph:
        fn = osp.join(self.processed_dir, self.fns[file_idx])
        [row, col, A_data, c_feas, v_feas, y_s, y_t, nnodes] = \
            msgpack_load(fn, copy=True)
        g = BipartiteGraph(
            row=np.asarray(row, dtype=np.int32),
            col=np.asarray(col, dtype=np.int32),
            val=np.asarray(A_data, dtype=np.float32),
            c_feas=np.asarray(c_feas, dtype=np.float32),
            v_feas=np.asarray(v_feas, dtype=np.float32),
            y_s=np.asarray(y_s, dtype=np.int32),
            y_t=np.asarray(y_t, dtype=np.int32),
            fn=extract_fn(fn),
        )
        g.validate()
        # keep reference's row-major edge order contract
        order = np.lexsort((g.col, g.row))
        g.row, g.col, g.val = g.row[order], g.col[order], g.val[order]
        if self.load_meta:
            meta = msgpack_load(fn + ".meta", copy=False)
            g.con_nms = list(meta["con_nms"])
            g.var_nms = list(meta["var_nms"])
        return g

    # ------------------------------------------------------------- size stats
    def cache_size_info(self, recache: bool = False) -> pd.DataFrame:
        """Per-graph size stats cache (reference dataset.py:119-156)."""
        dump_fn = osp.join(self.root, "size.json")
        try:
            if recache:
                raise ValueError("recache requested")
            res = json_load(dump_fn)
            # a stale cache (instances added/renamed since it was written)
            # would KeyError on .loc or silently return wrong stats
            if len(res) != len(self.fns) or any(
                    r.get("fn") != osp.basename(self.fns[r["idx"]])
                    for r in res):
                raise ValueError("size.json stale (instance set changed)")
        except Exception:
            res = []
            for idx in range(len(self.fns)):
                g = self.get(idx)
                res.append(dict(
                    idx=idx, nedges=g.nnz, nnodes=g.ncons + g.nvars,
                    fn=osp.basename(self.fns[idx]), ncons=g.ncons,
                    nvars=g.nvars,
                    density=g.nnz / max(g.ncons * g.nvars, 1),
                    num_basis_vars=int((g.y_t == 1).sum()),
                ))
            json_dump(res, dump_fn)
        df = pd.DataFrame(res).loc[list(self._indices), :]
        df["fn"] = df.fn.str.replace(".pk", "", regex=False)
        return df

    def dump_size_info(self, dst: str) -> pd.DataFrame | None:
        """Write the size table with the train/val split column
        (reference dataset.py:107-117)."""
        from ..utils.serialize import df_dump
        df = self.cache_size_info()
        if osp.exists(dst):
            return None
        tr, va = split_train_val(self, seed=0)
        df.loc[tr.indices(), "split"] = "train"
        df.loc[va.indices(), "split"] = "val"
        df_dump(df, dst)
        return df


def split_train_val(ds: LPDataset, seed: int = 0):
    """70/30 split, seed forced to 0 (reference utils.py:256-272)."""
    tr, va = split_idxs_train_val(len(ds), seed)
    return ds.subset(tr), ds.subset(va)
