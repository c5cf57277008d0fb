"""Basis decoding: logits -> valid simplex basis statuses.

Reference val.py:106-197. The decode picks the top-m nodes by P(basic) as the
basis (m = #constraints) and assigns everyone else argmax over {LL, UL}. The
two validity rules (val.py:119-122) hold by construction and are asserted:

- exactly m basic nodes in total;
- #basic structural variables == #nonbasic rows.

Two implementations:
- numpy host decode (`inference_gnn`) — exact reference semantics, used by
  the prediction driver;
- jittable device decode (`decode_topm_device`) — rank-based selection so
  ``m`` can be a traced scalar under a static padded shape; used for on-device
  eval metrics and benchmarks.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _softmax_np(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def inference_gnn(logits: np.ndarray, m: int, **_) -> np.ndarray:
    """Top-m decode (reference val.py:106-124). ``logits``: (m+n, 3) with
    constraints first. Returns int labels (m+n,)."""
    logits = np.asarray(logits, dtype=np.float64)
    n = logits.shape[0] - m
    pr = _softmax_np(logits)
    pr[np.isnan(pr)] = 0.0  # half-precision guard (val.py:111)

    # stable top-m by P(basic), ties broken by position like torch.topk
    order = np.argsort(-pr[:, 1], kind="stable")
    topk_idx = order[:m]
    pr[:, 1] = pr.min() - 1
    pr[topk_idx, 1] = pr.max() + 1
    pred = pr.argmax(-1)

    assert (pred == 1).sum() == m
    assert (pred[m:m + n] == 1).sum() == ((pred[:m] == 0) | (pred[:m] == 2)).sum()
    return pred


def inference_all_slacks(logits: np.ndarray, m: int, **_) -> np.ndarray:
    """All-slack basis control baseline (reference val.py:127-135)."""
    logits = np.asarray(logits, dtype=np.float64)
    pr = _softmax_np(logits)
    pred = np.ones(logits.shape[0], dtype=np.int64)
    pr[:, 1] = pr.min() - 1
    pred[m:] = pr[m:, :].argmax(-1)
    return pred


def inference_gnn_sparsity(logits: np.ndarray, m: int, nnzs=None,
                           mode: str = "add", gnn_wei: float = 0.5) -> np.ndarray:
    """Blend GNN P(basic) with an inverse-nnz sparsity prior
    (reference val.py:137-165)."""
    assert mode in ("add", "mult")
    logits = np.asarray(logits, dtype=np.float64)
    pr = _softmax_np(logits)
    nnzs = np.asarray(nnzs, dtype=np.float64).copy()
    nnzs[nnzs == 0] = nnzs.max() + 1   # vars absent from A should be nonbasic
    nnzs = 1.0 / nnzs
    nnzs /= nnzs.sum()
    nnzs *= m
    pr_gnn = pr[:, 1]
    if mode == "add":
        assert gnn_wei is not None
        pr_basis = gnn_wei * pr_gnn + (1 - gnn_wei) * nnzs
    else:
        pr_basis = pr_gnn * nnzs
    pr[:, 1] = pr_basis
    order = np.argsort(-pr[:, 1], kind="stable")
    topk_idx = order[:m]
    pr[:, 1] = pr.min() - 1
    pr[topk_idx, 1] = pr.max() + 1
    return pr.argmax(-1)


def decode_topm_device(logit_cons, logit_vars, cons_mask, vars_mask, m):
    """Jittable top-m decode over padded logits.

    Selection is by descending P(basic) rank (stable argsort == torch.topk
    tie-order), padded rows excluded. ``m`` may be traced. Returns
    (pred_cons (M_pad,), pred_vars (N_pad,)) with pads set to -1.
    """
    pr_c = jax.nn.softmax(logit_cons.astype(jnp.float32), axis=-1)
    pr_v = jax.nn.softmax(logit_vars.astype(jnp.float32), axis=-1)
    pr_c = jnp.nan_to_num(pr_c, nan=0.0)
    pr_v = jnp.nan_to_num(pr_v, nan=0.0)
    mp = logit_cons.shape[0]
    key = jnp.concatenate([
        jnp.where(cons_mask, pr_c[:, 1], -jnp.inf),
        jnp.where(vars_mask, pr_v[:, 1], -jnp.inf),
    ])
    order = jnp.argsort(-key, stable=True)
    # inverse permutation via a second argsort — scatter-free (an
    # .at[order].set(iota) scatter serializes on TPU: ~10 s at 4e5 nodes)
    rank = jnp.argsort(order)
    is_basic = rank < m
    p0 = jnp.concatenate([pr_c[:, 0], pr_v[:, 0]])
    p2 = jnp.concatenate([pr_c[:, 2], pr_v[:, 2]])
    pred = jnp.where(is_basic, 1, jnp.where(p0 >= p2, 0, 2))
    mask = jnp.concatenate([cons_mask, vars_mask])
    pred = jnp.where(mask, pred, -1)
    return pred[:mp], pred[mp:]


class InferenceManager:
    """Maps decode-strategy choice to functions and output folder names
    (reference val.py:167-197)."""

    FUNCS = ["inference_gnn", "inference_all_slacks", "inference_gnn_sparsity"]

    def __init__(self, which_func: int, mode=None, gnn_wei=None, run: int = 0):
        self.which_func = self.FUNCS[which_func]
        if mode is not None and isinstance(mode, int):
            mode = ["add", "mult"][mode]
        self.mode = mode
        self.gnn_wei = gnn_wei
        self.run = run

    def decode_fn(self):
        return {"inference_gnn": inference_gnn,
                "inference_all_slacks": inference_all_slacks,
                "inference_gnn_sparsity": inference_gnn_sparsity}[self.which_func]

    def decode_kwargs(self) -> dict:
        """Configured decode options to forward to :meth:`decode_fn` —
        without these the sparsity decode would silently run with its
        defaults while the output folder name claims the configured mode
        and weight."""
        kw = {}
        if self.mode is not None:
            kw["mode"] = self.mode
        if self.gnn_wei is not None:
            kw["gnn_wei"] = self.gnn_wei
        return kw

    def get_log_folder(self) -> str:
        if self.which_func == "inference_gnn":
            return f"gnn-bas-{self.run}"
        return self.get_basis_folder()

    def get_basis_folder(self) -> str:
        if self.which_func == "inference_gnn":
            return "pred-basis" if self.run == 0 else f"pred-basis-{self.run}"
        if self.which_func == "inference_all_slacks":
            return f"all-slacks-bas-{self.run}"
        return f"gnn-sparsity-{self.mode}-{self.gnn_wei}-{self.run}"


#: families whose demo/bench instances are short repair-prone solves where
#: the top-m basis costs more than it saves; the sparsity-mult decode
#: degrades gracefully toward the all-slack (cold-equivalent) basis there
#: (RESULTS.md round-3 decode study: svm -142% -> 0.0%).
MULT_DECODE_FAMILIES = ("svm", "stoch")


def parse_inference_manager(spec: str,
                            dataset: str | None = None) -> InferenceManager:
    """Safe parser for CLI strings like ``InferenceManager(0, run=0)``
    (replaces reference ``eval(args.inference_manager)``, pred_basis.py:124).

    ``"auto"`` selects the per-family default measured in the round-3
    decode study: sparsity-mult for ``MULT_DECODE_FAMILIES``, top-m
    otherwise (requires ``dataset``)."""
    if spec.strip() == "auto":
        assert dataset, "'auto' inference manager needs the dataset name"
        fam = dataset.split("-")[0].split("_")[0]
        if fam in MULT_DECODE_FAMILIES:
            return InferenceManager(2, mode="mult")
        return InferenceManager(0)
    import ast
    tree = ast.parse(spec.strip(), mode="eval").body
    assert isinstance(tree, ast.Call) and tree.func.id == "InferenceManager", spec
    args = [ast.literal_eval(a) for a in tree.args]
    kwargs = {kw.arg: ast.literal_eval(kw.value) for kw in tree.keywords}
    return InferenceManager(*args, **kwargs)
