"""Model building blocks: two-direction graph conv, linear, knowledge mask.

TPU-first re-design of reference arch.py:51-141. Params are plain pytrees
(nested dicts of jnp arrays); apply functions are pure. Compute runs in the
dtype of the inputs (bf16-friendly); the knowledge mask is always applied in
fp32 (the reference's fp16 NaN workaround, val.py:111, indicates the masking
arithmetic is precision-sensitive).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.spmm import spmm_cons_to_vars, spmm_vars_to_cons


# --------------------------------------------------------------------- linear
def linear_init(key, d_in: int, d_out: int, bias: bool = True):
    """torch.nn.Linear-style init: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both
    weight and bias — matches the init driving the reference's training
    dynamics (PyG GraphConv's inner Linears, arch.py:57-60)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(d_in)
    p = {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def linear_apply(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ------------------------------------------------------- two-direction conv
def bidir_conv_init(key, left_dim: int, right_dim: int, out_dim: int):
    """GraphConvTwoDirection params (reference arch.py:51-63).

    Each direction is PyG GraphConv(aggr=add):
        out_dst = W_rel (sum_src A * x_src) + b + W_root x_dst
    ``l2r`` updates variables from constraints; ``r2l`` the reverse.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "l2r": {"rel": linear_init(k1, left_dim, out_dim, bias=True),
                "root": linear_init(k2, right_dim, out_dim, bias=False)},
        "r2l": {"rel": linear_init(k3, right_dim, out_dim, bias=True),
                "root": linear_init(k4, left_dim, out_dim, bias=False)},
    }


def bidir_conv_apply(p, pg, left, right):
    """One bidirectional message-passing step (reference arch.py:65-81).

    left: (M_pad, d_l) constraint features; right: (N_pad, d_r) variable
    features. Both directions share one edge set; aggregation is the sorted
    segment-sum SpMM (ops/spmm.py) instead of torch_sparse CSR spmm.
    """
    # vars <- cons: aggregate A^T x_cons then project (cheap-side-first:
    # for d_in << d_out, SpMM on the raw features then one MXU matmul)
    agg_v = spmm_cons_to_vars(pg, left)
    right_updated = linear_apply(p["l2r"]["rel"], agg_v) + \
        linear_apply(p["l2r"]["root"], right)
    # cons <- vars
    agg_c = spmm_vars_to_cons(pg, right)
    left_updated = linear_apply(p["r2l"]["rel"], agg_c) + \
        linear_apply(p["r2l"]["root"], left)
    return left_updated, right_updated


def bidir_conv_apply_input(p, pg, left, right):
    """``bidir_conv_apply`` for the *input* conv: if the graph carries
    precomputed input aggregations (ops/spmm.py attach_input_agg) in the
    matching dtype, use them instead of re-running the two SpMMs — the raw
    features are per-graph constants, so this is exact (gathers are
    row-rate-bound on TPU, so the input conv's D=8 traversals cost as much
    as the D=hids ones; caching removes them entirely)."""
    agg_c = getattr(pg, "in_agg_c", None)
    agg_v = getattr(pg, "in_agg_v", None)
    if agg_c is None or agg_v is None or agg_c.dtype != right.dtype or \
            agg_v.dtype != left.dtype:
        return bidir_conv_apply(p, pg, left, right)
    right_updated = linear_apply(p["l2r"]["rel"], agg_v) + \
        linear_apply(p["l2r"]["root"], right)
    left_updated = linear_apply(p["r2l"]["rel"], agg_c) + \
        linear_apply(p["r2l"]["root"], left)
    return left_updated, right_updated


# ------------------------------------------------------------ knowledge mask
def add_knowledge(left_logit, right_logit, left_feas, right_feas,
                  bound: float = 10.0):
    """Suppress infeasible statuses given +-inf bounds (arch.py:129-141).

    L2-normalize each logit row (eps 1e-12) and scale by 10, then subtract
    ``bound`` from the LL logit where the lower bound is infinite (tag != 0 at
    feature column -3) and from the UL logit where the upper bound is infinite
    (column -1). Always fp32.
    """
    def _norm10(x):
        x = x.astype(jnp.float32)
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        return x / jnp.maximum(n, 1e-12) * 10.0

    left_logit = _norm10(left_logit)
    right_logit = _norm10(right_logit)

    def _mask(logit, feas):
        l_mask = jnp.abs(feas[:, -3]) > 0   # tag for l=-inf is -1 -> abs
        u_mask = jnp.abs(feas[:, -1]) > 0
        delta = jnp.stack([
            jnp.where(l_mask, -bound, 0.0),
            jnp.zeros_like(l_mask, jnp.float32),
            jnp.where(u_mask, -bound, 0.0),
        ], axis=-1)
        return logit + delta

    return _mask(left_logit, left_feas), _mask(right_logit, right_feas)


# ------------------------------------------------------------------ utilities
def dropout(x, rate: float, key, train: bool):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def layer_norm_init(dim: int):
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(p, x, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)
