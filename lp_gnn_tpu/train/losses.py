"""Training losses (reference train.py:18-53, utils.py:286-299), masked for
static padded shapes.

All loss functions share the signature::

    loss_fn(logit_cons, logit_vars, y_s, y_t, mask_s, mask_t) -> scalar

where masks select the *seed* nodes contributing to the loss (the padded-shape
equivalent of the reference's ``[:s_bs]/[:t_bs]`` slicing, train.py:122-123;
for full graphs the masks are just the real-node masks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _ce_per_node(logits, labels):
    """Cross-entropy from raw logits, fp32."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return lse - picked


def labels_to_balanced_weights(labels, mask, merge_lu: bool = True):
    """Per-class weights = total/count over *masked* labels
    (reference utils.py:286-299). If only 2 classes are present the weights
    are used as-is (one-sided LPs); otherwise the LL and UL weights are
    averaged (two-sided)."""
    cnt = jnp.stack([jnp.sum((labels == k) & mask) for k in range(3)]).astype(jnp.float32)
    total = cnt.sum()
    wei = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)
    n_present = jnp.sum(cnt > 0)
    merged = wei.at[0].set((wei[0] + wei[2]) / 2.0).at[2].set((wei[0] + wei[2]) / 2.0)
    use_merged = merge_lu & (n_present != 2)
    return jnp.where(use_merged, merged, wei)


def _weighted_ce(logits, labels, mask, weights, node_w=None):
    """torch CrossEntropyLoss(weight=w) semantics: sum(w_y * ce) / sum(w_y).
    ``node_w`` optionally multiplies per-node weights into w_y (the
    normalization includes them, keeping the loss scale stable)."""
    ce = _ce_per_node(logits, labels)
    w = weights[labels] * mask.astype(jnp.float32)
    if node_w is not None:
        w = w * node_w
    return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-12)


def unbalanced(logit_cons, logit_vars, y_s, y_t, mask_s, mask_t):
    """Plain mean CE over both sides (reference train.py:32-37)."""
    ce = jnp.concatenate([_ce_per_node(logit_cons, y_s),
                          _ce_per_node(logit_vars, y_t)])
    m = jnp.concatenate([mask_s, mask_t]).astype(jnp.float32)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1e-12)


def balanced(logit_cons, logit_vars, y_s, y_t, mask_s, mask_t):
    """Per-side class-weighted CE scaled by (m+n)/m and (m+n)/n
    (reference train.py:39-46)."""
    m = jnp.sum(mask_s).astype(jnp.float32)
    n = jnp.sum(mask_t).astype(jnp.float32)
    w_s = labels_to_balanced_weights(y_s, mask_s)
    w_t = labels_to_balanced_weights(y_t, mask_t)
    loss = (m + n) / jnp.maximum(m, 1.0) * _weighted_ce(logit_cons, y_s, mask_s, w_s)
    loss += (m + n) / jnp.maximum(n, 1.0) * _weighted_ce(logit_vars, y_t, mask_t, w_t)
    return loss


def focal(logit_cons, logit_vars, y_s, y_t, mask_s, mask_t, gamma: float = 2.0):
    """Focal loss, reproducing the reference's quirk of applying the
    modulation to the *mean* CE (train.py:18-28: reduction='mean' first,
    then (1-pt)^gamma)."""
    ce = unbalanced(logit_cons, logit_vars, y_s, y_t, mask_s, mask_t)
    pt = jnp.exp(-ce)
    return (1.0 - pt) ** gamma * ce


def _decode_threshold(pm, m_int, iters: int = 24):
    """The m-th largest value of ``pm`` (masked entries -inf) by bisection
    on [0, 1] — P(basic) is a softmax probability. A full ``jnp.sort`` of
    the padded node axis here measured ~3x the whole bench-tier train step
    on TPU (bitonic sort); ``iters`` masked-count passes are pure VPU work
    and converge theta to 2^-24 of the range, far inside the criticality
    kernel's tau=0.05."""
    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        take = jnp.sum(pm >= mid) >= m_int   # threshold at or above mid
        return (jnp.where(take, mid, lo), jnp.where(take, hi, mid))
    lo, _hi = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), jnp.ones((), jnp.float32)))
    return lo


def critical(logit_cons, logit_vars, y_s, y_t, mask_s, mask_t,
             alpha: float = 4.0, tau: float = 0.05):
    """Basis-criticality-weighted balanced CE (VERDICT r05 item 7, the
    one measured model-side attempt at the heterogeneity cliff).

    The r3 depth-5 cell showed per-node accuracy is not the objective:
    WHICH ~7% of nodes are wrong decides the warm start's repair cost. The
    decode (top-m by P(basic), infer/decode.py inference_gnn) flips
    exactly at the m-th-largest P(basic), so nodes whose predicted
    P(basic) sits near that in-batch threshold are the ones whose errors
    change the decoded basis. This loss multiplies the balanced per-class
    weights by ``1 + alpha * exp(-(p - theta)^2 / (2 tau^2))`` with
    ``theta`` the decode threshold, both under stop_gradient — a
    criticality WEIGHTING of the same objective, not a new objective
    (reference train.py:18-53 is where the reference expresses such
    choices). Costs one sort over the padded nodes per step (~half the
    gated per-step decode's two argsorts, RESULTS.md r4 ~2.4%)."""
    lc = logit_cons.astype(jnp.float32)
    lv = logit_vars.astype(jnp.float32)
    p = jax.nn.softmax(jnp.concatenate([lc, lv]), axis=-1)[:, 1]
    mask = jnp.concatenate([mask_s, mask_t])
    # decode budget = number of real constraint rows (basis size)
    m_int = jnp.sum(mask_s).astype(jnp.int32)
    pm = jnp.where(mask, p, -jnp.inf)
    theta = _decode_threshold(pm, m_int)
    w_crit = 1.0 + alpha * jnp.exp(-(p - theta) ** 2 / (2.0 * tau * tau))
    w_crit = jax.lax.stop_gradient(jnp.where(jnp.isfinite(w_crit), w_crit, 1.0))
    m = jnp.sum(mask_s).astype(jnp.float32)
    n = jnp.sum(mask_t).astype(jnp.float32)
    w_s = labels_to_balanced_weights(y_s, mask_s)
    w_t = labels_to_balanced_weights(y_t, mask_t)
    nc = lc.shape[0]
    loss = (m + n) / jnp.maximum(m, 1.0) * _weighted_ce(
        logit_cons, y_s, mask_s, w_s, node_w=w_crit[:nc])
    loss += (m + n) / jnp.maximum(n, 1.0) * _weighted_ce(
        logit_vars, y_t, mask_t, w_t, node_w=w_crit[nc:])
    return loss


LOSS_REGISTRY = {"unbalanced": unbalanced, "balanced": balanced,
                 "focal": focal, "critical": critical}
