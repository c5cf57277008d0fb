"""GENConv-equivalent two-direction layer (reference arch.py:84-105 with the
monkeypatched forward at arch.py:11-48).

Per direction (GENConv, aggr='softmax', learn_t, num_layers=2, norm='layer',
edge_dim=1):

    e     = W_e * a_ij + b_e                      (edge encoder, 1 -> d)
    msg_j = relu(x_j + e) + 1e-7
    alpha = segment_softmax(t * msg)              (channel-wise, learnable t)
    aggr  = sum_j alpha_j * msg_j
    out   = MLP([d, 2d, d'])(aggr + x_dst)        (Linear-LayerNorm-ReLU-Linear)

Segment softmax is computed with sorted segment max/sum — the TPU-safe
replacement for torch_scatter's softmax aggregation (SURVEY.md §2.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import linear_init, linear_apply, layer_norm_init, layer_norm_apply

EPS = 1e-7


def _segment_softmax_agg(logits, values, seg, num_seg):
    """sum_e softmax_within_segment(logits)[e] * values[e], channel-wise."""
    mx = jax.ops.segment_max(logits, seg, num_segments=num_seg,
                             indices_are_sorted=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)   # empty segments
    ex = jnp.exp(logits - mx[seg])
    den = jax.ops.segment_sum(ex, seg, num_segments=num_seg,
                              indices_are_sorted=True)
    alpha = ex / jnp.maximum(den[seg], 1e-16)
    return jax.ops.segment_sum(alpha * values, seg, num_segments=num_seg,
                               indices_are_sorted=True)


def gen_dir_init(key, d_in: int, d_out: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "edge": linear_init(k1, 1, d_in, bias=True),
        "t": jnp.ones((), jnp.float32),
        "mlp": {
            "l1": linear_init(k2, d_in, 2 * d_in, bias=True),
            "ln": layer_norm_init(2 * d_in),
            "l2": linear_init(k3, 2 * d_in, d_out, bias=True),
        },
    }


def gen_dir_apply(p, src_ids, dst_ids, val, x_src, x_dst, num_dst):
    """One GENConv direction over edges (sorted by dst)."""
    e = linear_apply(p["edge"], val[:, None].astype(x_src.dtype))
    msg = jax.nn.relu(x_src[src_ids] + e) + EPS
    t = p["t"].astype(jnp.float32)
    msg32 = msg.astype(jnp.float32)
    aggr = _segment_softmax_agg(msg32 * t, msg32, dst_ids, num_dst)
    h = aggr.astype(x_dst.dtype) + x_dst
    h = linear_apply(p["mlp"]["l1"], h)
    h = layer_norm_apply(p["mlp"]["ln"], h)
    h = jax.nn.relu(h)
    return linear_apply(p["mlp"]["l2"], h)


def gen_bidir_init(key, left_dim: int, right_dim: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {"l2r": gen_dir_init(k1, left_dim, out_dim),
            "r2l": gen_dir_init(k2, right_dim, out_dim)}


def gen_bidir_apply(p, pg, left, right):
    n_pad = pg.v_feas.shape[0]
    m_pad = pg.c_feas.shape[0]
    right_updated = gen_dir_apply(p["l2r"], pg.row_c, pg.col_c, pg.val_c,
                                  left, right, n_pad)
    left_updated = gen_dir_apply(p["r2l"], pg.col_r, pg.row_r, pg.val_r,
                                 right, left, m_pad)
    return left_updated, right_updated
