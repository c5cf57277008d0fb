"""Model zoo: GCN_FC (flagship), GCN, GCNDeeper, GENDeeper, GCNRand.

Re-designs reference arch.py:108-289 as pure functions over param pytrees.
Arch strings like ``"GCN_FC(8,8,hids=1024,depth=3)"`` are parsed with a safe
mini-parser (registry + literal args) instead of the reference's ``eval()``
(train.py:79).

Forward contract (all models): ``apply(params, pg, train=False, rng=None)``
-> (cons_logits (M_pad,3), vars_logits (N_pad,3)) after knowledge masking
(fp32). Padded rows carry garbage logits — downstream consumers mask them
with ``pg.cons_mask`` / ``pg.vars_mask``.
"""
from __future__ import annotations

import ast
import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .layers import (
    linear_init, linear_apply, bidir_conv_init, bidir_conv_apply,
    bidir_conv_apply_input,
    add_knowledge, dropout, layer_norm_init, layer_norm_apply,
)
from .gen import gen_bidir_init, gen_bidir_apply


@dataclasses.dataclass(frozen=True)
class Model:
    """A (init, apply) pair plus metadata."""
    name: str
    init: Callable[[Any], Any]            # key -> params
    apply: Callable[..., Any]             # (params, pg, train=..., rng=...) -> (lc, lv)
    depth: int
    hids: int
    dtype: str = "float32"                # compute dtype of the conv stack


def _split(rng, n):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return jax.random.split(rng, n)


# ------------------------------------------------------------------- GCN_FC
def make_gcn_fc(p: int = 8, q: int = 8, hids: int = 128, depth: int = 3,
                dp: float = 0.1, dtype: str = "float32",
                remat: bool = False) -> Model:
    """Flagship model (reference arch.py:167-193): 1 in-conv, depth-2 hidden
    convs, per-side Linear(hids,3) heads; conv1->relu; hidden: conv ->
    dropout -> relu; heads -> knowledge mask.

    ``dtype='bfloat16'`` runs the conv/linear stack in bf16 on the MXU
    (params stay fp32; SpMM accumulation and the knowledge mask stay fp32 —
    the reference's fp16 NaN workaround, val.py:111, motivates keeping the
    masking arithmetic in full precision).

    ``remat=True`` wraps each conv in ``jax.checkpoint``: backward
    recomputes the layer instead of storing per-layer activations — useful
    when node-feature activations dominate memory (deep stacks / wide hids;
    at 100M edges the edge layouts themselves dominate, where remat does
    not help — the edge-partitioned multi-chip path is the answer there)."""
    n_hidden = max(depth - 2, 0)
    cdtype = jnp.dtype(dtype)
    conv_fn = jax.checkpoint(bidir_conv_apply) if remat else bidir_conv_apply
    in_conv_fn = (jax.checkpoint(bidir_conv_apply_input) if remat
                  else bidir_conv_apply_input)

    def init(key):
        ks = jax.random.split(key, 3 + n_hidden)
        params = {"conv1": bidir_conv_init(ks[0], p, q, hids),
                  "layers": [bidir_conv_init(ks[1 + i], hids, hids, hids)
                             for i in range(n_hidden)],
                  "lin_left": linear_init(ks[-2], hids, 3),
                  "lin_right": linear_init(ks[-1], hids, 3)}
        return params

    def apply(params, pg, train=False, rng=None):
        x_left = pg.c_feas.astype(cdtype)
        x_right = pg.v_feas.astype(cdtype)
        left, right = in_conv_fn(params["conv1"], pg, x_left, x_right)
        left, right = jax.nn.relu(left), jax.nn.relu(right)
        keys = _split(rng, 2 * max(n_hidden, 1))
        for i, conv in enumerate(params["layers"]):
            left, right = conv_fn(conv, pg, left, right)
            left = dropout(left, dp, keys[2 * i], train)
            right = dropout(right, dp, keys[2 * i + 1], train)
            left, right = jax.nn.relu(left), jax.nn.relu(right)
        left = linear_apply(params["lin_left"], left)
        right = linear_apply(params["lin_right"], right)
        return add_knowledge(left, right, x_left, x_right)

    return Model("GCN_FC", init, apply, depth, hids, dtype=dtype)


# ---------------------------------------------------------------------- GCN
def make_gcn(p: int = 8, q: int = 8, hids: int = 128,
             dtype: str = "float32") -> Model:
    """3 fixed convs (reference arch.py:144-164)."""
    cdtype = jnp.dtype(dtype)

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv1": bidir_conv_init(k1, p, q, hids),
                "conv2": bidir_conv_init(k2, hids, hids, hids),
                "conv3": bidir_conv_init(k3, hids, hids, 3)}

    def apply(params, pg, train=False, rng=None):
        x_left = pg.c_feas.astype(cdtype)
        x_right = pg.v_feas.astype(cdtype)
        left, right = bidir_conv_apply_input(params["conv1"], pg, x_left,
                                             x_right)
        left, right = jax.nn.relu(left), jax.nn.relu(right)
        left, right = bidir_conv_apply(params["conv2"], pg, left, right)
        left, right = jax.nn.relu(left), jax.nn.relu(right)
        k1, k2 = _split(rng, 2)
        left = dropout(left, 0.1, k1, train)
        right = dropout(right, 0.1, k2, train)
        left, right = bidir_conv_apply(params["conv3"], pg, left, right)
        return add_knowledge(left, right, x_left, x_right)

    return Model("GCN", init, apply, 3, hids, dtype=dtype)


# ------------------------------------------------------------------ GCNRand
def make_gcn_rand(dtype: str = "float32") -> Model:
    """Random-logit control baseline (reference arch.py:116-126): U[0,1)
    logits through the same knowledge-mask/decode path. ``dtype`` is
    accepted for --fp16 arch-string compatibility; the logits are fresh
    uniforms and the mask is always fp32, so it has no effect."""

    def init(key):
        return {"_": jnp.zeros(())}

    def apply(params, pg, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        left = jax.random.uniform(k1, (pg.c_feas.shape[0], 3))
        right = jax.random.uniform(k2, (pg.v_feas.shape[0], 3))
        return add_knowledge(left, right, pg.c_feas, pg.v_feas)

    return Model("GCNRand", init, apply, 0, 0)


# ------------------------------------------------- DeepGCN res+ layer stacks
def _deep_layer_init(key, hids, conv_init):
    k = jax.random.split(key, 1)[0]
    return {"conv": conv_init(k, hids, hids, hids),
            "norm_l": layer_norm_init(hids), "norm_r": layer_norm_init(hids)}


def _deep_layer_apply(p, pg, left, right, conv_apply, dp, keys, train):
    """res+ pre-activation block (reference arch.py:201-239):
    norm -> relu -> dropout -> conv -> +residual."""
    h_l = layer_norm_apply(p["norm_l"], left)
    h_r = layer_norm_apply(p["norm_r"], right)
    h_l, h_r = jax.nn.relu(h_l), jax.nn.relu(h_r)
    h_l = dropout(h_l, dp, keys[0], train)
    h_r = dropout(h_r, dp, keys[1], train)
    h_l, h_r = conv_apply(p["conv"], pg, h_l, h_r)
    return left + h_l, right + h_r


def _make_deeper(name, conv_init, conv_apply, p=8, q=8, hids=128, depth=5,
                 in_conv_apply=None, dtype="float32",
                 remat: bool = False) -> Model:
    # in_conv_apply: cached-input variant for the first conv where the
    # aggregation is parameter-free (GraphConv); GENConv's softmax
    # aggregation depends on learnable temperature, so it cannot be cached.
    # remat=True wraps each conv in jax.checkpoint — required for
    # bench-tier GENDeeper training: the GEN softmax keeps (E, hids) fp32
    # edge tensors live per direction, and without remat a depth-5
    # backward at 1M edges x hids=256 wants ~37 GB of HBM (measured OOM,
    # RESULTS.md r4 zoo bench); recomputing each block bounds live memory
    # to one block's activations.
    in_conv_apply = in_conv_apply or conv_apply
    if remat:
        conv_apply = jax.checkpoint(conv_apply)
        in_conv_apply = jax.checkpoint(in_conv_apply)
    n_mid = max(depth - 2, 0)
    cdtype = jnp.dtype(dtype)

    def init(key):
        ks = jax.random.split(key, n_mid + 2)
        return {"conv_in": conv_init(ks[0], p, q, hids),
                "blocks": [_deep_layer_init(ks[1 + i], hids, conv_init)
                           for i in range(n_mid)],
                "conv_out": conv_init(ks[-1], hids, hids, 3)}

    def apply(params, pg, train=False, rng=None):
        x_left = pg.c_feas.astype(cdtype)
        x_right = pg.v_feas.astype(cdtype)
        left, right = in_conv_apply(params["conv_in"], pg, x_left, x_right)
        keys = _split(rng, 2 * max(n_mid, 1))
        for i, blk in enumerate(params["blocks"]):
            left, right = _deep_layer_apply(blk, pg, left, right, conv_apply,
                                            0.1, keys[2 * i: 2 * i + 2], train)
        left, right = conv_apply(params["conv_out"], pg, left, right)
        return add_knowledge(left, right, x_left, x_right)

    return Model(name, init, apply, depth, hids, dtype=dtype)


def make_gcn_deeper(p=8, q=8, hids=128, depth=50, dtype="float32",
                    remat=False) -> Model:
    return _make_deeper("GCNDeeper", bidir_conv_init, bidir_conv_apply,
                        p, q, hids, depth,
                        in_conv_apply=bidir_conv_apply_input, dtype=dtype,
                        remat=remat)


def make_gen_deeper(p=8, q=8, hids=128, depth=5, dtype="float32",
                    remat=False) -> Model:
    return _make_deeper("GENDeeper", gen_bidir_init, gen_bidir_apply,
                        p, q, hids, depth, dtype=dtype, remat=remat)


MODEL_REGISTRY = {
    "GCN_FC": make_gcn_fc,
    "GCN": make_gcn,
    "GCNRand": make_gcn_rand,
    "GCNDeeper": make_gcn_deeper,
    "GENDeeper": make_gen_deeper,
}


def build_model(arch: str) -> Model:
    """Parse an arch string like ``GCN_FC(8,8,hids=1024,depth=3)`` safely."""
    tree = ast.parse(arch.strip(), mode="eval").body
    assert isinstance(tree, ast.Call) and isinstance(tree.func, ast.Name), arch
    name = tree.func.id
    assert name in MODEL_REGISTRY, f"unknown arch {name}"
    args = [ast.literal_eval(a) for a in tree.args]
    kwargs = {kw.arg: ast.literal_eval(kw.value) for kw in tree.keywords}
    # model factories take only the options they honor — an unknown option
    # raises here instead of being silently dropped
    return MODEL_REGISTRY[name](*args, **kwargs)
