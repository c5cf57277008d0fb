"""Import reference PyTorch checkpoints into this framework's param pytrees.

The reference saves ``state_dict`` files (``runs/{exp}/mdl.pth``, reference
arch.py:108-114, train.py:154-157). A user migrating from vbdai/lp-gnn can
load those weights here and run prediction/warm-starting on TPU without
retraining.

Key mapping for GCN_FC (reference arch.py:167-193 -> models/gcn.py):

    conv1.left2right.lin_rel.weight  (out,in) -> conv1.l2r.rel.w  (in,out).T
    conv1.left2right.lin_rel.bias             -> conv1.l2r.rel.b
    conv1.left2right.lin_root.weight          -> conv1.l2r.root.w (no bias)
    conv1.right2left.*                        -> conv1.r2l.*
    layers.{i}.left2right/right2left.*        -> layers[i].l2r/r2l.*
    lin_left.weight/bias                      -> lin_left.w.T / .b
    lin_right.weight/bias                     -> lin_right.w.T / .b

PyG GraphConv((src,dst), out) applies lin_rel to the aggregated source
messages and lin_root (bias-free) to the destination features — exactly
our ``bidir_conv_apply`` contract, so the mapping is a pure transpose.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _to_np(t):
    try:
        import torch
        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def _lin(sd, prefix):
    w = _to_np(sd[prefix + ".weight"]).T.astype(np.float32)
    out = {"w": jnp.asarray(w)}
    if prefix + ".bias" in sd:
        out["b"] = jnp.asarray(_to_np(sd[prefix + ".bias"]).astype(np.float32))
    return out


def _bidir(sd, prefix):
    return {
        "l2r": {"rel": _lin(sd, prefix + ".left2right.lin_rel"),
                "root": _lin(sd, prefix + ".left2right.lin_root")},
        "r2l": {"rel": _lin(sd, prefix + ".right2left.lin_rel"),
                "root": _lin(sd, prefix + ".right2left.lin_root")},
    }


def gcn_fc_params_from_state_dict(sd: dict) -> dict:
    """Convert a reference GCN_FC state_dict to this framework's params."""
    n_hidden = 0
    while f"layers.{n_hidden}.left2right.lin_rel.weight" in sd:
        n_hidden += 1
    return {
        "conv1": _bidir(sd, "conv1"),
        "layers": [_bidir(sd, f"layers.{i}") for i in range(n_hidden)],
        "lin_left": _lin(sd, "lin_left"),
        "lin_right": _lin(sd, "lin_right"),
    }


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``mdl.pth`` -> framework params (GCN_FC layout)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return gcn_fc_params_from_state_dict(sd)
