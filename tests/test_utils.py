"""Infra-layer tests: serialization compat, misc helpers (reference utils.py)."""
import numpy as np

from lp_gnn_tpu.utils.serialize import (
    msgpack_dump, msgpack_load, json_dump, json_load, df_dump, df_load,
)
from lp_gnn_tpu.utils.misc import (
    extract_fn, split_idxs_train_val, split_out_chunk, AverageMeter,
    increment_path,
)


def test_msgpack_numpy_roundtrip(tmp_path):
    fn = str(tmp_path / "x.pk")
    blob = [np.arange(5, dtype=np.int64),
            (np.array([1.5, 2.5]), np.array([[1, 2], [3, 4]], dtype=np.int32)),
            {"a": np.float32(3.5), "nms": ["r0", "r1"]},
            7, "s"]
    msgpack_dump(blob, fn)
    out = msgpack_load(fn, copy=True)
    np.testing.assert_array_equal(out[0], blob[0])
    np.testing.assert_array_equal(out[1][0], blob[1][0])
    np.testing.assert_array_equal(out[1][1], blob[1][1])
    assert out[2]["a"] == np.float32(3.5)
    assert out[2]["nms"] == ["r0", "r1"]
    assert out[3] == 7 and out[4] == "s"
    out[0][0] = 99  # copy=True must give writable arrays


def test_msgpack_numpy_wire_compat(tmp_path):
    """Our encoding must be the msgpack_numpy dict format the reference wrote
    (utils.py:193-224) so its .pk blobs load unchanged."""
    import msgpack
    fn = str(tmp_path / "y.pk")
    msgpack_dump(np.arange(3), fn)
    with open(fn, "rb") as f:
        raw = msgpack.unpackb(f.read(), raw=True, strict_map_key=False)
    assert raw[b"nd"] is True
    assert b"type" in raw and b"shape" in raw and b"data" in raw


def test_extract_fn():
    assert extract_fn("/a/b/lp_12.mps.gz") == "lp_12"
    assert extract_fn("x.bas") == "x"
    assert extract_fn("name.with.dot.log") == "name.with.dot"


def test_split_seed_forced_zero():
    a_tr, a_va = split_idxs_train_val(20, seed=0)
    b_tr, b_va = split_idxs_train_val(20, seed=5)  # forced back to 0
    np.testing.assert_array_equal(a_tr, b_tr)
    assert len(a_tr) == 14 and len(a_va) == 6
    assert np.intersect1d(a_tr, a_va).size == 0


def test_split_out_chunk():
    fns = list(range(10))
    assert split_out_chunk(fns, "0/2") == fns[:5]
    assert split_out_chunk(fns, "1/2") == fns[5:]
    assert split_out_chunk(fns, None) == fns


def test_average_meter():
    m = AverageMeter(window=3)
    for v in [1, 2, 3, 4]:
        m.update(v)
    assert m.avg == 3.0  # window of 3: mean(2,3,4)


def test_df_roundtrip(tmp_path):
    import pandas as pd
    df = pd.DataFrame({"fn": ["a", "b"], "niter": [10, 20]})
    fn = str(tmp_path / "time.h5")
    df_dump(df, fn)
    out = df_load(fn)
    pd.testing.assert_frame_equal(df, out)


def test_increment_path(tmp_path):
    p = str(tmp_path / "exp")
    assert increment_path(p, exist_ok=True).rstrip("/") == p
    import os
    os.makedirs(p)
    p2 = increment_path(p, exist_ok=False)
    assert p2.rstrip("/").endswith("exp2")


def test_parse_args_lp_method_strings(tmp_path):
    """--lp_method accepts 'dual'/'primal' (LP_METHOD_MAP) as well as ints."""
    from lp_gnn_tpu.config import parse_args
    for val, want in [("dual", 1), ("primal", 4), ("4", 4)]:
        cfg = parse_args(["--lp_method", val, "--exp_nm", "t-lpm",
                          "--data_prefix", str(tmp_path / "d"),
                          "--log_prefix", str(tmp_path / "r")],
                         make_log_dir=False)
        assert cfg.normalized_lp_method() == want


def test_parse_str_roundtrip():
    """exp-name <-> config token codecs (reference utils.py:857-879)."""
    from lp_gnn_tpu.config import clean_str, parse_str
    arch = "GCN_FC(8,8,hids=1024,depth=3)"
    exp = f"highs--mirp_like-balance-ep800-arch{clean_str(arch)}"
    assert parse_str(exp, "arch") == arch
    assert parse_str(exp, "dataset") == "mirp_like"
    assert parse_str(exp, "solver_prefix") == "highs-"
    # reference dataset tokens still recoverable; -perm wins over the base
    assert parse_str("x-medium-inv-y", "dataset") == "medium-inv"
    assert parse_str("transport-perm-ep60", "dataset") == "transport-perm"
    assert parse_str("no-solver-here", "solver_prefix") == ""
    import pytest
    with pytest.raises(ValueError):
        parse_str("nothing", "dataset")


def test_log_prt_tee(tmp_path):
    """set_file_logger_prt tees raw stdout/stderr writes into log-prt /
    log-prt-err in the run dir (reference Logger, utils.py:418-456)."""
    import sys
    from lp_gnn_tpu.utils.log import set_file_logger_prt, _Tee
    out0, err0 = sys.stdout, sys.stderr
    try:
        set_file_logger_prt(str(tmp_path))
        print("hello-prt")
        print("boom-err", file=sys.stderr)
        sys.stdout.flush(), sys.stderr.flush()
        assert "hello-prt" in open(tmp_path / "log-prt").read()
        assert "boom-err" in open(tmp_path / "log-prt-err").read()
        # idempotent: a second call must not stack tees
        set_file_logger_prt(str(tmp_path))
        assert not isinstance(sys.stdout.console, _Tee)
    finally:
        if isinstance(sys.stdout, _Tee):
            sys.stdout.close()
        if isinstance(sys.stderr, _Tee):
            sys.stderr.close()
        sys.stdout, sys.stderr = out0, err0


def test_df_dump_hdf5_when_pytables_present(tmp_path):
    """df_dump writes real HDF5 when pytables is importable (reference
    utils.py:227-240); df_load sniffs the magic so either format reads."""
    import pandas as pd
    from lp_gnn_tpu.utils.serialize import _have_pytables, _HDF5_MAGIC
    df = pd.DataFrame({"fn": ["a"], "x": [1.5]})
    p = str(tmp_path / "time.h5")
    df_dump(df, p)
    with open(p, "rb") as f:
        magic = f.read(8)
    assert (magic == _HDF5_MAGIC) == _have_pytables()
    out = df_load(p)
    assert list(out.fn) == ["a"] and float(out.x[0]) == 1.5
