"""Serialization: msgpack(+numpy), json, pickle, results tables.

Role of reference utils.py:143-240. The msgpack numpy encoding is wire-
compatible with ``msgpack_numpy`` (the reference's format, utils.py:193-224),
so ``raw/*.pk`` / ``processed/*.pk`` blobs written by either side load in both.

Results tables (reference stores pandas HDF5 ``time.h5``, utils.py:227-240):
``df_dump`` writes real HDF5 whenever pytables is importable (tool-compatible
with the reference's readers) and falls back to pandas pickle under the same
filename otherwise (this image lacks pytables); ``df_load`` sniffs the HDF5
magic bytes so either format reads back transparently.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any

import msgpack
import numpy as np
import pandas as pd


def _mkparent(path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)


# ---------------------------------------------------------------- msgpack+numpy
def _encode_np(obj):
    if isinstance(obj, np.ndarray):
        if obj.dtype == object:
            raise TypeError("object arrays are not msgpack-serializable")
        if not obj.flags["C_CONTIGUOUS"]:
            obj = np.ascontiguousarray(obj)
        return {
            b"nd": True,
            b"type": obj.dtype.str,
            b"kind": b"",
            b"shape": list(obj.shape),
            b"data": obj.tobytes(),
        }
    if isinstance(obj, (np.bool_, np.number)):
        return {b"nd": False, b"type": obj.dtype.str, b"data": obj.tobytes()}
    return obj


def _decode_np(obj):
    if isinstance(obj, dict) and b"nd" in obj:
        dtype = np.dtype(obj[b"type"])
        if obj[b"nd"]:
            return np.frombuffer(obj[b"data"], dtype=dtype).reshape(obj[b"shape"])
        return np.frombuffer(obj[b"data"], dtype=dtype)[0]
    return obj


def msgpack_dump(obj: Any, path: str) -> None:
    _mkparent(path)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(msgpack.packb(obj, default=_encode_np, use_bin_type=True))
    os.replace(tmp, path)


def msgpack_load(path: str, copy: bool = True) -> Any:
    with open(path, "rb") as f:
        obj = msgpack.unpackb(f.read(), object_hook=_decode_np, raw=False,
                              strict_map_key=False)
    if copy:
        obj = _deep_copy_arrays(obj)
    return obj


def _deep_copy_arrays(obj):
    # frombuffer views are read-only; copy so callers can mutate in place
    if isinstance(obj, np.ndarray):
        return obj.copy()
    if isinstance(obj, list):
        return [_deep_copy_arrays(o) for o in obj]
    if isinstance(obj, tuple):
        return tuple(_deep_copy_arrays(o) for o in obj)
    if isinstance(obj, dict):
        return {k: _deep_copy_arrays(v) for k, v in obj.items()}
    return obj


# ------------------------------------------------------------------- json/pickle
class _NpEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


def json_dump(obj: Any, path: str) -> None:
    _mkparent(path)
    with open(path, "w") as f:
        json.dump(obj, f, cls=_NpEncoder)


def json_load(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def pickle_dump(obj: Any, path: str) -> None:
    _mkparent(path)
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def pickle_load(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


# --------------------------------------------------------------- results tables
def _have_pytables() -> bool:
    try:
        import tables  # noqa: F401
        return True
    except Exception:
        return False


_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def df_dump(df: pd.DataFrame, path: str) -> None:
    """Persist a results table (named ``time.h5`` for pipeline parity).

    Real HDF5 (reference utils.py:227-240 ``df.to_hdf(..., key='df')``) when
    pytables is importable; pandas pickle otherwise."""
    _mkparent(path)
    if _have_pytables():
        df.to_hdf(path, key="df", mode="w")
    else:
        df.to_pickle(path)


def df_load(path: str) -> pd.DataFrame:
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == _HDF5_MAGIC:
        return pd.read_hdf(path, key="df")
    return pd.read_pickle(path)
