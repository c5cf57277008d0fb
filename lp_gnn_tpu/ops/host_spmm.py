"""Host-side (no-JAX) C++ SpMM/SDDMM mirroring the device op signatures.

The reference's torch_sparse spmm is a C++/CUDA op (SURVEY.md §2.2); on TPU
the hot path is ops/spmm.py (XLA blocked einsum). This module is the
C++ CPU fallback with the *same semantics* as ``segment_spmm`` — usable for
host-side pipelines and as an independent parity oracle for the device
kernels (it shares no code with them).
"""
from __future__ import annotations

import ctypes

import numpy as np

from ..solver.native import open_cdll

_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is None:
        lib = open_cdll()
        # hasattr also rejects a stale libtpulp.so built before these
        # exports existed (dlsym miss raises AttributeError on access)
        if lib is None or not hasattr(lib, "tpulp_spmm"):
            return None
        c_ip = ctypes.POINTER(ctypes.c_int)
        c_dp = ctypes.POINTER(ctypes.c_double)
        lib.tpulp_spmm.argtypes = [ctypes.c_longlong, ctypes.c_int,
                                   ctypes.c_int, c_ip, c_ip, c_dp, c_dp, c_dp]
        lib.tpulp_spmm.restype = None
        lib.tpulp_sddmm.argtypes = [ctypes.c_longlong, ctypes.c_int, c_ip,
                                    c_ip, c_dp, c_dp, c_dp]
        lib.tpulp_sddmm.restype = None
        _lib = lib
    return _lib


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def spmm_host(dst, src, val, x, num_dst: int) -> np.ndarray:
    """out[d] = sum over edges e with dst[e]==d of val[e] * x[src[e]] —
    same contract as ops.spmm.segment_spmm (without the VJP plumbing)."""
    lib = _load()
    assert lib is not None, "libtpulp.so not built (make -C solver/native)"
    dst, src = _as_i32(dst), _as_i32(src)
    val = _as_f64(val)
    x = _as_f64(x)
    ne = int(dst.shape[0])
    dim = int(x.shape[1])
    # the C++ kernel does raw pointer arithmetic: out-of-range indices would
    # corrupt the heap, not drop like device segment_sum — validate here
    assert src.shape == (ne,) and val.shape == (ne,)
    if ne:
        assert 0 <= dst.min() and int(dst.max()) < num_dst, "dst out of range"
        assert 0 <= src.min() and int(src.max()) < x.shape[0], "src out of range"
    out = np.zeros((num_dst, dim), dtype=np.float64)
    c_ip = ctypes.POINTER(ctypes.c_int)
    c_dp = ctypes.POINTER(ctypes.c_double)
    lib.tpulp_spmm(ne, num_dst, dim, dst.ctypes.data_as(c_ip),
                   src.ctypes.data_as(c_ip), val.ctypes.data_as(c_dp),
                   x.ctypes.data_as(c_dp), out.ctypes.data_as(c_dp))
    return out


def sddmm_host(dst, src, gout, x) -> np.ndarray:
    """g_val[e] = dot(gout[dst[e]], x[src[e]]) — the edge-value gradient of
    spmm (the SDDMM in ops.spmm._segment_spmm_bwd)."""
    lib = _load()
    assert lib is not None, "libtpulp.so not built (make -C solver/native)"
    dst, src = _as_i32(dst), _as_i32(src)
    gout, x = _as_f64(gout), _as_f64(x)
    ne = int(dst.shape[0])
    dim = int(x.shape[1])
    assert src.shape == (ne,) and gout.shape[1] == dim
    if ne:
        assert 0 <= dst.min() and int(dst.max()) < gout.shape[0], "dst out of range"
        assert 0 <= src.min() and int(src.max()) < x.shape[0], "src out of range"
    gval = np.zeros(ne, dtype=np.float64)
    c_ip = ctypes.POINTER(ctypes.c_int)
    c_dp = ctypes.POINTER(ctypes.c_double)
    lib.tpulp_sddmm(ne, dim, dst.ctypes.data_as(c_ip),
                    src.ctypes.data_as(c_ip), gout.ctypes.data_as(c_dp),
                    x.ctypes.data_as(c_dp), gval.ctypes.data_as(c_dp))
    return gval
