"""ctypes wrapper for the native host PairHMM engine (pairhmm_cpu.cpp).

Scores a PairBatch entirely on host — no jit, no device copies — serving the
same role as the reference's CPU SIMD engines (reference:
src/haplotypecaller/pairhmm/pairhmm_engine.cpp:22-53). Used for pure-CPU runs
and as the small-input fallback on tunnel-attached TPU sessions.
"""

import ctypes

import numpy as np

from . import build

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = build.shared_lib("pairhmm_cpu", extra_flags=("-fopenmp",))
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.rovaca_pairhmm_dense.restype = None
    lib.rovaca_pairhmm_dense.argtypes = [
        ctypes.POINTER(ctypes.c_float),    # trans (GR, Lr, 8, 128)
        ctypes.POINTER(ctypes.c_int32),    # rbase (GR, Lr, 128)
        ctypes.POINTER(ctypes.c_int32),    # rlen  (GR, 128)
        ctypes.POINTER(ctypes.c_int32),    # hcode (GH, Lh, 8)
        ctypes.POINTER(ctypes.c_int32),    # hlen  (GH, 8)
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),    # out (GH, GR, 8, 128)
    ]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def pairhmm_dense(trans, rbase, rlen, hbase, hlen):
    """Same tensor contract as ops.pairhmm.xla.pairhmm_xla.

    trans (GR, Lr, 8, 128) f32; rbase (GR, Lr, 128) i32; rlen (GR, 1, 128);
    hbase (GH, Lh, 8, 128) lane-broadcast OR compact (GH, Lh, 8);
    hlen (GH, 8, 1). Returns (GH, GR, 8, 128) float32 raw sums.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native pairhmm engine unavailable")
    from .. import constants as C

    trans = np.ascontiguousarray(trans, dtype=np.float32)
    rbase = np.ascontiguousarray(rbase, dtype=np.int32)
    rlen2 = np.ascontiguousarray(
        np.asarray(rlen, dtype=np.int32).reshape(rbase.shape[0], -1))
    hb = np.asarray(hbase, dtype=np.int32)
    if hb.ndim == 4:        # lane-broadcast (GH, Lh, 8, 128) -> compact
        hb = hb[:, :, :, 0]
    hcode = np.ascontiguousarray(hb)
    hlen2 = np.ascontiguousarray(
        np.asarray(hlen, dtype=np.int32).reshape(hcode.shape[0], -1))

    GR, Lr = rbase.shape[0], rbase.shape[1]
    GH, Lh = hcode.shape[0], hcode.shape[1]
    out = np.zeros((GH, GR, 8, 128), dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rovaca_pairhmm_dense(
        trans.ctypes.data_as(f32p), rbase.ctypes.data_as(i32p),
        rlen2.ctypes.data_as(i32p), hcode.ctypes.data_as(i32p),
        hlen2.ctypes.data_as(i32p), GR, Lr, GH, Lh,
        np.float32(C.INITIAL_CONSTANT_F32), out.ctypes.data_as(f32p))
    return out


# ---------------------------------------------------------------------------
# double rescue (pairhmm_f64.cpp)
# ---------------------------------------------------------------------------

_f64_lib = None
_f64_tried = False


def _load_f64():
    global _f64_lib, _f64_tried
    if _f64_tried:
        return _f64_lib
    _f64_tried = True
    # -ffp-contract=off: the rescue contract is bit-equality with the numpy
    # golden oracle, whose elementwise ops never fuse mul+add
    path = build.shared_lib("pairhmm_f64", extra_flags=("-ffp-contract=off",))
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rovaca_pairhmm_f64_rows.restype = None
    lib.rovaca_pairhmm_f64_rows.argtypes = [
        f64p, i32p, ctypes.c_int32, i32p, ctypes.c_int32,
        ctypes.c_double, f64p, f64p]
    _f64_lib = lib
    return lib


def rescue_available():
    return _load_f64() is not None


def forward_f64(channels, codes, hap_codes):
    """Raw double forward for one (read, hap) pair, bit-identical to
    golden.forward_from_channels(dtype=np.float64): the C side runs the
    recurrence without FMA, the final column sums stay in numpy (np.sum's
    pairwise summation is part of the oracle's rounding)."""
    lib = _load_f64()
    from .. import constants as C

    ch = np.ascontiguousarray(channels, dtype=np.float64)
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    hap = np.ascontiguousarray(hap_codes, dtype=np.int32)
    Lr, Lh = codes.shape[0], hap.shape[0]
    m = np.empty(Lh, dtype=np.float64)
    i = np.empty(Lh, dtype=np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rovaca_pairhmm_f64_rows(
        ch.ctypes.data_as(f64p), codes.ctypes.data_as(i32p), Lr,
        hap.ctypes.data_as(i32p), Lh,
        np.float64(C.INITIAL_CONSTANT_F64),
        m.ctypes.data_as(f64p), i.ctypes.data_as(f64p))
    return np.float64(np.sum(m, dtype=np.float64)
                      + np.sum(i, dtype=np.float64))
