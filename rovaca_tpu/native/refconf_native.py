"""ctypes binding for the native batch indel-informativeness mask."""

import ctypes
import functools

import numpy as np

from . import build


@functools.lru_cache(maxsize=1)
def _lib():
    path = build.shared_lib("refconf", extra_flags=("-fopenmp",))
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rovaca_informative_mask_batch.restype = None
    lib.rovaca_informative_mask_batch.argtypes = [
        ctypes.c_int, u8p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), u8p,
        ctypes.POINTER(ctypes.c_int64), u8p, ctypes.c_int64, ctypes.c_int,
        u8p, u8p]
    return lib


def available():
    return _lib() is not None


def informative_mask_batch(bases_list, quals_list, rpl_list, ref_arr,
                           max_indel):
    """Batched _informative_mask. Returns (masks, ok) — masks a list of
    bool arrays per read; ok[r] False means diagonals left the reference
    bounds (caller must fall back, matching the python None return)."""
    lib = _lib()
    n = len(bases_list)
    if n == 0:
        return [], np.zeros(0, dtype=bool)
    lens = np.array([len(b) for b in bases_list], dtype=np.int32)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    total = int(lens.sum())
    bases = np.empty(total, dtype=np.uint8)
    quals = np.empty(total, dtype=np.uint8)
    rpl = np.empty(total, dtype=np.int64)
    for i in range(n):
        s, e = offs[i], offs[i] + lens[i]
        bases[s:e] = bases_list[i]
        quals[s:e] = quals_list[i]
        rpl[s:e] = rpl_list[i]
    ref = np.ascontiguousarray(ref_arr, dtype=np.uint8)
    out = np.zeros(total, dtype=np.uint8)
    ok = np.zeros(n, dtype=np.uint8)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rovaca_informative_mask_batch(
        n, bases.ctypes.data_as(u8p),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        quals.ctypes.data_as(u8p),
        rpl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ref.ctypes.data_as(u8p), ref.size, max_indel,
        out.ctypes.data_as(u8p), ok.ctypes.data_as(u8p))
    masks = [out[offs[i]:offs[i] + lens[i]].astype(bool) for i in range(n)]
    return masks, ok.astype(bool)
