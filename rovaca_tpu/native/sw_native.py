"""ctypes binding for the native Smith-Waterman."""

import ctypes
import functools

import numpy as np

from . import build

MAX_CIGAR = 1024


@functools.lru_cache(maxsize=1)
def _lib():
    path = build.shared_lib("sw")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.rovaca_sw_align.restype = ctypes.c_int
    lib.rovaca_sw_align.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    return lib


def available():
    return _lib() is not None


def align(ref, alt, params, overhang):
    lib = _lib()
    ops = (ctypes.c_uint8 * MAX_CIGAR)()
    lens = (ctypes.c_int32 * MAX_CIGAR)()
    offset = ctypes.c_int32()
    count = lib.rovaca_sw_align(
        ref, len(ref), alt, len(alt), params.match, params.mismatch,
        params.gap_open, params.gap_extend, overhang, ops, lens, MAX_CIGAR,
        ctypes.byref(offset))
    if count < 0:
        raise RuntimeError("native sw_align failed")
    return (np.ctypeslib.as_array(ops)[:count].copy(),
            np.ctypeslib.as_array(lens)[:count].copy(),
            int(offset.value))
