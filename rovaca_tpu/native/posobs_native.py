"""ctypes binding for the native GVCF position-observation accumulator."""

import ctypes
import functools

import numpy as np

from . import build

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)


@functools.lru_cache(maxsize=1)
def _lib():
    path = build.shared_lib("posobs")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.rovaca_build_position_obs.restype = None
    lib.rovaca_build_position_obs.argtypes = [
        ctypes.c_int64, _i64p, _i64p, _i32p, _i32p, _i64p, _i32p, _u8p,
        _i32p, _i64p, _i32p, _u8p, _u8p, _u8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i32p, _i32p,
        _i32p]
    return lib


def available():
    return _lib() is not None


def build_position_obs_packed(obs, pk, keep, padded_ref, padded_start,
                              start, end):
    """Accumulate from a PackedFinalized (finalize_native) without
    materializing ReadRecords: subset rows by `keep` (bool mask), flatten
    the kept cigar/sequence slices with vectorized gathers, and feed the
    same native entry. Array-identical to the record path."""
    from .finalize_native import _ranges
    lib = _lib()
    o, src = pk.o, pk.src
    rows = np.nonzero(keep)[0]
    n = int(rows.size)
    if n == 0:
        return
    idx = o["o_idx"][:pk.n][rows]
    pos = o["o_pos"][:pk.n][rows].astype(np.int64)
    mate_pos = src["mate_pos"][idx].astype(np.int64)
    tlen = src["tlen"][idx].astype(np.int32)
    flag = src["flag"][idx].astype(np.int32)

    cn64 = o["o_cn"][:pk.n][rows].astype(np.int64)
    gi = o["o_coff"][:pk.n][rows].repeat(cn64) + _ranges(cn64)
    cig_ops = np.ascontiguousarray(o["o_cops"][gi])
    cig_lens = np.ascontiguousarray(o["o_clens"][gi])
    cig_n = cn64.astype(np.int32)
    cig_off = np.zeros(n, dtype=np.int64)
    np.cumsum(cn64[:-1], out=cig_off[1:])

    sl64 = o["o_slen"][:pk.n][rows].astype(np.int64)
    si = o["o_soff"][:pk.n][rows].repeat(sl64) + _ranges(sl64)
    bases = np.ascontiguousarray(o["o_bases"][si])
    quals = np.ascontiguousarray(o["o_quals"][si])
    seq_len = sl64.astype(np.int32)
    seq_off = np.zeros(n, dtype=np.int64)
    np.cumsum(sl64[:-1], out=seq_off[1:])

    ref_c = np.ascontiguousarray(padded_ref, dtype=np.uint8)
    lib.rovaca_build_position_obs(
        n, pos.ctypes.data_as(_i64p), mate_pos.ctypes.data_as(_i64p),
        tlen.ctypes.data_as(_i32p), flag.ctypes.data_as(_i32p),
        cig_off.ctypes.data_as(_i64p), cig_n.ctypes.data_as(_i32p),
        cig_ops.ctypes.data_as(_u8p), cig_lens.ctypes.data_as(_i32p),
        seq_off.ctypes.data_as(_i64p), seq_len.ctypes.data_as(_i32p),
        bases.ctypes.data_as(_u8p), quals.ctypes.data_as(_u8p),
        ref_c.ctypes.data_as(_u8p), ref_c.size, padded_start, start, end,
        obs.hist.ctypes.data_as(_i32p), obs.depth.ctypes.data_as(_i32p),
        obs.indel_informative.ctypes.data_as(_i32p))


def build_position_obs(obs, reads, padded_ref, padded_start, start, end):
    """Accumulate into obs.{hist,depth,indel_informative} natively.

    Array-identical to the Python build_position_obs (the oracle —
    tests/test_posobs_native.py)."""
    lib = _lib()
    n = len(reads)
    if n == 0:
        return
    pos = np.fromiter((r.pos for r in reads), np.int64, n)
    mate_pos = np.fromiter((r.mate_pos for r in reads), np.int64, n)
    tlen = np.fromiter((r.tlen for r in reads), np.int32, n)
    flag = np.fromiter((r.flag for r in reads), np.int32, n)

    cig_n = np.empty(n, dtype=np.int32)
    ops_l, lens_l = [], []
    for i, r in enumerate(reads):
        el = r.cigar.elements
        cig_n[i] = len(el)
        ops_l += [e[0] for e in el]     # IntEnum -> int handled by np.array
        lens_l += [e[1] for e in el]
    cig_off = np.zeros(n, dtype=np.int64)
    np.cumsum(cig_n[:-1], out=cig_off[1:])
    cig_ops = np.array(ops_l, dtype=np.uint8)
    cig_lens = np.array(lens_l, dtype=np.int32)

    seq_len = np.fromiter((len(r.bases) for r in reads), np.int32, n)
    seq_off = np.zeros(n, dtype=np.int64)
    np.cumsum(seq_len[:-1], out=seq_off[1:])
    total = int(seq_len.sum())
    bases = np.frombuffer(b"".join(r.bases for r in reads), dtype=np.uint8)
    quals = np.empty(total, dtype=np.uint8)
    for i, r in enumerate(reads):
        quals[seq_off[i]:seq_off[i] + seq_len[i]] = r.quals

    ref_c = np.ascontiguousarray(padded_ref, dtype=np.uint8)
    assert obs.hist.flags.c_contiguous and obs.hist.dtype == np.int32
    assert obs.depth.flags.c_contiguous
    lib.rovaca_build_position_obs(
        n, pos.ctypes.data_as(_i64p), mate_pos.ctypes.data_as(_i64p),
        tlen.ctypes.data_as(_i32p), flag.ctypes.data_as(_i32p),
        cig_off.ctypes.data_as(_i64p), cig_n.ctypes.data_as(_i32p),
        cig_ops.ctypes.data_as(_u8p), cig_lens.ctypes.data_as(_i32p),
        seq_off.ctypes.data_as(_i64p), seq_len.ctypes.data_as(_i32p),
        bases.ctypes.data_as(_u8p), quals.ctypes.data_as(_u8p),
        ref_c.ctypes.data_as(_u8p), ref_c.size, padded_start, start, end,
        obs.hist.ctypes.data_as(_i32p), obs.depth.ctypes.data_as(_i32p),
        obs.indel_informative.ctypes.data_as(_i32p))
