"""Banded Pallas SW vs the exact GATK-SW python oracle (interpret mode)."""

import numpy as np
import pytest

from rovaca_tpu.assembly.sw import (DANGLING_END_PARAMS,
                                    HAPLOTYPE_TO_REFERENCE_PARAMS,
                                    READ_TO_HAPLOTYPE_PARAMS,
                                    OverhangStrategy, _sw_align_python)
from rovaca_tpu.ops.sw import sw_align_banded_batch


def _seq(rng, L):
    return bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), L))


def _mutate(rng, s, n_snp=2, n_ins=1, n_del=1):
    s = bytearray(s)
    for _ in range(n_snp):
        i = rng.integers(0, len(s))
        s[i] = ord("ACGT"[rng.integers(4)])
    for _ in range(n_ins):
        i = rng.integers(0, len(s))
        s[i:i] = _seq(rng, int(rng.integers(1, 4)))
    for _ in range(n_del):
        i = rng.integers(0, max(1, len(s) - 6))
        del s[i:i + int(rng.integers(1, 4))]
    return bytes(s)


def _cases(rng, n=16):
    cases, diags = [], []
    for _ in range(n):
        hap = _seq(rng, int(rng.integers(180, 420)))
        off = int(rng.integers(0, max(1, len(hap) - 150)))
        read = _mutate(rng, hap[off:off + int(rng.integers(60, 150))])
        cases.append((hap, read))
        diags.append(off)
    return cases, diags


@pytest.mark.parametrize("params", [READ_TO_HAPLOTYPE_PARAMS,
                                    HAPLOTYPE_TO_REFERENCE_PARAMS,
                                    DANGLING_END_PARAMS])
@pytest.mark.parametrize("overhang", [OverhangStrategy.SOFTCLIP,
                                      OverhangStrategy.IGNORE])
def test_matches_oracle(params, overhang):
    rng = np.random.default_rng(hash((params.match, int(overhang))) % 2**31)
    cases, diags = _cases(rng)
    res = sw_align_banded_batch(cases, params, overhang=overhang,
                                diagonals=diags, interpret=True)
    for (ref, alt), diag, r in zip(cases, diags, res):
        want = _sw_align_python(ref, alt, params, overhang)
        assert str(r.result.cigar) == str(want.cigar)
        assert r.result.alignment_offset == want.alignment_offset


def test_wrong_diagonal_falls_back_exactly():
    """A read whose true offset is far from the supplied band center must
    still return the exact answer (via the edge guard -> host fallback)."""
    rng = np.random.default_rng(7)
    hap = _seq(rng, 400)
    read = hap[300:380]          # true diagonal 300
    res = sw_align_banded_batch([(hap, read)], READ_TO_HAPLOTYPE_PARAMS,
                                overhang=OverhangStrategy.SOFTCLIP,
                                diagonals=[10], interpret=True)[0]
    want = _sw_align_python(hap, read, READ_TO_HAPLOTYPE_PARAMS,
                            OverhangStrategy.SOFTCLIP)
    assert str(res.result.cigar) == str(want.cigar)
    assert res.result.alignment_offset == want.alignment_offset


def test_near_tie_gap_placement_on_kernel_path():
    """Gap cost is wo + (len-1)*we — an off-by-one extend biases near-tie
    placements. Reads with short indels inside a correct band must yield
    the oracle's cigar WITHOUT falling back (regression for the horizontal
    max-plus scan's extend accounting)."""
    rng = np.random.default_rng(20260821)
    cases, diags = [], []
    for _ in range(24):
        hap = _seq(rng, int(rng.integers(200, 380)))
        off = int(rng.integers(0, max(1, len(hap) - 140)))
        read = bytearray(hap[off:off + int(rng.integers(70, 130))])
        # a short indel mid-read with repeat context (near-tie placements)
        i = int(rng.integers(20, max(21, len(read) - 25)))
        if rng.integers(2):
            read[i:i] = read[i:i + int(rng.integers(1, 3))]  # dup insertion
        else:
            del read[i:i + int(rng.integers(1, 3))]
        cases.append((hap, bytes(read)))
        diags.append(off)
    res = sw_align_banded_batch(cases, READ_TO_HAPLOTYPE_PARAMS,
                                overhang=OverhangStrategy.SOFTCLIP,
                                diagonals=diags, interpret=True)
    n_kernel = 0
    for (ref, alt), r in zip(cases, res):
        want = _sw_align_python(ref, alt, READ_TO_HAPLOTYPE_PARAMS,
                                OverhangStrategy.SOFTCLIP)
        assert str(r.result.cigar) == str(want.cigar), \
            f"fell_back={r.fell_back}"
        assert r.result.alignment_offset == want.alignment_offset
        n_kernel += not r.fell_back
    assert n_kernel >= len(cases) // 2   # most must resolve in-band


def test_indel_family_uses_host_path():
    rng = np.random.default_rng(3)
    hap = _seq(rng, 300)
    alt = _mutate(rng, hap, n_snp=3, n_ins=2, n_del=2)
    for ov in (OverhangStrategy.INDEL, OverhangStrategy.LEADING_INDEL):
        res = sw_align_banded_batch([(hap, alt)], READ_TO_HAPLOTYPE_PARAMS,
                                    overhang=ov, interpret=True)[0]
        want = _sw_align_python(hap, alt, READ_TO_HAPLOTYPE_PARAMS, ov)
        assert res.fell_back
        assert str(res.result.cigar) == str(want.cigar)
