"""Smith-Waterman: native vs python oracle, overhang strategies, GATK params."""

import numpy as np
import pytest

from rovaca_tpu.assembly.sw import (
    DANGLING_END_PARAMS, HAPLOTYPE_TO_REFERENCE_PARAMS,
    READ_TO_HAPLOTYPE_PARAMS, OverhangStrategy, SWParams, _sw_align_python,
    sw_align)
from rovaca_tpu.native import sw_native

P = HAPLOTYPE_TO_REFERENCE_PARAMS


class TestBasics:
    def test_exact_match_substring_shortcut(self):
        res = sw_align(b"AAACGTACGTTT", b"CGTACG", P)
        assert str(res.cigar) == "6M"
        assert res.alignment_offset == 3

    def test_identical(self):
        res = sw_align(b"ACGTACGT", b"ACGTACGT", P)
        assert str(res.cigar) == "8M"
        assert res.alignment_offset == 0

    def test_snp(self):
        ref = b"AAACGTACGTACGTAAA"
        alt = b"AAACGTACCTACGTAAA"
        res = sw_align(ref, alt, P)
        assert str(res.cigar) == "17M"
        assert res.alignment_offset == 0

    def test_deletion(self):
        ref = b"AAAACGTACGTACGTAAAA"
        alt = ref[:8] + ref[11:]
        res = sw_align(ref, alt, P)
        assert "3D" in str(res.cigar)

    def test_insertion(self):
        ref = b"AAAACGTACGTACGTAAAA"
        alt = ref[:9] + b"TTT" + ref[9:]
        res = sw_align(ref, alt, P)
        assert "3I" in str(res.cigar)

    def test_softclip_overhang(self):
        ref = b"GGGCGTTATTCCAC"
        alt = b"AAAGGGCGTTATT"  # overhang extends past the ref start
        res = sw_align(ref, alt, P, OverhangStrategy.SOFTCLIP)
        s = str(res.cigar)
        assert s.startswith("3S")
        assert res.cigar.query_length == len(alt)

    def test_overhang_becomes_insertion_when_cheaper(self):
        # 3 mismatches (-450) cost more than a 3-base insertion (-282), so
        # GATK emits 3I here rather than mismatching through
        res = sw_align(b"CCCCCGGGGGTTTTT", b"AAAGGGGGTTTTT", P,
                       OverhangStrategy.SOFTCLIP)
        assert str(res.cigar) == "3I10M"
        assert res.alignment_offset == 5

    def test_indel_overhang_strategy(self):
        ref = b"CCCCCGGGGGTTTTT"
        alt = b"GGGGGTTTTT"
        res = sw_align(ref, alt, P, OverhangStrategy.INDEL)
        # missing left ref becomes a deletion
        assert str(res.cigar) == "5D10M"
        assert res.alignment_offset == 0

    def test_cigar_query_length_invariant(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            ref = bytes(rng.choice(list(b"ACGT"), 60).astype("uint8"))
            alt = bytes(rng.choice(list(b"ACGT"), 40).astype("uint8"))
            for oh in OverhangStrategy:
                res = sw_align(ref, alt, P, oh)
                if oh == OverhangStrategy.SOFTCLIP:
                    assert res.cigar.query_length == 40
                elif oh == OverhangStrategy.INDEL:
                    assert res.cigar.query_length == 40
                    assert res.cigar.reference_length == 60


@pytest.mark.skipif(not sw_native.available(), reason="no native sw")
class TestNativeVsPython:
    def test_agree_on_random_cases(self):
        rng = np.random.default_rng(42)
        for trial in range(25):
            L = int(rng.integers(10, 80))
            ref = bytes(rng.choice(list(b"ACGT"), L).astype("uint8"))
            # derive alt by mutation so alignments are meaningful
            alt = bytearray(ref[int(rng.integers(0, 5)):])
            for _ in range(int(rng.integers(0, 4))):
                i = int(rng.integers(0, len(alt)))
                alt[i] = int(rng.choice(list(b"ACGT")))
            if rng.random() < 0.5 and len(alt) > 12:
                i = int(rng.integers(1, len(alt) - 6))
                del alt[i:i + int(rng.integers(1, 5))]
            alt = bytes(alt)
            if not alt:
                continue
            for oh in OverhangStrategy:
                for params in (P, DANGLING_END_PARAMS,
                               READ_TO_HAPLOTYPE_PARAMS):
                    got_ops, got_lens, got_off = sw_native.align(
                        ref, alt, params, int(oh))
                    want = _sw_align_python(ref, alt, params, oh)
                    want_ops = [int(op) for op, _ in want.cigar]
                    want_lens = [n for _, n in want.cigar]
                    assert list(got_ops) == want_ops, (ref, alt, oh)
                    assert list(got_lens) == want_lens, (ref, alt, oh)
                    assert got_off == want.alignment_offset


class TestParams:
    def test_param_sets_from_reference(self):
        assert DANGLING_END_PARAMS == SWParams(25, -50, -110, -6)
        assert HAPLOTYPE_TO_REFERENCE_PARAMS == SWParams(200, -150, -260, -11)
        assert READ_TO_HAPLOTYPE_PARAMS == SWParams(10, -15, -30, -5)
