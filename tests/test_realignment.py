"""Read realignment through the best haplotype."""

import numpy as np

from rovaca_tpu.assembly.assembler import Haplotype
from rovaca_tpu.genotype import alignment_utils as au
from rovaca_tpu.genotype.likelihoods import AlleleLikelihoods
from rovaca_tpu.reads.cigar import Cigar
from rovaca_tpu.reads.record import ReadRecord


# non-repetitive 40bp (the SW exact-match shortcut picks the LAST occurrence,
# so periodic sequences would legitimately shift alignments)
REF = b"ACGTTGCAATCGGATCCTAGGCTTAAGCGTACCGGTATCA"


def hap(bases, cigar, is_ref=False):
    return Haplotype(bases=bases, is_ref=is_ref, score=0.0,
                     cigar=Cigar.from_string(cigar), window_start=100)


def read(bases, pos=100, cigar=None):
    return ReadRecord(name="r", flag=0, ref_id=0, pos=pos,
                      mapping_quality=60,
                      cigar=cigar or f"{len(bases)}M", bases=bases,
                      quals=[30] * len(bases), contig="c")


class TestHapToRefMap:
    def test_plain(self):
        h = hap(REF, "40M")
        m = au.hap_to_ref_map(h)
        assert m[0] == 100 and m[39] == 139

    def test_with_deletion(self):
        h = hap(REF[:10] + REF[15:], "10M5D25M")
        m = au.hap_to_ref_map(h)
        assert m[9] == 109 and m[10] == 115

    def test_with_insertion(self):
        h = hap(REF[:10] + b"TTT" + REF[10:], "10M3I30M")
        m = au.hap_to_ref_map(h)
        assert m[9] == 109
        assert m[10] == -1 and m[12] == -1   # inserted-base sentinel
        assert m[13] == 110


class TestRealign:
    def test_read_through_deletion_hap_gets_del_cigar(self):
        # hap deletes ref[110:115); a read sampled from the hap spanning the
        # deletion should get xM5DyM against the reference
        h = hap(REF[:10] + REF[15:], "10M5D25M")
        rd = read(bytes(h.bases[5:25]), pos=105)  # spans the deletion
        out = au.realign_read_to_haplotype(rd, h)
        assert "5D" in str(out.cigar)
        assert out.pos == 105
        assert out.cigar.query_length == 20

    def test_read_matching_ref_unchanged_alignment(self):
        h = hap(REF, "40M", is_ref=True)
        rd = read(REF[5:25], pos=105)
        out = au.realign_read_to_haplotype(rd, h)
        assert str(out.cigar) == "20M"
        assert out.pos == 105

    def test_best_hap_ties_go_to_ref(self):
        h_ref = hap(REF, "40M", is_ref=True)
        h_alt = hap(REF[:10] + REF[15:], "10M5D25M")
        rd = read(REF[5:25], pos=105)
        lik = AlleleLikelihoods([h_alt, h_ref], [rd],
                               np.array([[-1.0], [-1.0]]))
        au.realign_reads_to_their_best_haplotype(lik)
        assert str(lik.reads[0].cigar) == "20M"
