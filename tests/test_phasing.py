"""Physical phasing: haplotype mapping, phase sets, PGT/PID annotation."""

from rovaca_tpu.assembly.assembler import Haplotype
from rovaca_tpu.genotype import event_map, phasing
from rovaca_tpu.genotype.variant import Allele, Genotype, NO_CALL, Variant
from rovaca_tpu.reads.cigar import Cigar


REF = b"ACGTACGTACGTACGTACGTACGTACGTAC"  # 30bp


def hap(bases, is_ref=False, idx=0):
    h = Haplotype(bases=bases, is_ref=is_ref, score=0.0,
                  cigar=Cigar.from_string(f"{len(bases)}M"), window_start=100)
    h.event_map = event_map.EventMap.from_haplotype(h, REF, 100, 0, idx)
    return h


def call_at(start, ref_b, alt_b):
    return Variant(contig="c", start=start, stop=start + len(ref_b) - 1,
                   alleles=[Allele(ref_b, True), Allele(alt_b)],
                   genotypes=[Genotype(alleles=[NO_CALL, NO_CALL])])


def mutate(pos, base):
    b = bytearray(REF)
    b[pos] = ord(base)
    return bytes(b)


class TestPhasing:
    def test_cis_variants_same_pgt(self):
        # both SNPs on the same alt haplotype -> 0|1 / 0|1
        alt = bytearray(REF)
        alt[5] = ord("C") if alt[5] != ord("C") else ord("G")
        alt[20] = ord("C") if alt[20] != ord("C") else ord("G")
        h_ref = hap(REF, is_ref=True)
        h_alt = hap(bytes(alt), idx=1)
        calls = [call_at(105, REF[5:6], bytes(alt[5:6])),
                 call_at(120, REF[20:21], bytes(alt[20:21]))]
        out = phasing.phase_calls(calls, [h_ref, h_alt])
        g0, g1 = out[0].genotypes[0], out[1].genotypes[0]
        assert g0.attributes["PGT"] == "0|1"
        assert g1.attributes["PGT"] == "0|1"
        assert g0.attributes["PID"] == g1.attributes["PID"]

    def test_trans_variants_opposite_pgt(self):
        # SNPs on different alt haplotypes -> 0|1 / 1|0
        h1 = hap(mutate(5, "C") if REF[5] != ord("C") else mutate(5, "G"),
                 idx=0)
        h2 = hap(mutate(20, "C") if REF[20] != ord("C") else mutate(20, "G"),
                 idx=1)
        a5 = h1.bases[5:6]
        a20 = h2.bases[20:21]
        calls = [call_at(105, REF[5:6], a5), call_at(120, REF[20:21], a20)]
        out = phasing.phase_calls(calls, [h1, h2])
        g0, g1 = out[0].genotypes[0], out[1].genotypes[0]
        assert g0.attributes["PGT"] == "0|1"
        assert g1.attributes["PGT"] == "1|0"
        assert g0.attributes["PID"] == g1.attributes["PID"]

    def test_single_call_unphased(self):
        h1 = hap(mutate(5, "C") if REF[5] != ord("C") else mutate(5, "G"))
        calls = [call_at(105, REF[5:6], h1.bases[5:6])]
        out = phasing.phase_calls(calls, [h1])
        assert "PGT" not in out[0].genotypes[0].attributes
