"""Genotyping core: enumeration, GLs, AF model, event maps, engine."""

import numpy as np
import pytest

from rovaca_tpu.assembly.assembler import Haplotype
from rovaca_tpu.genotype import (annotations, assembly_utils, event_map,
                                 genotype_alleles as ga, subsetting)
from rovaca_tpu.genotype.af_calc import AlleleFrequencyCalculator
from rovaca_tpu.genotype.engine import GenotypingArgs, GermlineGenotypingEngine
from rovaca_tpu.genotype.likelihood_calc import (genotype_log10_likelihoods,
                                                 gls_to_pls, gq_from_pls)
from rovaca_tpu.genotype.likelihoods import AlleleLikelihoods
from rovaca_tpu.genotype.variant import (Allele, Genotype, NO_CALL, SPAN_DEL,
                                         Variant)
from rovaca_tpu.reads.cigar import Cigar, CigarOp
from rovaca_tpu.reads.record import ReadRecord


def hap(bases, cigar, window_start=0, is_ref=False):
    return Haplotype(bases=bases.encode() if isinstance(bases, str) else bases,
                     is_ref=is_ref, score=0.0,
                     cigar=Cigar.from_string(cigar),
                     window_start=window_start)


def make_read(pos, length=30, name=None, mapq=60, reverse=False):
    flag = 0x10 if reverse else 0
    return ReadRecord(name=name or f"r{pos}", flag=flag, ref_id=0, pos=pos,
                      mapping_quality=mapq, cigar=f"{length}M",
                      bases="A" * length, quals=[30] * length, contig="chr1")


class TestGenotypeEnumeration:
    def test_diploid_biallelic_order(self):
        gts = ga.enumerate_genotypes(2, 2)
        assert gts == ((0, 0), (0, 1), (1, 1))

    def test_diploid_triallelic_order(self):
        gts = ga.enumerate_genotypes(2, 3)
        assert gts == ((0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2))

    def test_counts(self):
        assert ga.genotype_count(2, 2) == 3
        assert ga.genotype_count(2, 6) == 21
        assert ga.genotype_count(3, 2) == 4

    def test_index_roundtrip(self):
        for ploidy in (1, 2, 3):
            for n in (2, 3, 4):
                for i, g in enumerate(ga.enumerate_genotypes(ploidy, n)):
                    assert ga.genotype_index(g) == i

    def test_allele_counts_to_index(self):
        # 0/1 in diploid biallelic is index 1
        assert ga.allele_counts_to_index((0, 1, 1, 1)) == 1
        assert ga.allele_counts_to_index((1, 2)) == 2

    def test_log10_combinations(self):
        combs = ga.log10_combination_counts(2, 2)
        np.testing.assert_allclose(combs, [0.0, np.log10(2), 0.0], atol=1e-12)


class TestGenotypeLikelihoods:
    def test_hom_ref_reads(self):
        # 10 reads all strongly supporting allele 0
        lik = np.array([[0.0] * 10, [-5.0] * 10])
        gls = genotype_log10_likelihoods(2, lik)
        assert np.argmax(gls) == 0
        np.testing.assert_allclose(gls[0], 0.0, atol=1e-10)

    def test_het_reads(self):
        lik = np.array([[0.0] * 5 + [-5.0] * 5,
                        [-5.0] * 5 + [0.0] * 5])
        gls = genotype_log10_likelihoods(2, lik)
        assert np.argmax(gls) == 1  # 0/1 most likely
        # het likelihood: each read log10(0.5*(1+1e-5)) ~ -0.301
        np.testing.assert_allclose(gls[1], 10 * np.log10(0.5 * (1 + 1e-5)),
                                   rtol=1e-6)

    def test_pls_and_gq(self):
        gls = np.array([-10.0, 0.0, -2.0])
        pls = gls_to_pls(gls)
        np.testing.assert_array_equal(pls, [100, 0, 20])
        assert gq_from_pls(pls) == 20


class TestAFCalculator:
    def _genotype(self, gls):
        return Genotype(alleles=[NO_CALL, NO_CALL],
                        log10_likelihoods=list(gls))

    def test_hom_ref_site_fails_threshold(self):
        calc = AlleleFrequencyCalculator.make_calculator()
        alleles = [Allele(b"A", True), Allele(b"C")]
        g = self._genotype([0.0, -5.0, -12.0])
        res = calc.calculate(alleles, [g])
        assert res.log10_p_no_variant > -1.0  # ref very likely
        assert not res.passes_threshold(alleles[1], 30)

    def test_het_site_passes(self):
        calc = AlleleFrequencyCalculator.make_calculator()
        alleles = [Allele(b"A", True), Allele(b"C")]
        g = self._genotype([-20.0, 0.0, -18.0])
        res = calc.calculate(alleles, [g])
        assert res.log10_p_no_variant < -9
        assert res.passes_threshold(alleles[1], 30)
        assert res.alt_allele_mle_counts == [1]

    def test_hom_alt_mle_two(self):
        calc = AlleleFrequencyCalculator.make_calculator()
        alleles = [Allele(b"A", True), Allele(b"C")]
        g = self._genotype([-40.0, -20.0, 0.0])
        res = calc.calculate(alleles, [g])
        assert res.alt_allele_mle_counts == [2]


class TestEventMap:
    REF = b"ACGTACGTACGTACGTACGT"

    def test_snp_event(self):
        h = hap(b"ACGTACGAACGTACGTACGT", "20M")
        em = event_map.EventMap.from_haplotype(h, self.REF, 100)
        assert list(em.events) == [107]
        vc = em.events[107]
        assert vc.ref.bases == b"T" and vc.alts[0].bases == b"A"

    def test_deletion_event(self):
        h = hap(self.REF[:8] + self.REF[11:], "8M3D9M")
        em = event_map.EventMap.from_haplotype(h, self.REF, 100)
        assert list(em.events) == [107]
        vc = em.events[107]
        assert vc.ref.bases == self.REF[7:11]
        assert vc.alts[0].bases == self.REF[7:8]
        assert vc.stop == 110

    def test_insertion_event(self):
        h = hap(self.REF[:8] + b"TTT" + self.REF[8:], "8M3I12M")
        em = event_map.EventMap.from_haplotype(h, self.REF, 100)
        vc = em.events[107]
        assert vc.ref.bases == self.REF[7:8]
        assert vc.alts[0].bases == self.REF[7:8] + b"TTT"

    def test_leading_insertion_skipped(self):
        h = hap(b"TTT" + self.REF, "3I20M")
        em = event_map.EventMap.from_haplotype(h, self.REF, 100)
        assert em.events == {}

    def test_overlapping_events_spanning_del(self):
        h = hap(self.REF[:8] + self.REF[13:], "8M5D7M")
        em = event_map.EventMap.from_haplotype(h, self.REF, 100)
        assert em.get_overlapping_events(109)  # inside the deletion
        assert not em.get_overlapping_events(115)


class TestMerging:
    def test_simple_merge_extends_alts(self):
        ref_short = Allele(b"A", True)
        snp = Variant(contig="c", start=10, stop=10,
                      alleles=[ref_short, Allele(b"G")])
        ref_long = Allele(b"ACG", True)
        deletion = Variant(contig="c", start=10, stop=12,
                           alleles=[ref_long, Allele(b"A")])
        merged = assembly_utils.simple_merge([snp, deletion])
        assert merged.ref.bases == b"ACG"
        assert [a.bases for a in merged.alts] == [b"GCG", b"A"]

    def test_allele_mapper(self):
        ref = b"ACGTACGTACGTACGTACGT"
        h_ref = hap(ref, "20M", is_ref=True)
        h_snp = hap(b"ACGTACGAACGTACGTACGT", "20M")
        for i, h in enumerate((h_ref, h_snp)):
            h.event_map = event_map.EventMap.from_haplotype(h, ref, 100, 0, i)
        events = assembly_utils.get_variant_contexts_from_active_haplotypes(
            107, [h_ref, h_snp], True)
        merged = assembly_utils.simple_merge(events)
        mapper = assembly_utils.create_allele_mapper([h_ref, h_snp], merged,
                                                     107, True)
        assert mapper[merged.ref] == [h_ref]
        assert mapper[merged.alts[0]] == [h_snp]


class TestSubsetting:
    def test_most_likely_alleles(self):
        alleles = [Allele(b"A", True), Allele(b"C"), Allele(b"G")]
        # het A/C strongly supported
        gls = [-20.0, 0.0, -18.0, -25.0, -22.0, -30.0]
        g = Genotype(alleles=[NO_CALL] * 2, log10_likelihoods=gls)
        keep = subsetting.calculate_most_likely_alleles(alleles, [g], 2, 1)
        assert [a.bases for a in keep] == [b"A", b"C"]

    def test_subset_alleles_assigns_gt(self):
        alleles = [Allele(b"A", True), Allele(b"C"), Allele(b"G")]
        gls = [-20.0, 0.0, -18.0, -25.0, -22.0, -30.0]
        g = Genotype(alleles=[NO_CALL] * 2, log10_likelihoods=gls)
        new = subsetting.subset_alleles([g], 2, alleles, alleles[:2])
        assert len(new) == 1
        gt = new[0]
        assert [a.bases for a in gt.alleles] == [b"A", b"C"]
        assert gt.pl[1] == 0


def _engine_case(ref, alt_hap_bases, alt_cigar, n_ref=10, n_alt=10,
                 gvcf=False):
    """Build hap likelihoods for a clean het site."""
    h_ref = hap(ref, f"{len(ref)}M", is_ref=True)
    h_alt = hap(alt_hap_bases, alt_cigar)
    reads = [make_read(100, 30, name=f"rr{i}", reverse=(i % 2 == 0))
             for i in range(n_ref)] + \
            [make_read(100, 30, name=f"ra{i}", reverse=(i % 2 == 0))
             for i in range(n_alt)]
    mat = np.zeros((2, n_ref + n_alt))
    mat[0, :n_ref] = -0.1
    mat[0, n_ref:] = -8.0
    mat[1, :n_ref] = -8.0
    mat[1, n_ref:] = -0.1
    lik = AlleleLikelihoods([h_ref, h_alt], reads, mat)
    eng = GermlineGenotypingEngine(GenotypingArgs(gvcf_mode=gvcf))
    return eng, lik


class TestEngine:
    REF = b"ACGTACGTACGTACGTACGTACGTACGTAC"  # 30bp

    def test_het_snp_call(self):
        alt = bytearray(self.REF)
        alt[15] = ord("C") if alt[15] != ord("C") else ord("G")
        eng, lik = _engine_case(self.REF, bytes(alt), "30M")
        calls, called_haps = eng.assign_genotype_likelihoods(
            lik, self.REF, 100, 100, 129)
        assert len(calls) == 1
        call = calls[0]
        assert call.start == 115
        assert call.qual > 30
        g = call.genotypes[0]
        assert g.is_het()
        assert g.pl[1] == 0
        assert sorted(g.ad) == sorted([10, 10])
        assert call.attributes["AC"] == [1]
        assert call.attributes["AN"] == 2
        assert "MQ" in call.attributes
        assert len(called_haps) == 2

    def test_hom_ref_no_call(self):
        eng, lik = _engine_case(self.REF, bytes(self.REF), "30M")
        # both haps identical to ref -> no events -> no calls
        calls, _ = eng.assign_genotype_likelihoods(lik, self.REF, 100, 100,
                                                   129)
        assert calls == []

    def test_deletion_call(self):
        alt = self.REF[:15] + self.REF[18:]
        eng, lik = _engine_case(self.REF, alt, "15M3D12M")
        calls, _ = eng.assign_genotype_likelihoods(lik, self.REF, 100, 100,
                                                   129)
        assert len(calls) == 1
        call = calls[0]
        assert call.start == 114
        assert len(call.ref.bases) == 4
        assert len(call.alts[0].bases) == 1

    def test_low_support_filtered(self):
        alt = bytearray(self.REF)
        alt[15] = ord("C") if alt[15] != ord("C") else ord("G")
        # 19 ref reads, 1 weak alt read -> shouldn't reach QUAL 30
        eng, lik = _engine_case(self.REF, bytes(alt), "30M", n_ref=19,
                                n_alt=1)
        lik.matrix[1, 19] = -0.5
        calls, _ = eng.assign_genotype_likelihoods(lik, self.REF, 100, 100,
                                                   129)
        assert calls == []

    def test_filtered_reads_augment_depth(self):
        # filtered (non-passing) reads overlapping the call are appended to
        # the annotation likelihoods with 0.0 likelihood: DP counts them,
        # AD does not (they are uninformative)
        # (germline_genotying_engine.cpp:606-663)
        alt = bytearray(self.REF)
        alt[15] = ord("C") if alt[15] != ord("C") else ord("G")
        eng, lik = _engine_case(self.REF, bytes(alt), "30M")
        extra = [make_read(100, 30, name=f"fx{i}") for i in range(5)]
        base_calls, _ = eng.assign_genotype_likelihoods(
            lik, self.REF, 100, 100, 129)
        calls, _ = eng.assign_genotype_likelihoods(
            lik, self.REF, 100, 100, 129, filtered_reads=extra)
        assert len(calls) == 1
        dp0 = base_calls[0].attributes["DP"]
        dp1 = calls[0].attributes["DP"]
        assert dp1 == dp0 + 5
        assert calls[0].genotypes[0].ad == base_calls[0].genotypes[0].ad
        # a filtered read outside the overlap window contributes nothing
        far = [make_read(400, 30, name="far")]
        calls2, _ = eng.assign_genotype_likelihoods(
            lik, self.REF, 100, 100, 129, filtered_reads=far)
        assert calls2[0].attributes["DP"] == dp0

    def test_gvcf_adds_non_ref(self):
        alt = bytearray(self.REF)
        alt[15] = ord("C") if alt[15] != ord("C") else ord("G")
        eng, lik = _engine_case(self.REF, bytes(alt), "30M", gvcf=True)
        calls, _ = eng.assign_genotype_likelihoods(lik, self.REF, 100, 100,
                                                   129)
        assert len(calls) == 1
        assert calls[0].alleles[-1].bases == b"<NON_REF>"


class TestAnnotations:
    def test_rank_sum_balanced(self):
        z = annotations._mann_whitney_z(np.array([10.0, 20, 30]),
                                        np.array([10.0, 20, 30]))
        assert abs(z) < 0.01

    def test_rank_sum_exact_small_extreme(self):
        # both groups < 10: exact permutation mid-p. Fully separated 3v3:
        # p = (0.5)/C(6,3) = 0.025 -> z = Phi^-1(0.025) = -1.96
        z = annotations._mann_whitney_z(np.array([1.0, 2, 3]),
                                        np.array([10.0, 11, 12]))
        assert z == pytest.approx(-1.96, abs=0.001)
        z = annotations._mann_whitney_z(np.array([10.0, 11, 12]),
                                        np.array([1.0, 2, 3]))
        assert z == pytest.approx(1.96, abs=0.001)

    def test_rank_sum_normal_continuity(self):
        # either group >= 10: normal approximation with -0.5 continuity
        # correction (FIRST_DOMINATES) and tie-adjusted sigma
        alt = np.array([20.0] * 6 + [25.0] * 6)
        ref = np.array([30.0] * 8 + [28.0] * 4)
        u = 0.0  # alt strictly below ref
        nties = (6**3 - 6) + (6**3 - 6) + (8**3 - 8) + (4**3 - 4)
        n1 = n2 = 12
        sigma = np.sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                                          - nties / ((n1 + n2) * (n1 + n2 - 1))))
        want = (u - n1 * n2 / 2.0 + 0.5) / sigma
        z = annotations._mann_whitney_z(alt, ref)
        assert z == pytest.approx(want, abs=0.001)

    def test_rank_sum_all_tied_is_zero(self):
        z = annotations._mann_whitney_z(np.array([30.0] * 12),
                                        np.array([30.0] * 12))
        assert z == 0.0

    def test_excess_het_single_het(self):
        # the reference takes the FULL observed bin (excess_het.cpp:123),
        # not GATK's mid-p half: one het sample gives p=1 -> 0.0
        v = Variant(contig="c", start=0, stop=0,
                    alleles=[Allele(b"A", True), Allele(b"C")],
                    genotypes=[Genotype(alleles=[Allele(b"A", True),
                                                 Allele(b"C")])])
        eh = annotations.excess_het(v)
        assert eh == pytest.approx(0.0, abs=1e-9)

    def test_excess_het_multi_sample(self):
        # 3 samples: 2 het + 1 hom-ref; reference full-bin exact test
        # (verified against excess_het.cpp:63-131 by hand: rare=2,n=3,
        # mid=2, probs[2]=1, probs[0]=1/(4*2*1)... -> p(het>=2)=4/5)
        ref, alt = Allele(b"A", True), Allele(b"C")
        gts = [Genotype(alleles=[ref, alt]), Genotype(alleles=[ref, alt]),
               Genotype(alleles=[ref, ref])]
        v = Variant(contig="c", start=0, stop=0, alleles=[ref, alt],
                    genotypes=gts)
        eh = annotations.excess_het(v)
        assert eh == pytest.approx(-10 * np.log10(0.8), abs=1e-6)


def _informative_oracle(read, read_start, ref_bytes, ref_start):
    """Direct loop translation of the reference's
    read_has_no_plausible_ideals_of_size + traverse_end_of_read_for_indel_
    mismatches (reference_confidence_model.cpp:244-392) — the unambiguous
    scalar oracle for the vectorized informative_set."""
    import numpy as np
    from rovaca_tpu.pipeline.ref_confidence import one_to_one, _MASK

    GAP = 45
    K = 10
    raw_len = len(read.bases)
    info = np.zeros(raw_len, dtype=bool)
    ref_len = len(ref_bytes)
    if raw_len - read_start < K or ref_len - ref_start < K:
        return info
    secondary = raw_len - K
    gb, gq = one_to_one(read)
    glen = len(gb)
    if glen - read_start <= K:
        return info
    if glen < ref_len - ref_start + read_start + 1:
        last_rel, ref_shorter = glen - K, False
    else:
        last_rel = ref_len - ref_start + read_start - K + 1
        ref_shorter = True

    def mism(rb, fb):
        return (_MASK[rb] & _MASK[int(ref_bytes[fb])]) == 0 and rb != GAP

    n = min(glen - read_start, ref_len - ref_start)
    baseline = [0] * n
    s = 0
    for i in range(n - 1, -1, -1):
        if mism(gb[read_start + i], ref_start + i):
            s += int(gq[read_start + i])
        baseline[i] = s

    marked = np.zeros(glen, dtype=bool)
    for size in range(1, K + 1):
        for insertion in (False, True):
            ins = size if insertion else 0
            dele = 0 if insertion else size
            first = glen - read_start - ins
            second = ref_len - ref_start - dele
            nb = min(first, second)
            bqs = 0
            ro, fo = nb + ins - 1, nb + dele - 1
            while ro >= 0 and fo >= 0:
                if mism(gb[read_start + ro], ref_start + fo):
                    bqs += int(gq[read_start + ro])
                    if bqs > baseline[0]:
                        break
                site = min(ro, fo)
                if (gb[read_start + site] != GAP
                        and read_start + site < last_rel
                        and read_start + site <= secondary
                        and baseline[site] >= bqs):
                    marked[read_start + site] = True
                ro -= 1
                fo -= 1
    if last_rel <= secondary:
        marked[:last_rel] = ~marked[:last_rel]
        if ref_shorter:
            marked[last_rel - 1] = False
    else:
        hi = min(secondary + 1, glen)
        marked[:hi] = ~marked[:hi]
    out = np.zeros(raw_len, dtype=bool)
    m = min(raw_len, glen)
    out[:m] = marked[:m]
    return out


class TestInformativeSetExact:
    """Vectorized informative_set must equal the scalar reference oracle."""

    def test_matches_oracle(self):
        import numpy as np
        from rovaca_tpu.pipeline.ref_confidence import informative_set
        from rovaca_tpu.reads.record import ReadRecord

        rng = np.random.default_rng(11)
        ref = rng.choice(list(b"ACGTN"), p=[.24, .24, .24, .24, .04],
                         size=600).astype(np.uint8)
        for t in range(60):
            n = int(rng.integers(5, 120))
            start = int(rng.integers(0, 400))
            # build a read with optional indel in the middle
            kind = t % 4
            if kind == 0 or n < 40:
                cigar, qlen = f"{n}M", n
            elif kind == 1:
                d = int(rng.integers(1, 12))
                cigar, qlen = f"{n//2}M{d}D{n - n//2}M", n
            elif kind == 2:
                i = int(rng.integers(1, 12))
                cigar = f"{n//2}M{i}I{n - n//2 - i}M" \
                    if n - n//2 - i > 0 else f"{n}M"
                qlen = n
            else:
                s = int(rng.integers(1, 8))
                cigar = f"{s}S{n - s}M"
                qlen = n
            rb = rng.choice(list(b"ACGT"), size=qlen).astype(np.uint8)
            # mostly ref-matching so baselines are nontrivial
            m = min(qlen, 600 - start)
            rb[:m] = ref[start:start + m]
            for _ in range(int(rng.integers(0, 6))):
                rb[int(rng.integers(0, qlen))] = rng.choice(list(b"ACGT"))
            rq = rng.integers(2, 60, size=qlen).astype(np.uint8)
            read = ReadRecord("r", 0, 0, start, 60, cigar, bytes(rb), rq)
            read_start = int(rng.integers(0, max(1, qlen - 15)))
            ref_start = start + read_start
            if ref_start >= 600:
                continue
            got = informative_set(read, read_start, ref, ref_start)
            want = _informative_oracle(read, read_start, ref, ref_start)
            np.testing.assert_array_equal(got, want, err_msg=f"case {t}")
