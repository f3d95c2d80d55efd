"""Activity model + band-pass + region cutting tests."""

import numpy as np

from rovaca_tpu import constants as C
from rovaca_tpu.pipeline import activity as act
from rovaca_tpu.reads.record import ReadRecord


def make_read(pos, bases, quals=None, cigar=None, mapq=60, flag=0,
              mate_pos=-1, tlen=0):
    if quals is None:
        quals = [30] * len(bases)
    if cigar is None:
        cigar = f"{len(bases)}M"
    return ReadRecord(name=f"r{pos}", flag=flag, ref_id=0, pos=pos,
                      mapping_quality=mapq, cigar=cigar, bases=bases,
                      quals=quals, mate_pos=mate_pos, tlen=tlen,
                      contig="chr1")


REF = b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT" * 10  # 400bp


def window(start=0, end=400):
    L = end - start
    return act.ActivityWindow(
        start=start, end=end,
        hist=np.zeros((2, L, act.MAX_QUAL_BIN), dtype=np.int32),
        hq_sum=np.zeros(L), hq_n=np.zeros(L, dtype=np.int64))


class TestAccumulate:
    def test_matching_read_all_ref(self):
        win = window()
        read = make_read(10, REF[10:40].decode())
        act.accumulate_read(win, read, REF)
        assert win.hist[1].sum() == 30      # all reference status
        assert win.hist[0].sum() == 0

    def test_snp_counted_as_variant(self):
        win = window()
        bases = bytearray(REF[10:40])
        bases[15] = ord("A") if bases[15] != ord("A") else ord("C")
        act.accumulate_read(win, make_read(10, bytes(bases).decode()), REF)
        assert win.hist[0, 25].sum() == 1   # variant at pos 10+15
        assert win.hist[1].sum() == 29

    def test_deletion_positions_variant(self):
        win = window()
        read = make_read(10, REF[10:20].decode() + REF[25:35].decode(),
                         cigar="10M5D10M")
        act.accumulate_read(win, read, REF)
        # 5 deleted positions get qual-30 variant evidence; block-edge bases
        # adjacent to the deletion are also flagged variant
        assert win.hist[0, 20:25, act.REF_MODEL_DELETION_QUAL].sum() == 5
        assert win.hist[0, 19].sum() == 1   # base before deletion
        assert win.hist[0, 25].sum() == 1   # base after deletion

    def test_softclip_edge_flags_variant_and_hq(self):
        win = window()
        bases = ("TTTTT" + REF[15:40].decode())
        quals = [35] * 30
        read = make_read(10, bases, quals, cigar="5S25M")
        read.pos = 15
        act.accumulate_read(win, read, REF)
        assert win.hist[0, 15].sum() == 1   # first aligned base after clip
        assert win.hq_n[15] == 1
        assert win.hq_sum[15] == 5          # five hq clipped bases

    def test_low_qual_excluded_from_gl(self):
        win = window()
        read = make_read(10, REF[10:40].decode(), quals=[5] * 30)
        act.accumulate_read(win, read, REF)
        activity, _ = act.compute_activity(win)
        assert np.all(activity == 0.0)


class TestActivityValue:
    def test_hom_ref_site_inactive(self):
        win = window()
        for i in range(20):
            act.accumulate_read(win, make_read(10, REF[10:40].decode()), REF)
        activity, _ = act.compute_activity(win)
        assert np.all(activity == 0.0)

    def test_het_snp_site_active(self):
        win = window()
        alt = bytearray(REF[10:40])
        alt[10] = ord("C") if alt[10] != ord("C") else ord("G")
        for i in range(10):
            act.accumulate_read(win, make_read(10, REF[10:40].decode()), REF)
            act.accumulate_read(win, make_read(10, bytes(alt).decode()), REF)
        activity, repeat = act.compute_activity(win)
        assert activity[20] > 0.9
        assert repeat[20] == 1
        assert activity[5] == 0.0

    def test_hom_alt_site_active(self):
        win = window()
        alt = bytearray(REF[10:40])
        alt[10] = ord("C") if alt[10] != ord("C") else ord("G")
        for i in range(20):
            act.accumulate_read(win, make_read(10, bytes(alt).decode()), REF)
        activity, _ = act.compute_activity(win)
        assert activity[20] > 0.99


class TestSmoothing:
    def test_kernel_matches_reference_constants(self):
        k = act.gaussian_kernel()
        assert k.shape == (101,)
        np.testing.assert_allclose(k.sum(), 1.0)
        assert k[50] == k.max()
        # sigma=17: value at offset 17 should be ~exp(-0.5) of peak
        np.testing.assert_allclose(k[50 + 17] / k[50], np.exp(-0.5), rtol=1e-6)

    def test_smear_spreads(self):
        a = np.zeros(200)
        a[100] = 1.0
        rep = np.ones(200, dtype=np.int64)
        out = act.smooth_activity(a, rep)
        assert out[100] == act.gaussian_kernel()[50]
        assert out[60] > 0
        assert out[40] == 0.0

    def test_target_mask_stops_smear(self):
        a = np.zeros(200)
        a[100] = 1.0
        rep = np.ones(200, dtype=np.int64)
        mask = np.ones(200, dtype=bool)
        mask[90] = False  # off-target at 90 blocks leftward smear past it
        out = act.smooth_activity(a, rep, target_mask=mask)
        assert out[95] > 0
        assert out[89] == 0.0
        assert out[85] == 0.0


class TestRegionCut:
    def test_single_active_region(self):
        probs = np.zeros(500)
        probs[200:240] = 1.0
        regions = act.cut_regions(probs, "chr1", 0, emit_inactive=False)
        assert len(regions) == 1
        r = regions[0]
        assert (r.start, r.end, r.is_active) == (200, 239, True)

    def test_emit_inactive_covers_everything(self):
        probs = np.zeros(700)
        probs[300:350] = 1.0
        regions = act.cut_regions(probs, "chr1", 0, emit_inactive=True)
        spans = [(r.start, r.end, r.is_active) for r in regions]
        # contiguous cover, alternating activity, inactive split at max size
        assert spans[0] == (0, 299, False)
        assert spans[1] == (300, 349, True)
        covered = sum(r.end - r.start + 1 for r in regions)
        assert covered == 700
        for r in regions:
            assert r.span <= C.REGION_MAX_SIZE

    def test_oversized_active_region_split(self):
        probs = np.zeros(900)
        probs[100:800] = 1.0
        probs[350] = 0.5  # local minimum inside the backward search window
        probs[349] = 0.8
        probs[351] = 0.8
        regions = act.cut_regions(probs, "chr1", 0, emit_inactive=False)
        assert all(r.span <= C.REGION_MAX_SIZE for r in regions)
        assert any(r.end == 350 for r in regions)
        total = sum(r.span for r in regions)
        assert total == 700

    def test_window_offset(self):
        probs = np.zeros(300)
        probs[50:80] = 1.0
        regions = act.cut_regions(probs, "chr2", 1000, emit_inactive=False)
        assert regions[0].start == 1050 and regions[0].end == 1079


class TestEndToEnd:
    def test_het_snp_becomes_region(self):
        alt = bytearray(REF[100:160])
        alt[30] = ord("C") if alt[30] != ord("C") else ord("G")
        reads = []
        for i in range(15):
            reads.append(make_read(100, REF[100:160].decode(),
                                   quals=[35] * 60))
            reads.append(make_read(100, bytes(alt).decode(), quals=[35] * 60))
        regions = act.find_active_regions(reads, REF, "chr1", 0, 400)
        assert len(regions) == 1
        r = regions[0]
        assert r.is_active
        assert r.start <= 130 <= r.end
        assert r.span >= C.REGION_MIN_SIZE

    def test_no_variation_no_regions(self):
        reads = [make_read(100, REF[100:160].decode()) for _ in range(20)]
        regions = act.find_active_regions(reads, REF, "chr1", 0, 400)
        assert regions == []


class TestBatchedAccumulate:
    """accumulate_reads (window-batched fast path) must be bit-identical to
    per-read accumulate_read over randomized cigar shapes."""

    def _random_reads(self, rng, n=120):
        reads = []
        for _ in range(n):
            pos = int(rng.integers(0, 350))
            mlen = int(rng.integers(1, 40))
            kind = int(rng.integers(0, 7))
            bases = bytearray(REF[pos:pos + mlen])
            for _ in range(int(rng.integers(0, 3))):   # sprinkle mismatches
                i = int(rng.integers(0, mlen))
                bases[i] = ord("ACGT"[int(rng.integers(0, 4))])
            quals = list(rng.integers(2, 45, size=mlen))
            cigar = f"{mlen}M"
            if kind == 1 and mlen > 4:                 # leading softclip
                cigar = f"3S{mlen - 3}M"
            elif kind == 2 and mlen > 4:               # trailing softclip
                cigar = f"{mlen - 3}M3S"
            elif kind == 3 and mlen > 8:               # both clips
                cigar = f"2S{mlen - 5}M3S"
            elif kind == 4 and mlen > 10:              # mid deletion
                cigar = f"{mlen // 2}M2D{mlen - mlen // 2}M"
            elif kind == 5 and mlen > 10:              # mid insertion
                cigar = f"{mlen // 2}M2I{mlen - mlen // 2 - 2}M"
            flag, mate_pos, tlen = 0, -1, 0
            if kind == 6:                              # adaptor-bounded pair
                flag = 0x1 | 0x20
                mate_pos = pos + 5
                tlen = 40
            reads.append(make_read(pos, bytes(bases).decode(), quals=quals,
                                   cigar=cigar, flag=flag, mate_pos=mate_pos,
                                   tlen=tlen))
        return reads

    def test_matches_per_read(self):
        rng = np.random.default_rng(7)
        reads = self._random_reads(rng)
        w_ref, w_new = window(), window()
        for r in reads:
            act.accumulate_read(w_ref, r, REF)
        act.accumulate_reads(w_new, reads, REF)
        np.testing.assert_array_equal(w_ref.hist, w_new.hist)
        np.testing.assert_array_equal(w_ref.hq_n, w_new.hq_n)
        np.testing.assert_allclose(w_ref.hq_sum, w_new.hq_sum)

    def test_matches_on_refwindow_view(self):
        # nonzero view offset: exercises the ridx = starts - ref_off
        # arithmetic and (via reads starting before / ending after the
        # view) the too-small-view fallback branch in accumulate_reads.
        # Window [120,358) sits well inside view [50,360), so every
        # in-window base is ref-covered and the result must be identical
        # to the full-contig per-read baseline.
        from rovaca_tpu.utils.refwindow import RefWindow
        rng = np.random.default_rng(11)
        reads = self._random_reads(rng, n=60)
        # straddle the view start (fallback: pos - ref_off < 0)
        reads.append(make_read(45, REF[45:95].decode(),
                               quals=list(rng.integers(2, 45, size=50)),
                               cigar="50M"))
        # extend past the view end (fallback: pos + mlen > view end)
        reads.append(make_read(330, REF[330:375].decode(),
                               quals=list(rng.integers(2, 45, size=45)),
                               cigar="45M"))
        view = RefWindow(REF[50:360], 50)
        w_ref, w_new = window(120, 358), window(120, 358)
        for r in reads:
            act.accumulate_read(w_ref, r, REF)
        act.accumulate_reads(w_new, reads, view)
        np.testing.assert_array_equal(w_ref.hist, w_new.hist)
        np.testing.assert_array_equal(w_ref.hq_n, w_new.hq_n)
        np.testing.assert_allclose(w_ref.hq_sum, w_new.hq_sum)
