"""BAI index: binning math, build/load roundtrip, indexed fetch parity."""

import numpy as np
import pytest

import simdata
from rovaca_tpu.io import bai
from rovaca_tpu.io.bam import BamReader, merged_fetch


class TestBinning:
    def test_reg2bin_levels(self):
        assert bai.reg2bin(0, 1) == 4681            # finest level, window 0
        assert bai.reg2bin(16384, 16385) == 4682
        assert bai.reg2bin(0, 1 << 29) == 0          # spans everything

    def test_reg2bins_contains_reg2bin(self):
        for beg, end in [(0, 100), (123456, 130000), (0, 1 << 20),
                         ((1 << 28), (1 << 28) + 5)]:
            assert bai.reg2bin(beg, end) in bai.reg2bins(beg, end)


@pytest.fixture(scope="module")
def indexed_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bai")
    rng = np.random.default_rng(11)
    length = 200_000
    ref = simdata.random_ref(rng, length)
    reads = simdata.simulate_reads(rng, ref, ref, "chr1", 4000)
    path = str(tmp / "t.bam")
    simdata.write_test_bam(path, reads, "chr1", length)
    bai.build_index(path)
    return path, length


class TestIndex:
    def test_roundtrip_load(self, indexed_bam):
        path, _ = indexed_bam
        idx = bai.BaiIndex.load(path + ".bai")
        assert len(idx.bins) == 1
        assert bai.PSEUDO_BIN in idx.bins[0]

    def test_fetch_matches_sequential(self, indexed_bam):
        path, length = indexed_bam
        rd = BamReader(path)
        for beg, end in [(50_000, 60_000), (0, 100), (length - 300, length),
                         (0, length)]:
            seq = [(r.name, r.pos) for r in BamReader(path)
                   if r.pos < end and r.end > beg]
            got = [(r.name, r.pos) for r in rd.fetch("chr1", beg, end)]
            assert got == seq

    def test_fetch_empty_interval(self, indexed_bam):
        path, length = indexed_bam
        rd = BamReader(path)
        assert list(rd.fetch("chr1", 0, 0)) == []
        assert list(rd.fetch("chrMISSING", 0, 100)) == []

    def test_fetch_without_index_raises(self, tmp_path):
        rng = np.random.default_rng(1)
        ref = simdata.random_ref(rng, 5000)
        reads = simdata.simulate_reads(rng, ref, ref, "chr1", 20)
        path = str(tmp_path / "noidx.bam")
        simdata.write_test_bam(path, reads, "chr1", 5000)
        rd = BamReader(path)
        assert not rd.has_index()
        with pytest.raises(FileNotFoundError):
            list(rd.fetch("chr1", 0, 100))

    def test_merged_fetch_sorted(self, indexed_bam, tmp_path):
        path, length = indexed_bam
        rng = np.random.default_rng(5)
        ref = simdata.random_ref(rng, length)
        reads2 = simdata.simulate_reads(rng, ref, ref, "chr1", 500)
        p2 = str(tmp_path / "second.bam")
        simdata.write_test_bam(p2, reads2, "chr1", length)
        bai.build_index(p2)
        rds = [BamReader(path), BamReader(p2)]
        out = list(merged_fetch(rds, "chr1", 40_000, 45_000))
        poss = [r.pos for r in out]
        assert poss == sorted(poss)
        assert len(out) == sum(
            1 for p in (path, p2) for r in BamReader(p)
            if r.pos < 45_000 and r.end > 40_000)
