"""IO layer + read-stream tests: BAM round-trip, FASTA, BED, filter,
downsampler (Java LCG exactness)."""

import numpy as np
import pytest

from rovaca_tpu.io.bam import BamHeader, BamReader, BamWriter, merged_reader
from rovaca_tpu.io.bed import BedFile, merge_intervals
from rovaca_tpu.io.fasta import FastaFile, write_fasta
from rovaca_tpu.reads.cigar import Cigar, CigarOp
from rovaca_tpu.reads.downsampler import JavaLCG, PositionalDownsampler
from rovaca_tpu.reads.filters import HCReadFilter
from rovaca_tpu.reads.record import ReadRecord


def make_read(name="r1", pos=100, cigar="10M", bases="ACGTACGTAC",
              quals=None, flag=0, mapq=60, ref_id=0, tags=None):
    if quals is None:
        quals = [30] * len(bases)
    return ReadRecord(name=name, flag=flag, ref_id=ref_id, pos=pos,
                      mapping_quality=mapq, cigar=cigar, bases=bases,
                      quals=quals, tags=tags or {}, contig="chr1")


class TestCigar:
    def test_parse_roundtrip(self):
        for s in ["10M", "5S10M3D2I5M5H", "151M", "*"]:
            assert str(Cigar.from_string(s)) == s

    def test_lengths(self):
        c = Cigar.from_string("5S10M3D2I5M")
        assert c.query_length == 22
        assert c.reference_length == 18
        assert c.left_soft_clip == 5
        assert c.right_soft_clip == 0

    def test_normalized(self):
        c = Cigar([(CigarOp.M, 5), (CigarOp.M, 3), (CigarOp.I, 0),
                   (CigarOp.D, 2)])
        assert str(c.normalized()) == "8M2D"

    def test_validity(self):
        assert Cigar.from_string("10M").is_valid()
        assert not Cigar.from_string("3D10M").is_valid()
        assert not Cigar.from_string("5M3S5M").is_valid()
        assert Cigar.from_string("3S10M4S").is_valid()


class TestReadRecord:
    def test_coordinates(self):
        r = make_read(pos=100, cigar="5S10M3D5M", bases="A" * 20)
        assert r.end == 118
        assert r.unclipped_start == 95
        assert r.overlaps(110, 120)
        assert not r.overlaps(118, 125)

    def test_read_pos_at_ref_pos(self):
        r = make_read(pos=100, cigar="5M2D5M", bases="A" * 10)
        assert r.read_pos_at_ref_pos(102) == (2, False)
        assert r.read_pos_at_ref_pos(105) == (None, True)
        assert r.read_pos_at_ref_pos(107) == (5, False)
        assert r.read_pos_at_ref_pos(99) == (None, False)


class TestBam:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.bam")
        header = BamHeader(
            "@HD\tVN:1.6\tSO:coordinate\n"
            "@SQ\tSN:chr1\tLN:1000\n@RG\tID:rg1\tSM:NA12878\n",
            ["chr1"], [1000])
        reads = [
            make_read("r1", 10, "10M", "ACGTACGTAC"),
            make_read("r2", 20, "5M2I3M", "ACGTACGTAC",
                      tags={"NM": 2, "RG": "rg1"}),
            make_read("r3", 30, "3S7M", "ACGTACGTAC", flag=16),
        ]
        with BamWriter(path, header) as w:
            for r in reads:
                w.write(r)
        rd = BamReader(path)
        assert rd.header.ref_names == ["chr1"]
        assert rd.header.samples == ["NA12878"]
        got = list(rd)
        assert len(got) == 3
        for a, b in zip(reads, got):
            assert a.name == b.name
            assert a.pos == b.pos
            assert str(a.cigar) == str(b.cigar)
            assert a.bases == b.bases
            np.testing.assert_array_equal(a.quals, b.quals)
            assert a.flag == b.flag
        assert got[1].tags["NM"] == 2
        assert got[1].tags["RG"] == "rg1"

    def test_merged_reader(self, tmp_path):
        header = BamHeader("@SQ\tSN:chr1\tLN:1000\n", ["chr1"], [1000])
        p1, p2 = str(tmp_path / "a.bam"), str(tmp_path / "b.bam")
        with BamWriter(p1, header) as w:
            w.write(make_read("a1", 10))
            w.write(make_read("a2", 30))
        with BamWriter(p2, header) as w:
            w.write(make_read("b1", 20))
            w.write(make_read("b2", 25))
        names = [r.name for r in merged_reader([p1, p2])]
        assert names == ["a1", "b1", "b2", "a2"]


class TestFasta:
    def test_write_and_fetch(self, tmp_path):
        path = str(tmp_path / "ref.fa")
        seq1 = "ACGT" * 50
        seq2 = "TTGGCCAA" * 10
        write_fasta(path, {"chr1": seq1, "chr2": seq2}, line_width=13)
        fa = FastaFile(path)
        assert fa.contig_dict == {"chr1": 200, "chr2": 80}
        assert fa.fetch("chr1", 0, 8) == b"ACGTACGT"
        assert fa.fetch("chr1", 11, 17) == seq1[11:17].encode()
        assert fa.fetch("chr2") == seq2.encode()
        assert fa.fetch("chr1", 195) == seq1[195:].encode()

    def test_no_fai_builds_index(self, tmp_path):
        path = str(tmp_path / "ref2.fa")
        with open(path, "w") as fh:
            fh.write(">c1 description\nACGTAC\nGTAC\n>c2\nTTTT\n")
        fa = FastaFile(path)
        assert fa.contig_dict == {"c1": 10, "c2": 4}
        assert fa.fetch("c1", 4, 8) == b"ACGT"

    def test_normalization(self, tmp_path):
        path = str(tmp_path / "ref3.fa")
        with open(path, "w") as fh:
            fh.write(">c1\nacgtRYKM\n")
        fa = FastaFile(path)
        assert fa.fetch("c1") == b"ACGTNNNN"


class TestBed:
    def test_merge(self):
        assert merge_intervals([(5, 10), (8, 12), (20, 30)]) == [(5, 12), (20, 30)]

    def test_mask_and_padding(self):
        bed = BedFile.from_intervals([("chr1", 100, 200), ("chr1", 500, 600)],
                                     contig_dict={"chr1": 1000}, padding=10)
        m = bed.mask("chr1", 90, 210)
        assert not m[0] and m[10] and m[109] and not m[110]
        padded = bed.padded_intervals("chr1")
        assert padded[0] == (0, 310)  # 100 - (10+100) clamped to 0
        assert padded[1] == (390, 710)


class TestFilter:
    def test_flag_and_mq(self):
        f = HCReadFilter()
        assert f.test(make_read())
        assert not f.test(make_read(flag=4))      # unmapped
        assert not f.test(make_read(flag=0x100))  # secondary
        assert not f.test(make_read(flag=0x400))  # duplicate
        assert not f.test(make_read(flag=0x200))  # qcfail
        assert not f.test(make_read(mapq=19))
        assert not f.test(make_read(mapq=255))
        assert f.test(make_read(mapq=20))
        assert f.filtered_count == 6

    def test_supplementary_passes_default(self):
        # the reference's flag mask does not include supplementary
        assert HCReadFilter().test(make_read(flag=0x800))


class TestJavaLCG:
    def test_nextint_sequence_matches_java(self):
        # java.util.Random with raw state 25170011922:
        # next(31) = (state*0x5DEECE66D + 0xB) & (2^48-1), >> 17
        rng = JavaLCG()
        state = 25170011922
        for bound in [51, 52, 53, 100, 64, 7]:
            state = (state * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
            r = state >> 17
            if bound & (bound - 1) == 0:
                expect = (bound * r) >> 31
            else:
                expect = r % bound  # no rejection needed for these draws
            got = rng.next_int(bound)
            assert got == expect

    def test_power_of_two_path(self):
        rng = JavaLCG()
        vals = [rng.next_int(64) for _ in range(100)]
        assert all(0 <= v < 64 for v in vals)


class TestDownsampler:
    def test_under_target_passthrough(self):
        ds = PositionalDownsampler(target=5)
        reads = [make_read(f"r{i}", pos=100) for i in range(3)]
        out = list(ds(iter(reads)))
        assert [r.name for r in out] == ["r0", "r1", "r2"]

    def test_caps_per_position(self):
        ds = PositionalDownsampler(target=5)
        reads = [make_read(f"r{i}", pos=100) for i in range(20)]
        reads += [make_read(f"s{i}", pos=200) for i in range(3)]
        out = list(ds(iter(reads)))
        assert sum(1 for r in out if r.pos == 100) == 5
        assert sum(1 for r in out if r.pos == 200) == 3
        assert ds.discarded == 15

    def test_deterministic(self):
        def run():
            ds = PositionalDownsampler(target=3)
            reads = [make_read(f"r{i}", pos=100) for i in range(50)]
            return [r.name for r in ds(iter(reads))]
        assert run() == run()

    def test_position_groups_independent(self):
        ds = PositionalDownsampler(target=2)
        reads = ([make_read(f"a{i}", pos=1) for i in range(10)]
                 + [make_read(f"b{i}", pos=2) for i in range(10)])
        out = list(ds(iter(reads)))
        assert sum(1 for r in out if r.pos == 1) == 2
        assert sum(1 for r in out if r.pos == 2) == 2
