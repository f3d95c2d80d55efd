"""Native region finalizer vs the Python oracle.

finalize_region_reads + adjust_overlapping_pair_quals must produce
identical records (pos, cigar, bases, quals, hard clips, order) through
native/finalize.cpp and through the Python clipping chain, on golden
corpus regions and randomized error-model reads."""

import importlib.util
import pathlib

import numpy as np
import pytest

from rovaca_tpu.assembly import assembler
from rovaca_tpu.native import finalize_native

pytestmark = pytest.mark.skipif(not finalize_native.available(),
                                reason="native toolchain unavailable")

HERE = pathlib.Path(__file__).parent
spec = importlib.util.spec_from_file_location(
    "golden_assembly", HERE.parent / "scripts" / "golden_assembly.py")
ga = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ga)


def assert_same(py, nat, tag):
    assert nat is not None, tag
    assert len(py) == len(nat), f"{tag}: {len(py)} vs {len(nat)} reads"
    for i, (a, b) in enumerate(zip(py, nat)):
        ctx = f"{tag}[{i}] {a.name}"
        assert a.name == b.name, ctx
        assert a.pos == b.pos, f"{ctx}: pos {a.pos} vs {b.pos}"
        assert str(a.cigar) == str(b.cigar), \
            f"{ctx}: cigar {a.cigar} vs {b.cigar}"
        assert a.bases == b.bases, ctx
        np.testing.assert_array_equal(np.asarray(a.quals),
                                      np.asarray(b.quals), err_msg=ctx)
        assert a.hard_left == b.hard_left, ctx
        assert a.hard_right == b.hard_right, ctx
        assert a.flag == b.flag and a.tlen == b.tlen, ctx


def python_finalize(reads, ps, pe):
    fin = assembler.finalize_region_reads(reads, ps, pe)
    assembler.adjust_overlapping_pair_quals(fin)
    return fin


def test_golden_corpus_regions():
    n = 0
    with open(HERE / "golden" / "assembly_cases.txt") as fh:
        while True:
            head = fh.readline()
            if not head.strip():
                break
            c, beg, end, cnt = head.split("\t")
            reads = [ga.parse_sam_line(fh.readline(), c)
                     for _ in range(int(cnt))]
            fh.readline()
            ps = (int(beg) - 1) - ga.REGION_PAD
            pe = (int(end) - 1) + ga.REGION_PAD
            py = python_finalize(reads, ps, pe)
            nat = finalize_native.finalize_region(reads, ps, pe)
            assert_same(py, nat, f"chr1:{beg}-{end}")
            n += 1
    assert n == 80


def test_randomized_regions():
    import simdata
    rng = np.random.default_rng(99)
    for trial in range(10):
        ref = simdata.random_ref(rng, 600)
        hap = list(ref)
        for _ in range(int(rng.integers(1, 4))):
            p = int(rng.integers(60, 540))
            hap[p] = str(rng.choice(list("ACGT")))
        reads = simdata.simulate_fragments(
            rng, ref, "".join(hap), "chr1", 50, name_prefix=f"f{trial}_")
        # clip span off-center to exercise region clamping
        ps, pe = 40, 520
        py = python_finalize(list(reads), ps, pe)
        nat = finalize_native.finalize_region(list(reads), ps, pe)
        assert_same(py, nat, f"trial{trial}")


def test_contig_edge_reads():
    """Reverted soft clips hanging off the contig start (negative pos
    clamp path, clipping.py:163-169)."""
    from rovaca_tpu.reads.record import ReadRecord
    reads = [
        ReadRecord(name="edge1", flag=0x1 | 0x2 | 0x20, ref_id=0, pos=3,
                   mapping_quality=60, cigar="10S30M",
                   bases=b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT",
                   quals=np.full(40, 30, np.uint8), mate_pos=8, tlen=45,
                   contig="chr1"),
        ReadRecord(name="edge1", flag=0x1 | 0x2 | 0x10, ref_id=0, pos=8,
                   mapping_quality=60, cigar="30M10S",
                   bases=b"CGTACGTACGTACGTACGTACGTACGTACGTACGTACGTA",
                   quals=np.full(40, 28, np.uint8), mate_pos=3, tlen=-45,
                   contig="chr1"),
    ]
    py = python_finalize(list(reads), 0, 200)
    nat = finalize_native.finalize_region(list(reads), 0, 200)
    assert_same(py, nat, "edge")
