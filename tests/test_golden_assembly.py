"""Cross-implementation golden diff: our assembler vs the reference binary.

tests/golden/ holds a frozen 80-region corpus (assembly_cases.txt /
assembly_ref.txt, the reference harness's serialized case format:
apply/test/assemble_testcase_iterator.h) and the output the reference's
own FakeAssembler binary produced on it (assembly_result_ref.txt, built
from /root/reference via the gitignored .refbuild harness; format:
apply/test/fake_assembler.cpp:80-92).

This is the reference repo's own golden-file test pattern
(apply/test/casedata/gatk_result.txt) pointed at *our* implementation:
every region's post-finalization read count and lexicographically sorted
haplotype set must match the reference binary byte-for-byte — including
the four 128-cap-saturated regions (no waiver; exact zip/splitter/cap
semantics landed in round 4).
"""

import importlib.util
import pathlib

import pytest

HERE = pathlib.Path(__file__).parent
GOLDEN = HERE / "golden"

spec = importlib.util.spec_from_file_location(
    "golden_assembly", HERE.parent / "scripts" / "golden_assembly.py")
ga = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ga)


@pytest.fixture(scope="module")
def corpus():
    ref = open(GOLDEN / "assembly_ref.txt").readline().rstrip("\n")
    cases = []
    with open(GOLDEN / "assembly_cases.txt") as fh:
        while True:
            head = fh.readline()
            if not head.strip():
                break
            c, beg, end, n = head.split("\t")
            reads = [ga.parse_sam_line(fh.readline(), c)
                     for _ in range(int(n))]
            fh.readline()
            cases.append((int(beg), int(end), reads))
    golden = ga.parse_result(GOLDEN / "assembly_result_ref.txt")
    return ref, cases, golden


def test_corpus_shape(corpus):
    ref, cases, golden = corpus
    assert len(cases) == 80
    assert len(golden) == 80


def test_assembly_matches_reference_binary(corpus):
    ref, cases, golden = corpus
    mismatches = []
    for beg, end, reads in cases:
        loc = f"chr1:{beg}-{end}"
        want_n, want_haps = golden[loc]
        got_n, got_haps = ga.assemble_ours(ref, beg, end, reads)
        if got_haps == want_haps and got_n == want_n:
            continue
        sym = (len([h for h in want_haps if h not in got_haps])
               + len([h for h in got_haps if h not in want_haps]))
        mismatches.append(
            f"{loc}: reads {want_n}/{got_n} haps {len(want_haps)}/"
            f"{len(got_haps)} symdiff {sym}")
    assert not mismatches, "\n".join(mismatches)
