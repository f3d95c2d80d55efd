"""Native assembler vs the Python oracle.

The Python assembler is golden-matched byte-for-byte against the reference
binary (tests/test_golden_assembly.py); the C++ port must reproduce its
path sets, scores, and kmer attribution exactly — on the frozen golden
corpus and on randomized error-model regions."""

import importlib.util
import os
import pathlib

import numpy as np
import pytest

from rovaca_tpu import constants as C
from rovaca_tpu.assembly import assembler
from rovaca_tpu.native import assemble_native

pytestmark = pytest.mark.skipif(not assemble_native.available(),
                                reason="native toolchain unavailable")

HERE = pathlib.Path(__file__).parent
spec = importlib.util.spec_from_file_location(
    "golden_assembly", HERE.parent / "scripts" / "golden_assembly.py")
ga = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ga)


def python_paths(reads, window):
    """The Python kmer-ladder result dict (oracle)."""
    os.environ["ROVACA_NO_NATIVE_ASSEMBLY"] = "1"
    try:
        results = {}
        any_success = False
        first_kbest = True
        for k in C.ASSEMBLY_KMER_SIZES:
            paths, ran = assembler.assemble_with_kmer(
                reads, window, k, first_kbest=first_kbest)
            first_kbest &= not ran
            if paths is None:
                continue
            any_success = True
            assembler._merge_paths(results, paths, k)
        if not any_success:
            k = C.ASSEMBLY_KMER_SIZES[-1]
            for _ in range(C.ASSEMBLY_MAX_KMER_ITERATIONS):
                k += C.ASSEMBLY_KMER_STEP
                paths, ran = assembler.assemble_with_kmer(
                    reads, window, k,
                    allow_low_complexity=(k >= assembler.MAX_KMER),
                    first_kbest=first_kbest)
                first_kbest &= not ran
                if paths is not None:
                    assembler._merge_paths(results, paths, k)
                    break
        return results
    finally:
        del os.environ["ROVACA_NO_NATIVE_ASSEMBLY"]


def assert_same(py, nat, tag):
    assert nat is not None, tag
    assert set(py) == set(nat), \
        f"{tag}: path sets differ ({len(py)} vs {len(nat)})"
    for seq, (score, k) in py.items():
        nscore, nk = nat[seq]
        assert nk == k, f"{tag}: kmer attribution differs at {seq[:30]}"
        assert abs(nscore - score) < 1e-12, \
            f"{tag}: score {score} vs {nscore}"


def test_golden_corpus_native_matches_python():
    ref = open(HERE / "golden" / "assembly_ref.txt").readline().rstrip("\n")
    n_checked = 0
    with open(HERE / "golden" / "assembly_cases.txt") as fh:
        while True:
            head = fh.readline()
            if not head.strip():
                break
            c, beg, end, n = head.split("\t")
            reads = [ga.parse_sam_line(fh.readline(), c)
                     for _ in range(int(n))]
            fh.readline()
            beg, end = int(beg), int(end)
            ps = (beg - 1) - ga.REGION_PAD
            pe = (end - 1) + ga.REGION_PAD
            fin = assembler.finalize_region_reads(reads, ps, pe)
            assembler.adjust_overlapping_pair_quals(fin)
            window = ref[ps:pe + 1].encode()
            py = python_paths(fin, window)
            nat = assemble_native.assemble_region_paths(
                fin, window, C.ASSEMBLY_KMER_SIZES, C.ASSEMBLY_KMER_STEP,
                C.ASSEMBLY_MAX_KMER_ITERATIONS)
            assert_same(py, nat, f"chr1:{beg}-{end}")
            n_checked += 1
    assert n_checked == 80


def test_randomized_error_regions():
    """Synthetic noisy regions: SNPs, indels, low-qual stretches."""
    import simdata
    rng = np.random.default_rng(20260820)
    for trial in range(12):
        ref = simdata.random_ref(rng, 500)
        # haplotype with 1-3 variants
        hap = list(ref)
        for _ in range(int(rng.integers(1, 4))):
            p = int(rng.integers(60, 440))
            hap[p] = str(rng.choice(list("ACGT")))
        reads = simdata.simulate_fragments(
            rng, ref, "".join(hap), "chr1", 40, name_prefix=f"t{trial}_")
        fin = assembler.finalize_region_reads(reads, 0, 499)
        assembler.adjust_overlapping_pair_quals(fin)
        window = ref.encode()
        py = python_paths(fin, window)
        nat = assemble_native.assemble_region_paths(
            fin, window, C.ASSEMBLY_KMER_SIZES, C.ASSEMBLY_KMER_STEP,
            C.ASSEMBLY_MAX_KMER_ITERATIONS)
        assert_same(py, nat, f"trial{trial}")
