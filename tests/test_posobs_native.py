"""Native GVCF position observations vs the Python oracle.

build_position_obs (pileup histograms, per-status depth, GATK
indel-informativeness) must be array-identical through native/posobs.cpp
and the Python path, on randomized error-model regions including
indel/soft-clip reads and short-insert adaptor pairs."""

import os

import numpy as np
import pytest

from rovaca_tpu.native import posobs_native
from rovaca_tpu.pipeline import ref_confidence as rc

pytestmark = pytest.mark.skipif(not posobs_native.available(),
                                reason="native toolchain unavailable")


def python_obs(reads, ref, padded_start, start, end):
    os.environ["ROVACA_NO_NATIVE_POSOBS"] = "1"
    try:
        # fresh copies: the layout caches must not leak between paths
        return rc.build_position_obs(reads, ref, padded_start, start, end)
    finally:
        del os.environ["ROVACA_NO_NATIVE_POSOBS"]


def assert_obs_equal(a, b, tag):
    np.testing.assert_array_equal(a.hist, b.hist, err_msg=f"{tag} hist")
    np.testing.assert_array_equal(a.depth, b.depth, err_msg=f"{tag} depth")
    np.testing.assert_array_equal(a.indel_informative, b.indel_informative,
                                  err_msg=f"{tag} informative")


def test_randomized_regions():
    import simdata
    from rovaca_tpu.assembly import assembler
    rng = np.random.default_rng(424242)
    for trial in range(8):
        ref = simdata.random_ref(rng, 700)
        hap = list(ref)
        # plant an indel + SNPs to force indel-informative variation
        p = int(rng.integers(100, 500))
        hap[p:p] = list("ACGT"[: int(rng.integers(1, 4))])
        for _ in range(2):
            s = int(rng.integers(60, 600))
            hap[s] = str(rng.choice(list("ACGT")))
        reads = simdata.simulate_fragments(
            rng, ref, "".join(hap), "chr1", 60, name_prefix=f"p{trial}_")
        fin = assembler.finalize_and_adjust(list(reads), 0, 699)
        ref_arr = np.frombuffer(ref.encode(), dtype=np.uint8)
        # flank inside the padded window
        start, end = 50, 650
        nat = rc.PositionObs(end - start)
        posobs_native.build_position_obs(nat, fin, ref_arr, 0, start, end)
        py = python_obs(fin, ref_arr, 0, start, end)
        assert_obs_equal(nat, py, f"trial{trial}")


def test_offset_padded_window():
    """padded_ref starting mid-contig (padded_start > 0)."""
    import simdata
    from rovaca_tpu.assembly import assembler
    rng = np.random.default_rng(7)
    ref = simdata.random_ref(rng, 900)
    reads = simdata.simulate_fragments(rng, ref, ref, "chr1", 50,
                                       name_prefix="q_")
    fin = assembler.finalize_and_adjust(list(reads), 200, 800)
    window = np.frombuffer(ref.encode(), dtype=np.uint8)[150:850]
    start, end = 250, 750
    nat = rc.PositionObs(end - start)
    posobs_native.build_position_obs(nat, fin, window, 150, start, end)
    py = python_obs(fin, window, 150, start, end)
    assert_obs_equal(nat, py, "offset")
