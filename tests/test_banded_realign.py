"""Banded-SW-backed realignment must be output-identical to the native
SW path (the exact-or-fallback contract at its production call site)."""

import os

import numpy as np
import pytest

from rovaca_tpu.native import sw_native

pytestmark = pytest.mark.skipif(not sw_native.available(),
                                reason="native toolchain unavailable")


def _region_likelihoods(rng):
    """A realistic region: haplotypes + reads scored by the XLA engine."""
    import simdata
    from rovaca_tpu.assembly import assembler
    from rovaca_tpu.genotype.likelihoods import AlleleLikelihoods
    from rovaca_tpu.ops import pairhmm

    ref = simdata.random_ref(rng, 500)
    hap = list(ref)
    p = int(rng.integers(150, 350))
    hap[p] = str(rng.choice([b for b in "ACGT" if b != hap[p]]))
    hap[p + 40:p + 40] = list("TT")     # nearby insertion
    reads = simdata.simulate_fragments(rng, ref, "".join(hap), "chr1", 30,
                                       name_prefix="br_")
    fin = assembler.finalize_and_adjust(list(reads), 0, 499)
    haps = assembler.assemble_region(fin, ref.encode(), 0)
    lik, kept = pairhmm.compute_likelihoods(
        fin, [h.bases for h in haps], engine="xla")
    kept_reads = [fin[i] for i in kept]
    return AlleleLikelihoods(list(haps), kept_reads, lik)


def _realigned(lik, banded):
    from rovaca_tpu.genotype import alignment_utils as au
    os.environ["ROVACA_BANDED_REALIGN"] = "1" if banded else "0"
    try:
        au.realign_reads_to_their_best_haplotype(lik)
        return [(r.name, r.pos, str(r.cigar), r.bases) for r in lik.reads]
    finally:
        del os.environ["ROVACA_BANDED_REALIGN"]


def test_banded_realignment_identical_to_native():
    import copy
    rng = np.random.default_rng(11)
    lik = _region_likelihoods(rng)
    lik2 = copy.copy(lik)
    lik2.reads = list(lik.reads)
    a = _realigned(lik, banded=False)
    b = _realigned(lik2, banded=True)
    assert a == b
    assert len(a) > 0
