"""Native f64 rescue must be BIT-identical to the numpy golden oracle —
the rescue spec (golden.forward_from_channels, dtype=float64).  The C side
runs without FMA contraction and returns the final M/I rows so numpy's
pairwise summation stays part of the arithmetic."""

import numpy as np
import pytest

from rovaca_tpu.native import pairhmm_native
from rovaca_tpu.ops.pairhmm import golden, prep

pytestmark = pytest.mark.skipif(not pairhmm_native.rescue_available(),
                                reason="native toolchain unavailable")


def _random_pair(rng, lr, lh):
    bases = rng.choice(list(b"ACGT"), size=lr).astype(np.uint8).tobytes()
    quals = rng.integers(2, 45, size=lr).astype(np.uint8)
    hap = rng.choice(list(b"ACGT"), size=lh).astype(np.uint8).tobytes()
    return bases, quals, hap


def test_forward_f64_bit_identical_to_golden():
    rng = np.random.default_rng(7)
    for _ in range(40):
        lr = int(rng.integers(10, 160))
        lh = int(rng.integers(20, 400))
        bases, quals, hap = _random_pair(rng, lr, lh)
        mq = int(rng.integers(10, 60))
        want = golden.compute_full_prob(bases, quals, mq, hap,
                                        dtype=np.float64)
        codes, ch = prep.prepare_read_channels(bases, quals, mq,
                                               dtype=np.float64)
        hap_codes = prep.BASE_CODE[np.frombuffer(hap, dtype=np.uint8)]
        got = pairhmm_native.forward_f64(ch, codes, hap_codes)
        assert got == want, (got, want, got - want)


def test_log10_with_rescue_uses_native_bit_exactly():
    """End-to-end through the api: rescued entries equal the golden path."""
    from rovaca_tpu.ops.pairhmm import api

    rng = np.random.default_rng(11)

    class R:
        def __init__(self, bases, quals, mq):
            self.bases, self.quals, self.mapping_quality = bases, quals, mq

    reads, haps = [], []
    for _ in range(3):
        bases, quals, hap = _random_pair(rng, 120, 300)
        reads.append(R(bases, quals, 45))
        haps.append(hap)
    # force every pair through the rescue with an all-underflow raw matrix
    raw = np.zeros((len(haps), len(reads)), dtype=np.float32)
    out = api.log10_with_rescue(raw, reads, haps)
    for h in range(len(haps)):
        for r in range(len(reads)):
            rd = golden.compute_full_prob(reads[r].bases, reads[r].quals,
                                          45, haps[h], dtype=np.float64)
            want = np.log10(rd) - api.C.LOG10_INITIAL_CONSTANT_F64
            assert out[h, r] == want
