"""Phred-boundary sweep for the hom-ref GL arithmetic.

Round-4 judging found a one-phred GVCF divergence (seed 867530,
chr20:135470: PL[1] 55 vs 56) caused by computing the het GL term with
exact log-sum-exp where the reference uses the QUANTIZED Jacobian-table
approximation (math_utils.cpp:280-291, table step 1e-4;
reference_confidence_model.cpp:181-184; HcActiveBase.h:160-176).

This suite pins the arithmetic to a scalar, loop-order-exact transcription
of the reference C++ (independent of the vectorized production path) and
sweeps pileup compositions whose GLs land within a hair of integer phred
edges — exactly where an exact-vs-quantized mismatch flips a PL.
"""

import math

import numpy as np
import pytest

from rovaca_tpu.ops import gatk_math
from rovaca_tpu.pipeline.activity import genotype_cache, MAX_QUAL_BIN
from rovaca_tpu.pipeline import ref_confidence as rc


# -- scalar transcription of the reference arithmetic ----------------------

_TABLE_STEP = 1e-4
_MAX_TOL = 8.0


def _jacobian_get(diff):
    # JacobianLogTable::get, math_utils.h:232,239
    i = int(math.floor(diff * (1.0 / _TABLE_STEP) + 0.5))
    return math.log10(1.0 + 10.0 ** (-_TABLE_STEP * i))


def _approx_sum(a, b):
    # MathUtils::approximate_log10sum_log10(double, double)
    if a > b:
        a, b = b, a
    if a == -math.inf:
        return b
    diff = b - a
    return b + (_jacobian_get(diff) if diff < _MAX_TOL else 0.0)


def _qual_to_prob_log10(q):
    return math.log10(1.0 - 10.0 ** (q / -10.0))


def _ref_scalar_gls(hist, ploidy=2):
    """calc_genotype_likelihoods_of_ref_vs_any transcribed loop-for-loop
    (reference_confidence_model.cpp:114-186). hist is (2, 64) with
    status 0 = non-ref evidence, 1 = ref (our PositionObs layout)."""
    lp = math.log10(ploidy)
    third = math.log10(1.0 / 3.0)
    gl = [0.0] * (ploidy + 1)
    n = 0
    # reference iterates FS_REF (=ref) first, then FS_NON_REF
    for is_alt in (False, True):
        row = hist[1 if not is_alt else 0]
        for q in range(rc.BASE_QUAL_THRESHOLD + 1, MAX_QUAL_BIN):
            count = int(row[q])
            if count == 0:
                continue
            if is_alt:
                nonref = _qual_to_prob_log10(q)
                ref = q * -0.1 + third
            else:
                ref = _qual_to_prob_log10(q)
                nonref = q * -0.1 + third
            gl[0] += count * (ref + lp)
            gl[ploidy] += count * (nonref + lp)
            for i in range(1, ploidy):
                j = ploidy - i
                gl[i] += count * _approx_sum(ref + math.log10(j),
                                             nonref + math.log10(i))
            n += count
    denom = n * lp
    return [g - denom for g in gl]


def _gls_to_pls(gls):
    # genotype_likelihoods.cpp:71-79: round(min(-10*(gl-max), MAX_PL))
    adjust = max(gls)
    return [int(math.floor(min(-10.0 * (g - adjust), 99999.0) + 0.5))
            for g in gls]


def _our_pls(hist):
    """Drive the production vectorized path on a single position."""
    obs = rc.PositionObs(1)
    obs.hist[:, 0, :] = hist
    cache = rc._masked_genotype_cache(2)
    counts = obs.hist[:, :, rc.BASE_QUAL_THRESHOLD + 1:].sum(
        axis=(0, 2), dtype=np.int64).astype(np.float64)
    gl = np.einsum("spq,sqg->pg", obs.hist, cache)
    gl -= counts[:, None] * math.log10(2)
    snp_gls = np.minimum(gl, gl[:, 0:1])
    snp_gls[:, 0] = gl[:, 0]
    pls = np.floor(0.5 + -10.0 * (
        snp_gls - snp_gls.max(axis=1, keepdims=True))).astype(int)
    return pls[0].tolist(), gl[0]


# -- tests -----------------------------------------------------------------

def test_cache_het_term_is_jacobian_quantized():
    """The het column of genotype_cache must be the table-quantized sum,
    not exact log-sum-exp."""
    cache = genotype_cache(2)
    third = math.log10(1.0 / 3.0)
    for status in range(2):
        for q in range(1, MAX_QUAL_BIN):
            if status == 0:
                ref = q * -0.1 + third
                nonref = _qual_to_prob_log10(q)
            else:
                ref = _qual_to_prob_log10(q)
                nonref = q * -0.1 + third
            want = _approx_sum(ref, nonref)
            assert cache[status, q, 1] == want, (status, q)


def test_indel_table_is_jacobian_quantized():
    tab = rc._indel_gl_table(2)
    no_indel = _qual_to_prob_log10(45)
    indel = -4.5
    for n in range(1, 41):
        het = _approx_sum(no_indel, indel)
        want = n * (het - math.log10(2))
        assert tab[n, 1] == pytest.approx(want, abs=0, rel=0) or \
            tab[n, 1] == want, n


def _random_hist(rng, depth):
    hist = np.zeros((2, MAX_QUAL_BIN), dtype=np.int64)
    n_alt = rng.integers(0, max(1, depth // 4))
    for _ in range(depth - n_alt):
        hist[1, rng.integers(7, 42)] += 1
    for _ in range(n_alt):
        hist[0, rng.integers(7, 42)] += 1
    return hist


def test_boundary_sweep_vs_scalar_reference():
    """Random pileups, including many whose PL[1]/PL[2] land within 0.01
    phred of an integer edge, must produce identical PLs from the
    production einsum path and the scalar reference transcription."""
    rng = np.random.default_rng(20260821)
    n_boundary = 0
    for _ in range(4000):
        depth = int(rng.integers(1, 80))
        hist = _random_hist(rng, depth)
        ref_gls = _ref_scalar_gls(hist)
        want = _gls_to_pls(ref_gls)
        got, gl_raw = _our_pls(hist)
        # hom-ref capped GLs (production caps alt by GL[0] before PLs)
        capped = [ref_gls[0], min(ref_gls[1], ref_gls[0]),
                  min(ref_gls[2], ref_gls[0])]
        want_capped = _gls_to_pls(capped)
        assert got == want_capped, (hist.nonzero(), got, want_capped)
        # count how many sweeps actually exercised a boundary
        for g in capped[1:]:
            frac = abs(-10.0 * (g - max(capped)) % 1.0)
            if min(frac, 1.0 - frac) < 0.01:
                n_boundary += 1
    # the sweep must actually hit edges to mean anything
    assert n_boundary >= 5, n_boundary


def test_known_quantization_crossings():
    """Pileups found by search where the exact-logsum het term rounds PL[1]
    one phred away from the reference's quantized-table arithmetic — the
    exact failure shape of round 4's seed-867530 divergence. The production
    path must land on the reference side of the edge."""
    cases = [
        # ((status, qual, count)...), expected reference PLs
        ([(1, 9, 19), (1, 42, 17)], [0, 105, 1046]),
        ([(1, 7, 26), (1, 32, 26)], [0, 148, 1237]),
        ([(1, 11, 24), (1, 29, 7), (1, 36, 15)], [0, 136, 1218]),
    ]
    for entries, want in cases:
        hist = np.zeros((2, MAX_QUAL_BIN), dtype=np.int64)
        for s, q, c in entries:
            hist[s, q] += c
        scal = _ref_scalar_gls(hist)
        capped = [scal[0], min(scal[1], scal[0]), min(scal[2], scal[0])]
        assert _gls_to_pls(capped) == want, entries
        got, _ = _our_pls(hist)
        assert got == want, (entries, got, want)
