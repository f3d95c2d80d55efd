"""BQSR golden equivalence vs the REAL reference binary.

Runs scripts/golden_bqsr.py end-to-end on a small synthetic input: both the
reference executable (built from /root/reference by refshim/build_harness.sh)
and our CLI recalibrate the same BAM with the same GATKReport table and the
VCF outputs are diffed field-by-field. An exact match under a table that
shifts quals non-trivially proves the recalibration math agrees
(reference: src/haplotypecaller/bqsr/bqsr_read_transformer.cpp:170-243,
apply_bqsr_utils.cpp:302-321).

Skipped when the reference binary is absent (it is a gitignored build
artifact; run refshim/build_harness.sh to produce it).
"""

import importlib.util
import os
import pathlib

import pytest

HERE = pathlib.Path(__file__).parent
REPO = HERE.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


golden_e2e = _load("golden_e2e")
golden_bqsr = _load("golden_bqsr")

needs_ref = pytest.mark.skipif(
    not os.path.exists(golden_e2e.REF_BIN),
    reason="reference binary not built (refshim/build_harness.sh)")


def test_bayesian_estimate_regression():
    """Pin the hierarchical-Bayesian empirical-qual math. Values validated
    transitively by the e2e golden MATCH vs the reference binary (3 seeds,
    60kb each — see GOLDEN.md); these regressions keep it frozen."""
    from rovaca_tpu.reads.bqsr import empirical_quality_bayesian_estimate

    # smoothed counts as RecalDatum::calculate_empirical_qual builds them
    assert empirical_quality_bayesian_estimate(1_000_002, 801, 36.5) == 31.0
    assert empirical_quality_bayesian_estimate(500_002, 159, 35.0) == 35.0
    assert empirical_quality_bayesian_estimate(500_002, 200, 34.0) == 34.0
    assert empirical_quality_bayesian_estimate(40_002, 13, 36.0) == 36.0
    # zero errors: posterior pushes above reported, prior pulls back
    assert empirical_quality_bayesian_estimate(102, 1, 40.0) == 40.0


def test_likelihood_is_natural_log():
    """The reference uses logBinomialProbability's NATURAL log output as a
    log10 likelihood (apply_bqsr_utils.cpp:147-160 — no conversion). Guard
    against 'fixing' it back to true log10, which breaks binary parity."""
    import math

    from rovaca_tpu.reads.bqsr import _likelihood

    n, k, q = 1000, 10, 20.0
    p = 10.0 ** (-0.1 * q)
    ln_binom = (math.lgamma(n + 1) - math.lgamma(k + 1)
                - math.lgamma(n - k + 1)
                + k * math.log(p) + (n - k) * math.log(1 - p))
    assert abs(_likelihood(q, n, k) - ln_binom) < 1e-9  # ln, not log10


@needs_ref
def test_bqsr_golden_e2e(tmp_path):
    d = str(tmp_path)
    golden_bqsr.generate(d, 30_000, 20, 20260821)
    golden_bqsr.run_ref(d)
    golden_bqsr.run_ours(d)
    assert golden_e2e.diff(d) == 0
