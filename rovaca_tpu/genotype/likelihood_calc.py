"""Genotype likelihoods from per-read allele likelihoods.

Counterpart of the reference's GenotypeLikelihoodCalculator (reference:
src/haplotypecaller/genotype/genotype_likelihood_calculator.cpp; GATK
semantics): for genotype G with allele counts {a: c_a},

    GL(G) = sum_reads log10( sum_a c_a * 10^lik[a][read] / P )

computed in log space, vectorized over reads.
"""

import numpy as np

from ..ops import gatk_math
from . import genotype_alleles as ga


def genotype_log10_likelihoods(ploidy, lik_matrix):
    """lik_matrix: (n_alleles, n_reads) float64 log10 likelihoods.

    Returns (n_genotypes,) float64 log10 GLs in canonical order.
    """
    lik = np.asarray(lik_matrix, dtype=np.float64)
    n_alleles, n_reads = lik.shape
    log10_ploidy = np.log10(ploidy)
    counts = ga.allele_count_maps(ploidy, n_alleles)

    out = np.empty(len(counts))
    for gi, count_pairs in enumerate(counts):
        if len(count_pairs) == 1:
            a, c = count_pairs[0]
            per_read = lik[a]  # + log10(c) - log10(P) with c == P cancels
            out[gi] = per_read.sum()
        else:
            stack = np.stack([lik[a] + np.log10(c) for a, c in count_pairs])
            per_read = gatk_math.log10_sum_log10(stack, axis=0) - log10_ploidy
            out[gi] = per_read.sum()
    return out


def gls_to_pls(gls):
    """Normalized phred-scaled integer PLs (best = 0)."""
    gls = np.asarray(gls, dtype=np.float64)
    adjusted = gls - gls.max()
    pls = np.round(-10.0 * adjusted).astype(np.int64)
    return np.minimum(pls, np.iinfo(np.int32).max).astype(np.int32)


def gq_from_pls(pls):
    """GQ = second-smallest PL (difference from best which is 0)."""
    if len(pls) < 2:
        return 0
    s = np.sort(np.asarray(pls))
    return int(min(s[1] - s[0], 99))
