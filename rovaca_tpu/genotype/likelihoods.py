"""Read-vs-allele likelihood container and marginalization.

Counterpart of the reference's AlleleLikelihoods (reference:
src/haplotypecaller/genotype/allele_likelihoods.hpp:189-379): a
(alleles x reads) log10 matrix with marginalization from haplotypes to
alleles (per-read max over supporting haplotypes), overlap-based evidence
retention, NON_REF augmentation (per-read max of the non-best alleles), and
tie-broken best-allele queries.
"""

import dataclasses

import numpy as np

from .variant import NON_REF

INFORMATIVE_THRESHOLD = 0.2  # log10 margin for best-allele informativeness


@dataclasses.dataclass
class AlleleLikelihoods:
    alleles: list            # Allele or Haplotype objects
    reads: list              # ReadRecord
    matrix: np.ndarray       # (n_alleles, n_reads) float64 log10
    filtered_reads: list = dataclasses.field(default_factory=list)

    @property
    def n_alleles(self):
        return len(self.alleles)

    @property
    def n_reads(self):
        return len(self.reads)

    def index_of(self, allele):
        return self.alleles.index(allele)

    def marginalize(self, new_alleles, allele_to_old):
        """Per-read max over the old alleles (haplotypes) mapped to each new
        allele (allele_likelihoods.hpp:189)."""
        old_index = {id(a): i for i, a in enumerate(self.alleles)}
        rows = []
        for allele in new_alleles:
            olds = allele_to_old[allele]
            idxs = [old_index[id(o)] for o in olds]
            if idxs:
                rows.append(self.matrix[idxs].max(axis=0))
            else:
                rows.append(np.full(self.n_reads, -np.inf))
        return AlleleLikelihoods(list(new_alleles), list(self.reads),
                                 np.array(rows))

    def retain_evidence(self, predicate):
        """Keep reads where predicate(read) is true
        (allele_likelihoods.hpp:224 retain by overlap)."""
        keep = [i for i, r in enumerate(self.reads) if predicate(r)]
        self.reads = [self.reads[i] for i in keep]
        self.matrix = self.matrix[:, keep] if keep else self.matrix[:, :0]

    def retain_overlapping(self, start, stop):
        """Reads overlapping [start, stop] (0-based inclusive)."""
        self.retain_evidence(lambda r: r.pos <= stop and r.end - 1 >= start)

    def add_non_reference_allele(self):
        """NON_REF likelihood per read = MEDIAN of the allele likelihoods
        STRICTLY below the read's best; if none qualify, the best
        likelihood itself when >=2 concrete alleles exist, else NaN
        (add_non_reference_allele + update_non_ref_allele_likelihoods +
        evaluate, allele_likelihoods.hpp:255-403). With two concrete
        alleles this reduces to the second-best value; at multiallelic
        sites (e.g. ref/*/alt in GVCF) the median over the below-best
        pair differs from a plain second-best."""
        if any(a is NON_REF or a == NON_REF for a in self.alleles):
            return
        if self.n_reads == 0 or self.n_alleles == 0:
            self.alleles = list(self.alleles) + [NON_REF]
            self.matrix = np.vstack([self.matrix,
                                     np.full((1, self.n_reads), -np.inf)])
            return
        m = self.matrix
        n_concrete = self.n_alleles
        best_lik = m.max(axis=0)
        non_ref = np.empty(self.n_reads)
        for r in range(self.n_reads):
            qualified = m[:, r][m[:, r] < best_lik[r]]
            if qualified.size:
                non_ref[r] = np.median(qualified)
            elif n_concrete > 1:
                non_ref[r] = best_lik[r]
            else:
                non_ref[r] = np.nan
        self.alleles = list(self.alleles) + [NON_REF]
        self.matrix = np.vstack([m, non_ref[None, :]])

    def best_allele_per_read(self):
        """(best_index, best_lik, second_lik, informative) per read
        (best_alleles_breaking_ties, allele_likelihoods.hpp:346-379);
        ties broken in favor of the reference allele (index 0)."""
        m = self.matrix
        n_reads = self.n_reads
        best_idx = np.zeros(n_reads, dtype=np.int64)
        best = np.full(n_reads, -np.inf)
        second = np.full(n_reads, -np.inf)
        for a in range(self.n_alleles):
            row = m[a]
            better = row > best
            tie = (row == best) & (best_idx != 0)
            second = np.where(better, best, np.maximum(second, row))
            best_idx = np.where(better, a, best_idx)
            best = np.where(better, row, best)
            del tie
        informative = (best - second) > INFORMATIVE_THRESHOLD
        return best_idx, best, second, informative

    def sample_matrix(self):
        return self.matrix
