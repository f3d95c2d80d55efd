"""rovaca_tpu — a TPU-native germline variant-calling engine.

A from-scratch reimplementation of the capabilities of Rovaca (a GATK4
HaplotypeCaller-equivalent germline SNP/INDEL caller), designed TPU-first:

- The dominant compute kernel — the PairHMM forward algorithm scoring every
  (read, haplotype) pair — runs as a Pallas TPU kernel batched over padded
  (8 haplotypes x 128 reads) tiles (``rovaca_tpu.ops.pairhmm``).
- Smith-Waterman scoring, per-base activity posteriors and pileup genotype
  likelihoods are vectorized JAX ops.
- Irregular host work (BAM/FASTA/BED/VCF IO, read-threading assembly,
  genotyping bookkeeping, VCF writing) runs on host.
- Multi-chip / multi-host scale-out is interval-sharded data parallelism over
  a ``jax.sharding.Mesh`` with a coordinate-ordered gather for output merge
  (``rovaca_tpu.parallel``).

Reference behavior is documented against ZephyRoy/Rovaca (cited as
``reference:<path>:<line>`` in docstrings); the implementation here is new and
TPU-idiomatic, not a translation.
"""

__version__ = "0.1.0"
