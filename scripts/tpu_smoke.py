"""Smoke-test the Pallas PairHMM kernel on real TPU vs the golden oracle."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from rovaca_tpu.ops.pairhmm import prep, golden
from rovaca_tpu.ops.pairhmm.kernel import pairhmm_pallas


class R:
    def __init__(self, bases, quals, mq=60):
        self.bases = bases.encode()
        self.quals = np.asarray(quals, dtype=np.uint8)
        self.mapping_quality = mq


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(7)
    ref = "".join(rng.choice(list("ACGT"), size=60))
    haps = [ref, ref[:30] + "T" + ref[31:], ref[:12] + ref[14:]]
    reads = []
    for _ in range(9):
        start = int(rng.integers(0, 20))
        frag = ref[start:start + 40]
        reads.append(R(frag, rng.integers(10, 40, size=len(frag))))

    batch = prep.build_pair_batch(reads, haps)
    print("batch:", batch.trans.shape, batch.hbase.shape)
    raw = np.asarray(pairhmm_pallas(batch.trans, batch.rbase, batch.rlen,
                                    batch.hbase, batch.hlen))
    got = batch.result_matrix(raw)

    want = np.zeros_like(got)
    for h, hap in enumerate(haps):
        for r, read in enumerate(reads):
            want[h, r] = golden.compute_full_prob(
                read.bases, read.quals, read.mapping_quality, hap,
                dtype=np.float32)

    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    print("max rel err:", rel.max())
    assert rel.max() < 2e-4, (got, want)
    print("TPU kernel matches golden ✓")


if __name__ == "__main__":
    main()
