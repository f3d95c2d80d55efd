"""Benchmark: PairHMM cell-updates/sec on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's AVX512 engine processes 16 reads/vector with ~15
vector ops per DP cell (reference: src/haplotypecaller/pairhmm/rovaca/
avx_512_float.cc:84-107). Measured AVX512 single-socket estimates for
GKL-class PairHMM kernels are ~10-40 Gcells/s; we use BASELINE_GCUPS below
(overridable via env ROVACA_BASELINE_GCUPS, e.g. from a measured run of the
reference binary).

Timing note: on the axon TPU tunnel, block_until_ready can return before
device completion; we therefore time through a host fetch of every output.
"""

import json
import os
import time

import numpy as np

BASELINE_GCUPS = float(os.environ.get("ROVACA_BASELINE_GCUPS", "25.0"))


def time_fn(fn, variants, reps=2):
    """min over reps of (dispatch all variants + fetch all outputs)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for args in variants]
        for o in outs:
            np.asarray(o)
        best = min(best, time.perf_counter() - t0)
    return best / len(variants)


def main():
    import jax
    from __graft_entry__ import _example_batch

    backend = jax.default_backend()
    if backend == "tpu":
        from rovaca_tpu.ops.pairhmm.kernel import pairhmm_pallas as fn
    else:
        from rovaca_tpu.ops.pairhmm.xla import pairhmm_xla as fn

    # realistic shapes: 4x128 reads x 4x8 haps, reads ~128bp, haps ~384bp
    gr, gh, lr, lh = 4, 4, 128, 384
    variants = []
    for seed in range(4):
        args = _example_batch(gr=gr, gh=gh, lr=lr, lh=lh, seed=seed)
        variants.append(tuple(jax.device_put(a) for a in args))

    out = fn(*variants[0])
    np.asarray(out)  # compile + warmup

    dt = time_fn(fn, variants, reps=3 if backend == "tpu" else 1)

    # DP cells actually swept = padded grid (the kernel sweeps Lr*Lh per pair)
    n_pairs = (gh * 8) * (gr * 128)
    cells = n_pairs * lr * lh

    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "pairhmm_cell_updates_per_sec",
        "value": round(gcups * 1e9),
        "unit": "cells/s",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()
