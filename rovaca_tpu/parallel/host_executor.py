"""Host-side process parallelism for region preparation/genotyping.

The reference's host parallelism is a shared thread pool over per-region jobs
(reference: src/haplotypecaller/haplotypecaller.cpp:97,117-146). Python's GIL
pushes the equivalent to processes: region *preparation* (finalize, assemble,
trim — pure host CPU) fans out to a spawn-based pool while the main process
keeps exclusive ownership of the TPU for scoring. Output order is preserved
by keying futures, mirroring the reference writer's source_id reordering.
"""

import os
from concurrent.futures import ProcessPoolExecutor

_WORKER_CALLER = None


def _worker_init(config, contig_lengths):
    # workers must never grab the TPU: force CPU before any jax import
    # (and after — the tunnel sitecustomize overrides the env var)
    from ..utils.platform import force_cpu
    force_cpu()
    global _WORKER_CALLER
    from ..pipeline.hc_engine import RegionCaller
    _WORKER_CALLER = RegionCaller(config, contig_lengths)


def _worker_prepare(task):
    region, reads, ref_window, contig = task
    return _WORKER_CALLER.prepare_region(region, reads, ref_window, contig)


class HostExecutor:
    """Fan region prep out to worker processes; None workers = inline."""

    def __init__(self, workers, config, contig_lengths):
        self.workers = workers
        self._pool = None
        if workers and workers > 1:
            import multiprocessing as mp
            ctx = mp.get_context("spawn")
            self._pool = ProcessPoolExecutor(
                max_workers=workers, mp_context=ctx,
                initializer=_worker_init,
                initargs=(config, contig_lengths))

    def map_prepare(self, caller, tasks):
        """tasks: [(key, region, reads, ref_window, contig)].
        Returns {key: PreparedRegion-or-calls} preserving input association.
        """
        out = {}
        if self._pool is None:
            for key, region, reads, ref_window, contig in tasks:
                out[key] = caller.prepare_region(region, reads, ref_window,
                                                 contig)
            return out
        futures = {}
        for key, region, reads, ref_window, contig in tasks:
            futures[key] = self._pool.submit(
                _worker_prepare, (region, reads, ref_window, contig))
        for key, fut in futures.items():
            out[key] = fut.result()
        return out

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
