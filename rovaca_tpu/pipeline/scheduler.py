"""Cross-region PairHMM batching runtime.

The reference keeps one shared thread pool fed with per-region jobs
(reference: src/haplotypecaller/haplotypecaller_engine.cpp:119-146). The TPU
equivalent: regions in a window are *prepared* on host (assembly, trimming),
their (read, hap) tile batches bucketed by padded shape, and all regions
sharing a bucket are scored in ONE indexed-kernel launch — amortizing
dispatch latency and filling the chip.
"""

import dataclasses

import numpy as np

from .. import constants as C
from ..ops import pairhmm
from ..ops.pairhmm import prep
from ..ops.pairhmm.api import log10_with_rescue, normalize_likelihoods, \
    poorly_modelled_mask


@dataclasses.dataclass
class RegionJob:
    key: object
    reads: list
    haps: list             # bytes
    pcr_model: str
    batch: object = None   # PairBatch
    result: object = None  # (lik[h][r_kept], kept_indices)


class PairHMMScheduler:
    """Collect region scoring jobs; flush in bucketed mega-batches.

    With more than one local accelerator (a pod-slice host), batches are
    dispatched round-robin across devices — independent region groups are
    the natural data-parallel unit, no collectives needed."""

    def __init__(self, engine="auto", min_quality_threshold=None,
                 devices=None):
        self.engine = engine
        self.mqt = (C.MIN_QUALITY_THRESHOLD if min_quality_threshold is None
                    else min_quality_threshold)
        self.jobs = []
        self._devices_override = devices

    def _devices(self):
        if self._devices_override is not None:
            return list(self._devices_override)
        import jax
        try:
            return jax.local_devices()
        except Exception:
            return []

    def submit(self, key, reads, hap_seqs, pcr_model="CONSERVATIVE"):
        job = RegionJob(key=key, reads=reads, haps=list(hap_seqs),
                       pcr_model=pcr_model)
        self.jobs.append(job)
        return job

    # ------------------------------------------------------------------
    def run(self):
        """Score all submitted jobs; returns {key: (lik, kept)}."""
        self.dispatch()
        return self.collect()

    # device-launch shape discipline: every jit shape comes from this small
    # closed set, so a cold run compiles a handful of kernels (cacheable via
    # the persistent compile cache) instead of one per flush-group size
    NR_MAX = 128      # read tiles per launch (128 x 128 reads)
    NH_MAX = 128      # hap tiles per launch (128 x 8 haps; ~3KB/tile wire)
    G_MAX = 1024      # (hap-tile, read-tile) pairs per launch
    NR_LADDER = (8, 32, 128)
    NH_LADDER = (8, 32, 128)
    G_LADDER = (64, 256, 1024)
    # below this many total tiles a TPU round-trip (tunnel latency +
    # possible compile) loses to the host XLA path — fall back
    SMALL_TILES = 48

    # sticky auto-engine decision on TPU backends: the first flush group
    # races the device path against the native host engine on identical
    # work; whichever wins handles the rest of the run. A tunnel-attached
    # chip (38ms round-trips, remote compiles) can lose to the host SIMD
    # engine on small corpora — "TPU-native" must never mean "slower with
    # the TPU than without it".
    _auto_probe = None   # None = unprobed; "device" | "native"

    def dispatch(self):
        """Build batches and enqueue all device work WITHOUT fetching.

        Pair with collect(): the caller can do host work (genotyping the
        previous window) while the device sweeps this one — the TPU
        analogue of the reference's producer/consumer thread overlap
        (haplotypecaller.cpp:117-146)."""
        import os

        # consult the (cheap, persisted) auto-probe verdict BEFORE asking
        # for the backend name: on a native-verdict machine the whole run
        # must complete without ever initializing the tunnel-attached
        # backend (a first jax.default_backend() costs seconds of remote
        # handshake that a native-engine run never repays)
        choice = None
        if (self.engine == "auto"
                and not os.environ.get("ROVACA_NO_AUTO_PROBE")):
            from ..native import pairhmm_native
            if pairhmm_native.available():
                choice = PairHMMScheduler._auto_probe
                if choice is None:
                    choice = self._load_probe_cache()
                    PairHMMScheduler._auto_probe = choice

        if self.engine == "auto" and choice == "native":
            use_indexed = False
        else:
            from ..utils.platform import backend_name

            est_tiles = sum(
                (-(-len(j.reads) // prep.READ_TILE))
                * (-(-len(j.haps) // prep.HAP_TILE)) for j in self.jobs)
            small_floor = int(os.environ.get("ROVACA_TPU_MIN_TILES",
                                             str(self.SMALL_TILES)))
            use_indexed = (self.engine in ("auto", "pallas")
                           and backend_name() == "tpu"
                           and (self.engine == "pallas"
                                or est_tiles >= small_floor))
            if (use_indexed and self.engine == "auto"
                    and not os.environ.get("ROVACA_NO_AUTO_PROBE")):
                from ..native import pairhmm_native
                if (pairhmm_native.available() and choice is None
                        and self.jobs):
                    self._collect_fn = self._probe_engines()
                    return
        if use_indexed:
            from ..ops.pairhmm import compact
            for job in self.jobs:
                job.batch = compact.build_pair_batch_compact(
                    job.reads, job.haps, pcr_model=job.pcr_model,
                    min_quality_threshold=self.mqt)
            self._collect_fn = self._dispatch_indexed()
        else:
            for job in self.jobs:
                job.batch = prep.build_pair_batch(
                    job.reads, job.haps, pcr_model=job.pcr_model,
                    min_quality_threshold=self.mqt)
            from ..native import pairhmm_native
            if (self.engine in ("auto", "native")
                    and pairhmm_native.available()):
                # host-native engine: the reference's CPU SIMD engine slot
                # (pairhmm_engine.cpp:22-53). No jit, no copies — the right
                # call for pure-CPU runs and for the small-input fallback on
                # tunnel-attached TPU sessions.
                self._collect_fn = self._dispatch_native()
            elif self.engine == "native":
                raise RuntimeError("native pairhmm engine unavailable "
                                   "(g++ build failed?)")
            else:
                self._collect_fn = self._dispatch_single(
                    force_cpu=backend_name() == "tpu")

    @staticmethod
    def _probe_cache_path():
        import os
        d = os.environ.get("ROVACA_JAX_CACHE",
                           os.path.expanduser("~/.cache/rovaca_jax"))
        return os.path.join(d, "engine_probe.json")

    @classmethod
    def _load_probe_cache(cls):
        """Probe verdicts persist per machine (the link quality that
        decides them is a property of the attachment, not the corpus);
        ROVACA_REPROBE=1 forces a fresh measurement."""
        import json
        import os
        if os.environ.get("ROVACA_REPROBE"):
            return None
        try:
            with open(cls._probe_cache_path()) as f:
                return json.load(f).get("choice")
        except (OSError, ValueError):
            return None

    @classmethod
    def _store_probe_cache(cls, choice, t_native, t_device):
        import json
        import os
        try:
            path = cls._probe_cache_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                json.dump({"choice": choice, "t_native": t_native,
                           "t_device": (None if t_device == float("inf")
                                        else t_device)}, f)
        except OSError:
            pass

    def _probe_engines(self):
        """Score the current flush group on BOTH the native host engine
        and the PRODUCTION device path (compact indexed launches), time
        them, and pin the winner for the whole run. Results come from the
        device leg (the engines are float-validated against each other:
        tests/test_pairhmm.py), or from native if the device leg fails."""
        import time

        from ..native import pairhmm_native
        from ..utils.platform import enable_persistent_compilation_cache
        enable_persistent_compilation_cache()
        from ..utils import logging as rlog

        jobs = list(self.jobs)
        dense = []
        for job in jobs:
            dense.append(prep.build_pair_batch(
                job.reads, job.haps, pcr_model=job.pcr_model,
                min_quality_threshold=self.mqt))
        t0 = time.perf_counter()
        raws = []
        for b in dense:
            raws.append(pairhmm_native.pairhmm_dense(
                b.trans, b.rbase, b.rlen, b.hbase, b.hlen))
        t_native = time.perf_counter() - t0

        # device leg on a worker thread with a hard deadline: a cold
        # tunnel compile can cost minutes, and a probe must never cost
        # more than a few times the work it is sizing. If the deadline
        # passes, native wins and the stray device work is abandoned.
        import os
        import threading

        deadline = float(os.environ.get("ROVACA_PROBE_DEADLINE",
                                        str(max(4.0 * t_native, 20.0))))
        state = {}

        # shadow jobs: the device leg must share nothing with the real
        # jobs, so an over-deadline leg can be abandoned without racing
        shadow_sched = PairHMMScheduler(engine="pallas",
                                        min_quality_threshold=self.mqt)
        for job in jobs:
            shadow_sched.submit(job.key, job.reads, job.haps,
                                pcr_model=job.pcr_model)

        def device_leg():
            try:
                from ..ops.pairhmm import compact
                t0 = time.perf_counter()
                for sj in shadow_sched.jobs:
                    sj.batch = compact.build_pair_batch_compact(
                        sj.reads, sj.haps, pcr_model=sj.pcr_model,
                        min_quality_threshold=self.mqt)
                collect_device = shadow_sched._dispatch_indexed()
                collect_device()
                state["t"] = time.perf_counter() - t0
            except Exception:
                state["err"] = True
        t = threading.Thread(target=device_leg, name="engine-probe",
                             daemon=True)
        t.start()
        t.join(deadline)
        t_device = state.get("t", float("inf"))
        device_ok = "t" in state
        choice = "native" if t_native <= t_device else "device"
        PairHMMScheduler._auto_probe = choice
        self._store_probe_cache(choice, t_native, t_device)
        rlog.logger.info(
            "auto-engine probe: native %.2fs vs device %s -> %s",
            t_native,
            f"{t_device:.2f}s" if device_ok
            else f">deadline {deadline:.0f}s", choice)

        def collect():
            for job, b, raw in zip(jobs, dense, raws):
                job.batch = b
                self._postprocess(job, b.result_matrix(raw))
        return collect

    def collect(self):
        """Fetch + postprocess everything dispatched; {key: (lik, kept)}."""
        if self.jobs and getattr(self, "_collect_fn", None) is not None:
            self._collect_fn()
            self._collect_fn = None
        out = {}
        for job in self.jobs:
            out[job.key] = job.result
        self.jobs = []
        return out

    def _postprocess(self, job, raw_matrix):
        lik_hr = log10_with_rescue(raw_matrix, job.reads, job.haps,
                                   pcr_model=job.pcr_model,
                                   min_quality_threshold=self.mqt)
        lik_rh = normalize_likelihoods(lik_hr.T)
        drop = poorly_modelled_mask([len(r.bases) for r in job.reads],
                                    lik_rh)
        kept = np.nonzero(~drop)[0]
        job.result = (lik_rh[kept].T.copy(), kept)

    def _dispatch_native(self):
        """Score every job's dense batch with the host-native engine.

        Scoring runs on a background thread started at dispatch time, so the
        caller's dispatch()/collect() split buys the same producer/consumer
        overlap the device paths get (the OMP pool parks passively between
        jobs; genotyping of the previous window rides the other core)."""
        import threading

        from ..native import pairhmm_native

        jobs = list(self.jobs)
        raws = [None] * len(jobs)
        error = []

        def score():
            try:
                for k, job in enumerate(jobs):
                    b = job.batch
                    raws[k] = pairhmm_native.pairhmm_dense(
                        b.trans, b.rbase, b.rlen, b.hbase, b.hlen)
            except BaseException as e:  # re-raised in collect()
                error.append(e)
        t = threading.Thread(target=score, name="pairhmm-native",
                             daemon=True)
        t.start()

        def collect():
            t.join()
            if error:
                raise error[0]
            for k, job in enumerate(jobs):
                self._postprocess(job, job.batch.result_matrix(raws[k]))
        return collect

    def _dispatch_single(self, force_cpu=False):
        """Per-job kernel launches, dispatched round-robin across local
        devices, all enqueued before the first fetch. force_cpu pins the
        work to the host CPU backend (small-input fallback on TPU
        sessions: a tunnel round-trip would dominate)."""
        import jax
        from ..ops.pairhmm.api import default_engine
        from ..ops.pairhmm.kernel import pairhmm_pallas
        from ..ops.pairhmm.xla import pairhmm_xla

        engine = default_engine() if self.engine == "auto" else self.engine
        if force_cpu and engine in ("pallas", "xla"):
            engine = "xla"
        if engine == "pallas":
            fn = pairhmm_pallas
        elif engine == "pallas_interpret":
            fn = lambda *a: pairhmm_pallas(*a, interpret=True)  # noqa: E731
        else:
            fn = pairhmm_xla
        if force_cpu:
            try:
                devices = [jax.devices("cpu")[0]]
            except RuntimeError:
                devices = self._devices()
        else:
            devices = self._devices()
        pending = []
        for i, job in enumerate(self.jobs):
            b = job.batch
            args = (b.trans, b.rbase, b.rlen, b.hbase, b.hlen)
            if force_cpu and devices:
                args = tuple(jax.device_put(a, devices[0]) for a in args)
            elif len(devices) > 1:
                dev = devices[i % len(devices)]
                args = tuple(jax.device_put(a, dev) for a in args)
            pending.append((job, fn(*args)))

        def collect():
            for job, out in pending:
                self._postprocess(job,
                                  job.batch.result_matrix(np.asarray(out)))
        return collect

    @classmethod
    def _ladder(cls, n, ladder):
        for v in ladder:
            if v >= n:
                return v
        return ladder[-1]

    @staticmethod
    def _fixed_shapes():
        """Full-envelope launches on accelerators (compiles are the scarce
        resource there); size-laddered launches on host CPU (where padding
        tiles cost real compute)."""
        import os

        from ..utils.platform import backend_name
        env = os.environ.get("ROVACA_FIXED_LAUNCH")
        if env is not None:
            return env not in ("0", "false", "")
        return backend_name() not in ("cpu",)

    @classmethod
    def prewarm_async(cls, read_len, hap_lens=(384, 512)):
        """Kick off background compilation of the canonical launch shapes.

        On a tunnel-attached chip each new jit shape costs ~25s of remote
        XLA compile; overlapping those with the host's BAM/assembly work
        hides the cold-start the reference doesn't have (its SIMD needs no
        compile step; reference: src/haplotypecaller/pairhmm/
        pairhmm_engine.cpp:22-53 dispatches function pointers at startup).
        Compiled executables land in the persistent cache, so this is
        one-time per machine. Returns the started threads."""
        import threading

        from ..utils.platform import backend_name

        if backend_name() == "cpu" or not cls._fixed_shapes():
            return []
        from ..utils.platform import enable_persistent_compilation_cache
        enable_persistent_compilation_cache()
        from ..ops.pairhmm import prep
        from ..ops.pairhmm.compact import build_pair_batch_compact

        probe = build_pair_batch_compact.__defaults__
        len_buckets, hap_len_buckets = probe[-2], probe[-1]
        Lr = next((b for b in len_buckets if b >= read_len),
                  prep._round_up(read_len, 128))

        def compile_shape(lh):
            try:
                from ..ops.pairhmm.compact import pairhmm_indexed_compact
                q = np.zeros((cls.NR_MAX, Lr, 128), np.uint8)
                rb = np.zeros((cls.NR_MAX, Lr, 128), np.int8)
                rl = np.zeros((cls.NR_MAX, 1, 128), np.int32)
                hc = np.zeros((cls.NH_MAX, lh, 8), np.int8)
                hl = np.zeros((cls.NH_MAX, 8, 1), np.int32)
                gidx = np.zeros(cls.G_MAX, np.int32)
                pairhmm_indexed_compact(q, q, q, rb, rl, hc, hl,
                                        gidx, gidx).block_until_ready()
            except Exception:   # prewarm is best-effort
                pass

        threads = []
        for lh in hap_lens:
            if lh not in hap_len_buckets:
                continue
            t = threading.Thread(target=compile_shape, args=(lh,),
                                 name=f"prewarm-{Lr}x{lh}", daemon=True)
            t.start()
            threads.append(t)
        return threads

    def _pack_launches(self):
        """Greedy-pack jobs of a (Lr, Lh) bucket into launches bounded by
        (NR_MAX, NH_MAX, G_MAX); each launch pads its tile stacks and pair
        count UP the fixed ladders, so every jit shape belongs to the small
        closed set {Lr} x {Lh} x NR_LADDER x NH_LADDER x G_LADDER."""
        groups = {}
        for job in self.jobs:
            b = job.batch
            groups.setdefault((b.max_read_len, b.max_hap_len),
                              []).append(job)
        launches = []
        for (lr, lh), jobs in groups.items():
            cur, rt, ht, pr = [], 0, 0, 0
            for job in jobs:
                b = job.batch
                jp = b.gh * b.gr
                assert (b.gr <= self.NR_MAX and b.gh <= self.NH_MAX
                        and jp <= self.G_MAX), \
                    (b.gr, b.gh, jp, "region exceeds launch envelope")
                if cur and (rt + b.gr > self.NR_MAX
                            or ht + b.gh > self.NH_MAX
                            or pr + jp > self.G_MAX):
                    launches.append(((lr, lh), cur))
                    cur, rt, ht, pr = [], 0, 0, 0
                cur.append(job)
                rt += b.gr
                ht += b.gh
                pr += jp
            if cur:
                launches.append(((lr, lh), cur))
        return launches

    def _dispatch_indexed(self):
        """Pack jobs into canonical-shape indexed launches.

        Uses the compact integer layout (ops/pairhmm/compact.py): channels
        and lane-broadcast hap tiles materialize on device, so the
        host->device payload is ~10-500x smaller than dense."""
        import jax
        import jax.numpy as jnp
        from ..ops.pairhmm.compact import pairhmm_indexed_compact

        # dispatch every launch before fetching any result: device work and
        # transfer latency overlap across launches (and across devices on a
        # pod-slice host — launches round-robin over local chips)
        devices = self._devices()
        pending = []
        for gi, ((lr, lh), jobs) in enumerate(self._pack_launches()):
            q_t, gi_t, gc_t, rbase, rlen, hcode, hlen = ([] for _ in range(7))
            pairs = []        # (job, h_tile_global, r_tile_global)
            for job in jobs:
                b = job.batch
                r_off = len(rlen)
                h_off = len(hlen)
                for g in range(b.gr):
                    q_t.append(b.q[g])
                    gi_t.append(b.gi[g])
                    gc_t.append(b.gc[g])
                    rbase.append(b.rbase[g])
                    rlen.append(b.rlen[g])
                for g in range(b.gh):
                    hcode.append(b.hcode[g])
                    hlen.append(b.hlen[g])
                for hh in range(b.gh):
                    for rr in range(b.gr):
                        pairs.append((job, h_off + hh, r_off + rr))

            if self._fixed_shapes():
                # tunnel-attached TPU: a recompile (~25s over the wire)
                # costs far more than padded transfer/compute, so every
                # launch uses the full envelope -> jit shapes = {Lr}x{Lh}
                G_pad = self.G_MAX
            else:
                G_pad = self._ladder(len(pairs), self.G_LADDER)
            hidx = np.zeros(G_pad, dtype=np.int32)
            ridx = np.zeros(G_pad, dtype=np.int32)
            for i, (_, hh, rr) in enumerate(pairs):
                hidx[i] = hh
                ridx[i] = rr

            if self._fixed_shapes():
                nr_pad, nh_pad = self.NR_MAX, self.NH_MAX
            else:
                nr_pad = self._ladder(len(rlen), self.NR_LADDER)
                nh_pad = self._ladder(len(hlen), self.NH_LADDER)

            def stack_to(tiles, n_pad):
                # padding tiles are never indexed by hidx/ridx; they only
                # ride the transfer
                out = np.zeros((n_pad,) + tiles[0].shape, tiles[0].dtype)
                out[:len(tiles)] = np.stack(tiles)
                return out

            args = (stack_to(q_t, nr_pad), stack_to(gi_t, nr_pad),
                    stack_to(gc_t, nr_pad), stack_to(rbase, nr_pad),
                    stack_to(rlen, nr_pad), stack_to(hcode, nh_pad),
                    stack_to(hlen, nh_pad), hidx, ridx)
            if len(devices) > 1:
                dev = devices[gi % len(devices)]
                args = tuple(jax.device_put(a, dev) for a in args)
            else:
                args = tuple(jnp.asarray(a) for a in args)
            device_out = pairhmm_indexed_compact(*args)
            pending.append((jobs, pairs, device_out))

        def collect():
            per_job = {}
            raw_by_job = {}
            for jobs, pairs, device_out in pending:
                raw = np.asarray(device_out)
                for i, (job, hh, rr) in enumerate(pairs):
                    per_job.setdefault(id(job), {})[(hh, rr)] = raw[i]
                for job in jobs:
                    raw_by_job[id(job)] = job
            # a job's tiles all live in one launch (packing is job-atomic)
            for jid, tiles in per_job.items():
                job = raw_by_job[jid]
                b = job.batch
                full = np.zeros((b.gh, b.gr, 8, 128), dtype=np.float32)
                h_off = min(h for h, _ in tiles)
                r_off = min(r for _, r in tiles)
                for (hh, rr), tile in tiles.items():
                    full[hh - h_off, rr - r_off] = tile
                self._postprocess(job, b.result_matrix(full))
        return collect
