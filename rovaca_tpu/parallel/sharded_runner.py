"""Interval-sharded multi-process/multi-host run driver.

The BASELINE north star: FASTA replicated per host, genomic intervals sharded
data-parallel, per-shard VCF streams merged in coordinate order (the
reference's source_id-ordered writer merge — reference: src/haplotypecaller/
writer/writer.cpp:147-196 — lifted to shard granularity).

Each shard is an independent CLI invocation restricted to its core span with
boundary context; shard outputs concatenate in genome order (a shard only
emits records whose start lies in its core span, so the merge is exact).
On a multi-host pod, shards map to hosts (jax.process_index()); here they run
as local subprocesses sharing the chip.
"""

import os
import subprocess
import sys

from ..io.fasta import FastaFile
from .sharding import shard_intervals


def compute_shards(reference_path, n_shards, contig=None, start=None,
                   end=None):
    """Shard (contig, core_start, core_end) spans by base count."""
    fasta = FastaFile(reference_path)
    if contig is not None:
        intervals = [(contig, start or 0,
                      end or fasta.contig_length(contig))]
    else:
        intervals = [(c, 0, length)
                     for c, length in fasta.contig_dict.items()]
    return shard_intervals(intervals, n_shards)


def run_sharded(cli_args, n_shards, output_path, parallel=True):
    """Run the HaplotypeCaller CLI once per shard and merge outputs.

    cli_args: the argv list WITHOUT -o/-L (they're added per shard).
    Returns the list of per-shard record counts.
    """
    ref = cli_args[cli_args.index("-r") + 1] if "-r" in cli_args else \
        cli_args[cli_args.index("--reference") + 1]
    shards = compute_shards(ref, n_shards)

    # index every input BAM once up front so each shard's -L becomes an
    # indexed seek instead of a whole-file scan (the reference hands each
    # worker an hts_itr over the shared index; here the .bai is the shared
    # structure and shard processes open it read-only)
    for flag in ("-i", "--input"):
        for k, a in enumerate(cli_args):
            if a == flag and k + 1 < len(cli_args):
                bam = cli_args[k + 1]
                from ..io.bai import build_index, find_index
                if find_index(bam) is None:
                    try:
                        build_index(bam)
                    except (ValueError, OSError):
                        pass  # unindexable input: shards fall back to scans

    procs = []
    shard_files = []
    for si, shard in enumerate(shards):
        if not shard:
            continue
        # one invocation per contiguous span in the shard
        for pi, (contig, _ps, _pe, core_s, core_e) in enumerate(shard):
            out = f"{output_path}.shard{si:04d}_{pi:03d}"
            shard_files.append(out)
            argv = [sys.executable, "-m", "rovaca_tpu.cli",
                    "HaplotypeCaller", *cli_args, "-o", out,
                    "-L", f"{contig}:{core_s + 1}-{core_e}"]
            env = dict(os.environ)
            # CPU-pinned workers never touch the TPU: drop the tunnel
            # plugin's sitecustomize hook so each rank skips the ~2s jax
            # import at interpreter start (pure-CPU runs stay jax-free)
            if env.get("JAX_PLATFORMS", "").strip() == "cpu":
                env.pop("PALLAS_AXON_POOL_IPS", None)
            if parallel:
                # ROVACA_PIN_SHARDS: give each worker its own core, like a
                # multi-host rank owns its host. Without pinning, N workers
                # x (XLA pool + OMP + overlap thread) oversubscribe an
                # N-core box and thrash (measured 64s vs 33.5s unsharded on
                # a 2-core host; pinned workers restore linear splits).
                preexec = None
                if os.environ.get("ROVACA_PIN_SHARDS"):
                    core = len(procs) % (os.cpu_count() or 1)
                    preexec = (lambda c=core:
                               os.sched_setaffinity(0, {c}))
                procs.append(subprocess.Popen(argv, env=env,
                                              stderr=subprocess.DEVNULL,
                                              preexec_fn=preexec))
            else:
                subprocess.run(argv, env=env, check=True)
    for p in procs:
        if p.wait() != 0:
            raise RuntimeError(f"shard process failed: {p.args}")

    counts = merge_shard_vcfs(shard_files, output_path)
    for f in shard_files:
        os.unlink(f)
    return counts


def _open_vcf_lines(path):
    """Iterate text lines of a plain or BGZF/gzip-compressed VCF."""
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        import io

        from ..io import bgzf
        fh = io.TextIOWrapper(bgzf.open_read(path))
    else:
        fh = open(path)
    return fh


def merge_shard_vcfs(shard_files, output_path, compression_level=6):
    """Coordinate-ordered merge: header from shard 0, bodies concatenated
    (shards are genome-ordered and emit only their core span).

    BGZF-aware on both sides: shard inputs may be plain or compressed, and
    a `.gz` output is written as true BGZF and re-indexed with a fresh .tbi
    (mirrors the unsharded writer's close path, reference writer.cpp:97-98)."""
    counts = []
    if output_path.endswith(".gz"):
        import io

        from ..io import bgzf
        from ..io.vcf import _BgzfRaw
        out = io.TextIOWrapper(_BgzfRaw(bgzf.Writer(output_path,
                                                    compression_level)))
    else:
        out = open(output_path, "w")
    try:
        wrote_header = False
        for path in shard_files:
            n = 0
            with _open_vcf_lines(path) as fh:
                for line in fh:
                    if line.startswith("#"):
                        if not wrote_header:
                            out.write(line)
                        continue
                    out.write(line)
                    n += 1
            wrote_header = True
            counts.append(n)
    finally:
        out.close()
    if output_path.endswith(".gz"):
        from ..io import tabix
        tabix.build_index(output_path)
    return counts


