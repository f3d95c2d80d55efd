"""End-to-end race: reference binary vs ours (TPU default / host CPU).

Runs each contender sequentially on the same error-model corpus (never two
heavy drives at once on this 2-core host), emits RACE.json with wall-clock,
reads/s, and a field-level diff result for each of our outputs vs the
reference's.

Note on the sharded contender: reservoir downsampling consumes a Java-LCG
stream in traversal order (reference: src/common/downsampler_hc.h:94-210),
so an interval-split run picks different survivors at >50-deep alignment
starts than a whole-contig run — exactly as the reference binary does under
-L interval splits. A DIVERGENT diff for *_2shard that is limited to
depth/qual fields at saturated pileups is this known semantic, not a bug
(the unsharded contenders must MATCH).

Usage: python scripts/race_e2e.py <outdir> [genome_len] [coverage] [seed]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_BIN = os.path.join(REPO, ".refbuild", "ref", "build-dev", "bin",
                       "rovaca")


def _run(cmd, env=None, tag=""):
    t0 = time.perf_counter()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=3600)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        raise SystemExit(f"{tag} failed rc={r.returncode}")
    return dt


def main():
    outdir = sys.argv[1]
    genome_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    coverage = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 424242

    ge = os.path.join(REPO, "scripts", "golden_e2e.py")
    bam = os.path.join(outdir, "sample.bam")
    if not os.path.exists(bam):
        _run([sys.executable, ge, "gen", outdir, str(genome_len),
              str(coverage), str(seed)], tag="gen")
    # count reads once (header-less line count via our BAM reader)
    from rovaca_tpu.io.bam import BamReader
    n_reads = sum(1 for _ in BamReader(bam))

    results = {"genome_len": genome_len, "coverage": coverage, "seed": seed,
               "n_reads": n_reads, "contenders": {}}

    # 1. reference binary (2 threads = all cores)
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = os.path.dirname(REF_BIN)
    dt = _run([REF_BIN, "HaplotypeCaller", "-I", bam,
               "-R", os.path.join(outdir, "ref.fa"),
               "-O", os.path.join(outdir, "ref.vcf"),
               "--nthreads", "2"], env=env, tag="reference")
    results["contenders"]["reference_avx"] = {
        "wall_s": round(dt, 2), "reads_per_s": round(n_reads / dt)}
    print(f"reference: {dt:.2f}s", flush=True)

    # 2. ours, default TPU path (warm persistent cache assumed; the race is
    #    steady-state throughput, not first-ever-machine compile time)
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
        "~/.cache/rovaca_jax")
    env["ROVACA_NATIVE_THREADS"] = "2"
    # ours_cpu: auto resolves to the native host SIMD engine (the
    # reference-parity CPU engine slot); ours_cpu_2shard races the
    # reference's 2 threads with 2 interval-shard processes.
    for name, engine, platforms, shards in (
            ("ours_tpu", "auto", None, 0),
            ("ours_cpu", "auto", "cpu", 0),
            ("ours_cpu_2shard", "auto", "cpu", 2)):
        env2 = dict(env)
        if platforms:
            env2["JAX_PLATFORMS"] = platforms
            if platforms == "cpu":
                # pure-CPU contenders skip the TPU tunnel plugin (and its
                # interpreter-start jax import) entirely
                env2.pop("PALLAS_AXON_POOL_IPS", None)
        out = os.path.join(outdir, f"{name}.vcf")
        cmd = [sys.executable, "-m", "rovaca_tpu.cli",
               "HaplotypeCaller", "-i", bam,
               "-r", os.path.join(outdir, "ref.fa"),
               "-o", out, "--pairhmm-engine", engine]
        if shards:
            cmd += ["--shards", str(shards)]
            env2["ROVACA_NATIVE_THREADS"] = "1"
        dt = _run(cmd, env=env2, tag=name)
        results["contenders"][name] = {
            "wall_s": round(dt, 2), "reads_per_s": round(n_reads / dt)}
        print(f"{name}: {dt:.2f}s", flush=True)
        # field-level diff vs the reference output (golden_e2e reads the
        # fixed ours.vcf name)
        import shutil
        shutil.copyfile(out, os.path.join(outdir, "ours.vcf"))
        cp = subprocess.run([sys.executable, ge, "diff", outdir],
                            capture_output=True, text=True)
        tail = cp.stdout.strip().splitlines()
        results["contenders"][name]["diff_vs_ref"] = (
            tail[-1] if tail else f"diff rc={cp.returncode}")

    ref_t = results["contenders"]["reference_avx"]["wall_s"]
    for k, v in results["contenders"].items():
        v["vs_reference"] = round(ref_t / v["wall_s"], 3)
    path = os.path.join(outdir, "RACE.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["contenders"], indent=1))
    print("->", path)


if __name__ == "__main__":
    main()
