"""run_distributed at process_count=2: real jax.distributed ranks on CPU.

Spawns two CLI subprocesses wired through JAX_COORDINATOR_ADDRESS (the
production multi-host path, parallel/distributed.py) and checks the rank-0
merged VCF against a plain single-process run of the same corpus.
"""

import os
import socket
import subprocess
import sys

import pytest

import simdata

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_run_matches_single(tmp_path):
    fasta, bam, truth, ref = simdata.make_standard_case(tmp_path)

    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_"))}
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["PYTHONPATH"] = REPO

    single = str(tmp_path / "single.vcf")
    cp = subprocess.run(
        [sys.executable, "-m", "rovaca_tpu.cli", "HaplotypeCaller",
         "-i", bam, "-r", fasta, "-o", single, "--pairhmm-engine", "xla"],
        env=base_env, capture_output=True, text=True, timeout=240)
    assert cp.returncode == 0, cp.stderr[-2000:]

    merged = str(tmp_path / "dist.vcf")
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(base_env)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "rovaca_tpu.cli", "HaplotypeCaller",
             "-i", bam, "-r", fasta, "-o", merged,
             "--pairhmm-engine", "xla"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    def rows(path):
        with open(path) as f:
            return [ln for ln in f if not ln.startswith("#")]

    got = rows(merged)
    want = rows(single)
    assert len(got) == len(want) and got, (len(got), len(want))
    # site/genotype-level identity; depth fields may differ only at
    # downsampled pileups (traversal-split LCG stream — same semantics as
    # the reference under -L splits). The standard case has none, so the
    # records must be byte-identical.
    assert got == want
