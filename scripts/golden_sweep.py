"""Multi-seed golden sweep: gen → ref → ours → diff for VCF and GVCF.

Runs scripts/golden_e2e.py for a list of fresh seeds at >=400kb and prints a
summary table. Used each round to prove bit-equivalence holds on seeds the
builder did not tune against (round-5 requirement after the seed-867530
one-phred GVCF divergence).

Usage: python scripts/golden_sweep.py [outroot] [seed ...]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
E2E = os.path.join(REPO, "scripts", "golden_e2e.py")

DEFAULT_SEEDS = [98172435, 5550123, 31337, 777000777, 20260821, 424243]
GENOME_LEN = 400_000
COVERAGE = 30


def run(args, **kw):
    return subprocess.run([sys.executable, E2E] + args, check=True, **kw)


def last_result(args):
    p = subprocess.run([sys.executable, E2E] + args,
                       capture_output=True, text=True)
    out = (p.stdout + p.stderr).strip().splitlines()
    for line in reversed(out):
        if line.startswith("RESULT:"):
            return line.split(":", 1)[1].strip()
    return "ERROR(rc=%d)" % p.returncode


def main():
    argv = sys.argv[1:]
    outroot = argv[0] if argv else "/tmp/golden_sweep"
    seeds = [int(s) for s in argv[1:]] or DEFAULT_SEEDS
    os.makedirs(outroot, exist_ok=True)
    rows = []
    for seed in seeds:
        d = os.path.join(outroot, "s%d" % seed)
        run(["gen", d, str(GENOME_LEN), str(COVERAGE), str(seed)],
            stdout=subprocess.DEVNULL)
        res = {}
        for mode, flag in (("vcf", []), ("gvcf", ["--gvcf"])):
            run(["ref", d] + flag, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            run(["ours", d] + flag, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            res[mode] = last_result(["diff", d] + flag)
        rows.append((seed, res["vcf"], res["gvcf"]))
        print("seed %-10d  vcf=%-8s gvcf=%s" % rows[-1], flush=True)
    ok = all(r[1] == "MATCH" and r[2] == "MATCH" for r in rows)
    print("SWEEP:", "ALL MATCH" if ok else "DIVERGENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
