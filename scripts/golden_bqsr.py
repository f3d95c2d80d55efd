"""BQSR golden equivalence: run the REAL reference binary and rovaca_tpu on
the same BAM with the same GATKReport recalibration table and diff calls.

Because BQSR recalibrates base quals before any calling, an exact VCF match
(QUAL/PL/annotations) under a table that shifts quals non-trivially is
end-to-end evidence that the recalibration math agrees (hierarchical
Bayesian empirical-qual deltas over RG/QS/Context/Cycle covariates —
reference: src/haplotypecaller/bqsr/bqsr_read_transformer.cpp:170-243,
table parse :245-372).

The generated table exercises every lookup level:
  - RecalTable0: one RG row with EstimatedQReported != reported mean
  - RecalTable1: rows for every qual in the BAM, shifted empirical quals
  - RecalTable2: Context rows (all 16 2-mers) and Cycle rows, mixed signs

Usage:
  python scripts/golden_bqsr.py gen  <dir> [genome_len] [coverage] [seed]
  python scripts/golden_bqsr.py ours <dir>
  python scripts/golden_bqsr.py ref  <dir>
  python scripts/golden_bqsr.py diff <dir>
"""

import itertools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import golden_e2e


def write_recal_table(path, quals, rgs=("rg1", "rg2")):
    """A GATKReport exercising RG/QS/Context/Cycle lookups
    (format: bqsr_read_transformer.cpp:254-293 sscanf protocol)."""
    args_rows = [
        ("binary_tag_name", "null"),
        ("covariate",
         "ReadGroupCovariate,QualityScoreCovariate,"
         "ContextCovariate,CycleCovariate"),
        ("default_platform", "null"),
        ("deletions_default_quality", "45"),
        ("force_platform", "null"),
        ("indels_context_size", "3"),
        ("insertions_default_quality", "45"),
        ("low_quality_tail", "2"),
        ("maximum_cycle_value", "500"),
        ("mismatches_context_size", "2"),
        ("mismatches_default_quality", "-1"),
        ("no_standard_covs", "false"),
        ("quantizing_levels", "16"),
        ("solid_nocall_strategy", "THROW_EXCEPTION"),
        ("solid_recal_mode", "SET_Q_ZERO"),
    ]
    quant_rows = [(q, 1000, q) for q in range(94)]  # identity (ignored)

    # RG rows: estimated reported 37.0, slight excess errors; the
    # second group skews the other way to make RG lookups observable
    rg_rows = [(rg, "M", f"{36.5 + 0.8 * k:.4f}", "37.0000",
                1_000_000, 800.00) for k, rg in enumerate(rgs)]

    # QS rows: empirical = q - 1 for even q, q + 1 for odd (bounded)
    def phred_err(n, q):
        return round(n * 10 ** (-q / 10.0), 2)

    qs_rows = []
    for k, rg in enumerate(rgs):
        for q in sorted(quals):
            emp = max(2, min(93, (q - 1 if q % 2 == 0 else q + 1) + k))
            n = 500_000
            qs_rows.append((rg, q, "M", f"{emp:.4f}", n, phred_err(n, emp)))

    # Context rows: all 16 2-mers at each qual, empirical +/- 2 by parity
    ctx_rows = []
    mers = ["".join(p) for p in itertools.product("ACGT", repeat=2)]
    for rg in rgs:
        for q in sorted(quals):
            for i, mer in enumerate(mers):
                emp = max(2, min(93, q + (2 if i % 2 else -2)))
                n = 40_000
                ctx_rows.append((rg, q, mer, "Context", "M",
                                 f"{emp:.4f}", n, phred_err(n, emp)))
        # Cycle rows: cycles 1..N and -1..-N, empirical +/- 3
        for q in sorted(quals):
            for cyc in list(range(1, 101)) + list(range(-1, -101, -1)):
                emp = max(2, min(93, q + (3 if cyc > 0 else -3)))
                n = 60_000
                ctx_rows.append((rg, q, cyc, "Cycle", "M",
                                 f"{emp:.4f}", n, phred_err(n, emp)))

    def table(out, name, desc, header, rows, fmts):
        out.write(f"#:GATKTable:{len(header)}:{len(rows)}:"
                  + ":".join(fmts) + ":;\n")
        out.write(f"#:GATKTable:{name}:{desc}\n")
        out.write("  ".join(header) + "\n")
        for r in rows:
            out.write("  ".join(str(v) for v in r) + "\n")
        out.write("\n")

    with open(path, "w") as out:
        out.write("#:GATKReport.v1.1:5\n")
        table(out, "Arguments", "Recalibration argument collection values",
              ["Argument", "Value"], args_rows, ["%s", "%s"])
        table(out, "Quantized", "Quality quantization map",
              ["QualityScore", "Count", "QuantizedScore"], quant_rows,
              ["%d", "%d", "%d"])
        table(out, "RecalTable0", "recal table 0",
              ["ReadGroup", "EventType", "EmpiricalQuality",
               "EstimatedQReported", "Observations", "Errors"],
              rg_rows, ["%s"] * 6)
        table(out, "RecalTable1", "recal table 1",
              ["ReadGroup", "QualityScore", "EventType",
               "EmpiricalQuality", "Observations", "Errors"],
              qs_rows, ["%s"] * 6)
        table(out, "RecalTable2", "recal table 2",
              ["ReadGroup", "QualityScore", "CovariateValue",
               "CovariateName", "EventType", "EmpiricalQuality",
               "Observations", "Errors"],
              ctx_rows, ["%s"] * 8)


def generate(outdir, genome_len=60_000, coverage=25, seed=20260820):
    golden_e2e.generate(outdir, genome_len, coverage, seed)
    # quals present in simdata BAMs span ~20..40; cover generously
    write_recal_table(os.path.join(outdir, "recal.table"), range(2, 51))
    print("recal table ->", os.path.join(outdir, "recal.table"))


def run_ours(outdir):
    from rovaca_tpu import cli
    out = os.path.join(outdir, "ours.vcf")
    rc = cli.main(["HaplotypeCaller",
                   "-i", os.path.join(outdir, "sample.bam"),
                   "-r", os.path.join(outdir, "ref.fa"),
                   "--bqsr-recal-table", os.path.join(outdir, "recal.table"),
                   "-o", out])
    if rc not in (0, None):
        raise SystemExit(f"our CLI failed: {rc}")
    print("ours ->", out)


def run_ref(outdir):
    import subprocess
    out = os.path.join(outdir, "ref.vcf")
    cmd = [golden_e2e.REF_BIN, "HaplotypeCaller",
           "-I", os.path.join(outdir, "sample.bam"),
           "-R", os.path.join(outdir, "ref.fa"),
           "--bqsr-recal-table", os.path.join(outdir, "recal.table"),
           "-O", out, "--nthreads", "2"]
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = os.path.dirname(golden_e2e.REF_BIN)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=3600)
    sys.stderr.write(r.stderr[-3000:] if r.stderr else "")
    if r.returncode != 0:
        raise SystemExit(f"reference binary failed rc={r.returncode}")
    print("ref ->", out)


def main():
    cmd, outdir = sys.argv[1], sys.argv[2]
    if cmd == "gen":
        generate(outdir, *map(int, sys.argv[3:6]))
    elif cmd == "ours":
        run_ours(outdir)
    elif cmd == "ref":
        run_ref(outdir)
    elif cmd == "diff":
        sys.exit(golden_e2e.diff(outdir))
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
