"""Single-region golden diff: the reference's genuine per-region calling
chain (refshim/region_harness.cpp driving local_assemble -> trim ->
filters -> call_pairhmm -> realign -> assign_genotype_likelihoods) vs our
RegionCaller, on the identical post-stream read set.

Usage:
  python scripts/golden_region.py <bam> <fasta> <contig> <start0> <end0>

start0/end0 are the 0-based ACTIVE region bounds (our convention); the
harness gets them 1-based. Prints both sides' trimmed span, pairhmm read
lists and final variants for eyeball diffing.
"""

import os
import subprocess
import sys

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                os.path.join(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))), "tests"),
                os.path.dirname(os.path.abspath(__file__))]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, ".refbuild", "bin", "region_harness")
LIBDIR = os.path.join(REPO, ".refbuild", "ref", "build-dev", "bin")


def main():
    bam, fasta, contig = sys.argv[1], sys.argv[2], sys.argv[3]
    rs, re_ = int(sys.argv[4]), int(sys.argv[5])
    workdir = sys.argv[6] if len(sys.argv) > 6 else "/tmp/golden_region"
    os.makedirs(workdir, exist_ok=True)

    from golden_assembly import sam_line
    from rovaca_tpu.pipeline.caller import HaplotypeCaller, HCArgs
    from rovaca_tpu.io.fasta import FastaFile

    args = HCArgs(bam_paths=[bam], reference_path=fasta,
                  output_path=os.path.join(workdir, "unused.vcf"))
    hc = HaplotypeCaller(args)
    reader = hc._open_reader(None)
    pad_s, pad_e = rs - 100, re_ + 1 + 100
    region_reads = None
    for c, reads in hc._reads_by_contig(reader, None):
        if c != contig:
            continue
        region_reads = [x for x in reads if x.pos < pad_e and x.end > pad_s]
        break
    assert region_reads, "no reads overlap the region"

    cases = os.path.join(workdir, "cases.txt")
    reftxt = os.path.join(workdir, "ref.txt")
    with open(cases, "w") as f:
        f.write(f"chr1\t{rs + 1}\t{re_ + 1}\t{len(region_reads)}\n")
        for r in region_reads:
            f.write(sam_line(r, "chr1") + "\n")
        f.write("\n")
    ref = FastaFile(fasta).fetch(contig)
    with open(reftxt, "w") as f:
        f.write(bytes(ref).decode() + "\n")

    out = os.path.join(workdir, "ref_region.txt")
    env = dict(os.environ, LD_LIBRARY_PATH=LIBDIR)
    subprocess.run([HARNESS, cases, reftxt, out], env=env, timeout=600,
                   stderr=subprocess.DEVNULL)
    print("==== reference region chain:")
    print(open(out).read())

    print("==== ours:")
    from rovaca_tpu.pipeline.hc_engine import CallerConfig, RegionCaller

    class R:
        start, end, is_active = rs, re_, True
    caller = RegionCaller(CallerConfig(), {contig: len(ref)})
    p = caller.prepare_region(R, region_reads, ref, contig)
    if isinstance(p, list):
        print("trimmed: none")
        return
    print(f"trimmed: {p.variant_span[0] + 1}-{p.variant_span[1] + 1} "
          f"padded: {p.span[0] + 1}-{p.span[1] + 1}")
    print(f"pairhmm_reads: {len(p.call_reads)}")
    for r in sorted(p.call_reads, key=lambda r: (r.name, r.pos)):
        q = "".join(chr(x + 33) for x in r.quals)
        print(f"  {r.name}\t{r.pos + 1}\t{r.cigar}\t{r.bases.decode()}\t{q}")
    from rovaca_tpu.ops import pairhmm
    lik, kept = pairhmm.compute_likelihoods(
        p.call_reads, [h.bases for h in p.haps], engine="xla")
    calls = caller.finish_region(p, lik, kept)
    for c in calls:
        g = c.genotypes[0]
        ad = ",".join(str(x) for x in (g.ad or []))
        pl = ",".join(str(x) for x in (g.pl or []))
        alts = ",".join(a.bases.decode() for a in c.alleles)
        print(f"variant: {c.start + 1} {alts} QUAL={c.qual:.2f} "
              f"AD={ad} DP={g.dp} GQ={g.gq} PL={pl}")


if __name__ == "__main__":
    main()
