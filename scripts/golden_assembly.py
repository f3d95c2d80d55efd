"""Cross-implementation assembly golden diff.

Generates a diverse corpus of active-region test cases in the reference's
serialized format (apply/test/assemble_testcase_iterator.h: a
`contig\\tbeg\\tend\\tn` line, n SAM read lines, one region-reference line),
runs OUR assembly path (finalize -> overlapping-pair quals -> read-threading
graph over kmers {10,25} -> K-best -> SW cigar) over them, and emits results
in the reference FakeAssembler's output format
(apply/test/fake_assembler.cpp:80-92): per case
`chr1:beg-end\\treads: N`, `haplotypes: K`, K lexicographically sorted
haplotype strings, blank line.

Usage:
  python scripts/golden_assembly.py gen   <outdir>   # write cases.txt/ref.txt
  python scripts/golden_assembly.py ours  <outdir>   # -> result_ours.txt
  python scripts/golden_assembly.py diff  <outdir>   # compare the two results

The reference side is produced by the (gitignored) harness build:
  .refbuild/bin/assembler_test <outdir>/cases.txt <outdir>/ref.txt \\
      <outdir>/result_ref.txt
"""

import sys

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from rovaca_tpu.assembly import assembler  # noqa: E402
from rovaca_tpu.reads.record import ReadRecord  # noqa: E402

REGION_PAD = 100  # k_default_region_padding, fake_assembler.cpp:22


# --------------------------------------------------------------------------
# corpus generation
# --------------------------------------------------------------------------

def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _plant(rng, ref, pos, kind):
    """Return (variant_tuple, human_label) for the given kind at pos."""
    base = ref[pos]
    if kind == "snp":
        alt = rng.choice([b for b in "ACGT" if b != base])
        return (pos, base, alt)
    if kind == "ins":
        ins = _rand_seq(rng, int(rng.integers(1, 16)))
        return (pos, base, base + ins)
    if kind == "del":
        dlen = int(rng.integers(1, 21))
        return (pos, ref[pos:pos + dlen + 1], base)
    raise ValueError(kind)


def _pair_reads(rng, hap, hap2ref_off, contig, n_pairs, read_len, qual_lo,
                qual_hi, lo, hi, prefix):
    """FR read pairs sampled from hap; positions mapped by simple offset
    (haplotype == ref shifted), so CIGARs come from our SW like simdata."""
    import simdata
    reads = []
    for i in range(n_pairs):
        frag = int(rng.integers(read_len + 10, read_len * 2 + 60))
        s = int(rng.integers(lo, max(lo + 1, hi - frag)))
        r1 = simdata.simulate_reads(
            rng, hap2ref_off, hap, contig, 1, read_len=read_len,
            qual=int(rng.integers(qual_lo, qual_hi)),
            name_prefix=f"{prefix}p{i}_", start=s, end=s + read_len + 1)
        r2 = simdata.simulate_reads(
            rng, hap2ref_off, hap, contig, 1, read_len=read_len,
            qual=int(rng.integers(qual_lo, qual_hi)),
            name_prefix=f"{prefix}p{i}_", start=max(lo, s + frag - read_len),
            end=min(hi, s + frag - read_len + read_len + 1))
        if not r1 or not r2:
            continue
        a, b = r1[0], r2[0]
        b = b.copy(name=a.name, flag=0x1 | 0x2 | 0x10 | 0x80,
                   mate_pos=a.pos, tlen=-(b.end - a.pos))
        a = a.copy(flag=0x1 | 0x2 | 0x20 | 0x40, mate_pos=b.pos,
                   tlen=b.end - a.pos)
        reads.extend([a, b])
    return reads


def build_corpus(seed=20260818, contig="chr1", ref_len=125000):
    """Returns (ref_string, list[(beg, end, reads)]) with ~80 varied cases."""
    import simdata
    rng = np.random.default_rng(seed)
    ref = _rand_seq(rng, ref_len)

    # plant STR tracts so indel cases land in repeats sometimes
    refl = list(ref)
    for _ in range(30):
        unit = _rand_seq(rng, int(rng.integers(1, 5)))
        reps = int(rng.integers(4, 10))
        at = int(rng.integers(500, ref_len - 500))
        tract = (unit * reps)[:40]
        refl[at:at + len(tract)] = tract
    ref = "".join(refl)

    cases = []
    center = 1000
    ci = 0
    while center < ref_len - 1000 and len(cases) < 80:
        ci += 1
        scenario = ci % 14
        span = int(rng.integers(60, 301))
        beg = center - span // 2
        end = beg + span - 1
        lo, hi = beg - 250, end + 250
        n_extra_unpaired = 3

        variants = []
        if scenario == 0:       # isolated het SNP
            variants = [_plant(rng, ref, center, "snp")]
        elif scenario == 1:     # hom SNP
            variants = [_plant(rng, ref, center, "snp")]
        elif scenario == 2:     # het insertion
            variants = [_plant(rng, ref, center, "ins")]
        elif scenario == 3:     # het deletion
            variants = [_plant(rng, ref, center, "del")]
        elif scenario == 4:     # dense SNP cluster
            variants = [_plant(rng, ref, center + off, "snp")
                        for off in (0, 7, 15, 40)]
        elif scenario == 5:     # SNP + nearby indel
            variants = sorted(
                [_plant(rng, ref, center, "snp"),
                 _plant(rng, ref, center + 30,
                        "del" if ci % 2 else "ins")])
        elif scenario == 6:     # ref-only (no variant): 1-hap case
            variants = []
        # scenario 7: multi-allelic site (built below)
        elif scenario == 8:     # variant at the active-span edge
            variants = [_plant(rng, ref, beg + (0 if ci % 2 else span - 1),
                               "snp")]
        elif scenario == 9:     # STR contraction: delete one unit of a
            # planted tract right at center
            unit = _rand_seq(rng, int(rng.integers(2, 5)))
            tract = unit * 8
            ref = ref[:center] + tract + ref[center + len(tract):]
            variants = [(center - 1, ref[center - 1] + unit,
                         ref[center - 1])]
        elif scenario == 10:    # STR expansion: insert one unit
            unit = _rand_seq(rng, int(rng.integers(2, 5)))
            tract = unit * 8
            ref = ref[:center] + tract + ref[center + len(tract):]
            variants = [(center - 1, ref[center - 1],
                         ref[center - 1] + unit)]
        elif scenario == 11:    # ultra-low coverage het SNP
            variants = [_plant(rng, ref, center, "snp")]
        elif scenario == 12:    # haplotype explosion: 8 het SNPs -> 2^8
            # graph paths; exercises the collect-129 dijkstra cap
            variants = [_plant(rng, ref, center + off, "snp")
                        for off in range(0, 96, 12)]
            span = max(span, 140)
            end = beg + span - 1
        elif scenario == 13:    # long repeat -> non-unique kmers, retries
            unit = _rand_seq(rng, 6)
            tract = (unit * 12)[:60]
            ref = ref[:center - 30] + tract + ref[center - 30 + len(tract):]
            variants = [_plant(rng, ref, center + 50, "snp")]

        alt1 = simdata.apply_variants(ref, variants)
        if scenario == 7:
            v1 = _plant(rng, ref, center, "snp")
            alts = [b for b in "ACGT" if b != ref[center] and b != v1[2]]
            v2 = (center, ref[center], alts[0])
            alt1 = simdata.apply_variants(ref, [v1])
            alt2 = simdata.apply_variants(ref, [v2])
        elif scenario == 12:
            # second haplotype carries a random subset of the SNP cluster,
            # and reads sampled from both sprinkle partial support
            sub = [v for v in variants if rng.random() < 0.5]
            alt2 = simdata.apply_variants(ref, sub)
        else:
            alt2 = ref if scenario != 1 else alt1  # hom: both copies alt

        cov_pairs = (2 if scenario == 11
                     else int(rng.integers(20, 35)) if scenario == 12
                     else int(rng.integers(8, 22)))
        qual_band = (30, 40) if ci % 3 else (12, 38)  # some low-qual tails
        reads = []
        reads += _pair_reads(rng, alt1, ref, contig, cov_pairs, 100,
                             *qual_band, lo, hi, prefix=f"c{ci}a")
        reads += _pair_reads(rng, alt2, ref, contig, cov_pairs, 100,
                             *qual_band, lo, hi, prefix=f"c{ci}b")
        # sprinkle a couple of unpaired reads too
        reads += simdata.simulate_reads(
            rng, ref, alt1, contig, n_extra_unpaired, read_len=100, qual=35,
            name_prefix=f"c{ci}s", start=lo, end=hi)
        if scenario == 4:
            # N bases with qual 2 in a few reads (kmer-skip path)
            for r in reads[:4]:
                b = bytearray(r.bases if isinstance(r.bases, bytes)
                              else r.bases.encode())
                q = np.array(r.quals)
                at = len(b) // 2
                b[at] = ord("N")
                q[at] = 2
                reads[reads.index(r)] = r.copy(bases=bytes(b), quals=q)
        # keep only reads overlapping the padded span, coordinate-sorted
        ps, pe = beg - REGION_PAD, end + REGION_PAD
        reads = [r for r in reads if r.pos <= pe and r.end - 1 >= ps]
        reads.sort(key=lambda r: r.pos)
        if len(reads) >= 4:
            cases.append((beg, end, reads))
        center += int(rng.integers(1200, 1700))
    return ref, cases


# --------------------------------------------------------------------------
# serialization (the reference harness's case format)
# --------------------------------------------------------------------------

def sam_line(r, contig):
    qual = "".join(chr(int(q) + 33) for q in r.quals)
    bases = r.bases.decode() if isinstance(r.bases, bytes) else r.bases
    rnext = "=" if r.mate_pos >= 0 else "*"
    pnext = r.mate_pos + 1 if r.mate_pos >= 0 else 0
    return (f"{r.name}\t{r.flag}\t{contig}\t{r.pos + 1}\t"
            f"{r.mapping_quality}\t{r.cigar}\t{rnext}\t{pnext}\t{r.tlen}\t"
            f"{bases}\t{qual}")


def parse_sam_line(line, contig="chr1"):
    f = line.rstrip("\n").split("\t")
    quals = np.frombuffer(f[10].encode(), dtype=np.uint8).astype(np.int64) \
        - 33
    mate_pos = int(f[7]) - 1 if f[6] != "*" else -1
    return ReadRecord(name=f[0], flag=int(f[1]), ref_id=0, pos=int(f[3]) - 1,
                      mapping_quality=int(f[4]), cigar=f[5], bases=f[9],
                      quals=quals, mate_pos=mate_pos, tlen=int(f[8]),
                      mate_ref_id=0 if f[6] != "*" else -1,
                      contig=contig)


def write_cases(outdir, ref, cases, contig="chr1"):
    import pathlib
    d = pathlib.Path(outdir)
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "ref.txt", "w") as fh:
        fh.write(ref + "\n")
    with open(d / "cases.txt", "w") as fh:
        for beg, end, reads in cases:
            fh.write(f"{contig}\t{beg}\t{end}\t{len(reads)}\n")
            for r in reads:
                fh.write(sam_line(r, contig) + "\n")
            fh.write(ref[beg - REGION_PAD:end + REGION_PAD + 1] + "\n")


def read_cases(outdir, contig="chr1"):
    import pathlib
    d = pathlib.Path(outdir)
    ref = open(d / "ref.txt").readline().rstrip("\n")
    cases = []
    with open(d / "cases.txt") as fh:
        while True:
            head = fh.readline()
            if not head.strip():
                break
            c, beg, end, n = head.split("\t")
            reads = [parse_sam_line(fh.readline(), c) for _ in range(int(n))]
            fh.readline()  # region ref slice (unused, like FakeAssembler)
            cases.append((int(beg), int(end), reads))
    return ref, cases


# --------------------------------------------------------------------------
# our side
# --------------------------------------------------------------------------

def assemble_ours(ref, beg, end, reads):
    """Mirror FakeAssembler::run: finalize to the padded span, adjust
    overlapping pair quals, assemble kmers {10,25} (+10 retries), return
    (n_reads_after_finalize, sorted haplotype strings).

    Case-file beg/end are 1-based inclusive (GATK convention — verified
    against the reference binary: its padded window for beg B starts at
    0-based B-100-1); our pipeline is 0-based throughout."""
    ps, pe = (beg - 1) - REGION_PAD, (end - 1) + REGION_PAD
    fin = assembler.finalize_region_reads(reads, ps, pe)
    assembler.adjust_overlapping_pair_quals(fin)
    window = ref[ps:pe + 1].encode()
    haps = assembler.assemble_region(fin, window, ps)
    seqs = sorted(h.bases.decode() for h in haps)
    return len(fin), seqs


def run_ours(outdir, contig="chr1"):
    import pathlib
    ref, cases = read_cases(outdir, contig)
    with open(pathlib.Path(outdir) / "result_ours.txt", "w") as fh:
        for beg, end, reads in cases:
            n, seqs = assemble_ours(ref, beg, end, reads)
            fh.write(f"{contig}:{beg}-{end}\treads: {n}\n")
            fh.write(f"haplotypes: {len(seqs)}\n")
            for s in seqs:
                fh.write(s + "\n")
            fh.write("\n")


# --------------------------------------------------------------------------
# diff
# --------------------------------------------------------------------------

def parse_result(path):
    out = {}
    with open(path) as fh:
        lines = [line.rstrip("\n") for line in fh]
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        loc, reads_s = lines[i].split("\t")
        n_reads = int(reads_s.split(":")[1])
        n_haps = int(lines[i + 1].split(":")[1])
        haps = lines[i + 2:i + 2 + n_haps]
        out[loc] = (n_reads, haps)
        i += 2 + n_haps
    return out


def diff(outdir, strict_reads=True):
    import pathlib
    d = pathlib.Path(outdir)
    ours = parse_result(d / "result_ours.txt")
    ref = parse_result(d / "result_ref.txt")
    n_match = n_hapdiff = n_readdiff = n_saturated = 0
    msgs = []
    for loc in ref:
        if loc not in ours:
            msgs.append(f"{loc}: MISSING in ours")
            n_hapdiff += 1
            continue
        (rn, rh), (on, oh) = ref[loc], ours[loc]
        if rh != oh:
            only_ref = [h for h in rh if h not in oh]
            only_ours = [h for h in oh if h not in rh]
            # cap-saturated regions (>=128 haps on both sides): WHICH
            # marginal path survives the reference's per-vertex call cap is
            # an artifact of its exact seq-graph vertex granularity (the
            # 129th result observed from the binary is the globally
            # worst-scoring path, admitted only because better ones needed
            # saturated vertices). Tolerate a tiny symmetric difference
            # there; everywhere else require byte-identity.
            if (len(rh) >= 128 and len(oh) >= 128
                    and len(only_ref) + len(only_ours) <= 4):
                n_saturated += 1
                msgs.append(f"{loc}: saturated-cap tolerance "
                            f"(ref={len(rh)} ours={len(oh)}, "
                            f"symdiff={len(only_ref) + len(only_ours)})")
            else:
                n_hapdiff += 1
                msgs.append(
                    f"{loc}: haps ref={len(rh)} ours={len(oh)} "
                    f"only_ref={len(only_ref)} only_ours={len(only_ours)}")
        elif strict_reads and rn != on:
            n_readdiff += 1
            msgs.append(f"{loc}: read count ref={rn} ours={on}")
        else:
            n_match += 1
    print(f"regions: {len(ref)}  identical: {n_match}  "
          f"saturated-ok: {n_saturated}  hap-diff: {n_hapdiff}  "
          f"readcount-diff: {n_readdiff}")
    for m in msgs[:40]:
        print(" ", m)
    return n_match, n_hapdiff, n_readdiff, msgs


if __name__ == "__main__":
    cmd, outdir = sys.argv[1], sys.argv[2]
    if cmd == "gen":
        ref, cases = build_corpus()
        write_cases(outdir, ref, cases)
        print(f"wrote {len(cases)} cases to {outdir}")
    elif cmd == "ours":
        run_ours(outdir)
        print("wrote result_ours.txt")
    elif cmd == "diff":
        m, hd, rd, _ = diff(outdir)
        sys.exit(0 if (hd == 0 and rd == 0) else 1)
    else:
        raise SystemExit(f"unknown command {cmd}")
