"""Synthetic test data: diploid genomes, reads, BAM/FASTA generation."""

import numpy as np

from rovaca_tpu.assembly.sw import (READ_TO_HAPLOTYPE_PARAMS, OverhangStrategy,
                                    sw_align)
from rovaca_tpu.io.bam import BamHeader, BamWriter
from rovaca_tpu.io.fasta import write_fasta
from rovaca_tpu.reads.record import ReadRecord


def random_ref(rng, length):
    return "".join(rng.choice(list("ACGT"), size=length))


def apply_variants(ref, variants):
    """variants: list of (pos, ref_allele, alt_allele) on 0-based ref coords.
    Returns the alt sequence. Variants must be sorted and non-overlapping."""
    out = []
    prev = 0
    for pos, ref_a, alt_a in variants:
        assert ref[pos:pos + len(ref_a)] == ref_a, (pos, ref_a)
        out.append(ref[prev:pos])
        out.append(alt_a)
        prev = pos + len(ref_a)
    out.append(ref[prev:])
    return "".join(out)


def simulate_reads(rng, ref, hap_seq, contig, n_reads, read_len=100,
                   qual=35, mapq=60, name_prefix="sim", start=0, end=None):
    """Sample reads from hap_seq, align each back to ref (our SW as the
    'aligner') to get realistic pos/cigar."""
    end = end if end is not None else len(hap_seq)
    reads = []
    for i in range(n_reads):
        s = int(rng.integers(start, max(start + 1, end - read_len)))
        frag = hap_seq[s:s + read_len]
        if len(frag) < 30:
            continue
        # local alignment window on ref around s
        w_lo = max(0, s - 50)
        w_hi = min(len(ref), s + read_len + 50)
        res = sw_align(ref[w_lo:w_hi].encode(), frag.encode(),
                       READ_TO_HAPLOTYPE_PARAMS, OverhangStrategy.SOFTCLIP)
        pos = w_lo + res.alignment_offset
        quals = rng.integers(qual - 4, qual + 4, size=len(frag))
        reads.append(ReadRecord(
            name=f"{name_prefix}{i}", flag=0, ref_id=0, pos=pos,
            mapping_quality=mapq, cigar=res.cigar, bases=frag, quals=quals,
            contig=contig))
    return reads


def write_test_bam(path, reads, contig, contig_len, sample="NA12878"):
    header = BamHeader(
        f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{contig}\tLN:{contig_len}\n"
        f"@RG\tID:rg1\tSM:{sample}\n",
        [contig], [contig_len])
    reads = sorted(reads, key=lambda r: (r.ref_id, r.pos))
    with BamWriter(path, header) as w:
        for r in reads:
            r.tags.setdefault("RG", "rg1")
            w.write(r)


def make_standard_case(tmpdir, rng=None, coverage=24, contig="chr20",
                       length=3000):
    """Reference + BAM with: het SNP @600, hom SNP @1000, het 3bp del @1500,
    het 2bp ins @2100. Returns (fasta_path, bam_path, truth)."""
    rng = rng or np.random.default_rng(20260817)
    ref = random_ref(rng, length)

    def pick_alt(pos):
        return "ACGT"[("ACGT".index(ref[pos]) + 1) % 4]

    truth = {
        "het_snp": (600, ref[600], pick_alt(600)),
        "hom_snp": (1000, ref[1000], pick_alt(1000)),
        "het_del": (1500, ref[1500:1504], ref[1500]),
        "het_ins": (2100, ref[2100], ref[2100] + "TA"),
    }
    hap1 = apply_variants(ref, [truth["hom_snp"]])
    hap2 = apply_variants(ref, sorted(
        [truth["het_snp"], truth["hom_snp"], truth["het_del"],
         truth["het_ins"]]))

    n_per_hap = coverage * length // 100 // 2
    reads = (simulate_reads(rng, ref, hap1, contig, n_per_hap,
                            name_prefix="h1_")
             + simulate_reads(rng, ref, hap2, contig, n_per_hap,
                              name_prefix="h2_"))

    fasta_path = str(tmpdir / "ref.fa")
    bam_path = str(tmpdir / "sample.bam")
    write_fasta(fasta_path, {contig: ref})
    write_test_bam(bam_path, reads, contig, length)
    return fasta_path, bam_path, truth, ref
