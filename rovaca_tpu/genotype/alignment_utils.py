"""Read-to-reference realignment through the best haplotype.

Counterpart of the reference's realign_reads_to_their_best_haplotype +
AlignmentUtils cigar composition (reference: src/haplotypecaller/genotype/
utils/assembly_based_caller_utils.cpp:146, alignment_utils.cpp): each read is
SW-aligned to its best-supported haplotype (ties favor the reference
haplotype), and its alignment is projected through the haplotype's own
alignment into reference coordinates, giving final cigars/positions for
annotations and output.
"""

import numpy as np

from ..assembly.sw import (READ_TO_HAPLOTYPE_PARAMS, OverhangStrategy,
                           sw_align)
from ..reads.cigar import Cigar, CigarOp, CONSUMES_QUERY, CONSUMES_REF


def hap_to_ref_map(hap):
    """hap base index -> ref genome pos (None for inserted bases)."""
    out = []
    ref_pos = hap.window_start
    for op, length in hap.cigar:
        in_q = op in CONSUMES_QUERY
        in_r = op in CONSUMES_REF
        if in_q and in_r:
            out.extend(ref_pos + k for k in range(length))
            ref_pos += length
        elif in_q:
            out.extend([None] * length)
        elif in_r:
            ref_pos += length
    return out


def realign_read_to_haplotype(read, hap, h2r=None, sw_result=None):
    """New ReadRecord aligned to the reference through `hap`, or the
    original read if the SW alignment is unusable."""
    if h2r is None:
        h2r = hap_to_ref_map(hap)
    if sw_result is not None:
        res = sw_result
    else:
        try:
            res = sw_align(hap.bases, read.bases, READ_TO_HAPLOTYPE_PARAMS,
                           OverhangStrategy.SOFTCLIP)
        except ValueError:
            return read
    if res.alignment_offset < 0:
        return read

    # read base -> hap base index (None for softclip/insertion)
    hap_idx = []
    h = res.alignment_offset
    for op, length in res.cigar:
        if op in (CigarOp.M, CigarOp.EQ, CigarOp.X):
            hap_idx.extend(h + k for k in range(length))
            h += length
        elif op in (CigarOp.I, CigarOp.S):
            hap_idx.extend([None] * length)
        elif op in (CigarOp.D, CigarOp.N):
            h += length

    if len(hap_idx) != len(read.bases):
        return read

    # compose: read base -> ref pos
    elems = []
    new_pos = None
    prev_ref = None
    n_hap = len(h2r)
    for q, hi in enumerate(hap_idx):
        ref_pos = (h2r[hi] if hi is not None and hi < n_hap else None)
        if ref_pos is None:
            op = CigarOp.I if new_pos is not None else CigarOp.S
            elems.append((op, 1))
            continue
        if new_pos is None:
            new_pos = ref_pos
        elif prev_ref is not None and ref_pos > prev_ref + 1:
            elems.append((CigarOp.D, ref_pos - prev_ref - 1))
        prev_ref = ref_pos
        elems.append((CigarOp.M, 1))
    if new_pos is None:
        return read
    # trailing unaligned bases become soft clips
    out = []
    seen_m = False
    for op, length in Cigar(elems).normalized():
        out.append([op, length])
    # convert trailing I to S
    if out and out[-1][0] == CigarOp.I:
        out[-1][0] = CigarOp.S
    cigar = Cigar(tuple((op, ln) for op, ln in out)).normalized()
    if cigar.query_length != len(read.bases):
        return read
    return read.copy(pos=new_pos, cigar=cigar)


def realign_reads_to_their_best_haplotype(likelihoods):
    """Replace evidence reads with realigned versions (per-read best
    haplotype, ties to the reference haplotype). Mutates `likelihoods.reads`.
    SW alignments run in one multithreaded native batch when available.
    """
    from ..assembly.cigar_calc import SW_PAD  # noqa: F401 (doc anchor)
    from ..native import sw_native
    from ..reads.cigar import Cigar

    haps = likelihoods.alleles
    if not haps:
        return likelihoods
    m = likelihoods.matrix
    ref_idx = next((i for i, h in enumerate(haps)
                    if getattr(h, "is_ref", False)), 0)
    maps = {}
    best_haps = []
    for r, read in enumerate(likelihoods.reads):
        col = m[:, r]
        best = int(np.argmax(col))
        if col[ref_idx] == col[best]:
            best = ref_idx
        hap = haps[best]
        if id(hap) not in maps:
            maps[id(hap)] = hap_to_ref_map(hap)
        best_haps.append(hap)

    sw_results = [None] * len(likelihoods.reads)
    if sw_native.available():
        # exact-substring shortcut mirrors sw_align's fast path
        from ..assembly.sw import SWResult
        from ..reads.cigar import CigarOp
        batch_idx = []
        pairs = []
        for r, read in enumerate(likelihoods.reads):
            hap = best_haps[r]
            idx = hap.bases.rfind(read.bases)
            if idx != -1:
                sw_results[r] = SWResult(
                    Cigar([(CigarOp.M, len(read.bases))]), idx)
            else:
                batch_idx.append(r)
                pairs.append((hap.bases, read.bases))
        for r, res in zip(batch_idx, sw_native.align_batch(
                pairs, READ_TO_HAPLOTYPE_PARAMS,
                int(OverhangStrategy.SOFTCLIP))):
            if res is not None:
                ops, lens, offset = res
                sw_results[r] = SWResult(Cigar(zip(ops, lens)), offset)

    new_reads = []
    for r, read in enumerate(likelihoods.reads):
        hap = best_haps[r]
        new_reads.append(realign_read_to_haplotype(
            read, hap, maps[id(hap)], sw_result=sw_results[r]))
    likelihoods.reads = new_reads
    return likelihoods
