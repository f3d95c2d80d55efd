"""Read clipping operations.

Counterpart of the reference's read_clipper/clipping_op and the assembler's
finalization clips (reference: src/haplotypecaller/genotype/read_clipper.cpp,
apply/hc_assemble_utils.c:219-249, apply/assemble/hc_assemble_reads.c:71-102).

Implementation: reads are exploded into per-query-base events carrying the
aligned reference position (None for insertions/soft clips), sliced, and the
cigar is rebuilt from ref-position gaps — deletions fall out of the gaps, and
edge deletions vanish naturally, matching hard-clip semantics.
"""

import numpy as np

from .cigar import Cigar, CigarOp
from .record import ReadRecord

MIN_TAIL_QUALITY = 9  # reference: apply/assemble/hc_assemble.h:8


def _explode(read):
    """Per-query-base (ref_pos or None, is_softclip) using unclipped coords
    for soft-clipped bases."""
    out = []
    pos = read.pos
    # leading soft clips get positions before read.pos
    first = True
    for op, length in read.cigar:
        if op == CigarOp.H:
            continue
        if op in (CigarOp.M, CigarOp.EQ, CigarOp.X):
            out.extend((pos + k, False) for k in range(length))
            pos += length
            first = False
        elif op == CigarOp.I:
            out.extend((None, False) for _ in range(length))
            first = False
        elif op == CigarOp.S:
            if first:
                out.extend((pos - length + k, True) for k in range(length))
            else:
                out.extend((pos + k, True) for k in range(length))
                pos += length
            first = False
        elif op in (CigarOp.D, CigarOp.N):
            pos += length
    return out


def _rebuild(read, events, keep):
    """New ReadRecord from kept per-base events (indices into bases)."""
    if not keep:
        return read.copy(bases=b"", quals=np.zeros(0, dtype=np.uint8),
                         cigar=Cigar())
    bases = bytes(read.bases[i] for i in keep)
    quals = read.quals[keep]
    elems = []
    new_pos = None
    prev_ref = None
    for i in keep:
        ref_pos, is_sc = events[i]
        if is_sc:
            op = CigarOp.S
        elif ref_pos is None:
            op = CigarOp.I
        else:
            op = CigarOp.M
        if op == CigarOp.M:
            if new_pos is None:
                new_pos = ref_pos
            if prev_ref is not None and ref_pos > prev_ref + 1:
                elems.append((CigarOp.D, ref_pos - prev_ref - 1))
            prev_ref = ref_pos
        elems.append((op, 1))
    # leading insertions before any aligned base anchor at the first ref pos
    if new_pos is None:
        new_pos = read.pos
    cigar = Cigar(elems).normalized()
    return read.copy(bases=bases, quals=quals, cigar=cigar, pos=new_pos)


def revert_soft_clips(read):
    """Turn soft clips back into matches, shifting pos left for leading clips
    (hc_assemble_utils_revert_soft_clip)."""
    if read.cigar.left_soft_clip == 0 and read.cigar.right_soft_clip == 0:
        return read
    elems = []
    pos = read.pos - read.cigar.left_soft_clip
    for op, length in read.cigar:
        if op == CigarOp.H:
            continue
        elems.append((CigarOp.M if op == CigarOp.S else op, length))
    new_pos = max(0, pos)
    if pos < 0:
        # clamp: drop bases hanging off the contig start
        drop = -pos
        events_read = read.copy(cigar=Cigar(elems).normalized(), pos=pos)
        events = _explode(events_read)
        keep = [i for i, (rp, _) in enumerate(events)
                if rp is None or rp >= 0]
        return _rebuild(events_read, events, keep)
    del new_pos
    return read.copy(cigar=Cigar(elems).normalized(), pos=pos)


def hard_clip_soft_clips(read):
    """Remove soft-clipped bases entirely (hc_assemble_utils_soft_clip_to_hard)."""
    left = read.cigar.left_soft_clip
    right = read.cigar.right_soft_clip
    if left == 0 and right == 0:
        return read
    n = len(read.bases)
    bases = read.bases[left:n - right]
    quals = read.quals[left:n - right]
    elems = [(op, ln) for op, ln in read.cigar
             if op not in (CigarOp.S, CigarOp.H)]
    return read.copy(bases=bases, quals=quals, cigar=Cigar(elems).normalized())


def clip_low_qual_ends(read, threshold=MIN_TAIL_QUALITY):
    """Hard-clip terminal bases with qual <= threshold
    (hc_assemble_utils_clip_low_qual_ends)."""
    n = len(read.bases)
    if n == 0:
        return read
    q = read.quals
    clip_end = n - 1
    while clip_end > 0 and q[clip_end] <= threshold:
        clip_end -= 1
    clip_start = 0
    while clip_start < n and q[clip_start] <= threshold:
        clip_start += 1
    if clip_start == 0 and clip_end == n - 1:
        return read
    if clip_end <= clip_start:
        return read.copy(bases=b"", quals=np.zeros(0, dtype=np.uint8),
                         cigar=Cigar())
    events = _explode(read)
    keep = list(range(clip_start, clip_end + 1))
    return _rebuild(read, events, keep)


def hard_clip_to_region(read, region_start, region_end):
    """Keep only query bases aligned within [region_start, region_end]
    (0-based inclusive; hc_assemble_utils_hard_clip_to_region). Insertions
    attach to their left neighbor's position."""
    events = _explode(read)
    keep = []
    last_ref = read.pos - 1
    for i, (ref_pos, is_sc) in enumerate(events):
        anchor = ref_pos if ref_pos is not None else last_ref
        if ref_pos is not None:
            last_ref = ref_pos
        if region_start <= anchor <= region_end:
            keep.append(i)
    if len(keep) == len(events):
        return read
    return _rebuild(read, events, keep)


def hard_clip_adaptor_sequence(read):
    """Clip bases beyond the mate-adaptor boundary
    (hc_apply_utils_hard_clip_adaptor_sequence; GATK hardClipAdaptorSequence).
    """
    from ..pipeline.activity import adaptor_boundary
    bound = adaptor_boundary(read)
    if bound is None:
        return read
    if read.is_reverse:
        if bound < read.pos:
            return read
        # 1-based positions <= bound are inside; keep 0-based pos >= bound
        return hard_clip_to_region(read, bound, 1 << 60)
    else:
        if bound > read.end:
            return read
        return hard_clip_to_region(read, -(1 << 60), bound - 2)
