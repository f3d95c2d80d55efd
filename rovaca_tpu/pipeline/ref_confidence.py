"""GVCF reference-confidence model.

Counterpart of the reference's ReferenceConfidenceModel (reference:
src/haplotypecaller/genotype/reference_confidence_model.cpp:44-300): per
non-variant position, genotype likelihoods of ref-vs-any from the base-qual
pileup (quals > 6), capped by an indel-informativeness model (reads with no
plausible indel of size <= 10 contribute qual-45 ref evidence), taking the
less-confident of the SNP and indel GLs.
"""

import math

import numpy as np

from .. import constants as C
from ..genotype.variant import Allele, Genotype, NON_REF, Variant
from ..reads.cigar import CigarOp, CONSUMES_QUERY, CONSUMES_REF
from .activity import genotype_cache

BASE_QUAL_THRESHOLD = 6          # assembly_based_caller_utils.h:20
INDEL_QUAL = 45                  # genotype_likelihoods_cache.cpp:34-35
REF_MODEL_DELETION_QUAL = C.REF_MODEL_DELETION_QUAL


def _indel_gl_table(ploidy=2, max_n=C.MAX_N_INDEL_INFORMATIVE_READS):
    """GLs for n indel-informative reads (genotype_likelihoods_cache.cpp)."""
    no_indel = math.log10(1.0 - 10.0 ** (-INDEL_QUAL / 10.0))
    indel = -INDEL_QUAL / 10.0
    table = np.zeros((max_n + 1, ploidy + 1))
    for n in range(1, max_n + 1):
        table[n, 0] = n * no_indel
        for g in range(1, ploidy + 1):
            a = no_indel + math.log10(ploidy - g) if g < ploidy else -np.inf
            b = indel + math.log10(g)
            m = max(a, b)
            s = m + math.log10(10.0 ** (a - m) + 10.0 ** (b - m))
            table[n, g] = n * (s - math.log10(ploidy))
    return table


_INDEL_TABLE = None


def indel_gls(n_informative, ploidy=2):
    global _INDEL_TABLE
    if _INDEL_TABLE is None:
        _INDEL_TABLE = _indel_gl_table(ploidy)
    n = min(n_informative, C.MAX_N_INDEL_INFORMATIVE_READS)
    return _INDEL_TABLE[n]


class PositionObs:
    """Per-position pileup summary over [start, end)."""

    __slots__ = ("hist", "indel_informative", "depth")

    def __init__(self, length):
        # hist[status][pos][qual]: status 0 = non-ref, 1 = ref
        self.hist = np.zeros((2, length, 64), dtype=np.int32)
        self.indel_informative = np.zeros(length, dtype=np.int32)
        self.depth = np.zeros((2, length), dtype=np.int32)


def _mismatch_qual_suffix_sums(read_bases, read_quals, ref, read_start,
                               ref_start):
    """Baseline and shifted mismatch-quality sums for indel plausibility
    (read_has_no_plausible_ideals_of_size, simplified to direct evaluation).

    Returns True if no indel of size 1..10 aligns the read suffix at least
    as well as the current alignment (i.e. the read is indel-informative).
    """
    rb = read_bases[read_start:]
    rq = read_quals[read_start:]
    rf = ref[ref_start:]
    n = min(len(rb), len(rf))
    if n <= C.MAX_INDEL_SIZE:
        return False
    mismatch = np.array([rq[i] if rb[i] != rf[i] else 0
                         for i in range(n)], dtype=np.int64)
    baseline = int(mismatch.sum())
    for size in range(1, C.MAX_INDEL_SIZE + 1):
        # deletion of `size` ref bases after this position
        m = min(len(rb), len(rf) - size)
        if m > 0:
            del_sum = sum(int(rq[i]) for i in range(m)
                          if rb[i] != rf[i + size])
            if del_sum <= baseline:
                return False
        # insertion of `size` read bases after this position
        m = min(len(rb) - size, len(rf))
        if m > 0:
            ins_sum = sum(int(rq[i + size]) for i in range(m)
                          if rb[i + size] != rf[i])
            if ins_sum <= baseline:
                return False
    return True


def _informative_mask(rb_arr, rq_arr, rp_arr, ref_arr,
                      max_indel=C.MAX_INDEL_SIZE):
    """Vectorized indel-informativeness per collapsed read position.

    The per-position suffix comparisons of _mismatch_qual_suffix_sums all
    live on read-vs-ref diagonals (ref_index - read_index = const within a
    deletion-free segment), so one suffix-cumsum per needed diagonal (2K+1
    per segment diagonal) replaces the O(len^2 * K) scalar loops — this is
    the cached marking scheme the reference gets from its per-read tables.
    Returns None if any diagonal would leave the reference bounds (caller
    falls back to the scalar path; only happens at contig edges)."""
    n = len(rb_arr)
    res = np.zeros(n, dtype=bool)
    if n == 0:
        return res
    positions = np.arange(n)
    diags = rp_arr - positions
    uniq = np.unique(diags)
    need = set()
    for d in uniq.tolist():
        need.update(range(d - max_indel, d + max_indel + 1))
    suffix = {}
    for e in sorted(need):
        idx = e + positions
        if idx[0] < 0 or idx[-1] >= len(ref_arr):
            return None
        mm = np.where(rb_arr != ref_arr[idx], rq_arr, 0).astype(np.int64)
        s = np.zeros(n + max_indel + 1, dtype=np.int64)
        s[:n] = mm[::-1].cumsum()[::-1]
        suffix[e] = s
    long_enough = (n - positions) > max_indel
    for d in uniq.tolist():
        sel = diags == d
        base = suffix[d][:n]
        good = long_enough.copy()
        for size in range(1, max_indel + 1):
            # deletion of `size` ref bases / insertion of `size` read bases
            good &= suffix[d + size][:n] > base
            good &= suffix[d - size][size:n + size] > base
        res[sel] = good[sel]
    return res


def _read_layout(read):
    """Vectorized per-read layout: (match_rp, match_qo, next_is_del,
    del_rp) arrays; insertions consume query only. Memoized on the read —
    layouts are region-independent and reads recur across regions."""
    cached = getattr(read, "_layout_cache", None)
    if cached is not None:
        return cached
    match_rp, match_qo, del_rp = [], [], []
    next_is_del = []
    items = list(read.cigar)
    pos, q = read.pos, 0
    for i, (op, length) in enumerate(items):
        in_q = op in CONSUMES_QUERY
        in_r = op in CONSUMES_REF
        if in_q and in_r:
            match_rp.append(np.arange(pos, pos + length))
            match_qo.append(np.arange(q, q + length))
            nd = np.zeros(length, dtype=bool)
            # the last base of this block precedes a deletion if the next
            # ref-consuming aligned element is a D/N block
            for op2, _ in items[i + 1:]:
                if op2 in CONSUMES_REF and op2 not in CONSUMES_QUERY:
                    nd[-1] = True
                    break
                if op2 in CONSUMES_REF:
                    break
            next_is_del.append(nd)
            pos += length
            q += length
        elif in_r:
            del_rp.append(np.arange(pos, pos + length))
            pos += length
        elif in_q:
            q += length
    cat = (lambda parts, dt: np.concatenate(parts)
           if parts else np.empty(0, dtype=dt))
    out = (cat(match_rp, np.int64), cat(match_qo, np.int64),
           cat(next_is_del, bool), cat(del_rp, np.int64))
    try:
        read._layout_cache = out
    except AttributeError:
        pass
    return out


def build_position_obs(reads, ref, start, end):
    """Pileup histograms + indel informativeness over [start, end)."""
    L = end - start
    obs = PositionObs(L)
    from ..utils.refwindow import RefWindow
    if isinstance(ref, RefWindow):
        ref_arr = np.frombuffer(ref.data, dtype=np.uint8)
        ref_off = ref.offset
    elif isinstance(ref, np.ndarray):
        ref_arr, ref_off = ref, 0
    else:
        ref_arr = np.frombuffer(bytes(ref), dtype=np.uint8)
        ref_off = 0
    per_read = []   # [off, inb, next_del, info, bases, quals, rpl, read]
    pending = []    # indices into per_read lacking an informativeness mask
    del_offs = []   # deletion pileup positions, flattened across reads
    flat_hist = []  # (status*L + off)*64 + bq, flattened across reads
    for read in reads:
        rp_arr, qo_arr, next_del, del_rp = _read_layout(read)
        # deletion pileup entries
        if del_rp.size:
            doff = del_rp - start
            del_offs.append(doff[(doff >= 0) & (doff < L)])
        if rp_arr.size == 0:
            continue
        bases = np.frombuffer(read.bases, dtype=np.uint8)[qo_arr]
        quals = np.asarray(read.quals)[qo_arr]
        off = rp_arr - start
        inb = (off >= 0) & (off < L)
        rpl = rp_arr - ref_off  # window-local reference indices
        status = (bases[inb] == ref_arr[rpl[inb]])
        bq = np.minimum(quals[inb], 63)
        flat_hist.append((status * np.int64(L) + off[inb]) * 64 + bq)
        info = getattr(read, "_info_cache", None)
        entry = [off, inb, next_del, info, bases, quals, rpl, read]
        if info is None:
            pending.append(len(per_read))
        per_read.append(entry)

    # one bincount per region replaces four np.add.at per read
    if del_offs:
        d = np.concatenate(del_offs)
        counts = np.bincount(d, minlength=L).astype(np.int32)
        obs.hist[0, :, REF_MODEL_DELETION_QUAL] += counts
        obs.depth[0] += counts
    if flat_hist:
        flat = np.concatenate(flat_hist)
        hist = np.bincount(flat, minlength=2 * L * 64).astype(
            np.int32).reshape(2, L, 64)
        obs.hist += hist
        obs.depth += hist.sum(axis=2, dtype=np.int32)

    if pending:
        # one native OpenMP call for every uncached read of the region
        # (rovaca_tpu/native/refconf.cpp); ok=False reads fall back below
        from ..native import refconf_native
        if refconf_native.available():
            masks, ok = refconf_native.informative_mask_batch(
                [per_read[i][4] for i in pending],
                [per_read[i][5] for i in pending],
                [per_read[i][6] for i in pending],
                ref_arr, C.MAX_INDEL_SIZE)
            for j, i in enumerate(pending):
                if ok[j]:
                    per_read[i][3] = masks[j]
                    # region-independent (computed untruncated): memoize on
                    # the read, which recurs across overlapping regions
                    per_read[i][7]._info_cache = masks[j]

    informative_offs = []
    for off, inb, next_del, info, bases, quals, rpl, read in per_read:
        if info is None:
            info = _informative_mask(bases, quals.astype(np.int64), rpl,
                                     ref_arr)
            if info is not None:
                read._info_cache = info
        if info is None:
            # window-edge read: scalar fallback with truncation semantics
            # (not cached: the truncation depends on this window)
            rb = bases.tobytes()
            rq = quals.tolist()
            info = np.zeros(len(rb), dtype=bool)
            for ai in range(len(rb)):
                bound = len(rb) - ai + C.MAX_INDEL_SIZE + 1
                rp = int(rpl[ai])
                if rp < 0:
                    continue
                ref_slice = ref_arr[rp:rp + bound].tobytes()
                info[ai] = _mismatch_qual_suffix_sums(rb, rq, ref_slice,
                                                      ai, 0)
        take = inb & info & ~next_del
        informative_offs.append(off[take])
    if informative_offs:
        flat = np.concatenate(informative_offs)
        obs.indel_informative += np.bincount(flat, minlength=L).astype(
            np.int32)
    return obs


class HomRefSpan:
    """A contiguous run of hom-ref positions as arrays (no per-position
    Variant objects — the block combiner consumes runs directly; materialize
    via expand() only for debugging). Fields are per-position arrays over
    [start, start+len)."""

    __slots__ = ("contig", "start", "pls", "gq", "dp", "ref_bytes",
                 "sample", "ploidy")

    def __init__(self, contig, start, pls, gq, dp, ref_bytes, sample,
                 ploidy=2):
        self.contig = contig
        self.start = start
        self.pls = pls
        self.gq = gq
        self.dp = dp
        self.ref_bytes = ref_bytes
        self.sample = sample
        self.ploidy = ploidy

    def __len__(self):
        return len(self.gq)

    def clip(self, lo, hi):
        """Sub-span intersecting genomic [lo, hi); None if empty."""
        s = max(self.start, lo) - self.start
        e = min(self.start + len(self), hi) - self.start
        if e <= s:
            return None
        if s == 0 and e == len(self):
            return self
        return HomRefSpan(self.contig, self.start + s, self.pls[s:e],
                          self.gq[s:e], self.dp[s:e], self.ref_bytes[s:e],
                          self.sample, self.ploidy)

    def expand(self):
        """Per-position hom-ref Variants (debug / non-combiner sinks)."""
        out = []
        for i in range(len(self)):
            ref_allele = Allele(bytes([int(self.ref_bytes[i])]), is_ref=True)
            g = Genotype(alleles=[ref_allele] * self.ploidy,
                         pl=self.pls[i].tolist(), gq=int(self.gq[i]),
                         dp=int(self.dp[i]), sample=self.sample)
            out.append(Variant(contig=self.contig, start=self.start + i,
                               stop=self.start + i,
                               alleles=[ref_allele, NON_REF], genotypes=[g]))
        return out


def reference_confidence_records(obs, ref, contig, start, calls_by_pos,
                                 ploidy=2, sample="SAMPLE"):
    """Per-position hom-ref VCs (or the overlapping real call)
    (calculate_ref_confidence). The GL math is batched over all positions;
    the loop only builds output objects."""
    cache = genotype_cache(ploidy)
    L = obs.hist.shape[1]

    hist_all = obs.hist.astype(np.float64)          # (2, L, 64)
    hist_all[:, :, : BASE_QUAL_THRESHOLD + 1] = 0.0
    counts = hist_all.sum(axis=(0, 2))              # (L,)
    # note cache status 0 = variant evidence == our hist status 0 ✓
    gl = np.einsum("spq,sqg->pg", hist_all, cache)  # (L, G)
    gl -= counts[:, None] * math.log10(ploidy)
    # cap alt GLs by hom-ref GL (get_genotype_likelihoods_capped_...)
    snp_gls = np.minimum(gl, gl[:, 0:1])
    snp_gls[:, 0] = gl[:, 0]
    indel_gls(0, ploidy)  # ensure table
    ind_gls = _INDEL_TABLE[
        np.minimum(obs.indel_informative, C.MAX_N_INDEL_INFORMATIVE_READS)]

    snp_pls = np.round(
        -10.0 * (snp_gls - snp_gls.max(axis=1, keepdims=True))).astype(int)
    ind_pls = np.round(
        -10.0 * (ind_gls - ind_gls.max(axis=1, keepdims=True))).astype(int)

    def gq_rows(pls):
        s = np.partition(pls, 1, axis=1)
        return np.minimum(s[:, 1] - s[:, 0], 99)

    snp_gq = gq_rows(snp_pls)
    ind_gq = gq_rows(ind_pls)
    # take the less confident of the two per position
    use_snp = snp_gq <= ind_gq
    pls_all = np.where(use_snp[:, None], snp_pls, ind_pls)
    gq_all = np.where(use_snp, snp_gq, ind_gq)
    dp_all = obs.depth.sum(axis=0)

    if isinstance(ref, np.ndarray):
        ref_bytes_all = ref
    else:
        ref_bytes_all = None  # indexable (bytes / RefWindow) — slice lazily

    def span_ref_bytes(p0, p1):
        if ref_bytes_all is not None:
            return np.asarray(ref_bytes_all[start + p0:start + p1],
                              dtype=np.uint8)
        return np.frombuffer(
            bytes(ref[start + p0:start + p1]), dtype=np.uint8)

    out = []
    pos = 0
    run_start = None

    def close_run(end_pos):
        if run_start is None:
            return
        out.append(HomRefSpan(
            contig=contig, start=start + run_start,
            pls=pls_all[run_start:end_pos],
            gq=gq_all[run_start:end_pos],
            dp=dp_all[run_start:end_pos],
            ref_bytes=span_ref_bytes(run_start, end_pos),
            sample=sample, ploidy=ploidy))

    while pos < L:
        gpos = start + pos
        call = calls_by_pos.get(gpos)
        if call is not None:
            close_run(pos)
            run_start = None
            out.append(call)
            pos += max(1, len(call.ref.bases))
            continue
        if run_start is None:
            run_start = pos
        pos += 1
    close_run(min(pos, L))
    return out


def _filter_reads(reads, mapping_quality_threshold):
    return [r for r in reads
            if r.mapping_quality >= mapping_quality_threshold]


def reference_model_for_no_variation(region, reads, ref, contig,
                                     mapping_quality_threshold=20,
                                     sample="SAMPLE"):
    """Hom-ref records for a whole non-variant region
    (reference_model_for_no_variation)."""
    usable = _filter_reads(reads, mapping_quality_threshold)
    obs = build_position_obs(usable, ref, region.start, region.end + 1)
    return reference_confidence_records(obs, ref, contig, region.start, {},
                                        sample=sample)


def calculate_ref_confidence_with_calls(region, reads, ref, contig, calls,
                                        genotype_reads, variant_span,
                                        mapping_quality_threshold=20,
                                        sample="SAMPLE"):
    """Variant region in GVCF mode: hom-ref records for the flanks + real
    calls spliced over the variant span (call_non_active_site)."""
    usable = _filter_reads(reads, mapping_quality_threshold)
    obs = build_position_obs(usable, ref, region.start, region.end + 1)
    calls_by_pos = {c.start: c for c in calls}
    return reference_confidence_records(obs, ref, contig, region.start,
                                        calls_by_pos, sample=sample)
