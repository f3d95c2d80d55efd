"""Full-pipeline data parallelism over a device mesh.

This is the device-level half of the scale-out story (the process-level
half is parallel/distributed.py): genomic interval shards map onto mesh
devices; every device scores its own shard's PairHMM batches inside ONE
jitted `shard_map` step; results all_gather in shard (== genome) order; the
host genotypes per shard and merges records coordinate-ordered — the
reference's source_id-ordered writer merge (reference:
src/haplotypecaller/writer/writer.cpp:147-196) expressed as an ICI
collective.

`pipeline_dryrun(n_devices)` drives regions → assembly → sharded PairHMM →
genotyping → ordered merge end-to-end on an n-device mesh and asserts the
merged records equal an unsharded run — the driver executes it on N virtual
CPU devices to validate the multi-chip path without N real chips.
"""

import numpy as np

from .. import constants as C
from .sharding import make_data_mesh, shard_intervals

_DRY_LR = 64     # fixed read-length bucket for the dryrun step
_DRY_LH = 128    # fixed hap-length bucket


# --------------------------------------------------------------------------
# device step
# --------------------------------------------------------------------------

def sharded_pipeline_step(mesh, trans, rbase, rlen, hbase, hlen,
                          axis_name="data"):
    """One jitted multi-device step over per-shard region batches.

    Inputs carry [S, R, ...] leading dims (S = mesh size, R = padded
    per-shard region count); every region is a single (8-hap x 128-read)
    tile. Returns raw scores [S, R, 1, 1, 8, 128] gathered on every device
    in shard order.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    from ..ops.pairhmm.xla import pairhmm_xla

    def step(trans, rbase, rlen, hbase, hlen):
        raw = jax.vmap(pairhmm_xla)(trans[0], rbase[0], rlen[0], hbase[0],
                                    hlen[0])
        return jax.lax.all_gather(raw, axis_name)

    spec = P(axis_name)
    fn = jax.shard_map(step, mesh=mesh,
                       in_specs=(spec,) * 5, out_specs=P(),
                       check_vma=False)
    return jax.jit(fn)(trans, rbase, rlen, hbase, hlen)


def _single_tile_batch(reads, haps, pcr_model):
    from ..ops.pairhmm import prep
    batch = prep.build_pair_batch(reads, haps, pcr_model=pcr_model,
                                  len_buckets=(_DRY_LR,),
                                  hap_len_buckets=(_DRY_LH,))
    if batch.gr != 1 or batch.gh != 1 or batch.trans.shape[1] != _DRY_LR:
        raise ValueError("dryrun regions must fit one tile "
                         f"(gr={batch.gr}, gh={batch.gh})")
    return batch


def _postprocess(batch, raw_tile, reads, haps, pcr_model, mqt):
    """scheduler._postprocess equivalent for one region."""
    from ..ops.pairhmm.api import (log10_with_rescue, normalize_likelihoods,
                                   poorly_modelled_mask)
    lik_hr = log10_with_rescue(batch.result_matrix(raw_tile), reads, haps,
                               pcr_model=pcr_model,
                               min_quality_threshold=mqt)
    lik_rh = normalize_likelihoods(lik_hr.T)
    drop = poorly_modelled_mask([len(r.bases) for r in reads], lik_rh)
    kept = np.nonzero(~drop)[0]
    return lik_rh[kept].T.copy(), kept


# --------------------------------------------------------------------------
# dryrun: simulate -> regions -> sharded step -> genotype -> merge
# --------------------------------------------------------------------------

def _simulate(genome_len=16000, coverage=24, read_len=50, seed=20260819):
    """Tiny in-memory diploid case: SNP-only so reads are pure-match."""
    from ..reads.record import ReadRecord

    rng = np.random.default_rng(seed)
    contig = "chr20"
    ref = "".join(rng.choice(list("ACGT"), size=genome_len))
    # one het SNP every ~1500bp
    truth = []
    for pos in range(700, genome_len - 700, 1500):
        alt = "ACGT"[("ACGT".index(ref[pos]) + 1) % 4]
        truth.append((pos, ref[pos], alt))
    alt_ref = list(ref)
    for pos, _r, a in truth:
        alt_ref[pos] = a
    alt_ref = "".join(alt_ref)

    reads = []
    n_reads = coverage * genome_len // read_len // 2
    for hap_i, hap in enumerate((ref, alt_ref)):
        for i in range(n_reads):
            s = int(rng.integers(0, genome_len - read_len))
            reads.append(ReadRecord(
                name=f"h{hap_i}_{i}", flag=0, ref_id=0, pos=s,
                mapping_quality=60, cigar=f"{read_len}M",
                bases=hap[s:s + read_len],
                quals=rng.integers(30, 40, size=read_len),
                contig=contig))
    reads.sort(key=lambda r: r.pos)
    from ..utils.refwindow import RefWindow
    return contig, RefWindow(ref.encode(), 0), reads, truth


def _regions_for_span(reads, ref, contig, lo, hi):
    from ..pipeline import activity
    sel = [r for r in reads if r.pos < hi and r.end > lo]
    if not sel:
        return [], sel
    regions = activity.find_active_regions(sel, ref, contig, lo, hi)
    return [rg for rg in regions if rg.is_active], sel


def _record_key(v):
    gt = tuple(sorted(a.bases for a in v.genotypes[0].alleles)) \
        if v.genotypes else ()
    return (v.contig, v.start, bytes(v.ref.bases),
            tuple(bytes(a.bases) for a in v.alts), gt)


def pipeline_dryrun(n_devices, pcr_model="CONSERVATIVE",
                    genome_len=16000):
    """regions -> sharded PairHMM -> genotyping -> ordered merge over an
    n-device mesh; asserts equality with the unsharded pipeline."""
    import jax

    from ..pipeline.hc_engine import CallerConfig, RegionCaller

    contig, ref, reads, truth = _simulate(genome_len=genome_len)
    genome_len = len(ref)
    config = CallerConfig(pairhmm_engine="xla", pcr_indel_model=pcr_model)
    contig_dict = {contig: genome_len}

    # ---- unsharded baseline --------------------------------------------
    caller = RegionCaller(config, contig_dict)
    base_records = []
    regions, sel = _regions_for_span(reads, ref, contig, 0, genome_len)
    for rg in regions:
        rg_reads = [r for r in sel
                    if r.pos < rg.end + 1 + C.REGION_PADDING
                    and r.end > rg.start - C.REGION_PADDING]
        base_records.extend(caller.call_region(rg, rg_reads, ref, contig))
    base_keys = [_record_key(v) for v in base_records]

    # ---- sharded run ----------------------------------------------------
    devices = jax.devices()[:n_devices]
    mesh = make_data_mesh(devices)
    shards = shard_intervals([(contig, 0, genome_len)], n_devices)

    mqt = C.MIN_QUALITY_THRESHOLD
    per_shard = []   # list of (prepared, batch, reads, haps) per region
    for shard in shards:
        shard_caller = RegionCaller(config, contig_dict)
        entries = []
        for (ctg, pad_s, pad_e, core_s, core_e) in shard:
            regions, sel = _regions_for_span(reads, ref, ctg, pad_s, pad_e)
            for rg in regions:
                # ownership: the shard whose core span holds the region
                # midpoint calls it (regions never straddle shards)
                mid = (rg.start + rg.end + 1) // 2
                if not (core_s <= mid < core_e):
                    continue
                rg_reads = [r for r in sel
                            if r.pos < rg.end + 1 + C.REGION_PADDING
                            and r.end > rg.start - C.REGION_PADDING]
                prepared = shard_caller.prepare_region(rg, rg_reads, ref,
                                                       ctg)
                if isinstance(prepared, list):
                    entries.append(("ready", prepared, None, None, None))
                    continue
                hap_bases = [h.bases for h in prepared.haps]
                batch = _single_tile_batch(prepared.call_reads, hap_bases,
                                           pcr_model)
                entries.append(("score", prepared, batch,
                                prepared.call_reads, hap_bases))
        per_shard.append((shard_caller, entries))

    r_max = max(1, max(sum(1 for e in s[1] if e[0] == "score")
                       for s in per_shard))

    # stack per-shard batches into [S, R, ...] with padding slots
    def stack(field, shape, dtype):
        # keep the per-region (GR/GH = 1) tile axes: pairhmm_xla expects them
        out = np.zeros((n_devices, r_max, 1) + shape, dtype=dtype)
        for si, (_c, entries) in enumerate(per_shard):
            ri = 0
            for kind, _p, batch, _r, _h in entries:
                if kind != "score":
                    continue
                out[si, ri] = getattr(batch, field)
                ri += 1
        return out

    trans = stack("trans", (_DRY_LR, 8, 128), np.float32)
    rbase = stack("rbase", (_DRY_LR, 128), np.int32)
    rlen = stack("rlen", (1, 128), np.int32)
    hbase = stack("hbase", (_DRY_LH, 8, 128), np.int32)
    hlen = stack("hlen", (8, 1), np.int32)
    # padding slots: 1-base read/hap lengths keep the kernel well-defined
    for si, (_c, entries) in enumerate(per_shard):
        n_score = sum(1 for e in entries if e[0] == "score")
        for ri in range(n_score, r_max):
            rlen[si, ri, 0, 0, :] = 1
            hlen[si, ri, 0, :, 0] = 1

    gathered = np.asarray(sharded_pipeline_step(
        mesh, trans, rbase, rlen, hbase, hlen))
    assert gathered.shape[:2] == (n_devices, r_max), gathered.shape

    sharded_records = []
    for si, (shard_caller, entries) in enumerate(per_shard):
        ri = 0
        for kind, prepared, batch, rg_reads, haps in entries:
            if kind == "ready":
                sharded_records.extend(prepared)
                continue
            raw_tile = gathered[si, ri]  # (GH=1, GR=1, 8, 128)
            ri += 1
            lik, kept = _postprocess(batch, raw_tile, rg_reads, haps,
                                     pcr_model, mqt)
            sharded_records.extend(
                shard_caller.finish_region(prepared, lik, kept))
    sharded_records.sort(key=lambda v: (v.contig, v.start))
    sharded_keys = [_record_key(v) for v in sharded_records]

    if sharded_keys != base_keys:
        only_b = set(base_keys) - set(sharded_keys)
        only_s = set(sharded_keys) - set(base_keys)
        raise AssertionError(
            f"sharded != unsharded: base-only={sorted(only_b)[:5]} "
            f"sharded-only={sorted(only_s)[:5]}")
    if len(base_keys) < len(truth) // 2:
        raise AssertionError(
            f"dryrun called too few variants: {len(base_keys)} records "
            f"for {len(truth)} truth SNPs")
    return len(base_keys)
