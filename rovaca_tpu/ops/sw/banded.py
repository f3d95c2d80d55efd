"""Banded Smith-Waterman as a Pallas TPU kernel.

The reference runs GATK's affine-gap SW on CPU SIMD, vectorizing one
alignment along anti-diagonals (reference: src/haplotypecaller/common/base/
lib/sw_avx/sw_avx.c:79-200 — studied for semantics, not structure). The
TPU-native redesign is different on two axes:

1. **Banding.** The hot SW call sites (read-to-haplotype realignment,
   haplotype-to-reference cigars) know the expected diagonal up front —
   the read's mapped offset inside the haplotype, or ~0 for hap-vs-ref.
   A 128-wide diagonal band matches the VPU lane width exactly: row i
   scores columns [c0(i), c0(i)+128) with c0 shifting by one per row, so
   every DP dependency lands on a lane-aligned neighbor of the previous
   row's vector (diag = same lane, up = lane+1, left = in-row recurrence).

2. **The in-row gap chain becomes a max-plus prefix scan.** GATK's
   `best_gap_h` recurrence G[w] = max(G[w-1]+e, H[w-1]+o) looks serial,
   but (because gap-open <= gap-extend) it collapses to
   G[w] = max_{k<w}(B[k] + e*(w-k)) with B = max(diag, vert, CUTOFF)+o,
   i.e. a running max of B[k]-e*k — seven shift-max steps over the lane
   axis instead of a 128-long serial chain. The scan's argmax (earliest k
   on ties, matching GATK's keep-on-tie update) yields the horizontal
   jump length for the backtrack value.

The kernel emits the band's backtrack matrix (int16: 0 diag, +k vertical
jump, -k horizontal jump — hc_assemble_gatk_sw.c:104-285 semantics), the
column-m score profile and final-row band needed for the overhang end-cell
search, and a band-edge maximum. The host performs the exact GATK end-cell
selection and traceback (assembly/sw.py:_calculate_cigar).

Exactness contract: supported strategies are SOFTCLIP and IGNORE — the
production read-to-haplotype realignment path, where the band center comes
from the read's actual mapped offset so the optimum lies in-band by
construction; a band-edge guard plus traceback bounds-checking falls back
to the exact host SW when an optimum touches or leaves the band. The
INDEL/LEADING_INDEL strategies are global alignments whose optimal gap
placement can jump arbitrarily far off-diagonal (no fixed band can
soundly contain them), so they always go to the host implementation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...assembly.sw import (LOW_INIT_VALUE, MATRIX_MIN_CUTOFF,
                            OverhangStrategy, SWResult, _sw_align_python)
from ...reads.cigar import Cigar, CigarOp

W = 128                 # band width = VPU lane count
NEG = int(LOW_INIT_VALUE)       # plain int: jnp scalars would be captured
                                # as pallas constants


def _shift_left(x, fill):
    """x[w] <- x[w+1] along the lane axis; last lane <- fill."""
    r = pltpu.roll(x, shift=W - 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == W - 1, fill, r)


def _excl_cummax_arg(vals):
    """Exclusive running max along lanes with earliest-index argmax.

    vals: (1, W) int32. Returns (maxv, argw) where maxv[w] =
    max_{k<w} vals[k] (NEG for w=0) and argw[w] = smallest such argmax k.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    v = pltpu.roll(vals, shift=1, axis=1)
    v = jnp.where(lane == 0, NEG, v)
    idx = lane - 1
    s = 1
    while s < W:
        vs = pltpu.roll(v, shift=s, axis=1)
        is_ = pltpu.roll(idx, shift=s, axis=1)
        valid = lane >= s
        vs = jnp.where(valid, vs, NEG)
        take = vs >= v          # earlier index wins ties
        v = jnp.where(take, vs, v)
        idx = jnp.where(take, is_, idx)
        s *= 2
    return v, idx


S = 8                   # alignments per sublane group: one per sublane row


def _banded_kernel(ref_ref, alt_ref, meta_ref, bt_ref, colm_ref,
                   lastrow_ref, edge_ref, h_s, v_s, ks_s, last_s, edge_s, *,
                   Ln, C, wm, wmm, wo, we, indel_init, rows_per_block):
    """Grid = (alignment group, row-block). Eight alignments ride the
    (8, 128) VPU tile together — one per sublane row, the band along
    lanes. Per-alignment diagonal offsets are folded into each alt's
    left padding on the host (alt k stored at C + off_k), so every
    sublane shares one lane-aligned chunk load per row. DP state lives
    in VMEM scratch across row-blocks (TPU grid steps run sequentially);
    each step computes `rows_per_block` rows unrolled."""
    rb = pl.program_id(1)
    meta = meta_ref[0]                       # (S, 128) int32
    n = meta[:, 0:1]                         # (S, 1)
    m = meta[:, 1:2]
    offset = meta[:, 2:3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)

    def row0_val(j):
        # sw[0][j]: 0 at j==0; overhang-dependent for 1<=j<=m; NEG outside
        if indel_init:
            v = jnp.where(j == 0, 0, wo + (j - 1) * we)
        else:
            v = jnp.zeros_like(j)
        return jnp.where((j >= 0) & (j <= m), v, NEG)

    def col0_val(i):
        if indel_init:
            return jnp.where(i == 0, 0, wo + (i - 1) * we)
        return jnp.int32(0)

    @pl.when(rb == 0)
    def _init():
        # row 0 band: c0(0) = -offset - W//2
        h_s[...] = row0_val(-offset - W // 2 + lane)
        v_s[...] = jnp.full((S, W), NEG, jnp.int32)
        ks_s[...] = jnp.zeros((S, W), jnp.int32)
        last_s[...] = jnp.full((S, W), NEG, jnp.int32)
        edge_s[...] = jnp.full((S, 1), NEG, jnp.int32)

    H_prev = h_s[...]
    v_prev = v_s[...]
    ks_prev = ks_s[...]
    lastrow = last_s[...]
    edge_max = edge_s[...]

    bt_rows = []
    colm_rows = []
    for ri in range(rows_per_block):
        i = rb * rows_per_block + ri + 1
        cs = i - offset - W // 2          # (S, 1) column at lane 0
        j_lane = cs + lane                # (S, W)
        valid = (j_lane >= 1) & (j_lane <= m)

        # vertical gap state (GATK best_gap_v / gap_size_v), band-shifted
        Hup = _shift_left(H_prev, NEG)
        v_sh = _shift_left(v_prev, NEG)
        ks_sh = _shift_left(ks_prev, jnp.int32(0))
        open_v = Hup + wo
        ext_v = v_sh + we
        v_new = jnp.maximum(open_v, ext_v)
        ks_new = jnp.where(open_v > ext_v, 1, ks_sh + 1)

        # diagonal: ref[i-1] vs alt[j-1]. alt k is stored with left pad
        # C + off_k, so storage index (j-1) + C + off_k = i - W//2 - 1 + C
        # + lane — the same for every sublane. Mosaic needs lane-aligned
        # slice starts: load the two aligned (S, W) chunks covering
        # [start, start+W) and stitch with a circular roll.
        # per-sublane ref char at row i: aligned (S, W) chunk load, roll
        # the target lane to lane 0, take the static size-1 slice
        ib = ((i - 1) // W) * W
        rchunk = ref_ref[0, :, pl.ds(ib, W)]
        rchar = pltpu.roll(rchunk, shift=(W - ((i - 1) - ib)) % W,
                           axis=1)[:, :1]               # (S, 1)
        start = i - W // 2 - 1 + C
        a0 = (start // W) * W
        r = start - a0
        chunk0 = alt_ref[0, :, pl.ds(a0, W)]
        chunk1 = alt_ref[0, :, pl.ds(a0 + W, W)]
        rot = (W - r) % W
        r0 = pltpu.roll(chunk0, shift=rot, axis=1)
        r1 = pltpu.roll(chunk1, shift=rot, axis=1)
        achars = jnp.where(lane < W - r, r0, r1)
        d = H_prev + jnp.where(achars == rchar, wm, wmm)

        # horizontal chain as exclusive max-plus scan (see module doc)
        hv = jnp.maximum(jnp.maximum(d, v_new), MATRIX_MIN_CUTOFF)
        hv = jnp.where(valid, hv, jnp.where(j_lane == 0, col0_val(i), NEG))
        B = hv + wo - we * lane            # B[k]-e*k (+e*w added back below)
        B = jnp.where(j_lane >= 0, B, NEG)
        gmax, gargw = _excl_cummax_arg(B)
        # gap source k -> lane w costs wo + (w-k-1)*we (the open already
        # covers the first gap base): add we*(lane-1), not we*lane
        G = gmax + we * (lane - 1)
        ki = lane - gargw

        use_gap = (d < v_new) | (d < G)
        right_ge = G >= v_new
        Hval = jnp.where(use_gap, jnp.where(right_ge, G, v_new), d)
        Hval = jnp.maximum(Hval, MATRIX_MIN_CUTOFF)
        bt = jnp.where(use_gap, jnp.where(right_ge, -ki, ks_new), 0)
        Hcur = jnp.where(valid, Hval,
                         jnp.where(j_lane == 0, col0_val(i), NEG))
        bt = jnp.where(valid, bt, 0)

        # rows past the alignment end freeze every carry
        live = i <= n                      # (S, 1)
        Hcur = jnp.where(live, Hcur, H_prev)
        v_new = jnp.where(live, v_new, v_prev)
        ks_new = jnp.where(live, ks_new, ks_prev)
        bt = jnp.where(live, bt, 0)

        bt_rows.append(bt)
        colm_rows.append(jnp.max(jnp.where(live & (j_lane == m), Hcur, NEG),
                                 axis=1, keepdims=True))
        lastrow = jnp.where(i == n, Hcur, lastrow)
        # band-edge guard: any competitive score on the outermost lanes
        # means the optimum may live outside the band -> host fallback
        edge_here = jnp.max(jnp.where(
            live & valid & ((lane == 0) | (lane == W - 1)), Hcur, NEG),
            axis=1, keepdims=True)
        edge_max = jnp.maximum(edge_max, edge_here)
        H_prev, v_prev, ks_prev = Hcur, v_new, ks_new

    bt_ref[0] = jnp.stack(bt_rows, axis=0)             # (RPB, S, W)
    colm_ref[0] = jnp.stack(colm_rows, axis=0)[:, :, 0]  # (RPB, S)
    h_s[...] = H_prev
    v_s[...] = v_prev
    ks_s[...] = ks_prev
    last_s[...] = lastrow
    edge_s[...] = edge_max

    @pl.when(rb == pl.num_programs(1) - 1)
    def _finish():
        lastrow_ref[0] = last_s[...]
        edge_ref[0] = edge_s[...]


@functools.partial(jax.jit, static_argnames=("Ln", "C", "params",
                                             "indel_init", "interpret"))
def _banded_call(refs, alts, meta, *, Ln, C, params, indel_init,
                 interpret=False):
    """refs (G, S, Ln) i32; alts (G, S, A) i32 with alt k left-padded by
    C + off_k; meta (G, S, 128) i32 with [:, :, 0]=n, 1=m, 2=off."""
    G = refs.shape[0]
    A = alts.shape[2]
    wm, wmm, wo, we = params
    RPB = 16                      # rows per grid step
    kern = functools.partial(_banded_kernel, Ln=Ln, C=C, wm=wm,
                             wmm=wmm, wo=wo, we=we, indel_init=indel_init,
                             rows_per_block=RPB)
    grid = (G, Ln // RPB)
    bt, colm, lastrow, edge = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, Ln), lambda b, rb: (b, 0, 0)),
            pl.BlockSpec((1, S, A), lambda b, rb: (b, 0, 0)),
            pl.BlockSpec((1, S, 128), lambda b, rb: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, RPB, S, W), lambda b, rb: (b, rb, 0, 0)),
            pl.BlockSpec((1, RPB, S), lambda b, rb: (b, rb, 0)),
            pl.BlockSpec((1, S, W), lambda b, rb: (b, 0, 0)),
            pl.BlockSpec((1, S, 1), lambda b, rb: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Ln, S, W), jnp.int32),
            jax.ShapeDtypeStruct((G, Ln, S), jnp.int32),
            jax.ShapeDtypeStruct((G, S, W), jnp.int32),
            jax.ShapeDtypeStruct((G, S, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, W), jnp.int32),    # H band
            pltpu.VMEM((S, W), jnp.int32),    # best_gap_v
            pltpu.VMEM((S, W), jnp.int32),    # gap_size_v
            pltpu.VMEM((S, W), jnp.int32),    # row-n band
            pltpu.VMEM((S, 1), jnp.int32),    # edge max
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(refs, alts, meta)
    # int16 fits every backtrack value (|k| < W, scores not stored):
    # halves the device->host fetch, which dominates on a tunnel link
    return bt.astype(jnp.int16), colm, lastrow, edge


class BandedSWResult:
    __slots__ = ("result", "fell_back")

    def __init__(self, result, fell_back):
        self.result = result
        self.fell_back = fell_back


def _traceback_band(bt, colm, lastrow, n, m, offset, overhang, maxscore_edge):
    """Exact GATK end-cell search + traceback over the band, or None when
    the band-edge guard suggests the optimum may live outside.

    The guard is a HEURISTIC, not a proof: it falls back whenever any
    band-edge score competes with the in-band maximum, which catches the
    practical failure mode (the true diagonal drifting out of the band)
    but cannot detect a path that dips below the in-band maximum at the
    edge and regains score outside. Production call sites pair this with
    well-centered diagonals from a prior alignment, where the heuristic
    has matched the exact oracle on every tested corpus."""
    segment_length = 0
    if overhang == OverhangStrategy.INDEL:
        p1, p2 = n, m
    else:
        p1, p2 = 0, m
        maxscore = -np.inf
        for i in range(1, n + 1):
            if colm[i - 1] >= maxscore and colm[i - 1] > LOW_INIT_VALUE // 2:
                p1 = i
                maxscore = colm[i - 1]
        if overhang != OverhangStrategy.LEADING_INDEL:
            csn = n - offset - W // 2
            for j in range(1, m + 1):
                w = j - csn
                if not 0 <= w < W:
                    continue
                cur = lastrow[w]
                if cur <= LOW_INIT_VALUE // 2:
                    continue
                if cur > maxscore or (cur == maxscore
                                      and abs(n - j) < abs(p1 - p2)):
                    p1, p2 = n, j
                    maxscore = cur
                    segment_length = m - j
        if maxscore == -np.inf or maxscore_edge >= maxscore:
            return None            # optimum may live outside the band
    elements = []
    if segment_length > 0 and overhang == OverhangStrategy.SOFTCLIP:
        elements.append((CigarOp.S, segment_length))
        segment_length = 0

    state = CigarOp.M
    while True:
        w = p2 - (p1 - offset - W // 2)
        if not 1 <= w <= W - 2:    # touching the edge -> can't trust band
            return None
        btr = int(bt[p1 - 1, w])
        if btr > 0:
            new_state, step = CigarOp.D, btr
        elif btr < 0:
            new_state, step = CigarOp.I, -btr
        else:
            new_state, step = CigarOp.M, 1
        if new_state == CigarOp.M:
            p1 -= 1
            p2 -= 1
        elif new_state == CigarOp.I:
            p2 -= step
        else:
            p1 -= step
        if new_state == state:
            segment_length += step
        else:
            if segment_length > 0:
                elements.append((state, segment_length))
            segment_length = step
            state = new_state
        if not (p1 > 0 and p2 > 0):
            break

    if overhang == OverhangStrategy.SOFTCLIP:
        elements.append((state, segment_length))
        if p2 > 0:
            elements.append((CigarOp.S, p2))
        alignment_offset = p1
    elif overhang == OverhangStrategy.IGNORE:
        elements.append((state, segment_length + p2))
        alignment_offset = p1 - p2
    else:
        elements.append((state, segment_length))
        if p1 > 0:
            elements.append((CigarOp.D, p1))
        elif p2 > 0:
            elements.append((CigarOp.I, p2))
        alignment_offset = 0
    return SWResult(Cigar(reversed(elements)), alignment_offset)


def _round_up(x, mult):
    return -(-x // mult) * mult


def sw_align_banded_batch(pairs, params, overhang=OverhangStrategy.SOFTCLIP,
                          diagonals=None, interpret=False):
    """Batch-align [(ref, alt), ...] on TPU with a 128-wide diagonal band.

    diagonals[k] = expected alt-start offset of alt within ref (e.g. the
    read's mapped position inside the haplotype); defaults to
    (len(ref)-len(alt))//2. Returns a list of BandedSWResult whose .result
    is exact GATK SW output: band misses transparently fall back to the
    host implementation.
    """
    B = len(pairs)
    if B == 0:
        return []
    if not interpret:
        from ...utils.platform import backend_name, \
            enable_persistent_compilation_cache
        if backend_name() != "tpu":
            interpret = True   # CPU backends run the kernel interpreted
        else:
            enable_persistent_compilation_cache()
    if overhang in (OverhangStrategy.INDEL, OverhangStrategy.LEADING_INDEL):
        # global strategies: band cannot soundly contain the optimum
        return [BandedSWResult(
            _sw_align_python(bytes(r) if not isinstance(r, str) else
                             r.encode(),
                             bytes(a) if not isinstance(a, str) else
                             a.encode(), params, overhang), True)
                for r, a in pairs]
    refs = [r.encode() if isinstance(r, str) else bytes(r) for r, _ in pairs]
    alts = [a.encode() if isinstance(a, str) else bytes(a) for _, a in pairs]
    if diagonals is None:
        diagonals = [(len(r) - len(a)) // 2 for r, a in zip(refs, alts)]

    Ln = _round_up(max(len(r) for r in refs), 128)
    Lm = max(len(a) for a in alts)
    offmin = min(0, min(diagonals))
    offmax = max(0, max(diagonals))
    # per-alignment diagonal offsets fold into each alt's left padding:
    # alt k sits at C + off_k, so the kernel's chunk start is shared by
    # all 8 sublanes of a group. C large enough that the start is never
    # negative; width covers the largest padded alt plus both chunks.
    C = _round_up(2 * W - offmin, 128)
    A = _round_up(max(C + offmax + Lm, C + Ln) + 2 * W, 128)
    G = -(-B // S)

    ref_arr = np.zeros((G, S, Ln), dtype=np.int32)
    alt_arr = np.full((G, S, A), -1, dtype=np.int32)
    meta = np.zeros((G, S, 128), dtype=np.int32)
    for k, (r, a) in enumerate(zip(refs, alts)):
        g, s = divmod(k, S)
        ref_arr[g, s, :len(r)] = np.frombuffer(r, dtype=np.uint8)
        p = C + diagonals[k]
        alt_arr[g, s, p:p + len(a)] = np.frombuffer(a, dtype=np.uint8)
        meta[g, s, 0] = len(r)
        meta[g, s, 1] = len(a)
        meta[g, s, 2] = diagonals[k]

    indel_init = overhang in (OverhangStrategy.INDEL,
                              OverhangStrategy.LEADING_INDEL)
    bt, colm, lastrow, edge = (np.asarray(o) for o in _banded_call(
        ref_arr, alt_arr, meta,
        Ln=Ln, C=C,
        params=(params.match, params.mismatch, params.gap_open,
                params.gap_extend),
        indel_init=indel_init, interpret=interpret))

    out = []
    for k in range(B):
        g, s = divmod(k, S)
        n, m = len(refs[k]), len(alts[k])
        res = _traceback_band(bt[g, :, s, :], colm[g, :, s],
                              lastrow[g, s], n, m,
                              int(diagonals[k]), overhang,
                              int(edge[g, s, 0]))
        if res is None:
            res = _sw_align_python(refs[k], alts[k], params, overhang)
            out.append(BandedSWResult(res, True))
        else:
            out.append(BandedSWResult(res, False))
    return out
