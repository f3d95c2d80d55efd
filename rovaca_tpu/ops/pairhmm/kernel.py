"""Pallas TPU PairHMM forward kernel.

TPU-native layout (vs the reference's 16-reads-per-__m512 scheme,
reference: src/haplotypecaller/pairhmm/rovaca/avx_512_float.cc:29-183):
each vector tile is (8 haplotypes x 128 reads) = 1024 independent (read, hap)
DP cells per VPU op.

Blocking: the sweep processes ROWS_PER_ITER read rows x COLS_PER_ITER hap
columns per inner step. Within a row-block, row r's state feeds row r+1
entirely through registers (the I recurrence needs row r at the same column,
the M recurrence needs row r at the previous column — both are loop carries),
so VMEM scratch holds only ONE row of M/I/D state (the block's last row),
cutting state traffic by ROWS_PER_ITER. Column chunking batches the scratch
loads/stores U columns at a time.

Data-dependent trip counts: loops run to the tile's actual max read/hap
length (padding beyond is never swept), and rows below the tile's minimum
real read length skip the length-blend entirely (padding lanes carry all-zero
transition channels, so their state stays zero unmasked).

Masking (tail rows only):
- read-length mask: rows past a read's end copy the previous row through
  (so the final row holds every read's own terminal values)
- hap-length mask: applied only in the final column sum — columns past a
  hap's end accumulate garbage, but the DP only propagates state rightward/
  downward, so garbage never reaches valid columns.

Grid is (hap_tiles, read_tiles); read-side inputs are indexed by the read
tile only and hap-side by the hap tile only, so nothing is duplicated in HBM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C

F32 = jnp.float32
ROWS_PER_ITER = 4
COLS_PER_ITER = 8


def _pairhmm_kernel(trans_ref, rbase_ref, rlen_ref, hbase_ref, hlen_ref,
                    out_ref, mm_s, ii_s, dd_s, *, max_read_len, max_hap_len,
                    rows_per_iter, cols_per_iter):
    Lr, Lh = max_read_len, max_hap_len
    R, U = rows_per_iter, cols_per_iter

    hlen = hlen_ref[0]                                   # (8, 1) i32
    rlen = rlen_ref[0]                                   # (1, 128) i32
    init_d = F32(C.INITIAL_CONSTANT_F32) / jnp.maximum(hlen, 1).astype(F32)
    init_d = jnp.broadcast_to(init_d, (8, 128))
    zero_tile = jnp.zeros((8, 128), F32)

    max_rl = jnp.max(rlen)
    min_rl = jnp.min(jnp.where(rlen == 0, jnp.int32(Lr), rlen))
    max_hl = jnp.max(hlen)
    n_col_chunks = jnp.maximum(1, (max_hl + U - 1) // U)
    n_row_blocks = (max_rl + R - 1) // R
    fast_row_blocks = jnp.minimum(min_rl // R, n_row_blocks)

    # row -1 boundary: M = I = 0, D = 2^120 / hapLen in every column
    mm_s[...] = jnp.zeros((Lh, 8, 128), F32)
    ii_s[...] = jnp.zeros((Lh, 8, 128), F32)
    dd_s[...] = jnp.broadcast_to(init_d[None], (Lh, 8, 128))

    def make_block_body(masked):
        def block_body(ib, _):
            i0 = ib * R
            t = trans_ref[0, pl.ds(i0, R)]               # (R, 8, 128)
            # materialize sublane-broadcast channels once per row block so
            # the inner loop reads full (8,128) registers, not (1,128) views
            ch = [[jnp.broadcast_to(t[r, k:k + 1, :], (8, 128))
                   for k in range(8)] for r in range(R)]
            rb = rbase_ref[0, pl.ds(i0, R), :]           # (R, 128)
            rr = [jnp.broadcast_to(rb[r:r + 1, :], (8, 128))
                  for r in range(R)]
            lv = ([jnp.broadcast_to((i0 + r) < rlen, (8, 128))
                   for r in range(R)] if masked else None)

            # diagonal carry for block row 0 at col -1: zeros except the
            # global (-1,-1) corner D = init_d on the very first row
            dg0_d = jnp.where(i0 == 0, init_d, zero_tile)

            def chunk_body(jc, carry):
                j0 = jc * U
                Mc = list(carry[0:R])
                Ic = list(carry[R:2 * R])
                Dc = list(carry[2 * R:3 * R])
                dgM, dgI, dgD = (carry[3 * R], carry[3 * R + 1],
                                 carry[3 * R + 2])

                hb = hbase_ref[0, pl.ds(j0, U)]          # (U, 8, 128)
                mmP = mm_s[pl.ds(j0, U)]                 # prev block last row
                iiP = ii_s[pl.ds(j0, U)]
                ddP = dd_s[pl.ds(j0, U)]

                Ms, Is, Ds = [], [], []
                for u in range(U):
                    h = hb[u]
                    prevM, prevI, prevD = mmP[u], iiP[u], ddP[u]
                    dM, dI, dD = dgM, dgI, dgD
                    upM, upI, upD = prevM, prevI, prevD
                    for r in range(R):
                        (p_mm, p_gapm, p_mi, p_ii, p_md, p_dd, p_dm,
                         p_1dm) = ch[r]
                        match = (rr[r] & h) != 0
                        dchosen = jnp.where(match, p_1dm, p_dm)
                        M = dchosen * (dM * p_mm + (dI + dD) * p_gapm)
                        I = upM * p_mi + upI * p_ii
                        D = Mc[r] * p_md + Dc[r] * p_dd
                        if masked:
                            M = jnp.where(lv[r], M, upM)
                            I = jnp.where(lv[r], I, upI)
                            D = jnp.where(lv[r], D, upD)
                        dM, dI, dD = Mc[r], Ic[r], Dc[r]
                        Mc[r], Ic[r], Dc[r] = M, I, D
                        upM, upI, upD = M, I, D
                    Ms.append(Mc[R - 1])
                    Is.append(Ic[R - 1])
                    Ds.append(Dc[R - 1])
                    dgM, dgI, dgD = prevM, prevI, prevD

                mm_s[pl.ds(j0, U)] = jnp.stack(Ms)
                ii_s[pl.ds(j0, U)] = jnp.stack(Is)
                dd_s[pl.ds(j0, U)] = jnp.stack(Ds)
                return tuple(Mc) + tuple(Ic) + tuple(Dc) + (dgM, dgI, dgD)

            carry0 = (zero_tile,) * (3 * R) + (zero_tile, zero_tile, dg0_d)
            jax.lax.fori_loop(0, n_col_chunks, chunk_body, carry0)
            return 0
        return block_body

    jax.lax.fori_loop(0, fast_row_blocks, make_block_body(masked=False), 0)
    jax.lax.fori_loop(fast_row_blocks, n_row_blocks,
                      make_block_body(masked=True), 0)

    # final sum over valid columns of the last row: sum_j (M + I)
    def sum_body(jc, acc):
        j0 = jc * U
        mmF = mm_s[pl.ds(j0, U)]
        iiF = ii_s[pl.ds(j0, U)]
        for u in range(U):
            valid = (j0 + u) < hlen                      # (8, 1)
            acc = acc + jnp.where(valid, mmF[u] + iiF[u], F32(0.0))
        return acc

    out_ref[0, 0] = jax.lax.fori_loop(0, n_col_chunks, sum_body, zero_tile)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "rows_per_iter",
                                    "cols_per_iter"))
def pairhmm_pallas(trans, rbase, rlen, hbase, hlen, interpret=False,
                   rows_per_iter=ROWS_PER_ITER, cols_per_iter=COLS_PER_ITER):
    """Batched PairHMM forward on TPU.

    trans: (GR, Lr, 8, 128) f32; rbase: (GR, Lr, 128) i32;
    rlen: (GR, 1, 128) i32; hbase: (GH, Lh, 8, 128) i32; hlen: (GH, 8, 1) i32.
    Returns (GH, GR, 8, 128) f32 raw (scaled by 2^120) forward probabilities.
    Lr % rows_per_iter == 0 and Lh % cols_per_iter == 0 required.
    """
    GR, Lr = trans.shape[0], trans.shape[1]
    GH, Lh = hbase.shape[0], hbase.shape[1]
    R, U = rows_per_iter, cols_per_iter
    assert Lr % R == 0 and Lh % U == 0, (Lr, R, Lh, U)

    kernel = functools.partial(_pairhmm_kernel, max_read_len=Lr,
                               max_hap_len=Lh, rows_per_iter=R,
                               cols_per_iter=U)
    flops = 2 * 9 * Lr * Lh * GR * GH * 8 * 128
    return pl.pallas_call(
        kernel,
        grid=(GH, GR),
        in_specs=[
            pl.BlockSpec((1, Lr, 8, 128), lambda h, r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lr, 128), lambda h, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda h, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lh, 8, 128), lambda h, r: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 1), lambda h, r: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda h, r: (h, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GH, GR, 8, 128), F32),
        scratch_shapes=[
            pltpu.VMEM((Lh, 8, 128), F32),
            pltpu.VMEM((Lh, 8, 128), F32),
            pltpu.VMEM((Lh, 8, 128), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=trans.size * 4 + hbase.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(trans, rbase, rlen, hbase, hlen)
