"""Pallas TPU PairHMM forward kernel.

TPU-native layout (vs the reference's 16-reads-per-__m512 scheme,
reference: src/haplotypecaller/pairhmm/rovaca/avx_512_float.cc:29-183):
each vector tile is (8 haplotypes x 128 reads) = 1024 independent (read, hap)
DP cells per VPU op. Scalar loops sweep read rows (outer) and haplotype
columns (inner, unrolled UNROLL-wide with chunked VMEM traffic); one DP row of
state (M/I/D for every column) lives in VMEM scratch shaped (Lh+1, 8, 128),
updated chunk-in-place with the previous row's chunk consumed into registers
just before being overwritten — the reference kernel's register choreography,
widened from 16 lanes to 1024 and unrolled.

Masking:
- read-length mask: rows past a read's end copy the previous row through
  (so the final row holds every read's own terminal values)
- hap-length mask: applied only in the final column sum — columns past a
  hap's end accumulate garbage, but the DP only ever propagates state
  rightward/downward, so garbage never reaches valid columns.

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
UNROLL = 8


def _pairhmm_kernel(trans_ref, rbase_ref, rlen_ref, hbase_ref, hlen_ref,
                    out_ref, mm_s, ii_s, dd_s, *, max_read_len, max_hap_len):
    Lr, Lh = max_read_len, max_hap_len
    U = UNROLL

    hlen = hlen_ref[0]                                   # (8, 1) i32
    rlen = rlen_ref[0]                                   # (1, 128) i32
    init_d = F32(C.INITIAL_CONSTANT_F32) / jnp.maximum(hlen, 1).astype(F32)
    init_d = jnp.broadcast_to(init_d, (8, 128))
    zero_tile = jnp.zeros((8, 128), F32)

    # row -1 boundary: M = I = 0, D = 2^120 / hapLen in every column
    mm_s[...] = jnp.zeros((Lh + 1, 8, 128), F32)
    ii_s[...] = jnp.zeros((Lh + 1, 8, 128), F32)
    dd_s[...] = jnp.broadcast_to(init_d[None], (Lh + 1, 8, 128))

    def row_body(i, _):
        t = trans_ref[0, pl.ds(i, 1)]                    # (1, 8, 128)
        bc = lambda k: jnp.broadcast_to(t[0, k:k + 1, :], (8, 128))
        p_mm, p_gapm, p_mi, p_ii, p_md, p_dd, p_distm, p_1distm = (
            bc(k) for k in range(8))
        r = jnp.broadcast_to(rbase_ref[0, pl.ds(i, 1), :], (8, 128))
        lvalid = jnp.broadcast_to(i < rlen, (8, 128))

        # column -1 boundary for this row; the (-1,-1) corner carries D=init_d
        # into M[0][0] on the first row only
        corner_d = jnp.where(i == 0, init_d, zero_tile)

        def chunk_body(jc, carry):
            j0 = jc * U
            (M_j1, I_j1, D_j1, M_i1j1, I_i1j1, D_i1j1) = carry
            hb = hbase_ref[0, pl.ds(j0, U)]              # (U, 8, 128)
            mmP = mm_s[pl.ds(j0, U)]                     # row i-1, cols j0..+U
            iiP = ii_s[pl.ds(j0, U)]
            ddP = dd_s[pl.ds(j0, U)]

            Ms, Is, Ds = [], [], []
            for u in range(U):
                M_i1, I_i1, D_i1 = mmP[u], iiP[u], ddP[u]
                match = (r & hb[u]) != 0
                dchosen = jnp.where(match, p_1distm, p_distm)
                M_t = dchosen * (M_i1j1 * p_mm + (I_i1j1 + D_i1j1) * p_gapm)
                I_t = M_i1 * p_mi + I_i1 * p_ii
                D_t = M_j1 * p_md + D_j1 * p_dd
                M = jnp.where(lvalid, M_t, M_i1)
                I = jnp.where(lvalid, I_t, I_i1)
                D = jnp.where(lvalid, D_t, D_i1)
                Ms.append(M)
                Is.append(I)
                Ds.append(D)
                M_i1j1, I_i1j1, D_i1j1 = M_i1, I_i1, D_i1
                M_j1, I_j1, D_j1 = M, I, D

            mm_s[pl.ds(j0, U)] = jnp.stack(Ms)
            ii_s[pl.ds(j0, U)] = jnp.stack(Is)
            dd_s[pl.ds(j0, U)] = jnp.stack(Ds)
            return (M_j1, I_j1, D_j1, M_i1j1, I_i1j1, D_i1j1)

        carry0 = (zero_tile, zero_tile, zero_tile,        # col -1, row i
                  zero_tile, zero_tile, corner_d)         # (i-1, j-1) corner
        jax.lax.fori_loop(0, Lh // U, chunk_body, carry0)
        return 0

    jax.lax.fori_loop(0, Lr, row_body, 0)

    # final sum over valid columns of the last row: sum_j (M + I)
    def sum_body(jc, acc):
        j0 = jc * U
        mmF = mm_s[pl.ds(j0, U)]
        iiF = ii_s[pl.ds(j0, U)]
        for u in range(U):
            valid = (j0 + u) < hlen                      # (8, 1)
            acc = acc + jnp.where(valid, mmF[u] + iiF[u], F32(0.0))
        return acc

    out_ref[0, 0] = jax.lax.fori_loop(0, Lh // U, sum_body, zero_tile)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairhmm_pallas(trans, rbase, rlen, hbase, hlen, interpret=False):
    """Batched PairHMM forward on TPU.

    trans: (GR, Lr, 8, 128) f32; rbase: (GR, Lr, 128) i32;
    rlen: (GR, 1, 128) i32; hbase: (GH, Lh, 8, 128) i32; hlen: (GH, 8, 1) i32.
    Returns (GH, GR, 8, 128) f32 raw (scaled by 2^120) forward probabilities.
    Lh must be a multiple of UNROLL.
    """
    GR, Lr = trans.shape[0], trans.shape[1]
    GH, Lh = hbase.shape[0], hbase.shape[1]
    assert Lh % UNROLL == 0, (Lh, UNROLL)

    kernel = functools.partial(_pairhmm_kernel, max_read_len=Lr,
                               max_hap_len=Lh)
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
            pltpu.VMEM((Lh + 1, 8, 128), F32),
            pltpu.VMEM((Lh + 1, 8, 128), F32),
            pltpu.VMEM((Lh + 1, 8, 128), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=trans.size * 4 + hbase.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(trans, rbase, rlen, hbase, hlen)
