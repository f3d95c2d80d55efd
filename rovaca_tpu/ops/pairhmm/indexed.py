"""Cross-region batched PairHMM: scalar-prefetch indexed tile pairs.

The 2D-grid kernel computes every (hap tile x read tile) product, which is
right within one region but wasteful across regions (region A's reads never
meet region B's haplotypes). This variant takes explicit (hap_tile,
read_tile) pair lists via scalar prefetch, so many regions' tiles share one
kernel launch — the TPU analogue of the reference's cross-region worker
batching (reference: src/haplotypecaller/pairhmm/pairhmm_internal.cpp:
268-391 groups reads; here we group whole regions).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel import (COLS_PER_ITER, F32, ROWS_PER_ITER, _pairhmm_kernel)


def _indexed_kernel(hidx_ref, ridx_ref, trans_ref, rbase_ref, rlen_ref,
                    hbase_ref, hlen_ref, out_ref, mm_s, ii_s, dd_s, **kw):
    # scalar-prefetch args are consumed by the index maps; the body is the
    # standard kernel
    _pairhmm_kernel(trans_ref, rbase_ref, rlen_ref, hbase_ref, hlen_ref,
                    out_ref, mm_s, ii_s, dd_s, **kw)


@functools.partial(jax.jit, static_argnames=("rows_per_iter",
                                             "cols_per_iter"))
def pairhmm_pallas_indexed(trans, rbase, rlen, hbase, hlen, hidx, ridx,
                           rows_per_iter=ROWS_PER_ITER,
                           cols_per_iter=COLS_PER_ITER):
    """Score G tile pairs: output[g] uses hap tile hidx[g] vs read tile
    ridx[g].

    trans: (GR, Lr, 8, 128) f32; rbase: (GR, Lr, 128) i32;
    rlen: (GR, 1, 128) i32; hbase: (GH, Lh, 8, 128) i32; hlen: (GH, 8, 1)
    i32; hidx/ridx: (G,) i32. Returns (G, 8, 128) f32.
    """
    GR, Lr = trans.shape[0], trans.shape[1]
    GH, Lh = hbase.shape[0], hbase.shape[1]
    G = hidx.shape[0]
    R, U = rows_per_iter, cols_per_iter
    assert Lr % R == 0 and Lh % U == 0, (Lr, R, Lh, U)

    kernel = functools.partial(_indexed_kernel, max_read_len=Lr,
                               max_hap_len=Lh, rows_per_iter=R,
                               cols_per_iter=U)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Lr, 8, 128),
                         lambda g, hidx, ridx: (ridx[g], 0, 0, 0)),
            pl.BlockSpec((1, Lr, 128),
                         lambda g, hidx, ridx: (ridx[g], 0, 0)),
            pl.BlockSpec((1, 1, 128),
                         lambda g, hidx, ridx: (ridx[g], 0, 0)),
            pl.BlockSpec((1, Lh, 8, 128),
                         lambda g, hidx, ridx: (hidx[g], 0, 0, 0)),
            pl.BlockSpec((1, 8, 1),
                         lambda g, hidx, ridx: (hidx[g], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128),
                               lambda g, hidx, ridx: (g, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Lh, 8, 128), F32),
            pltpu.VMEM((Lh, 8, 128), F32),
            pltpu.VMEM((Lh, 8, 128), F32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 1, 8, 128), F32),
    )(hidx, ridx, trans, rbase, rlen, hbase, hlen)
    return out[:, 0]
