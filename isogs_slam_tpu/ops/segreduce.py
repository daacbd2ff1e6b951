"""Pallas TPU kernel: contiguous-segment row reduction.

This is the gradient-aggregation half of the rasterizer backward. XLA's
scatter-add on TPU is an index-serial sort-based loop (~8 ns/row measured,
NOTES.md lever 1) — the [T*K, C] -> [N, C] d_table accumulation was the
single largest per-iteration cost of mapping. The replacement pipeline:

  1. the per-slot cotangent rows are written back to their *expansion
     positions* (the pre-binning-sort gaussian-major order) with a
     DUPLICATE-FREE scatter (`unique_indices=True, mode='drop'`) — no
     read-modify-write, no dedup sort; padding slots go to an
     out-of-bounds sentinel and are dropped;
  2. in expansion order, each gaussian's rows are CONTIGUOUS
     (`jnp.repeat` built the expansion gaussian-major), so the
     accumulation becomes this kernel: per block of GB gaussians, DMA the
     block's row window from HBM and reduce segments with one
     boundary-mask matmul on the MXU.

TPU layout constraints shape the interface (all hit on real hardware):
dynamic-offset DMA windows must keep the lane dim a multiple of 128, so
the row table is padded to LANES=128 columns (the 12.8x lane padding is
pure bandwidth, ~1 ms/GB — the index-serial scatter it replaces costs
~8 ns/ROW); DMA offsets must be provably 8-divisible, so each block's
scan start is aligned down (the segment mask drops the extra rows); block
sublane dims must be multiples of 8, so the per-gaussian segment-start
rows are blocked [8, GB] and the program's row is mask-selected.

The analog in the reference stack is the gradient atomicAdd scatter inside
gsplat's `rasterize_to_pixels_3dgs_bwd` (consumed at
cpp/src/rendering/renderer.cpp:214-232) — on TPU the sorted-contiguous
reduction replaces atomics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GB = 512     # gaussians (output rows) per program
W = 1024     # expansion rows DMA'd + reduced per chunk
LANES = 128  # row-table lane padding (TPU lane tiling)


def _kernel(starts_ref, lo_ref, d_exp_hbm, out_ref, win_ref, acc_ref, sem,
            *, C):
    g = pl.program_id(0)
    # align the scan start down to a sublane tile (8 rows): Mosaic requires
    # provably-8-divisible dynamic DMA offsets, and the segment mask
    # already excludes the up-to-7 leading rows of the previous block
    s = (starts_ref[g] // 8) * 8
    e = starts_ref[g + 1]
    # lo_ref is an [8, GB] block (TPU block shapes need sublane multiples
    # of 8); select this program's row with a mask reduction — dynamic
    # sublane indexing is not lowerable
    r = jax.lax.rem(g, 8)
    row_sel = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r)
    lo_row = jnp.sum(jnp.where(row_sel, lo_ref[:, :], 0), axis=0,
                     keepdims=True)                            # [1, GB]
    hi_row = jnp.concatenate(
        [lo_row[:, 1:], jnp.full((1, 1), e, jnp.int32)], axis=1)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def chunk(ch, _):
        start = s + ch * W
        dma = pltpu.make_async_copy(
            d_exp_hbm.at[pl.ds(start, W)], win_ref, sem)
        dma.start()
        dma.wait()
        jglob = start + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        m = ((jglob >= lo_row) & (jglob < hi_row)).astype(jnp.float32)
        # accumulate TRANSPOSED [LANES, GB]: the planar ([C, N]) output
        # makes the downstream per-column VJP chains contiguous row
        # slices, and the out-block write avoids the 12.8x lane padding
        # a [GB, C] row-major block would pay
        acc_ref[:] += jax.lax.dot_general(
            win_ref[:].astype(jnp.float32), m,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [LANES, GB]
        return 0

    jax.lax.fori_loop(0, pl.cdiv(e - s, W), chunk, 0)
    out_ref[:] = acc_ref[:C, :]


def segment_reduce_rows(d_exp: jnp.ndarray, exp_offsets: jnp.ndarray,
                        n_out: int, n_cols: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Sum contiguous row segments: out[n] = sum(d_exp[off[n]:off[n+1], :C]).

    d_exp [M_pad, LANES] with the live data in columns [:n_cols] (M_pad
    must be >= exp_offsets[-1] + W so chunk DMAs never run out of bounds —
    pad with zeros); exp_offsets [n_out + 1] int32 non-decreasing.
    Returns PLANAR [n_cols, n_out] float32 (out[c, n] = segment sum of
    column c) — the layout the per-column consumers want.
    """
    assert d_exp.shape[1] == LANES
    C = n_cols
    nb = pl.cdiv(n_out, GB)
    pad_n = nb * GB - n_out
    offs = exp_offsets
    if pad_n:
        offs = jnp.concatenate(
            [offs, jnp.broadcast_to(offs[-1:], (pad_n,))])     # [nb*GB+1]
    lo = offs[:-1].reshape(nb, GB)
    # pad the row dim to a multiple of 8: blocks are [8, GB] (sublane rule)
    nb8 = (nb + 7) // 8 * 8
    if nb8 != nb:
        lo = jnp.concatenate(
            [lo, jnp.zeros((nb8 - nb, GB), jnp.int32)], axis=0)
    starts = offs[::GB]                                        # [nb+1]

    out = pl.pallas_call(
        functools.partial(_kernel, C=C),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((8, GB), lambda g, s: (g // 8, 0)),
                # keep the row table in HBM: the chunk DMA uses dynamic
                # (segment-dependent) offsets, which VMEM-resident tiled
                # memrefs reject (sublane alignment proof)
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((C, GB), lambda g, s: (0, g)),
            scratch_shapes=[
                pltpu.VMEM((W, LANES), d_exp.dtype),
                pltpu.VMEM((LANES, GB), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((C, nb * GB), jnp.float32),
        interpret=interpret,
    )(starts, lo, d_exp)
    return out[:, :n_out]
