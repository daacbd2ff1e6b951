"""Planar-table row gather with a layout-controlled scatter backward.

TPU random access costs ~8 ns per INDEX regardless of row width (NOTES.md
lever 1e), so k separate per-parameter gathers pay k times the index bill,
and their AD-generated scatter-adds inherit whatever layout XLA picked for
the zero target — measured 5.3 ms per 131k-update scatter into a
column-major [N, 3] (element-serial) vs ~1 ms row-major.

`gather_rows_planar` fixes both at once: the caller stacks all needed
per-row columns into ONE planar [C, N] table (row slices of column-major
params — cheap), the forward is one row gather, and the backward
scatter-adds into an explicitly ROW-major [N, C] target before returning
the planar cotangent. The CUDA analog is the fused per-neighbor record +
atomicAdd of iso_loss.cu:117-142.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# MEASURED (2026-08-18, real v5e chip, bench.py exact semantics): the
# slice-window gather LOWERS TO A SERIAL dynamic-slice WHILE LOOP on TPU
# (profile: while.107 1150 ms/iter + constant_dynamic-slice fusions),
# exactly like the windowed scatter trap in NOTES.md lever 1e. Bench A/B:
# 0.395 FPS with window gathers vs 0.792 FPS with plain row gathers.
# Default is therefore the ROW-GATHER path; set ISOGS_WINDOW_GATHER=1 to
# re-try the slice-window lowering on a future compiler.
_WINDOW_GATHER_OFF = (
    bool(int(os.environ.get("ISOGS_NO_WINDOW_GATHER", "0")))
    or not bool(int(os.environ.get("ISOGS_WINDOW_GATHER", "0"))))


@jax.custom_vjp
def gather_rows_planar(table_pl: jnp.ndarray, idx: jnp.ndarray):
    """table_pl [C, N] -> records idx.shape + [C]."""
    return table_pl.T[idx]


def _grp_fwd(table_pl, idx):
    return table_pl.T[idx], (idx, table_pl.shape)


def _grp_bwd(res, dg):
    idx, (c, n) = res
    tgt = jnp.zeros((n, c), dg.dtype)
    if jax.default_backend() == "tpu":
        from jax.experimental.layout import Layout, with_layout_constraint
        # row-major target => the scatter-add is a per-ROW operation
        tgt = with_layout_constraint(tgt, Layout((0, 1)))
    dtab = tgt.at[idx.reshape(-1)].add(dg.reshape(-1, c))
    return jnp.transpose(dtab), np.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_planar.defvjp(_grp_fwd, _grp_bwd)


def gather_slices(table: jnp.ndarray, starts: jnp.ndarray, size: int
                  ) -> jnp.ndarray:
    """Contiguous-window gather: table[starts[i] : starts[i]+size] for each
    start, as ONE XLA gather whose slice_sizes carry the window — one index
    per WINDOW instead of one per row. TPU random access is index-serial
    (~8 ns/index, NOTES.md lever 1e), so fetching S windows of `size` rows
    this way costs ~S indices + bandwidth, vs S*size indices for the
    equivalent element/row gather (the spatial-hash bucket fetch and the
    binning slot-window gather are exactly this shape).

    table [R] or [R, C]; starts any int shape; returns
    starts.shape + (size,) (+ (C,)). Starts are CLAMPED to [0, R-size]
    (XLA gather semantics): callers whose real windows can overrun the end
    must pad `table` so clamping only ever hits masked/sentinel windows.
    Forward-only (no differentiability; all users gather integer ids /
    stop-gradient records).
    """
    sshape = starts.shape
    if _WINDOW_GATHER_OFF:
        # DEFAULT path (see _WINDOW_GATHER_OFF above): plain row gather
        # with the same start-clamp semantics — one index per ROW. The
        # slice-window lowering measured 2x SLOWER end-to-end on TPU
        # (serial dynamic-slice while loop); ISOGS_WINDOW_GATHER=1
        # re-enables it for future-compiler A/Bs.
        r = table.shape[0]
        rows = (jnp.clip(starts.astype(jnp.int32), 0, r - size)[..., None]
                + jnp.arange(size, dtype=jnp.int32))
        return table[rows]
    idx = starts.reshape(-1, 1).astype(jnp.int32)
    if table.ndim == 1:
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        out = jax.lax.gather(table, idx, dnums, slice_sizes=(size,),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out.reshape(sshape + (size,))
    assert table.ndim == 2
    C = table.shape[1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    out = jax.lax.gather(table, idx, dnums, slice_sizes=(size, C),
                         mode=jax.lax.GatherScatterMode.CLIP)
    return out.reshape(sshape + (size, C))
