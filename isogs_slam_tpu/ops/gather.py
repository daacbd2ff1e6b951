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

import jax
import jax.numpy as jnp
import numpy as np


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
