"""Fixed-capacity Gaussian map state (the XLA-native `GaussianModel`).

The reference keeps two shapes of this state: a dict of torch Parameters that
is concatenated/sliced on every densify/prune (`scripts/splatam.py:351-399`,
`utils/slam_external.py:107-243`) and, in the C++ tree, a pre-allocated
20M-capacity memory pool with an active count (`cpp/src/core/gaussian_model.cpp:25-45`).
The pool design is exactly what XLA's static-shape model wants, so we adopt
it: arrays have capacity C, `hwm` is the used-slot high-water mark, and
`alive` marks live rows (pruning clears bits; periodic compaction re-packs).

All mutation functions are pure and jit-compatible.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GaussianParams(NamedTuple):
    """Optimizable per-Gaussian parameters (reference `params` dict minus the
    camera trajectory, scripts/splatam.py:373-379)."""

    means3d: jnp.ndarray          # [C, 3]
    rgb_colors: jnp.ndarray       # [C, 3]
    unnorm_rotations: jnp.ndarray  # [C, 4] (w,x,y,z)
    logit_opacities: jnp.ndarray  # [C, 1]
    log_scales: jnp.ndarray       # [C, 3]


class MapState(NamedTuple):
    """Gaussian map + bookkeeping (`variables` in the reference)."""

    params: GaussianParams
    alive: jnp.ndarray            # [C] bool
    hwm: jnp.ndarray              # [] int32, used slots (alive or dead)
    timestep: jnp.ndarray         # [C] f32 creation frame
    max_2d_radius: jnp.ndarray    # [C] f32
    means2d_grad_accum: jnp.ndarray  # [C] f32
    denom: jnp.ndarray            # [C] f32
    scene_radius: jnp.ndarray     # [] f32

    @property
    def capacity(self) -> int:
        return self.params.means3d.shape[0]

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


def empty_state(capacity: int, dtype=jnp.float32) -> MapState:
    z = lambda *shape: jnp.zeros(shape, dtype)
    params = GaussianParams(
        means3d=z(capacity, 3), rgb_colors=z(capacity, 3),
        unnorm_rotations=z(capacity, 4), logit_opacities=z(capacity, 1),
        log_scales=z(capacity, 3))
    return MapState(params=params,
                    alive=jnp.zeros((capacity,), bool),
                    hwm=jnp.zeros((), jnp.int32),
                    timestep=z(capacity),
                    max_2d_radius=z(capacity),
                    means2d_grad_accum=z(capacity),
                    denom=z(capacity),
                    scene_radius=jnp.ones((), dtype))


def new_gaussian_rows(points: jnp.ndarray, colors: jnp.ndarray,
                      mean3_sq_dist: jnp.ndarray, perturb_key=None
                      ) -> GaussianParams:
    """Parameter init for a batch of back-projected points.

    Semantics of `initialize_params`/`initialize_new_params`
    (scripts/splatam.py:351-399, 763-796): identity quats, logit-opacity 0
    (sigmoid -> 0.5), log-scale = log(sqrt(mean3_sq_dist)) tiled to 3 axes;
    the "isotropic" config is force-3D'd with N(0, 0.01) perturbation so the
    IsoGS flatness regularizer has a symmetry-breaking direction.
    """
    n = points.shape[0]
    base = 0.5 * jnp.log(mean3_sq_dist)[:, None]          # log(sqrt(d))
    log_scales = jnp.tile(base, (1, 3))
    if perturb_key is not None:
        log_scales = log_scales + 0.01 * jax.random.normal(
            perturb_key, log_scales.shape, log_scales.dtype)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0], points.dtype), (n, 1))
    return GaussianParams(
        means3d=points, rgb_colors=colors, unnorm_rotations=quats,
        logit_opacities=jnp.zeros((n, 1), points.dtype),
        log_scales=log_scales)


def append_rows(state: MapState, rows: GaussianParams, valid: jnp.ndarray,
                time_idx) -> MapState:
    """Scatter `rows[valid]` into slots [hwm, hwm+sum(valid)).

    The analog of `add_new_gaussians`'s torch.cat (scripts/splatam.py:832-839)
    without reallocation: rows whose destination exceeds capacity are dropped
    (XLA scatter drop mode); the caller checks hwm afterwards and grows the
    capacity bucket host-side if saturation is near.

    Stats arrays (means2d_grad_accum, denom, max_2d_radius) are zeroed
    globally, matching splatam.py:835-837.
    """
    C = state.capacity
    valid = valid.astype(jnp.int32)
    dest = state.hwm + jnp.cumsum(valid) - valid
    dest = jnp.where(valid > 0, dest, C)  # C == out-of-bounds -> dropped
    n_add = jnp.minimum(jnp.sum(valid), C - state.hwm)

    def scat(dst_arr, src_arr):
        return dst_arr.at[dest].set(src_arr, mode="drop")

    params = GaussianParams(*[scat(d, s) for d, s in
                              zip(state.params, rows)])
    alive = state.alive.at[dest].set(True, mode="drop")
    timestep = state.timestep.at[dest].set(
        jnp.full(dest.shape, time_idx, state.timestep.dtype), mode="drop")
    # distinct buffers: donated pytrees must not alias leaves (XLA rejects
    # donating the same buffer twice in one Execute)
    z = lambda: jnp.zeros((C,), state.max_2d_radius.dtype)
    return state._replace(params=params, alive=alive,
                          hwm=state.hwm + n_add, timestep=timestep,
                          max_2d_radius=z(),
                          means2d_grad_accum=z(), denom=z())


def prune(state: MapState, remove: jnp.ndarray) -> MapState:
    """Mark rows dead (remove_points semantics, slam_external.py:139-160;
    physical compaction is deferred to `compact`)."""
    return state._replace(alive=state.alive & ~remove)


def compact(state: MapState) -> MapState:
    """Re-pack alive rows into a dense prefix (the jitted analog of the C++
    pool's index_select compaction, cpp/src/core/gaussian_model.cpp:291-331).

    Stable argsort on the dead flag keeps creation order, matching the
    reference's boolean-mask row filtering.
    """
    order = jnp.argsort(~state.alive, stable=True)
    n_alive = jnp.sum(state.alive.astype(jnp.int32))
    g = lambda a: a[order]
    params = GaussianParams(*[g(p) for p in state.params])
    alive = jnp.arange(state.capacity) < n_alive
    return state._replace(
        params=params, alive=alive, hwm=n_alive,
        timestep=g(state.timestep), max_2d_radius=g(state.max_2d_radius),
        means2d_grad_accum=g(state.means2d_grad_accum), denom=g(state.denom))


def grow_capacity(state: MapState, new_capacity: int) -> MapState:
    """Host-side capacity bucket growth (triggers one re-jit per bucket)."""
    C = state.capacity
    assert new_capacity >= C
    pad = lambda a: jnp.concatenate(
        [a, jnp.zeros((new_capacity - C,) + a.shape[1:], a.dtype)])
    params = GaussianParams(*[pad(p) for p in state.params])
    return state._replace(
        params=params, alive=pad(state.alive.astype(jnp.int32)).astype(bool),
        timestep=pad(state.timestep), max_2d_radius=pad(state.max_2d_radius),
        means2d_grad_accum=pad(state.means2d_grad_accum),
        denom=pad(state.denom))


def round_capacity(n: int, granule: int = 65536) -> int:
    """Capacity buckets: multiples of `granule` (bounds jit cache entries)."""
    return max(granule, (n + granule - 1) // granule * granule)
