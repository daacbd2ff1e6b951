"""Inria-style gradient-driven densification (clone & split) with Adam-state
surgery, on the fixed-capacity map.

Semantics from `utils/slam_external.py`:
  * accumulate_mean2d_gradient (:100-104): per-seen-Gaussian screen-space
    gradient norm accumulation + counter
  * densify (:191-243): every densify_every iters while iter<=stop_after:
      clone  — grad >= thresh and max scale <= 0.01 * scene_radius
      split  — grad >= thresh and max scale  > 0.01 * scene_radius;
               n copies at N(mean, scale) samples rotated into the Gaussian
               frame, scales /(0.8 n), originals removed
      then opacity/size pruning, stats reset, optional opacity reset
  * cat_params_to_optimizer / remove_points (:122-160): appended rows get
    zero Adam moments; removals keep moments aligned.

Fixed-capacity translation: appends scatter into [hwm, ...) slots
(gaussians.append_rows), removals clear `alive` bits. The Adam moments are
[capacity]-shaped, so "zero moments for new rows" holds automatically as
long as slots are write-once within one optimizer lifetime — callers must
not compact the map while an optimizer state is live.

All functions are jit-compatible and run inside training scan loops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import optim
from ..core.gaussians import GaussianParams, MapState, append_rows
from ..utils.transforms import quat_to_rotmat
from .mapping import PruneConfig, _prune_mask


class DensifyConfig(NamedTuple):
    """densify_dict (configs/*/splatam.py)."""

    start_after: int = 500
    remove_big_after: int = 3000
    stop_after: int = 5000
    densify_every: int = 100
    grad_thresh: float = 0.0002
    num_to_split_into: int = 2
    removal_opacity_threshold: float = 0.005
    final_removal_opacity_threshold: float = 0.005
    reset_opacities_every: int = 3000
    reset_opacities: bool = True


def accumulate_mean2d_gradient(state: MapState, radii, means2d_grad
                               ) -> MapState:
    """radii [C] int32 from the render; means2d_grad [C,2] = d loss /
    d means2d_offset (the retain_grad pattern, slam_external.py:100-104)."""
    seen = radii > 0
    gnorm = jnp.sqrt(jnp.sum(means2d_grad * means2d_grad, axis=-1))
    accum = jnp.where(seen, state.means2d_grad_accum + gnorm,
                      state.means2d_grad_accum)
    denom = jnp.where(seen, state.denom + 1.0, state.denom)
    max_r = jnp.where(seen,
                      jnp.maximum(radii.astype(state.max_2d_radius.dtype),
                                  state.max_2d_radius),
                      state.max_2d_radius)
    return state._replace(means2d_grad_accum=accum, denom=denom,
                          max_2d_radius=max_r)


def _split_rows(params: GaussianParams, key, n_copies: int):
    """One perturbed copy per call-key: means += R @ N(0, scales),
    scales /= 0.8*n (slam_external.py:205-215)."""
    scales = jnp.exp(params.log_scales)
    samples = scales * jax.random.normal(key, params.means3d.shape,
                                         params.means3d.dtype)
    R = quat_to_rotmat(params.unnorm_rotations)
    offset = jnp.einsum("nij,nj->ni", R, samples)
    return params._replace(
        means3d=params.means3d + offset,
        log_scales=jnp.log(scales / (0.8 * n_copies)))


def densify_step(state: MapState, opt: optim.AdamState, key, it,
                 dcfg: DensifyConfig):
    """One densify() call at iteration `it` (traced). Returns
    (state, opt). The clone/split only fires on the reference schedule;
    off-schedule the state passes through unchanged (masked appends with
    zero valid rows)."""
    do = ((it <= dcfg.stop_after) & (it >= dcfg.start_after)
          & (it % max(dcfg.densify_every, 1) == 0))

    grads = state.means2d_grad_accum / jnp.maximum(state.denom, 1e-12)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    max_scale = jnp.max(jnp.exp(state.params.log_scales), axis=1)
    hot = (grads >= dcfg.grad_thresh) & state.alive
    small = max_scale <= 0.01 * state.scene_radius

    to_clone = do & hot & small
    to_split = do & hot & ~small

    # append_rows fully resets the densification stats (reference semantics
    # when a densify actually fires); off-schedule the accumulators must
    # survive, so stash and restore them under `do`.
    saved = (state.max_2d_radius, state.means2d_grad_accum, state.denom)

    # clone: exact copies (zero Adam moments arrive for free — fresh slots)
    state = append_rows(state, state.params, to_clone, state.timestep)
    # split: n perturbed copies, then remove the originals
    keys = jax.random.split(key, dcfg.num_to_split_into)
    for i in range(dcfg.num_to_split_into):
        rows = _split_rows(state.params, keys[i], dcfg.num_to_split_into)
        state = append_rows(state, rows, to_split, state.timestep)
    state = state._replace(
        alive=state.alive & ~to_split,
        max_2d_radius=jnp.where(do, state.max_2d_radius, saved[0]),
        means2d_grad_accum=jnp.where(do, state.means2d_grad_accum,
                                     saved[1]),
        denom=jnp.where(do, state.denom, saved[2]))

    # opacity / big pruning right after densify (slam_external.py:228-237)
    thres = jnp.where(it == dcfg.stop_after,
                      dcfg.final_removal_opacity_threshold,
                      dcfg.removal_opacity_threshold)
    remove = jax.nn.sigmoid(state.params.logit_opacities[:, 0]) < thres
    big = max_scale_now(state) > 0.1 * state.scene_radius
    remove = jnp.where(it >= dcfg.remove_big_after, remove | big, remove)
    state = state._replace(alive=jnp.where(do, state.alive & ~remove,
                                           state.alive))

    # opacity reset on its own schedule (reset moments too)
    if dcfg.reset_opacities:
        do_reset = ((it > 0) & (it <= dcfg.stop_after)
                    & (it % max(dcfg.reset_opacities_every, 1) == 0))
        reset_val = jnp.log(jnp.asarray(0.01 / 0.99, jnp.float32))
        new_op = jnp.where(do_reset,
                           jnp.full_like(state.params.logit_opacities,
                                         reset_val),
                           state.params.logit_opacities)
        state = state._replace(
            params=state.params._replace(logit_opacities=new_op))
        zmu = jnp.where(do_reset,
                        jnp.zeros_like(opt.mu.logit_opacities),
                        opt.mu.logit_opacities)
        znu = jnp.where(do_reset,
                        jnp.zeros_like(opt.nu.logit_opacities),
                        opt.nu.logit_opacities)
        opt = opt._replace(mu=opt.mu._replace(logit_opacities=zmu),
                           nu=opt.nu._replace(logit_opacities=znu))
    return state, opt


def max_scale_now(state: MapState):
    return jnp.max(jnp.exp(state.params.log_scales), axis=1)


def prune_step(state: MapState, it, pc: PruneConfig) -> MapState:
    """prune_gaussians schedule as alive-mask updates (mapping.py keeps its
    own inline copy for the SLAM scan; this is the standalone version)."""
    remove = _prune_mask(state.params, state.alive, state.scene_radius, it,
                         pc)
    return state._replace(alive=state.alive & ~remove)
