"""Offline 3DGS training core — the jitted machinery behind
`scripts/gaussian_splatting.py` (reference :318-592) and
`scripts/post_splatam_opt.py`.

Flow (reference semantics):
  1. init sweep: walk the scan once with GT (or estimated) poses, adding
     Gaussians from the silhouette mask per frame (add_new_gaussians);
  2. full-map optimization at the final frame: num_iters_mapping iterations,
     each sampling a random frame, loss = w_im*(0.8 L1 + 0.2 DSSIM) +
     w_depth * L1(depth*valid, gt) (get_loss_gs, :199-235), Adam with an
     exponential means3D lr schedule, plus Inria clone/split densification
     driven by screen-space gradient stats.

TPU-first: the optimization runs as chunked `lax.scan`s — each chunk holds a
random subset of frames device-resident (uint8) and performs `chunk_iters`
loss/grad/densify/Adam steps in one XLA program. Frame sampling is uniform
over the whole scan across chunks (frames are re-drawn per chunk), matching
the reference's per-iteration uniform draw in distribution.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import optim
from ..core.camera import Camera
from ..core.gaussians import GaussianParams, MapState
from ..ops.rasterize import RasterConfig, render_rgbd_sil
from ..ops.ssim import calc_ssim
from ..utils.transforms import transform_to_frame
from .densify import DensifyConfig, accumulate_mean2d_gradient, densify_step

N_LOG = 3  # loss, im, depth


class OfflineConfig(NamedTuple):
    num_iters: int
    lr_means3d: float
    lr_rgb_colors: float
    lr_unnorm_rotations: float
    lr_logit_opacities: float
    lr_log_scales: float
    lr_means3d_final: float = 3.2e-6
    lr_delay_mult: float = 0.01
    w_im: float = 1.0
    w_depth: float = 1.0
    use_densification: bool = True
    densify: DensifyConfig = DensifyConfig()
    eps: float = 1e-8
    chunk_iters: int = 100
    frames_per_chunk: int = 16

    def lrs(self) -> GaussianParams:
        f = jnp.float32
        return GaussianParams(
            means3d=f(self.lr_means3d), rgb_colors=f(self.lr_rgb_colors),
            unnorm_rotations=f(self.lr_unnorm_rotations),
            logit_opacities=f(self.lr_logit_opacities),
            log_scales=f(self.lr_log_scales))


def expon_lr(step, lr_init, lr_final, lr_delay_mult, max_steps):
    """get_expon_lr_func (Inria utils, used at gaussian_splatting.py:392)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / (0.01 * max_steps + 1e-8), 0, 1))
    return delay * jnp.exp(jnp.log(lr_init) * (1 - t)
                           + jnp.log(lr_final) * t)


def offline_loss(params: GaussianParams, alive, quat, trans, gt_im,
                 gt_depth, cam: Camera, rcfg: RasterConfig, w_im, w_depth,
                 means2d_offset):
    """get_loss_gs (gaussian_splatting.py:199-235): no silhouette masking,
    0.8 L1 + 0.2 DSSIM color, depth L1 over validity-zeroed depth."""
    means_cam, quats_cam = transform_to_frame(
        params.means3d, params.unnorm_rotations,
        jax.lax.stop_gradient(quat), jax.lax.stop_gradient(trans),
        gaussians_grad=True, camera_grad=False)
    im, depth, sil, dsq, aux = render_rgbd_sil(
        means_cam, quats_cam, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, rcfg, means2d_offset)
    valid = gt_depth != 0.0
    depth = depth * valid
    loss_im = (0.8 * jnp.abs(im - gt_im).mean()
               + 0.2 * (1.0 - calc_ssim(im, gt_im)))
    loss_depth = jnp.abs(depth - gt_depth).mean()
    total = w_im * loss_im + w_depth * loss_depth
    return total, (loss_im, loss_depth, aux["radii"])


@functools.partial(jax.jit,
                   static_argnames=("cam", "rcfg", "ocfg"),
                   donate_argnames=("state", "opt"))
def offline_chunk(state: MapState, opt: optim.AdamState,
                  frame_colors_u8, frame_depths,     # [F,H,W,3]u8 / [F,H,W]
                  frame_quats, frame_trans,          # [F,4] / [F,3]
                  iter_frames,                       # [chunk] int32 in [0,F)
                  keys,                              # [chunk] PRNG keys
                  lr_means3d,                        # [chunk] f32 schedule
                  it0,                               # [] int32 global iter
                  cam: Camera, rcfg: RasterConfig, ocfg: OfflineConfig):
    """chunk_iters optimization steps over device-resident frames."""
    base_lrs = ocfg.lrs()

    def loss_fn(params, m2d, alive, quat, trans, im, depth):
        total, aux = offline_loss(params, alive, quat, trans, im, depth,
                                  cam, rcfg, ocfg.w_im, ocfg.w_depth, m2d)
        return total, aux

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def body(carry, xs):
        st, op = carry
        fidx, key, lr_m, step = xs
        im = (frame_colors_u8[fidx].astype(jnp.float32) / 255.0
              ).transpose(2, 0, 1)
        depth = frame_depths[fidx][None]
        m2d = jnp.zeros((st.capacity, 2), jnp.float32)
        (total, (l_im, l_d, radii)), (grads, g_m2d) = grad_fn(
            st.params, m2d, st.alive, frame_quats[fidx],
            frame_trans[fidx], im, depth)

        if ocfg.use_densification:
            st = accumulate_mean2d_gradient(st, radii, g_m2d)
            st, op = densify_step(st, op, key, step, ocfg.densify)

        lrs = base_lrs._replace(means3d=lr_m)
        new_params, op = optim.step(st.params, grads, op, lrs,
                                    eps=ocfg.eps)
        st = st._replace(params=new_params)
        return (st, op), jnp.stack([total, l_im, l_d])

    steps = it0 + jnp.arange(iter_frames.shape[0], dtype=jnp.int32)
    (state, opt), log = jax.lax.scan(
        body, (state, opt), (iter_frames, keys, lr_means3d, steps))
    return state, opt, log
