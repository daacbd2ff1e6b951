"""Tile-parallel TRACKING over a device mesh (shard_map).

Tracking is the Amdahl term of the multi-chip story: mapping already
shards over views (parallel/sharded.py) but every frame must be tracked,
and the tracking loss is a masked SUM over pixels — perfectly
tile-parallel. This module runs the whole per-frame Adam pose loop
(slam/tracking.adam_pose_loop) INSIDE a shard_map over the tile axis:

  * projection + binning run replicated (small fraction of the frame),
  * each device gathers the frozen slot table for ITS tile block only
    (the per-frame [T, K] gather cost divides by the mesh size too),
  * per iteration each device composites its tiles and computes local
    masked sums; one psum of ~10 scalars (loss pieces + pose gradients)
    makes every device take the identical Adam step.

The gradients are psummed EXPLICITLY (adam_pose_loop's value_and_grad_fn
hook): differentiating through a psum'd forward would leave each device
with only its local partial gradient.

Semantics: identical to the serial frozen-slot-table path
(slam/tracking.track_frame with reference-parity knobs) up to float
reassociation of the pixel sums — asserted by
tests/test_track_sharded.py on the virtual 8-device mesh. The reference
is single-GPU (no distributed anywhere); this is the TPU-native scaling
axis for it (SURVEY.md §2.3).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..ops.rasterize import RasterConfig
from ..slam.losses import LossConfig, LossOutputs, compute_loss_slots_subset
from ..slam.tracking import TrackingConfig, TrackResult, adam_pose_loop
from .tile_sharded import TILE_AXIS, make_tile_mesh  # noqa: F401 (re-export)


def make_tracking_frame_sharded(mesh: Mesh, cam: Camera, rcfg: RasterConfig,
                                lcfg: LossConfig, tcfg: TrackingConfig):
    """Build the jitted tile-sharded tracking program for one camera.

    Returns fn(params, alive, init_quat, init_trans, gt_im [3,H,W],
    gt_depth [1,H,W]) -> TrackResult. The GN polish and the perturbation
    fan are serial-path features (both retired for sequences, NOTES.md);
    coarse pyramid levels are handled by the caller building one program
    per level camera (slam/pipeline wiring)."""
    if tcfg.gn_iters > 0 or tcfg.fan_rounds > 0:
        raise NotImplementedError(
            "tile-sharded tracking supports the Adam loop only "
            "(gn_iters=0, fan_rounds=0)")
    if lcfg.ignore_outlier_depth_loss:
        raise NotImplementedError(
            "ignore_outlier_depth_loss needs a global median; not "
            "supported on the tile-sharded path")
    if tcfg.tile_subsample > 1:
        raise NotImplementedError(
            "combine one fast mode at a time: tile-sharded tracking "
            "already shrinks per-device work by the mesh size")
    n_dev = mesh.devices.size
    T = cam.num_tiles
    pad = (-T) % n_dev
    from ..core.camera import TILE
    from ..ops.rasterize import tile_pixel_validity
    valid_np = np.concatenate(
        [tile_pixel_validity(cam),
         np.zeros((pad, TILE * TILE), bool)]) \
        if pad else tile_pixel_validity(cam)
    # padded tiles point at tile 0 for pixel coordinates; their counts are
    # zero and their valid mask is all-False, so they contribute nothing
    sel_np = np.concatenate(
        [np.arange(T, dtype=np.int32), np.zeros(pad, np.int32)])

    def shard_fn(params, tg_l, cnt_l, gt_l, valid_l, sel_l, q0, t0):
        from ..ops.rasterize import gather_raw_table
        raw_l = gather_raw_table(params, tg_l)

        def local_loss(pose):
            out = compute_loss_slots_subset(
                raw_l, cnt_l, sel_l, pose[0], pose[1], gt_l, valid_l,
                cam, rcfg, lcfg, scale=1.0)
            n_loc = jnp.sum(valid_l.astype(jnp.float32))
            return out.loss, (out, n_loc)

        def value_and_grad_fn(pose):
            (loss_l, (out_l, n_loc)), g_l = jax.value_and_grad(
                local_loss, has_aux=True)(pose)
            ps = lambda x: jax.lax.psum(x, TILE_AXIS)
            loss = ps(loss_l)
            grads = jax.tree.map(ps, g_l)
            # compute_loss_slots_subset normalizes mask_frac by the LOCAL
            # valid-pixel count; recover the count and renormalize by the
            # global one
            mask_cnt = ps(out_l.mask_frac * jnp.maximum(n_loc, 1.0))
            n_tot = ps(n_loc)
            out = out_l._replace(
                loss=loss, im=ps(out_l.im), depth=ps(out_l.depth),
                mask_frac=mask_cnt / jnp.maximum(n_tot, 1.0))
            return (loss, out), grads

        final = adam_pose_loop(None, (q0, t0), tcfg,
                               value_and_grad_fn=value_and_grad_fn)
        bq, bt = (final.polyak_pose() if tcfg.polyak_rho > 0
                  else final.best_pose)
        return bq, bt, final.it, final.log

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS),
                  P(TILE_AXIS), P(TILE_AXIS), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False)

    @functools.partial(jax.jit, donate_argnames=())
    def fn(params: GaussianParams, alive, init_quat, init_trans,
           gt_im, gt_depth):
        params = jax.tree.map(jax.lax.stop_gradient, params)
        # replicated per-frame binning at the initial pose (same margin +
        # cull contract as the serial path, slam/tracking.track_frame)
        from ..ops.rasterize import (bin_gaussians, image_to_tiles,
                                     project_gaussians)
        from ..utils.transforms import transform_to_frame
        mc0, qc0 = transform_to_frame(params.means3d,
                                      params.unnorm_rotations,
                                      init_quat, init_trans,
                                      gaussians_grad=False,
                                      camera_grad=False)
        proj0 = project_gaussians(mc0, qc0, params.log_scales, alive, cam,
                                  margin_px=tcfg.bin_margin_px)
        binning = bin_gaussians(
            proj0, cam, rcfg,
            opacity=jax.nn.sigmoid(params.logit_opacities[:, 0]),
            cull_slack_px=tcfg.bin_margin_px)
        K = binning.tile_gauss.shape[1]
        tg = jnp.concatenate(
            [binning.tile_gauss, jnp.zeros((pad, K), jnp.int32)]) \
            if pad else binning.tile_gauss
        cnt = jnp.concatenate(
            [binning.tile_count,
             jnp.zeros((pad,), binning.tile_count.dtype)]) \
            if pad else binning.tile_count
        gt_tiles = image_to_tiles(
            jnp.concatenate([gt_im, gt_depth], axis=0), cam)  # [T, P, 4]
        if pad:
            gt_tiles = jnp.concatenate(
                [gt_tiles, jnp.zeros((pad,) + gt_tiles.shape[1:],
                                     gt_tiles.dtype)])
        bq, bt, it, log = sharded(params, tg, cnt, gt_tiles,
                                  jnp.asarray(valid_np),
                                  jnp.asarray(sel_np),
                                  init_quat, init_trans)
        return TrackResult(quat=bq, trans=bt, iters_run=it, loss_log=log,
                           gn_accepted=jnp.asarray(-1, jnp.int32))

    return fn
