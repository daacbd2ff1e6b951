"""RGB-D back-projection and silhouette-driven Gaussian densification.

jitted analogs of `get_pointcloud` (scripts/splatam.py:298-348) and
`add_new_gaussians` (:799-841). The torch version materializes a boolean-
indexed point cloud of dynamic size; here candidates stay dense [H*W] with a
validity mask and are scatter-appended into the fixed-capacity map.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussians import (GaussianParams, MapState, append_rows,
                              new_gaussian_rows)
from ..ops.rasterize import RasterConfig, render_rgbd_sil
from ..utils.transforms import pose_to_w2c, transform_to_frame, normalize


def backproject(im: jnp.ndarray, depth: jnp.ndarray, cam: Camera,
                c2w: jnp.ndarray | None = None):
    """im [3,H,W] in [0,1], depth [1,H,W] -> (points [HW,3] world,
    colors [HW,3], mean3_sq_dist [HW]).

    mean_sq_dist follows the "projective" rule (splatam.py:326-332):
    (depth / ((fx+fy)/2))^2.
    """
    H, W = depth.shape[-2:]
    xs = jnp.arange(W, dtype=im.dtype)
    ys = jnp.arange(H, dtype=im.dtype)
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    z = depth[0]
    x = (xg - cam.cx) / cam.fx * z
    y = (yg - cam.cy) / cam.fy * z
    pts_cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    if c2w is not None:
        pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    else:
        pts = pts_cam
    cols = im.transpose(1, 2, 0).reshape(-1, 3)
    scale_g = z.reshape(-1) / ((cam.fx + cam.fy) / 2.0)
    return pts, cols, scale_g * scale_g


@functools.partial(jax.jit, static_argnames=("cam", "rcfg", "sil_thres",
                                              "gaussian_distribution"),
                   donate_argnames=("state",))
def add_new_gaussians(state: MapState, gt_im: jnp.ndarray,
                      gt_depth: jnp.ndarray, cam_quat: jnp.ndarray,
                      cam_trans: jnp.ndarray, time_idx,
                      key: jax.Array, cam: Camera, rcfg: RasterConfig,
                      sil_thres: float = 0.5,
                      gaussian_distribution: str = "isotropic"
                      ) -> MapState:
    """Densify the map where the current frame is unexplained
    (add_new_gaussians, splatam.py:799-841):

      non_presence = (silhouette < sil_thres)
                   | (rendered_depth > gt_depth and error > 50*median)
      masked by valid gt depth; back-project those pixels with the current
      estimated pose and append as fresh Gaussians.
    """
    params = jax.tree.map(jax.lax.stop_gradient, state.params)
    means_cam, quats_cam = transform_to_frame(
        params.means3d, params.unnorm_rotations, cam_quat, cam_trans,
        gaussians_grad=False, camera_grad=False)
    _, depth, silhouette, _, _ = render_rgbd_sil(
        means_cam, quats_cam, params.log_scales, params.logit_opacities,
        params.rgb_colors, state.alive, cam, rcfg)

    non_presence_sil = silhouette < sil_thres
    gtd = gt_depth[0]
    rd = depth[0]
    depth_error = jnp.abs(gtd - rd) * (gtd > 0)
    non_presence_depth = (rd > gtd) & (depth_error
                                       > 50.0 * jnp.median(depth_error))
    non_presence = (non_presence_sil | non_presence_depth) & (gtd > 0)
    valid = non_presence.reshape(-1)

    quat_n = normalize(cam_quat)
    w2c = pose_to_w2c(quat_n, cam_trans)
    c2w = jnp.linalg.inv(w2c)
    pts, cols, m3sd = backproject(gt_im, gt_depth, cam, c2w)
    # "isotropic" is force-3D'd with N(0,0.01) log-scale perturbation so the
    # flatness regularizer has a symmetry-breaking direction; "anisotropic"
    # tiles without perturbation (initialize_params, splatam.py:357-373)
    rows = new_gaussian_rows(
        pts, cols, jnp.maximum(m3sd, 1e-12),
        perturb_key=key if gaussian_distribution == "isotropic" else None)
    return append_rows(state, rows, valid, time_idx)


def initialize_first_frame(gt_im, gt_depth, cam: Camera, capacity: int,
                           key: jax.Array, scene_radius_depth_ratio: float,
                           time_idx: int = 0,
                           gaussian_distribution: str = "isotropic"
                           ) -> MapState:
    """First-frame map init (initialize_first_timestep, splatam.py:411-453):
    every valid-depth pixel becomes a Gaussian; scene_radius =
    max(depth)/ratio."""
    from ..core.gaussians import empty_state
    state = empty_state(capacity)
    pts, cols, m3sd = backproject(jnp.asarray(gt_im), jnp.asarray(gt_depth),
                                  cam, None)
    valid = jnp.asarray(gt_depth)[0].reshape(-1) > 0
    rows = new_gaussian_rows(
        pts, cols, jnp.maximum(m3sd, 1e-12),
        perturb_key=key if gaussian_distribution == "isotropic" else None)
    state = append_rows(state, rows, valid, time_idx)
    return state._replace(
        scene_radius=jnp.max(jnp.asarray(gt_depth))
        / scene_radius_depth_ratio)
