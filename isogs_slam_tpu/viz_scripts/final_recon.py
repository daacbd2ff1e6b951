"""Final reconstruction viewer (reference viz_scripts/final_recon.py).

Renders the final checkpoint along its estimated trajectory (color / depth /
silhouette modes), writes a replay video (or PNG frames), a novel orbit
around the scene, and the 3D trajectory figure. With Open3D installed, an
interactive point-cloud window opens instead (reference UX).

    python -m isogs_slam_tpu.viz_scripts.final_recon <config.py> \
        [--mode color|depth|sil|centers] [--every 5] [--orbit-frames 60]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..ops.rasterize import RasterConfig
from ..slam.config import load_experiment_config
from .common import (colorize_depth, frame_to_uint8, have_open3d,
                     load_scene, make_render_fn, plot_trajectory,
                     render_w2c, save_video_or_frames)


def orbit_poses(center: np.ndarray, radius: float, n: int,
                height: float = 0.0):
    """Look-at orbit around `center` (w2c matrices)."""
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = center + np.array([radius * np.sin(ang), height,
                                 radius * np.cos(ang)])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (right, up2, fwd,
                                                          eye)
        poses.append(np.linalg.inv(c2w))
    return poses


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", type=str)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--mode", type=str, default="color",
                   choices=["color", "depth", "sil", "centers"])
    p.add_argument("--every", type=int, default=5,
                   help="render every Nth trajectory frame")
    p.add_argument("--orbit-frames", type=int, default=0,
                   help="additionally render an N-frame novel orbit")
    p.add_argument("--downscale", type=int, default=2)
    p.add_argument("--sh", action="store_true",
                   help="view-dependent deg-3 SH colors when the "
                        "checkpoint carries nonzero higher-band "
                        "sh_coeffs_flat (C++ renderer parity)")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args(argv)

    config = load_experiment_config(args.config)
    result_dir = os.path.join(config["workdir"], config["run_name"])
    viz_dir = os.path.join(result_dir, "viz")
    os.makedirs(viz_dir, exist_ok=True)

    state, cam, est_w2cs, gt_w2cs, ckpt, sh_flat = load_scene(
        result_dir, args.checkpoint, return_sh=True)
    if not args.sh:
        sh_flat = None
    elif sh_flat is None:
        print("[viz] --sh requested but the checkpoint has no nonzero "
              "higher-band sh_coeffs_flat; rendering stored RGB")
    if args.downscale > 1:
        cam = cam.scaled(cam.width // args.downscale,
                         cam.height // args.downscale)
    print(f"[viz] {ckpt}: {int(np.asarray(state.hwm))} Gaussians, "
          f"{est_w2cs.shape[0]} poses, rendering at "
          f"{cam.width}x{cam.height}")

    if have_open3d():  # pragma: no cover - interactive path
        print("[viz] Open3D found — interactive viewer")
        _interactive_open3d(state, cam, est_w2cs)
        return

    r = config.get("raster", {})
    rcfg = RasterConfig(max_per_tile=r.get("max_per_tile", 512),
                        tile_chunk=r.get("tile_chunk", 256))
    fn = make_render_fn(cam, rcfg)

    frames = []
    for t in range(0, est_w2cs.shape[0], max(args.every, 1)):
        im, depth, sil = render_w2c(fn, state, est_w2cs[t],
                                    sh_flat=sh_flat)
        if args.mode == "color":
            frames.append(frame_to_uint8(im))
        elif args.mode == "depth":
            frames.append(colorize_depth(np.asarray(depth[0])))
        else:
            s = np.asarray(sil)
            frames.append((np.stack([s] * 3, -1) * 255).astype(np.uint8))
    save_video_or_frames(frames, os.path.join(viz_dir,
                                              f"replay_{args.mode}"),
                         fps=args.fps)

    if args.orbit_frames > 0:
        means = np.asarray(state.params.means3d[: int(state.hwm)])
        center = np.median(means, axis=0)
        radius = 1.2 * np.percentile(
            np.linalg.norm(means - center, axis=1), 90)
        oframes = []
        for w2c in orbit_poses(center, radius, args.orbit_frames):
            im, depth, sil = render_w2c(fn, state, w2c,
                                        sh_flat=sh_flat)
            oframes.append(frame_to_uint8(im))
        save_video_or_frames(oframes, os.path.join(viz_dir, "orbit"),
                             fps=args.fps)

    plot_trajectory(est_w2cs, gt_w2cs,
                    os.path.join(viz_dir, "trajectory.png"))
    print(f"[viz] outputs in {viz_dir}")


def _interactive_open3d(state, cam, est_w2cs):  # pragma: no cover
    import open3d as o3d
    n = int(np.asarray(state.hwm))
    pts = np.asarray(state.params.means3d[:n], np.float64)
    cols = np.clip(np.asarray(state.params.rgb_colors[:n], np.float64),
                   0, 1)
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(pts)
    pcd.colors = o3d.utility.Vector3dVector(cols)
    o3d.visualization.draw_geometries([pcd])


if __name__ == "__main__":
    main()
