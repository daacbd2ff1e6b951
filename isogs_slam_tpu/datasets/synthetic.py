"""Synthetic RGB-D sequence for tests and benchmarks.

The reference has no dataset fixtures (SURVEY.md §4); short cheap runs are
done by truncating real data. Real datasets are not present in this
environment, so this module builds a self-consistent multi-view RGB-D
sequence by rendering a procedurally generated Gaussian "box room" with the
framework's own (oracle-validated) renderer: color and depth are consistent
across views, poses are exact, and SLAM quality metrics (ATE, PSNR, depth L1)
are meaningful.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..ops.rasterize import RasterConfig, render_rgbd_sil
from ..utils.transforms import rotmat_to_quat, quat_mult, normalize


def make_room_gaussians(rng: np.random.Generator, n_per_wall: int = 900,
                        room: float = 2.0):
    """Checkerboard-textured box-room walls as opaque Gaussians."""
    pts, cols = [], []
    side = int(np.sqrt(n_per_wall))
    lin = np.linspace(-room, room, side)
    u, v = np.meshgrid(lin, lin, indexing="xy")
    u, v = u.reshape(-1), v.reshape(-1)
    walls = [
        (np.stack([u, v, np.full_like(u, room)], -1), (0.8, 0.3, 0.3)),
        (np.stack([np.full_like(u, -room), u, v + room], -1), (0.3, 0.8, 0.3)),
        (np.stack([np.full_like(u, room), u, v + room], -1), (0.3, 0.3, 0.8)),
        (np.stack([u, np.full_like(u, -room), v + room], -1), (0.8, 0.8, 0.3)),
        (np.stack([u, np.full_like(u, room), v + room], -1), (0.3, 0.8, 0.8)),
    ]
    for p, base in walls:
        checker = ((np.floor(p[:, 0] * 2) + np.floor(p[:, 1] * 2)
                    + np.floor(p[:, 2] * 2)) % 2)
        c = np.outer(checker, np.array(base)) \
            + np.outer(1 - checker, np.array(base) * 0.45)
        # high-frequency per-Gaussian texture: tracking needs gradient
        # signal at sub-checker scale (real scenes are not flat-shaded)
        c = np.clip(c + rng.uniform(-0.18, 0.18, c.shape), 0.02, 0.98)
        pts.append(p)
        cols.append(c)
    pts = np.concatenate(pts).astype(np.float32)
    cols = np.concatenate(cols).astype(np.float32)
    pts += rng.normal(0, 0.005, pts.shape).astype(np.float32)
    n = pts.shape[0]
    spacing = 2 * room / side
    log_scales = np.log(np.full((n, 3), spacing * 0.9, np.float32))
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    logit_op = np.full((n, 1), 4.0, np.float32)  # near-opaque
    return pts, cols, quats, log_scales, logit_op


def make_trajectory(num_frames: int, radius: float = 0.4,
                    step: float = 0.012):
    """Smooth orbit segment with REALISTIC inter-frame motion (~step
    meters/frame, like a 30fps handheld camera — Replica moves 1-2 cm per
    frame). The orbit phase advances by `step / radius` radians per frame
    regardless of sequence length, so tracking sees small pose deltas."""
    poses = []
    for i in range(num_frames):
        t = i * step / (2 * np.pi * radius)   # orbit phase in [0, 1)
        ang = 0.35 * np.sin(2 * np.pi * t)
        cx = radius * np.sin(2 * np.pi * t)
        cy = 0.15 * np.sin(4 * np.pi * t)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = [cx, cy, 0.3 * np.sin(2 * np.pi * t)]
        poses.append(c2w.astype(np.float32))
    return poses


class SyntheticDataset:
    """RGBDDataset-compatible synthetic sequence."""

    def __init__(self, num_frames: int = 20, height: int = 120,
                 width: int = 160, seed: int = 0, n_per_wall: int = 2500,
                 traj_step: float = 0.012):
        rng = np.random.default_rng(seed)
        self.height, self.width = height, width
        f = 0.75 * width
        self.cam = Camera(width=width, height=height, fx=f, fy=f,
                          cx=width / 2 - 0.5, cy=height / 2 - 0.5)
        (self.pts, self.cols, self.quats, self.log_scales,
         self.logit_op) = make_room_gaussians(rng, n_per_wall)
        # traj_step meters/frame. Photometric tracking only converges when
        # inter-frame motion stays within the loss basin (~2-3 px for
        # sharp content): 0.012 is ~1.4 px/frame at 160px width but ~9 px
        # at 1200px — full-res validation configs must pass a smaller step
        # (data.synthetic_traj_step) to emulate Replica-like motion.
        self.poses = make_trajectory(num_frames, step=traj_step)
        self.num_imgs = num_frames
        self.png_depth_scale = 6553.5
        self._cache = {}

    def __len__(self):
        return self.num_imgs

    def get_cam_K(self):
        K = np.eye(3, dtype=np.float32)
        K[0, 0], K[1, 1] = self.cam.fx, self.cam.fy
        K[0, 2], K[1, 2] = self.cam.cx, self.cam.cy
        return K

    @functools.cached_property
    def _render(self):
        n = self.pts.shape[0]
        cfg = RasterConfig(max_per_tile=min(n, 512), tile_chunk=64)
        alive = jnp.ones(n, bool)
        margs = (jnp.asarray(self.pts), jnp.asarray(self.quats),
                 jnp.asarray(self.log_scales), jnp.asarray(self.logit_op),
                 jnp.asarray(self.cols))

        @jax.jit
        def go(quat, trans):
            from ..utils.transforms import transform_to_frame
            mc, qc = transform_to_frame(margs[0], margs[1], quat, trans,
                                        gaussians_grad=False,
                                        camera_grad=False)
            im, depth, sil, _, _ = render_rgbd_sil(
                mc, qc, margs[2], margs[3], margs[4], alive, self.cam, cfg)
            return im, depth, sil
        return go

    def __getitem__(self, index: int):
        if index not in self._cache:
            c2w = self.poses[index]
            w2c = np.linalg.inv(c2w)
            quat = np.asarray(rotmat_to_quat(jnp.asarray(w2c[:3, :3])))
            trans = w2c[:3, 3]
            im, depth, sil = self._render(jnp.asarray(quat, jnp.float32),
                                          jnp.asarray(trans, jnp.float32))
            im = np.clip(np.asarray(im), 0, 1)
            depth = np.asarray(depth[0])
            sil = np.asarray(sil)
            depth = np.where(sil > 0.9, depth, 0.0)
            color = (im.transpose(1, 2, 0) * 255.0).astype(np.float32)
            intr = np.eye(4, dtype=np.float32)
            intr[:3, :3] = self.get_cam_K()
            self._cache[index] = (color, depth[:, :, None].astype(np.float32),
                                  intr, c2w.astype(np.float32))
        return self._cache[index]
