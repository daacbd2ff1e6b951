"""Pinhole camera + static rasterizer geometry.

The reference wraps camera state in CUDA `GaussianRasterizationSettings`
(`python_ordinary/utils/recon_helpers.py:4-27`). On TPU everything under jit
must have static shapes, so the camera is a small frozen dataclass of Python
scalars that parameterizes the jitted render; only the intrinsics enter the
compute as constants.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np


TILE = 16  # rasterizer tile edge in pixels (matches the CUDA BLOCK_X/Y)


@dataclasses.dataclass(frozen=True)
class Camera:
    """Static pinhole camera for rasterization.

    fx, fy, cx, cy follow OpenCV convention; width/height are the image size.
    The CUDA path goes through an OpenGL projection matrix
    (recon_helpers.py:9-13); algebraically that reduces to
    u = fx*x/z + cx - 0.5, v = fy*y/z + cy - 0.5, which is what we use.
    """

    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    near: float = 0.01
    far: float = 100.0

    @property
    def tiles_x(self) -> int:
        return (self.width + TILE - 1) // TILE

    @property
    def tiles_y(self) -> int:
        return (self.height + TILE - 1) // TILE

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def tanfovx(self) -> float:
        return self.width / (2.0 * self.fx)

    @property
    def tanfovy(self) -> float:
        return self.height / (2.0 * self.fy)

    @staticmethod
    def from_intrinsics(K, width: int, height: int, near: float = 0.01,
                        far: float = 100.0) -> "Camera":
        K = np.asarray(K)
        return Camera(width=int(width), height=int(height),
                      fx=float(K[0, 0]), fy=float(K[1, 1]),
                      cx=float(K[0, 2]), cy=float(K[1, 2]),
                      near=near, far=far)

    def intrinsics_matrix(self) -> np.ndarray:
        K = np.eye(3, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = self.fx, self.fy, self.cx, self.cy
        return K

    def scaled(self, width: int, height: int) -> "Camera":
        """Rescale intrinsics to a new resolution (dataset-layer semantics)."""
        sx = width / self.width
        sy = height / self.height
        return Camera(width=width, height=height,
                      fx=self.fx * sx, fy=self.fy * sy,
                      cx=self.cx * sx, cy=self.cy * sy,
                      near=self.near, far=self.far)


def setup_camera(w: int, h: int, k, w2c=None, near: float = 0.01,
                 far: float = 100.0) -> Camera:
    """API-compatible analog of the reference `setup_camera`.

    The reference bakes w2c into the raster settings; in the SLAM loop that
    matrix is always the first-frame w2c == identity (poses are normalized
    relative to frame 0), and the per-iteration pose is applied by
    transform_to_frame before rendering. We keep the same contract: `w2c`
    is accepted for signature parity but the renderer consumes camera-frame
    Gaussians.
    """
    k = np.asarray(k)
    return Camera(width=int(w), height=int(h), fx=float(k[0][0]),
                  fy=float(k[1][1]), cx=float(k[0][2]), cy=float(k[1][2]),
                  near=near, far=far)
