"""Keyframe library + overlap-based selection.

Selection mirrors `keyframe_selection_overlap`
(utils/keyframe_selection.py:40-96): sample 1600 valid-depth pixels of the
current frame, back-project, re-project into each candidate keyframe, rank by
fraction inside the frustum (20 px margin), drop zero-overlap frames, then
random-permute and take k. The ranking math is vectorized numpy on host —
it is O(1600 * n_keyframes) and feeds host-side control flow (which frames
to gather), so it does not belong in the jitted graph.

The keyframe image library itself is device-resident with static capacity:
uint8 color + f32 depth, written once per keyframe via dynamic_update_slice
(scatter), so mapping phases never re-upload frames.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import Camera


class KeyframeLibrary:
    """Fixed-capacity device-side keyframe store.

    Slot layout: [0, max_keyframes) hold keyframes in insertion order;
    slot `max_keyframes` is scratch for the current frame (the reference's
    `selected_rand_keyframe_idx == -1` branch, splatam.py:1417-1421).
    """

    def __init__(self, max_keyframes: int, height: int, width: int):
        self.max_keyframes = max_keyframes
        s = max_keyframes + 1
        self.colors = jnp.zeros((s, height, width, 3), jnp.uint8)
        self.depths = jnp.zeros((s, height, width), jnp.float32)
        self.quats = jnp.zeros((s, 4), jnp.float32)
        self.trans = jnp.zeros((s, 3), jnp.float32)
        self.time_indices: list[int] = []   # host-side ids
        self.w2cs: list[np.ndarray] = []    # host copies for selection

    def __len__(self):
        return len(self.time_indices)

    @property
    def current_slot(self) -> int:
        return self.max_keyframes

    def _write(self, slot, color_chw, depth_1hw, quat, trans):
        color_u8 = jnp.clip(jnp.round(color_chw.transpose(1, 2, 0) * 255.0),
                            0, 255).astype(jnp.uint8)
        self.colors = self.colors.at[slot].set(color_u8)
        self.depths = self.depths.at[slot].set(depth_1hw[0])
        self.quats = self.quats.at[slot].set(quat)
        self.trans = self.trans.at[slot].set(trans)

    def add_keyframe(self, time_idx: int, color_chw, depth_1hw, quat, trans,
                     w2c: np.ndarray):
        assert len(self.time_indices) < self.max_keyframes, "keyframe overflow"
        slot = len(self.time_indices)
        self._write(slot, color_chw, depth_1hw, quat, trans)
        self.time_indices.append(time_idx)
        self.w2cs.append(np.asarray(w2c))

    def set_current(self, color_chw, depth_1hw, quat, trans):
        self._write(self.current_slot, color_chw, depth_1hw, quat, trans)

    def update_pose(self, slot: int, quat, trans, w2c: np.ndarray):
        self.quats = self.quats.at[slot].set(quat)
        self.trans = self.trans.at[slot].set(trans)
        self.w2cs[slot] = np.asarray(w2c)


def backproject_sampled(depth_hw: np.ndarray, K: np.ndarray,
                        w2c: np.ndarray, sampled: np.ndarray) -> np.ndarray:
    """Back-project sampled (row, col) pixels to world points; drops
    points collapsing to the camera origin (keyframe_selection.py:10-37)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = depth_hw[sampled[:, 0], sampled[:, 1]]
    xx = (sampled[:, 1] - cx) / fx
    yy = (sampled[:, 0] - cy) / fy
    pts_cam = np.stack([xx * z, yy * z, z], axis=-1)
    c2w = np.linalg.inv(w2c)
    pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    # remove points at origin (duplicate-of-zero test in the reference)
    keep = ~np.all(np.abs(np.round(pts, 4)) == 0.0, axis=1)
    return pts[keep]


def keyframe_selection_overlap(gt_depth_hw: np.ndarray, w2c: np.ndarray,
                               K: np.ndarray, keyframe_w2cs: list,
                               k: int, rng: np.random.RandomState,
                               width: int, height: int,
                               pixels: int = 1600) -> list:
    """Returns indices into keyframe_w2cs of up to k overlapping keyframes."""
    valid = np.argwhere(gt_depth_hw > 0)
    if valid.shape[0] == 0 or len(keyframe_w2cs) == 0:
        return []
    sel = rng.randint(valid.shape[0], size=(pixels,))
    sampled = valid[sel]
    pts = backproject_sampled(gt_depth_hw, K, w2c, sampled)
    if pts.shape[0] == 0:
        return []
    pts4 = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)

    percent_inside = []
    for est_w2c in keyframe_w2cs:
        tp = (np.asarray(est_w2c) @ pts4.T).T[:, :3]
        p2 = (K @ tp.T).T
        zc = p2[:, 2:] + 1e-5
        uv = p2[:, :2] / zc
        edge = 20
        mask = ((uv[:, 0] < width - edge) & (uv[:, 0] > edge)
                & (uv[:, 1] < height - edge) & (uv[:, 1] > edge)
                & (zc[:, 0] > 0))
        percent_inside.append(mask.mean())

    order = sorted(range(len(keyframe_w2cs)),
                   key=lambda i: percent_inside[i], reverse=True)
    selected = [i for i in order if percent_inside[i] > 0.0]
    return list(rng.permutation(np.array(selected, dtype=np.int64))[:k])
