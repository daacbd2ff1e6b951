"""Shared visualization helpers — checkpoint loading, offscreen rendering,
depth colormaps, trajectory figures.

The reference viz (viz_scripts/final_recon.py, online_recon.py) drives an
interactive Open3D window; Open3D is not available in this environment, so
these tools render offscreen through the framework's own rasterizer and
write PNG frames / MP4s / trajectory plots instead. When Open3D *is*
importable the interactive path is used (parity with the reference UX).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core import gaussians as G
from ..core.camera import Camera
from ..io.checkpoints import latest_checkpoint, load_checkpoint
from ..ops.rasterize import RasterConfig, render_rgbd_sil
from ..utils.transforms import rotmat_to_quat, transform_to_frame


def have_open3d() -> bool:
    try:
        import open3d  # noqa: F401
        return True
    except Exception:
        return False


def load_scene(result_dir: str, checkpoint: str | None = None,
               return_sh: bool = False):
    """Checkpoint -> (MapState, cam Camera, est_w2cs [T,4,4], gt_w2cs,
    path[, sh_flat]). With return_sh=True a 6th element is appended: the
    capacity-padded [cap, 48] deg-3 SH coefficients when the checkpoint
    carries a `sh_coeffs_flat` with nonzero higher bands (external 3DGS
    checkpoints; the C++ renderer path, renderer.cpp:130-145), else
    None (SLAM checkpoints store raw RGB; their SH0 export roundtrips to
    the same colors)."""
    if checkpoint:
        path = (checkpoint if os.path.isabs(checkpoint)
                else os.path.join(result_dir, checkpoint))
    else:
        final = os.path.join(result_dir, "params.npz")
        if os.path.exists(final):
            path = final
        else:
            _, path = latest_checkpoint(result_dir)
    if path is None or not os.path.exists(path):
        raise FileNotFoundError(f"no checkpoint under {result_dir}")
    data = load_checkpoint(path)

    n = data["means3D"].shape[0]
    st = G.empty_state(G.round_capacity(n, 4096))
    rows = G.GaussianParams(
        means3d=jnp.asarray(data["means3D"]),
        rgb_colors=jnp.asarray(data["rgb_colors"]),
        unnorm_rotations=jnp.asarray(data["unnorm_rotations"]),
        logit_opacities=jnp.asarray(data["logit_opacities"]),
        log_scales=jnp.asarray(data["log_scales"]))
    st = G.append_rows(st, rows, jnp.ones(n, bool), 0)

    K = np.asarray(data["intrinsics"])[:3, :3]
    W = int(data["org_width"])
    H = int(data["org_height"])
    cam = Camera.from_intrinsics(K, W, H)

    rots = np.asarray(data["cam_unnorm_rots"])[0]       # [4,T]
    trans = np.asarray(data["cam_trans"])[0]            # [3,T]
    est = []
    from ..utils.transforms import pose_to_w2c
    for t in range(rots.shape[1]):
        q = rots[:, t]
        nq = np.linalg.norm(q)
        if nq == 0:
            est.append(np.eye(4))
            continue
        est.append(np.asarray(pose_to_w2c(jnp.asarray(q / nq),
                                          jnp.asarray(trans[:, t]))))
    gt = data.get("gt_w2c_all_frames")
    out = (st, cam, np.stack(est), (np.asarray(gt) if gt is not None
                                    else None), path)
    if return_sh:
        sh = data.get("sh_coeffs_flat")
        if sh is not None and np.abs(np.asarray(sh)[:, 3:]).max() > 0:
            pad = st.params.means3d.shape[0] - sh.shape[0]
            sh_pad = jnp.asarray(np.pad(np.asarray(sh, np.float32),
                                        ((0, pad), (0, 0))))
            out = out + (sh_pad,)
        else:
            out = out + (None,)
    return out


def make_render_fn(cam: Camera, rcfg: RasterConfig):
    @jax.jit
    def go(params, alive, quat, tr):
        mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                    quat, tr, gaussians_grad=False,
                                    camera_grad=False)
        im, depth, sil, _, _ = render_rgbd_sil(
            mc, qc, params.log_scales, params.logit_opacities,
            params.rgb_colors, alive, cam, rcfg)
        return im, depth, sil
    return go


def render_w2c(fn, state, w2c: np.ndarray, sh_flat=None, sh_deg: int = 3):
    """Render one pose. sh_flat [cap, 48] (from load_scene return_sh):
    view-dependent deg-`sh_deg` SH colors are evaluated per Gaussian for
    this pose (an [N]-elementwise pre-pass) and substituted for the
    stored rgb — the C++ renderer's SH path (renderer.cpp:130-145)."""
    q = np.asarray(rotmat_to_quat(jnp.asarray(w2c[:3, :3], jnp.float32)))
    q = q / np.linalg.norm(q)
    params = state.params
    if sh_flat is not None:
        from ..ops.sh import sh_colors_for_pose
        center = jnp.asarray(-w2c[:3, :3].T @ w2c[:3, 3], jnp.float32)
        params = params._replace(rgb_colors=sh_colors_for_pose(
            sh_flat, params.means3d, center, sh_deg))
    return fn(params, state.alive, jnp.asarray(q, jnp.float32),
              jnp.asarray(w2c[:3, 3], jnp.float32))


def colorize_depth(depth: np.ndarray, d_min=None, d_max=None) -> np.ndarray:
    """[H,W] -> [H,W,3] uint8 turbo-ish colormap via matplotlib."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.cm as cm
    d = np.asarray(depth, np.float64)
    d_min = d_min if d_min is not None else np.percentile(d[d > 0], 2) \
        if (d > 0).any() else 0.0
    d_max = d_max if d_max is not None else np.percentile(d[d > 0], 98) \
        if (d > 0).any() else 1.0
    norm = np.clip((d - d_min) / max(d_max - d_min, 1e-9), 0, 1)
    rgba = cm.get_cmap("turbo")(norm)
    out = (rgba[..., :3] * 255).astype(np.uint8)
    out[d <= 0] = 0
    return out


def frame_to_uint8(im) -> np.ndarray:
    return (np.clip(np.asarray(im), 0, 1).transpose(1, 2, 0)
            * 255).astype(np.uint8)


def save_video_or_frames(frames: list, out_base: str, fps: int = 10):
    """Try mp4 via imageio-ffmpeg, fall back to a PNG directory."""
    import imageio.v2 as imageio
    try:
        imageio.mimsave(out_base + ".mp4", frames, fps=fps)
        print(f"[viz] wrote {out_base}.mp4 ({len(frames)} frames)")
        return out_base + ".mp4"
    except Exception:
        os.makedirs(out_base, exist_ok=True)
        for i, f in enumerate(frames):
            imageio.imwrite(os.path.join(out_base, f"{i:05d}.png"), f)
        print(f"[viz] ffmpeg unavailable; wrote {len(frames)} PNGs to "
              f"{out_base}/")
        return out_base


def plot_trajectory(est_w2cs, gt_w2cs, out_path: str,
                    keyframe_indices=None):
    """3D trajectory figure with camera positions (matplotlib) — the
    offscreen stand-in for the Open3D frustum/lineset view
    (viz_scripts/final_recon.py:234-409)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    cams = np.stack([np.linalg.inv(w)[:3, 3] for w in est_w2cs])
    ax.plot(cams[:, 0], cams[:, 1], cams[:, 2], "b-", label="estimated",
            linewidth=1.5)
    if gt_w2cs is not None:
        ok = [w for w in gt_w2cs if np.isfinite(w).all()]
        if ok:
            g = np.stack([np.linalg.inv(w)[:3, 3] for w in ok])
            ax.plot(g[:, 0], g[:, 1], g[:, 2], "g--", label="ground truth",
                    linewidth=1.0)
    if keyframe_indices is not None and len(keyframe_indices):
        kf = cams[np.asarray(keyframe_indices, int)]
        ax.scatter(kf[:, 0], kf[:, 1], kf[:, 2], c="r", s=12,
                   label="keyframes")
    ax.set_title("Camera trajectory")
    ax.legend()
    plt.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    print(f"[viz] wrote {out_path}")
