"""Viz smoke: the offscreen render path (viz_scripts/common.py) from a toy
on-disk checkpoint — load_scene -> make_render_fn -> render_w2c for two
poses, plus the frame/depth converters, trajectory plot, and the
video-or-PNG writer (reference render path viz_scripts/final_recon.py:
169-231). Pure CPU + Agg; the interactive Open3D viewer is gated by
have_open3d() and absent in CI."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.io.checkpoints import save_checkpoint
from isogs_slam_tpu.ops.rasterize import RasterConfig
from isogs_slam_tpu.viz_scripts.common import (colorize_depth,
                                               frame_to_uint8, load_scene,
                                               make_render_fn,
                                               plot_trajectory, render_w2c,
                                               save_video_or_frames)

H, W = 64, 80


def _toy_checkpoint(out_dir):
    rng = np.random.default_rng(0)
    n = 400
    means = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    means[:, 2] += 2.5
    gauss = {
        "means3D": means,
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": np.tile(np.array([1, 0, 0, 0], np.float32),
                                    (n, 1)),
        "logit_opacities": np.full((n, 1), 2.0, np.float32),
        "log_scales": np.full((n, 3), np.log(0.08), np.float32),
    }
    T = 3
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                 np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32)[:, None], (1, T))
    trans = np.stack([np.zeros(T), np.zeros(T),
                      np.linspace(0, 0.1, T)]).astype(np.float32)
    gts = []
    for t in range(T):
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = 0.1 * t
        gts.append(w2c)
    save_checkpoint(out_dir, T - 1, gauss, quats[None], trans[None],
                    np.zeros(n), K, np.eye(4, dtype=np.float32), W, H,
                    gts, [0])
    return os.path.join(out_dir, f"params{T - 1}.npz")


@pytest.mark.smoke
def test_offscreen_render_from_checkpoint(tmp_path):
    run_dir = str(tmp_path / "run")
    _toy_checkpoint(run_dir)
    state, cam, est_w2cs, gt_w2cs, path = load_scene(run_dir)
    assert cam.width == W and cam.height == H
    assert est_w2cs.shape[0] == 3 and gt_w2cs.shape == (3, 4, 4)

    fn = make_render_fn(cam, RasterConfig(max_per_tile=64, tile_chunk=16))
    frames = []
    for w2c in est_w2cs[:2]:
        im, depth, sil = render_w2c(fn, state, w2c)
        im, depth, sil = map(np.asarray, (im, depth, sil))
        assert im.shape == (3, H, W)
        assert depth.shape == (1, H, W)
        assert sil.shape == (H, W)
        assert np.isfinite(im).all() and np.isfinite(depth).all()
        assert im.max() > 0.01, "rendered frame is black"
        frames.append(frame_to_uint8(im))
    assert frames[0].shape == (H, W, 3) and frames[0].dtype == np.uint8

    dvis = colorize_depth(np.asarray(depth)[0])
    assert dvis.shape == (H, W, 3) and dvis.dtype == np.uint8

    out = save_video_or_frames(frames, str(tmp_path / "replay"), fps=5)
    assert os.path.exists(out)

    plot_path = str(tmp_path / "traj.png")
    plot_trajectory(est_w2cs, gt_w2cs, plot_path, keyframe_indices=[0])
    assert os.path.exists(plot_path)


@pytest.mark.smoke
def test_final_recon_cli_offscreen(tmp_path, monkeypatch):
    """The final_recon CLI replay path end-to-end (offscreen, --every 2,
    tiny orbit) against the toy checkpoint, via a minimal config file."""
    run_dir = str(tmp_path / "Synthetic" / "toy_0")
    _toy_checkpoint(run_dir)
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "config = {'workdir': %r, 'run_name': 'toy_0',\n"
        "          'viz': {'render_mode': 'color'}}\n"
        % str(tmp_path / "Synthetic"))
    from isogs_slam_tpu.viz_scripts import final_recon
    rc = final_recon.main([str(cfg), "--every", "2", "--downscale", "1",
                           "--orbit-frames", "3"])
    assert rc in (0, None)
    viz_dir = os.path.join(run_dir, "viz")
    assert os.path.isdir(viz_dir)
    assert any(f.startswith("replay") for f in os.listdir(viz_dir))
