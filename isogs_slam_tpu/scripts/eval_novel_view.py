"""Novel-view-synthesis evaluation from a checkpoint — render the
train/test split at GT poses and report PSNR / MS-SSIM / LPIPS / depth
metrics (reference `scripts/eval_novel_view.py:58-295` +
eval_helpers.eval_nvs :693-907).

    python -m isogs_slam_tpu.scripts.eval_novel_view <config.py> \
        [--checkpoint params800.npz]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax.numpy as jnp

from ..core import gaussians as G
from ..core.camera import Camera
from ..eval.eval_helpers import _render_fn
from ..eval.metrics import lpips, psnr
from ..io import checkpoints as ckpt_io
from ..ops.rasterize import RasterConfig
from ..ops.ssim import ms_ssim
from ..slam.config import load_experiment_config
from ..slam.pipeline import _dataset_from_config
from ..utils.transforms import rotmat_to_quat

import jax


def eval_nvs(dataset, state, cam: Camera, rcfg: RasterConfig,
             eval_dir: str, num_frames: int | None = None,
             skip_first: bool = True) -> dict:
    """Render every dataset frame at its (GT) pose and compute NVS metrics.
    With a use_train_split=False dataset the first frame is the anchoring
    train frame and is skipped (eval_helpers.py eval_nvs semantics)."""
    os.makedirs(eval_dir, exist_ok=True)
    if num_frames is None:
        num_frames = len(dataset)
    render = _render_fn(cam, rcfg)
    jit_ms = jax.jit(ms_ssim)

    psnrs, ssims, lpipss, rmses, l1s = [], [], [], [], []
    start = 1 if skip_first else 0
    for t in range(start, num_frames):
        color, depth, _, pose = dataset[t]
        w2c = np.linalg.inv(np.asarray(pose, np.float64))
        q = np.asarray(rotmat_to_quat(jnp.asarray(w2c[:3, :3],
                                                  jnp.float32)))
        im, rdepth, sil = render(state.params, state.alive,
                                 jnp.asarray(q, jnp.float32),
                                 jnp.asarray(w2c[:3, 3], jnp.float32))
        im = np.asarray(im)
        rdepth = np.asarray(rdepth)
        gt_im = np.asarray(color, np.float32).transpose(2, 0, 1) / 255.0
        gt_depth = np.asarray(depth, np.float32).transpose(2, 0, 1)
        valid = gt_depth > 0
        wim, wgt = im * valid, gt_im * valid
        psnrs.append(psnr(wim, wgt))
        ssims.append(float(jit_ms(jnp.asarray(wim), jnp.asarray(wgt))))
        lpipss.append(lpips(np.clip(wim, 0, 1), np.clip(wgt, 0, 1)))
        diff = (rdepth - gt_depth) * valid
        denom = max(valid.sum(), 1)
        rmses.append(float(np.sqrt(diff ** 2).sum() / denom))
        l1s.append(float(np.abs(diff).sum() / denom))

    results = {
        "Average NVS PSNR": float(np.mean(psnrs)),
        "Average NVS MS-SSIM": float(np.mean(ssims)),
        "Average NVS LPIPS": float(np.mean(lpipss)),
        "Average NVS Depth RMSE (cm)": float(np.mean(rmses) * 100),
        "Average NVS Depth L1 (cm)": float(np.mean(l1s) * 100),
        "Frames": len(psnrs),
    }
    from ..eval.metrics import lpips_variant
    results["LPIPS Variant"] = lpips_variant()
    for name, vals in (("nvs_psnr", psnrs), ("nvs_ssim", ssims),
                       ("nvs_lpips", lpipss), ("nvs_l1", l1s)):
        np.savetxt(os.path.join(eval_dir, f"{name}.txt"), np.asarray(vals))
    with open(os.path.join(eval_dir, "nvs_eval_summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    for k, v in results.items():
        print(f"{k}: {v}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", type=str)
    p.add_argument("--checkpoint", type=str, default=None)
    args = p.parse_args(argv)
    config = load_experiment_config(args.config)
    result_dir = os.path.join(config["workdir"], config["run_name"])

    if args.checkpoint:
        path = (args.checkpoint if os.path.isabs(args.checkpoint)
                else os.path.join(result_dir, args.checkpoint))
    else:
        final = os.path.join(result_dir, "params.npz")
        if os.path.exists(final):
            path = final
        else:
            _, path = ckpt_io.latest_checkpoint(result_dir)
    if path is None or not os.path.exists(path):
        raise FileNotFoundError(f"No checkpoint in {result_dir}")
    print(f"Loading checkpoint: {path}")
    data = ckpt_io.load_checkpoint(path)

    n = data["means3D"].shape[0]
    st = G.empty_state(G.round_capacity(n, 4096))
    rows = G.GaussianParams(
        means3d=jnp.asarray(data["means3D"]),
        rgb_colors=jnp.asarray(data["rgb_colors"]),
        unnorm_rotations=jnp.asarray(data["unnorm_rotations"]),
        logit_opacities=jnp.asarray(data["logit_opacities"]),
        log_scales=jnp.asarray(data["log_scales"]))
    st = G.append_rows(st, rows, jnp.ones(n, bool), 0)

    dc = config["data"]
    # novel-view split (use_train_split=False -> first frame = train anchor)
    config = dict(config)
    config["data"] = dict(dc)
    config["data"]["use_train_split"] = dc.get("use_train_split", False)
    dataset = _dataset_from_config(config, dc["desired_image_height"],
                                   dc["desired_image_width"])
    c0, _, intr0, _ = dataset[0]
    cam = Camera.from_intrinsics(np.asarray(intr0)[:3, :3],
                                 c0.shape[1], c0.shape[0])
    r = config.get("raster", {})
    rcfg = RasterConfig(max_per_tile=r.get("max_per_tile", 512),
                        isect_per_gaussian=r.get("isect_per_gaussian", 2.5),
                        tile_chunk=r.get("tile_chunk", 256))
    eval_dir = os.path.join(result_dir, "eval_nvs")
    return eval_nvs(dataset, st, cam, rcfg, eval_dir,
                    skip_first=not config["data"]["use_train_split"])


if __name__ == "__main__":
    main()
