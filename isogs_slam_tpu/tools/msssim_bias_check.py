"""Quantify the pre-fix TPU MS-SSIM bias on a real run artifact.

Renders eval frames from a SLAM checkpoint at the estimated poses and
computes MS-SSIM two ways on the SAME image pair:
  - fixed:  ops/ssim.py::ms_ssim (f32 inputs, Precision.HIGHEST)
  - legacy: the pre-fix variant (input dtype kept, DEFAULT matmul
    precision — on TPU the f32 operands truncate to bf16)
The delta is the exact inflation every pre-fix TPU eval artifact
carried (NOTES.md r5s6).

    python -m isogs_slam_tpu.tools.msssim_bias_check \
        --config isogs_slam_tpu/configs/synthetic/ablations/full_res_fastlegal8.py \
        --run experiments/Synthetic/abl_r5s6_fs8_100 --frames 10
"""
from __future__ import annotations

import argparse
import functools
import json

import numpy as np
import jax
import jax.numpy as jnp

from ..io import checkpoints as ckpt_io
from ..ops import ssim as ssim_mod
from ..slam.config import load_experiment_config


def legacy_ms_ssim(img1, img2, window_size: int = 11):
    """The pre-fix metric: input dtype preserved, DEFAULT precision."""
    w = jnp.asarray(ssim_mod._gaussian_window(window_size), img1.dtype)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smaller = min(img1.shape[-2], img1.shape[-1])
    n_scales = 1
    while (n_scales < len(ssim_mod._MSSSIM_WEIGHTS)
           and smaller // (2 ** n_scales) >= window_size):
        n_scales += 1

    def one_scale(a, b):
        stack = jnp.stack([a, b, a * a, b * b, a * b])
        f = ssim_mod._depthwise_filter(stack, w, [(0, 0), (0, 0)],
                                       precision=None)
        mu1, mu2 = f[0], f[1]
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1, s2, s12 = f[2] - mu1_sq, f[3] - mu2_sq, f[4] - mu12
        cs = ((2 * s12 + c2) / (s1 + s2 + c2)).mean()
        v = (((2 * mu12 + c1) * (2 * s12 + c2))
             / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))).mean()
        return v, cs

    def pool2(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID") / 4.0

    vals, a, b = [], img1, img2
    for i in range(n_scales):
        v, cs = one_scale(a, b)
        vals.append(v if i == n_scales - 1 else cs)
        if i < n_scales - 1:
            a, b = pool2(a), pool2(b)
    vals = jnp.stack([jax.nn.relu(v) for v in vals])
    weights = jnp.asarray(ssim_mod._MSSSIM_WEIGHTS[:n_scales], img1.dtype)
    return jnp.prod(vals ** (weights / jnp.sum(weights)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--run", required=True)
    p.add_argument("--frames", type=int, default=10)
    args = p.parse_args(argv)

    config = load_experiment_config(args.config)
    dc = config["data"]
    from ..core.camera import Camera
    from ..eval.eval_helpers import _render_fn
    from ..ops.rasterize import RasterConfig
    from ..slam.pipeline import _dataset_from_config
    from ..core import gaussians as G

    dataset = _dataset_from_config(config, dc["desired_image_height"],
                                   dc["desired_image_width"])
    frame, path = ckpt_io.latest_checkpoint(args.run)
    print(f"[bias-check] checkpoint {path} (frame {frame})")
    data = ckpt_io.load_checkpoint(path)
    n = data["means3D"].shape[0]
    st = G.empty_state(G.round_capacity(int(n * 1.05), 65536))
    st = G.append_rows(st, G.GaussianParams(
        means3d=jnp.asarray(data["means3D"]),
        rgb_colors=jnp.asarray(data["rgb_colors"]),
        unnorm_rotations=jnp.asarray(data["unnorm_rotations"]),
        logit_opacities=jnp.asarray(data["logit_opacities"]),
        log_scales=jnp.asarray(data["log_scales"])),
        jnp.ones(n, bool), 0)

    _, d0, intr0, _ = dataset[0]
    cam = Camera.from_intrinsics(np.asarray(intr0)[:3, :3],
                                 dc["desired_image_width"],
                                 dc["desired_image_height"])
    r = config.get("raster", {})
    rcfg = RasterConfig(max_per_tile=r.get("max_per_tile", 512),
                        isect_per_gaussian=r.get("isect_per_gaussian", 2.5),
                        tile_chunk=r.get("tile_chunk", 256))
    fn = _render_fn(cam, rcfg)
    jfix = jax.jit(ssim_mod.ms_ssim)
    jold = jax.jit(legacy_ms_ssim)

    rots = np.asarray(data["cam_unnorm_rots"])[0]
    trans = np.asarray(data["cam_trans"])[0]
    T = min(frame + 1, rots.shape[1])
    idxs = np.linspace(0, T - 1, args.frames).astype(int)
    rows = []
    for t in idxs:
        color, depth, _, _ = dataset[int(t)]
        gt_im = np.asarray(color, np.float32).transpose(2, 0, 1) / 255.0
        gt_depth = np.asarray(depth, np.float32).transpose(2, 0, 1)
        q = rots[:, t] / np.linalg.norm(rots[:, t])
        im, _, _ = fn(st.params, st.alive, jnp.asarray(q, jnp.float32),
                      jnp.asarray(trans[:, t], jnp.float32))
        w = (gt_depth > 0)
        wim = jnp.asarray(np.asarray(im) * w)
        wgt = jnp.asarray(gt_im * w)
        vf, vo = float(jfix(wim, wgt)), float(jold(wim, wgt))
        rows.append((int(t), vf, vo))
        print(f"frame {t:3d}: fixed {vf:.4f}  legacy {vo:.4f}  "
              f"delta {vo - vf:+.4f}")
    vf = np.array([r[1] for r in rows])
    vo = np.array([r[2] for r in rows])
    out = {"frames": [r[0] for r in rows],
           "fixed_mean": float(vf.mean()), "legacy_mean": float(vo.mean()),
           "bias_mean": float((vo - vf).mean()),
           "bias_max": float((vo - vf).max()),
           "legacy_above_1": int((vo > 1.0).sum())}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
