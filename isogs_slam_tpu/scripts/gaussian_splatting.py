"""Offline 3D-Gaussian-Splatting trainer — GT-pose multi-view training with
silhouette-driven initialization and gradient-driven densification.

CLI mirrors the reference `scripts/gaussian_splatting.py` (offline_splatting,
:318-592):

    python -m isogs_slam_tpu.scripts.gaussian_splatting \
        configs/replica/gaussian_splatting.py

Phase 1 walks the scan once with GT poses densifying from the silhouette;
phase 2 optimizes the full map for train.num_iters_mapping iterations with
random-frame sampling, exponential means3D lr decay, and clone/split
densification — all as chunked jitted scans (slam/offline.py).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core import gaussians as G, optim
from ..core.camera import Camera
from ..io import checkpoints as ckpt_io
from ..ops.rasterize import RasterConfig
from ..slam.config import (copy_config_for_provenance,
                           load_experiment_config)
from ..slam.densify import DensifyConfig
from ..slam.offline import OfflineConfig, expon_lr, offline_chunk
from ..slam.pipeline import _dataset_from_config, _to_chw_frame
from ..slam.pointcloud import add_new_gaussians, initialize_first_frame
from ..utils.common import enable_compilation_cache, seed_everything
from ..utils.transforms import rotmat_to_quat


class OfflineGS:
    """Runner; also duck-types the attributes eval_sequence needs."""

    def __init__(self, config: dict):
        self.config = config
        tr = config["train"]
        dc = config["data"]
        self.output_dir = os.path.join(config["workdir"],
                                       config["run_name"])
        self.eval_dir = os.path.join(self.output_dir, "eval")
        os.makedirs(self.eval_dir, exist_ok=True)

        init_h = dc.get("desired_image_height_init",
                        dc["desired_image_height"])
        init_w = dc.get("desired_image_width_init",
                        dc["desired_image_width"])
        self.init_dataset = _dataset_from_config(config, init_h, init_w)
        self.dataset = _dataset_from_config(
            config, dc["desired_image_height"], dc["desired_image_width"])
        self.num_frames = dc.get("num_frames", -1)
        if self.num_frames == -1:
            self.num_frames = len(self.dataset)

        c0, d0, intr0, p0 = self.dataset[0]
        self.intrinsics = np.asarray(intr0)[:3, :3]
        self.cam = Camera.from_intrinsics(self.intrinsics, c0.shape[1],
                                          c0.shape[0])
        ci, di, intri, _ = self.init_dataset[0]
        self.init_cam = Camera.from_intrinsics(
            np.asarray(intri)[:3, :3], ci.shape[1], ci.shape[0])
        self.first_frame_w2c = np.linalg.inv(np.asarray(p0, np.float64))

        r = config.get("raster", {})
        self.rcfg = RasterConfig(
            max_per_tile=r.get("max_per_tile", 512),
            isect_per_gaussian=r.get("isect_per_gaussian", 2.5),
            tile_chunk=r.get("tile_chunk", 256))

        dd = tr.get("densify_dict", {})
        lrs = tr["lrs_mapping"]
        self.ocfg = OfflineConfig(
            num_iters=tr["num_iters_mapping"],
            lr_means3d=lrs["means3D"], lr_rgb_colors=lrs["rgb_colors"],
            lr_unnorm_rotations=lrs["unnorm_rotations"],
            lr_logit_opacities=lrs["logit_opacities"],
            lr_log_scales=lrs["log_scales"],
            lr_means3d_final=tr.get("lrs_mapping_means3D_final", 3.2e-6),
            lr_delay_mult=tr.get("lr_delay_mult", 0.01),
            w_im=tr["loss_weights"].get("im", 1.0),
            w_depth=tr["loss_weights"].get("depth", 1.0),
            use_densification=tr.get(
                "use_gaussian_splatting_densification", True),
            densify=DensifyConfig(
                start_after=dd.get("start_after", 500),
                remove_big_after=dd.get("remove_big_after", 3000),
                stop_after=dd.get("stop_after", 5000),
                densify_every=dd.get("densify_every", 100),
                grad_thresh=dd.get("grad_thresh", 0.0002),
                num_to_split_into=dd.get("num_to_split_into", 2),
                removal_opacity_threshold=dd.get(
                    "removal_opacity_threshold", 0.005),
                final_removal_opacity_threshold=dd.get(
                    "final_removal_opacity_threshold", 0.005),
                reset_opacities_every=dd.get("reset_opacities_every", 3000),
                reset_opacities=True),
            chunk_iters=tr.get("chunk_iters", 100),
            frames_per_chunk=tr.get("frames_per_chunk", 16))
        self.sil_thres = tr.get("sil_thres", 0.5)
        self.key = jax.random.PRNGKey(config.get("seed", 0))
        self.rng = np.random.default_rng(config.get("seed", 0))

        # gt poses as (quat, trans) per frame
        self.cam_rots = np.zeros((4, self.num_frames), np.float32)
        self.cam_trans = np.zeros((3, self.num_frames), np.float32)
        self.gt_w2c_all = []
        for t in range(self.num_frames):
            _, _, _, pose = self.dataset[t]
            w2c = np.linalg.inv(np.asarray(pose, np.float64))
            self.gt_w2c_all.append(w2c)
            self.cam_rots[:, t] = np.asarray(
                rotmat_to_quat(jnp.asarray(w2c[:3, :3], jnp.float32)))
            self.cam_trans[:, t] = w2c[:3, 3]

        self.state: G.MapState | None = None

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # phase 1: silhouette-driven initialization sweep (gt poses)
    def init_sweep(self):
        cfg = self.config
        granule = cfg.get("capacity_granule", 65536)
        every = cfg["train"].get("add_gaussians_every", 1)
        print(f"[offline] init sweep over {self.num_frames} frames")
        for t in range(0, self.num_frames, every):
            color, depth, _, _ = self.init_dataset[t]
            im, d = _to_chw_frame(color, depth)
            if t == 0:
                n_px = self.init_cam.width * self.init_cam.height
                capacity = G.round_capacity(int(n_px * 2.5), granule)
                self.state = initialize_first_frame(
                    im, d, self.init_cam, capacity, self._next_key(),
                    cfg["scene_radius_depth_ratio"],
                    gaussian_distribution=cfg.get("gaussian_distribution",
                                                  "isotropic"))
                continue
            used = int(self.state.hwm)
            if used + self.init_cam.width * self.init_cam.height \
                    > self.state.capacity:
                self.state = G.grow_capacity(
                    self.state, G.round_capacity(
                        int(self.state.capacity * 1.5), granule))
            q = jnp.asarray(self.cam_rots[:, t])
            tr = jnp.asarray(self.cam_trans[:, t])
            self.state = add_new_gaussians(
                self.state, im, d, q, tr, float(t), self._next_key(),
                self.init_cam, self.rcfg, sil_thres=self.sil_thres,
                gaussian_distribution=cfg.get("gaussian_distribution",
                                              "isotropic"))
        print(f"[offline] init done: {int(jnp.sum(self.state.alive))} "
              f"Gaussians (capacity {self.state.capacity})")

    # phase 2: full-map optimization
    def optimize(self, progress_every: int = 10):
        ocfg = self.ocfg
        n_chunks = max(1, ocfg.num_iters // ocfg.chunk_iters)
        opt = optim.init(self.state.params)
        t0 = time.time()
        for ci in range(n_chunks):
            fsel = self.rng.integers(
                0, self.num_frames,
                size=min(ocfg.frames_per_chunk, self.num_frames))
            cols, deps = [], []
            for f in fsel:
                color, depth, _, _ = self.dataset[int(f)]
                cols.append(np.clip(color, 0, 255).astype(np.uint8))
                deps.append(np.asarray(depth[..., 0], np.float32))
            frame_colors = jnp.asarray(np.stack(cols))
            frame_depths = jnp.asarray(np.stack(deps))
            frame_quats = jnp.asarray(self.cam_rots[:, fsel].T)
            frame_trans = jnp.asarray(self.cam_trans[:, fsel].T)

            it0 = ci * ocfg.chunk_iters
            iter_frames = jnp.asarray(self.rng.integers(
                0, len(fsel), size=ocfg.chunk_iters), jnp.int32)
            keys = jax.random.split(self._next_key(), ocfg.chunk_iters)
            lr_sched = expon_lr(
                jnp.arange(it0 + 1, it0 + ocfg.chunk_iters + 1,
                           dtype=jnp.float32),
                ocfg.lr_means3d, ocfg.lr_means3d_final,
                ocfg.lr_delay_mult, ocfg.num_iters)
            self.state, opt, log = offline_chunk(
                self.state, opt, frame_colors, frame_depths, frame_quats,
                frame_trans, iter_frames, keys, lr_sched,
                jnp.asarray(it0, jnp.int32), self.cam, self.rcfg, ocfg)
            if (ci + 1) % progress_every == 0 or ci == n_chunks - 1:
                ln = np.asarray(log)
                print(f"[offline] iter {it0 + ocfg.chunk_iters}/"
                      f"{ocfg.num_iters} loss {ln[-1,0]:.4f} "
                      f"(im {ln[-1,1]:.4f} d {ln[-1,2]:.4f}) "
                      f"n={int(jnp.sum(self.state.alive))} "
                      f"[{time.time()-t0:.0f}s]")

    def save(self):
        st = jax.jit(G.compact)(self.state)
        n = int(st.hwm)
        p = st.params
        params = {
            "means3D": np.asarray(p.means3d[:n]),
            "rgb_colors": np.asarray(p.rgb_colors[:n]),
            "unnorm_rotations": np.asarray(p.unnorm_rotations[:n]),
            "logit_opacities": np.asarray(p.logit_opacities[:n]),
            "log_scales": np.asarray(p.log_scales[:n]),
        }
        dc = self.config["data"]
        ckpt_io.save_checkpoint(
            self.output_dir, self.num_frames - 1, params,
            self.cam_rots[None], self.cam_trans[None],
            np.asarray(st.timestep[:n]), self.intrinsics,
            self.first_frame_w2c, dc["desired_image_width"],
            dc["desired_image_height"], self.gt_w2c_all, [])
        print(f"[offline] checkpoint saved to {self.output_dir}")


def offline_splatting(config: dict) -> OfflineGS:
    runner = OfflineGS(config)
    runner.init_sweep()
    runner.optimize()
    runner.save()
    return runner


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str)
    parser.add_argument("--no-eval", action="store_true")
    args = parser.parse_args(argv)
    config = load_experiment_config(args.experiment)
    enable_compilation_cache()
    seed_everything(config.get("seed", 0))
    results_dir = os.path.join(config["workdir"], config["run_name"])
    copy_config_for_provenance(args.experiment, results_dir)
    runner = offline_splatting(config)
    if not args.no_eval:
        from ..eval.eval_helpers import eval_sequence
        eval_sequence(runner.dataset, runner, runner.eval_dir,
                      sil_thres=runner.sil_thres, mapping_iters=1,
                      add_new_gaussians=True,
                      eval_every=config.get("eval_every", 5),
                      num_frames=runner.num_frames)
    return runner


if __name__ == "__main__":
    main()
