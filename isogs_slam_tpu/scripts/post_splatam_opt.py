"""Post-SLAM map optimization — load a SLAM checkpoint and re-optimize the
Gaussian map against all frames using the ESTIMATED trajectory as fixed
poses (reference `scripts/post_splatam_opt.py`:
initialize_first_timestep_from_ckpt :68-110, rgbd_slam :160-386).

    python -m isogs_slam_tpu.scripts.post_splatam_opt \
        configs/replica/post_splatam_opt.py
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core import gaussians as G
from ..io import checkpoints as ckpt_io
from ..slam.config import (copy_config_for_provenance,
                           load_experiment_config)
from ..utils.common import enable_compilation_cache, seed_everything
from .gaussian_splatting import OfflineGS


class PostSLAMOpt(OfflineGS):
    """OfflineGS with the map and trajectory seeded from a SLAM checkpoint
    instead of a silhouette init sweep + GT poses."""

    def __init__(self, config: dict):
        super().__init__(config)
        ckpt_dir = config["data"].get("param_ckpt_path") or os.path.join(
            config["workdir"], config["data"]["param_run_name"])
        want = config.get("checkpoint_time_idx", -1)
        if want < 0:
            frame, path = ckpt_io.latest_checkpoint(ckpt_dir)
        else:
            frame, path = want, os.path.join(ckpt_dir, f"params{want}.npz")
        if path is None or not os.path.exists(path):
            raise FileNotFoundError(f"No SLAM checkpoint in {ckpt_dir}")
        print(f"[post-opt] loading SLAM checkpoint {path}")
        data = ckpt_io.load_checkpoint(path)

        n = data["means3D"].shape[0]
        capacity = G.round_capacity(
            int(n * 1.25), config.get("capacity_granule", 65536))
        st = G.empty_state(capacity)
        rows = G.GaussianParams(
            means3d=jnp.asarray(data["means3D"]),
            rgb_colors=jnp.asarray(data["rgb_colors"]),
            unnorm_rotations=jnp.asarray(data["unnorm_rotations"]),
            logit_opacities=jnp.asarray(data["logit_opacities"]),
            log_scales=jnp.asarray(data["log_scales"]))
        st = G.append_rows(st, rows, jnp.ones(n, bool), 0)
        _, depth0, _, _ = self.dataset[0]
        st = st._replace(scene_radius=jnp.asarray(
            float(np.max(depth0)) / config["scene_radius_depth_ratio"],
            jnp.float32))
        self.state = st

        # estimated trajectory replaces the GT poses for optimization.
        # The pose arrays are ALLOCATED at the SLAM run's num_frames but
        # only optimized through the checkpoint's frame index — clamp to
        # frame+1 so an interrupted run's unvisited (garbage) tail poses
        # never enter the optimization (reference
        # scripts/post_splatam_opt.py:160-386 assumes a completed run).
        est_rots = np.asarray(data["cam_unnorm_rots"])[0]
        est_trans = np.asarray(data["cam_trans"])[0]
        T = min(self.num_frames, est_rots.shape[1], frame + 1)
        self.num_frames = T
        self.cam_rots = est_rots[:, :T] / np.linalg.norm(
            est_rots[:, :T], axis=0, keepdims=True)
        self.cam_trans = est_trans[:, :T]

    def init_sweep(self):  # map comes from the checkpoint
        print(f"[post-opt] map seeded from checkpoint: "
              f"{int(jnp.sum(self.state.alive))} Gaussians")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("experiment", type=str)
    p.add_argument("--no-eval", action="store_true")
    args = p.parse_args(argv)
    config = load_experiment_config(args.experiment)
    enable_compilation_cache()
    seed_everything(config.get("seed", 0))
    results_dir = os.path.join(config["workdir"], config["run_name"])
    copy_config_for_provenance(args.experiment, results_dir)

    runner = PostSLAMOpt(config)
    runner.init_sweep()
    runner.optimize()
    runner.save()
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
