"""Replica SLAM — the sub8 fast preset (OPT-IN; measured 1.73 FPS =
13.0x the reference on the bench workload, artifacts/r5s1/
bench_sub8.json). Honest quality status (round-5 adjudication,
artifacts/r5s3/contracts_final.txt):

  mapping sub8 + exact tail ALONE:       PASS (3 seeds: median ATE
                                         0.136 vs control 0.135,
                                         PSNR +1.95 dB, long100-tied)
  COMBINED with tracking sub4 (this
  preset):                               CONFLICT — 30-frame median
                                         ATE +0.064 (FAIL, with a
                                         7x-control seed spread), but
                                         100-frame drift runs land
                                         BELOW the exact control
                                         (3-seed median 0.218 vs
                                         0.248, PSNR +1.99 dB)

Mechanism: sub8 stripes converge slower early (short-sequence ATE is
worse) but the converged mode drifts FLATTER than exact at length.
Use `splatam_fast.py` (sub4 — every contract PASS) unless throughput
matters more than early-sequence accuracy; prefer this preset for
long sequences where the flat drift profile dominates.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scenes = ["room0", "room1", "room2",
          "office0", "office1", "office2", "office3", "office4"]
_idx = os.environ.get("SPLATAM_SCENE_INDEX", "0")
try:
    scene_name = scenes[int(_idx)] if 0 <= int(_idx) < len(scenes) \
        else scenes[0]
except ValueError:
    scene_name = scenes[0]
seed = 0

config = make_config(
    group_name="Replica", run_name=f"{scene_name}_fast8_{seed}", seed=seed,
    basedir="./data/Replica",
    gradslam_data_cfg="./configs/data/replica.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    map_every=5, keyframe_every=5, mapping_window_size=24,
    tracking_iters=10, mapping_iters=40,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002)

config["tracking"]["tile_subsample"] = 4
config["mapping"]["tile_subsample"] = 8
config["mapping"]["exact_polish_iters"] = 4
# adaptive_max_per_tile + sil_norm_render are the (adjudicated) pipeline
# defaults; pinned here like splatam_fast.py so the regime is visible
config.setdefault("raster", {})["adaptive_max_per_tile"] = True
config["tracking"]["sil_norm_render"] = True
