"""Replica SLAM — the CONTRACT-PASSING fast mode (~1.6x the exact-mode
throughput at equal tracked quality on the full-res protocol).
Adjudicated PASS by the 100-frame drift-shape tiebreaker (round 5,
artifacts/r5s1/contracts.txt: combined fast ATE 0.216 vs exact control
0.248 at 100 frames, PSNR +1.58 dB — the fast mode drifts LESS).

The three levers and their round-4 multi-seed verdicts (artifacts/r4s3,
silnorm regime, 3 seeds each vs the exact control):
  tracking.tile_subsample=4      ATE 0.152 vs 0.135 (inside the 0.022
                                 decision margin), PSNR -0.10 dB
  mapping.tile_subsample=4
    + exact_polish_iters=4       ATE 0.134 vs 0.135, PSNR +1.26 dB
                                 (a REAL improvement)
  raster.adaptive_max_per_tile   default-on since round 4 (true-drop
                                 6.6% -> 0.91%, quality-free)
Early-stop and polyak EMA are deliberately absent (adjudicated loser /
no-effect — NOTES.md round 4). Reference workload anchor:
python_ordinary/configs/replica/splatam.py (same iters/lrs/window).
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
    group_name="Replica", run_name=f"{scene_name}_fast_{seed}", seed=seed,
    basedir="./data/Replica",
    gradslam_data_cfg="./configs/data/replica.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    map_every=5, keyframe_every=5, mapping_window_size=24,
    tracking_iters=10, mapping_iters=40,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002)

config["tracking"]["tile_subsample"] = 4
config["mapping"]["tile_subsample"] = 4
config["mapping"]["exact_polish_iters"] = 4
# pinned explicitly (ADVICE r4): every fast-mode verdict above was
# adjudicated UNDER the silhouette-normalized tracking render — the
# regime is load-bearing for this preset's quality contract
config["tracking"]["sil_norm_render"] = True
