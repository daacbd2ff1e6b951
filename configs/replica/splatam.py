"""Replica SLAM config (reference configs/replica/splatam.py: 680x1200,
tracking 10 iters lr 4e-4/2e-3, mapping 40 iters, map/keyframe every 5,
window 24). Scene via SPLATAM_SCENE_INDEX env var (0-7)."""
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
    group_name="Replica", run_name=f"{scene_name}_{seed}", seed=seed,
    basedir="./data/Replica",
    gradslam_data_cfg="./configs/data/replica.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    map_every=5, keyframe_every=5, mapping_window_size=24,
    tracking_iters=10, mapping_iters=40,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002)

# Pinned EXPLICITLY (ADVICE r4): the round-4 pipeline default flip would
# otherwise change this config's tracking-loss semantics silently. True
# is intended here: the silhouette-normalized tracking render removes
# the raw composite's s-factor depth bias and nests reference behavior
# at this config's sil_thres=0.99 (bias <= 1% there; 3-seed verdict
# NOTES r4s1 — ATE 0.135 vs 2.49 raw). Set False to reproduce the
# reference's raw-composite tracking loss bit-for-bit.
config["tracking"]["sil_norm_render"] = True
