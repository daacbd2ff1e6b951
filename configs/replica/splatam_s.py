"""Replica small/fast config (reference configs/replica/splatam_s.py:
340x600 working res for cheap runs)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scenes = ["room0", "room1", "room2",
          "office0", "office1", "office2", "office3", "office4"]
scene_name = scenes[int(os.environ.get("SPLATAM_SCENE_INDEX", "0") or 0)]
seed = 0

config = make_config(
    group_name="Replica", run_name=f"{scene_name}_s_{seed}", seed=seed,
    basedir="./data/Replica",
    gradslam_data_cfg="./configs/data/replica.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    # half-res densification only (reference splatam_s.py: mapping/tracking
    # stay at full res, new Gaussians are seeded from 340x600)
    densification_height=340, densification_width=600,
    map_every=5, keyframe_every=5, mapping_window_size=24,
    tracking_iters=10, mapping_iters=40,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002)
