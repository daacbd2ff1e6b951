"""TUM RGB-D SLAM config (reference configs/tum/splatam.py: 480x640,
tracking 200 iters lr 2e-3/2e-3, mapping 40 iters every frame, window 20,
scene_radius_depth_ratio 2). Scene via SPLATAM_SCENE_INDEX (0-4)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scenes = ["freiburg1_desk", "freiburg1_desk2", "freiburg1_room",
          "freiburg2_xyz", "freiburg3_long_office_household"]
scene_name = scenes[int(os.environ.get("SPLATAM_SCENE_INDEX", "0") or 0)]
seed = 0
_fr = "freiburg1" if "freiburg1" in scene_name else (
    "freiburg2" if "freiburg2" in scene_name else "freiburg3")

config = make_config(
    group_name="TUM", run_name=f"{scene_name}_seed{seed}", seed=seed,
    basedir="./data/TUM_RGBD",
    gradslam_data_cfg=f"./configs/data/tum_{_fr}.yaml",
    sequence=f"rgbd_dataset_{scene_name}",
    desired_height=480, desired_width=640,
    map_every=1, keyframe_every=5, mapping_window_size=20,
    tracking_iters=200, mapping_iters=40, scene_radius_depth_ratio=2,
    tracking_lr_rot=0.002, tracking_lr_trans=0.002,
    tracking_use_depth_loss_thres=True, tracking_depth_loss_thres=20000,
    tracking_ignore_outlier_depth=True)
