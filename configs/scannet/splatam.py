"""ScanNet SLAM config (reference configs/scannet/splatam.py: 480x640,
tracking 100 iters lr 5e-4/5e-4, mapping 40 iters every frame, window 10)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scenes = ["scene0000_00", "scene0059_00", "scene0106_00", "scene0169_00",
          "scene0181_00", "scene0207_00"]
scene_name = scenes[int(os.environ.get("SPLATAM_SCENE_INDEX", "0") or 0)]
seed = 0

config = make_config(
    group_name="ScanNet", run_name=f"{scene_name}_seed{seed}", seed=seed,
    basedir="./data/ScanNet",
    gradslam_data_cfg="./configs/data/scannet.yaml",
    sequence=scene_name, desired_height=480, desired_width=640,
    map_every=1, keyframe_every=5, mapping_window_size=10,
    tracking_iters=100, mapping_iters=40,
    tracking_lr_rot=0.0005, tracking_lr_trans=0.0005,
    tracking_ignore_outlier_depth=True)
