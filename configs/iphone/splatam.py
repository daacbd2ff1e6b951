"""iPhone (NeRFCapture) offline SLAM config (reference
configs/iphone/splatam.py): dataset captured by nerfcapture2dataset."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scene_name = os.environ.get("IPHONE_SCENE", "offline_demo")
seed = 0

config = make_config(
    group_name="iPhone_Captures", run_name=f"{scene_name}_{seed}",
    seed=seed, basedir="./experiments/iPhone_Captures",
    gradslam_data_cfg=None, sequence=scene_name,
    desired_height=720, desired_width=960,
    map_every=1, keyframe_every=5, mapping_window_size=32,
    tracking_iters=60, mapping_iters=60,
    tracking_lr_rot=0.002, tracking_lr_trans=0.004,
    tracking_use_depth_loss_thres=True, tracking_depth_loss_thres=50000,
    tracking_ignore_outlier_depth=True,
    extra_data={"dataset_name": "nerfcapture"})
config["data"].pop("gradslam_data_cfg")
