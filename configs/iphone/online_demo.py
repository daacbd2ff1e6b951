"""Live online SLAM demo config (reference configs/iphone/online_demo.py):
the iphone splatam config with demo-suited latency knobs."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scene_name = os.environ.get("IPHONE_SCENE", "online_demo")

config = make_config(
    group_name="iPhone_Captures", run_name=f"{scene_name}_0", seed=0,
    basedir="./experiments/iPhone_Captures",
    gradslam_data_cfg=None, sequence=scene_name,
    desired_height=360, desired_width=480,
    map_every=2, keyframe_every=4, mapping_window_size=16,
    tracking_iters=20, mapping_iters=20,
    tracking_lr_rot=0.002, tracking_lr_trans=0.004,
    tracking_use_depth_loss_thres=True, tracking_depth_loss_thres=50000,
    tracking_ignore_outlier_depth=True,
    save_checkpoints=True, load_checkpoint=False, checkpoint_interval=20,
    extra_data={"dataset_name": "nerfcapture"})
config["data"].pop("gradslam_data_cfg")
