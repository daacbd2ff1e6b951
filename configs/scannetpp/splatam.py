"""ScanNet++ SLAM config (reference configs/scannetpp/splatam.py: 584x876
DSLR frames, tracking 200 iters + depth-loss-thres doubling, mapping 60,
window 24, map every frame)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scenes = ["8b5caf3398", "b20a261fdf"]
scene_name = scenes[int(os.environ.get("SPLATAM_SCENE_INDEX", "0") or 0)]
seed = 0

config = make_config(
    group_name="ScanNetPP", run_name=f"{scene_name}_seed{seed}", seed=seed,
    basedir="./data/ScanNetPP",
    gradslam_data_cfg=None, sequence=scene_name,
    desired_height=584, desired_width=876,
    map_every=1, keyframe_every=5, mapping_window_size=24,
    tracking_iters=200, mapping_iters=60,
    tracking_lr_rot=0.001, tracking_lr_trans=0.001,
    tracking_use_depth_loss_thres=True, tracking_depth_loss_thres=20000,
    ignore_bad=True,
    extra_data={"dataset_name": "scannetpp"})
config["data"].pop("gradslam_data_cfg")
