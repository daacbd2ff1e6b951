"""ScanNet++ novel-view-synthesis evaluation config (reference
configs/scannetpp/eval_novel_view.py): use_train_split=False selects the
held-out NVS split; scene_path points at the finished SLAM checkpoint.
Scene via SCENE env var."""
import os
import sys
from os.path import join as p_join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config, scene_from_env

scenes = ["8b5caf3398", "b20a261fdf"]
scene_name = scene_from_env(scenes, "SCENE")
seed = 0

config = make_config(
    group_name="ScanNetPP", run_name=f"{scene_name}_{seed}", seed=seed,
    basedir="./data/ScanNetPP",
    gradslam_data_cfg=None, sequence=scene_name,
    desired_height=584, desired_width=876,
    map_every=1, keyframe_every=5, mapping_window_size=24,
    tracking_iters=200, mapping_iters=60,
    tracking_lr_rot=0.001, tracking_lr_trans=0.001,
    tracking_use_depth_loss_thres=True, tracking_depth_loss_thres=20000,
    ignore_bad=True, use_train_split=False,
    save_checkpoints=False, load_checkpoint=False, checkpoint_time_idx=0,
    extra_data={"dataset_name": "scannetpp"},
    extra_top={"scene_path": p_join("./experiments/ScanNetPP",
                                    f"{scene_name}_{seed}", "params.npz")})
config["data"].pop("gradslam_data_cfg")
