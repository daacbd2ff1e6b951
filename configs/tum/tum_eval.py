"""TUM full-evaluation SLAM config (reference configs/tum/tum_eval.py):
same as tum/splatam.py but mapping 30 iters, no checkpointing, and
scene/seed via the reference's SCENE_NUM/SEED env contract."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config, scene_from_env

scenes = ["freiburg1_desk", "freiburg1_desk2", "freiburg1_room",
          "freiburg2_xyz", "freiburg3_long_office_household"]
scene_name = scene_from_env(scenes, "SCENE_NUM")
seed = int(os.environ.get("SEED", "0") or 0)
_fr = "freiburg1" if "freiburg1" in scene_name else (
    "freiburg2" if "freiburg2" in scene_name else "freiburg3")

config = make_config(
    group_name="TUM", run_name=f"{scene_name}_{seed}", seed=seed,
    basedir="./data/TUM_RGBD",
    gradslam_data_cfg=f"./configs/data/tum_{_fr}.yaml",
    sequence=f"rgbd_dataset_{scene_name}",
    desired_height=480, desired_width=640,
    map_every=1, keyframe_every=5, mapping_window_size=20,
    tracking_iters=200, mapping_iters=30, scene_radius_depth_ratio=2,
    tracking_lr_rot=0.002, tracking_lr_trans=0.002,
    tracking_use_depth_loss_thres=True, tracking_depth_loss_thres=20000,
    tracking_ignore_outlier_depth=True,
    eval_every=5, save_checkpoints=False, load_checkpoint=False,
    checkpoint_time_idx=0)
