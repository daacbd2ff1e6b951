"""ScanNet full-evaluation SLAM config (reference
configs/scannet/scannet_eval.py): same as scannet/splatam.py but mapping
30 iters, no checkpointing, scene/seed via SCENE_NUM/SEED."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config, scene_from_env

scenes = ["scene0000_00", "scene0059_00", "scene0106_00", "scene0169_00",
          "scene0181_00", "scene0207_00"]
scene_name = scene_from_env(scenes, "SCENE_NUM")
seed = int(os.environ.get("SEED", "0") or 0)

config = make_config(
    group_name="ScanNet", run_name=f"{scene_name}_{seed}", seed=seed,
    basedir="./data/ScanNet",
    gradslam_data_cfg="./configs/data/scannet.yaml",
    sequence=scene_name, desired_height=480, desired_width=640,
    map_every=1, keyframe_every=5, mapping_window_size=10,
    tracking_iters=100, mapping_iters=30,
    tracking_lr_rot=0.0005, tracking_lr_trans=0.0005,
    tracking_ignore_outlier_depth=True,
    eval_every=5, save_checkpoints=False, load_checkpoint=False,
    checkpoint_time_idx=0)
