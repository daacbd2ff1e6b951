"""Replica rendering / novel-view-synthesis evaluation config (reference
configs/replica/replica_rendering_eval.py): use_train_split=False routes
the NVS split through eval_novel_view; scene_path points at the finished
SLAM run's checkpoint. Scene via SCENE env var (reference contract)."""
import os
import sys
from os.path import join as p_join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config, scene_from_env

scenes = ["room0", "room1", "room2",
          "office0", "office1", "office2", "office3", "office4"]
scene_name = scene_from_env(scenes, "SCENE")
seed = 0

config = make_config(
    group_name="Replica", run_name=f"{scene_name}_{seed}", seed=seed,
    basedir="./data/Replica",
    gradslam_data_cfg="./configs/data/replica.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    map_every=1, keyframe_every=5, mapping_window_size=24,
    tracking_iters=40, mapping_iters=60,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002,
    eval_every=5, save_checkpoints=False, load_checkpoint=False,
    checkpoint_time_idx=0, use_train_split=False,
    extra_top={"scene_path": p_join("./experiments/Replica",
                                    f"{scene_name}_{seed}", "params.npz")})
