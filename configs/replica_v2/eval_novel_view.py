"""ReplicaV2 novel-view-synthesis evaluation config: replica_v2/splatam.py
with use_train_split=False (the reference flips the commented-out flag in
configs/replica_v2/splatam.py:13-16 by hand; this makes the NVS variant a
loadable file) plus scene_path for eval_novel_view."""
import os
import sys
from os.path import join as p_join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config, scene_from_env

scenes = ["room_0", "room_1", "room_2",
          "office_0", "office_1", "office_2", "office_3", "office_4"]
scene_name = scene_from_env(scenes, "SCENE")
seed = 0

config = make_config(
    group_name="ReplicaV2", run_name=f"{scene_name}_{seed}", seed=seed,
    basedir="./data/ReplicaV2",
    gradslam_data_cfg="./configs/data/replica_v2.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    map_every=5, keyframe_every=5, mapping_window_size=24,
    tracking_iters=40, mapping_iters=60,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002,
    use_train_split=False,
    save_checkpoints=False, load_checkpoint=False, checkpoint_time_idx=0,
    extra_top={"scene_path": p_join("./experiments/ReplicaV2",
                                    f"{scene_name}_{seed}", "params.npz")})
