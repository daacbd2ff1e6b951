"""ReplicaV2 SLAM config (reference configs/replica_v2/splatam.py) —
imap/00 train split; NVS eval uses use_train_split=False."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scenes = ["room_0", "room_1", "room_2",
          "office_0", "office_1", "office_2", "office_3", "office_4"]
scene_name = scenes[int(os.environ.get("SPLATAM_SCENE_INDEX", "0") or 0)]
seed = 0

config = make_config(
    group_name="ReplicaV2", run_name=f"{scene_name}_{seed}", seed=seed,
    basedir="./data/ReplicaV2",
    gradslam_data_cfg="./configs/data/replica_v2.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    map_every=5, keyframe_every=5, mapping_window_size=24,
    tracking_iters=40, mapping_iters=60,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002)
