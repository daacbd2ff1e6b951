"""Replica SLAM config for a MULTI-CHIP TPU slice: identical semantics to
splatam.py plus config["parallel"]["map_views"] — each mapping phase runs
as data-parallel multi-view Adam steps over a jax.sharding.Mesh of
map_views devices (parallel/sharded.py::make_multiview_map_phase): every
step renders B keyframe views concurrently (one per chip, gradients
psum'ed over ICI) and mapping_iters counts VIEW renders, so wall-clock
per phase drops ~Bx at equal view-render count.

On a single-chip host the pipeline clamps map_views to the device count
and logs it (slam/pipeline.py:330-336), so this config degrades
gracefully. Set SPLATAM_MAP_VIEWS to override (e.g. 4 on a v5e-4 slice).

Run on a pod slice:
  python isogs_slam_tpu/scripts/splatam.py configs/replica/splatam_mc.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

scenes = ["room0", "room1", "room2",
          "office0", "office1", "office2", "office3", "office4"]
_idx = os.environ.get("SPLATAM_SCENE_INDEX", "0")
try:
    scene_name = scenes[int(_idx)] if 0 <= int(_idx) < len(scenes) \
        else scenes[0]
except ValueError:
    scene_name = scenes[0]
seed = 0

config = make_config(
    group_name="Replica", run_name=f"{scene_name}_mc_{seed}", seed=seed,
    basedir="./data/Replica",
    gradslam_data_cfg="./configs/data/replica.yaml",
    sequence=scene_name, desired_height=680, desired_width=1200,
    map_every=5, keyframe_every=5, mapping_window_size=24,
    tracking_iters=10, mapping_iters=40,
    tracking_lr_rot=0.0004, tracking_lr_trans=0.002)

config["parallel"] = {
    "map_views": int(os.environ.get("SPLATAM_MAP_VIEWS", "8")),
    # tile-sharded tracking: the per-frame Adam pose loop runs with the
    # compositing tiles sharded over the mesh (parallel/track_sharded.py)
    # — tracking is the Amdahl term once mapping shards over views
    "track_tiles": int(os.environ.get("SPLATAM_TRACK_TILES", "8")),
}
