"""Online-demo smoke config: small, CPU-runnable live-SLAM over a watched
capture directory (pair with nerfcapture2dataset --demo-synthetic)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import make_config

config = make_config(
    group_name="OnlineDemo", run_name="live_synthetic",
    basedir="", gradslam_data_cfg=None, sequence="live",
    desired_height=120, desired_width=160,
    map_every=5, keyframe_every=5, mapping_window_size=8,
    tracking_iters=12, mapping_iters=15,
    tracking_lr_rot=0.002, tracking_lr_trans=0.01,
    save_checkpoints=False, load_checkpoint=False,
    iso_sample_size=1024, num_frames=12,
    extra_data={"dataset_name": "stream"})
config["data"].pop("gradslam_data_cfg")
config["tracking"]["sil_thres"] = 0.90
config["raster"] = dict(max_per_tile=512, isect_per_gaussian=6.0,
                        tile_chunk=80)
config["capacity_granule"] = 8192
