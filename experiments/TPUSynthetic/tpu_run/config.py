config_base = None
import sys, os
sys.path.insert(0, "/root/repo/configs")
from _splatam_base import make_config
config = make_config(
    group_name="TPUSynthetic", run_name="tpu_run",
    basedir="", gradslam_data_cfg=None, sequence="syn",
    desired_height=340, desired_width=600,
    map_every=5, keyframe_every=5, mapping_window_size=10,
    tracking_iters=10, mapping_iters=40,
    tracking_lr_rot=0.002, tracking_lr_trans=0.01,
    save_checkpoints=True, load_checkpoint=False,
    checkpoint_interval=20, num_frames=40,
    extra_data={"dataset_name": "synthetic"})
config["data"].pop("gradslam_data_cfg")
config["tracking"]["sil_thres"] = 0.90
config["raster"] = dict(max_per_tile=512, isect_per_gaussian=4.0, tile_chunk=256)
config["capacity_granule"] = 65536
