"""iPhone dataset-only config (reference configs/iphone/dataset.py):
capture without running SLAM."""
import os

scene_name = os.environ.get("IPHONE_SCENE", "offline_demo")

config = dict(
    workdir="./experiments/iPhone_Captures",
    run_name=scene_name,
    overwrite=True,
    depth_scale=10.0,
    num_frames=300,
    source="dds",
)
