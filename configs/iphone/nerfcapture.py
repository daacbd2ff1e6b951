"""NeRFCapture capture config (reference configs/iphone/nerfcapture.py):
parameters for nerfcapture2dataset."""
import os

scene_name = os.environ.get("IPHONE_SCENE", "offline_demo")

config = dict(
    workdir="./experiments/iPhone_Captures",
    run_name=scene_name,
    overwrite=False,
    depth_scale=10.0,       # ARKit depth stream scale
    num_frames=120,
    source="dds",           # "dds" (reference transport) | "dir"
)
