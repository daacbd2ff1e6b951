"""iPhone capture trainer config. In the reference,
configs/iphone/gaussian_splatting.py is byte-identical to
configs/iphone/splatam.py (the iPhone flow reuses the SLAM config for its
capture-and-train driver); mirror that by loading the same config."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from isogs_slam_tpu.slam.config import load_experiment_config

config = load_experiment_config(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "splatam.py"))
