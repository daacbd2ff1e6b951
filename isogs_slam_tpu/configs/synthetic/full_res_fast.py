"""Full-resolution FAST-MODE quality validation (680x1200, TPU).

Same real SLAM run as full_res.py, but with the opt-in fast paths on:
subsampled-tile mapping/tracking SGD (mapping.tile_subsample /
tracking.tile_subsample, NOTES.md lever 6) plus the output-preserving
exact-ellipse binning rects. The point of this config is the quality
side of the speed/quality trade: compare its eval_summary.json against
the exact full_res run — the fast path earns bench-default status only
if ATE stays within 10% and PSNR within 0.5 dB (BASELINE.md contract).

Run: python -m isogs_slam_tpu.scripts.splatam \
         isogs_slam_tpu/configs/synthetic/full_res_fast.py --end-at 30
"""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "full_res.py")).load_module()

scene_name = "synthetic_room_fullres_fast"
seed = 0

config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 4
config["tracking"]["tile_subsample"] = 4
# tight_rect removed 2026-08-19: measured SLOWER than plain sub4 on the
# bench (1.37 vs 1.50 FPS — compaction cost unpaid on isotropic
# post-densify scenes; see README knob table / NOTES.md session 6).
# fan_rounds measured HARMFUL on sequences (full_res+fan3 ATE 3.64 vs
# ~2.2 exact-regime, super-linear drift — the fan optimizes the biased
# tracking loss harder and absorbs map error into the pose, the same
# gauge-drift mechanism that retired GN); unit-scene polish only.
