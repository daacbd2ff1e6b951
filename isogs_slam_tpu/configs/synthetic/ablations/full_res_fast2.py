"""Production fast-mode candidate: mapping stripes at sub=2 + tracking
tile subset at sub=4 (both margin-0, dense Adam). The sub4 mapping
ladder (2.35 @ 40 iters, 1.66-1.48 @ 80) shows the subset path's
residual is per-row underfit; sub=2 halves the underfit factor at a
still-~1.8x per-iter mapping win. Contract: ATE <= 1.39 cm (<= 10% over
the exact margin-0 control's 1.26), PSNR within 0.5 dB of 20.35."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_fast2"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 2
config["tracking"]["tile_subsample"] = 4
