"""Ablation: full_res + tracking.tile_subsample=4 ONLY (mapping exact).
Splits the full_res_fast ATE regression (4.72 cm vs 1.22 exact, NOTES.md
session 6) between the mapping and tracking subsample paths."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_tracksub"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["tile_subsample"] = 4
