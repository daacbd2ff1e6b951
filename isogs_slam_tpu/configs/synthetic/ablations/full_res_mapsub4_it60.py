"""Ablation: full_res + mapping.tile_subsample=4 + 60 mapping iters
(dense Adam). Middle point of the iteration ladder: sub4@40 dense ATE
2.35, sub4@80 dense 1.48 (margin-0, NOTES.md round-3 session 3-4) — the
contract is ATE <= 1.39. 60 iters costs 1.5x sub4@40's mapping time,
still ~2.7x cheaper per phase than exact@40."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapsub4it60"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 4
config["mapping"]["num_iters"] = 60
