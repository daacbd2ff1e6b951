"""Ablation: full_res + mapping.tile_subsample=2 (tracking exact).
Production fast-mode search: sub4 + 40 iters fails the quality contract
(ATE 11.3 cm, NOTES.md session 7); sub2 halves the per-iteration render
cost with 2x less gradient noise."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapsub2"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 2
