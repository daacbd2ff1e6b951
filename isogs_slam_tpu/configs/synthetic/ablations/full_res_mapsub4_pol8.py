"""Ablation: full_res + mapping.tile_subsample=4 with an 8-iteration
exact full-image tail (mapping.exact_polish_iters=8, dense Adam).
Deeper polish ladder point: 32/4 + 8 = 16 exact-iter-equivalents vs 40
exact (~2.5x mapping win). See full_res_mapsub4_pol4.py."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapsub4pol8"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 4
config["mapping"]["exact_polish_iters"] = 8
