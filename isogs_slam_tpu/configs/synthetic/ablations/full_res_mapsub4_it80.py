"""Ablation: full_res + mapping.tile_subsample=4 + num_iters 40 -> 80
(tracking exact). Production fast-mode search: scales iteration count
with the subsample so each tile still receives ~20 full-image-equivalent
updates per phase; per-phase loop cost ~half of exact-40."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapsub4it80"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 4
config["mapping"]["num_iters"] = 80
