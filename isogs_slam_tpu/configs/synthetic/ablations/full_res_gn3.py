"""Ablation: full_res + 3 GN polish iters (eigencut solve + sil-normalized
depth). Adjudicates whether the fixed GN polish helps tracked full-res ATE
(pyramid-only floor: 1.22 cm, NOTES.md session 5/7)."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_gn3"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["gn_iters"] = 3
