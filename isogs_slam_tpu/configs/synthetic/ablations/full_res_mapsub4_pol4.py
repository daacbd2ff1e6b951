"""Ablation: full_res + mapping.tile_subsample=4 with a 4-iteration
exact full-image tail (mapping.exact_polish_iters=4, dense Adam).

Attacks the stripe-staleness mechanism behind the sub4 drift (ATE 2.35
vs exact 1.26, NOTES.md round-3 session 4): at phase end each stripe's
params kept moving after its last visit, leaving a stripe-correlated
residual that tracking reads as pose error. The exact tail re-anchors
every pixel to the same final params. Cost: 36/4 + 4 = 13
exact-iter-equivalents vs 40 exact (~3x mapping win)."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapsub4pol4"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 4
config["mapping"]["exact_polish_iters"] = 4
