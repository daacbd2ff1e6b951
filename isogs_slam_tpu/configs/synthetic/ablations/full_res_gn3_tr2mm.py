"""Ablation: full_res + 3 combined-GN iters with a 2 mm trust region.
The unconstrained polish absorbs map reconstruction error into the pose
(gauge drift: ATE 13-26 cm measured, NOTES.md session 7); capping each
step at the trough-bias scale bounds the per-frame damage while still
allowing the sub-lr refinement Adam's bounce cannot reach."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_gn3tr"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["gn_iters"] = 3
config["tracking"]["gn_max_step"] = 0.002
