"""Ablation: full_res + the pose-perturbation fan (tracking.fan_rounds=3,
everything else exact). The round-3 Adam-side sub-cm tracking attack:
after the Adam loop, 3 rounds of forward-only pattern probes (+/- eps per
pose component, eps halving) under the same mask-normalized candidate
metric — anneals the L1-Adam bounce floor without any GN-style model
absorption (fan probes are accepted only on metric improvement, so the
failure mode that killed GN — absorbing map error into the pose — is
bounded by the metric itself). Compare ATE against full_res (1.22 cm
round-2 floor)."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_fan3"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["fan_rounds"] = 3
