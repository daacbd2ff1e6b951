"""Control: noreg regime (flat=0, iso=0) but with tracking sil_thres 0.5
instead of the reference 0.99.

full_res_noreg.py changes TWO things vs full_res.py (regularizer weights
AND the tracking threshold), so the 0.149-vs-2.5 cm cliff confounds
them. With no iso pull the silhouette saturates wherever the map covers,
so 0.5 vs 0.99 should admit nearly the same mask and score nearly the
same ATE — if it does NOT, the threshold itself (boundary pixels with
s in [0.5, 0.99], whose raw composite is biased) carries part of the
cliff and the blame ablations need re-reading."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_noreg_base",
    os.path.join(os.path.dirname(__file__), "full_res_noreg.py")
).load_module()

scene_name = "synthetic_room_fullres_noregsil05"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["sil_thres"] = 0.5
# RAW-regime pin: this ablation's committed numbers (artifacts/r4s1,
# NOTES round-4 blame table) were measured with the unnormalized
# tracking render; the pipeline default flipped to True afterwards.
config["tracking"]["sil_norm_render"] = False
