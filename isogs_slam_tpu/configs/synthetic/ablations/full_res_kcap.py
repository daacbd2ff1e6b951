"""Ablation: full_res + raster.adaptive_max_per_tile=True — adjudicates
the per-tile compositing-cap truncation (render-semantics deviation: the
reference composites EVERY intersection, cpp/src/rendering/renderer.cpp
front-to-back loop; our top-K keeps the front-most max_per_tile=512).

Quality runs at margin-0 report ~6% of true-footprint intersections
dropped at frame 0 and runtime_stats now records the per-phase steady
state. Dropped intersections are the DEEPEST per tile, so they are
mostly occluded (transmittance-saturated) — this run measures whether
escalating the cap moves tracked ATE/PSNR at all. If it does not, the
cap stays 512 and the warning is informational."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_kcap"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["raster"]["adaptive_max_per_tile"] = True
