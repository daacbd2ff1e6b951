"""Ablation: full_res with mapping routed through the SUBSET loss path at
tile_subsample=1 (mapping.force_subset) — every tile selected, zero
sampling variance, isolating the subset estimator from subsampling noise.

History: with the old per-tile valid-window SSIM this run measured ATE
2.14 cm vs 1.22 exact, convicting the estimator (round-2 verdict item 1).
The stripe estimator replacing it is loss-EQUIVALENT to the exact path at
sub=1 (same-padded full-image SSIM over the whole-image stripe), so this
run should now land at the exact path's ~1.22 cm — the regression gate
for fast-mapping estimator changes."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapsub1f"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 1
config["mapping"]["force_subset"] = True
