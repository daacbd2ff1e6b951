"""Ablation: full_res with mapping routed through the SUBSET loss path at
tile_subsample=1 (mapping.force_subset) — every tile selected, zero
sampling variance. The ONLY difference from the exact path is the
estimator swap: per-tile valid-window SSIM (boundary windows dropped,
interior-tile weighting) vs the reference's SAME-padded full-image SSIM.

Discriminator for the residual fast-mode ATE gap (2.8 vs 1.2 cm exact,
flat across variance levels — NOTES.md session 8): if this run lands near
2.8, the SSIM estimator is the systematic culprit; if near 1.2, blame the
subsampling itself (frontier underfit)."""
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
