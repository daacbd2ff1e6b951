"""Ablation: tracking-throughput attack (VERDICT round-2 item 4) — move
most tracking iterations to the 2x-downsampled pyramid level (1/4 the
pixels per iteration) and keep only a short full-res refinement, with the
strided tile subset on the full-res pass and the fan annealing the
bounce. Mapping stays exact so the ATE delta is attributable to the
tracking schedule alone.

Budget per frame ~ 40 coarse iters * 1/4 + 10 full-res iters * 1/4
(subset) vs the baseline 15 * 1/4 + 40 full-res: ~4x fewer full-res-
equivalent iterations. Contract: ATE within 10% of full_res's."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_trackcoarse"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
t = config["tracking"]
t["num_iters"] = 10
t["pyramid_levels"] = 2
t["pyramid_iters"] = 40
t["pyramid_lr_scale"] = 1.5
t["tile_subsample"] = 4
# fan removed 2026-08-19: measured HARMFUL on sequences (with fan2 this
# schedule hit ATE 8.32; fan3 alone took exact from 2.04 to 3.64 —
# gauge drift, see NOTES round-3 session 2); re-adjudicating the
# coarse-heavy schedule itself without it
