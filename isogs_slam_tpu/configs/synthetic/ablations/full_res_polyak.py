"""Ablation: full_res + tracking.polyak_rho=0.9 — Polyak (EMA) tail
averaging of the Adam pose iterates instead of best-candidate selection.

The L1-Adam bounce makes per-frame pose error = trough bias + lr-scale
noise; best-candidate picks one noisy iterate, while the EMA averages
the bounce away (~sqrt(window) variance cut at zero extra renders).
Unlike the fan/GN family this does NOT descend the biased tracking loss
below the Adam floor, so the gauge-drift failure mechanism (NOTES.md
round-3 session 3) does not apply. rho=0.9 ≈ a 10-iterate tail over the
40-iteration full-res pass (lr_decay 0.92 shrinks the late steps the
EMA spans)."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_polyak"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["polyak_rho"] = 0.9
