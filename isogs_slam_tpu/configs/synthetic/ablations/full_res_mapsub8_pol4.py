"""Ablation: full_res + mapping.tile_subsample=8 with a 4-iteration
exact full-image tail (the round-5 single-chip throughput lever).

Round-4 adjudicated map-sub4+tail quality-FREE under the silnorm
tracking regime (median ATE 0.134 vs control 0.135, PSNR +1.26 dB —
NOTES r4s3). The old sub8 number (1.78 FPS, r2s6) predates BOTH the
stripe-exact SSIM estimator and silnorm, so sub8 is unadjudicated in
the current semantics. If sub8+tail matches the control like sub4 did,
the fast-mode mapping leg roughly halves again (stripe cost scales
~1/sub + halo overhead) — the one live single-chip FPS lever left in
the reachable-FPS ledger (NOTES round-4).

Reference anchor: deviates from splatam.py:1412-1491 full-image
iterations only via the stripe partition estimator (exact at the
estimator level, mapping.select_stripe) + the exact re-anchoring tail.
"""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapsub8pol4"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["tile_subsample"] = 8
config["mapping"]["exact_polish_iters"] = 4
