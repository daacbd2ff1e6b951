"""The round-5 fast-mode candidate: fastlegal with the mapping stripe
deepened to sub8 (the round-5 adjudicated component lever) —
  tracking.tile_subsample = 4      (PASS, r4s3 + long100 tiebreak)
  mapping.tile_subsample = 8       (component PASS r5s1: 3-seed median
                                    ATE 0.136 vs control 0.135, PSNR
                                    +1.96 dB)
  mapping.exact_polish_iters = 4   (exact tail re-anchors)
  raster.adaptive_max_per_tile     (default on, PASS)
under the silnorm default. Mechanism context (r5s1 probe): the fast
PSNR gain is mostly reduced per-phase full-image-iteration overfitting
(exact@26 reproduces +1.7 dB) but naive iteration cutting is
ATE-fragile (exacteq_s1 0.228) while stripes keep ATE at control on
every measured seed — the stripe estimator is the robust way to spend
less compute per phase. Adjudication: 3 seeds at 30 frames + a
100-frame drift run vs the long100sn control (chain r5s2)."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_fastlegal8"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["tile_subsample"] = 4
config["mapping"]["tile_subsample"] = 8
config["mapping"]["exact_polish_iters"] = 4
config["raster"]["adaptive_max_per_tile"] = True
