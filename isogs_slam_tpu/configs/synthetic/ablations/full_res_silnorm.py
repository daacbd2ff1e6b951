"""Mechanism fix candidate: full_res (full IsoGS regime, flat=50 iso=2)
+ silhouette-NORMALIZED tracking render (tracking.sil_norm_render).

The round-3 regularizer cliff's suspected mechanism: the iso term pulls
the rendered silhouette s below 1, and the reference's composited depth
is an unnormalized alpha sum — biased low by exactly the factor s.
sil_thres 0.5 (forced by the iso pull) admits pixels with up to 2x depth
underestimate; tracking (w_depth=1.0) absorbs that systematic "scene too
close" signal as pose drift every frame. Consistent with the observed
scales: exact-regime depth L1 ~3.5 cm at ~3 m scene depth = ~1.2%
silhouette deficit, while noreg (saturated s) reaches 0.73 cm / ATE
0.149. This config keeps the product regularizers ON and normalizes
depth/rgb by max(s, eps) in the tracking loss only (the alpha-weighted
mean — the same fix the GN polish got in round 2). If the mechanism is
right, tracked ATE should land near noreg's while PSNR/depth keep the
regularized map's values. See LossConfig.sil_norm_render."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_silnorm"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["sil_norm_render"] = True
