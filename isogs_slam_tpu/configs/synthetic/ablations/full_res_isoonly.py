"""Blame ablation: full_res with iso ONLY (flat=0, iso=2).

Counterpart of full_res_flatonly.py for the round-3 regularizer quality
cliff. The iso density target pulls opacities (hence the rendered
silhouette) down toward its target saturation, which (a) forced
tracking's sil_thres from the reference 0.99 to 0.5 and (b) biases the
UNNORMALIZED composited depth low by the silhouette factor on every
admitted pixel — the suspected drift mechanism. This run keeps the
full_res tracking setup (sil_thres 0.5, raw composite) so its
degradation vs noreg isolates the iso term's share under the original
regime. Reference iso loss: python_ordinary/scripts/splatam.py:162-265.
"""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_isoonly"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["loss_weights"] = dict(im=0.5, depth=1.0, flat=0.0,
                                         iso=2.0)
# sil_thres stays 0.5: the iso pull keeps the silhouette below 0.99
# (full_res.py:80-85)
# RAW-regime pin: this ablation's committed numbers (artifacts/r4s1,
# NOTES round-4 blame table) were measured with the unnormalized
# tracking render; the pipeline default flipped to True afterwards.
config["tracking"]["sil_norm_render"] = False
