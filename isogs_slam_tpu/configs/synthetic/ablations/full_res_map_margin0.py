"""Ablation: full_res with MARGIN-FREE mapping phase binnings
(mapping.bin_margin_px = 0) — the render-semantics consistency test.

The coverage fix made tracking render reference-truncated (margin-0)
like eval, but mapping still composited its margin-4 ring, so the map
converges to 'margin-4-render == GT' and the margin-0 render tracking
sees is GT minus the ring — a systematic pose bias (suspected cause of
the exact ATE moving ~1.2 -> ~2.1 when the coverage fix landed). With
margin-0 phase binnings all three surfaces (mapping loss, tracking,
eval) composite the same function; the residual is un-modeled
within-phase param drift at rect edges, which the margin never modeled
correctly either.

MEASURED 2026-08-19 (30 frames): **ATE 1.26 cm / PSNR 20.35 / depth L1
3.55** vs margin-4's 2.04 / 19.61 / 3.19 — consistency confirmed, PSNR
is the best tracked full-res yet (+0.43 dB over the pre-fix 1.22/19.92
record). mapping.bin_margin_px now DEFAULTS to 0, so this config is the
regression record; flip the value to 4.0 to reproduce the mismatch."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_mapm0"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["mapping"]["bin_margin_px"] = 0.0
