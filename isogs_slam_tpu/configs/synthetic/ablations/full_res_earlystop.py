"""Ablation: full_res + tracking.early_stop_patience=8 — exit the
per-frame Adam pose loop once the best-candidate metric has stalled for
8 consecutive iterations.

Pure-throughput knob: the returned pose is the best-so-far candidate
either way, and once the metric stalls the remaining iterations are
lr-scale bounce that best-candidate selection discards (the lr_decay=0.92
schedule makes late improvements increasingly rare, so the expected skip
is large at 40 full-res iters). Adjudication: tracked ATE/PSNR within the
multi-seed noise band of the exact control AND track s/frame down
(runtime_stats.json) — VERDICT r2 item 4's <= 0.12 s/frame target."""
import copy
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "_full_res_base",
    os.path.join(os.path.dirname(__file__), "..", "full_res.py")
).load_module()

scene_name = "synthetic_room_fullres_earlystop"
seed = 0
config = copy.deepcopy(_base.config)
config["run_name"] = f"{scene_name}_{seed}"
config["data"]["sequence"] = scene_name
config["tracking"]["early_stop_patience"] = 8
