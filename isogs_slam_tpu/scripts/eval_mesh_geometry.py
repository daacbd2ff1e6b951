"""Mesh geometry evaluation — Accuracy / Completion / Chamfer / F-score /
Hausdorff / Completion-ratio between a reconstructed mesh and ground truth,
on 200k area-weighted surface samples (cKDTree).

CLI mirrors the reference `scripts/eval_mesh_geometry.py` (metrics at
:211-343; the pyrender per-pose depth-render comparison at :345-447 is
unavailable here — no pyrender / GL in this environment — and is skipped
with a notice when --render-eval is passed).

    python -m isogs_slam_tpu.scripts.eval_mesh_geometry <config.py> \
        --gt-mesh <gt.ply> [--pred-mesh mesh_thickened_800.ply]
        [--num-samples 200000] [--f-threshold 0.05]
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from ..mesh.geometry_eval import evaluate_mesh_geometry
from ..mesh.meshio import read_ply
from ..slam.config import load_experiment_config


def find_pred_mesh(result_dir: str) -> str | None:
    """Latest mesh_thickened_{N}.ply, else mesh_fast.ply."""
    cands = glob.glob(os.path.join(result_dir, "mesh_thickened_*.ply"))
    if cands:
        def frame(p):
            try:
                return int(os.path.basename(p).split("_")[-1].split(".")[0])
            except ValueError:
                return -1
        return max(cands, key=frame)
    fallback = os.path.join(result_dir, "mesh_fast.ply")
    return fallback if os.path.exists(fallback) else None


def main(argv=None):
    p = argparse.ArgumentParser(description="Mesh geometry evaluation")
    p.add_argument("config", type=str)
    p.add_argument("--gt-mesh", type=str, required=True)
    p.add_argument("--pred-mesh", type=str, default=None)
    p.add_argument("--num-samples", type=int, default=200000)
    p.add_argument("--f-threshold", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render-eval", action="store_true",
                   help="reference's pyrender depth comparison; "
                        "unavailable in this environment")
    args = p.parse_args(argv)

    config = load_experiment_config(args.config)
    result_dir = os.path.join(config["workdir"], config["run_name"])
    pred_path = args.pred_mesh or find_pred_mesh(result_dir)
    if pred_path is None:
        raise FileNotFoundError(
            f"No predicted mesh found in {result_dir}; run "
            f"extract_mesh_fast first or pass --pred-mesh")
    if not os.path.isabs(pred_path):
        cand = os.path.join(result_dir, pred_path)
        pred_path = cand if os.path.exists(cand) else pred_path

    print(f"Pred mesh: {pred_path}\nGT mesh:   {args.gt_mesh}")
    pred = read_ply(pred_path)
    gt = read_ply(args.gt_mesh)
    for name, m in (("pred", pred), ("gt", gt)):
        if m["vertices"] is None or m["faces"] is None:
            raise ValueError(f"{name} mesh missing vertices/faces")

    results = evaluate_mesh_geometry(
        pred["vertices"], pred["faces"], gt["vertices"], gt["faces"],
        num_samples=args.num_samples, f_threshold=args.f_threshold,
        seed=args.seed)
    if args.render_eval:
        print("[warn] --render-eval skipped: pyrender not available")
        results["render_eval"] = "skipped (pyrender unavailable)"

    print("\nMesh Geometry Metrics:")
    for k in ("accuracy", "completion", "chamfer_distance"):
        print(f"  {k}: {results[k]*100:.3f} cm")
    print(f"  f_score(@{args.f_threshold}m): {results['f_score']:.4f} "
          f"(P {results['precision']:.4f} / R {results['recall']:.4f})")
    print(f"  hausdorff_95: {results['hausdorff_95']*100:.3f} cm")
    print(f"  completion_ratio: {results['completion_ratio']:.4f}")

    out_json = os.path.join(result_dir, "mesh_geometry_eval.json")
    os.makedirs(result_dir, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump({"pred_mesh": pred_path, "gt_mesh": args.gt_mesh,
                   **results}, f, indent=2)
    print(f"\nSaved: {out_json}")
    return results


if __name__ == "__main__":
    main()
