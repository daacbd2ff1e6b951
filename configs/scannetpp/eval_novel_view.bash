#!/bin/bash
# NVS eval for one ScanNet++ scene (reference
# configs/scannetpp/eval_novel_view.bash): scene index as $1.
export SCENE=$1
echo "Evaluating scene number ${SCENE} with seed 0"
python3 -u -m isogs_slam_tpu.scripts.eval_novel_view configs/scannetpp/eval_novel_view.py
