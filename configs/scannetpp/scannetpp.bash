#!/bin/bash
# SCENE sweep over the ScanNet++ SLAM eval config (reference
# configs/scannetpp/scannetpp.bash).
for scene in 0 1; do
    export SCENE=${scene}
    echo "Running scene number ${SCENE} with seed 0"
    python3 -u -m isogs_slam_tpu.scripts.splatam configs/scannetpp/scannetpp_eval.py
done
