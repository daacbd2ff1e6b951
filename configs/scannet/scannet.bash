#!/bin/bash
# Seed x scene sweep over the ScanNet eval config (reference
# configs/scannet/scannet.bash): SEED/SCENE_NUM env contract.
for seed in 0 1 2; do
    export SEED=${seed}
    for scene in 0 1 2 3 4 5; do
        export SCENE_NUM=${scene}
        echo "Running scene number ${SCENE_NUM} with seed ${SEED}"
        python3 -u -m isogs_slam_tpu.scripts.splatam configs/scannet/scannet_eval.py
    done
done
