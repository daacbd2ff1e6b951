#!/bin/bash
# Seed x scene sweep over the TUM eval config (reference
# configs/tum/tum.bash): SEED/SCENE_NUM env contract.
for seed in 0 1 2; do
    export SEED=${seed}
    for scene in 0 1 2 3 4; do
        export SCENE_NUM=${scene}
        echo "Running scene number ${SCENE_NUM} with seed ${SEED}"
        python3 -u -m isogs_slam_tpu.scripts.splatam configs/tum/tum_eval.py
    done
done
