#!/bin/bash
# Seed x scene sweep over the Replica full-eval config (reference
# configs/replica/replica.bash): SEED/SCENE_NUM env contract.
for seed in 0 1 2; do
    export SEED=${seed}
    for scene in 0 1 2 3 4 5 6 7; do
        export SCENE_NUM=${scene}
        echo "Running scene number ${SCENE_NUM} with seed ${SEED}"
        python3 -u -m isogs_slam_tpu.scripts.splatam configs/replica/replica_eval.py
    done
done
