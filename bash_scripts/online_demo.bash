#!/bin/bash
# Live online SLAM demo (reference bash_scripts/online_demo.bash).
# The reference raises DDS socket buffers; with the directory transport no
# sysctl is needed. Pair with a writer pushing frames into $CAPTURE_DIR.
CAPTURE_DIR="${CAPTURE_DIR:-/tmp/live_capture}"
python -m isogs_slam_tpu.scripts.iphone_demo configs/iphone/splatam.py \
    --source dir --watch "$CAPTURE_DIR"
