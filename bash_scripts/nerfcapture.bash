#!/bin/bash
# Capture an iPhone dataset, run SLAM on it, then visualize (reference
# bash_scripts/nerfcapture.bash — its sysctl DDS buffer tuning is not
# needed for the directory transport).
if [ "$#" -ne 1 ]; then
    echo "Usage: bash_scripts/nerfcapture.bash <config_file>"
    exit 1
fi
if [ ! -f "$1" ]; then
    echo "Config file not found!"
    exit 1
fi
python -m isogs_slam_tpu.scripts.nerfcapture2dataset "$1"
python -m isogs_slam_tpu.scripts.splatam "$1"
python -m isogs_slam_tpu.viz_scripts.final_recon "$1"
