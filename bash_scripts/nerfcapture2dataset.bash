#!/bin/bash
# Capture an iPhone NeRFCapture stream to an on-disk dataset (reference
# bash_scripts/nerfcapture2dataset.bash). The reference raises DDS socket
# buffers via sysctl; the directory transport needs none, and the DDS path
# prints its own guidance when cyclonedds is present.
if [ "$#" -ne 1 ]; then
    echo "Usage: bash_scripts/nerfcapture2dataset.bash <config_file>"
    exit 1
fi
if [ ! -f "$1" ]; then
    echo "Config file not found!"
    exit 1
fi
python -m isogs_slam_tpu.scripts.nerfcapture2dataset "$1"
