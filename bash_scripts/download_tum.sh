#!/bin/bash
# TUM RGB-D sequences used by configs/tum/splatam.py.
mkdir -p data/TUM_RGBD
cd data/TUM_RGBD
for seq in freiburg1_desk freiburg1_desk2 freiburg1_room freiburg2_xyz \
           freiburg3_long_office_household; do
  fr=$(echo "$seq" | grep -o 'freiburg[0-9]')
  wget "https://cvg.cit.tum.de/rgbd/dataset/${fr}/rgbd_dataset_${seq}.tgz"
  tar -xzf "rgbd_dataset_${seq}.tgz" && rm "rgbd_dataset_${seq}.tgz"
done
