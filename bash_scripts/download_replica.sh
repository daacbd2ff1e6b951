#!/bin/bash
# Replica (SplaTAM packaging) download (reference bash_scripts/download_replica.sh).
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip && rm Replica.zip
