#!/bin/bash
# Download the ReplicaV2 (vMAP) sequences (reference
# bash_scripts/download_replicav2.sh).
set -e
mkdir -p data
cd data
wget https://huggingface.co/datasets/kxic/vMAP/resolve/main/vmap.zip
unzip vmap.zip
mkdir -p ReplicaV2
mv vmap/* ReplicaV2/
