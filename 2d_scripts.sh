#!/bin/bash
# 2D launch recipes (reference 2d_scripts.sh).
# usage: bash 2d_scripts.sh <family> <model> <seed>
FAMILY=${1:-ours_scratch}
MODEL=${2:-resnet50}
SEED=${3:-0}

python -m co3d_2d.train \
  --ginc co3d_2d/configs/${FAMILY}/${MODEL}.gin \
  --seed ${SEED}
