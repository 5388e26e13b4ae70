#!/bin/bash
# 3D launch recipes (reference 3d_scripts.sh:5-12):
# classification = co3d_cls + aug + feature + model, seeded.
# usage: bash 3d_scripts.sh <model.gin> <feature.gin> <seed>
MODEL=${1:-resnet14}
FEATURE=${2:-feature_sh}
SEED=${3:-777}

python -m co3d_3d.train \
  --ginc co3d_3d/configs/co3d_cls.gin \
  --ginc co3d_3d/configs/co3d_aug3.gin \
  --ginc co3d_3d/configs/${FEATURE}.gin \
  --ginc co3d_3d/configs/${MODEL}.gin \
  --run_name ${MODEL}-${FEATURE} \
  --seed ${SEED} \
  --save_path experiments/${MODEL}-${FEATURE}-${SEED}

# PeRFception-ScanNet semantic segmentation:
# python -m co3d_3d.train \
#   --ginc co3d_3d/configs/scannet_plenoxel.gin \
#   --ginc co3d_3d/configs/scannet_feature_sh.gin \
#   --seed ${SEED} --save_path experiments/scannet-seg-${SEED}
