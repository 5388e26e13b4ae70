#!/bin/bash
# Multi-host TPU pod launch (replaces the reference's SLURM sbatch.sh +
# NCCL env tuning, sbatch.sh:1-44 / install.sh:20-27 — ICI is
# topology-routed, no transport tuning needed).
#
# Run this same command on every host of the pod slice (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`).
# jax.distributed.initialize() picks up the TPU pod metadata; each process
# loads its shard of the filelist (DataModule process_index/process_count).

set -e
CONFIGS=${CONFIGS:-"--ginc co3d_3d/configs/scannet_plenoxel.gin --ginc co3d_3d/configs/scannet_feature_sh.gin"}
SEED=${SEED:-777}
SAVE=${SAVE:-experiments/pod-run}

python -m co3d_3d.train ${CONFIGS} \
  --seed ${SEED} \
  --save_path ${SAVE} \
  --gpus ${NUM_DEVICES:-4}
