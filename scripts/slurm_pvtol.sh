#!/bin/bash
# SLURM launch: PVTOL NLBAC on one TPU host.
# Capability parity with NBC-PVTOL/20_Node_Pvtol_20.sh.
#SBATCH --job-name=nlbac_pvtol
#SBATCH --output=logs/nlbac_pvtol_%j.out
#SBATCH --time=48:00:00
#SBATCH --nodes=1
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=8

set -euo pipefail
cd "$(dirname "$0")/.."

# README.md:59 hyperparameters
# Data-parallel width (one process): DP=N shards the update batches
# over N local devices (GSPMD psums over ICI; --dp in train/cli.py).
# Multi-host: launch one task per host with the same command and set
# COORDINATOR=host0:1234 NUM_PROCESSES=$SLURM_NTASKS
# PROCESS_ID=$SLURM_PROCID — rank 0 owns logs/checkpoints.
DIST_FLAGS=()
[[ "${DP:-1}" != 1 ]] && DIST_FLAGS+=(--dp "$DP")
# TP=N Megatron-shards params over a tp axis (grown models;
# composes with DP on a (dp,tp) mesh — --tp in train/cli.py)
[[ "${TP:-1}" != 1 ]] && DIST_FLAGS+=(--tp "$TP")
if [[ "${NUM_PROCESSES:-1}" != 1 ]]; then
  DIST_FLAGS+=(--coordinator "$COORDINATOR" \
               --num_processes "$NUM_PROCESSES" \
               --process_id "${PROCESS_ID:-$SLURM_PROCID}")
fi

python train.py --preset pvtol "${DIST_FLAGS[@]}" \
    --gamma_b 0.8 --updates_per_step 1 --batch_size 256 \
    --start_steps 1000 --seed "${SEED:-12345}" \
    --output "${OUTPUT:-output}"
