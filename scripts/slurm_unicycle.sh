#!/bin/bash
# SLURM launch: Unicycle NLBAC on one TPU host.
# Capability parity with NBC-UNI/CLF_CBF_Unicycle_20.sh (single-GPU sbatch
# with the README hyperparameters), retargeted at a TPU partition.
#SBATCH --job-name=nlbac_unicycle
#SBATCH --output=logs/nlbac_unicycle_%j.out
#SBATCH --time=24:00:00
#SBATCH --nodes=1
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=8
# For GPU clusters instead:  #SBATCH --gres=gpu:1

set -euo pipefail
cd "$(dirname "$0")/.."

# README.md:43 hyperparameters
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

python train.py --preset unicycle "${DIST_FLAGS[@]}" \
    --gamma_b 50 --updates_per_step 2 --batch_size 128 \
    --start_steps 1000 --seed "${SEED:-12345}" \
    --output "${OUTPUT:-output}"
