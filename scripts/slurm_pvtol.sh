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
python train.py --preset pvtol \
    --gamma_b 0.8 --updates_per_step 1 --batch_size 256 \
    --start_steps 1000 --seed "${SEED:-12345}" \
    --output "${OUTPUT:-output}"
