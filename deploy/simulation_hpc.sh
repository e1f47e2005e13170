#!/bin/bash
# Single-simulation SLURM job (analogue of the reference's
# src/simulation_hpc.sh, which wrapped mpirun + singularity). On TPU
# deployments one python process drives the chips; multihost pods set the
# jax.distributed coordinator through the environment.
#SBATCH --ntasks=1
#SBATCH --time=12:00:00

python main.py simulate "$@"
