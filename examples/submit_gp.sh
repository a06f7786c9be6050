#!/bin/bash
# TPU-flavoured equivalent of the reference's SLURM launcher
# (examples/Pd4/submit_gp.sh, H2S-extended/submit_gp.sh).
#
# The reference requests a 96-core node and splits it 24 GPR MPI ranks
# + 72 VASP cores (utilities.set_mpi rankfile).  Here the GPR side is one
# host process driving the TPU; reserve_host_cores() keeps host cores
# free for the DFT child job exactly like the rankfile did.
#
#SBATCH --job-name=gp_neb
#SBATCH --time=48:00:00
#SBATCH --nodes=1
#SBATCH --cpus-per-task=96

export GPR_CALC_TPU_X64=0            # f32 production mode
export GPR_CALC_TPU_KFF=pallas       # fused training kernels
export ASE_VASP_COMMAND="mpirun -np 72 --rankfile rankfile.txt vasp_std"
export VASP_PP_PATH=/path/to/potcars

python pd4_neb.py
