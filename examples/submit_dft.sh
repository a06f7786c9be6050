#!/bin/bash
# Pure-DFT NEB baseline launcher (reference: examples/Pd4/submit_dft.sh).
#SBATCH --job-name=dft_neb
#SBATCH --time=48:00:00
#SBATCH --nodes=1
#SBATCH --cpus-per-task=96

export ASE_VASP_COMMAND="mpirun -np 96 vasp_std"
export VASP_PP_PATH=/path/to/potcars

python dft_neb.py POSCAR_initial POSCAR_final
