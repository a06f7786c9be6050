"""Production-style NEB with a DFT base calculator (Pd4 on MgO).

Equivalent of the reference's examples/Pd4/gp_neb.py:1-49: VASP supplies
the ground truth; the GPR surrogate absorbs most force calls.  Requires ASE
plus a VASP installation (set ASE_VASP_COMMAND / VASP_PP_PATH); the GPR
side runs on TPU regardless of where VASP runs.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import os

from gpr_calculator_tpu import GP, GPR, get_images, neb_calc, plot_path
from gpr_calculator_tpu.calculators import get_vasp

init, final = "POSCAR_initial", "POSCAR_final"
num_images = 5
fmax = 0.05
tag = "pd4"

os.environ.setdefault(
    "ASE_VASP_COMMAND", "mpirun -np 72 vasp_std")

base = get_vasp(kpts=[2, 2, 1])
images = get_images(init, final, num_images, IDPP=True)

gp = GP.set_GPR(images, base,
                kernel="RBF",
                noise_e=0.02 / len(images[0]),
                noise_f=0.10,
                json_file=f"{tag}-gpr.json")
calc = GPR(base=base, ff=gp, tag=tag, freq=10)

neb = neb_calc(images, calc, fmax=fmax, steps=100, climb=True,
               traj=f"{tag}-neb.traj")
print(gp)
plot_path([(neb.images, neb.energies, "GPR-NEB")],
          figname=f"{tag}-neb.png")
