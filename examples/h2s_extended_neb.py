"""Surface-reaction NEB with a larger cell (H2S-extended family).

Equivalent of the reference's examples/H2S-extended/*/gp_neb.py workloads:
bigger slabs where the force-force block dominates the covariance
(3N force rows per configuration).  VASP supplies ground truth; the
Dot kernel variant is selectable, matching the reference's usage.
"""
import os

from gpr_calculator_tpu import GP, GPR, get_images, neb_calc, plot_path
from gpr_calculator_tpu.calculators import get_vasp
from gpr_calculator_tpu.utils import reserve_host_cores

init, final = "POSCAR_initial", "POSCAR_final"
num_images = 7
fmax = 0.05
tag = "h2s-ext"
kernel = os.environ.get("GPR_KERNEL", "RBF")        # or "Dot"

# reserve host cores for the VASP child job (utilities.set_mpi equivalent)
ncpu = reserve_host_cores(n_reserved=4)
os.environ.setdefault(
    "ASE_VASP_COMMAND",
    f"mpirun -np {ncpu} --rankfile rankfile.txt vasp_std")

base = get_vasp(kpts=[2, 2, 1])
images = get_images(init, final, num_images, IDPP=True, vaccum=2.0)

gp = GP.set_GPR(images, base,
                kernel=kernel,
                noise_e=0.05 / len(images[0]),
                noise_f=0.10,
                lmax=4, nmax=3, rcut=5.0,
                json_file=f"{tag}-gpr.json")
calc = GPR(base=base, ff=gp, tag=tag, freq=10)

neb = neb_calc(images, calc, algo="FIRE", fmax=fmax, steps=200,
               climb=True, traj=f"{tag}-neb.traj")
print(gp)
plot_path([(neb.images, neb.energies, f"GPR-NEB ({gp.use_base} DFT calls)")],
          figname=f"{tag}-neb.png")
