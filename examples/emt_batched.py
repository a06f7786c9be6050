"""Batched on-the-fly NEB: every interior image evaluated in ONE device
program per optimizer step (TPU-native improvement over the reference's
per-image loop, NEB.py:40-60)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
from gpr_calculator_tpu import EMT, GP, GPR, get_images, neb_calc

init = "/root/reference/examples/database/initial.traj"
final = "/root/reference/examples/database/final.traj"

images = get_images(init, final, num_images=5)
gp = GP.set_GPR(images, EMT(), noise_e=0.05 / len(images[0]),
                noise_f=0.05)
calc = GPR(base=EMT(), ff=gp, save=False)
neb = neb_calc(images, calc, fmax=0.05, batched=True)
barrier = max(neb.energies) - neb.energies[0]
print(f"barrier: {barrier:.4f} eV,  base/surrogate calls: "
      f"{gp.use_base}/{gp.use_surrogate}")
