"""Quick-start: on-the-fly GPR NEB for Au diffusion on Al(100).

Covers the reference quick-start workload (examples/emt-serial.py) with
this framework's API; runs anywhere (CPU or TPU), no ASE required.  The
point of the figure it produces: the on-the-fly surrogate reproduces the
plain-EMT barrier while calling the base calculator an order of magnitude
less often.

    python emt_serial.py            # writes NEB-test.png
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
from gpr_calculator_tpu import EMT, GP, GPR, get_images, neb_calc, plot_path

INIT = "/root/reference/examples/database/initial.traj"
FINAL = "/root/reference/examples/database/final.traj"
NUM_IMAGES = 5
FMAX = 0.05


def run_plain():
    """Every force call goes to EMT -- the cost/accuracy yardstick."""
    images = get_images(INIT, FINAL, NUM_IMAGES)
    neb = neb_calc(images, EMT(), fmax=FMAX)
    n_calls = neb.nsteps * (len(images) - 2) + 2
    return neb, f"EMT ({n_calls})"


def run_surrogate(noise_level: float):
    """On-the-fly run at a given noise level (eV total / eV/A)."""
    images = get_images(INIT, FINAL, NUM_IMAGES)
    gp = GP.set_GPR(images, EMT(),
                    noise_e=noise_level / len(images[0]),
                    noise_f=noise_level)
    neb = neb_calc(images, GPR(base=EMT(), ff=gp, save=False),
                   fmax=FMAX, climb=True)
    print(gp, "\n")
    return neb, f"GPR-{noise_level:.2f} ({gp.use_base}/{gp.use_surrogate})"


if __name__ == "__main__":
    curves = [run_plain()]
    curves += [run_surrogate(level) for level in (0.05, 0.10)]
    plot_path([(neb.images, neb.energies, label) for neb, label in curves],
              figname="NEB-test.png", fontsize=16,
              title="Au diffusion on Al(100)")
    for neb, label in curves:
        barrier = max(neb.energies) - neb.energies[0]
        print(f"{label:>18}: barrier {barrier:.3f} eV, "
              f"converged={neb.converged}")
