"""Pure base-calculator NEB baseline (no surrogate).

Equivalent of the reference's examples/Pd4/dft_neb.py and H2S/dft_neb.py:
relax the same image chain with every force call going to the base
calculator.  This is the ground-truth/cost baseline that the on-the-fly
GPR runs (pd4_neb.py, h2s_extended_neb.py) are measured against -- compare
the base-call counts and the final barrier.

With VASP configured it reproduces the reference workload; without it,
the bundled Au/Al(100) EMT hopping barrier runs anywhere:

    python dft_neb.py                 # EMT on the bundled trajectories
    python dft_neb.py POSCAR_initial POSCAR_final   # your own endpoints
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

from gpr_calculator_tpu import EMT, get_images, neb_calc, plot_path

INIT = "/root/reference/examples/database/initial.traj"
FINAL = "/root/reference/examples/database/final.traj"


def main(init=INIT, final=FINAL, num_images=5, fmax=0.05, steps=200):
    images = get_images(init, final, num_images)
    n_calls = {"count": 0}

    class CountingEMT(EMT):
        def calculate(self, atoms=None, properties=("energy", "forces"),
                      system_changes=None):
            n_calls["count"] += 1
            return super().calculate(atoms, properties, system_changes)

    for image in images:
        image.calc = CountingEMT()

    t0 = time.time()
    neb = neb_calc(images, calculator=None, algo="BFGS", fmax=fmax,
                   steps=steps)
    wall = time.time() - t0
    barrier = max(neb.energies) - neb.energies[0]
    print(f"pure-base NEB: barrier {barrier:.3f} eV, "
          f"{n_calls['count']} base calls, converged={neb.converged}, "
          f"{wall:.0f}s")
    plot_path([(neb.images, neb.energies, f"Base ({n_calls['count']} calls)")],
              title="Pure base-calculator NEB", figname="dft_neb.png")
    return neb


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        main(sys.argv[1], sys.argv[2])
    else:
        main()
