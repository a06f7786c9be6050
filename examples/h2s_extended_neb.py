"""Surface-reaction NEB for the full H2S-extended family (8 workloads).

Parameterised equivalent of the reference's examples/H2S-extended/*/
gp_neb.py tree: {Ag, Au, Cu, Pt} x {H2S-dissociation, HS-dissociation},
39-atom metal slabs with selective dynamics, where the force-force block
dominates the covariance.  The reference ships eight near-identical
scripts; here one driver covers all eight:

    python h2s_extended_neb.py Au H2S-dissociation
    python h2s_extended_neb.py --all            # every configuration
    GPR_KERNEL=Dot python h2s_extended_neb.py Cu HS-dissociation

VASP supplies ground truth when configured (ASE_VASP_COMMAND /
VASP_PP_PATH); otherwise the run falls back to EMT so the workload is
exercisable anywhere (the reference's scripts hard-require a cluster).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import os
import sys

from gpr_calculator_tpu import GP, GPR, get_images, neb_calc, plot_path
from gpr_calculator_tpu.utils import reserve_host_cores

METALS = ("Ag", "Au", "Cu", "Pt")
REACTIONS = ("H2S-dissociation", "HS-dissociation")
POSCAR_ROOT = os.environ.get(
    "H2S_POSCAR_ROOT", "/root/reference/examples/H2S-extended")
NUM_IMAGES = 7
NOISE_E, NOISE_F = 0.03, 0.05       # reference defaults (gp_neb.py)
KERNEL = os.environ.get("GPR_KERNEL", "RBF")


def make_base_calculator():
    """VASP when the environment provides it; otherwise a Lennard-Jones
    stand-in (EMT has no sulfur parameters)."""
    if os.environ.get("ASE_VASP_COMMAND") and os.environ.get("VASP_PP_PATH"):
        from gpr_calculator_tpu.calculators import get_vasp
        ncpu = reserve_host_cores(n_reserved=4)
        os.environ.setdefault("ASE_VASP_NCPU", str(ncpu))
        return get_vasp(kpts=[2, 2, 1])
    from gpr_calculator_tpu.calculators import LennardJones
    return LennardJones({"rc": 5.0, "sigma": 2.3, "epsilon": 0.3})


def run(metal: str, reaction: str, steps: int = 1000):
    folder = os.path.join(POSCAR_ROOT, metal, reaction)
    init = os.path.join(folder, "POSCAR_initial")
    final = os.path.join(folder, "POSCAR_final")
    tag = f"h2s_{metal}_{reaction.split('-')[0]}_{KERNEL}"
    traj = f"{tag}-neb.traj"

    images = get_images(init, final, NUM_IMAGES, traj=traj,
                        IDPP=True, mic=True)
    base = make_base_calculator()
    # keep noise_e off the floor for big cells (gp_neb.py noise guard)
    noise_e = max(0.0004, NOISE_E / len(images[0]))
    gp = GP.set_GPR(images, base, kernel=KERNEL, noise_e=noise_e,
                    noise_f=NOISE_F, json_file=f"{tag}-gpr.json")
    calc = GPR(base=base, ff=gp, tag=tag, freq=10)

    neb = neb_calc(images, calc, algo="FIRE", fmax=NOISE_F, steps=steps,
                   climb=True, traj=traj)
    barrier = max(neb.energies) - neb.energies[0]
    print(f"{metal}/{reaction}: barrier {barrier:.3f} eV, "
          f"base/surrogate = {gp.use_base}/{gp.use_surrogate}, "
          f"converged={neb.converged}")
    label = f"GPR ({gp.use_base}/{gp.use_surrogate})"
    plot_path([(neb.images, neb.energies, label)],
              title=f"{reaction} on {metal}(100)",
              figname=f"{tag}-neb.png")
    return neb


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--all":
        for metal in METALS:
            for reaction in REACTIONS:
                run(metal, reaction)
    else:
        metal = args[0] if len(args) > 0 else "Au"
        reaction = args[1] if len(args) > 1 else "H2S-dissociation"
        if metal not in METALS or reaction not in REACTIONS:
            raise SystemExit(f"usage: h2s_extended_neb.py "
                             f"[{'|'.join(METALS)}] [{'|'.join(REACTIONS)}]")
        run(metal, reaction)
