"""NEB workload driver (parity with gpr_calc/NEB.py).

neb_calc / get_images / plot_path / plot_progress with the same contracts:
per-image calculator copies, only image 1 updates the GP (NEB.py:40-47),
endpoint energies pinned to stored training energies (NEB.py:64-74), and
optional base-calculator re-evaluation of the converged path.
"""
from __future__ import annotations

import os
from copy import copy
from typing import List, Optional

import numpy as np

from .mep import NEB, find_mic
from .optimize import BFGS, FIRE


class OnTheFlyBatchedNEB(NEB):
    """NEB whose interior images are evaluated by ONE batched GPR device
    program per optimizer step, with the reference's per-image dispatch
    semantics (calculator.py:63-104): uncertain images fall back to the
    base calculator, feed the training set, and trigger the refit cadence.
    """

    def __init__(self, images, gp, base, k=0.1, climb=False, freq=10,
                 verbose=True):
        super().__init__(images, k=k, climb=climb)
        self.gp = gp
        self.base = base
        self.freq = freq
        self.verbose = verbose
        # pin endpoint energies to the stored training labels (the first
        # and last images are the first/last entries of train_images)
        n_at = len(images[0])
        self.energies[0] = gp.train_y["energy"][0] * n_at
        self.energies[-1] = gp.train_y["energy"][len(images) - 1] * n_at

    def _interior_results(self):
        interior = self.images[1:-1]
        preds = self.gp.predict_structures(interior, return_std=True)
        f_tol = 1.2 * self.gp.noise_f
        energies, forces = [], []
        for image, (E, F, E_std, F_std) in zip(interior, preds):
            Fmax = float(np.abs(F).max())
            f_ref = max(f_tol, Fmax / 2.5)
            if not (F_std < f_ref).all():
                self.gp.use_base += 1
                prev = image.calc
                image.calc = self.base
                eng = image.get_potential_energy()
                frc = image.get_forces().copy()
                fixed = image.fixed_indices()
                if len(fixed):
                    frc[np.asarray(fixed, int)] = 0.0
                image.calc = prev
                if self.verbose:
                    print(f"From Base model E: {float(E_std):.3f}/"
                          f"{E:.3f}/{eng:.3f}, F: {float(F_std.max()):.3f}"
                          f"/{Fmax:.3f}/{np.abs(frc).max():.3f}")
                self.gp.add_structure((image.copy(), eng, frc))
                energies.append(eng)
                forces.append(frc)
            else:
                self.gp.use_surrogate += 1
                if self.verbose:
                    print(f"From Surrogate  E: {float(E_std):.3f}/"
                          f"{E:.3f}, F: {float(F_std.max()):.3f}"
                          f"/{f_tol:.3f}/{Fmax:.3f}")
                energies.append(E)
                forces.append(F)
        freq = (max(2, self.freq // 2) if self.gp.N_forces > 100
                else self.freq)
        if self.gp.N_queue > freq or self.gp.N_energy_queue >= 2:
            self.gp.fit(opt=True, show=False, maxiter=10)
            self.gp.validate_data(show=True)
        return energies, forces


def neb_calc(images, calculator=None, algo: str = "BFGS",
             fmax: float = 0.05, steps: int = 100, k: float = 0.1,
             climb: bool = False, traj: Optional[str] = None,
             use_ref: bool = False, batched: bool = False):
    """Run an NEB relaxation; returns the NEB object (and reference
    energies when use_ref).  batched=True evaluates every interior image
    in one device program per step (requires a GPR calculator)."""
    if batched and getattr(calculator, "name", "") == "gpr":
        neb = OnTheFlyBatchedNEB(
            images, gp=calculator.parameters.ff,
            base=calculator.parameters.base, k=k, climb=climb,
            freq=getattr(calculator, "freq", 10),
            verbose=getattr(calculator, "verbose", True))
        if algo == "BFGS":
            opt = BFGS(neb, trajectory=traj, append_trajectory=True)
        else:
            opt = FIRE(neb, trajectory=traj)
        opt.run(fmax=fmax, steps=steps)
        neb.nsteps = opt.nsteps + 1
        neb.converged = opt.converged()
        return neb

    neb = NEB(images, k=k, climb=climb)
    if calculator is not None:
        for i, image in enumerate(images):
            image.calc = copy(calculator)
            if getattr(calculator, "name", "") == "gpr":
                image.calc.update_gpr = (i == 1)

    if algo == "BFGS":
        opt = BFGS(neb, trajectory=traj, append_trajectory=True)
    elif algo == "FIRE":
        opt = FIRE(neb, trajectory=traj)
    else:
        raise ValueError("Invalid algorithm for NEB calculation")
    opt.run(fmax=fmax, steps=steps)
    neb.nsteps = opt.nsteps + 1
    neb.converged = opt.converged()

    for i, image in enumerate(images):
        if getattr(image.calc, "name", "") == "gpr":
            if i in (0, len(images) - 1):
                gp = image.calc.parameters.ff
                neb.energies[i] = gp.train_y["energy"][i] * len(image)
            else:
                image.calc.freeze()
                neb.energies[i] = image.get_potential_energy()
                image.calc.unfreeze()
        else:
            neb.energies[i] = image.get_potential_energy()

    if use_ref:
        ref_engs = []
        for i, image in enumerate(images):
            if i in (0, len(images) - 1):
                ref_engs.append(neb.energies[i])
            else:
                image.calc.results = {}
                image.calc.force_base = True
                ref_engs.append(image.get_potential_energy())
                image.calc.force_base = False
        return neb, ref_engs
    return neb


def get_images(init, final, num_images: int = 5, vaccum: float = 0.0,
               traj: Optional[str] = None, IDPP: bool = False,
               mic: bool = False, apply_constraint: bool = False):
    """Build the initial image chain (NEB.py:92-138), restarting from the
    trajectory tail when available."""
    from .io import read

    if traj is not None and os.path.exists(traj):
        images = read(traj, index=":")[-num_images:]
        return images

    initial = read(init) if isinstance(init, str) else init.copy()
    final = read(final) if isinstance(final, str) else final.copy()

    if initial.pbc[-1] and vaccum > 0:
        for atoms in (initial, final):
            atoms.cell[2, 2] += vaccum
            atoms.center()
            atoms.pbc = np.array([True, True, True])

    images = [initial] + [initial.copy() for _ in range(num_images - 2)] \
        + [final]
    neb = NEB(images)
    neb.interpolate(method="idpp" if IDPP else "linear", mic=mic,
                    apply_constraint=apply_constraint)
    return images


def plot_path(data, unit="eV", fontsize=15, figname="neb_path.png",
              title="NEB Path", max_yticks=8, x_scale=False):
    """Plot one or more NEB paths (NEB.py:140-191)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.ticker import MaxNLocator
    from scipy.interpolate import make_interp_spline

    plt.figure(figsize=(8, 6))
    for (images, Y, label) in data:
        tmp = np.array([image.positions for image in images])
        X = np.zeros(len(images))
        for i in range(len(tmp) - 1):
            d = tmp[i + 1] - tmp[i]
            d, _ = find_mic(d, images[0].get_cell(), images[0].pbc)
            X[i + 1] = np.linalg.norm(d)
        X = np.cumsum(X)
        if x_scale:
            X /= X[-1]
        X_smooth = np.linspace(X.min(), X.max(), 30)
        spline = make_interp_spline(X, Y, k=3,
                                    bc_type=([(1, 0.0)], [(1, 0.0)]))
        line, = plt.plot(X, Y, "o")
        plt.plot(X_smooth, spline(X_smooth), ls="--", label=label,
                 color=line.get_color())

    x1, x2 = plt.xlim()
    plt.xlim(x1, x2 * 1.1)
    plt.gca().yaxis.set_major_locator(MaxNLocator(max_yticks))
    plt.xlabel("Reaction Coordinates", fontsize=fontsize)
    plt.ylabel(f"Energy ({unit})", fontsize=fontsize)
    plt.title(title, fontsize=fontsize * 1.1)
    plt.legend(fontsize=fontsize, frameon=False, loc=1)
    plt.tight_layout()
    plt.savefig(figname, dpi=300)
    plt.close()


def plot_progress(trajectory, calc, N_images, start=0, interval=50,
                  figname="neb-process.png"):
    """Parse NEB convergence from a trajectory (NEB.py:194-233)."""
    from .io import read

    traj = read(trajectory, index=":")
    N_max = len(traj) // N_images
    data = []
    for step in range(start, N_max, interval):
        print(f"Processing step {step} of {N_max}")
        images = traj[step * N_images:(step + 1) * N_images]
        engs = []
        for i, image in enumerate(images):
            if i in (0, len(images) - 1):
                eng = calc.parameters.ff.train_y["energy"][i] * len(image)
            else:
                image.calc = calc
                eng = image.get_potential_energy()
            engs.append(eng)
        data.append((images, engs, f"NEB_iter_{step}"))
    plot_path(data, figname=figname)
