"""Effective-medium-theory potential (Jacobsen-Stoltze-Norskov 1996),
JAX-native with autodiff forces.

The reference's quick-start workloads use ase.calculators.emt.EMT as the
cheap base calculator (examples/emt-serial.py:1-35).  This standalone
implementation uses the same published parameter table and functional form;
energies/forces are exact derivatives of one jitted energy function, and the
same code path can evaluate a whole batch of structures (e.g. all NEB
images) in a single device program.

If real ASE is importable, prefer ``ase.calculators.emt.EMT`` for bit-exact
parity with reference logs; this module is the self-contained equivalent.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..atoms.atoms import CHEMICAL_SYMBOLS
from ..atoms.neighborlist import neighbor_pairs
from .base import Calculator

BOHR = 0.5291772105638411
BETA = 1.809  # (16 pi / 3)^(1/3) / sqrt(2), rounded as in the literature

#                E0      s0     V0     eta2   kappa  lambda  n0
PARAMETERS = {
    "Al": (-3.28, 3.00, 1.493, 1.240, 2.000, 1.169, 0.00700),
    "Cu": (-3.51, 2.67, 2.476, 1.652, 2.740, 1.906, 0.00910),
    "Ag": (-2.96, 3.01, 2.132, 1.652, 2.790, 1.892, 0.00547),
    "Au": (-3.80, 3.00, 2.321, 1.674, 2.873, 2.182, 0.00703),
    "Ni": (-4.44, 2.60, 3.673, 1.669, 2.757, 1.948, 0.01030),
    "Pd": (-3.90, 2.87, 2.773, 1.818, 3.107, 2.155, 0.00688),
    "Pt": (-5.85, 2.90, 4.067, 1.812, 3.145, 2.192, 0.00802),
    "H": (-3.21, 0.71, 2.132, 1.892, 2.148, 1.434, 0.00547),
    "C": (-3.50, 1.81, 0.332, 1.652, 2.790, 1.892, 0.01322),
    "N": (-5.10, 1.88, 0.132, 1.652, 2.790, 1.892, 0.01222),
    "O": (-4.60, 1.95, 0.332, 1.652, 2.790, 1.892, 0.00850),
}


def _cutoff_params():
    maxseq = max(p[1] for p in PARAMETERS.values()) * BOHR
    rc = BETA * maxseq * 0.5 * (np.sqrt(3.0) + np.sqrt(4.0))
    rr = BETA * maxseq * np.sqrt(4.0)   # 4th-shell distance
    acut = np.log(9999.0) / (rr - rc)
    return rc, acut


RC, ACUT = _cutoff_params()
RC_LIST = RC + 0.5


@functools.lru_cache(maxsize=32)
def _element_table(symbols: tuple):
    """Per-element derived parameters in eV/Angstrom units."""
    rows = []
    for sym in symbols:
        if sym not in PARAMETERS:
            raise NotImplementedError(
                f"EMT has no parameters for element {sym!r} (available: "
                f"{sorted(PARAMETERS)}); use LennardJones or another "
                "base calculator for this species")
        E0, s0b, V0, eta2b, kappab, lamb, n0b = PARAMETERS[sym]
        s0 = s0b * BOHR
        eta2 = eta2b / BOHR
        kappa = kappab / BOHR
        lam = lamb / BOHR
        n0 = n0b / BOHR ** 3
        gamma1 = 0.0
        gamma2 = 0.0
        for i, n in enumerate([12, 6, 24]):
            r = s0 * BETA * np.sqrt(i + 1.0)
            x = n / (12.0 * (1.0 + np.exp(ACUT * (r - RC))))
            gamma1 += x * np.exp(-eta2 * (r - BETA * s0))
            gamma2 += x * np.exp(-kappa / BETA * (r - BETA * s0))
        rows.append([E0, s0, V0, eta2, kappa, lam, n0, gamma1, gamma2])
    return np.asarray(rows)


def _emt_energy(positions, pair_i, pair_j, offsets, pair_valid, table,
                type_idx, natoms: int):
    """Total EMT energy; differentiable w.r.t. positions.

    pair_* are a both-directions neighbour list within RC_LIST; offsets are
    the periodic image shift vectors (already in Cartesian).
    """
    E0 = table[:, 0][type_idx]
    s0 = table[:, 1][type_idx]
    V0 = table[:, 2][type_idx]
    eta2 = table[:, 3][type_idx]
    kappa = table[:, 4][type_idx]
    lam = table[:, 5][type_idx]
    n0 = table[:, 6][type_idx]
    gamma1 = table[:, 7][type_idx]
    gamma2 = table[:, 8][type_idx]

    d = positions[pair_j] + offsets - positions[pair_i]
    d2 = jnp.sum(d * d, axis=1)
    # guard BEFORE sqrt: padded pairs have d == 0 and sqrt'(0) = inf would
    # poison the gradients even under the jnp.where mask
    r = jnp.sqrt(jnp.where(pair_valid, d2, RC_LIST ** 2))
    theta = 1.0 / (1.0 + jnp.exp(ACUT * (r - RC)))
    theta = jnp.where(pair_valid, theta, 0.0)

    i, j = pair_i, pair_j
    ksi_ij = n0[j] / n0[i]
    # density contribution of j at i (interact1 sigma terms)
    sig_contrib = (jnp.exp(-eta2[j] * (r - BETA * s0[j]))
                   * ksi_ij * theta / gamma1[i])
    sigma1 = jax.ops.segment_sum(sig_contrib, i, num_segments=natoms)
    sigma1 = jnp.maximum(sigma1, 1e-12)

    ds = -jnp.log(sigma1 / 12.0) / (BETA * eta2)
    x = lam * ds
    E_c = E0 * ((1.0 + x) * jnp.exp(-x) - 1.0)
    E_as_atom = 6.0 * V0 * jnp.exp(-kappa * ds)

    # pair repulsion (each ordered pair carries the 0.5 V0_i ... term)
    pairE = (0.5 * V0[i] * jnp.exp(-kappa[j] * (r / BETA - s0[j]))
             * ksi_ij * theta / gamma2[i])
    E_pair = jnp.sum(pairE)

    return jnp.sum(E_c) + jnp.sum(E_as_atom) - E_pair


# jit OUTSIDE value_and_grad: an unjitted grad re-traces the backward
# pass as dozens of eager single-op programs on every base-calculator
# call (measured ~195 mini-compiles per on-the-fly NEB run)
_emt_energy_and_grad = functools.partial(
    jax.jit, static_argnames=("natoms",))(
        jax.value_and_grad(_emt_energy))


class EMT(Calculator):
    name = "emt"
    implemented_properties = ["energy", "forces"]

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        
    def calculate(self, atoms=None, properties=("energy", "forces"),
                  system_changes=None):
        numbers = np.asarray(atoms.numbers)
        symbols = tuple(sorted({CHEMICAL_SYMBOLS[z] for z in numbers}))
        table = _element_table(symbols)
        sym_index = {s: k for k, s in enumerate(symbols)}
        type_idx = np.asarray([sym_index[CHEMICAL_SYMBOLS[z]]
                               for z in numbers], np.int32)

        pi, pj, rij = neighbor_pairs(atoms, RC_LIST)
        positions = np.asarray(atoms.positions, float)
        offsets = rij - (positions[pj] - positions[pi])
        # pad pair axis to a bucket to bound recompilation
        from ..ops.packing import bucket_size
        P = len(pi)
        P_pad = bucket_size(max(P, 1), multiple=128)
        pad = P_pad - P
        pi_p = np.concatenate([pi, np.zeros(pad, int)]).astype(np.int32)
        pj_p = np.concatenate([pj, np.zeros(pad, int)]).astype(np.int32)
        off_p = np.concatenate([offsets, np.zeros((pad, 3))])
        valid = np.concatenate([np.ones(P, bool), np.zeros(pad, bool)])

        dt = config.dtype()
        args = (jnp.asarray(positions, dt), jnp.asarray(pi_p),
                jnp.asarray(pj_p), jnp.asarray(off_p, dt),
                jnp.asarray(valid), jnp.asarray(table, dt),
                jnp.asarray(type_idx))
        e, g = _emt_energy_and_grad(*args, natoms=len(numbers))
        self.results = {
            "energy": float(e),
            "free_energy": float(e),
            "forces": -np.asarray(g),
        }
        return self.results
