"""A minimal, standalone Atoms container.

The reference framework is an ASE add-on; this framework runs without ASE
(none of ase/pyxtal is required) but stays duck-type compatible with the
subset of the ase.Atoms API it uses, so real ASE objects can be passed in
anywhere ours are accepted.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

CHEMICAL_SYMBOLS = [
    "X", "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg",
    "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr",
    "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br", "Kr",
    "Rb", "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd",
    "In", "Sn", "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd",
    "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb", "Lu", "Hf",
    "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg", "Tl", "Pb", "Bi", "Po",
    "At", "Rn", "Fr", "Ra", "Ac", "Th", "Pa", "U", "Np", "Pu",
]
ATOMIC_NUMBERS = {s: z for z, s in enumerate(CHEMICAL_SYMBOLS)}

# Covalent-ish reference masses (amu) for the elements we care about; used
# only by dynamics-style drivers, not by the GPR math.
ATOMIC_MASSES = {
    "H": 1.008, "He": 4.0026, "C": 12.011, "N": 14.007, "O": 15.999,
    "Al": 26.9815, "Si": 28.085, "S": 32.06, "Ni": 58.693, "Cu": 63.546,
    "Pd": 106.42, "Ag": 107.868, "Pt": 195.084, "Au": 196.967,
}


def symbols_to_numbers(symbols) -> np.ndarray:
    out = []
    for s in symbols:
        if isinstance(s, (int, np.integer)):
            out.append(int(s))
        else:
            out.append(ATOMIC_NUMBERS[s])
    return np.asarray(out, dtype=np.int64)


class Cell:
    """3x3 cell with the handful of ASE Cell behaviours we rely on."""

    def __init__(self, array):
        self.array = np.asarray(array, dtype=float).reshape(3, 3)

    def __array__(self, dtype=None, copy=None):
        a = self.array
        if dtype is not None:
            a = a.astype(dtype)
        return np.array(a) if copy else a

    def __getitem__(self, idx):
        return self.array[idx]

    def __setitem__(self, idx, value):
        self.array[idx] = value

    def volume(self) -> float:
        return abs(np.linalg.det(self.array))

    def reciprocal_heights(self) -> np.ndarray:
        """Perpendicular heights of the cell (for image-count estimates)."""
        a = self.array
        vol = abs(np.linalg.det(a))
        if vol == 0:
            return np.zeros(3)
        heights = np.zeros(3)
        for i in range(3):
            cross = np.cross(a[(i + 1) % 3], a[(i + 2) % 3])
            heights[i] = vol / np.linalg.norm(cross)
        return heights


class Atoms:
    """Standalone structure container (positions in Angstrom)."""

    def __init__(self, symbols=None, positions=None, numbers=None,
                 cell=None, pbc=False, constraints=None, tags=None,
                 calc=None):
        if numbers is not None:
            self.numbers = np.asarray(numbers, dtype=np.int64)
        elif symbols is not None:
            if isinstance(symbols, str):
                symbols = _parse_formula(symbols)
            self.numbers = symbols_to_numbers(symbols)
        else:
            self.numbers = np.zeros(0, dtype=np.int64)
        n = len(self.numbers)
        if positions is None:
            positions = np.zeros((n, 3))
        self.positions = np.asarray(positions, dtype=float).reshape(n, 3)
        if cell is None:
            cell = np.zeros((3, 3))
        cell = np.asarray(cell, dtype=float)
        if cell.shape == (3,):
            cell = np.diag(cell)
        self.cell = Cell(cell)
        if isinstance(pbc, (bool, np.bool_)):
            pbc = [pbc] * 3
        self.pbc = np.asarray(pbc, dtype=bool)
        self.constraints = list(constraints or [])
        self.tags = (np.asarray(tags, dtype=np.int64)
                     if tags is not None else np.zeros(n, dtype=np.int64))
        self.calc = calc
        self.info = {}
        self.arrays = {}

    # -- basics ------------------------------------------------------------
    def __len__(self):
        return len(self.numbers)

    @property
    def symbols(self) -> List[str]:
        return [CHEMICAL_SYMBOLS[z] for z in self.numbers]

    def get_chemical_symbols(self):
        return self.symbols

    def get_atomic_numbers(self):
        return self.numbers.copy()

    def get_positions(self):
        return self.positions.copy()

    def set_positions(self, positions, apply_constraint: bool = True):
        positions = np.asarray(positions, float).reshape(len(self), 3)
        if apply_constraint:
            # ASE parity: constraints clamp position updates (ase
            # Atoms.set_positions -> constraint.adjust_positions); the
            # plain-calculator NEB/IDPP paths rely on this to keep
            # FixAtoms rows frozen
            for c in self.constraints:
                adj = getattr(c, "adjust_positions", None)
                if adj is not None:
                    adj(self, positions)
        self.positions = positions
        if self.calc is not None and hasattr(self.calc, "results"):
            self.calc.results = {}

    def get_cell(self):
        return self.cell.array.copy()

    def set_cell(self, cell):
        self.cell = Cell(cell)

    def get_volume(self) -> float:
        v = self.cell.volume()
        if v == 0:
            raise ValueError("zero-volume cell")
        return v

    def get_scaled_positions(self, wrap=True) -> np.ndarray:
        inv = np.linalg.inv(self.cell.array)
        sp = self.positions @ inv
        if wrap:
            for i in range(3):
                if self.pbc[i]:
                    sp[:, i] %= 1.0
        return sp

    def get_masses(self):
        return np.asarray(
            [ATOMIC_MASSES.get(CHEMICAL_SYMBOLS[z], float(z)) for z in
             self.numbers])

    def set_constraint(self, constraint=None):
        self.constraints = [] if constraint is None else [constraint]

    def center(self, vacuum=None, axis=(0, 1, 2)):
        if isinstance(axis, int):
            axis = (axis,)
        cell = self.cell.array
        for ax in axis:
            direction = cell[ax]
            norm = np.linalg.norm(direction)
            if norm == 0:
                continue
            unit = direction / norm
            proj = self.positions @ unit
            lo, hi = proj.min(), proj.max()
            if vacuum is not None:
                new_len = hi - lo + 2 * vacuum
                cell[ax] = unit * new_len
                norm = new_len
            shift = (norm - (hi - lo)) / 2.0 - lo
            self.positions += unit * shift
        self.cell = Cell(cell)

    def copy(self) -> "Atoms":
        new = Atoms(numbers=self.numbers.copy(),
                    positions=self.positions.copy(),
                    cell=self.cell.array.copy(),
                    pbc=self.pbc.copy(),
                    constraints=list(self.constraints),
                    tags=self.tags.copy())
        new.info = dict(self.info)
        return new

    def __add__(self, other: "Atoms") -> "Atoms":
        return Atoms(
            numbers=np.concatenate([self.numbers, other.numbers]),
            positions=np.vstack([self.positions, other.positions]),
            cell=self.cell.array.copy(), pbc=self.pbc.copy(),
            tags=np.concatenate([self.tags, other.tags]))

    # -- calculator protocol -------------------------------------------------
    def get_potential_energy(self) -> float:
        if self.calc is None:
            raise RuntimeError("no calculator attached")
        return self.calc.get_potential_energy(self)

    def get_forces(self, apply_constraint: bool = True) -> np.ndarray:
        if self.calc is None:
            raise RuntimeError("no calculator attached")
        forces = np.array(self.calc.get_forces(self), dtype=float,
                          copy=True)
        if apply_constraint:
            # ASE parity: ase Atoms.get_forces applies adjust_forces, so
            # FixAtoms rows read zero for ANY calculator (the GPR path
            # zeroes them itself; plain calculators rely on this)
            for c in self.constraints:
                adj = getattr(c, "adjust_forces", None)
                if adj is not None:
                    adj(self, forces)
        return forces

    def fixed_indices(self) -> np.ndarray:
        from .constraints import FixAtoms
        for c in self.constraints:
            if isinstance(c, FixAtoms):
                return np.asarray(c.get_indices(), dtype=int)
        return np.zeros(0, dtype=int)

    def set_calculator(self, calc):
        self.calc = calc

    @property
    def number_of_lattice_vectors(self) -> int:
        return int(np.sum(np.any(self.cell.array != 0, axis=1)))


def _parse_formula(formula: str):
    import re
    out = []
    for sym, count in re.findall(r"([A-Z][a-z]?)(\d*)", formula):
        if sym:
            out.extend([sym] * (int(count) if count else 1))
    return out
