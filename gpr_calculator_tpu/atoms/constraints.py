"""Constraints (the reference only ever uses FixAtoms,
gpr_calc/calculator.py:51-55, gaussianprocess.py:823-832)."""
from __future__ import annotations

import numpy as np


class FixAtoms:
    def __init__(self, indices=None, mask=None):
        if mask is not None:
            indices = np.nonzero(np.asarray(mask, bool))[0]
        self.index = np.asarray(indices if indices is not None else [],
                                dtype=int)

    def get_indices(self):
        return self.index

    def adjust_forces(self, atoms, forces):
        forces[self.index] = 0.0

    def adjust_positions(self, atoms, newpositions):
        newpositions[self.index] = atoms.positions[self.index]

    def todict(self):
        return {"name": "FixAtoms", "kwargs": {"indices":
                                               self.index.tolist()}}
