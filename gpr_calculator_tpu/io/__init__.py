"""File IO: ASE-compatible trajectories (ULM), sqlite databases, POSCAR."""
from __future__ import annotations

from . import ase_db  # noqa
from .trajectory import Trajectory, TrajectoryWriter  # noqa


def read(filename, index=-1, format=None):
    """ASE-style read dispatch for the formats the framework uses."""
    name = str(filename)
    if format == "vasp" or name.endswith(("POSCAR", "CONTCAR", ".vasp")) \
            or "POSCAR" in name:
        from .vasp import read_vasp
        return read_vasp(name)
    if format in ("traj", None) and name.endswith(".traj"):
        from .ulm import read_traj
        frames = read_traj(name)
        if index == ":" or isinstance(index, slice):
            return frames
        return frames[index]
    if name.endswith(".db"):
        from .ase_db import read_db
        rows = read_db(name)
        atoms_list = [r["atoms"] for r in rows]
        if index == ":":
            return atoms_list
        return atoms_list[index]
    raise ValueError(f"unsupported file format: {filename}")
