"""File IO: ASE-compatible trajectories (ULM), sqlite databases, POSCAR."""
from __future__ import annotations

from . import ase_db  # noqa
from .trajectory import Trajectory, TrajectoryWriter  # noqa


def read(filename, index=-1, format=None):
    """ASE-style read dispatch for the formats the framework uses.

    Explicit ``format`` wins; otherwise the extension decides, and the
    POSCAR/CONTCAR convention is checked against the BASENAME only (a
    directory named POSCAR_scan must not hijack a .traj read)."""
    import os as _os
    name = str(filename)
    base = _os.path.basename(name)
    if format == "traj" or (format is None and name.endswith(".traj")):
        pass     # fall through to the traj branch below
    elif format == "db" or (format is None and name.endswith(".db")):
        pass     # fall through to the db branch below
    elif format == "vasp" or (format is None and (
            name.endswith((".vasp",))
            or base.startswith(("POSCAR", "CONTCAR")))):
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
