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
    if format is None:
        if name.endswith(".traj"):
            format = "traj"
        elif name.endswith(".db"):
            format = "db"
        elif name.endswith(".vasp") or base.startswith(("POSCAR",
                                                        "CONTCAR")):
            format = "vasp"
    if format == "traj":
        from .ulm import read_traj
        frames = read_traj(name)
        if index == ":" or isinstance(index, slice):
            return frames
        return frames[index]
    if format == "db":
        from .ase_db import read_db
        rows = read_db(name)
        atoms_list = [r["atoms"] for r in rows]
        if index == ":":
            return atoms_list
        return atoms_list[index]
    if format == "vasp":
        from .vasp import read_vasp
        return read_vasp(name)
    raise ValueError(f"unsupported file format: {filename}")
