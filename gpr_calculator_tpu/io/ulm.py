"""Minimal ASE-ULM ("- of Ulm") trajectory reader/writer, ASE-free.

Layout (reverse-engineered against ase.io.ulm v3 files):
  header : 8B magic '- of Ulm' + 16B tag + int64 {version, nitems, pos0}
  pos0   : int64 offsets[nitems]
  item   : int64 json_len + JSON; arrays appear as
           {"ndarray": [shape, dtype, absolute_offset]} and the owning key
           carries a '.' suffix.  Frames after the first are delta-encoded
           (only changed keys), inheriting the rest from frame 0.
"""
from __future__ import annotations

import json
import os
from typing import List

import numpy as np

MAGIC = b"- of Ulm"
TAG = b"ASE-Trajectory  "


def _resolve(obj, buf: bytes):
    if isinstance(obj, dict):
        if "ndarray" in obj and isinstance(obj["ndarray"], list):
            shape, dtype, off = obj["ndarray"]
            count = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(buf, dtype=np.dtype(dtype), count=count,
                                offset=off)
            return arr.reshape(shape).copy()
        return {k.rstrip("."): _resolve(v, buf) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve(v, buf) for v in obj]
    return obj


def read_ulm_items(filename: str) -> List[dict]:
    with open(filename, "rb") as fh:
        buf = fh.read()
    if buf[:8] != MAGIC:
        raise ValueError(f"{filename} is not a ULM file")
    version, nitems, pos0 = np.frombuffer(buf[24:48], np.int64)
    offsets = np.frombuffer(buf, np.int64, count=int(nitems),
                            offset=int(pos0))
    items = []
    for off in offsets:
        n = int(np.frombuffer(buf, np.int64, count=1, offset=int(off))[0])
        raw = json.loads(buf[off + 8:off + 8 + n].decode())
        items.append(_resolve(raw, buf))
    return items


def read_traj(filename: str) -> List:
    """Return a list of Atoms frames (delta-encoding merged)."""
    from ..atoms.atoms import Atoms
    from ..atoms.constraints import FixAtoms

    items = read_ulm_items(filename)
    frames = []
    state: dict = {}
    for item in items:
        state = {**state, **item}
        numbers = np.asarray(state["numbers"])
        positions = np.asarray(state["positions"], float)
        cell = np.asarray(state.get("cell", np.zeros((3, 3))), float)
        pbc = np.asarray(state.get("pbc", [False] * 3), bool)
        cons = []
        raw_c = state.get("constraints")
        if raw_c:
            lst = json.loads(raw_c) if isinstance(raw_c, str) else raw_c
            for c in lst:
                if c.get("name") == "FixAtoms":
                    cons.append(FixAtoms(indices=c["kwargs"].get("indices")))
        atoms = Atoms(numbers=numbers, positions=positions, cell=cell,
                      pbc=pbc, constraints=cons,
                      tags=state.get("tags"))
        calc = state.get("calculator")
        if isinstance(calc, dict) and "energy" in calc:
            atoms.info["energy"] = calc.get("energy")
            if "forces" in calc:
                atoms.info["forces"] = np.asarray(calc["forces"])
        frames.append(atoms)
    return frames


class UlmWriter:
    """Append-style ULM trajectory writer (full data per frame -- readable
    by ase.io.read)."""

    def __init__(self, filename: str, mode: str = "w"):
        self.filename = filename
        if mode == "a" and os.path.exists(filename):
            # re-read existing frames and rewrite (simple + correct)
            try:
                self._frames = read_ulm_items(filename)
            except Exception:
                self._frames = []
        else:
            self._frames = []
        self._atoms_frames: List = []
        # materialised lazily on close/flush
        self._pending: List[dict] = []

    def write(self, atoms):
        self._atoms_frames.append(atoms.copy())
        self._flush()

    def _flush(self):
        parts = []
        pos = 48  # header size
        offsets = []
        blobs = []

        def put_array(arr):
            nonlocal pos
            arr = np.ascontiguousarray(arr)
            pad = (-pos) % 8
            if pad:
                blobs.append(b"\0" * pad)
                pos += pad
            off = pos
            b = arr.tobytes()
            blobs.append(b)
            pos += len(b)
            return {"ndarray": [list(arr.shape), arr.dtype.name, off]}

        items_json = []
        for atoms in self._atoms_frames:
            item = {}
            item["pbc"] = [bool(b) for b in atoms.pbc]
            item["numbers."] = put_array(np.asarray(atoms.numbers,
                                                    np.int64))
            item["positions."] = put_array(np.asarray(atoms.positions,
                                                      np.float64))
            item["cell"] = np.asarray(atoms.cell).tolist()
            fixed = (atoms.fixed_indices()
                     if hasattr(atoms, "fixed_indices") else [])
            if len(fixed):
                item["constraints"] = json.dumps([{
                    "name": "FixAtoms",
                    "kwargs": {"indices": [int(i) for i in fixed]}}])
            if atoms.info.get("energy") is not None:
                calc = {"name": "unknown", "parameters": {},
                        "energy": float(atoms.info["energy"])}
                if atoms.info.get("forces") is not None:
                    calc["forces."] = put_array(
                        np.asarray(atoms.info["forces"], np.float64))
                item["calculator."] = calc
            j = json.dumps(item).encode()
            pad = (-pos) % 8
            if pad:
                blobs.append(b"\0" * pad)
                pos += pad
            offsets.append(pos)
            blobs.append(np.int64(len(j)).tobytes())
            blobs.append(j)
            pos += 8 + len(j)
            pad2 = (-pos) % 8
            if pad2:
                blobs.append(b"\0" * pad2)
                pos += pad2
            items_json.append(item)

        pos0 = pos
        header = (MAGIC + TAG
                  + np.asarray([3, len(offsets), pos0],
                               np.int64).tobytes())
        with open(self.filename, "wb") as fh:
            fh.write(header)
            for b in blobs:
                fh.write(b)
            fh.write(np.asarray(offsets, np.int64).tobytes())

    def close(self):
        self._flush()
