"""Coverage for autosave, atoms utilities and constraint round-trips."""
import os

import numpy as np

from gpr_calculator_tpu import Atoms, EMT, FixAtoms, GP, GPR, RBF
from gpr_calculator_tpu.ops.so3 import SO3

from test_gp import make_structs


def test_gpr_autosave_and_reload(tmp_path, monkeypatch):
    """The dispatcher autosaves {tag}-gpr.{json,db} on refit
    (calculator.py:106-107) and the artifact reloads."""
    monkeypatch.chdir(tmp_path)
    structs = make_structs(n=3, natoms=5, seed=81)
    base = EMT()
    gp = GP(kernel=RBF(para=[1.0, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.01, noise_f=0.1, log_file=str(tmp_path / "a.log"))
    for s in structs[:2]:
        gp.add_structure((s, base.get_potential_energy(s),
                          base.get_forces(s)))
    gp.fit(show=False, opt=False)
    calc = GPR(base=base, ff=gp, save=True, tag="auto", freq=1)
    calc.verbose = False
    # drive enough base-path dispatches to trigger refit + autosave
    calc.force_base = True
    rng = np.random.RandomState(5)
    for s in structs:
        a = s.copy()
        a.positions += 0.05 * rng.randn(*a.positions.shape)
        a.calc = calc
        a.get_potential_energy()
        if os.path.exists("auto-gpr.json"):
            break
    assert os.path.exists("auto-gpr.json") and os.path.exists("auto-gpr.db")
    gp2 = GP.load("auto-gpr.json", log_file=str(tmp_path / "b.log"))
    gp2.fit(show=False, opt=False)
    E1, F1, _ = gp.predict_structure(structs[0])
    E2, F2, _ = gp2.predict_structure(structs[0])
    np.testing.assert_allclose(E1, E2, rtol=1e-6)


def test_atoms_utilities():
    a = Atoms("H2O", positions=[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
              cell=np.eye(3) * 5)
    assert a.symbols == ["H", "H", "O"]
    b = a + a
    assert len(b) == 6
    a.center(vacuum=2.0)
    assert a.get_volume() > 0
    sp = a.get_scaled_positions(wrap=False)
    assert sp.shape == (3, 3)


def test_fixatoms_roundtrip_through_db(tmp_path):
    from gpr_calculator_tpu.io.ase_db import write_db, read_db
    a = Atoms(numbers=[29] * 4,
              positions=np.random.RandomState(0).rand(4, 3) * 3,
              cell=np.eye(3) * 8, pbc=True,
              constraints=[FixAtoms(indices=[0, 2])])
    f = str(tmp_path / "c.db")
    write_db(f, [{"atoms": a, "data": {"energy": 1.0,
                                       "force": np.zeros((4, 3)),
                                       "energy_in": True,
                                       "force_in": [1]}}])
    row = read_db(f)[0]
    assert list(row["atoms"].fixed_indices()) == [0, 2]
    np.testing.assert_allclose(row["atoms"].positions, a.positions)


def test_mic_displacement():
    from gpr_calculator_tpu.mep import find_mic
    cell = np.eye(3) * 10.0
    d = np.array([[9.0, 0.2, 0.0]])
    dm, dist = find_mic(d, cell, np.array([True] * 3))
    np.testing.assert_allclose(dm[0], [-1.0, 0.2, 0.0])
    assert abs(dist[0] - np.sqrt(1.04)) < 1e-12


def test_ulm_writer_direct_append_keeps_frames(tmp_path):
    """Bare UlmWriter mode='a' must keep prior frames (round-1 ADVICE:
    the old writer silently dropped them unless wrapped)."""
    import os
    from gpr_calculator_tpu.io.ulm import UlmWriter, read_traj
    from gpr_calculator_tpu.atoms import Atoms
    fn = str(tmp_path / "append.traj")
    a = Atoms(numbers=[29, 29], positions=np.eye(3)[:2],
              cell=np.eye(3) * 5, pbc=True)
    w = UlmWriter(fn, "w")
    w.write(a)
    w.close()
    size1 = os.path.getsize(fn)
    b = a.copy()
    b.positions = b.positions + 1.0
    w2 = UlmWriter(fn, "a")
    w2.write(b)
    w2.close()
    frames = read_traj(fn)
    assert len(frames) == 2
    np.testing.assert_allclose(frames[0].positions, a.positions)
    np.testing.assert_allclose(frames[1].positions, b.positions)
    # incremental: appending one frame must not double the data region
    assert os.path.getsize(fn) < 2 * size1


def test_update_y_train_parity():
    """y_train column vector matches the reference layout
    (gaussianprocess.py:472-488: energies first, then 3 rows/force pt)."""
    import sys
    sys.path.insert(0, "tests")
    from test_gp import make_structs
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.0, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.01, noise_f=0.1, log_file="/tmp/yt.log")
    for s in make_structs(n=2, natoms=4, seed=91):
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    y = gp.update_y_train()
    assert y.shape == (gp.N_energy + 3 * gp.N_forces, 1)
    np.testing.assert_allclose(y[:gp.N_energy, 0],
                               gp._energy_y[:gp.N_energy])
    np.testing.assert_allclose(
        y[gp.N_energy:, 0],
        np.asarray(gp._force_y[:gp.N_forces]).reshape(-1))


def test_db_roundtrip_atoms_are_mutable():
    """read_db structures must be writable (frombuffer views are
    read-only): get_images' vacuum adjustment and Atoms.center mutate
    positions/cell in place."""
    import os
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.io.ase_db import read_db, write_db

    a = Atoms(numbers=[29, 29], positions=[[0, 0, 0], [1.2, 0, 0]],
              cell=np.eye(3) * 8, pbc=True)
    path = "/tmp/mut_rt.db"
    if os.path.exists(path):
        os.remove(path)
    write_db(path, [{"atoms": a}])
    b = read_db(path)[0]["atoms"]
    b.positions += 0.1          # raises ValueError on a read-only view
    b.cell[2, 2] += 1.0
    b.center()


def test_fixed_indices_unions_multiple_fixatoms():
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms

    a = Atoms(numbers=[29] * 5, positions=np.random.rand(5, 3),
              cell=np.eye(3) * 8, pbc=False)
    a.constraints = [FixAtoms(indices=[0, 1]), FixAtoms(indices=[3])]
    np.testing.assert_array_equal(a.fixed_indices(), [0, 1, 3])


def test_atoms_add_preserves_constraints():
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms

    slab = Atoms(numbers=[29] * 4, positions=np.random.rand(4, 3),
                 cell=np.eye(3) * 8, pbc=True,
                 constraints=[FixAtoms(indices=[0, 1])])
    ads = Atoms(numbers=[8], positions=[[1, 1, 3]], cell=np.eye(3) * 8,
                pbc=True)
    combo = slab + ads
    np.testing.assert_array_equal(combo.fixed_indices(), [0, 1])


def test_vasp_roundtrip_preserves_fixatoms(tmp_path):
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms
    from gpr_calculator_tpu.io.vasp import read_vasp, write_vasp

    a = Atoms(numbers=[29, 29, 79], positions=np.random.rand(3, 3) + 1,
              cell=np.eye(3) * 9, pbc=True,
              constraints=[FixAtoms(indices=[0, 2])])
    path = str(tmp_path / "POSCAR")
    write_vasp(path, a)
    b = read_vasp(path)
    np.testing.assert_array_equal(b.fixed_indices(), [0, 2])


def test_read_dispatch_not_hijacked_by_poscar_dirname(tmp_path):
    """A directory named POSCAR_* must not force the VASP reader onto a
    .traj file."""
    import os
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.io import read
    from gpr_calculator_tpu.io.trajectory import TrajectoryWriter

    d = tmp_path / "POSCAR_scan"
    os.makedirs(d)
    path = str(d / "chain.traj")
    w = TrajectoryWriter(path, mode="w")
    a = Atoms(numbers=[29], positions=[[0, 0, 0]], cell=np.eye(3) * 8,
              pbc=True)
    w.write(a)
    w.close()
    frames = read(path, index=":")
    assert len(frames) == 1 and frames[0].numbers[0] == 29


def test_read_explicit_format_wins_over_extension(tmp_path):
    """read(path, format='traj') must honor the explicit format even
    when the filename extension disagrees (io/__init__.py docstring)."""
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.io import read
    from gpr_calculator_tpu.io.trajectory import TrajectoryWriter

    path = str(tmp_path / "snapshot.ulm")
    w = TrajectoryWriter(path, mode="w")
    a = Atoms(numbers=[29], positions=[[0, 0, 0]], cell=np.eye(3) * 8,
              pbc=True)
    w.write(a)
    w.close()
    frames = read(path, index=":", format="traj")
    assert len(frames) == 1 and frames[0].numbers[0] == 29


def test_set_positions_does_not_mutate_source():
    """set_positions on a constrained Atoms must not write the old
    fixed coordinates back into the CALLER's array, nor alias it."""
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms

    a = Atoms(numbers=[29, 29], positions=[[0, 0, 0], [2, 0, 0]])
    a.set_constraint(FixAtoms(indices=[0]))
    b = Atoms(numbers=[29, 29], positions=[[1, 1, 1], [3, 1, 1]])
    src = b.positions
    before = src.copy()
    a.set_positions(src)
    np.testing.assert_array_equal(src, before)      # caller untouched
    assert a.positions is not src                   # no aliasing
    # fixed row kept a's old coordinate, free row took b's
    np.testing.assert_array_equal(a.positions[0], [0, 0, 0])
    np.testing.assert_array_equal(a.positions[1], [3, 1, 1])


def test_freeze_unfreeze_nesting_preserves_outer_freeze():
    """A paired freeze/unfreeze inside a reporting helper must not
    cancel the caller's own freeze, nor clobber pre-freeze state."""
    from gpr_calculator_tpu.calculator import GPR

    calc = GPR(base=None, ff=None)
    calc.update_gpr = False                 # caller's deliberate state
    calc.freeze()                           # caller freezes
    calc.freeze()                           # helper freezes...
    calc.unfreeze()                         # ...and unfreezes
    assert calc.allow_base is False         # still frozen for caller
    assert calc.update_gpr is False
    calc.unfreeze()                         # caller unfreezes
    assert calc.allow_base is True
    assert calc.update_gpr is False         # pre-freeze state restored
    calc.unfreeze()                         # extra unfreeze: harmless
    assert calc.allow_base is True


def test_neighbor_pairs_empty_structure():
    """Zero-atom structures must return empty pair arrays (the chunked
    NumPy fallback used to np.concatenate an empty list)."""
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.neighborlist import _numpy_pairs

    i, j, rij = _numpy_pairs(np.zeros((0, 3)), np.eye(3) * 8,
                             np.array([True] * 3), 4.0)
    assert i.shape == (0,) and j.shape == (0,) and rij.shape == (0, 3)


def test_pack_energy_rejects_width_mismatch():
    """pack_energy must fail loudly on a descriptor-width mismatch like
    pack_force does (it used to silently overwrite the declared d)."""
    import numpy as np
    import pytest
    from gpr_calculator_tpu.ops.packing import pack_energy

    pts = [(np.zeros((2, 12)), np.zeros(2, int))]
    with pytest.raises(AssertionError, match="descriptor width"):
        pack_energy(pts, d=30)


def test_write_db_timestamps_in_ase_units(tmp_path):
    """ASE stores ctime/mtime as years since 2000, not Unix seconds
    (ase.db.core.now()); rows written in seconds show absurd ages in
    real ASE tooling."""
    import sqlite3
    import time

    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.io.ase_db import write_db

    a = Atoms(numbers=[29], positions=[[0, 0, 0]], cell=np.eye(3) * 8,
              pbc=True)
    path = str(tmp_path / "t.db")
    write_db(path, [{"atoms": a, "data": {"energy": -1.0,
                                          "force": np.zeros((1, 3))}}])
    (ctime,) = sqlite3.connect(path).execute(
        "SELECT ctime FROM systems").fetchone()
    now_ase = (time.time() - 946681200.0) / 31557600.0
    assert abs(ctime - now_ase) < 0.01, ctime   # ~3.5 days of slack


def test_convert_struc_keeps_none_stress(tmp_path):
    """Energy/forces-only rows must yield stress=None, not a
    dtype=object scalar array (same guard as get_train_data)."""
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.io.ase_db import write_db
    from gpr_calculator_tpu.ops.so3 import SO3
    from gpr_calculator_tpu.utils import convert_struc

    a = Atoms(numbers=[29, 29], positions=[[0, 0, 0], [2.5, 0, 0]],
              cell=np.eye(3) * 8, pbc=True)
    path = str(tmp_path / "s.db")
    write_db(path, [{"atoms": a, "data": {"energy": -1.0,
                                          "force": np.zeros((2, 3))}}])
    _, train_Y, _ = convert_struc(path, SO3(nmax=2, lmax=1, rcut=4.0),
                                  stress=True)
    assert train_Y["stress"] == [None]
