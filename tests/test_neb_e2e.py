"""End-to-end NEB workloads: the emt-serial.py equivalent (reference
examples/emt-serial.py:1-35) on the bundled Au-on-Al(100) trajectory files,
comparing the pure-EMT path with the on-the-fly GPR surrogate path."""
import numpy as np
import pytest

from gpr_calculator_tpu import (EMT, GP, GPR, get_images, neb_calc)
from gpr_calculator_tpu.io import read

INIT = "/root/reference/examples/database/initial.traj"
FINAL = "/root/reference/examples/database/final.traj"


def test_read_bundled_traj():
    initial = read(INIT)
    final = read(FINAL)
    assert len(initial) == 13 and len(final) == 13
    assert initial.symbols.count("Au") == 1
    assert len(initial.fixed_indices()) == 8
    # relaxed structures: stored EMT energy present
    assert "energy" in initial.info


def test_traj_roundtrip(tmp_path):
    from gpr_calculator_tpu.io.trajectory import TrajectoryWriter
    initial = read(INIT)
    f = str(tmp_path / "out.traj")
    w = TrajectoryWriter(f)
    w.write(initial)
    frames = read(f, index=":")
    assert len(frames) == 1
    np.testing.assert_allclose(frames[0].positions, initial.positions)
    np.testing.assert_array_equal(frames[0].numbers, initial.numbers)
    assert list(frames[0].fixed_indices()) == list(initial.fixed_indices())


@pytest.fixture(scope="module")
def emt_neb():
    images = get_images(INIT, FINAL, num_images=5)
    neb = neb_calc(images, EMT(), fmax=0.05, steps=150)
    return neb


def test_pure_emt_neb_converges(emt_neb):
    neb = emt_neb
    assert neb.converged
    barrier = max(neb.energies) - neb.energies[0]
    # Au hollow-hollow diffusion on Al(100) with EMT: ~0.4 eV (ASE tutorial)
    assert 0.1 < barrier < 1.0, barrier


@pytest.mark.slow
def test_gpr_neb_matches_emt_barrier(emt_neb, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    images = get_images(INIT, FINAL, num_images=5)
    gp = GP.set_GPR(images, EMT(),
                    noise_e=0.05 / len(images[0]), noise_f=0.05,
                    log_file=str(tmp_path / "gpr.log"))
    calc = GPR(base=EMT(), ff=gp, save=False)
    neb = neb_calc(images, calc, fmax=0.05, steps=150, climb=False)

    barrier_ref = max(emt_neb.energies) - emt_neb.energies[0]
    barrier_gpr = max(neb.energies) - neb.energies[0]
    print(f"\nEMT barrier {barrier_ref:.4f} eV, GPR {barrier_gpr:.4f} eV, "
          f"base/surrogate: {gp.use_base}/{gp.use_surrogate}")
    assert abs(barrier_gpr - barrier_ref) < 0.1
    # the surrogate must actually take over
    assert gp.use_surrogate > 0
    assert gp.use_base < gp.use_base + gp.use_surrogate


@pytest.mark.slow
def test_gpr_neb_etol_sweep(tmp_path, monkeypatch):
    """Tighter etol => at least as many base calls (BASELINE config 2
    retrain-on-uncertainty behaviour, EMT-scale)."""
    monkeypatch.chdir(tmp_path)
    base_calls = {}
    for etol in (0.02, 0.2):
        images = get_images(INIT, FINAL, num_images=5)
        gp = GP.set_GPR(images, EMT(),
                        noise_e=etol / len(images[0]), noise_f=0.08,
                        log_file=str(tmp_path / f"gp_{etol}.log"))
        calc = GPR(base=EMT(), ff=gp, save=False)
        neb_calc(images, calc, fmax=0.1, steps=60)
        base_calls[etol] = gp.use_base
        assert gp.use_surrogate > 0
    assert base_calls[0.02] >= base_calls[0.2], base_calls


def test_idpp_interpolation_differs_from_linear():
    """IDPP refinement (Smidstrup et al. 2014; reference NEB.py:132-136)
    moves interior images off the linear path while keeping endpoints."""
    from gpr_calculator_tpu.mep import NEB
    lin = get_images(INIT, FINAL, num_images=5)
    idpp = get_images(INIT, FINAL, num_images=5, IDPP=True)
    np.testing.assert_allclose(idpp[0].positions, lin[0].positions)
    np.testing.assert_allclose(idpp[-1].positions, lin[-1].positions)
    d = max(np.abs(idpp[i].positions - lin[i].positions).max()
            for i in (1, 2, 3))
    assert d > 1e-3, "IDPP did not move the interior images"
    assert d < 1.0, "IDPP moved images unreasonably far"


def test_plain_calculator_respects_fix_atoms():
    """A PLAIN (non-GPR) calculator driven through Atoms/NEB must honor
    FixAtoms: forces read zero on fixed rows and positions stay clamped
    (ASE applies constraints inside Atoms; ours must too -- the
    quick-start slab has 8 fixed substrate atoms and the 'plain EMT
    yardstick' used to relax them)."""
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.optimize import BFGS

    rng = np.random.RandomState(61)
    a0 = 2.55
    grid = np.array([[0, 0, 0], [a0, 0, 0], [0.5 * a0, 0.5 * a0, 0],
                     [0, a0, 0], [0.5 * a0, 0, 0.5 * a0],
                     [0, 0.5 * a0, 0.5 * a0]])
    atoms = Atoms(numbers=[29] * 6,
                  positions=grid + 0.05 * rng.randn(6, 3),
                  cell=np.eye(3) * 11, pbc=False)
    atoms.set_constraint(FixAtoms(indices=[0, 1]))
    frozen0 = atoms.positions[[0, 1]].copy()
    atoms.calc = EMT()

    f = atoms.get_forces()
    np.testing.assert_array_equal(f[[0, 1]], 0.0)

    opt = BFGS(atoms, verbose=False)
    opt.run(fmax=0.05, steps=25)
    np.testing.assert_array_equal(atoms.positions[[0, 1]], frozen0)


def test_idpp_respects_fix_atoms():
    """IDPP interpolation must not move FixAtoms rows (the pair
    potential exerts nonzero forces on them; position clamping keeps
    the frozen-layer geometry intact)."""
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms
    from gpr_calculator_tpu.mep import NEB

    rng = np.random.RandomState(63)
    pos0 = rng.uniform(0, 4, (5, 3))
    pos1 = pos0.copy()
    pos1[3:] += [[0.8, 0.2, 0.0], [0.0, 0.9, 0.1]]   # only atoms 3,4 move

    def mk(p):
        a = Atoms(numbers=[29] * 5, positions=p, cell=np.eye(3) * 12,
                  pbc=False)
        a.set_constraint(FixAtoms(indices=[0, 1, 2]))
        return a

    first, last = mk(pos0), mk(pos1)
    images = [first] + [first.copy() for _ in range(3)] + [last]
    neb = NEB(images)
    neb.interpolate(method="idpp")
    for im in images[1:-1]:
        np.testing.assert_allclose(im.positions[:3], pos0[:3],
                                   rtol=0, atol=1e-12)


def test_batched_use_ref_returns_reference_energies():
    """neb_calc(batched=True, use_ref=True) must honor the documented
    (neb, ref_engs) contract like the serial path."""
    from gpr_calculator_tpu import EMT, GP, GPR, get_images, neb_calc

    images = get_images(INIT, FINAL, num_images=5)
    gp = GP.set_GPR(images, EMT(), noise_e=0.05 / len(images[0]),
                    noise_f=0.05)
    calc = GPR(base=EMT(), ff=gp, save=False)
    neb, ref_engs = neb_calc(images, calc, fmax=0.2, steps=6,
                             batched=True, use_ref=True)
    assert len(ref_engs) == len(images)
    assert all(np.isfinite(e) for e in ref_engs)
    # endpoints mirror the pinned NEB energies
    assert ref_engs[0] == neb.energies[0]
    assert ref_engs[-1] == neb.energies[-1]


def test_evaluate_base_trains_on_raw_forces():
    """The dispatcher must feed RAW (unconstrained) base forces into the
    training set: constraint-zeroed rows are dynamics bookkeeping, and
    training on them gives fixed-atom environments the label 0 (or
    -f_base after base-potential subtraction)."""
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms
    from gpr_calculator_tpu.dispatch import DispatchPolicy

    a = 2.55
    atoms = Atoms(numbers=[29] * 4,
                  positions=[[0, 0, 0], [a, 0, 0], [0, a, 0],
                             [0.4 * a, 0.4 * a, 0.5 * a]],
                  cell=np.eye(3) * 12, pbc=False)
    atoms.set_constraint(FixAtoms(indices=[0]))

    class RecordingGP:
        use_base = 0
        noise_e = 0.01
        noise_f = 0.1

        def add_structure(self, data):
            self.recorded = data

    gp = RecordingGP()
    pol = DispatchPolicy(gp, EMT(), verbose=False)
    eng, forces = pol.evaluate_base(atoms)
    # returned (dynamics) forces: fixed row zeroed
    np.testing.assert_array_equal(forces[0], 0.0)
    # trained labels: the RAW base force on the fixed row (nonzero here)
    _, _, trained = gp.recorded
    assert np.abs(trained[0]).max() > 1e-3
    np.testing.assert_allclose(trained[1:], forces[1:], rtol=0, atol=0)


def test_endpoint_energy_readds_base_offset():
    """Endpoint pinning must return FULL physical energies: train_y is
    per-atom and base-subtracted, while interior NEB energies include
    the base offset -- mixing the two energy zeros breaks tangents."""
    from gpr_calculator_tpu import LJ
    from gpr_calculator_tpu.models import RBF
    from gpr_calculator_tpu.neb import _endpoint_energy
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    structs = make_structs(n=3, natoms=4, seed=9)
    calc = EMT()
    base = LJ({"rc": 4.0, "sigma": 2.2, "epsilon": 0.1})
    gp = GP(kernel=RBF(para=[1.0, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            base_potential=base, noise_e=0.01, noise_f=0.1,
            log_file="/tmp/neb_ep.log")
    full_energies = []
    for s in structs:
        e = calc.get_potential_energy(s)
        full_energies.append(e)
        gp.add_structure((s, e, calc.get_forces(s)))
    gp.fit(show=False, opt=False)
    for idx in (0, 2):
        np.testing.assert_allclose(
            _endpoint_energy(gp, structs[idx], idx),
            full_energies[idx], rtol=0, atol=1e-9)
    # out-of-range label index: falls back to a surrogate prediction
    # instead of raising
    e_fb = _endpoint_energy(gp, structs[0], 99)
    assert np.isfinite(e_fb)


def test_find_mic_skewed_cell():
    """Per-axis fractional rounding is not the minimum image in a
    skewed cell; find_mic must match a brute-force image search."""
    from gpr_calculator_tpu.mep import find_mic

    cell = np.array([[10.0, 0, 0], [9.0, 10.0, 0], [0, 0, 20.0]])
    pbc = np.array([True, True, False])
    rng = np.random.RandomState(7)
    d = rng.uniform(-15, 15, (32, 3))
    d[:, 2] = rng.uniform(-5, 5, 32)
    dm, norms = find_mic(d, cell, pbc)
    shifts = np.array([[a, b, 0.0] for a in range(-3, 4)
                       for b in range(-3, 4)]) @ cell
    brute = np.linalg.norm(d[:, None, :] + shifts, axis=-1).min(axis=1)
    np.testing.assert_allclose(norms, brute, rtol=0, atol=1e-10)


def test_interpolate_honors_apply_constraint():
    """NEB.interpolate(apply_constraint=False) must interpolate fixed
    rows too (ASE parity); True clamps them via set_positions."""
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.atoms.constraints import FixAtoms
    from gpr_calculator_tpu.mep import NEB

    def chain():
        first = Atoms(numbers=[29, 29],
                      positions=[[0, 0, 0], [3, 0, 0]])
        last = Atoms(numbers=[29, 29],
                     positions=[[2, 0, 0], [3, 2, 0]])
        mids = [first.copy() for _ in range(2)]
        ims = [first] + mids + [last]
        for im in ims:
            im.set_constraint(FixAtoms(indices=[0]))
        return ims

    ims = chain()
    NEB(ims).interpolate(apply_constraint=False)
    # fixed atom 0 moves 0 -> 2 across the band: interior at 2/3, 4/3
    np.testing.assert_allclose(ims[1].positions[0], [2 / 3, 0, 0],
                               atol=1e-12)
    ims2 = chain()
    NEB(ims2).interpolate(apply_constraint=True)
    np.testing.assert_allclose(ims2[1].positions[0], [0, 0, 0],
                               atol=1e-12)
