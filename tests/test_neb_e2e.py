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
