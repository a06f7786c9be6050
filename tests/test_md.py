"""MD / EOS workload drivers."""
import numpy as np
import pytest

from gpr_calculator_tpu import EMT, GP, GPR, RBF
from gpr_calculator_tpu.md import (VelocityVerlet, Langevin,
                                   maxwell_boltzmann_velocities,
                                   equation_of_state)
from gpr_calculator_tpu.ops.so3 import SO3

from test_gp import make_structs


def test_velocity_verlet_conserves_energy():
    atoms = make_structs(n=1, natoms=6, seed=41)[0]
    atoms.calc = EMT()
    maxwell_boltzmann_velocities(atoms, 150.0)
    md = VelocityVerlet(atoms, timestep_fs=1.0)
    e0 = atoms.get_potential_energy() + md.kinetic_energy()
    md.run(40)
    e1 = atoms.get_potential_energy() + md.kinetic_energy()
    assert abs(e1 - e0) < 0.05 * max(1.0, abs(e0)), (e0, e1)


def test_langevin_thermalises():
    from gpr_calculator_tpu import BFGS
    atoms = make_structs(n=1, natoms=6, seed=43)[0]
    atoms.calc = EMT()
    BFGS(atoms).run(fmax=0.1, steps=60)   # relax first
    md = Langevin(atoms, timestep_fs=2.0, temperature_K=300.0,
                  friction=0.5)
    md.run(200)
    assert 30 < md.temperature() < 1500


def test_eos_sweep():
    atoms = make_structs(n=1, natoms=6, seed=45)[0]
    atoms.pbc = np.array([True] * 3)
    vols, engs = equation_of_state(atoms, EMT(),
                                   scales=np.linspace(0.97, 1.03, 5))
    assert len(vols) == 5 and np.all(np.isfinite(engs))


@pytest.mark.slow
def test_on_the_fly_md_with_gpr():
    """On-the-fly MD: the surrogate takes over along the trajectory
    (BASELINE config 4 behaviour at miniature scale)."""
    atoms = make_structs(n=1, natoms=6, seed=47)[0]
    base = EMT()
    images = [atoms.copy(), atoms.copy()]
    gp = GP.set_GPR(images, base, noise_e=0.03 / len(atoms), noise_f=0.15,
                    nmax=2, lmax=2, rcut=4.0, log_file="/tmp/md_gp.log")
    calc = GPR(base=base, ff=gp, save=False, freq=1000)
    calc.verbose = False
    atoms.calc = calc
    maxwell_boltzmann_velocities(atoms, 100.0)
    md = VelocityVerlet(atoms, timestep_fs=1.0)
    md.run(25)
    assert gp.use_surrogate > 0
    assert np.all(np.isfinite(atoms.positions))


def test_langevin_respects_fix_atoms():
    """Fixed atoms must not move: the half-kick, both A-drifts, and the
    O-step noise all skip constrained rows (ADVICE round-1 regression)."""
    from gpr_calculator_tpu.atoms import FixAtoms
    atoms = make_structs(n=1, natoms=6, seed=49)[0]
    atoms.set_constraint(FixAtoms(indices=[0, 2]))
    atoms.calc = EMT()
    maxwell_boltzmann_velocities(atoms, 300.0)
    frozen = atoms.positions[[0, 2]].copy()
    md = Langevin(atoms, timestep_fs=2.0, temperature_K=300.0, friction=0.05)
    md.run(25)
    np.testing.assert_array_equal(atoms.positions[[0, 2]], frozen)
    np.testing.assert_array_equal(md.velocities[[0, 2]], 0.0)

    atoms2 = make_structs(n=1, natoms=6, seed=49)[0]
    atoms2.set_constraint(FixAtoms(indices=[1]))
    atoms2.calc = EMT()
    maxwell_boltzmann_velocities(atoms2, 200.0)
    frozen2 = atoms2.positions[[1]].copy()
    VelocityVerlet(atoms2, timestep_fs=1.0).run(25)
    np.testing.assert_array_equal(atoms2.positions[[1]], frozen2)


def test_md_preserves_initial_velocities():
    """The integrator constructor must NOT wipe velocities set by
    maxwell_boltzmann_velocities (it used to: every MD run silently
    started from rest and the NVE test passed vacuously with KE=0)."""
    import numpy as np
    from gpr_calculator_tpu.md import (VelocityVerlet,
                                       maxwell_boltzmann_velocities)

    atoms = make_structs(n=1, natoms=6, seed=45)[0]
    atoms.calc = EMT()
    v0 = maxwell_boltzmann_velocities(atoms, 300.0)
    assert np.abs(v0).max() > 0
    dyn = VelocityVerlet(atoms, timestep_fs=1.0)
    np.testing.assert_array_equal(dyn.velocities, v0)
    assert dyn.kinetic_energy() > 0
    # mass-weighted COM momentum is removed (mixed masses drift
    # otherwise once the integrator runs)
    m = atoms.get_masses()[:, None]
    p = (m * dyn.velocities).sum(axis=0)
    np.testing.assert_allclose(p, 0.0, atol=1e-12)


def test_md_accepts_foreign_atoms_without_fixed_indices():
    """run() must tolerate duck-typed atoms objects lacking
    fixed_indices (ase.Atoms parity), like the helpers already did."""
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.md import (VelocityVerlet,
                                       maxwell_boltzmann_velocities)

    class ForeignAtoms(Atoms):
        # hide the framework-specific accessor
        fixed_indices = property(doc="hidden")

    a = 2.55
    atoms = ForeignAtoms(numbers=[29] * 4,
                         positions=[[0, 0, 0], [a, 0, 0], [0, a, 0],
                                    [0.55 * a, 0.55 * a, 0.55 * a]],
                         cell=np.eye(3) * 12, pbc=False)
    assert not hasattr(atoms, "fixed_indices")
    atoms.calc = EMT()
    maxwell_boltzmann_velocities(atoms, 100.0, rng=np.random.RandomState(3))
    VelocityVerlet(atoms, timestep_fs=0.5).run(3)
