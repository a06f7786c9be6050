"""Numeric validation of the stress pipeline end-to-end.

Pins the rdxdr index convention (reference chain SO3.py:298-308 +
RBF_mb.py:206-229) with finite differences against cell strain:

  * descriptor level: d(sum_i x_i)/d(strain) == vol * sum_seq rdxdr
  * model level: predict_structure(stress=True) stress == FD of the
    predicted energy under strain (ASE convention sigma = dE/d(eps) / vol)
  * GP.predict with 9-column (force+stress) points returns correctly
    sliced rows (regression for the hardcoded-3-columns bug).
"""
import numpy as np
import pytest

from gpr_calculator_tpu.atoms import Atoms
from gpr_calculator_tpu.calculators import LJ
from gpr_calculator_tpu.models import GP, RBF
from gpr_calculator_tpu.ops.so3 import SO3

# reference Voigt pick (gaussianprocess.py:863): [xx, yy, zz, xy, xz, yz]
VOIGT = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]


def make_periodic(seed=0, natoms=4, a=3.8):
    """Slightly distorted fcc-like periodic cell (no accidental symmetry)."""
    rng = np.random.RandomState(seed)
    frac = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                     [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])[:natoms]
    cell = np.eye(3) * a
    cell[0, 1] = 0.13 * a  # triclinic tilt so off-diagonal terms are live
    pos = frac @ cell + 0.05 * a * rng.randn(natoms, 3)
    return Atoms(numbers=[29] * natoms, positions=pos, cell=cell, pbc=True)


def strained(atoms, eps):
    """Apply the deformation r -> (I + eps) r to positions and cell."""
    F = np.eye(3) + eps
    return Atoms(numbers=atoms.numbers.copy(),
                 positions=atoms.positions @ F.T,
                 cell=np.asarray(atoms.get_cell()) @ F.T,
                 pbc=atoms.pbc.copy())


def test_rdxdr_matches_strain_finite_difference():
    """vol * sum_s rdxdr[s, c, :, :] contracted with a strain direction A
    equals the FD derivative of sum_i x[i, c] along that strain."""
    atoms = make_periodic()
    desc = SO3(nmax=2, lmax=2, rcut=3.2, stress=True)
    d = desc.calculate(atoms)
    assert d["rdxdr"] is not None and np.all(np.isfinite(d["rdxdr"]))
    vol = atoms.get_volume()
    total = vol * d["rdxdr"].sum(axis=0)          # (ncoef, 3, 3)

    rng = np.random.RandomState(7)
    A = rng.randn(3, 3)
    A = 0.5 * (A + A.T)                            # symmetric direction
    h = 1e-6
    Tp = desc.calculate(strained(atoms, h * A))["x"].sum(axis=0)
    Tm = desc.calculate(strained(atoms, -h * A))["x"].sum(axis=0)
    fd = (Tp - Tm) / (2 * h)                       # (ncoef,)
    pred = np.einsum("cnm,nm->c", total, A)
    np.testing.assert_allclose(pred, fd, rtol=2e-5,
                               atol=2e-7 * np.abs(fd).max())


def test_rdxdr_total_is_symmetric():
    """Rotation invariance of the power spectrum makes the summed virial
    tensor symmetric per coefficient -- a free consistency check of the
    (cart_R, cart_grad) index order."""
    atoms = make_periodic(seed=3)
    d = SO3(nmax=2, lmax=2, rcut=3.2, stress=True).calculate(atoms)
    total = d["rdxdr"].sum(axis=0)
    asym = np.abs(total - np.swapaxes(total, 1, 2)).max()
    assert asym < 1e-8 * max(np.abs(total).max(), 1.0)


@pytest.fixture(scope="module")
def lj_gp():
    """Tiny GP trained on LJ data for periodic Cu cells, stress-enabled."""
    calc = LJ(parameters={"rc": 3.2, "sigma": 2.2, "epsilon": 0.4})
    gp = GP(kernel=RBF(para=[1.0, 0.8]),
            descriptor=SO3(nmax=2, lmax=2, rcut=3.2, stress=True),
            noise_e=0.002, noise_f=0.05, log_file="/tmp/gpr_stress.log")
    for k in range(5):
        s = make_periodic(seed=10 + k)
        e, f, _ = calc.calculate(s)
        gp.add_structure((s, e, f))
    gp.fit(show=False, opt=True, maxiter=8)
    return gp, calc


def test_predicted_stress_matches_energy_fd(lj_gp):
    """predict_structure(stress=True): summed per-atom stress equals
    dE_pred/d(strain)/vol (the surrogate's own virial, exact up to FD)."""
    gp, _ = lj_gp
    atoms = make_periodic(seed=30)
    E0, F0, S = gp.predict_structure(atoms, stress=True)
    assert S is not None and S.shape == (len(atoms), 6)
    vol = atoms.get_volume()
    sig_voigt = S.sum(axis=0)                      # structure stress, Voigt
    sig = np.zeros((3, 3))
    for k, (i, j) in enumerate(VOIGT):
        sig[i, j] = sig[j, i] = sig_voigt[k]

    rng = np.random.RandomState(11)
    A = rng.randn(3, 3)
    A = 0.5 * (A + A.T)
    h = 1e-5
    Ep, _, _ = gp.predict_structure(strained(atoms, h * A), stress=False)
    Em, _, _ = gp.predict_structure(strained(atoms, -h * A), stress=False)
    fd = (Ep - Em) / (2 * h)                       # dE/dt along A
    pred = vol * np.einsum("nm,nm->", sig, A)
    np.testing.assert_allclose(pred, fd, rtol=5e-4,
                               atol=5e-6 * max(abs(fd), 1.0))


def test_predicted_stress_close_to_lj_virial(lj_gp):
    """e2e sanity: the surrogate stress tracks the LJ analytic virial on a
    near-training configuration (loose tolerance -- model error)."""
    gp, calc = lj_gp
    atoms = make_periodic(seed=12)                 # near training set
    _, _, S = gp.predict_structure(atoms, stress=True)
    sig_voigt = S.sum(axis=0)
    _, _, S_lj = calc.calculate(atoms)
    assert S_lj is not None
    S_lj = np.asarray(S_lj).reshape(-1, 6).sum(axis=0)  # per-atom -> total
    sig_lj = np.zeros((3, 3))
    order = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]  # ASE Voigt
    for k, (i, j) in enumerate(order):
        sig_lj[i, j] = sig_lj[j, i] = S_lj[k]
    sig = np.zeros((3, 3))
    for k, (i, j) in enumerate(VOIGT):
        sig[i, j] = sig[j, i] = sig_voigt[k]
    scale = max(np.abs(sig_lj).max(), 1e-3)
    assert np.abs(sig - sig_lj).max() < 0.35 * scale


def test_predict_ncart9_points_sliced_correctly(lj_gp):
    """GP.predict with 9-column force points returns rows that match the
    (energy-FD-validated) predict_structure outputs -- regression for the
    silent 3-column mis-slice."""
    gp, _ = lj_gp
    atoms = make_periodic(seed=31)
    E, F, S = gp.predict_structure(atoms, stress=True)

    d = gp.descriptor.calculate(atoms)
    from gpr_calculator_tpu.atoms.atoms import symbols_to_numbers
    ele = symbols_to_numbers(d["elements"])
    seq = d["seq"]
    force_pts = []
    for i in range(len(atoms)):
        ids = np.flatnonzero(seq[:, 1] == i)
        _i = seq[ids, 0]
        rd = d["rdxdr"][ids].reshape(len(ids), -1, 9)[:, :, [0, 4, 8, 1, 2, 5]]
        force_pts.append((d["x"][_i],
                          np.concatenate((d["dxdr"][ids], rd), axis=2),
                          ele[_i]))
    X = {"energy": [(d["x"], ele)], "force": force_pts}
    mean = gp.predict(X, stress=True)
    rows = mean[1:].reshape(len(atoms), 9)
    np.testing.assert_allclose(rows[:, :3], F, rtol=1e-8, atol=1e-10)
    # predict() returns raw functional rows; predict_structure applies the
    # ASE sign convention to the stress columns
    np.testing.assert_allclose(-rows[:, 3:], S, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(mean[0] * len(atoms), E, rtol=1e-8)

    with pytest.raises(ValueError):
        gp.predict({"energy": [(d["x"], ele)],
                    "force": [(d["x"], d["dxdr"][:len(d["x"])], ele)]},
                   stress=True)


def test_base_potential_stress_order_matches_gp_columns():
    """base_potential stress arrives in ASE Voigt (xx,yy,zz,yz,xz,xy)
    while the GP stress rows are (xx,yy,zz,xy,xz,yz): predict_structure
    must permute the shears before adding (a silent wrong-shear bug
    otherwise).  Checked by differencing predictions with and without
    the base potential against the LJ calculator's own stress."""
    import numpy as np
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.calculators.lj import LJ
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3

    rng = np.random.RandomState(73)
    # sheared cell so the off-diagonal components are nonzero
    cell = np.array([[8.0, 0.6, 0.0], [0.0, 8.0, 0.4], [0.2, 0.0, 8.0]])
    strucs = [Atoms(numbers=[29] * 5,
                    positions=rng.uniform(1.0, 7.0, (5, 3)),
                    cell=cell, pbc=True) for _ in range(3)]
    calc = EMT()

    def build(base):
        gp = GP(kernel=RBF(para=[1.2, 1.0]),
                descriptor=SO3(nmax=2, lmax=2, rcut=4.0, stress=True),
                noise_e=0.02, noise_f=0.15, base_potential=base,
                log_file="/tmp/base_stress.log")
        for s in strucs[:2]:
            e = calc.get_potential_energy(s)
            f = calc.get_forces(s)
            if base is not None:
                e_off, f_off, _ = base.calculate(s)
                e, f = e - e_off, f - f_off
            gp.add_structure((s, e, f))
        gp.fit(show=False, opt=False)
        return gp

    lj = LJ({"rc": 4.0, "sigma": 2.0, "epsilon": 0.05})
    gp0 = build(None)
    gp1 = build(lj)
    _, _, S0 = gp0.predict_structure(strucs[2], stress=True)
    _, _, S1 = gp1.predict_structure(strucs[2], stress=True)
    # training labels differ, so only the ADDED stress offset is exact:
    # re-predict gp1 with its base potential detached
    gp1.base_potential = None
    _, _, S1_nobase = gp1.predict_structure(strucs[2], stress=True)
    del S0
    s_lj = lj.calculate(strucs[2])[2]          # (natoms, 6) ASE Voigt
    expected = np.asarray(s_lj)[:, [0, 1, 2, 5, 4, 3]]
    np.testing.assert_allclose(np.asarray(S1) - np.asarray(S1_nobase),
                               expected, rtol=1e-8, atol=1e-12)
