"""Kernel-layer public block API (RBF/Dot .k_total / .k_total_with_grad /
.k_total_with_stress / .diag), parity with RBF_mb.py:62-229 and
Dot_mb.py:45-173 served by the packed ops builders."""
import numpy as np
import pytest

from gpr_calculator_tpu.models.kernels import RBF, Dot

RNG = np.random.RandomState(11)


def make_data(n_e=2, n_f=3, n_env=4, d=6, ncart=3):
    energy, force = [], []
    for _ in range(n_e):
        ne = RNG.randint(2, n_env + 1)
        x = RNG.uniform(0.2, 1.0, (ne, d))
        ele = RNG.choice([13, 79], ne)
        energy.append((x, ele))
    for _ in range(n_f):
        ne = RNG.randint(2, n_env + 1)
        x = RNG.uniform(0.2, 1.0, (ne, d))
        dxdr = RNG.uniform(-1.0, 1.0, (ne, d, ncart))
        ele = RNG.choice([13, 79], ne)
        force.append((x, dxdr, ele))
    return {"energy": energy, "force": force}


KERNELS = {
    "rbf": lambda: RBF(para=(1.3, 0.9), zeta=2),
    "dot": lambda: Dot(para=(1.1, 0.4), zeta=3),
}


@pytest.mark.parametrize("kind", ["rbf", "dot"])
def test_k_total_self_equals_cross(kind):
    k = KERNELS[kind]()
    data = make_data()
    K_self = k.k_total(data)
    K_cross = k.k_total(data, data)
    n = 2 + 3 * 3
    assert K_self.shape == (n, n)
    np.testing.assert_allclose(K_self, K_cross, rtol=0, atol=1e-8)
    np.testing.assert_allclose(K_self, K_self.T, rtol=0, atol=1e-8)


@pytest.mark.parametrize("kind", ["rbf", "dot"])
def test_k_total_rectangular(kind):
    k = KERNELS[kind]()
    d1 = make_data(n_e=1, n_f=2)
    d2 = make_data(n_e=3, n_f=1)
    K = k.k_total(d1, d2)
    assert K.shape == (1 + 6, 3 + 3)
    # blocks agree with transposed roles
    K_t = k.k_total(d2, d1)
    np.testing.assert_allclose(K, K_t.T, rtol=0, atol=1e-8)


def test_k_total_energy_only_and_force_only():
    k = KERNELS["rbf"]()
    d_e = {"energy": make_data(n_e=3, n_f=0)["energy"], "force": []}
    d_f = {"energy": [], "force": make_data(n_e=0, n_f=2)["force"]}
    assert k.k_total(d_e).shape == (3, 3)
    assert k.k_total(d_f).shape == (6, 6)
    assert k.k_total(d_e, d_f).shape == (3, 6)


@pytest.mark.parametrize("kind", ["rbf", "dot"])
def test_k_total_with_grad_matches_fd(kind):
    k = KERNELS[kind]()
    data = make_data()
    C, dC = k.k_total_with_grad(data)
    np.testing.assert_allclose(C, k.k_total(data), rtol=0, atol=1e-8)
    assert dC.shape == C.shape + (2,)
    h = 1e-5
    p0 = k.parameters()
    for j in range(2):
        pp, pm = list(p0), list(p0)
        pp[j] += h
        pm[j] -= h
        k.update(pp)
        Kp = k.k_total(data)
        k.update(pm)
        Km = k.k_total(data)
        k.update(p0)
        fd = (Kp - Km) / (2 * h)
        np.testing.assert_allclose(dC[:, :, j], fd, rtol=2e-4, atol=5e-6)


@pytest.mark.parametrize("kind", ["rbf", "dot"])
def test_diag_matches_k_total_diagonal(kind):
    k = KERNELS[kind]()
    data = make_data()
    D = k.diag(data)
    K = k.k_total(data)
    np.testing.assert_allclose(D, np.diagonal(K), rtol=1e-6, atol=1e-8)


def test_k_total_with_stress_peels_rows():
    k = KERNELS["rbf"]()
    train = make_data(n_e=2, n_f=2)
    # 9-column prediction-side force points: 3 force + 6 stress rows
    pred9 = make_data(n_e=1, n_f=2, ncart=9)
    C, C_s = k.k_total_with_stress(pred9, train)
    ncols = 2 + 3 * 2
    assert C.shape == (1 + 3 * 2, ncols)
    assert C_s.shape == (6 * 2, ncols)
    # the force rows of C equal k_total on the same points truncated to
    # the 3 cartesian columns
    pred3 = {"energy": pred9["energy"],
             "force": [(x, dxdr[:, :, :3], ele)
                       for x, dxdr, ele in pred9["force"]]}
    K3 = k.k_total(pred3, train)
    np.testing.assert_allclose(C, K3, rtol=0, atol=1e-8)
    # stress rows are the cart>=3 rows of the 9-col build
    pred_rows = k.k_total(pred9, train)
    blocks = pred_rows[1:].reshape(2, 9, ncols)
    np.testing.assert_allclose(C_s, blocks[:, 3:].reshape(12, ncols),
                               rtol=0, atol=1e-8)


def test_stress_requires_9_columns():
    k = KERNELS["rbf"]()
    d3 = make_data()
    with pytest.raises(ValueError):
        k.k_total_with_stress(d3, d3)


# -- utils converters (utilities.py:340-405 parity) ---------------------------

def test_list_tuple_roundtrip_force():
    from gpr_calculator_tpu.utils import list_to_tuple, tuple_to_list
    pts = make_data(n_e=0, n_f=3)["force"]
    # pad ragged points to a common width like the reference stores them
    w = max(p[0].shape[0] for p in pts)
    pts = [(np.pad(x, ((0, w - x.shape[0]), (0, 0))),
            np.pad(dx, ((0, w - dx.shape[0]), (0, 0), (0, 0))),
            np.pad(el, (0, w - el.shape[0])))
           for x, dx, el in pts]
    X, dXdR, ELE, idx = list_to_tuple(pts, mode="force")
    assert X.shape[0] == sum(p[0].shape[0] for p in pts)
    back = tuple_to_list((X, dXdR, ELE, idx), mode="force")
    for (x, dx, el), (x2, dx2, el2) in zip(pts, back):
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(dx, dx2)
        np.testing.assert_array_equal(el, el2)


def test_list_tuple_roundtrip_energy_with_values():
    from gpr_calculator_tpu.utils import list_to_tuple, tuple_to_list
    pts = [(RNG.uniform(size=(3, 4)), -1.5, np.array([13, 13, 79])),
           (RNG.uniform(size=(3, 4)), -2.5, np.array([79, 79, 13]))]
    X, ELE, idx, vals = list_to_tuple(pts, mode="energy",
                                      include_value=True)
    assert vals == [-1.5, -2.5]
    back = tuple_to_list((X, ELE, idx), mode="energy")
    assert len(back) == 2 and back[1][0].shape == (3, 4)


def test_metric_single(capsys):
    from gpr_calculator_tpu.utils import metric_single
    y = np.array([1.0, 2.0, 3.0])
    s = metric_single(y, y + 0.1, "Energy", show_max=True)
    assert "Energy" in s and "R2" in s and "Max" in s


def test_get_strucs_roundtrip(tmp_path):
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.io.ase_db import write_db
    from gpr_calculator_tpu.utils import get_strucs
    a = Atoms(["Si", "Si"], positions=[[0, 0, 0], [2.0, 0, 0]],
              cell=8 * np.eye(3))
    db = str(tmp_path / "t.db")
    write_db(db, [{"atoms": a,
                   "data": {"energy": -3.0,
                            "force": np.zeros((2, 3)).tolist()}}])
    strucs, values = get_strucs(db)
    assert len(strucs) == 1
    E, F, S = values[0]
    assert E == -3.0 and F.shape == (2, 3) and S is None


def test_fea_matches_descriptor_calculate():
    from gpr_calculator_tpu.atoms import Atoms
    from gpr_calculator_tpu.ops.so3 import SO3
    from gpr_calculator_tpu.utils import fea
    a = Atoms(["Si", "Si"], positions=[[0, 0, 0], [2.2, 0, 0]],
              cell=8 * np.eye(3))
    des = SO3(nmax=2, lmax=2, rcut=4.0)
    out = fea(des, a)
    ref = des.calculate(a)
    assert np.allclose(out["x"], ref["x"])
    assert out["seq"].shape == ref["seq"].shape
