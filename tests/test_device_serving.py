"""Parity of the device-resident serving pack vs the host pack path.

The serving fast path (GP._device_pack_serving -> SO3.calculate_device +
models.gp._pack_from_device_descs) gathers the padded prediction blocks
on device instead of round-tripping descriptor outputs through host
numpy (the reference repacks via list_to_tuple on every call,
utilities.py:340-390).  Both paths must produce identical predictions.
"""
import numpy as np
import pytest

from gpr_calculator_tpu.atoms import Atoms
from gpr_calculator_tpu.calculators import EMT
from gpr_calculator_tpu.models import GP, RBF
from gpr_calculator_tpu.ops.so3 import SO3


def _structs(n=4, natoms=6, seed=3):
    rng = np.random.RandomState(seed)
    a = 2.55
    grid = np.array([[0, 0, 0], [a, 0, 0], [0.5 * a, 0.5 * a, 0],
                     [0, a, 0], [0.5 * a, 0, 0.5 * a],
                     [0, 0.5 * a, 0.5 * a], [a, a, 0], [a, 0, a]])
    out = []
    for _ in range(n):
        pos = grid[:natoms] + 0.1 * rng.randn(natoms, 3)
        out.append(Atoms(numbers=[29] * natoms, positions=pos,
                         cell=np.eye(3) * 11, pbc=False))
    return out


@pytest.fixture(scope="module")
def gp_and_struc():
    structs = _structs()
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.0, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0, stress=True),
            noise_e=0.005, noise_f=0.1,
            log_file="/tmp/gpr_devpack_test.log")
    for s in structs[:3]:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    gp.fit(show=False, opt=False)
    return gp, structs[3]


def _both_paths(monkeypatch, call):
    monkeypatch.setenv("GPR_CALC_TPU_DEVICE_PACK", "0")
    host = call()
    monkeypatch.setenv("GPR_CALC_TPU_DEVICE_PACK", "1")
    dev = call()
    return host, dev


def test_device_pack_active_on_cpu(gp_and_struc):
    gp, _ = gp_and_struc
    assert gp._device_pack_serving()


def test_predict_structure_parity(gp_and_struc, monkeypatch):
    gp, s = gp_and_struc
    host, dev = _both_paths(
        monkeypatch, lambda: gp.predict_structure(s, return_std=True))
    for a, b in zip(host, dev):
        if a is None or b is None:
            assert a is b
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


def test_predict_structure_stress_parity(gp_and_struc, monkeypatch):
    gp, s = gp_and_struc
    host, dev = _both_paths(
        monkeypatch,
        lambda: gp.predict_structure(s, stress=True, return_std=True))
    for a, b in zip(host, dev):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


def test_predict_structure_fixed_atoms_parity(gp_and_struc, monkeypatch):
    gp, s = gp_and_struc
    from gpr_calculator_tpu.atoms.constraints import FixAtoms
    s = s.copy()
    s.constraints = [FixAtoms([0, 2])]
    host, dev = _both_paths(
        monkeypatch, lambda: gp.predict_structure(s, return_std=True))
    for a, b in zip(host, dev):
        if a is None or b is None:
            assert a is b
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)
    E, F, S, E_std, F_std = dev
    assert np.all(F[[0, 2]] == 0.0)


def test_predict_structures_batched_parity(gp_and_struc, monkeypatch):
    gp, s = gp_and_struc
    batch = [s, _structs(1, seed=11)[0]]
    host, dev = _both_paths(
        monkeypatch,
        lambda: gp.predict_structures(batch, return_std=True))
    for hrec, drec in zip(host, dev):
        for a, b in zip(hrec, drec):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)


def test_serve_gather_meta_buckets_shapes():
    """Gather-meta shapes must be bucketed: without it every distinct
    (n_struc, natoms, n_groups) combination retraces _pack_on_device and
    _predict_packed (seconds per compile on TPU) in mixed-size serving
    workloads."""
    from gpr_calculator_tpu.models.gp import _serve_gather_meta

    def fake(natoms, nseq):
        seq = np.stack([np.arange(nseq) % natoms,
                        np.arange(nseq) % natoms], axis=1)
        return {"seq": seq, "nseq": nseq,
                "dxdr": np.zeros((nseq + 4, 3, 3))}

    def shapes(natoms_list):
        descs = [fake(n, 2 * n) for n in natoms_list]
        numbers = [np.full(n, 29) for n in natoms_list]
        sels = [list(range(n)) for n in natoms_list]
        m = _serve_gather_meta(descs, numbers, sels)
        return {k: v.shape for k, v in m.items()
                if hasattr(v, "shape")}

    # nearby atom counts share one shape set (a_pad / group buckets)
    assert shapes([30]) == shapes([31])
    # mixed-size batches with nearby totals share one shape set
    assert shapes([30, 31, 32, 30]) == shapes([31, 31, 31, 31])
