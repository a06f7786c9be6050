"""Batched multi-structure prediction and the batched on-the-fly NEB."""
import numpy as np
import pytest

from gpr_calculator_tpu import EMT, GP, GPR, get_images, neb_calc

from test_gp import make_structs

INIT = "/root/reference/examples/database/initial.traj"
FINAL = "/root/reference/examples/database/final.traj"


def test_predict_structures_matches_single():
    from gpr_calculator_tpu.models import RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    structs = make_structs(n=4, natoms=5, seed=71)
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.0, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.01, noise_f=0.1, log_file="/tmp/batched.log")
    for s in structs[:3]:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    gp.fit(show=False, opt=False)

    batch = gp.predict_structures(structs, return_std=True)
    for s, (E, F, E_std, F_std) in zip(structs, batch):
        E1, F1, _, E_std1, F_std1 = gp.predict_structure(s,
                                                         return_std=True)
        np.testing.assert_allclose(E, E1, rtol=1e-10)
        np.testing.assert_allclose(F, F1, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(E_std, E_std1, rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(F_std, F_std1, rtol=1e-6, atol=1e-10)


@pytest.mark.slow
def test_batched_neb_matches_barrier(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    images = get_images(INIT, FINAL, num_images=5)
    gp = GP.set_GPR(images, EMT(), noise_e=0.05 / len(images[0]),
                    noise_f=0.05, log_file=str(tmp_path / "b.log"))
    calc = GPR(base=EMT(), ff=gp, save=False)
    calc.verbose = False
    neb = neb_calc(images, calc, fmax=0.05, steps=150, batched=True)
    barrier = max(neb.energies) - neb.energies[0]
    assert neb.converged
    assert 0.25 < barrier < 0.5, barrier
    assert gp.use_surrogate > 0
