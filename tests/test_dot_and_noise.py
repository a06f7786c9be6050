"""Dot-kernel GP path and noise-hyperparameter optimization."""
import numpy as np
import pytest

from gpr_calculator_tpu.atoms import Atoms
from gpr_calculator_tpu.calculators import EMT
from gpr_calculator_tpu.models import GP, Dot, RBF
from gpr_calculator_tpu.ops.so3 import SO3

from test_gp import make_structs


def test_dot_kernel_gp_fit():
    structs = make_structs(n=3, natoms=5, seed=11)
    calc = EMT()
    gp = GP(kernel=Dot(para=[2.0, 2.0], zeta=2),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.01, noise_f=0.1, log_file="/tmp/dot.log")
    for s in structs:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    gp.fit(show=False, opt=True, maxiter=5)
    E, E_pred, F, F_pred = gp.validate_data(show=True)
    assert gp.error["forces_r2"] > 0.95
    E2, F2, _, E_std, F_std = gp.predict_structure(structs[0],
                                                   return_std=True)
    assert np.isfinite(E2) and np.all(np.isfinite(F2))
    assert np.all(F_std >= 0)


def test_noise_optimization_path():
    """noise_e passed as [init, lower, upper] activates the coupled-noise
    L-BFGS-B dimension (gaussianprocess.py:145-151, 279-282)."""
    structs = make_structs(n=3, natoms=5, seed=13)
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.0, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=[0.01, 0.001, 0.05], f_coef=10,
            log_file="/tmp/noiseopt.log")
    assert gp.noise_bounds == [0.001, 0.05]
    for s in structs:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    gp.fit(show=False, opt=True, maxiter=5)
    # coupling maintained after optimization
    assert 0.001 <= gp.noise_e <= 0.05
    np.testing.assert_allclose(gp.noise_f, gp.f_coef * gp.noise_e)


def test_lml_gradient_vs_finite_difference():
    structs = make_structs(n=2, natoms=5, seed=17)
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.2, 0.9]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.01, noise_f=0.1, log_file="/tmp/lmlfd.log")
    for s in structs:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    theta = np.array([1.2, 0.9])
    lml, grad = gp.log_marginal_likelihood(theta, eval_gradient=True)
    eps = 1e-6
    for k in range(2):
        tp, tm = theta.copy(), theta.copy()
        tp[k] += eps
        tm[k] -= eps
        fd = (gp.log_marginal_likelihood(tp)
              - gp.log_marginal_likelihood(tm)) / (2 * eps)
        np.testing.assert_allclose(grad[k], fd, rtol=1e-5)
