"""Analytic LML gradients (rbf_dgamma coefficient build) vs autodiff."""
import numpy as np
import jax.numpy as jnp
import pytest

from gpr_calculator_tpu import config
from gpr_calculator_tpu.models.gp import (_nll_rbf_analytic,
                                          _nll_value_and_grad)
from gpr_calculator_tpu.ops.packing import pack_energy, pack_force

from test_kernels import make_points


def _data(seed=0, m_e=3, m_f=6, n=5, d=6):
    rng = np.random.RandomState(seed)
    epts = [(p[0], p[2]) for p in make_points(m_e, n, d)]
    fpts = make_points(m_f, n, d)
    e = pack_energy(epts, m_pad=4, a_pad=8)
    f = pack_force(fpts, m_pad=8, b_pad=8)
    y = jnp.asarray(rng.randn(e.m + 3 * f.m) * 0.1, config.dtype())
    return e, f, y


@pytest.mark.parametrize("noise_opt", [False, True])
@pytest.mark.parametrize("zeta", [2, 3])
def test_analytic_matches_autodiff(zeta, noise_opt):
    e, f, y = _data()
    dt = config.dtype()
    theta = jnp.asarray([1.7, 0.8] + ([0.02] if noise_opt else []), dt)
    noise_fixed = jnp.asarray([0.01, 0.1], dt)
    f_coef = jnp.asarray(10.0, dt)

    nll_a, g_a = _nll_rbf_analytic(theta, e, f, y, noise_fixed, f_coef,
                                   zeta, noise_opt, 0)
    nll_d, g_d = _nll_value_and_grad(theta, e, f, y, noise_fixed, f_coef,
                                     "rbf", zeta, noise_opt, 0)
    np.testing.assert_allclose(float(nll_a), float(nll_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_d),
                               rtol=1e-7, atol=1e-9)


def test_analytic_matches_finite_difference():
    e, f, y = _data(seed=3)
    dt = config.dtype()
    noise_fixed = jnp.asarray([0.01, 0.1], dt)
    f_coef = jnp.asarray(10.0, dt)
    theta0 = np.array([1.4, 1.1])

    def val(t):
        nll, _ = _nll_rbf_analytic(jnp.asarray(t, dt), e, f, y,
                                   noise_fixed, f_coef, 2, False, 0)
        return float(nll)

    _, g = _nll_rbf_analytic(jnp.asarray(theta0, dt), e, f, y,
                             noise_fixed, f_coef, 2, False, 0)
    h = 1e-6
    for i in range(2):
        tp, tm = theta0.copy(), theta0.copy()
        tp[i] += h
        tm[i] -= h
        fd = (val(tp) - val(tm)) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-6, atol=1e-8)


def test_fit_uses_analytic_and_matches(monkeypatch):
    """GP.fit(opt=True) converges to the same hyperparameters with the
    analytic path as with autodiff."""
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    def fitted(env):
        if env:
            monkeypatch.setenv("GPR_CALC_TPU_NLL", env)
        else:
            monkeypatch.delenv("GPR_CALC_TPU_NLL", raising=False)
        structs = make_structs(n=4, natoms=5, seed=77)
        calc = EMT()
        gp = GP(kernel=RBF(para=[1.0, 1.0]),
                descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
                noise_e=0.01, noise_f=0.1, log_file="/tmp/ag.log")
        for s in structs:
            gp.add_structure((s, calc.get_potential_energy(s),
                              calc.get_forces(s)))
        gp.fit(show=False, opt=True, maxiter=8)
        return np.asarray(gp.kernel.parameters())

    p_analytic = fitted("")
    p_autodiff = fitted("autodiff")
    np.testing.assert_allclose(p_analytic, p_autodiff, rtol=1e-5)


@pytest.mark.parametrize("noise_opt", [False, True])
@pytest.mark.parametrize("zeta", [1, 2, 3])
def test_dot_analytic_matches_autodiff(zeta, noise_opt):
    """Dot-kernel analytic gradient (count-kernel d/dsigma0 + reused
    solve d/dsigma) vs autodiff -- reference parity:
    Dot_mb.k_total_with_grad (Dot_mb.py:121-148)."""
    from gpr_calculator_tpu.models.gp import _nll_dot_analytic
    e, f, y = _data(seed=11)
    dt = config.dtype()
    theta = jnp.asarray([1.5, 1.2] + ([0.02] if noise_opt else []), dt)
    noise_fixed = jnp.asarray([0.01, 0.1], dt)
    f_coef = jnp.asarray(10.0, dt)

    nll_a, g_a = _nll_dot_analytic(theta, e, f, y, noise_fixed, f_coef,
                                   zeta, noise_opt, 0)
    nll_d, g_d = _nll_value_and_grad(theta, e, f, y, noise_fixed, f_coef,
                                     "dot", zeta, noise_opt, 0)
    np.testing.assert_allclose(float(nll_a), float(nll_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_d),
                               rtol=1e-7, atol=1e-9)


def test_dot_fit_uses_analytic_and_converges():
    """GP.fit with the Dot kernel goes through the analytic path by
    default and still produces a usable model (full optimize cycle)."""
    from gpr_calculator_tpu.models import GP, Dot
    from gpr_calculator_tpu.ops.so3 import SO3
    from gpr_calculator_tpu.calculators import EMT
    from test_gp import make_structs

    structs = make_structs(n=3, natoms=5, seed=41)
    calc = EMT()
    gp = GP(kernel=Dot(para=[2.0, 2.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.02, noise_f=0.15, log_file="/tmp/dot_fit.log")
    for s in structs:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    gp.fit(show=False, opt=True, maxiter=4)
    E, E1, F, F1 = gp.validate_data()
    assert np.all(np.isfinite(E1)) and np.all(np.isfinite(F1))
    assert np.abs(np.asarray(E) - np.asarray(E1)).max() < 0.1


def test_nll_scan_multiblock_with_partial_tail(monkeypatch):
    """The lax.scan rewrite of the diag(K^-1)/trace loop (round-4): with
    the block width shrunk below n, the scan runs several blocks plus a
    PARTIAL tail whose out-of-range columns must solve to zero and whose
    scatters must drop -- (nll, grad) must equal the full-width
    single-block result to fp roundoff, for both analytic NLLs."""
    import numpy as np
    import jax.numpy as jnp
    import gpr_calculator_tpu.models.gp as gpmod
    from gpr_calculator_tpu import config
    from gpr_calculator_tpu.ops.packing import EnergyData, ForceData

    rng = np.random.RandomState(3)
    dt = config.dtype()
    m_e, a_e, m_f, b_f, d = 5, 4, 10, 4, 6    # n = 35 rows
    e = EnergyData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (m_e, a_e, d)), dt),
        ele=jnp.asarray(rng.choice([13, 79], (m_e, a_e)), jnp.int32),
        counts=jnp.full((m_e,), float(a_e), dt),
        nreal=jnp.asarray(m_e, jnp.int32))
    f = ForceData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (m_f, b_f, d)), dt),
        dxdr=jnp.asarray(rng.uniform(-1, 1, (m_f, b_f, d, 3)), dt),
        ele=jnp.asarray(rng.choice([13, 79], (m_f, b_f)), jnp.int32),
        nreal=jnp.asarray(m_f, jnp.int32))
    n = m_e + 3 * m_f
    y = jnp.asarray(rng.randn(n) * 0.1, dt)
    nf = jnp.asarray([0.02, 0.15], dt)

    def both(theta_list, fn):
        theta = jnp.asarray(theta_list, dt)
        # full width: one block covers all n columns
        monkeypatch.setattr(gpmod, "_TRACE_BLK", 2048)
        v1, g1 = fn(theta, e, f, y, nf, 7.5, 2, True, 4)
        # shrunk width: 3 full blocks + a partial tail (16*2=32 < 35)
        monkeypatch.setattr(gpmod, "_TRACE_BLK", 16)
        # row_chunk is a static arg; vary it so the jit cache does not
        # serve the full-width program for the same shapes
        v2, g2 = fn(theta, e, f, y, nf, 7.5, 2, True, 2)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-7, atol=1e-10)

    both([1.4, 0.9, 0.05], gpmod._nll_rbf_analytic)
    both([1.4, 1.1, 0.05], gpmod._nll_dot_analytic)
