"""Hutchinson stochastic NLL trace estimator (round-4 VERDICT item 6).

All analytic-gradient traces -- tr(K^-1 dK/dgamma), tr(K^-1 Nz),
tr(K^-1 diag(dnz)), the Dot EE pair-count trace -- are weighted traces of
K^-1, estimated from ONE narrow Rademacher probe solve (O(n^2 p)) instead
of the exact column-blocked scan (O(n^3)).  Reference trace form: Eq. 5.9
of GPML as implemented in gpr_calc/gaussianprocess.py:133-202 (the
reference computes it exactly; the estimator is the TPU-scale
replacement, behind GP.fit's measured-bias gate).

The probe block is a FIXED PRNGKey(0) Rademacher draw, so every
assertion here is deterministic, not statistical.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gpr_calculator_tpu import config
import gpr_calculator_tpu.models.gp as gpmod
from gpr_calculator_tpu.models.gp import (_nll_dot_analytic,
                                          _nll_rbf_analytic,
                                          _resolve_trace_mode)
from gpr_calculator_tpu.ops.packing import pack_energy, pack_force

from test_kernels import make_points


def _data(seed=1, m_e=6, m_f=40, natom=6, d=8):
    rng = np.random.RandomState(seed)
    epts = [(p[0], p[2]) for p in make_points(m_e, natom, d)]
    fpts = make_points(m_f, natom, d)
    e = pack_energy(epts, m_pad=8, a_pad=8)
    f = pack_force(fpts, m_pad=48, b_pad=8)
    y = jnp.asarray(rng.randn(e.m + 3 * f.m) * 0.1, config.dtype())
    return e, f, y


@pytest.mark.parametrize("kind,fn,theta0", [
    ("rbf", _nll_rbf_analytic, [1.7, 0.8]),
    ("dot", _nll_dot_analytic, [1.7, 1.1]),
])
@pytest.mark.parametrize("noise_opt", [False, True])
def test_hutch_gradient_parity(kind, fn, theta0, noise_opt):
    """Probe-estimated gradient tracks the exact scan; the NLL VALUE is
    bit-identical (only gradient traces are estimated)."""
    e, f, y = _data()
    dt = config.dtype()
    nf = jnp.asarray([0.01, 0.1], dt)
    fc = jnp.asarray(10.0, dt)
    th = theta0 + ([0.02] if noise_opt else [])
    theta = jnp.asarray(th, dt)
    v_e, g_e = fn(theta, e, f, y, nf, fc, 2, noise_opt, 0)
    v_h, g_h = fn(theta, e, f, y, nf, fc, 2, noise_opt, 0,
                  trace_mode="hutch", n_probe=2048)
    assert float(v_h) == float(v_e)
    ge, gh = np.asarray(g_e), np.asarray(g_h)
    err = np.linalg.norm(gh - ge) / np.linalg.norm(ge)
    # n=152 rows, p=2048 fixed probes: measured ~2% (rbf) / ~0.1% (dot);
    # error shrinks as sqrt(1/(p n)) so production n>=6144 is far tighter
    assert err < 0.05, err


def test_trace_mode_resolution(monkeypatch):
    monkeypatch.delenv("GPR_CALC_TPU_NLL_TRACE", raising=False)
    assert _resolve_trace_mode(gpmod._HUTCH_MIN_N - 1) == "exact"
    assert _resolve_trace_mode(gpmod._HUTCH_MIN_N) == "hutch"
    monkeypatch.setenv("GPR_CALC_TPU_NLL_TRACE", "exact")
    assert _resolve_trace_mode(10 ** 6) == "exact"
    monkeypatch.setenv("GPR_CALC_TPU_NLL_TRACE", "hutch")
    assert _resolve_trace_mode(8) == "hutch"


def _small_gp(seed=77):
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    structs = make_structs(n=4, natoms=5, seed=seed)
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.0, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.01, noise_f=0.1, log_file="/tmp/hutch.log")
    for s in structs:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    return gp


def test_fit_gate_accepts_good_estimator(monkeypatch):
    """auto mode + enough probes: the measured-bias gate keeps hutch and
    caches the verdict, and the optimised hyperparameters match an
    exact-trace fit to L-BFGS-B's own ftol resolution."""
    monkeypatch.delenv("GPR_CALC_TPU_NLL", raising=False)
    monkeypatch.delenv("GPR_CALC_TPU_NLL_TRACE", raising=False)
    monkeypatch.setenv("GPR_CALC_TPU_NLL_PROBES", "4096")
    monkeypatch.setattr(gpmod, "_HUTCH_MIN_N", 1)

    gp = _small_gp()
    gp.fit(show=False, opt=True, maxiter=8)
    assert gp._nll_trace_used == "hutch"
    assert list(gp._trace_gate_cache.values()) == ["hutch"]
    p_h = np.asarray(gp.kernel.parameters())

    monkeypatch.setenv("GPR_CALC_TPU_NLL_TRACE", "exact")
    gp_e = _small_gp()
    gp_e.fit(show=False, opt=True, maxiter=8)
    assert gp_e._nll_trace_used == "exact"
    np.testing.assert_allclose(p_h, np.asarray(gp_e.kernel.parameters()),
                               rtol=2e-2)


def test_fit_gate_rejects_bad_estimator(monkeypatch):
    """One probe cannot reproduce the exact gradient: the gate measures
    the disagreement and falls back to the exact scan."""
    monkeypatch.delenv("GPR_CALC_TPU_NLL", raising=False)
    monkeypatch.delenv("GPR_CALC_TPU_NLL_TRACE", raising=False)
    monkeypatch.setenv("GPR_CALC_TPU_NLL_PROBES", "1")
    monkeypatch.setattr(gpmod, "_HUTCH_MIN_N", 1)
    monkeypatch.setattr(gpmod.GP, "_HUTCH_GATE_RTOL", 1e-6)

    gp = _small_gp()
    gp.fit(show=False, opt=True, maxiter=4)
    assert gp._nll_trace_used == "exact"
    assert list(gp._trace_gate_cache.values()) == ["exact"]


def test_explicit_hutch_skips_gate(monkeypatch):
    """GPR_CALC_TPU_NLL_TRACE=hutch is an explicit opt-in: no exact
    comparison runs (the gate cache stays empty)."""
    monkeypatch.delenv("GPR_CALC_TPU_NLL", raising=False)
    monkeypatch.setenv("GPR_CALC_TPU_NLL_TRACE", "hutch")
    monkeypatch.setenv("GPR_CALC_TPU_NLL_PROBES", "2048")

    gp = _small_gp()
    gp.fit(show=False, opt=True, maxiter=4)
    assert gp._nll_trace_used == "hutch"
    assert gp._trace_gate_cache == {}


def test_log_marginal_likelihood_stays_exact(monkeypatch):
    """The user-facing LML API never silently estimates: it uses the
    exact scan even when auto mode would pick hutch for fit()."""
    monkeypatch.delenv("GPR_CALC_TPU_NLL", raising=False)
    monkeypatch.delenv("GPR_CALC_TPU_NLL_TRACE", raising=False)
    monkeypatch.setattr(gpmod, "_HUTCH_MIN_N", 1)
    gp = _small_gp()
    lml, g = gp.log_marginal_likelihood(
        list(gp.kernel.parameters()), eval_gradient=True)
    monkeypatch.setenv("GPR_CALC_TPU_NLL_TRACE", "exact")
    lml2, g2 = gp.log_marginal_likelihood(
        list(gp.kernel.parameters()), eval_gradient=True)
    assert lml == lml2
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g2))
