"""Blocked MXU substitution solve (ops/linalg.blocked_cho_solve).

XLA's native TriangularSolve for WIDE right-hand sides at large n
compiles a 20.9 GiB-temp program (n=20k, 2048 rhs, measured on the
v5e) and crashes the TPU compile helper when placed inside the NLL's
diag/trace lax.scan -- the single-chip analytic-NLL ceiling before
round 4.  The blocked substitution replaces it with fori_loop block
sweeps of dense matmuls; these tests pin its exactness against the
dense solve (it is substitution, not an iterative scheme) and the
A/B parity of the scan that uses it.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpr_calculator_tpu.ops.linalg import blocked_cho_solve, blocked_dinv


def _spd_factor(n, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    K = A @ A.T + n * np.eye(n)
    return np.linalg.cholesky(K).astype(dtype), K


@pytest.mark.parametrize("n,k,nb", [
    (5, 3, 4),          # n < nb after padding, single block
    (96, 7, 32),        # exact multiple
    (100, 64, 32),      # padded tail block
    (513, 129, 256),    # padded, wide-ish rhs
])
def test_blocked_cho_solve_matches_dense(n, k, nb):
    L, K = _spd_factor(n)
    rng = np.random.RandomState(1)
    B = rng.randn(n, k)
    ref = np.linalg.solve(K, B)
    got = np.asarray(blocked_cho_solve(jnp.asarray(L), jnp.asarray(B),
                                       nb=nb))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10


def test_blocked_cho_solve_dinv_reuse():
    """Precomputed diagonal-block inverses (the hoisted per-factor
    amortisation) give the identical result."""
    n, k, nb = 200, 16, 64
    L, K = _spd_factor(n, seed=2)
    B = np.random.RandomState(3).randn(n, k)
    dinv = blocked_dinv(jnp.asarray(L), nb)
    a = np.asarray(blocked_cho_solve(jnp.asarray(L), jnp.asarray(B),
                                     dinv, nb=nb))
    b = np.asarray(blocked_cho_solve(jnp.asarray(L), jnp.asarray(B),
                                     nb=nb))
    np.testing.assert_array_equal(a, b)


def test_blocked_cho_solve_f32_and_jit():
    """f32 (TPU production dtype) under jit: solver-precision parity."""
    n, k = 300, 33
    L64, K = _spd_factor(n, seed=4)
    B = np.random.RandomState(5).randn(n, k)
    ref = np.linalg.solve(K, B)
    fn = jax.jit(lambda L_, B_: blocked_cho_solve(L_, B_, nb=128))
    got = np.asarray(fn(jnp.asarray(L64, jnp.float32),
                        jnp.asarray(B, jnp.float32)))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-4


def test_scan_diag_and_trace_blocked_matches_xla(monkeypatch):
    """The NLL's diag/trace scan: blocked solve vs XLA TriangularSolve
    A/B (GPR_CALC_TPU_TRACE_SOLVE), called eagerly so the env choice is
    read per call."""
    from gpr_calculator_tpu.models import gp as gp_mod
    n = 150
    L, K = _spd_factor(n, seed=6)
    Kd = np.random.RandomState(7).randn(n, n)
    Kd = Kd + Kd.T
    Lj, Kdj = jnp.asarray(L), jnp.asarray(Kd)
    monkeypatch.setattr(gp_mod, "_TRACE_BLK", 64)

    def run():
        return gp_mod._scan_diag_and_trace(
            Lj, n,
            lambda X, cols: jnp.vdot(
                X, Kdj[:, jnp.clip(cols, 0, n - 1)]))

    monkeypatch.setenv("GPR_CALC_TPU_TRACE_SOLVE", "blocked")
    d_blk, t_blk = run()
    monkeypatch.setenv("GPR_CALC_TPU_TRACE_SOLVE", "xla")
    d_xla, t_xla = run()
    kinv_ref = np.diag(np.linalg.inv(K))
    assert np.abs(np.asarray(d_blk) - kinv_ref).max() < 1e-10
    assert np.abs(np.asarray(d_blk) - np.asarray(d_xla)).max() < 1e-10
    tr_ref = np.trace(np.linalg.solve(K, Kd))
    assert abs(float(t_blk) - tr_ref) < 1e-8 * abs(tr_ref)
    assert abs(float(t_blk) - float(t_xla)) < 1e-8 * abs(tr_ref)


def test_blocked_cho_solve_start_row_truncation():
    """start_row: rows at/below the enclosing block boundary are the
    exact solution, rows above come back zero (the trace scan's
    symmetry-halving contract)."""
    n, k, nb = 300, 24, 64
    L, K = _spd_factor(n, seed=8)
    B = np.zeros((n, k))
    c0 = 150                      # one-hot rhs rows >= c0, like the scan
    B[np.arange(c0, c0 + k), np.arange(k)] = 1.0
    ref = np.linalg.solve(K, B)
    got = np.asarray(blocked_cho_solve(jnp.asarray(L), jnp.asarray(B),
                                       nb=nb, start_row=c0))
    i0 = (c0 // nb) * nb
    assert np.abs(got[i0:] - ref[i0:]).max() / np.abs(ref).max() < 1e-10
    np.testing.assert_array_equal(got[:i0], 0.0)


def test_blocked_solve_lower_matches_dense():
    n, k, nb = 300, 40, 64
    L, _ = _spd_factor(n, seed=9)
    B = np.random.RandomState(10).randn(n, k)
    ref = np.linalg.solve(L, B)
    got = np.asarray(
        __import__("gpr_calculator_tpu.ops.linalg", fromlist=["x"])
        .blocked_solve_lower(jnp.asarray(L), jnp.asarray(B), nb=nb))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10


def test_serving_variance_blocked_route_matches_xla(monkeypatch):
    """_predict_packed's variance: blocked forward substitution vs
    XLA TriangularSolve (GPR_CALC_TPU_VAR_SOLVE A/B) on a small model,
    caches cleared between routes so the env choice re-traces."""
    from gpr_calculator_tpu.models.gp import _factorize, _predict_packed
    from gpr_calculator_tpu.ops.packing import EnergyData, ForceData
    rng = np.random.RandomState(11)
    m_e, m_f, a, d = 4, 12, 6, 9
    dt = jnp.float64
    def mk(m_eu, m_fu, seed):
        r = np.random.RandomState(seed)
        e = EnergyData(x=jnp.asarray(r.uniform(.2, 1, (m_eu, a, d)), dt),
                       ele=jnp.asarray(r.choice([13, 79], (m_eu, a))),
                       counts=jnp.full((m_eu,), float(a), dt),
                       nreal=jnp.asarray(m_eu))
        f = ForceData(x=jnp.asarray(r.uniform(.2, 1, (m_fu, a, d)), dt),
                      dxdr=jnp.asarray(r.uniform(-1, 1, (m_fu, a, d, 3)), dt),
                      ele=jnp.asarray(r.choice([13, 79], (m_fu, a))),
                      nreal=jnp.asarray(m_fu))
        return e, f
    e, f = mk(m_e, m_f, 12)
    pe, pf = mk(1, 5, 13)
    y = jnp.asarray(rng.randn(m_e + 3 * m_f) * .1, dt)
    params = {"sigma": jnp.asarray(1.5, dt), "l": jnp.asarray(0.9, dt)}
    L, alpha = _factorize(e, f, y, params, jnp.asarray(0.01, dt),
                          jnp.asarray(0.1, dt), "rbf", 2)
    out = {}
    for mode in ("blocked", "xla"):
        monkeypatch.setenv("GPR_CALC_TPU_VAR_SOLVE", mode)
        jax.clear_caches()
        mean, std = _predict_packed(pe, pf, e, f, params, alpha, L,
                                    "rbf", 2, True, 0)
        out[mode] = (np.asarray(mean), np.asarray(std))
    np.testing.assert_allclose(out["blocked"][0], out["xla"][0],
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(out["blocked"][1], out["xla"][1],
                               rtol=1e-9, atol=1e-12)
