"""Mesh-sharded blocked Cholesky (parallel/cholesky.py): parity with
jnp.linalg.cholesky on the 8-way virtual CPU mesh (round-3 VERDICT
item 2 -- the replicated solve was the unanalyzed multi-chip Amdahl
ceiling)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpr_calculator_tpu.parallel import make_mesh
from gpr_calculator_tpu.parallel.cholesky import cholesky_sharded


def _spd(n, seed, dtype=np.float64):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n + 16).astype(dtype)
    return A @ A.T + n * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("n,nb", [
    (64, 16),       # multiple panels per device
    (100, 16),      # n not a multiple of nb*n_dev -> unit-tail padding
    (256, 32),      # exactly nb per device
    (48, 64),       # n smaller than one panel (single-step degenerate)
])
def test_cholesky_sharded_matches_dense(n, nb):
    K = _spd(n, seed=n)
    mesh = make_mesh(8)
    L = np.asarray(cholesky_sharded(jnp.asarray(K), mesh, nb=nb))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, rtol=5e-9, atol=5e-9)
    # strictly lower: the stale upper region must have been cleared
    np.testing.assert_array_equal(np.triu(L, 1), 0.0)


def test_cholesky_sharded_under_jit_f32():
    """Inside jit (how _factorize calls it) and in f32 -- the TPU
    production dtype."""
    K = _spd(192, seed=7, dtype=np.float32)
    mesh = make_mesh(8)

    @jax.jit
    def solve(K, y):
        L = cholesky_sharded(K, mesh, nb=32)
        return jax.scipy.linalg.cho_solve((L, True), y)

    y = np.random.RandomState(8).randn(192).astype(np.float32)
    got = np.asarray(solve(jnp.asarray(K), jnp.asarray(y)))
    ref = np.linalg.solve(K.astype(np.float64), y)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_gp_fit_with_sharded_cholesky_matches(monkeypatch):
    """GP(mesh=...) with the sharded factor FORCED on (the production
    _factorize/_chol_mesh dispatch) must reproduce the replicated-factor
    fit end to end."""
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    structs = make_structs(n=3, natoms=5, seed=41)
    calc = EMT()
    labels = [(s, calc.get_potential_energy(s), calc.get_forces(s))
              for s in structs]

    def build():
        gp = GP(kernel=RBF(para=[1.2, 1.0]),
                descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
                noise_e=0.02, noise_f=0.15, mesh=make_mesh(8),
                log_file="/tmp/shard_chol_gp.log")
        for s, e, f in labels:
            gp.add_structure((s, e, f))
        gp.fit(show=False, opt=False)
        return gp

    monkeypatch.setenv("GPR_CALC_TPU_SHARDED_CHOL", "on")
    gp_sh = build()
    monkeypatch.setenv("GPR_CALC_TPU_SHARDED_CHOL", "off")
    gp_rep = build()
    E1, F1, _ = gp_sh.predict_structure(structs[0])
    E2, F2, _ = gp_rep.predict_structure(structs[0])
    np.testing.assert_allclose(E1, E2, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(F1, F2, rtol=1e-6, atol=1e-9)


def test_cholesky_sharded_one_device_mesh():
    """1-device mesh degenerate form (what the TPU lane compiles)."""
    K = _spd(80, seed=9)
    mesh = make_mesh(1)
    L = np.asarray(cholesky_sharded(jnp.asarray(K), mesh, nb=16))
    np.testing.assert_allclose(L, np.linalg.cholesky(K),
                               rtol=5e-9, atol=5e-9)


def test_cholesky_sharded_flop_model():
    """XLA's own cost analysis must confirm the segmented-window FLOP
    model: per-device ~ n^3/n_dev * (1/2 + 1/(2 n_dev)) + panel terms --
    a regression guard against silently reverting to full-width
    trailing updates (which would read ~1.07e9 here instead of ~6.3e8)
    or to a replicated factor (2.9e9)."""
    n, nb, n_dev = 2048, 128, 8
    mesh = make_mesh(8)
    fn = jax.jit(lambda K: cholesky_sharded(K, mesh, nb=nb))
    A = np.random.RandomState(0).randn(n, n + 8)
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    ca = fn.lower(K).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca["flops"])
    model = n ** 3 / n_dev * (0.5 + 0.5 / n_dev)
    # within 15% above the GEMM-only model (panel solves + diag chols),
    # and far below the unsegmented n^3/n_dev
    assert flops < 1.15 * model, (flops, model)
    assert flops > 0.9 * model, (flops, model)
