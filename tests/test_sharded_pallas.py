"""Multi-chip (shard_map) wrappers for the fused Pallas kernels, validated
on the 8-way virtual CPU mesh in interpret mode."""
import numpy as np
import jax.numpy as jnp

from gpr_calculator_tpu.ops import kernels
from gpr_calculator_tpu.ops.packing import pack_energy, pack_force
from gpr_calculator_tpu.parallel import (make_mesh, kff_pallas_sharded,
                                         kef_pallas_sharded)

from test_kernels import PARAMS


def _pts(rng, n_pts, n_env, d):
    return [(rng.uniform(0.2, 1.0, (n_env, d)),
             rng.uniform(-1.0, 1.0, (n_env, d, 3)),
             rng.choice([13, 79], n_env)) for _ in range(n_pts)]


def _params32():
    return {"sigma": jnp.asarray(1.3, jnp.float32),
            "l": jnp.asarray(0.9, jnp.float32)}


def test_kff_sharded_matches_single():
    rng = np.random.RandomState(5)
    f = pack_force(_pts(rng, 8, 4, 6), m_pad=8, b_pad=4)
    mesh = make_mesh(8)
    out = np.asarray(kff_pallas_sharded(f, _params32(), mesh, zeta=2,
                                        interpret=True,
                                        mm_precision="highest"))
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_kef_sharded_matches_single():
    rng = np.random.RandomState(6)
    epts = _pts(rng, 8, 5, 6)
    f = pack_force(_pts(rng, 4, 4, 6), m_pad=4, b_pad=4)
    e = pack_energy([(x, el) for x, _, el in epts], m_pad=8, a_pad=8)
    mesh = make_mesh(8)
    out = np.asarray(kef_pallas_sharded(e, f, _params32(), mesh, zeta=2,
                                        interpret=True,
                                        mm_precision="highest"))
    ref = np.asarray(kernels.kef(e, f, PARAMS["rbf"], "rbf", 2))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-7)


def test_kff_sharded_production_precision():
    """Default (bf16x3) matmul mode through the shard_map wrapper."""
    rng = np.random.RandomState(7)
    f = pack_force(_pts(rng, 8, 4, 6), m_pad=8, b_pad=4)
    mesh = make_mesh(8)
    out = np.asarray(kff_pallas_sharded(f, _params32(), mesh, zeta=2,
                                        interpret=True))
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 5e-4 * scale
