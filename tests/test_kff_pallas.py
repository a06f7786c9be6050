"""Fused Pallas K_FF kernel vs the XLA reference path (interpret mode on
CPU; the compiled path is exercised on TPU by bench.py)."""
import numpy as np
import jax.numpy as jnp

from gpr_calculator_tpu.ops import kernels
from gpr_calculator_tpu.ops.kff_pallas import kff_pallas
from gpr_calculator_tpu.ops.packing import pack_force

from test_kernels import make_points, PARAMS


def _params32():
    return {"sigma": jnp.asarray(1.3, jnp.float32),
            "l": jnp.asarray(0.9, jnp.float32)}


def test_kff_pallas_matches_xla():
    pts1 = make_points(4, 4, 6)
    pts2 = make_points(2, 3, 6)
    f1 = pack_force(pts1, m_pad=4, b_pad=4)
    f2 = pack_force(pts2, m_pad=2, b_pad=4)
    ref = np.asarray(kernels.kff(f1, f2, PARAMS["rbf"], "rbf", 2))
    out = np.asarray(kff_pallas(f1, f2, _params32(), zeta=2,
                                interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_kff_pallas_zeta3():
    pts = make_points(2, 3, 5)
    f = pack_force(pts, m_pad=2, b_pad=4)
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 3))
    out = np.asarray(kff_pallas(f, f, _params32(), zeta=3, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_kff_pallas_symmetric_matches_xla():
    """Triangular self schedule + mirror assembly == full rectangular."""
    pts = make_points(6, 4, 6)
    f = pack_force(pts, m_pad=6, b_pad=4)
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
    out = np.asarray(kff_pallas(f, f, _params32(), zeta=2,
                                interpret=True, symmetric=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)
    # and it is exactly symmetric after the mirror
    np.testing.assert_allclose(out, out.T, rtol=0, atol=2e-5)


def test_kef_pallas_matches_xla():
    from gpr_calculator_tpu.ops.kff_pallas import kef_pallas
    from gpr_calculator_tpu.ops.packing import pack_energy
    epts = make_points(3, 5, 6)
    fpts = make_points(2, 3, 6)
    e = pack_energy([(x, el) for x, _, el in epts], m_pad=3, a_pad=8)
    f = pack_force(fpts, m_pad=2, b_pad=4)
    ref = np.asarray(kernels.kef(e, f, PARAMS["rbf"], "rbf", 2))
    out = np.asarray(kef_pallas(e, f, _params32(), zeta=2, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-7)


def test_kff_kef_pallas_deriv_match_xla():
    """deriv=True pallas coefficients == the rbf_dgamma XLA build."""
    from gpr_calculator_tpu.ops.kff_pallas import kef_pallas
    from gpr_calculator_tpu.ops.packing import pack_energy
    rng = np.random.RandomState(99)   # order-independent data

    def pts(n_pts, n_env, d):
        return [(rng.uniform(0.2, 1.0, (n_env, d)),
                 rng.uniform(-1.0, 1.0, (n_env, d, 3)),
                 rng.choice([13, 79], n_env)) for _ in range(n_pts)]

    pts1, pts2, epts = pts(4, 4, 6), pts(2, 3, 6), pts(2, 4, 6)
    f1 = pack_force(pts1, m_pad=4, b_pad=4)
    f2 = pack_force(pts2, m_pad=2, b_pad=4)
    e = pack_energy([(x, el) for x, _, el in epts], m_pad=2, a_pad=4)
    ref_ff = np.asarray(kernels.kff(f1, f2, PARAMS["rbf"], "rbf_dgamma", 2))
    out_ff = np.asarray(kff_pallas(f1, f2, _params32(), zeta=2,
                                   interpret=True, deriv=True))
    scale = np.abs(ref_ff).max()
    assert np.abs(out_ff - ref_ff).max() < 3e-5 * scale
    ref_ef = np.asarray(kernels.kef(e, f2, PARAMS["rbf"], "rbf_dgamma", 2))
    out_ef = np.asarray(kef_pallas(e, f2, _params32(), zeta=2,
                                   interpret=True, deriv=True))
    scale_e = max(np.abs(ref_ef).max(), 1e-8)
    assert np.abs(out_ef - ref_ef).max() < 3e-5 * scale_e
