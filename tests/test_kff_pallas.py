"""Fused Pallas K_FF kernel vs the XLA reference path (interpret mode on
CPU; the compiled path is exercised on TPU by bench.py)."""
import os

import numpy as np
import pytest
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
                                interpret=True, mm_precision="highest"))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_kff_pallas_zeta3():
    pts = make_points(2, 3, 5)
    f = pack_force(pts, m_pad=2, b_pad=4)
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 3))
    out = np.asarray(kff_pallas(f, f, _params32(), zeta=3, interpret=True,
                                mm_precision="highest"))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_kff_pallas_symmetric_matches_xla():
    """Triangular self schedule + mirror assembly == full rectangular."""
    pts = make_points(6, 4, 6)
    f = pack_force(pts, m_pad=6, b_pad=4)
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
    out = np.asarray(kff_pallas(f, f, _params32(), zeta=2, interpret=True,
                                symmetric=True, mm_precision="highest"))
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
    out = np.asarray(kef_pallas(e, f, _params32(), zeta=2, interpret=True,
                                mm_precision="highest"))
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


def test_kff_kef_pallas_bf16x4_production_mode():
    """The default split-precision matmul mode (bf16x4: exact Gram of
    bf16-pair-rounded inputs, 4 native MXU passes): error must stay tiny
    relative to the kernel scale on both blocks and the deriv build."""
    from gpr_calculator_tpu.ops.kff_pallas import kef_pallas
    from gpr_calculator_tpu.ops.packing import pack_energy
    pts1 = make_points(4, 4, 6)
    pts2 = make_points(2, 3, 6)
    epts = make_points(3, 5, 6)
    f1 = pack_force(pts1, m_pad=4, b_pad=4)
    f2 = pack_force(pts2, m_pad=2, b_pad=4)
    e = pack_energy([(x, el) for x, _, el in epts], m_pad=3, a_pad=8)
    for kind, deriv in [("rbf", False), ("rbf_dgamma", True)]:
        ref = np.asarray(kernels.kff(f1, f2, PARAMS["rbf"], kind, 2))
        out = np.asarray(kff_pallas(f1, f2, _params32(), zeta=2,
                                    interpret=True, deriv=deriv,
                                    mm_precision="bf16x4"))
        scale = max(np.abs(ref).max(), 1e-8)
        assert np.abs(out - ref).max() < 5e-4 * scale
        ref_ef = np.asarray(kernels.kef(e, f2, PARAMS["rbf"], kind, 2))
        out_ef = np.asarray(kef_pallas(e, f2, _params32(), zeta=2,
                                       interpret=True, deriv=deriv,
                                       mm_precision="bf16x4"))
        scale_e = max(np.abs(ref_ef).max(), 1e-8)
        assert np.abs(out_ef - ref_ef).max() < 5e-4 * scale_e


def test_kff_pallas_bf16x4_symmetric():
    """Triangular schedule + mirror under the production matmul mode."""
    pts = make_points(6, 4, 6)
    f = pack_force(pts, m_pad=6, b_pad=4)
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
    out = np.asarray(kff_pallas(f, f, _params32(), zeta=2,
                                interpret=True, symmetric=True,
                                mm_precision="bf16x4"))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 5e-4 * scale
    np.testing.assert_allclose(out, out.T, rtol=0, atol=1e-5)


def test_kff_pallas_bf16_fast_mode():
    """1-pass bf16 mode: an exact Gram of bf16-rounded inputs -- larger
    (input-level ~2e-3) error, but structurally PSD; verify the error is
    bounded and symmetric assembly stays exact."""
    pts = make_points(6, 4, 6)
    f = pack_force(pts, m_pad=6, b_pad=4)
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
    out = np.asarray(kff_pallas(f, f, _params32(), zeta=2,
                                interpret=True, symmetric=True,
                                mm_precision="bf16"))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 3e-2 * scale
    np.testing.assert_allclose(out, out.T, rtol=0, atol=1e-5)


def test_kee_from_ops_matches_xla():
    """The consistency companion K_EE (kee_from_ops) == the XLA kee in
    highest mode, and stays within Gram-rounding error in bf16x4."""
    from gpr_calculator_tpu.ops.kff_pallas import (energy_operand,
                                                   kee_from_ops)
    from gpr_calculator_tpu.ops.packing import pack_energy
    epts = make_points(5, 4, 6)
    e = pack_energy([(x, el) for x, _, el in epts], m_pad=5, a_pad=8)
    ref = np.asarray(kernels.kee(e, e, PARAMS["rbf"], "rbf", 2))
    for kind, deriv in [("rbf", False), ("rbf_dgamma", True)]:
        ref = np.asarray(kernels.kee(e, e, PARAMS["rbf"], kind, 2))
        for mode, tol in [("highest", 3e-6), ("bf16x4", 5e-5),
                          ("bf16", 3e-2)]:
            lhs, rhs, w = energy_operand(e, mode)
            out = np.asarray(kee_from_ops(
                _params32(), lhs, rhs, w, A1=e.x.shape[1], zeta=2,
                deriv=deriv, mode=mode))[:5, :5]
            scale = max(np.abs(ref).max(), 1e-8)
            assert np.abs(out - ref).max() < tol * scale, (kind, mode)


def test_k_self_pallas_psd_consistency(monkeypatch):
    """The shared-operand pallas assembly produces a PSD covariance in
    every precision mode (interpret on CPU): bare Cholesky (no noise)
    must succeed -- the Gram-consistency property the module docstring
    derives.  The compiled 10k-scale version of this check lives in the
    TPU lane (test_tpu.py)."""
    import jax
    import jax.numpy as jnp
    from gpr_calculator_tpu.ops.kff_pallas import (TPC, energy_operand,
                                                   force_operand,
                                                   kee_from_ops,
                                                   kef_from_ops,
                                                   kff_from_ops)
    from gpr_calculator_tpu.ops.packing import pack_energy
    rng = np.random.RandomState(3)
    fpts = [(rng.uniform(0.2, 1.0, (4, 6)),
             rng.uniform(-1.0, 1.0, (4, 6, 3)),
             rng.choice([13, 79], 4)) for _ in range(6)]
    epts = [(x, el) for x, _, el in fpts[:4]]
    f = pack_force(fpts, m_pad=6, b_pad=4)
    e = pack_energy(epts, m_pad=4, a_pad=4)
    params = _params32()
    for mode in ["bf16", "bf16x4", "highest"]:
        e_lhs, e_rhs, e_w = energy_operand(e, mode)
        f_lhs, f_rhs, f_re = force_operand(f, mode, TPC)
        K_ee = kee_from_ops(params, e_lhs, e_rhs, e_w, A1=4, zeta=2,
                            deriv=False, mode=mode)[:4, :4]
        K_ef = kef_from_ops(params, e_lhs, e_w, f_rhs, f_re, A1=4, B2=4,
                            zeta=2, interpret=True, deriv=False,
                            mode=mode)[:4, :18]
        K_ff = kff_from_ops(params, f_lhs, f_re, f_rhs, f_re, B1=4, B2=4,
                            zeta=2, interpret=True, symmetric=True,
                            deriv=False, mode=mode)[:18, :18]
        K = np.block([[np.asarray(K_ee), np.asarray(K_ef)],
                      [np.asarray(K_ef).T, np.asarray(K_ff)]])
        w = np.linalg.eigvalsh(K.astype(np.float64))
        assert w.min() > -1e-5 * max(1.0, w.max()), (mode, w.min())


def test_dual_pass_matches_separate_builds():
    """dual=True (fused K + dK/dgamma, one kernel pass) == the two
    separate builds, for all three blocks (interpret mode)."""
    from gpr_calculator_tpu.ops.kff_pallas import (TPC, energy_operand,
                                                   force_operand,
                                                   kee_from_ops,
                                                   kef_from_ops,
                                                   kff_from_ops)
    from gpr_calculator_tpu.ops.packing import pack_energy
    rng = np.random.RandomState(11)
    fpts = [(rng.uniform(0.2, 1.0, (4, 6)),
             rng.uniform(-1.0, 1.0, (4, 6, 3)),
             rng.choice([13, 79], 4)) for _ in range(6)]
    f = pack_force(fpts, m_pad=6, b_pad=4)
    e = pack_energy([(x, el) for x, _, el in fpts[:4]], m_pad=4, a_pad=4)
    params = _params32()
    mode = "bf16x4"
    e_lhs, e_rhs, e_w = energy_operand(e, mode)
    f_lhs, f_rhs, f_re = force_operand(f, mode, TPC)

    ff_k, ff_d = kff_from_ops(params, f_lhs, f_re, f_rhs, f_re, B1=4,
                              B2=4, zeta=2, interpret=True,
                              symmetric=True, deriv=False, mode=mode,
                              dual=True)
    ff_k1 = kff_from_ops(params, f_lhs, f_re, f_rhs, f_re, B1=4, B2=4,
                         zeta=2, interpret=True, symmetric=True,
                         deriv=False, mode=mode)
    ff_d1 = kff_from_ops(params, f_lhs, f_re, f_rhs, f_re, B1=4, B2=4,
                         zeta=2, interpret=True, symmetric=True,
                         deriv=True, mode=mode)
    np.testing.assert_allclose(np.asarray(ff_k), np.asarray(ff_k1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ff_d), np.asarray(ff_d1),
                               rtol=0, atol=1e-6)

    ef_k, ef_d = kef_from_ops(params, e_lhs, e_w, f_rhs, f_re, A1=4,
                              B2=4, zeta=2, interpret=True, deriv=False,
                              mode=mode, dual=True)
    ef_k1 = kef_from_ops(params, e_lhs, e_w, f_rhs, f_re, A1=4, B2=4,
                         zeta=2, interpret=True, deriv=False, mode=mode)
    ef_d1 = kef_from_ops(params, e_lhs, e_w, f_rhs, f_re, A1=4, B2=4,
                         zeta=2, interpret=True, deriv=True, mode=mode)
    np.testing.assert_allclose(np.asarray(ef_k), np.asarray(ef_k1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ef_d), np.asarray(ef_d1),
                               rtol=0, atol=1e-6)

    ee_k, ee_d = kee_from_ops(params, e_lhs, e_rhs, e_w, A1=4, zeta=2,
                              deriv=False, mode=mode, dual=True)
    ee_k1 = kee_from_ops(params, e_lhs, e_rhs, e_w, A1=4, zeta=2,
                         deriv=False, mode=mode)
    ee_d1 = kee_from_ops(params, e_lhs, e_rhs, e_w, A1=4, zeta=2,
                         deriv=True, mode=mode)
    np.testing.assert_allclose(np.asarray(ee_k), np.asarray(ee_k1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ee_d), np.asarray(ee_d1),
                               rtol=0, atol=1e-6)


def test_k_self_dual_fallback_matches():
    """k_self_dual without the pallas gate == two k_self builds."""
    from gpr_calculator_tpu.ops.packing import pack_energy
    rng = np.random.RandomState(12)
    fpts = [(rng.uniform(0.2, 1.0, (3, 5)),
             rng.uniform(-1.0, 1.0, (3, 5, 3)),
             rng.choice([13, 79], 3)) for _ in range(4)]
    f = pack_force(fpts, m_pad=4, b_pad=4)
    e = pack_energy([(x, el) for x, _, el in fpts], m_pad=4, a_pad=4)
    K, Kd = kernels.k_self_dual(e, f, PARAMS["rbf"], 2)
    K1 = kernels.k_self(e, f, PARAMS["rbf"], "rbf", 2, symmetric=True)
    Kd1 = kernels.k_self(e, f, PARAMS["rbf"], "rbf_dgamma", 2,
                         symmetric=True)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Kd), np.asarray(Kd1),
                               rtol=1e-12)


def test_pallas_gate_rejects_vmem_oversized_tiles():
    """The adaptive row tiles (_lhs_tile_points) take pd4-class shapes
    (A=224, B=72) down to one point per cell, so those now PASS the
    gate; only shapes whose G buffer exceeds the budget even at tp1=1
    (B >~ 300 envs) fall back to the XLA build."""
    import jax.numpy as jnp
    from gpr_calculator_tpu.ops.kernels import _pallas_tiles_fit
    from gpr_calculator_tpu.ops.packing import EnergyData, ForceData

    def fake(m, envs, d=30):
        e = EnergyData(x=jnp.zeros((m, envs, d), jnp.float32),
                       ele=jnp.ones((m, envs), jnp.int32),
                       counts=jnp.full((m,), float(envs), jnp.float32),
                       nreal=jnp.asarray(m, jnp.int32))
        f = ForceData(x=jnp.zeros((m, envs, d), jnp.float32),
                      dxdr=jnp.zeros((m, envs, d, 3), jnp.float32),
                      ele=jnp.ones((m, envs), jnp.int32),
                      nreal=jnp.asarray(m, jnp.int32))
        return e, f

    e, f = fake(8, 32)            # bench-class: fits at tp1=8
    assert _pallas_tiles_fit(e, f)
    e_big, f_big = fake(8, 72)    # pd4-class: fits at tp1=1
    assert _pallas_tiles_fit(e_big, f_big)
    e220, _ = fake(8, 224)
    _, f_ok = fake(8, 32)
    assert _pallas_tiles_fit(e220, f_ok)
    _, f_huge = fake(8, 320)      # G_ff 13 MB even at tp1=1
    assert not _pallas_tiles_fit(e, f_huge)
    e_huge, _ = fake(8, 1152)     # G_ef over budget at tp1=1
    assert not _pallas_tiles_fit(e_huge, f_ok)


def test_pallas_dot_kernel_matches_xla():
    """kind='dot' through the fused kernels (k = s2 (c^z + s0^2),
    Dot_mb.py semantics) == the XLA dot builders, all three blocks."""
    from gpr_calculator_tpu.ops.kff_pallas import (TPC, energy_operand,
                                                   force_operand,
                                                   kee_from_ops,
                                                   kef_from_ops,
                                                   kff_from_ops)
    from gpr_calculator_tpu.ops.packing import pack_energy
    import jax.numpy as jnp
    rng = np.random.RandomState(21)
    fpts = [(rng.uniform(0.2, 1.0, (4, 6)),
             rng.uniform(-1.0, 1.0, (4, 6, 3)),
             rng.choice([13, 79], 4)) for _ in range(6)]
    f = pack_force(fpts, m_pad=6, b_pad=4)
    e = pack_energy([(x, el) for x, _, el in fpts[:4]], m_pad=4, a_pad=4)
    params = {"sigma": jnp.asarray(1.2, jnp.float32),
              "sigma0": jnp.asarray(0.5, jnp.float32)}
    pd = {"sigma": jnp.asarray(1.2), "sigma0": jnp.asarray(0.5)}
    mode = "highest"
    e_lhs, e_rhs, e_w = energy_operand(e, mode)
    f_lhs, f_rhs, f_re = force_operand(f, mode, TPC)
    K_ff = np.asarray(kff_from_ops(params, f_lhs, f_re, f_rhs, f_re,
                                   B1=4, B2=4, zeta=2, interpret=True,
                                   symmetric=True, deriv=False,
                                   mode=mode, kind="dot"))[:18, :18]
    ref_ff = np.asarray(kernels.kff(f, f, pd, "dot", 2))
    np.testing.assert_allclose(K_ff, ref_ff, rtol=2e-5, atol=1e-6)
    K_ef = np.asarray(kef_from_ops(params, e_lhs, e_w, f_rhs, f_re,
                                   A1=4, B2=4, zeta=2, interpret=True,
                                   deriv=False, mode=mode,
                                   kind="dot"))[:4, :18]
    ref_ef = np.asarray(kernels.kef(e, f, pd, "dot", 2))
    np.testing.assert_allclose(K_ef, ref_ef, rtol=2e-5, atol=1e-7)
    K_ee = np.asarray(kee_from_ops(params, e_lhs, e_rhs, e_w, A1=4,
                                   zeta=2, deriv=False, mode=mode,
                                   kind="dot"))[:4, :4]
    ref_ee = np.asarray(kernels.kee(e, e, pd, "dot", 2))
    np.testing.assert_allclose(K_ee, ref_ee, rtol=2e-5, atol=1e-7)


def test_pallas_zeta1_coefficients_match_xla():
    """zeta=1 powers: d1 = c^0 = 1 (the review caught d1=c leaking in)."""
    pts1 = make_points(4, 4, 6)
    pts2 = make_points(2, 3, 6)
    f1 = pack_force(pts1, m_pad=4, b_pad=4)
    f2 = pack_force(pts2, m_pad=2, b_pad=4)
    ref = np.asarray(kernels.kff(f1, f2, PARAMS["rbf"], "rbf", 1))
    out = np.asarray(kff_pallas(f1, f2, _params32(), zeta=1,
                                interpret=True, mm_precision="highest"))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)
    from gpr_calculator_tpu.ops.kff_pallas import kef_pallas
    from gpr_calculator_tpu.ops.packing import pack_energy
    epts = make_points(3, 5, 6)
    e = pack_energy([(x, el) for x, _, el in epts], m_pad=3, a_pad=8)
    ref_ef = np.asarray(kernels.kef(e, f2, PARAMS["rbf"], "rbf", 1))
    out_ef = np.asarray(kef_pallas(e, f2, _params32(), zeta=1,
                                   interpret=True,
                                   mm_precision="highest"))
    np.testing.assert_allclose(out_ef, ref_ef, rtol=2e-5, atol=1e-7)


def test_from_ops_rejects_invalid_static_combos():
    """dual+deriv and dot+deriv/dual are rejected loudly, never returning
    half-written output planes."""
    import pytest
    from gpr_calculator_tpu.ops.kff_pallas import (TPC, energy_operand,
                                                   force_operand,
                                                   kef_from_ops,
                                                   kff_from_ops)
    from gpr_calculator_tpu.ops.packing import pack_energy
    pts = make_points(2, 3, 6)
    f = pack_force(pts, m_pad=2, b_pad=4)
    e = pack_energy([(x, el) for x, _, el in pts], m_pad=2, a_pad=4)
    params = _params32()
    f_lhs, f_rhs, f_re = force_operand(f, "highest", TPC)
    e_lhs, _, e_w = energy_operand(e, "highest")
    for kw in [dict(deriv=True, dual=True, kind="rbf"),
               dict(deriv=True, dual=False, kind="dot"),
               dict(deriv=False, dual=True, kind="dot")]:
        with pytest.raises(AssertionError):
            kff_from_ops(params, f_lhs, f_re, f_rhs, f_re, B1=4, B2=4,
                         zeta=2, interpret=True, symmetric=False,
                         mode="highest", **kw)
        with pytest.raises(AssertionError):
            kef_from_ops(params, e_lhs, e_w, f_rhs, f_re, A1=4, B2=4,
                         zeta=2, interpret=True, mode="highest", **kw)


def test_pallas_parity_across_bucket_shapes():
    """Parity sweep over awkward env-bucket widths (the adaptive tile
    logic has per-shape branches: tp2 from lcm alignment, tp1 from the
    VMEM budget + sublane rule).  Interpret mode, rect + symmetric."""
    rng = np.random.RandomState(31)
    for B, m in [(4, 6), (8, 4), (12, 3), (20, 2), (36, 2)]:
        pts = [(rng.uniform(0.2, 1.0, (B, 6)),
                rng.uniform(-1.0, 1.0, (B, 6, 3)),
                rng.choice([13, 79], B)) for _ in range(m)]
        f = pack_force(pts, m_pad=m, b_pad=B)
        ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
        out = np.asarray(kff_pallas(f, f, _params32(), zeta=2,
                                    interpret=True,
                                    mm_precision="highest"))
        scale = max(np.abs(ref).max(), 1e-8)
        assert np.abs(out - ref).max() < 2e-5 * scale, (B, m)
        out_sym = np.asarray(kff_pallas(f, f, _params32(), zeta=2,
                                        interpret=True, symmetric=True,
                                        mm_precision="highest"))
        assert np.abs(out_sym - ref).max() < 2e-5 * scale, (B, m, "sym")


def test_tri_cells_wide_nsub_packing():
    """nsub > 16 (e.g. B=96 -> tp2=4 -> nsub=32) must pack losslessly:
    a fixed 4-bit s field crashed GP.fit on such bucket widths (advisor
    round-2 high finding).  Decode every code and compare against a
    plain re-enumeration."""
    from gpr_calculator_tpu.ops.kff_pallas import TPC, _tri_cells
    n_row_tiles, n_col_blocks, nsub, tp2, tp1 = 64, 1, 32, 4, 2
    codes, sbits, jbits = _tri_cells(n_row_tiles, n_col_blocks, nsub,
                                     tp2, tp1)
    sh_j, sh_i = 1 + sbits, 1 + sbits + jbits
    jmask, smask = (1 << jbits) - 1, (1 << sbits) - 1
    want = []
    for i in range(n_row_tiles):
        for j in range(n_col_blocks):
            first = True
            for s in range(nsub):
                if i * tp1 < j * TPC + (s + 1) * tp2:
                    want.append((i, j, s, first))
                    first = False
    got = [(int(c) >> sh_i, (int(c) >> sh_j) & jmask,
            (int(c) >> 1) & smask, bool(int(c) & 1)) for c in codes]
    assert got == want


def test_pallas_gates_reject_infeasible_orientations(monkeypatch):
    """B1=160 pred vs B2=72 train: each side's own self gate passes but
    the crossed lhs tile (160 envs vs t2=1152) is VMEM-infeasible --
    the rect gate must reject it (advisor round-2 medium finding), and
    kff_from_ops must raise an informative error instead of
    ZeroDivisionError if reached anyway."""
    import jax
    import pytest
    from gpr_calculator_tpu.ops import kernels as K
    from gpr_calculator_tpu.ops.kff_pallas import (_lhs_tile_points,
                                                   _rhs_tile_points)
    from gpr_calculator_tpu.ops.packing import pack_energy
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.RandomState(11)

    def mk(n_pts, B):
        pts = [(rng.uniform(0.2, 1.0, (B, 6)),
                rng.uniform(-1.0, 1.0, (B, 6, 3)),
                rng.choice([13, 79], B)) for _ in range(n_pts)]
        f = pack_force(pts, m_pad=n_pts, b_pad=B)
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, f)

    f1, f2 = mk(2, 160), mk(2, 72)
    e1 = pack_energy([(rng.uniform(0.2, 1.0, (4, 6)),
                       rng.choice([13, 79], 4))], m_pad=1, a_pad=4)
    e1 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, e1)
    # each self gate passes ...
    assert K._use_pallas_kff(f1, "rbf") and K._use_pallas_kff(f2, "rbf")
    # ... but the crossed rect orientation must be rejected
    assert not K._use_pallas_rect(e1, f1, e1, f2, "rbf")
    # and the kernel itself now refuses loudly
    t2 = _rhs_tile_points(72) * 72
    assert _lhs_tile_points(160, t2, four_rows=True) == 0
    from gpr_calculator_tpu.ops.kff_pallas import kff_pallas as kp
    with pytest.raises(ValueError, match="VMEM"):
        kp(f1, f2, _params32(), zeta=2, interpret=True)


def test_pallas_gate_accepts_wide_nsub_bucket(monkeypatch):
    """B=96 (nsub=32) passes the self gate and traces without the old
    4-bit assertion."""
    import jax
    from gpr_calculator_tpu.ops import kernels as K
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.RandomState(12)
    pts = [(rng.uniform(0.2, 1.0, (96, 6)),
            rng.uniform(-1.0, 1.0, (96, 6, 3)),
            rng.choice([13, 79], 96)) for _ in range(2)]
    f = pack_force(pts, m_pad=2, b_pad=96)
    f = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, f)
    assert K._use_pallas_kff(f, "rbf")


def test_kff_pallas_symmetric_wide_nsub(monkeypatch):
    """Execute the triangular schedule at nsub=32 in interpret mode.
    T2_MAX is shrunk so a small bucket (B=32) hits tp2=4 without the
    B=96 x 128-point interpret cost of the natural repro."""
    from gpr_calculator_tpu.ops import kff_pallas as kpm
    monkeypatch.setattr(kpm, "T2_MAX", 32)
    assert kpm._rhs_tile_points(32) == 4          # nsub = 32
    pts = make_points(4, 32, 6)
    f = pack_force(pts, m_pad=4, b_pad=32)
    ref = np.asarray(kernels.kff(f, f, PARAMS["rbf"], "rbf", 2))
    out = np.asarray(kpm.kff_pallas(f, f, _params32(), zeta=2,
                                    interpret=True, symmetric=True,
                                    mm_precision="highest"))
    scale = max(np.abs(ref).max(), 1e-8)
    assert np.abs(out - ref).max() < 2e-5 * scale


@pytest.mark.slow
def test_pallas_self_blocks_shape_sweep_interpret():
    """Randomized shape sweep of the fused self build (interpret mode)
    vs the XLA reference: point counts that straddle tile boundaries,
    uneven env widths, single-point edge -- broader than the fixed
    bench-like shapes the unit tests pin."""
    import itertools
    import jax
    import jax.numpy as jnp
    from gpr_calculator_tpu.ops import kernels as K
    from gpr_calculator_tpu.ops.kernels import _pallas_self_blocks
    from gpr_calculator_tpu.ops.packing import pack_energy, pack_force

    rng = np.random.RandomState(71)

    def f32t(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    cases = [
        # (m_e, A, m_f, B, d)
        (1, 3, 1, 4, 6),          # single-point edge
        (3, 5, 7, 4, 10),         # odd counts
        (2, 4, 9, 8, 14),         # B=8 bucket
        (4, 6, 5, 12, 30),        # production d
        (2, 7, 11, 16, 22),       # wide env bucket
    ]
    for (m_e, A, m_f, B, d) in cases:
        fpts = [(rng.uniform(0.2, 1.0, (B, d)),
                 rng.uniform(-1.0, 1.0, (B, d, 3)),
                 rng.choice([13, 79], B)) for _ in range(m_f)]
        epts = [(rng.uniform(0.2, 1.0, (A, d)),
                 rng.choice([13, 79], A)) for _ in range(m_e)]
        f = f32t(pack_force(fpts, m_pad=m_f, b_pad=B))
        e = f32t(pack_energy(epts, m_pad=m_e, a_pad=A))
        params = {"sigma": jnp.asarray(1.4, jnp.float32),
                  "l": jnp.asarray(0.9, jnp.float32)}
        ref = np.asarray(K.k_self(e, f, params, "rbf", 2,
                                  allow_pallas=False))
        os.environ["GPR_CALC_TPU_KFF_INTERPRET"] = "1"
        os.environ["GPR_CALC_TPU_KFF_PRECISION"] = "highest"
        try:
            (out,) = _pallas_self_blocks(e, f, params, "rbf", 2,
                                         dual=False)
        finally:
            del os.environ["GPR_CALC_TPU_KFF_INTERPRET"]
            del os.environ["GPR_CALC_TPU_KFF_PRECISION"]
        out = np.asarray(out)
        scale = max(np.abs(ref).max(), 1e-8)
        err = np.abs(out - ref).max() / scale
        assert err < 3e-5, ((m_e, A, m_f, B, d), err)


def test_sched_panels_partition_properties():
    """_sched_panels: row-tile-aligned, cap-respecting, exhaustive,
    contiguous partition of the i-major triangular schedule."""
    from gpr_calculator_tpu.ops.kff_pallas import (_sched_panels,
                                                   _tri_cells)
    nrt, ncb, nsub, tp2, tp1 = 40, 20, 4, 32, 4
    codes, sbits, jbits = _tri_cells(nrt, ncb, nsub, tp2, tp1)
    sh_i = 1 + sbits + jbits
    for cap in (len(codes), len(codes) // 2, len(codes) // 5,
                max(1, len(codes) // 17) + ncb * nsub):
        panels = _sched_panels(codes, sh_i, nrt, cap)
        # exhaustive + contiguous in cells AND rows
        assert panels[0][0] == 0 and panels[-1][1] == len(codes)
        assert panels[0][2] == 0
        assert sum(p[3] for p in panels) == nrt
        for (a, b) in zip(panels, panels[1:]):
            assert a[1] == b[0] and a[2] + a[3] == b[2]
        rows = np.asarray(codes, np.int64) >> sh_i
        for c0, c1, i0, nr in panels:
            assert c1 - c0 <= cap
            assert rows[c0:c1].min() == i0
            assert rows[c0:c1].max() == i0 + nr - 1


def test_panelled_schedule_build_matches_single_call(monkeypatch):
    """The row-panel split (SCHED_CELL_CAP exceeded: one pallas_call
    per row-aligned schedule slice, planes concatenated) is numerically
    identical to the single-call build -- same cells, same blocks, same
    accumulation groups.  Guards the >26.5k-point single-chip builds
    where the full schedule crashes the TPU compile helper
    (tools/probe_compile_limit.py: 2^17-code SMEM prefetch limit)."""
    import jax
    from gpr_calculator_tpu.ops import kff_pallas as kp
    from gpr_calculator_tpu.ops.kff_pallas import (TPC, force_operand,
                                                   kff_from_ops)
    rng = np.random.RandomState(7)
    m, B, d = 24, 4, 10
    fpts = [(rng.uniform(0.2, 1.0, (B, d)),
             rng.uniform(-1.0, 1.0, (B, d, 3)),
             rng.choice([13, 79], B)) for _ in range(m)]
    f = pack_force(fpts, m_pad=m, b_pad=B)
    params = _params32()
    mode = "bf16x4"
    f_lhs, f_rhs, f_re = force_operand(f, mode, TPC)

    def build(dual):
        return kff_from_ops(params, f_lhs, f_re, f_rhs, f_re, B1=B,
                            B2=B, zeta=2, interpret=True,
                            symmetric=True, deriv=False, mode=mode,
                            dual=dual)

    single_k = np.asarray(build(False))
    single_kd = build(True)
    single_d = np.asarray(single_kd[1])

    # force ~4 panels; clear the jit cache so the same-shape retrace
    # actually sees the patched cap
    tp2 = kp._rhs_tile_points(B)
    tp1 = kp._lhs_tile_points(B, tp2 * B, four_rows=True)
    m_pad = f_lhs.shape[1] // B
    codes, _, _ = kp._tri_cells(m_pad // tp1, m_pad // TPC,
                                TPC // tp2, tp2, tp1)
    assert len(codes) >= 8, "shape too small to exercise panels"
    monkeypatch.setattr(kp, "SCHED_CELL_CAP",
                        max(1, len(codes) // 4))
    jax.clear_caches()
    panel_k = np.asarray(build(False))
    panel_kd = build(True)

    np.testing.assert_array_equal(panel_k, single_k)
    np.testing.assert_array_equal(np.asarray(panel_kd[0]),
                                  np.asarray(single_kd[0]))
    np.testing.assert_array_equal(np.asarray(panel_kd[1]), single_d)
