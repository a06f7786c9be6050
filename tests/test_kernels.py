"""Kernel-block validation against autodiff ground truth.

This revives the intent of the reference's dormant torch finite-difference
harness (gpr_calc/kernels/base.py:199-278): the energy-force and force-force
blocks must equal the appropriate derivatives of the scalar kernel,
contracted against dX/dR.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpr_calculator_tpu.ops import kernels
from gpr_calculator_tpu.ops.packing import pack_energy, pack_force

RNG = np.random.RandomState(7)


def scalar_kernel(x1, x2, params, kind, zeta):
    """k(x1, x2) for a single pair of env vectors (no masking)."""
    n1 = jnp.linalg.norm(x1)
    n2 = jnp.linalg.norm(x2)
    c = jnp.dot(x1, x2) / (n1 * n2)
    D = c ** zeta
    if kind == "rbf":
        s2, l2 = params["sigma"] ** 2, params["l"] ** 2
        return s2 * jnp.exp(-(1.0 - D) / (2 * l2))
    else:
        return params["sigma"] ** 2 * (D + params["sigma0"] ** 2)


def make_points(n_pts, n_env, d, ncart=3, two_elements=True):
    pts = []
    for _ in range(n_pts):
        ne = RNG.randint(max(1, n_env - 1), n_env + 1)
        x = RNG.uniform(0.2, 1.0, (ne, d))
        dxdr = RNG.uniform(-1.0, 1.0, (ne, d, ncart))
        ele = RNG.choice([13, 79] if two_elements else [13], ne)
        pts.append((x, dxdr, ele))
    return pts


PARAMS = {
    "rbf": {"sigma": jnp.asarray(1.3), "l": jnp.asarray(0.9)},
    "dot": {"sigma": jnp.asarray(1.1), "sigma0": jnp.asarray(0.4)},
}


@pytest.mark.parametrize("kind", ["rbf", "dot"])
@pytest.mark.parametrize("zeta", [2, 3])
def test_kee_against_direct_sum(kind, zeta):
    params = PARAMS[kind]
    pts1 = make_points(2, 3, 5)
    pts2 = make_points(3, 4, 5)
    e1 = pack_energy([(x, e) for x, _, e in pts1], m_pad=3, a_pad=5)
    e2 = pack_energy([(x, e) for x, _, e in pts2], m_pad=4, a_pad=5)
    K = np.asarray(kernels.kee(e1, e2, params, kind, zeta))

    for p, (x1, _, el1) in enumerate(pts1):
        for q, (x2, _, el2) in enumerate(pts2):
            acc = 0.0
            for i in range(len(x1)):
                for j in range(len(x2)):
                    if el1[i] == el2[j]:
                        acc += float(scalar_kernel(
                            jnp.asarray(x1[i]), jnp.asarray(x2[j]),
                            params, kind, zeta))
            acc /= len(x1) * len(x2)
            assert abs(K[p, q] - acc) < 1e-10, (p, q, K[p, q], acc)
    # padded rows/cols are zero
    assert np.all(K[2:, :] == 0) and np.all(K[:, 3:] == 0)


@pytest.mark.parametrize("kind", ["rbf", "dot"])
@pytest.mark.parametrize("zeta", [2, 3])
def test_kef_against_autodiff(kind, zeta):
    params = PARAMS[kind]
    pts1 = make_points(2, 3, 5)
    pts2 = make_points(2, 3, 5)
    e1 = pack_energy([(x, e) for x, _, e in pts1], m_pad=2, a_pad=4)
    f2 = pack_force(pts2, m_pad=3, b_pad=4)
    K = np.asarray(kernels.kef(e1, f2, params, kind, zeta))

    gradk = jax.grad(scalar_kernel, argnums=1)
    for p, (x1, _, el1) in enumerate(pts1):
        for q, (x2, dxdr2, el2) in enumerate(pts2):
            blk = np.zeros(3)
            for i in range(len(x1)):
                for j in range(len(x2)):
                    if el1[i] == el2[j]:
                        g = gradk(jnp.asarray(x1[i]), jnp.asarray(x2[j]),
                                  params, kind, zeta)
                        blk -= np.asarray(g) @ dxdr2[j]
            blk /= len(x1)
            np.testing.assert_allclose(K[p, 3 * q:3 * q + 3], blk,
                                       rtol=1e-9, atol=1e-12)
    assert np.all(K[:, 6:] == 0)


@pytest.mark.parametrize("kind", ["rbf", "dot"])
@pytest.mark.parametrize("zeta", [2, 3])
def test_kff_against_autodiff(kind, zeta):
    params = PARAMS[kind]
    pts1 = make_points(2, 3, 4)
    pts2 = make_points(2, 3, 4)
    f1 = pack_force(pts1, m_pad=2, b_pad=4)
    f2 = pack_force(pts2, m_pad=3, b_pad=3)
    K = np.asarray(kernels.kff(f1, f2, params, kind, zeta))

    hess = jax.jacfwd(jax.grad(scalar_kernel, argnums=0), argnums=1)
    for p, (x1, d1, el1) in enumerate(pts1):
        for q, (x2, d2, el2) in enumerate(pts2):
            blk = np.zeros((3, 3))
            for i in range(len(x1)):
                for j in range(len(x2)):
                    if el1[i] == el2[j]:
                        H = np.asarray(hess(jnp.asarray(x1[i]),
                                            jnp.asarray(x2[j]),
                                            params, kind, zeta))
                        blk += d1[i].T @ H @ d2[j]
            np.testing.assert_allclose(
                K[3 * p:3 * p + 3, 3 * q:3 * q + 3], blk,
                rtol=1e-8, atol=1e-11)
    assert np.all(K[:, 6:] == 0)


def test_kff_stress_columns():
    """9-column dxdr on the lhs (stress rows) matches per-column autodiff."""
    params = PARAMS["rbf"]
    pts1 = make_points(1, 3, 4, ncart=9)
    pts2 = make_points(2, 3, 4, ncart=3)
    f1 = pack_force(pts1, m_pad=1, b_pad=3, ncart=9)
    f2 = pack_force(pts2, m_pad=2, b_pad=3)
    K = np.asarray(kernels.kff(f1, f2, params, "rbf", 2))
    assert K.shape == (9, 6)

    hess = jax.jacfwd(jax.grad(scalar_kernel, argnums=0), argnums=1)
    (x1, d1, el1) = pts1[0]
    for q, (x2, d2, el2) in enumerate(pts2):
        blk = np.zeros((9, 3))
        for i in range(len(x1)):
            for j in range(len(x2)):
                if el1[i] == el2[j]:
                    H = np.asarray(hess(jnp.asarray(x1[i]),
                                        jnp.asarray(x2[j]),
                                        params, "rbf", 2))
                    blk += d1[i].T @ H @ d2[j]
        np.testing.assert_allclose(K[:, 3 * q:3 * q + 3], blk,
                                   rtol=1e-8, atol=1e-11)


def test_kff_row_chunking_matches():
    params = PARAMS["rbf"]
    pts = make_points(4, 3, 5)
    f = pack_force(pts, m_pad=4, b_pad=4)
    K0 = np.asarray(kernels.kff(f, f, params, "rbf", 2, row_chunk=0))
    K2 = np.asarray(kernels.kff(f, f, params, "rbf", 2, row_chunk=2))
    np.testing.assert_allclose(K0, K2, rtol=1e-12, atol=1e-14)


def test_diagonals_match_blocks():
    params = PARAMS["rbf"]
    pts = make_points(3, 3, 5)
    e = pack_energy([(x, el) for x, _, el in pts], m_pad=3, a_pad=4)
    f = pack_force(pts, m_pad=3, b_pad=4)
    de = np.asarray(kernels.diag_energy(e, params, "rbf", 2))
    df = np.asarray(kernels.diag_force(f, params, "rbf", 2))
    Kee = np.asarray(kernels.kee(e, e, params, "rbf", 2))
    Kff = np.asarray(kernels.kff(f, f, params, "rbf", 2))
    np.testing.assert_allclose(de, np.diag(Kee), rtol=1e-12)
    np.testing.assert_allclose(df.ravel(), np.diag(Kff), rtol=1e-12)


def test_grad_wrt_hyperparameters_is_finite():
    """jax.grad through the full block (replaces *_with_grad C++ paths)."""
    pts = make_points(2, 3, 5)
    e = pack_energy([(x, el) for x, _, el in pts], m_pad=2, a_pad=4)
    f = pack_force(pts, m_pad=2, b_pad=4)

    def loss(params):
        K = kernels.k_self(e, f, params, "rbf", 2)
        return jnp.sum(K * K)

    g = jax.grad(loss)(PARAMS["rbf"])
    assert np.isfinite(float(g["sigma"])) and np.isfinite(float(g["l"]))
    # finite-difference check
    eps = 1e-6
    for key in ("sigma", "l"):
        p_plus = dict(PARAMS["rbf"]); p_plus[key] = p_plus[key] + eps
        p_minus = dict(PARAMS["rbf"]); p_minus[key] = p_minus[key] - eps
        fd = (float(loss(p_plus)) - float(loss(p_minus))) / (2 * eps)
        np.testing.assert_allclose(float(g[key]), fd, rtol=1e-5)


def test_kff_fast_mode_matches_within_bf16():
    params = PARAMS["rbf"]
    pts = make_points(4, 3, 5)
    f = pack_force(pts, m_pad=4, b_pad=4)
    K0 = np.asarray(kernels.kff(f, f, params, "rbf", 2))
    K1 = np.asarray(kernels.kff(f, f, params, "rbf", 2, fast=True))
    scale = np.abs(K0).max()
    assert np.abs(K1 - K0).max() / scale < 2e-2


def test_kff_self_symmetric_matches():
    params = PARAMS["rbf"]
    pts = make_points(8, 3, 5)
    f = pack_force(pts, m_pad=8, b_pad=4)
    K0 = np.asarray(kernels.kff(f, f, params, "rbf", 2))
    K1 = np.asarray(kernels.kff_self(f, params, "rbf", 2, point_chunk=2))
    np.testing.assert_allclose(K1, K0, rtol=1e-12, atol=1e-13)
    K2 = np.asarray(kernels.kff_self(f, params, "rbf", 2, point_chunk=4))
    np.testing.assert_allclose(K2, K0, rtol=1e-12, atol=1e-13)


def test_lml_style_gradient_through_chunked_blocks():
    """Hyperparameter gradients flow through the checkpointed chunked
    paths and match the unchunked gradients."""
    pts = make_points(4, 3, 5)
    e = pack_energy([(x, el) for x, _, el in pts], m_pad=4, a_pad=4)
    f = pack_force(pts, m_pad=4, b_pad=4)

    def loss(params, rc):
        K = kernels.k_self(e, f, params, "rbf", 2, row_chunk=rc)
        return jnp.sum(jnp.tanh(K))

    g0 = jax.grad(loss)(PARAMS["rbf"], 0)
    g2 = jax.grad(loss)(PARAMS["rbf"], 2)
    np.testing.assert_allclose(float(g2["sigma"]), float(g0["sigma"]),
                               rtol=1e-10)
    np.testing.assert_allclose(float(g2["l"]), float(g0["l"]), rtol=1e-10)
