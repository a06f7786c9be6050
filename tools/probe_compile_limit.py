#!/usr/bin/env python
"""Bisect the axon compile-helper failure at large covariance sizes.

`tools/scale_ceiling.py 30000` dies in the REMOTE COMPILE HELPER
(HTTP 500, subprocess exit 1) before anything runs on the chip.  This
probe separates "program too large for the helper" from "HBM too small
for the buffers" by compiling a minimal n x n cholesky+solve at growing
n, then the real fit program at the same n.

Usage: python tools/probe_compile_limit.py [mode] [n ...]
  mode: chol | fit   (default chol)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("GPR_CALC_TPU_X64", "0")

import numpy as np  # noqa: E402


def probe_chol(n):
    """Minimal large-buffer program: O(n^2) HBM, one cho_factor+solve."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import cho_factor, cho_solve

    @jax.jit
    def prog(d, y):
        K = jnp.eye(n, dtype=jnp.float32) * d[:, None]
        c = cho_factor(K + 0.01 * jnp.eye(n, dtype=jnp.float32),
                       lower=True)
        return jnp.sum(cho_solve(c, y))

    d = jnp.ones((n,), jnp.float32)
    y = jnp.ones((n,), jnp.float32)
    t0 = time.time()
    try:
        v = float(prog(d, y))
        print(f"PROBE chol n={n}: OK v={v:.3g} "
              f"wall={time.time()-t0:.1f}s", flush=True)
        return True
    except Exception as exc:
        print(f"PROBE chol n={n}: FAILED {type(exc).__name__}: "
              f"{str(exc)[:200]}", flush=True)
        return False


def probe_fit(n):
    from tools.scale_ceiling import run_point
    return run_point(n, nll=False)


def _bench_data(n):
    import jax.numpy as jnp
    from gpr_calculator_tpu.ops.packing import EnergyData, ForceData
    m_f = n // 10 * 3
    m_e = n - 3 * m_f
    dt = jnp.float32
    rng = np.random.RandomState(0)
    D, a_e, b_f = 30, 32, 32
    e = EnergyData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (m_e, a_e, D)), dt),
        ele=jnp.asarray(rng.choice([13, 79], (m_e, a_e)), jnp.int32),
        counts=jnp.full((m_e,), float(a_e), dt),
        nreal=jnp.asarray(m_e, jnp.int32))
    f = ForceData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (m_f, b_f, D)), dt),
        dxdr=jnp.asarray(rng.uniform(-1, 1, (m_f, b_f, D, 3)), dt),
        ele=jnp.asarray(rng.choice([13, 79], (m_f, b_f)), jnp.int32),
        nreal=jnp.asarray(m_f, jnp.int32))
    return e, f


def probe_build(n, impl="pallas"):
    """Just the covariance build (k_self) at bench proportions, no
    factorisation -- separates Pallas/Mosaic failures from solve-side
    program size."""
    import jax.numpy as jnp
    os.environ["GPR_CALC_TPU_KFF"] = impl
    os.environ["GPR_CALC_TPU_KFF_PRECISION"] = "bf16x4"
    from gpr_calculator_tpu.ops import kernels as K_ops
    e, f = _bench_data(n)
    params = {"sigma": jnp.asarray(2.0, jnp.float32),
              "l": jnp.asarray(1.0, jnp.float32)}
    t0 = time.time()
    try:
        K = K_ops.k_self(e, f, params, "rbf", 2)
        s = float(jnp.sum(K[:8, :8]))
        print(f"PROBE build[{impl}] n={n}: OK s={s:.3g} "
              f"wall={time.time()-t0:.1f}s", flush=True)
        return True
    except Exception as exc:
        print(f"PROBE build[{impl}] n={n}: FAILED {type(exc).__name__}: "
              f"{str(exc)[:200]}", flush=True)
        return False


def probe_mem(n, prog="build"):
    """Compile-only: lower the build (or full fit) at size n and print
    XLA's memory analysis -- validates the compile at sizes too big to
    execute and attributes HBM (temp vs output) without allocating."""
    import jax
    import jax.numpy as jnp
    os.environ["GPR_CALC_TPU_KFF"] = "pallas"
    os.environ["GPR_CALC_TPU_KFF_PRECISION"] = "bf16x4"
    from gpr_calculator_tpu.ops import kernels as K_ops
    from gpr_calculator_tpu.models.gp import _factorize
    e, f = _bench_data(n)
    params = {"sigma": jnp.asarray(2.0, jnp.float32),
              "l": jnp.asarray(1.0, jnp.float32)}
    t0 = time.time()
    try:
        if prog == "build":
            fn = jax.jit(lambda e_, f_, p_: K_ops.k_self(
                e_, f_, p_, "rbf", 2, symmetric=True))
            c = fn.lower(e, f, params).compile()
        elif prog == "dual":
            # the analytic-NLL covariance pass (K + dK/dl in one fused
            # kernel, 18 output planes) -- isolates whether the NLL's
            # compile-helper failure is the dual Mosaic kernel or the
            # surrounding trace/solve program
            fn = jax.jit(lambda e_, f_, p_: K_ops.k_self_dual(
                e_, f_, p_, 2))
            c = fn.lower(e, f, params).compile()
        elif prog == "nll":
            # the FULL analytic NLL+grad step (dual build + factor +
            # trace/solve) -- the program that crashes the axon compile
            # helper at 30k while the dual build alone compiles
            from gpr_calculator_tpu.models.gp import _nll_rbf_analytic
            y = jnp.zeros((n,), jnp.float32)
            nf = jnp.asarray([0.01, 0.1], jnp.float32)
            fn = jax.jit(lambda t, e_, f_, y_: _nll_rbf_analytic(
                t, e_, f_, y_, nf, 10.0, 2, False, 8))
            theta = jnp.asarray([2.0, 1.0], jnp.float32)
            c = fn.lower(theta, e, f, y).compile()
        else:
            y = jnp.zeros((n,), jnp.float32)
            fn = jax.jit(lambda e_, f_, y_, p_: _factorize(
                e_, f_, y_, p_, jnp.asarray(0.01, jnp.float32),
                jnp.asarray(0.1, jnp.float32), "rbf", 2, 8))
            c = fn.lower(e, f, y, params).compile()
        m = c.memory_analysis()
        gb = 2.0 ** -30
        print(f"PROBE mem[{prog}] n={n}: OK compile="
              f"{time.time()-t0:.0f}s temp={m.temp_size_in_bytes*gb:.2f}"
              f" out={m.output_size_in_bytes*gb:.2f}"
              f" arg={m.argument_size_in_bytes*gb:.2f}"
              f" peak~={(m.temp_size_in_bytes+m.output_size_in_bytes+m.argument_size_in_bytes)*gb:.2f} GiB",
              flush=True)
        return True
    except Exception as exc:
        print(f"PROBE mem[{prog}] n={n}: FAILED {type(exc).__name__}: "
              f"{str(exc)[:300]}", flush=True)
        return False


if __name__ == "__main__":
    args = sys.argv[1:]
    mode = args[0] if args and not args[0].isdigit() else "chol"
    ns = [int(a) for a in args if a.isdigit()] or [22000, 26000, 30000]
    for n in ns:
        if mode == "chol":
            probe_chol(n)
        elif mode in ("pallas", "xla"):
            probe_build(n, impl=mode)
        elif mode in ("mem", "memfit", "memdual", "memnll"):
            probe_mem(n, {"mem": "build", "memfit": "fit",
                          "memdual": "dual", "memnll": "nll"}[mode])
        else:
            probe_fit(n)
