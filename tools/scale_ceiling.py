#!/usr/bin/env python
"""Measure the single-chip f32 scale ceiling (round-3 VERDICT item 7).

Runs the production fit program (_factorize: sharded-eligible build +
factor + solve) and the analytic NLL step at growing covariance sizes
until the chip refuses, recording wall times and the failure mode.
One TPU client; run alone (the axon tunnel deadlocks on two).

Usage: python tools/scale_ceiling.py [rows ...]   (default sweep)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("GPR_CALC_TPU_X64", "0")

import numpy as np  # noqa: E402


def run_point(n_rows: int, nll: bool):
    import jax.numpy as jnp
    from gpr_calculator_tpu.models.gp import (_factorize,
                                              _nll_rbf_analytic)

    # bench workload proportions: 1 energy : 3 force points
    m_f = n_rows // 10 * 3
    m_e = n_rows - 3 * m_f
    dt = jnp.float32
    os.environ["GPR_CALC_TPU_KFF"] = "pallas"
    os.environ["GPR_CALC_TPU_KFF_PRECISION"] = "bf16x4"
    rng = np.random.RandomState(0)
    from gpr_calculator_tpu.ops.packing import EnergyData, ForceData
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
    y = jnp.asarray(rng.randn(m_e + 3 * m_f) * 0.1, dt)
    params = {"sigma": jnp.asarray(2.0, dt), "l": jnp.asarray(1.0, dt)}
    label = f"n={m_e + 3 * m_f}"
    try:
        t0 = time.time()
        if nll:
            nf = jnp.asarray([0.01, 0.1], dt)
            val, grad = _nll_rbf_analytic(
                jnp.asarray([2.0, 1.0], dt), e, f, y, nf, 10.0, 2,
                False, 8)
            ok = np.isfinite(float(val))
        else:
            L, alpha = _factorize(e, f, y, params,
                                  jnp.asarray(0.01, dt),
                                  jnp.asarray(0.1, dt), "rbf", 2, 8)
            ok = bool(np.all(np.isfinite(np.asarray(alpha))))
        wall = time.time() - t0
        prog = "nll" if nll else "fit"
        print(f"CEILING {prog} {label}: OK finite={ok} "
              f"compile+first={wall:.1f}s", flush=True)
        # warm sample; drop the first run's factor/weights first or the
        # two copies of L coexist and OOM the warm run near the ceiling
        if not nll:
            del L, alpha
        t0 = time.time()
        if nll:
            float(_nll_rbf_analytic(jnp.asarray([2.0002, 1.0], dt), e,
                                    f, y, nf, 10.0, 2, False, 8)[0])
        else:
            p2 = {"sigma": params["sigma"] * 1.0001, "l": params["l"]}
            L, alpha = _factorize(e, f, y, p2, jnp.asarray(0.01, dt),
                                  jnp.asarray(0.1, dt), "rbf", 2, 8)
            float(jnp.sum(alpha))
        print(f"CEILING {prog} {label}: warm={time.time()-t0:.2f}s",
              flush=True)
        return True
    except Exception as exc:
        print(f"CEILING {'nll' if nll else 'fit'} {label}: FAILED "
              f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)
        return False


if __name__ == "__main__":
    only = None
    argv = sys.argv[1:]
    if argv and argv[0] in ("--nll", "--fit"):
        only = argv[0][2:]
        argv = argv[1:]
    args = [int(a) for a in argv]
    if only != "nll":
        for n in (args or [30000, 40000]):
            run_point(n, nll=False)
    if only != "fit":
        for n in (args or [30000, 36000]):
            run_point(n, nll=True)
