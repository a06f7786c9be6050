#!/usr/bin/env python
"""Isolate the NLL compile-helper crash: compile ONLY the
_scan_diag_and_trace program (cho_solve of an (n, 2048) block inside a
lax.scan) at covariance size n, no kernel build attached.

The full analytic NLL crashes the axon remote-compile helper (HTTP 500,
subprocess exit 1) at n >= 20000 while the fit program (build + factor
+ solve, no scan) compiles at 30000 -- this probe pins whether the scan
is the offending sub-program.

Usage: python tools/probe_scan_trace.py [blk] [n ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("GPR_CALC_TPU_X64", "0")

import numpy as np  # noqa: E402


def probe(n, blk=None):
    import jax
    import jax.numpy as jnp
    from gpr_calculator_tpu.models import gp as gp_mod

    if blk:
        gp_mod._TRACE_BLK = blk

    def prog(L, Kd):
        kinv_diag, tr = gp_mod._scan_diag_and_trace(
            L, n,
            lambda X, cols: jnp.vdot(
                X, Kd[:, jnp.clip(cols, 0, n - 1)]))
        return jnp.sum(kinv_diag) + tr

    fn = jax.jit(prog)
    L = jnp.eye(n, dtype=jnp.float32)
    Kd = jnp.zeros((n, n), jnp.float32)
    t0 = time.time()
    try:
        c = fn.lower(L, Kd).compile()
        m = c.memory_analysis()
        gb = 2.0 ** -30
        print(f"PROBE scan n={n} blk={gp_mod._TRACE_BLK}: OK "
              f"compile={time.time()-t0:.0f}s "
              f"temp={m.temp_size_in_bytes*gb:.2f} "
              f"out={m.output_size_in_bytes*gb:.2f} GiB", flush=True)
        return True
    except Exception as exc:
        print(f"PROBE scan n={n} blk={gp_mod._TRACE_BLK}: FAILED "
              f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)
        return False


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    blk = None
    if args and args[0] < 8192:
        blk, args = args[0], args[1:]
    for n in (args or [20000, 26000]):
        probe(n, blk)
