"""Error/timing decomposition of mixed (f32) serving on the pd4-RBF
artifact, to size the df64 (compensated-f32) serving design.

Measures, against an exact f64 host-CPU build of the same cross-covariance
rows:
  1. the mixed (all-f32) build delta on the mean          -- current state
  2. f32 pair math + f64 reduction/accumulation delta     -- candidate fix
  3. per-phase wall times of each build on the TPU
Run on the real chip:  python tools/probe_df64.py [N_max]
"""
import os
import sys
import time

os.environ.setdefault("GPR_CALC_TPU_SERVE_HOST", "0")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpr_calculator_tpu import GP
from gpr_calculator_tpu.models.gp import (
    _predict_packed, pack_energy, pack_force, bucket_size)
from gpr_calculator_tpu.ops import kernels as K_ops


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    t0 = time.time()
    gp = GP.load("/root/reference/examples/database/pd4-RBF.json",
                 N_max=n_max, row_chunk=32,
                 log_file="/tmp/probe_df64.log")
    print(f"# load: {time.time()-t0:.1f}s")
    t0 = time.time()
    gp.fit(opt=False, show=False)
    print(f"# fit: {time.time()-t0:.1f}s  noise_e={gp.noise_e}")

    te, tf, nE, nF = gp._train_view()
    print(f"# train view: nE={nE} nF={nF} te.m={te.m} tf.m={tf.m} "
          f"envsE={te.x.shape} envsF={tf.x.shape}")
    alpha = gp.alpha_
    print(f"# ||alpha||_1 = {float(jnp.abs(alpha).sum()):.3e}, "
          f"sigma^2 = {float(gp.kernel.parameters()[0])**2:.1f}")

    # prediction points: 2 energy + 2 force training points (same as
    # _refresh_mixed_measurement)
    energy_pts = list(gp._energy_pts[:2])
    force_pts = list(gp._force_pts[:2])
    d = te.d
    pe = pack_energy(energy_pts, d=d)
    b_max = max((p[0].shape[0] for p in force_pts), default=1)
    pf = pack_force(force_pts, d=d, b_pad=bucket_size(b_max, 4))
    params = gp.kernel.jax_params()
    kk = (gp.kernel.kind, gp.kernel.zeta)
    L_fac, rows = gp._serve_factor()
    chunk_mixed = gp._serving_chunk(pf, tf, True)
    chunk_full = gp._serving_chunk(pf, tf, False)

    # exact f64 reference on host CPU
    cpu = jax.devices("cpu")[0]
    ops_h = jax.device_put((pe, pf, te, tf, params, alpha, L_fac), cpu)
    pe_h, pf_h, te_h, tf_h, params_h, alpha_h, L_h = ops_h
    with jax.default_device(cpu):
        m_ref, _ = _predict_packed(pe_h, pf_h, te_h, tf_h, params_h,
                                   alpha_h, L_h, *kk, False, chunk_full,
                                   False, True, rows=jax.device_put(rows, cpu))
    m_ref = np.asarray(m_ref)
    nrows = pe.m + 3 * pf.m
    print(f"# exact f64 host reference built ({nrows} rows)")

    def run(tag, mixed, compensated=None, n_time=3):
        env = {}
        if compensated is not None:
            os.environ["GPR_CALC_TPU_COMPENSATED"] = compensated
        try:
            m, _ = _predict_packed(pe, pf, te, tf, params, alpha, L_fac,
                                   *kk, False,
                                   chunk_mixed if mixed else chunk_full,
                                   mixed, True, rows=rows)
            jax.block_until_ready(m)
            ts = []
            for _ in range(n_time):
                t0 = time.time()
                m, _ = _predict_packed(pe, pf, te, tf, params, alpha,
                                       L_fac, *kk, False,
                                       chunk_mixed if mixed else chunk_full,
                                       mixed, True, rows=rows)
                jax.block_until_ready(m)
                ts.append(time.time() - t0)
            delta = np.abs(np.asarray(m) - m_ref)
            print(f"# {tag}: delta_max={delta.max():.3e} "
                  f"delta_mean_row0={delta[0]:.3e} "
                  f"t={min(ts)*1e3:.0f} ms")
        finally:
            os.environ.pop("GPR_CALC_TPU_COMPENSATED", None)
        return

    run("mixed f32 (current)", mixed=True)
    run("exact f64 on-device (emulated)", mixed=False, n_time=1)


if __name__ == "__main__":
    main()
