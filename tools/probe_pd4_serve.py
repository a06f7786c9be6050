"""On-chip pd4-RBF serving measurement: full-f64 (emulated, on-device
descriptor) vs mixed-f32 -- wall time per predict_structure call and
per-channel (energy/force) mixed-vs-f64 deltas against the artifact's
noise floors.  Run on the real chip: python tools/probe_pd4_serve.py
"""
import contextlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from gpr_calculator_tpu import GP
    from gpr_calculator_tpu.io.ase_db import read_db

    print(f"# backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    with open("/tmp/probe_pd4_stdout.log", "a") as lf, \
            contextlib.redirect_stdout(lf):
        gp = GP.load("/root/reference/examples/database/pd4-RBF.json",
                     N_max=100, row_chunk=32,
                     log_file="/tmp/probe_pd4.log")
    print(f"# load: {time.time() - t0:.1f}s  nE={gp.N_energy} "
          f"nF={gp.N_forces} noise_e={gp.noise_e} noise_f={gp.noise_f}",
          flush=True)
    t0 = time.time()
    with open("/tmp/probe_pd4_stdout.log", "a") as lf, \
            contextlib.redirect_stdout(lf):
        gp.fit(opt=False, show=False)
    print(f"# fit(opt=False): {time.time() - t0:.1f}s", flush=True)
    print(f"# auto resolves to: {gp._serve_mode()} "
          f"(measured e={getattr(gp, '_mixed_measured', None)} "
          f"f={getattr(gp, '_mixed_measured_f', None)}; "
          f"0.5*noise_f={0.5 * gp.noise_f})", flush=True)

    struc = read_db(
        "/root/reference/examples/database/pd4-RBF.db")[0]["atoms"]

    results = {}
    for mode in ("f64", "split", "mixed"):
        os.environ["GPR_CALC_TPU_SERVE"] = mode
        t0 = time.time()
        out = gp.predict_structure(struc, return_std=True)
        cold = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            out = gp.predict_structure(struc, return_std=True)
            ts.append(time.time() - t0)
        E, F, S, E_std, F_std = out
        results[mode] = (E, F, E_std, F_std)
        print(f"# {mode}: cold {cold:.1f}s warm {min(ts)*1e3:.0f} ms  "
              f"E={E:.6f} E_std={E_std:.2e}", flush=True)
    os.environ.pop("GPR_CALC_TPU_SERVE")

    Ef, Ff, Esf, Fsf = results["f64"]
    for mode in ("split", "mixed"):
        Em, Fm, Esm, Fsm = results[mode]
        dE = abs(Em - Ef)
        dF = np.abs(Fm - Ff).max()
        dEs = abs(Esm - Esf)
        dFs = np.abs(Fsm - Fsf).max()
        print(f"# {mode}: dE={dE:.3e} (gate {0.5*gp.noise_e:.3e}, "
              f"ratio {dE/(0.5*gp.noise_e):.3f})  "
              f"dF={dF:.3e} (gate {0.5*gp.noise_f:.3e}, "
              f"ratio {dF/(0.5*gp.noise_f):.3f})", flush=True)
        print(f"#   dE_std={dEs:.3e}  dF_std={dFs:.3e} "
              f"(E_std itself: {Esf:.3e})", flush=True)


if __name__ == "__main__":
    main()
