#!/usr/bin/env python
"""Regenerate NEB_PROTOCOL_r{N}.json: the on-the-fly protocol record.

Reproduces the reference's published H2S-NEB protocol table
(/root/reference/README.md:100-133) on the bundled Au/Al(100) EMT
workload: hybrid-dispatch counts (base / surrogate / fits) across an
etol sweep plus the batched-evaluator variant.  Dispatch counts are
hardware-independent (the dispatcher's decisions depend only on model
state); wall times here are the CPU run -- TPU walls land in the bench
artifact via bench_serve.

Usage:  python tools/neb_protocol.py [round_tag]   (writes
NEB_PROTOCOL_{tag}.json at the repo root; default tag r04)
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=2")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gpr_calculator_tpu import (EMT, GP, GPR, get_images,  # noqa: E402
                                neb_calc)

INIT = "/root/reference/examples/database/initial.traj"
FINAL = "/root/reference/examples/database/final.traj"


def run_one(etol: float, batched: bool) -> dict:
    images = get_images(INIT, FINAL, num_images=5)
    n_at = len(images[0])
    gp = GP.set_GPR(images, EMT(), noise_e=etol / n_at, noise_f=0.05)
    calc = GPR(base=EMT(), ff=gp, save=False)
    calc.verbose = False
    t0 = time.time()
    neb = neb_calc(images, calc, fmax=0.05, steps=150, batched=batched)
    wall = time.time() - t0
    return {
        "etol": etol,
        "batched": batched,
        "base_calls": int(gp.use_base),
        "surrogate_calls": int(gp.use_surrogate),
        "gpr_fits": int(gp.fits),
        "barrier_eV": round(float(max(neb.energies) - neb.energies[0]),
                            4),
        "converged": bool(neb.converged),
        "opt_steps": int(neb.nsteps),
        "pure_base_equivalent_calls": int(gp.use_base
                                          + gp.use_surrogate),
        "wall_s_cpu": round(wall, 1),
    }


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    runs = [run_one(0.05, False), run_one(0.05, True),
            run_one(0.1, False), run_one(0.2, False)]
    rec = {
        "workload": "Au/Al(100) EMT on-the-fly NEB, 5 images, fmax=0.05 "
                    "(reference protocol analogue: "
                    "/root/reference/README.md:100-133)",
        "note": "dispatch counts are hardware-independent (the hybrid "
                "dispatcher's decisions depend only on model state); "
                "wall times here are the 2-device virtual-CPU run -- "
                "TPU walls land in BENCH_{}.json's neb_counts via "
                "bench_serve".format(tag),
        "runs": runs,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"NEB_PROTOCOL_{tag}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    for r in runs:
        print(r)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
