#!/usr/bin/env python
"""Headline benchmark: kernel-matrix build + Cholesky solve per GPR fit call
at the BASELINE scale (1000 training structures, ~10k x 10k covariance;
/root/repo/BASELINE.md).

Prints ONE json line:
  {"metric": ..., "value": <ms per fit call>, "unit": "ms",
   "vs_baseline": <speedup vs 64-rank MPI CPU reference>, ...}
value = min over >=5 timed calls; the median and the 2x-scale point
("large_scale") ride along as extra keys.

Baseline methodology: the reference's own C++ force-force kernel
(rbf_kff_many, the hot loop at >95% of the fit cost) is compiled with
g++ -O3 -march=native and timed single-core on a slice of the identical
workload, then scaled linearly to the full pair count and divided by 64
(perfect 64-rank MPI scaling -- generous to the reference, which actually
gathers/broadcasts through rank 0).  vs_baseline = baseline_ms / our_ms.

Run on TPU in float32 (HIGHEST matmul precision = f32-accurate 6-pass);
the f64 parity path is exercised by the CPU test suite.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

_SCALE = os.environ.get("GPR_BENCH_SCALE", "full")
SMALL = _SCALE == "small"

# Wall-clock guard: the driver runs this script with a bounded timeout at
# round end, and a single cold-cache remote TPU compile can cost 400+ s
# (measured: the XLA 'sym' comparison program, 464 s).  The headline
# (fused Pallas build + C++ reference baseline) always runs; everything
# else (extra impls, per-iteration NLL timings, the 2x-scale point) is
# skipped once the budget is spent so the JSON line is always printed.
_T0 = time.time()
_BUDGET_S = float(os.environ.get("GPR_BENCH_BUDGET_S", "1200"))


def _over_budget(phase):
    if time.time() - _T0 > _BUDGET_S:
        print(f"# budget ({_BUDGET_S:.0f}s) spent -- skipping {phase}",
              file=sys.stderr)
        return True
    return False

# workload shape: 1000 energy points (32 envs), 3000 force points (32 envs),
# d=30 (SO3 nmax=3, lmax=4) -> covariance (1000 + 9000)^2.
# "large" doubles the structure count (20k x 20k covariance, 2x the
# BASELINE target scale) to demonstrate headroom.
_SHAPES = {"small": ((64, 16), (128, 16), 16),
           "full": ((1000, 32), (3000, 32), 8),
           "large": ((2000, 32), (6000, 32), 8)}
D = 30
N_RANKS_BASELINE = 64
N_SAMPLES = 5


def shape_of(scale):
    return _SHAPES.get(scale, _SHAPES["full"])


def make_data(dtype, scale):
    import jax.numpy as jnp
    from gpr_calculator_tpu.ops.packing import EnergyData, ForceData

    (m_e, a_e), (m_f, b_f), _ = shape_of(scale)
    rng = np.random.RandomState(0)
    e = EnergyData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (m_e, a_e, D)), dtype),
        ele=jnp.asarray(rng.choice([13, 79], (m_e, a_e)), jnp.int32),
        counts=jnp.full((m_e,), float(a_e), dtype),
        nreal=jnp.asarray(m_e, jnp.int32))
    f = ForceData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (m_f, b_f, D)), dtype),
        dxdr=jnp.asarray(rng.uniform(-1, 1, (m_f, b_f, D, 3)), dtype),
        ele=jnp.asarray(rng.choice([13, 79], (m_f, b_f)), jnp.int32),
        nreal=jnp.asarray(m_f, jnp.int32))
    return e, f


def _stats(samples):
    s = sorted(samples)
    return {"min_ms": s[0] * 1e3, "median_ms": s[len(s) // 2] * 1e3,
            "n": len(s)}


def bench_tpu(scale):
    import jax
    # 'highest' (6-pass f32) for the XLA paths: at plain bf16 matmul
    # precision the covariance error exceeds the noise floor and the
    # Cholesky fails.  The Pallas paths control their own in-kernel
    # matmul precision via consistently-rounded operands (exact-Gram
    # construction, kff_pallas module docstring), which is how the
    # pallas/pallas_bf16 impls stay PSD at fewer MXU passes.
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from gpr_calculator_tpu.ops import kernels as K_ops
    from gpr_calculator_tpu.models.gp import _noise_diag

    (m_e, a_e), (m_f, b_f), row_chunk = shape_of(scale)
    dtype = jnp.float32
    e, f = make_data(dtype, scale)
    params = {"sigma": jnp.asarray(2.0, dtype), "l": jnp.asarray(1.0, dtype)}
    y = jnp.asarray(np.random.RandomState(1).randn(e.m + 3 * f.m) * 0.1,
                    dtype)

    import functools

    sym_chunk = 150 if scale != "small" else 32

    @functools.partial(jax.jit, static_argnames=("impl",))
    def fit_call(e, f, y, params, impl="xla"):
        if impl.startswith("pallas"):
            # fused Pallas blocks via the shared-operand assembly (the
            # production k_self path): one consistent Gram, PSD by
            # construction at any matmul-precision mode
            K = K_ops.k_self(e, f, params, "rbf", 2, row_chunk=row_chunk,
                             symmetric=True)
        else:
            K_ee = K_ops.kee(e, e, params, "rbf", 2, row_chunk=row_chunk)
            if impl == "sym":
                K_ef = K_ops.kef(e, f, params, "rbf", 2,
                                 row_chunk=row_chunk)
                K_ff = K_ops.kff_self(f, params, "rbf", 2,
                                      point_chunk=sym_chunk)
            else:
                K_ef = K_ops.kef(e, f, params, "rbf", 2,
                                 row_chunk=row_chunk)
                K_ff = K_ops.kff(f, f, params, "rbf", 2,
                                 row_chunk=row_chunk)
            top = jnp.concatenate([K_ee, K_ef], axis=1)
            bot = jnp.concatenate([K_ef.T, K_ff], axis=1)
            K = jnp.concatenate([top, bot], axis=0)
        idx = jnp.arange(K.shape[0])
        K = K.at[idx, idx].add(_noise_diag(e, f,
                                           jnp.asarray(0.01, dtype),
                                           jnp.asarray(0.1, dtype)))
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
        return jnp.sum(alpha), jnp.sum(jnp.log(jnp.diagonal(L)))

    def timed(impl):
        if impl.startswith("pallas"):
            os.environ["GPR_CALC_TPU_KFF"] = "pallas"
            os.environ["GPR_CALC_TPU_KFF_PRECISION"] = (
                "bf16" if impl == "pallas_bf16" else "bf16x4")
            # k_self silently falls back to XLA when the gate rejects --
            # never report an XLA timing under a 'pallas' label
            if not K_ops._use_pallas_kff(f, "rbf", e):
                raise RuntimeError(
                    "pallas gate rejected the bench shapes; refusing to "
                    "mislabel the XLA fallback")
        t0 = time.time()
        s, logdet = fit_call(e, f, y, params, impl=impl)
        s = float(s)
        compile_and_first = time.time() - t0
        if not (np.isfinite(s) and np.isfinite(float(logdet))):
            raise FloatingPointError(f"non-finite output: {s}")
        samples = []
        for i in range(N_SAMPLES):
            p = {"sigma": params["sigma"] * (1 + 1e-4 * i),
                 "l": params["l"]}
            t0 = time.time()
            s2, _ = fit_call(e, f, y, p, impl=impl)
            float(s2)
            samples.append(time.time() - t0)
        st = _stats(samples)
        st["compile_s"] = compile_and_first
        return st

    # 'pallas' is the fused production build at the default bf16x4 matmul
    # mode (f32-equivalent: exact Gram of bf16-pair-rounded inputs);
    # 'pallas_bf16' is the documented fast mode (exact Gram of
    # bf16-rounded inputs, ~2e-3 input perturbation -- inside the GPR
    # noise assumption but not f32-identical, so it is reported but NOT
    # eligible for the headline unless GPR_BENCH_ALLOW_BF16=1).  The
    # plain-XLA comparison point 'sym' (upper-triangle chunk pairs, ~6x
    # slower; measured 1950 ms at the 10k scale) is opt-in via
    # GPR_BENCH_IMPLS -- its cold-cache compile alone costs ~460 s.
    impls = os.environ.get("GPR_BENCH_IMPLS",
                           "pallas,pallas_bf16").split(",")
    results = {}
    for impl in impls:
        if results and _over_budget(f"impl {impl}"):
            break
        try:
            results[impl] = timed(impl)
            print(f"# [{scale}] {impl}: {results[impl]['min_ms']:.0f} ms "
                  f"(median {results[impl]['median_ms']:.0f}, "
                  f"compile {results[impl]['compile_s']:.0f}s)",
                  file=sys.stderr)
        except Exception as exc:
            print(f"# {impl} path failed: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", file=sys.stderr)
    if not results:
        # fall back to the plain XLA path
        results["xla"] = timed("xla")

    # the full training-step cost per L-BFGS iteration: RBF through the
    # fused dual (K, dK/dgamma) pass, Dot through the gradient-free
    # analytic build (round-2 VERDICT item 4: Dot must be within 2x of
    # RBF) -- both are the programs GP.fit actually runs
    def _best(results):
        eligible = {k: v for k, v in results.items()
                    if k != "pallas_bf16"
                    or os.environ.get("GPR_BENCH_ALLOW_BF16") == "1"}
        return min(eligible or results,
                   key=lambda k: (eligible or results)[k]["min_ms"])

    nll_ms = {}
    if scale == "large" or _over_budget("nll+grad timings"):
        return results, _best(results), {}
    try:
        from gpr_calculator_tpu.models.gp import (_nll_dot_analytic,
                                                  _nll_rbf_analytic)
        os.environ["GPR_CALC_TPU_KFF"] = "pallas"
        os.environ["GPR_CALC_TPU_KFF_PRECISION"] = "bf16x4"
        from gpr_calculator_tpu.models.gp import (_default_n_probe,
                                                  _resolve_trace_mode)
        nf = jnp.asarray([0.01, 0.1], dtype)
        # the mode GP.fit would resolve at this row count (hutch at and
        # above _HUTCH_MIN_N, behind the measured-bias gate) is the
        # production record; the exact scan is timed alongside so the
        # estimator's saving is visible in the artifact
        prod_mode = _resolve_trace_mode(e.m + 3 * f.m)
        modes = [prod_mode] + (["exact"] if prod_mode != "exact" else [])
        for name, fn, th0 in (
                ("rbf", _nll_rbf_analytic, [2.0, 1.0]),
                ("dot", _nll_dot_analytic, [2.0, 1.5])):
            theta = jnp.asarray(th0, dtype)
            for mode in modes:
                key = name if mode == prod_mode else f"{name}_{mode}"
                try:
                    float(fn(theta, e, f, y, nf, 10.0, 2, False, row_chunk,
                             trace_mode=mode, n_probe=_default_n_probe())[0])
                    ts = []
                    for i in range(N_SAMPLES):
                        th = theta * (1 + 1e-4 * i)
                        t0 = time.time()
                        float(fn(th, e, f, y, nf, 10.0, 2, False, row_chunk,
                                 trace_mode=mode,
                                 n_probe=_default_n_probe())[0])
                        ts.append(time.time() - t0)
                except Exception as exc:
                    print(f"# nll+grad {name} ({mode}) failed: "
                          f"{type(exc).__name__}: {str(exc)[:160]}",
                          file=sys.stderr)
                    continue
                nll_ms[key] = _stats(ts)
                print(f"# [{scale}] nll+grad {name} ({mode}): "
                      f"{nll_ms[key]['min_ms']:.0f} ms per L-BFGS "
                      f"iteration (median {nll_ms[key]['median_ms']:.0f})",
                      file=sys.stderr)
    except Exception as exc:
        print(f"# nll+grad measurement skipped: {type(exc).__name__}: "
              f"{str(exc)[:160]}", file=sys.stderr)

    return results, _best(results), nll_ms


def workload_flops(scale):
    """Algorithmic FLOPs of one fit call (implementation-independent:
    rectangular low-rank-Hessian K_FF build + Cholesky), for the MFU line."""
    (m_e, a_e), (m_f, b_f), _ = shape_of(scale)
    n_env_f = m_f * b_f
    n_env_e = m_e * a_e
    d = D
    # K_FF: per env pair, 4 d-contractions over {u,J} blocks (2*16*d) plus
    # ~8 assembly ops on the 3x3 block
    f_ff = n_env_f ** 2 * (32 * d + 72)
    # K_EF: env-pair kernel + d-contraction for the gradient row
    f_ef = 2 * n_env_e * n_env_f * (8 * d + 10)
    f_ee = n_env_e ** 2 * (2 * d + 10)
    n_rows = m_e + 3 * m_f
    f_chol = n_rows ** 3 / 3
    return f_ff + f_ef + f_ee + f_chol


# ---------------------------------------------------------------------------
# baseline: the reference's C++ kff kernel, single core, scaled
# ---------------------------------------------------------------------------

def bench_reference_cpp(scale):
    """Measure rbf_kff_many (the reference hot loop) on a slice of the same
    workload; returns the extrapolated full-workload single-core ms, or
    None when the reference sources are unavailable."""
    src = "/root/reference/gpr_calc/kernels/rbf_kernel.cpp"
    if not os.path.exists(src):
        return None
    (m_e, a_e), (m_f, b_f), _ = shape_of(scale)
    try:
        with tempfile.TemporaryDirectory() as td:
            lib_path = os.path.join(td, "librbf.so")
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 src, "-o", lib_path],
                check=True, capture_output=True, timeout=180)
            import ctypes
            lib = ctypes.CDLL(lib_path)
            lib.rbf_kff_many.restype = None

            rng = np.random.RandomState(0)
            n2 = m_f * b_f                     # full rhs env count
            n1 = 64 if scale != "small" else 32    # lhs slice
            d = D
            x1 = np.ascontiguousarray(rng.uniform(0.2, 1, (n1, d)))
            x2 = np.ascontiguousarray(rng.uniform(0.2, 1, (n2, d)))
            dx1 = np.ascontiguousarray(rng.uniform(-1, 1, (n1, d, 3)))
            dx2 = np.ascontiguousarray(rng.uniform(-1, 1, (n2, d, 3)))
            ele1 = np.ascontiguousarray(
                rng.choice([13, 79], n1).astype(np.int32))
            ele2 = np.ascontiguousarray(
                rng.choice([13, 79], n2).astype(np.int32))
            inds1 = np.ascontiguousarray(
                (np.arange(n1) // b_f).astype(np.int32))
            inds2 = np.ascontiguousarray(
                (np.arange(n2) // b_f).astype(np.int32))
            m1 = n1 // b_f + 1
            m2 = m_f
            out = np.zeros((m1 * 3, m2 * 3))

            def cptr(a):
                return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

            def iptr(a):
                return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

            def run_once():
                t0 = time.time()
                lib.rbf_kff_many(
                    ctypes.c_int(n1), ctypes.c_int(n2), ctypes.c_int(0),
                    ctypes.c_int(n2), ctypes.c_int(d), ctypes.c_int(m2),
                    ctypes.c_double(2.0), ctypes.c_double(4.0),
                    ctypes.c_double(1.0), ctypes.c_double(1e-12),
                    cptr(x1), cptr(dx1), iptr(ele1), iptr(inds1),
                    cptr(x2), cptr(dx2), iptr(ele2), iptr(inds2),
                    cptr(out))
                return time.time() - t0

            # min of two runs: the fastest sample has the least scheduler
            # noise (and is the conservative choice for the speedup ratio)
            slice_s = min(run_once(), run_once())
            # extrapolate: full lhs env count is m_f * b_f
            full_single_core_ms = slice_s * (m_f * b_f / n1) * 1e3
            return full_single_core_ms
    except Exception as exc:  # pragma: no cover
        print(f"# baseline measurement unavailable: {exc}", file=sys.stderr)
        return None


PEAK_F32_TFLOPS = 49.2   # v5e MXU, fp32 passes (bf16 peak 197 / 4)


def run_scale(scale, baseline_single_ms=None):
    """One scale's full measurement: returns the JSON-able record.

    baseline_single_ms: reuse an already-measured single-core reference
    time from another scale, rescaled by the env-pair-count ratio (the
    same linear-in-work extrapolation bench_reference_cpp itself uses) --
    avoids a second g++ compile + multi-second C++ run inside the budget.
    """
    results, best_impl, nll_ms = bench_tpu(scale)
    best = results[best_impl]
    if baseline_single_ms is None:
        baseline_single_ms = bench_reference_cpp(scale)
    if baseline_single_ms is not None:
        baseline_ms = baseline_single_ms / N_RANKS_BASELINE
        vs = baseline_ms / best["min_ms"]
    else:
        baseline_ms = None
        vs = None
    flops = workload_flops(scale)
    tflops = flops / (best["min_ms"] * 1e-3) / 1e12
    mfu = tflops / PEAK_F32_TFLOPS
    (m_e, a_e), (m_f, b_f), _ = shape_of(scale)
    print(f"# [{scale}] workload: K=({m_e}+3*{m_f})^2, d={D}, "
          f"envs/pt={a_e}/{b_f}; compile+first={best['compile_s']:.1f}s; "
          f"ref-C++ single-core="
          f"{baseline_single_ms and round(baseline_single_ms)} ms, "
          f"64-rank-ideal={baseline_ms and round(baseline_ms)} ms",
          file=sys.stderr)
    print(f"# [{scale}] impl={best_impl}: {flops/1e12:.2f} TFLOP/fit, "
          f"{tflops:.2f} TFLOP/s achieved, MFU={100*mfu:.1f}% of f32 peak "
          f"({PEAK_F32_TFLOPS} TF)", file=sys.stderr)
    rec = {
        "_baseline_single_ms": baseline_single_ms,
        "value": round(best["min_ms"], 1),
        "median_ms": round(best["median_ms"], 1),
        "n_samples": best["n"],
        "vs_baseline": round(vs, 1) if vs else None,
        "impl": best_impl,
        "achieved_tflops": round(tflops, 2),
        "mfu_f32_pct": round(100 * mfu, 1),
    }
    for name, st in nll_ms.items():
        rec[f"nll_grad_{name}_ms"] = round(st["min_ms"], 1)
    if "rbf" in nll_ms and "dot" in nll_ms:
        rec["dot_vs_rbf_iter_ratio"] = round(
            nll_ms["dot"]["min_ms"] / nll_ms["rbf"]["min_ms"], 2)
    if "pallas_bf16" in results:
        rec["bf16_fast_mode_ms"] = round(
            results["pallas_bf16"]["min_ms"], 1)
    return rec


def bench_serve():
    """On-the-fly workload metrics (round-3 VERDICT item 3): warm
    predict_structure latency at pd4 scale (with/without std), one full
    EMT on-the-fly NEB with its base/surrogate/fit counts -- this
    framework's analogue of the reference's published protocol
    (/root/reference/README.md:100-121: 22 base / 106 surrogate / 4
    fits for the H2S workload; ours is the Au/Al(100) EMT workload the
    examples ship) -- and the batched-NEB per-step latency."""
    serve, neb_counts = {}, {}

    # 1. the headline on-the-fly NEB loop FIRST (serial dispatch with
    #    full counts): the dispatch-count record is the reference-
    #    protocol analogue (round-3 VERDICT item 3) and must land even
    #    if the budget later truncates the other serve points.  The GP's
    #    reference-compatible log protocol prints to stdout; bench
    #    stdout must stay one JSON line, so the workload runs under
    #    redirect_stdout into the log file.
    import contextlib
    init = "/root/reference/examples/database/initial.traj"
    final = "/root/reference/examples/database/final.traj"
    if os.path.exists(init) and not _over_budget("on-the-fly NEB"):
        from gpr_calculator_tpu import EMT, GP, GPR, get_images, neb_calc

        def run_neb(batched):
            with open("/tmp/bench_neb.log", "a") as lf, \
                    contextlib.redirect_stdout(lf):
                images = get_images(init, final, num_images=5)
                gp = GP.set_GPR(images, EMT(), noise_e=0.05 / 13,
                                noise_f=0.05)
                calc = GPR(base=EMT(), ff=gp, save=False)
                t0 = time.time()
                neb = neb_calc(images, calc, fmax=0.05, steps=150,
                               batched=batched)
                wall = time.time() - t0
            return neb, gp, wall

        neb = None
        try:
            neb, gp, wall = run_neb(batched=False)
            barrier = float(np.nanmax(neb.energies) - neb.energies[0])
            neb_counts = {
                "workload": "Au/Al(100) EMT on-the-fly NEB, 5 images",
                "base_calls": int(gp.use_base),
                "surrogate_calls": int(gp.use_surrogate),
                "gpr_fits": int(gp.fits),
                "barrier_eV": round(barrier, 4),
                "converged": bool(neb.converged),
                "opt_steps": int(neb.nsteps),
                # the reference's comparison count: a pure-base NEB costs
                # 2 endpoint + 3-interior-images x steps force calls
                # (/root/reference/README.md:50)
                "pure_base_equivalent_calls": 2 + 3 * int(neb.nsteps),
                "wall_s": round(wall, 1),
            }
            print(f"# neb_counts: base={neb_counts['base_calls']} "
                  f"surrogate={neb_counts['surrogate_calls']} "
                  f"fits={neb_counts['gpr_fits']} "
                  f"barrier={barrier:.4f} eV wall={wall:.0f}s "
                  f"converged={neb_counts['converged']}", file=sys.stderr)
        except Exception as exc:
            print(f"# on-the-fly NEB bench failed: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", file=sys.stderr)

        # 2. warm batched per-step serving latency on the converged
        #    path: ONE predict_structures program over all interior
        #    images -- the steady-state cost of a batched-NEB optimizer
        #    step (the full batched loop below also pays per-bucket
        #    compiles, which through the remote-chip tunnel dominate its
        #    wall; the warm number is the deployment-relevant one)
        if neb is not None:
            try:
                interior = neb.images[1:-1]
                gp.predict_structures(interior, return_std=True)  # warm
                ts = []
                for _ in range(2):
                    t0 = time.time()
                    gp.predict_structures(interior, return_std=True)
                    ts.append(time.time() - t0)
                serve["batched_step_warm_ms"] = round(min(ts) * 1e3, 1)
                print(f"# batched serving, warm: "
                      f"{serve['batched_step_warm_ms']} ms per step "
                      f"({len(interior)} images)", file=sys.stderr)
            except Exception as exc:
                print(f"# warm batched serving point failed: "
                      f"{type(exc).__name__}: {str(exc)[:160]}",
                      file=sys.stderr)

    # 3. the batched on-the-fly NEB IMMEDIATELY after the unbatched
    #    record (round-4 VERDICT item 3: in r04 it sat behind the pd4
    #    point, whose 650 s artifact load spent the budget; the batched
    #    wall is the framework's headline beyond-reference number and
    #    must land on chip).  The pd4 point follows -- it is cheap now
    #    (batched ingest + split-channel serving).
    if os.path.exists(init) and neb_counts:
        if not _over_budget("batched NEB"):
            try:
                neb_b, gp_b, wall_b = run_neb(batched=True)
                serve["batched_neb_step_ms"] = round(
                    wall_b / max(neb_b.nsteps, 1) * 1e3, 1)
                serve["batched_neb_wall_s"] = round(wall_b, 1)
                neb_counts["batched"] = {
                    "base_calls": int(gp_b.use_base),
                    "surrogate_calls": int(gp_b.use_surrogate),
                    "gpr_fits": int(gp_b.fits),
                    "barrier_eV": round(float(np.nanmax(neb_b.energies)
                                              - neb_b.energies[0]), 4),
                    "converged": bool(neb_b.converged),
                    "opt_steps": int(neb_b.nsteps),
                    "wall_s": round(wall_b, 1)}
                print(f"# batched NEB: {wall_b:.0f}s, "
                      f"{serve['batched_neb_step_ms']} ms/step "
                      f"({neb_b.nsteps} steps)", file=sys.stderr)
            except Exception as exc:
                print(f"# batched NEB bench failed: "
                      f"{type(exc).__name__}: {str(exc)[:200]}",
                      file=sys.stderr)

    # 4. warm per-structure serving latency against the bundled
    #    pd4-RBF artifact (tight-energy-noise legacy regime)
    _pd4_serving_point(serve)

    return serve, neb_counts


def _pd4_serving_point(serve):
    """Warm per-structure serving latency against the bundled pd4-RBF
    artifact (real 220-atom periodic cell, 100 structures).  This model
    auto-demotes to exact f64 serving (tight legacy noise floor), so
    each call costs ~10 s on the f64-emulated chip: 2 samples per
    variant keeps the section ~1 min."""
    if _over_budget("pd4 serving point"):
        return
    import contextlib
    try:
        from gpr_calculator_tpu import GP
        from gpr_calculator_tpu.io.ase_db import read_db
        with open("/tmp/bench_pd4_stdout.log", "a") as lf, \
                contextlib.redirect_stdout(lf):
            # GP.load / fit print the reference-compatible log protocol
            # to stdout; bench stdout must stay one JSON line
            gp = GP.load(
                "/root/reference/examples/database/pd4-RBF.json",
                N_max=100, row_chunk=32,
                log_file="/tmp/bench_pd4.log")
            gp.fit(opt=False, show=False)
        struc = read_db(
            "/root/reference/examples/database/pd4-RBF.db")[0]["atoms"]

        def t_pred(std):
            out = gp.predict_structure(struc, return_std=std)  # + compile
            ts = []
            for _ in range(2):
                t0 = time.time()
                out = gp.predict_structure(struc, return_std=std)
                ts.append(time.time() - t0)
            return round(min(ts) * 1e3, 1), out

        serve["pd4_serve_mode_auto"] = gp._serve_mode()
        serve["predict_pd4_ms"], _ = t_pred(False)
        serve["predict_pd4_std_ms"], ref_out = t_pred(True)
        # the split-channel record (round-4 VERDICT item 1): exact-f64
        # energy rows + f32 force rows; per-channel deltas vs exact f64
        # against the artifact's own noise floors
        os.environ["GPR_CALC_TPU_SERVE"] = "f64"
        _, out64 = t_pred(True)
        os.environ["GPR_CALC_TPU_SERVE"] = "split"
        ms_split, out_sp = t_pred(True)
        os.environ.pop("GPR_CALC_TPU_SERVE", None)
        serve["predict_pd4_split_std_ms"] = ms_split
        serve["pd4_split_dE_eV"] = float(abs(out_sp[0] - out64[0]))
        serve["pd4_split_dF_eVA"] = float(
            np.abs(np.asarray(out_sp[1]) - np.asarray(out64[1])).max())
        serve["pd4_split_dE_gate"] = 0.5 * gp.noise_e
        serve["pd4_split_dF_gate"] = 0.5 * gp.noise_f
        serve["pd4_measured_dE"] = getattr(gp, "_mixed_measured", None)
        serve["pd4_measured_dF"] = getattr(gp, "_mixed_measured_f", None)
        print(f"# serve: pd4 predict {serve['predict_pd4_ms']} ms "
              f"(auto={serve['pd4_serve_mode_auto']}), "
              f"with std {serve['predict_pd4_std_ms']} ms; split "
              f"{ms_split} ms dE={serve['pd4_split_dE_eV']:.2e} "
              f"dF={serve['pd4_split_dF_eVA']:.2e}", file=sys.stderr)
    except Exception as exc:
        print(f"# pd4 serving bench skipped: {type(exc).__name__}: "
              f"{str(exc)[:160]}", file=sys.stderr)


def _backend_reachable(timeout_s: float = 240.0) -> bool:
    """Probe backend init in a SUBPROCESS: the axon tunnel, when its
    remote end is down, hangs device enumeration indefinitely inside a C
    call -- without this the driver's bench run times out with no JSON
    at all.  A cleanly-exiting probe does not wedge the device (unlike
    killing an attached client)."""
    code = "import jax; print(len(jax.devices()))"
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True,
                           text=True)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _apply_platform_override():
    """The axon sitecustomize pins jax_platforms at interpreter start,
    so a JAX_PLATFORMS=cpu env override must also update the jax CONFIG
    before the first backend use (CPU smoke runs: test_bench_smoke)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def main():
    _apply_platform_override()
    if os.environ.get("JAX_PLATFORMS", "") == "axon" \
            and not _backend_reachable():
        print("# axon tunnel unreachable: backend init hung >240s",
              file=sys.stderr)
        print(json.dumps({
            "metric": "kernel_build_plus_cholesky_ms_per_fit_10k",
            "value": None, "unit": "ms", "vs_baseline": None,
            "error": "tpu tunnel unreachable (backend init hung)"}))
        return
    rec = run_scale(_SCALE)
    out = {"metric": f"kernel_build_plus_cholesky_ms_per_fit_"
                     f"{'10k' if _SCALE == 'full' else _SCALE}",
           "value": rec["value"], "unit": "ms",
           "vs_baseline": rec["vs_baseline"]}
    out.update({k: v for k, v in rec.items()
                if k not in ("value", "vs_baseline")})
    # if the driver's outer timeout lands mid-phase (the on-the-fly NEB
    # below runs ~10 min end-to-end), still emit what was measured:
    # timeout(1) sends SIGTERM before SIGKILL
    import signal

    def _emit_partial(signum, frame):
        out.pop("_baseline_single_ms", None)
        out["truncated_by_signal"] = int(signum)
        print(json.dumps(out), flush=True)
        sys.exit(0)

    for _sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(_sig, _emit_partial)
    if (_SCALE == "full" and os.environ.get("GPR_BENCH_SKIP_LARGE") != "1"
            and not _over_budget("large-scale point")):
        # the 2x-scale point, in-process (same TPU client; a subprocess
        # would deadlock the axon tunnel)
        try:
            os.environ["GPR_BENCH_IMPLS"] = out["impl"]
            # reuse the measured full-scale C++ baseline: single-core
            # time scales with (lhs envs) x (rhs envs) = (m_f*b_f)^2
            base_full = rec.get("_baseline_single_ms")
            scaled = None
            if base_full:
                (_, _b), (mf_f, bf_f), _ = shape_of("full")
                (_, _b), (mf_l, bf_l), _ = shape_of("large")
                scaled = base_full * ((mf_l * bf_l) / (mf_f * bf_f)) ** 2
            out["large_scale"] = run_scale("large", baseline_single_ms=scaled)
            out["large_scale"].pop("_baseline_single_ms", None)
        except Exception as exc:
            print(f"# large-scale point skipped: {type(exc).__name__}: "
                  f"{str(exc)[:160]}", file=sys.stderr)
    # serve/NEB workload LAST: it is the longest phase (~10 min for the
    # serial + batched on-the-fly loops), and the quick 2x-scale point
    # above must land even when the NEB eats the remaining budget; the
    # SIGTERM handler covers a driver kill mid-NEB
    if (_SCALE == "full" and os.environ.get("GPR_BENCH_SERVE", "1") != "0"
            and not _over_budget("serve/NEB workload")):
        try:
            serve, neb_counts = bench_serve()
            if serve:
                out["serve"] = serve
            if neb_counts:
                out["neb_counts"] = neb_counts
        except Exception as exc:
            print(f"# serve bench skipped: {type(exc).__name__}: "
                  f"{str(exc)[:160]}", file=sys.stderr)
    out.pop("_baseline_single_ms", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
