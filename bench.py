#!/usr/bin/env python
"""Headline benchmark: kernel-matrix build + Cholesky solve per GPR fit call
at the BASELINE scale (1000 training structures, ~10k x 10k covariance;
/root/repo/BASELINE.md).

Prints ONE json line:
  {"metric": ..., "value": <ms per fit call>, "unit": "ms",
   "vs_baseline": <speedup vs 64-rank MPI CPU reference>}

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

# workload shape: 1000 energy points (32 envs), 3000 force points (32 envs),
# d=30 (SO3 nmax=3, lmax=4) -> covariance (1000 + 9000)^2.
# GPR_BENCH_SCALE=large doubles the structure count (20k x 20k covariance,
# 2x the BASELINE target scale) to demonstrate headroom.
_SHAPES = {"small": ((64, 16), (128, 16), 16),
           "full": ((1000, 32), (3000, 32), 8),
           "large": ((2000, 32), (6000, 32), 8)}
(M_E, A_E), (M_F, B_F), ROW_CHUNK = _SHAPES.get(_SCALE, _SHAPES["full"])
D = 30
N_RANKS_BASELINE = 64


def make_data(dtype):
    import jax.numpy as jnp
    from gpr_calculator_tpu.ops.packing import EnergyData, ForceData

    rng = np.random.RandomState(0)
    e = EnergyData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (M_E, A_E, D)), dtype),
        ele=jnp.asarray(rng.choice([13, 79], (M_E, A_E)), jnp.int32),
        counts=jnp.full((M_E,), float(A_E), dtype),
        nreal=jnp.asarray(M_E, jnp.int32))
    f = ForceData(
        x=jnp.asarray(rng.uniform(0.2, 1.0, (M_F, B_F, D)), dtype),
        dxdr=jnp.asarray(rng.uniform(-1, 1, (M_F, B_F, D, 3)), dtype),
        ele=jnp.asarray(rng.choice([13, 79], (M_F, B_F)), jnp.int32),
        nreal=jnp.asarray(M_F, jnp.int32))
    return e, f


def bench_tpu():
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

    dtype = jnp.float32
    e, f = make_data(dtype)
    params = {"sigma": jnp.asarray(2.0, dtype), "l": jnp.asarray(1.0, dtype)}
    y = jnp.asarray(np.random.RandomState(1).randn(e.m + 3 * f.m) * 0.1,
                    dtype)

    import functools

    sym_chunk = 150 if not SMALL else 32

    @functools.partial(jax.jit, static_argnames=("impl",))
    def fit_call(e, f, y, params, impl="xla"):
        if impl.startswith("pallas"):
            # fused Pallas blocks via the shared-operand assembly (the
            # production k_self path): one consistent Gram, PSD by
            # construction at any matmul-precision mode
            K = K_ops.k_self(e, f, params, "rbf", 2, row_chunk=ROW_CHUNK,
                             symmetric=True)
        else:
            K_ee = K_ops.kee(e, e, params, "rbf", 2, row_chunk=ROW_CHUNK)
            if impl == "sym":
                K_ef = K_ops.kef(e, f, params, "rbf", 2,
                                 row_chunk=ROW_CHUNK)
                K_ff = K_ops.kff_self(f, params, "rbf", 2,
                                      point_chunk=sym_chunk)
            else:
                K_ef = K_ops.kef(e, f, params, "rbf", 2,
                                 row_chunk=ROW_CHUNK)
                K_ff = K_ops.kff(f, f, params, "rbf", 2,
                                 row_chunk=ROW_CHUNK)
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
        # min of two timed calls -- the same statistic the baseline
        # measurement uses (least-noise sample)
        samples = []
        for i in range(2):
            p = {"sigma": params["sigma"] * (1 + 1e-4 * i),
                 "l": params["l"]}
            t0 = time.time()
            s2, _ = fit_call(e, f, y, p, impl=impl)
            float(s2)
            samples.append(time.time() - t0)
        return min(samples) * 1e3, compile_and_first

    # 'sym' computes only the upper triangle of chunk pairs (~2x) in
    # plain XLA; 'pallas' is the fused production build at the default
    # bf16x4 matmul mode (f32-equivalent: exact Gram of bf16-pair-rounded
    # inputs); 'pallas_bf16' is the documented fast mode (exact Gram of
    # bf16-rounded inputs, ~2e-3 input perturbation -- inside the GPR
    # noise assumption but not f32-identical, so it is reported but NOT
    # eligible for the headline unless GPR_BENCH_ALLOW_BF16=1).
    impls = os.environ.get("GPR_BENCH_IMPLS",
                           "sym,pallas,pallas_bf16").split(",")
    results = {}
    for impl in impls:
        try:
            results[impl] = timed(impl)
            print(f"# {impl}: {results[impl][0]:.0f} ms "
                  f"(compile {results[impl][1]:.0f}s)", file=sys.stderr)
        except Exception as exc:
            print(f"# {impl} path failed: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", file=sys.stderr)
    if not results:
        # fall back to the plain XLA path
        results["xla"] = timed("xla")

    # informational: the full training-step cost (NLL + analytic grad via
    # the fused dual K/dK build) -- the per-iteration cost of
    # GP.fit(opt=True)
    try:
        from gpr_calculator_tpu.models.gp import _nll_rbf_analytic
        os.environ["GPR_CALC_TPU_KFF"] = "pallas"
        os.environ["GPR_CALC_TPU_KFF_PRECISION"] = "bf16x4"
        theta = jnp.asarray([2.0, 1.0], dtype)
        nf = jnp.asarray([0.01, 0.1], dtype)
        float(_nll_rbf_analytic(theta, e, f, y, nf, 10.0, 2, False,
                                ROW_CHUNK)[0])
        ts = []
        for i in range(2):
            th = theta * (1 + 1e-4 * i)
            t0 = time.time()
            float(_nll_rbf_analytic(th, e, f, y, nf, 10.0, 2, False,
                                    ROW_CHUNK)[0])
            ts.append(time.time() - t0)
        print(f"# nll+grad (fused dual pass): {min(ts)*1e3:.0f} ms "
              f"per L-BFGS iteration", file=sys.stderr)
    except Exception as exc:
        print(f"# nll+grad measurement skipped: {type(exc).__name__}",
              file=sys.stderr)

    eligible = {k: v for k, v in results.items()
                if k != "pallas_bf16"
                or os.environ.get("GPR_BENCH_ALLOW_BF16") == "1"}
    best_impl = min(eligible or results,
                    key=lambda k: (eligible or results)[k][0])
    return results[best_impl] + (best_impl,)


def workload_flops():
    """Algorithmic FLOPs of one fit call (implementation-independent:
    rectangular low-rank-Hessian K_FF build + Cholesky), for the MFU line."""
    n_env_f = M_F * B_F
    n_env_e = M_E * A_E
    d = D
    # K_FF: per env pair, 4 d-contractions over {u,J} blocks (2*16*d) plus
    # ~8 assembly ops on the 3x3 block
    f_ff = n_env_f ** 2 * (32 * d + 72)
    # K_EF: env-pair kernel + d-contraction for the gradient row
    f_ef = 2 * n_env_e * n_env_f * (8 * d + 10)
    f_ee = n_env_e ** 2 * (2 * d + 10)
    n_rows = M_E + 3 * M_F
    f_chol = n_rows ** 3 / 3
    return f_ff + f_ef + f_ee + f_chol


# ---------------------------------------------------------------------------
# baseline: the reference's C++ kff kernel, single core, scaled
# ---------------------------------------------------------------------------

def bench_reference_cpp():
    """Measure rbf_kff_many (the reference hot loop) on a slice of the same
    workload; returns the extrapolated full-workload single-core ms, or
    None when the reference sources are unavailable."""
    src = "/root/reference/gpr_calc/kernels/rbf_kernel.cpp"
    if not os.path.exists(src):
        return None
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
            n2 = M_F * B_F                     # full rhs env count
            n1 = 64 if not SMALL else 32       # lhs slice
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
                (np.arange(n1) // B_F).astype(np.int32))
            inds2 = np.ascontiguousarray(
                (np.arange(n2) // B_F).astype(np.int32))
            m1 = n1 // B_F + 1
            m2 = M_F
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
            # extrapolate: full lhs env count is M_F * B_F
            full_single_core_ms = slice_s * (M_F * B_F / n1) * 1e3
            return full_single_core_ms
    except Exception as exc:  # pragma: no cover
        print(f"# baseline measurement unavailable: {exc}", file=sys.stderr)
        return None


PEAK_F32_TFLOPS = 49.2   # v5e MXU, fp32 passes (bf16 peak 197 / 4)


def main():
    our_ms, compile_s, impl = bench_tpu()
    baseline_single_ms = bench_reference_cpp()
    if baseline_single_ms is not None:
        baseline_ms = baseline_single_ms / N_RANKS_BASELINE
        vs = baseline_ms / our_ms
    else:
        baseline_ms = None
        vs = None
    flops = workload_flops()
    tflops = flops / (our_ms * 1e-3) / 1e12
    mfu = tflops / PEAK_F32_TFLOPS
    print(f"# workload: K=({M_E}+3*{M_F})^2, d={D}, envs/pt={A_E}/{B_F}; "
          f"compile+first={compile_s:.1f}s; "
          f"ref-C++ single-core={baseline_single_ms and round(baseline_single_ms)} ms, "
          f"64-rank-ideal={baseline_ms and round(baseline_ms)} ms",
          file=sys.stderr)
    print(f"# impl={impl}: {flops/1e12:.2f} TFLOP/fit, "
          f"{tflops:.2f} TFLOP/s achieved, MFU={100*mfu:.1f}% of f32 peak "
          f"({PEAK_F32_TFLOPS} TF)", file=sys.stderr)
    print(json.dumps({
        "metric": "kernel_build_plus_cholesky_ms_per_fit_10k",
        "value": round(our_ms, 1),
        "unit": "ms",
        "vs_baseline": round(vs, 1) if vs else None,
        "impl": impl,
        "achieved_tflops": round(tflops, 2),
        "mfu_f32_pct": round(100 * mfu, 1),
    }))


if __name__ == "__main__":
    main()
