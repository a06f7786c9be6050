"""Global configuration for the TPU-native GPR calculator.

The reference framework (MaterSim/GPR_calculator) computes everything in
float64 (NumPy/C++ doubles).  We default to float64 as well -- JAX on TPU
supports f64 (emulated where needed) and the parity targets (1e-8 agreement,
see /root/repo/BASELINE.md) require it.  A float32 fast path is available for
throughput benchmarking via ``set_dtype``.
"""
from __future__ import annotations

import os

import jax

# Persistent compilation cache (survives processes).  The remote TPU
# compiler costs 15-200 s per program and on-the-fly workloads recompile
# at every training-set bucket change, so this is a ~10x wall-clock lever
# for NEB/MD runs.  GPR_CALC_TPU_COMPILE_CACHE=0 disables.
#
# The cache directory is keyed by a host fingerprint: XLA:CPU AOT
# executables bake in the compile machine's vector-ISA feature set, and
# reloading them on a host with different features is at best a warning
# storm and at worst a SIGILL (observed when a cache written on an
# AVX-512 box was read on a different machine).  TPU executables are
# keyed by the accelerator, not the host, so sharing per-host dirs costs
# only duplicate CPU entries.
def _host_fingerprint() -> str:
    import hashlib
    import platform
    tag = platform.machine()
    # Hash the cpuid FAMILY/MODEL/STEPPING alongside the model name and
    # the feature flags: XLA:CPU AOT executables bake in the compile
    # machine's full LLVM target features, virtualised hosts report one
    # GENERIC marketing string ("Intel(R) Xeon(R) Processor @ 2.10GHz")
    # across machines whose real microarchitectures differ, and loading
    # an executable with genuinely unsupported ISA features is a SIGILL.
    # The family/model/stepping lines carry the actual cpuid values
    # LLVM's detection keys on.
    #
    # Note: cpu_aot_loader can still log a feature-"mismatch" warning
    # for SAME-HOST reloads -- the compile-side list includes tuning
    # PREFERENCES (+prefer-no-scatter/+prefer-no-gather, chosen from the
    # detected CPU model) that the loader's host-feature enumeration
    # never contains, so the warning fires even when the real ISA sets
    # are identical (verified: entry written and reloaded on one
    # Emerald-Rapids host warns; the executable is correct).  That noise
    # is spurious and pure-CPU-session only: accelerator sessions skip
    # persisting CPU entries altogether (is_cache_used gate below).
    keys = {"flags", "Features", "model name", "cpu family", "model",
            "stepping", "CPU implementer", "CPU part"}
    parts = {}
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if ":" not in line:
                    continue
                key = line.split(":", 1)[0].strip()
                if key in keys and key not in parts:
                    val = line.split(":", 1)[-1].strip()
                    if key in ("flags", "Features"):
                        val = " ".join(sorted(val.split()))
                    parts[key] = val
    except OSError:
        pass
    if parts:
        blob = "|".join(f"{k}={parts[k]}" for k in sorted(parts))
        tag += hashlib.sha1(blob.encode()).hexdigest()[:12]
    else:
        tag += platform.processor() or "unknown"
    return tag


if os.environ.get("GPR_CALC_TPU_COMPILE_CACHE", "1") != "0":
    # The fingerprint is appended even when the user points
    # JAX_COMPILATION_CACHE_DIR somewhere explicit: an externally-shared
    # cache dir is exactly the scenario where a stale XLA:CPU executable
    # from another machine gets reloaded (the round-4 bench run hit the
    # resulting feature-mismatch warning storm).  The env var picks the
    # *root*; the per-host leaf keeps CPU entries host-local.
    _cache_root = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/gpr_calculator_tpu"))
    _cache_dir = os.path.join(_cache_root, "jax-" + _host_fingerprint())
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # Belt over the fingerprint: on virtualised hosts /proc/cpuinfo can
    # report a generic model ("Intel(R) Xeon(R) Processor @ 2.10GHz")
    # identical across machines whose real microarchitectures differ, so
    # fingerprint collisions remain possible and a reloaded XLA:CPU AOT
    # executable then risks SIGILL (its tuning bakes in the compile
    # machine's detected CPU model).  In accelerator sessions the cache's
    # value is the expensive remote TPU compiles; CPU programs there are
    # small host-side glue -- skip persistent caching of CPU executables
    # entirely (pure-CPU sessions, e.g. the test suite, keep it: they
    # rewrite their own entries).  GPR_CALC_TPU_CPU_CACHE=1 restores the
    # old behaviour.
    if os.environ.get("GPR_CALC_TPU_CPU_CACHE", "0") != "1":
        from jax._src import compilation_cache as _cc

        _orig_is_cache_used = _cc.is_cache_used

        def _is_cache_used(backend):
            if backend.platform == "cpu":
                try:
                    if jax.default_backend() != "cpu":
                        return False
                except Exception:
                    pass
            return _orig_is_cache_used(backend)

        _cc.is_cache_used = _is_cache_used

# Enable x64 unless explicitly disabled.  Must happen before any jnp array is
# created, hence at package import time (config is imported from __init__).
if os.environ.get("GPR_CALC_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# f32 matmuls on TPU default to single bf16 passes, whose error exceeds
# GPR noise floors and breaks the Cholesky.  'highest' (6-pass f32) costs
# <2% here (the kernel build is bound by the thin-k matmul floor).
if os.environ.get("GPR_CALC_TPU_MATMUL"):
    jax.config.update("jax_default_matmul_precision",
                      os.environ["GPR_CALC_TPU_MATMUL"])
else:
    jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

_DTYPE = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
_INT_DTYPE = jnp.int32

# Numerical guard used throughout the kernel math.  Mirrors the reference's
# eps=1e-8 guards (gpr_calc/kernels/rbf_kernel.cpp:10, kernels/base.py:40).
EPS = 1e-8


def set_dtype(dtype) -> None:
    """Set the default floating dtype for kernel/descriptor computation."""
    global _DTYPE
    _DTYPE = jnp.dtype(dtype)


def dtype():
    return _DTYPE


def int_dtype():
    return _INT_DTYPE
