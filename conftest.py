"""Test harness config: force the CPU backend with 8 virtual devices so that
multi-chip sharding paths are exercised without TPU hardware, and enable x64
before any computation runs.

Note: a sitecustomize module may pin jax_platforms to a TPU plugin at
interpreter start; overriding the jax config (not just the env var) is
required, and must happen before the first backend initialisation.
"""
import os

if os.environ.get("GPR_TPU_TESTS") == "1":
    # TPU lane (pytest -m tpu): run on the real accelerator in f32 so
    # Mosaic/layout/precision regressions are caught before bench day.
    os.environ.setdefault("GPR_CALC_TPU_X64", "0")
    import jax  # noqa: E402
    jax.config.update("jax_enable_x64", False)
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
