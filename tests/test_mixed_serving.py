"""Mixed-precision serving: f32 cross-covariance + f64 solve tail.

The f32 kernel rows carry ~1e-7 relative rounding that the GEMV amplifies
by ||alpha||_1, so accuracy is noise-floor-relative, not absolute.  The
"auto" mode must therefore (a) serve healthy-noise production models on
the fast path within their noise floor, and (b) keep tight-noise legacy
artifacts (pd4-class) on exact f64.
"""
import numpy as np
import pytest

from gpr_calculator_tpu.calculators import EMT
from gpr_calculator_tpu.models import GP, RBF
from gpr_calculator_tpu.ops.so3 import SO3

from test_gp import make_structs


def _fit_gp(noise_e, noise_f, seed=61):
    structs = make_structs(n=5, natoms=5, seed=seed)
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.2, 0.9]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=noise_e, noise_f=noise_f, log_file="/tmp/mixed.log")
    for s in structs:
        gp.add_structure((s, calc.get_potential_energy(s),
                          calc.get_forces(s)))
    gp.fit(show=False, opt=False)
    return gp, structs


@pytest.fixture(scope="module")
def healthy_gp():
    return _fit_gp(noise_e=5e-3, noise_f=5e-2)


@pytest.fixture(scope="module")
def tight_gp():
    return _fit_gp(noise_e=2.5e-4, noise_f=2.5e-3)


def test_mixed_within_noise_floor_healthy(healthy_gp):
    gp, structs = healthy_gp
    s = structs[0]
    gp.serve_precision = "f64"
    E0, F0, _, Es0, Fs0 = gp.predict_structure(s, return_std=True)
    gp.serve_precision = "mixed"
    assert gp._serve_mixed()
    E1, F1, _, Es1, Fs1 = gp.predict_structure(s, return_std=True)
    gp.serve_precision = "auto"

    natoms = len(s)
    assert abs(E1 - E0) < 0.5 * natoms * gp.noise_e, abs(E1 - E0)
    assert np.abs(F1 - F0).max() < 0.2 * gp.noise_f
    assert abs(Es1 - Es0) < 0.2 * gp.noise_e * natoms
    assert np.abs(Fs1 - Fs0).max() < 0.2 * gp.noise_f


def test_error_estimate_calibrated(healthy_gp, tight_gp):
    """The auto-mode error estimate must upper-bound (within 10x) and not
    wildly overshoot the measured mixed-vs-f64 energy error."""
    for gp, structs in (healthy_gp, tight_gp):
        s = structs[0]
        gp.serve_precision = "f64"
        E0 = gp.predict_structure(s)[0]
        gp.serve_precision = "mixed"
        E1 = gp.predict_structure(s)[0]
        gp.serve_precision = "auto"
        measured = abs(E1 - E0) / len(s)          # eV/atom
        est = gp._mixed_error_estimate()
        assert measured < 10 * est, (measured, est)


def test_auto_protects_tight_noise_models(tight_gp, monkeypatch):
    """Even on an accelerator backend, auto must refuse the fast path for
    pd4-class noise floors (estimated error above the floor)."""
    gp, _ = tight_gp
    import gpr_calculator_tpu.models.gp as gpmod
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    assert gp.serve_precision == "auto"
    assert not gp._serve_mixed()
    assert gp._mixed_error_estimate() > 0.5 * gp.noise_e


def test_auto_serves_healthy_models_mixed(healthy_gp, monkeypatch):
    gp, _ = healthy_gp
    import gpr_calculator_tpu.models.gp as gpmod
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    assert gp._serve_mixed()


def test_auto_is_full_f64_on_cpu(healthy_gp):
    gp, _ = healthy_gp
    assert not gp._serve_mixed()     # tests run on the CPU backend


def test_mixed_env_override(tight_gp, monkeypatch):
    gp, _ = tight_gp
    monkeypatch.setenv("GPR_CALC_TPU_SERVE", "mixed")
    assert gp._serve_mixed()
    monkeypatch.setenv("GPR_CALC_TPU_SERVE", "f64")
    assert not gp._serve_mixed()


def test_runtime_measurement_backstops_bad_estimate(tight_gp, monkeypatch):
    """Adversarial case (round-2 VERDICT item 5): the static estimate is
    forced to lie (returns 0 -- 'no rounding error'), yet the per-refit
    MEASURED f32-vs-f64 delta must still demote a tight-noise model to
    exact f64 serving."""
    gp, structs = tight_gp
    import gpr_calculator_tpu.models.gp as gpmod
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("GPR_CALC_TPU_KFF", "xla")   # no compiled pallas
    monkeypatch.setattr(type(gp), "_mixed_error_estimate", lambda self: 0.0)
    # with a lying estimate and no measurement, auto would serve mixed
    gp._mixed_measured = None
    assert gp._serve_mixed()
    # the refit-time measurement catches it
    gp._refresh_mixed_measurement()
    assert gp._mixed_measured is not None
    assert gp._mixed_measured > 0.5 * gp.noise_e, gp._mixed_measured
    assert not gp._serve_mixed()
    # and serving parity holds: auto (now exact f64 or split) keeps the
    # ENERGY channel exact and the force channel inside its own floor
    s = structs[0]
    E_auto, F_auto, _ = gp.predict_structure(s)
    gp.serve_precision = "f64"
    E_64, F_64, _ = gp.predict_structure(s)
    gp.serve_precision = "auto"
    np.testing.assert_allclose(E_auto, E_64, rtol=0, atol=1e-12)
    assert np.abs(F_auto - F_64).max() < 0.5 * gp.noise_f


def test_runtime_measurement_keeps_healthy_models_fast(healthy_gp,
                                                       monkeypatch):
    """The measurement must not demote a healthy-noise model."""
    gp, _ = healthy_gp
    import gpr_calculator_tpu.models.gp as gpmod
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("GPR_CALC_TPU_KFF", "xla")   # no compiled pallas
    gp._refresh_mixed_measurement()
    assert gp._mixed_measured is not None
    assert gp._mixed_measured < 0.5 * gp.noise_e
    assert gp._serve_mixed()


def test_host_serving_route_matches_device(tight_gp, monkeypatch):
    """Exact-f64 serving on an accelerator executes on the host CPU
    backend (gp._serve_on_host): same program, native f64 instead of
    the ~25x on-device emulation.  Both sides are exact f64; they may
    differ by summation order (the two routes pack/pad differently), so
    parity is ~1e-9 absolute -- orders below any noise floor."""
    import gpr_calculator_tpu.models.gp as gpmod

    gp, structs = tight_gp
    s = structs[-1]
    ref = gp.predict_structure(s, return_std=True)
    # pretend an accelerator default backend so the host route arms
    # (serve_precision=auto demotes tight-noise models to exact f64,
    # but the measurement needs the fake backend too -- pin f64)
    monkeypatch.setattr(gp, "serve_precision", "f64")
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    # force past the measured cost model (this CI host has 1 core, so
    # "auto" would keep the device path -- the route itself is what is
    # under test here)
    monkeypatch.setenv("GPR_CALC_TPU_SERVE_HOST", "force")
    gp._host_serve_cache = None
    assert gp._serve_on_host("f64")
    out = gp.predict_structure(s, return_std=True)
    assert getattr(gp, "_host_serve_cache", None) is not None
    for a, b in zip(ref, out):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-9)
    # cache is reused on the second call (same fit serial)
    cache = gp._host_serve_cache
    gp.predict_structure(s, return_std=False)
    assert gp._host_serve_cache is cache


def test_host_serving_cost_model_gates_on_cores(tight_gp, monkeypatch):
    """The host route arms only when the measured cost model says the
    host cores beat the emulated device build (pd4 measurement: 1.74e8
    env pairs = 42.8 s on one core vs ~6.7 s on device)."""
    import os

    import gpr_calculator_tpu.models.gp as gpmod
    from gpr_calculator_tpu.ops.packing import pack_force

    gp, structs = tight_gp
    monkeypatch.setattr(gp, "serve_precision", "f64")
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    te, tf, _, _ = gp._train_view()
    # pd4-scale prediction block: 216 force points x 72 envs
    big_pf = pack_force([(np.zeros((72, te.d)), np.zeros((72, te.d, 3)),
                          np.zeros(72, int))] * 216, d=te.d)
    small_pf = pack_force([(np.zeros((4, te.d)), np.zeros((4, te.d, 3)),
                            np.zeros(4, int))], d=te.d)
    monkeypatch.setattr(os, "cpu_count", lambda: 1)
    assert not gp._serve_on_host(False, big_pf, tf)
    monkeypatch.setattr(os, "cpu_count", lambda: 96)
    assert gp._serve_on_host(False, big_pf, tf)
    # tiny build: fixed device overhead dominates, host wins on 1 core
    monkeypatch.setattr(os, "cpu_count", lambda: 1)
    assert gp._serve_on_host(False, small_pf, tf)


# ---------------------------------------------------------------------------
# split-channel serving: exact-f64 energy rows + f32 force rows + f64 tail
# (the pd4-class regime: noise_e 2.5e-4 busts f32 by ~4 orders through the
# ||alpha||_1-amplified GEMV while noise_f 0.08 passes; measured on chip
# dE 6.9 eV vs dF 0.033 < 0.5*noise_f 0.04)
# ---------------------------------------------------------------------------

def test_auto_splits_when_force_channel_passes(tight_gp, monkeypatch):
    """auto -> 'split' when energy busts its floor but the MEASURED force
    delta clears 0.5*noise_f; without a force measurement -> 'f64'."""
    gp, _ = tight_gp
    import gpr_calculator_tpu.models.gp as gpmod
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    assert gp._mixed_error_estimate() > 0.5 * gp.noise_e
    monkeypatch.setattr(gp, "_mixed_measured_f", None, raising=False)
    assert gp._serve_mode() == "f64"          # unmeasured: conservative
    monkeypatch.setattr(gp, "_mixed_measured_f", 0.4 * 0.5 * gp.noise_f,
                        raising=False)
    assert gp._serve_mode() == "split"        # inside the force floor
    monkeypatch.setattr(gp, "_mixed_measured_f", 0.6 * gp.noise_f,
                        raising=False)
    assert gp._serve_mode() == "f64"          # force channel busts too


@pytest.fixture(scope="module")
def pd4_like_gp():
    """The split-mode regime: tight ENERGY floor, loose FORCE floor
    (the bundled pd4-RBF artifact: 2.5e-4 / 0.08)."""
    return _fit_gp(noise_e=2.5e-4, noise_f=0.08, seed=62)


def test_split_serving_channel_parity(pd4_like_gp):
    """Forced split mode: the energy channel (mean AND std) matches exact
    f64 to f64 rounding; the force channel stays inside 0.5*noise_f."""
    gp, structs = pd4_like_gp
    s = structs[0]
    gp.serve_precision = "f64"
    E0, F0, _, Es0, Fs0 = gp.predict_structure(s, return_std=True)
    gp.serve_precision = "split"
    assert gp._serve_mode() == "split"
    E1, F1, _, Es1, Fs1 = gp.predict_structure(s, return_std=True)
    gp.serve_precision = "auto"
    np.testing.assert_allclose(E1, E0, rtol=0, atol=1e-10 * len(s))
    assert abs(Es1 - Es0) < 1e-10 + 1e-6 * abs(Es0), (Es1, Es0)
    assert np.abs(F1 - F0).max() < 0.5 * gp.noise_f
    assert np.all(np.asarray(Fs1) >= 0)


def test_split_env_override(tight_gp, monkeypatch):
    gp, _ = tight_gp
    monkeypatch.setenv("GPR_CALC_TPU_SERVE", "split")
    assert gp._serve_mode() == "split"
    assert not gp._serve_mixed()
    # split keeps the f64 descriptor (exact energy rows need f64 inputs)
    assert gp._serve_descriptor_dtype() is None


def test_split_keeps_device_route(tight_gp, monkeypatch):
    """split never takes the host-CPU f64 exile (its big build is f32)."""
    gp, _ = tight_gp
    import gpr_calculator_tpu.models.gp as gpmod
    monkeypatch.setattr(gpmod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("GPR_CALC_TPU_SERVE_HOST", "force")
    assert not gp._serve_on_host("split")
    assert not gp._serve_on_host("mixed")
    assert gp._serve_on_host("f64")
