"""Multi-device sharding: the row-sharded kernel build must match the
single-device result, and the driver entry points must run on the 8-way
virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpr_calculator_tpu.ops import kernels as K_ops
from gpr_calculator_tpu.ops.packing import pack_energy, pack_force
from gpr_calculator_tpu.parallel import make_mesh, shard_train_data

from test_kernels import make_points, PARAMS


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_kernel_matches_single_device():
    pts_e = make_points(4, 3, 5)
    pts_f = make_points(16, 3, 5)
    e = pack_energy([(x, el) for x, _, el in pts_e], m_pad=4, a_pad=4)
    f = pack_force(pts_f, m_pad=16, b_pad=4)
    params = PARAMS["rbf"]

    K_ref = np.asarray(K_ops.k_self(e, f, params, "rbf", 2))

    mesh = make_mesh(8)
    e_s, f_s = shard_train_data(e, f, mesh)
    K_sharded = np.asarray(K_ops.k_self(e_s, f_s, params, "rbf", 2))
    np.testing.assert_allclose(K_sharded, K_ref, rtol=1e-12, atol=1e-13)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = fn(*args)
    assert np.all(np.isfinite(np.asarray(out[0])))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gp_with_mesh_matches_unsharded():
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    structs = make_structs(n=3, natoms=5, seed=31)
    calc = EMT()
    labels = [(s, calc.get_potential_energy(s), calc.get_forces(s))
              for s in structs]

    def build(mesh):
        gp = GP(kernel=RBF(para=[1.2, 1.0]),
                descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
                noise_e=0.01, noise_f=0.1, mesh=mesh,
                log_file="/tmp/shard_gp.log")
        for s, e, f in labels:
            gp.add_structure((s, e, f))
        gp.fit(show=False, opt=False)
        return gp

    gp_ref = build(None)
    gp_mesh = build(make_mesh(8))
    E1, F1, _ = gp_ref.predict_structure(structs[0])
    E2, F2, _ = gp_mesh.predict_structure(structs[0])
    np.testing.assert_allclose(E1, E2, rtol=1e-9)
    np.testing.assert_allclose(F1, F2, rtol=1e-7, atol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gp_with_mesh_matches_unsharded_pallas_forced(monkeypatch):
    """GP(mesh=...) with the fused-Pallas path FORCED (f32 + interpret
    override on the virtual mesh): the production training build must
    route through the sharded triangular kernel and match the unsharded
    Pallas fit -- round-2 VERDICT item 1's done criterion."""
    from gpr_calculator_tpu import config
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops import kernels as K_ops
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    monkeypatch.setenv("GPR_CALC_TPU_KFF_INTERPRET", "1")
    # 3-structure model is below the work-proportionality gate; force the
    # sharded Pallas route (the gate itself is tested in
    # test_sharded_pallas.test_small_model_on_mesh_takes_xla_route)
    monkeypatch.setenv("GPR_CALC_TPU_SHARDED_GATE", "off")
    old_dt = config.dtype()
    config.set_dtype(jnp.float32)
    try:
        structs = make_structs(n=3, natoms=5, seed=33)
        calc = EMT()
        labels = [(s, calc.get_potential_energy(s), calc.get_forces(s))
                  for s in structs]

        def build(mesh):
            gp = GP(kernel=RBF(para=[1.2, 1.0]),
                    descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
                    noise_e=0.02, noise_f=0.15, mesh=mesh,
                    log_file="/tmp/shard_gp_pl.log")
            for s, e, f in labels:
                gp.add_structure((s, e, f))
            gp.fit(show=False, opt=False)
            return gp

        # the mesh fit must actually take the pallas route
        e, f = None, None
        gp_mesh = build(make_mesh(8))
        te, tf, _, _ = gp_mesh._train_view()
        assert K_ops._use_pallas_kff(tf, "rbf", te), \
            "pallas gate did not pass -- test is not forcing the path"

        gp_ref = build(None)
        E1, F1, _ = gp_ref.predict_structure(structs[0])
        E2, F2, _ = gp_mesh.predict_structure(structs[0])
        np.testing.assert_allclose(E1, E2, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(F1, F2, rtol=2e-3, atol=2e-4)
    finally:
        config.set_dtype(old_dt)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batched_serving_with_mesh_matches_unsharded():
    """predict_structures (the batched-NEB serving program) under
    GP(mesh=...): the row-sharded training operands + the serving
    dispatch (gate-routed at this scale) must reproduce the unsharded
    batch exactly."""
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    structs = make_structs(n=5, natoms=5, seed=37)
    calc = EMT()
    labels = [(s, calc.get_potential_energy(s), calc.get_forces(s))
              for s in structs[:3]]

    def build(mesh):
        gp = GP(kernel=RBF(para=[1.3, 1.0]),
                descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
                noise_e=0.02, noise_f=0.15, mesh=mesh,
                log_file="/tmp/shard_batch.log")
        for s, e, f in labels:
            gp.add_structure((s, e, f))
        gp.fit(show=False, opt=False)
        return gp

    gp_mesh = build(make_mesh(8))
    gp_ref = build(None)
    out_m = gp_mesh.predict_structures(structs[3:], return_std=True)
    out_r = gp_ref.predict_structures(structs[3:], return_std=True)
    assert len(out_m) == len(out_r) == 2
    for rm, rr in zip(out_m, out_r):
        for a, b in zip(rm, rr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_stress_serving_with_mesh_matches_unsharded():
    """predict_structure(stress=True) -- the 9-column row-peeling
    serving form -- under GP(mesh=...) must match the unsharded run."""
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    structs = make_structs(n=3, natoms=5, seed=51)
    calc = EMT()

    def build(mesh):
        gp = GP(kernel=RBF(para=[1.2, 1.0]),
                descriptor=SO3(nmax=2, lmax=2, rcut=4.0, stress=True),
                noise_e=0.02, noise_f=0.15, mesh=mesh,
                log_file="/tmp/stress_mesh.log")
        for s in structs[:2]:
            gp.add_structure((s, calc.get_potential_energy(s),
                              calc.get_forces(s)))
        gp.fit(show=False, opt=False)
        return gp

    gm, gr = build(make_mesh(8)), build(None)
    o1 = gm.predict_structure(structs[2], stress=True, return_std=True)
    o2 = gr.predict_structure(structs[2], stress=True, return_std=True)
    for a, b in zip(o1, o2):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_stress_without_stress_descriptor_raises():
    """stress=True on a stress=False descriptor must fail with a clear
    configuration error, not an AttributeError from a None rdxdr."""
    from gpr_calculator_tpu.calculators import EMT
    from gpr_calculator_tpu.models import GP, RBF
    from gpr_calculator_tpu.ops.so3 import SO3
    from test_gp import make_structs

    structs = make_structs(n=2, natoms=5, seed=53)
    calc = EMT()
    gp = GP(kernel=RBF(para=[1.2, 1.0]),
            descriptor=SO3(nmax=2, lmax=2, rcut=4.0),
            noise_e=0.02, noise_f=0.15, log_file="/tmp/stress_cfg.log")
    gp.add_structure((structs[0], calc.get_potential_energy(structs[0]),
                      calc.get_forces(structs[0])))
    gp.fit(show=False, opt=False)
    with pytest.raises(ValueError, match="stress-enabled descriptor"):
        gp.predict_structure(structs[1], stress=True)
