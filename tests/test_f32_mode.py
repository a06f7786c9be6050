"""f32 production mode (GPR_CALC_TPU_X64=0): the full pipeline must stay
finite and accurate (regression: the Miller Bessel seeds underflowed in
f32).  Runs in a subprocess because x64 is process-global."""
import os
import subprocess
import sys

SCRIPT = r"""
import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from gpr_calculator_tpu import EMT, GP, get_images
assert not jax.config.jax_enable_x64
INIT = '/root/reference/examples/database/initial.traj'
FINAL = '/root/reference/examples/database/final.traj'
images = get_images(INIT, FINAL, num_images=5)
gp = GP.set_GPR(images, EMT(), noise_e=0.05/13, noise_f=0.05,
                log_file='/tmp/f32_mode.log')
assert bool(jnp.all(jnp.isfinite(gp.alpha_))), 'alpha not finite in f32'
E, F, S, E_std, F_std = gp.predict_structure(images[1], return_std=True)
assert np.isfinite(E) and np.isfinite(E_std) and np.all(np.isfinite(F_std))
gp.validate_data(show=True)
assert gp.error['forces_mae'] < 0.05, gp.error
print('F32-MODE-OK', gp.error['forces_mae'])
"""


def test_f32_pipeline_subprocess():
    env = dict(os.environ)
    env["GPR_CALC_TPU_X64"] = "0"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=500)
    assert "F32-MODE-OK" in out.stdout, (out.stdout[-2000:],
                                         out.stderr[-2000:])
