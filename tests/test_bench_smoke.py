"""bench.py must always emit one parseable JSON line (the driver's
round artifact depends on it) -- run the small-scale CPU form end to
end as a subprocess, exactly as the driver invokes it."""
import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_small_scale_emits_json_line():
    env = dict(os.environ)
    env.update({
        "GPR_BENCH_SCALE": "small",
        "GPR_BENCH_SERVE": "0",          # NEB/serve is the full-scale lane
        "GPR_BENCH_SKIP_LARGE": "1",
        "GPR_BENCH_BUDGET_S": "420",
        "JAX_PLATFORMS": "cpu",
    })
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=540, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"].startswith("kernel_build_plus_cholesky_ms")
    assert rec["unit"] == "ms"
    assert rec["value"] is not None and rec["value"] > 0
    assert "impl" in rec and "mfu_f32_pct" in rec
