"""Plot/observability utilities (NEB.py:140-233, utilities.py:277-338)."""
import os

import numpy as np

from gpr_calculator_tpu import EMT, plot_path
from gpr_calculator_tpu.io import read
from gpr_calculator_tpu.io.trajectory import TrajectoryWriter
from gpr_calculator_tpu.utils import plot, metrics
from gpr_calculator_tpu.utils_profiling import PhaseTimer

INIT = "/root/reference/examples/database/initial.traj"
FINAL = "/root/reference/examples/database/final.traj"


def test_plot_path(tmp_path):
    initial, final = read(INIT), read(FINAL)
    mid = initial.copy()
    mid.set_positions(0.5 * (initial.positions + final.positions))
    images = [initial, mid, final]
    engs = [0.0, 0.4, 0.01]
    out = str(tmp_path / "path.png")
    plot_path([(images, engs, "test")], figname=out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_scatter_plot_and_metrics(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.randn(30)
    y = x + 0.01 * rng.randn(30)
    out = str(tmp_path / "scatter.png")
    plot([x], [y], ["test"], figname=out)
    assert os.path.exists(out)
    s1, s2 = metrics(x, x, y, y, "hdr")
    assert "R2" in s1


def test_traj_multiframe_roundtrip(tmp_path):
    initial = read(INIT)
    f = str(tmp_path / "multi.traj")
    w = TrajectoryWriter(f)
    for k in range(3):
        a = initial.copy()
        a.positions[:, 0] += 0.1 * k
        a.info["energy"] = float(k)
        w.write(a)
    frames = read(f, index=":")
    assert len(frames) == 3
    np.testing.assert_allclose(frames[2].positions[:, 0],
                               initial.positions[:, 0] + 0.2)
    assert frames[1].info["energy"] == 1.0


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    rep = t.report()
    assert "a" in rep and t.counts["a"] == 2
    assert "total_s" in t.json()
