"""Log-protocol analysis module: parsing, stats, figures."""
import io
import contextlib

import numpy as np

from gpr_calculator_tpu.analysis import (parse_log, plot_energy_scatter,
                                         plot_convergence)


SAMPLE = """\
Update GP model => 11/10
Loss:      120.301  2.014  1.233
Loss:      118.009  2.110  1.200
From Base model E: 0.020/3.470/3.499, F: 0.159/0.460/0.417
From Surrogate  E: 0.018/100.000/3.489, F: 0.043/0.060/0.380
From Surrogate  E: 0.015/100.000/3.474, F: 0.041/0.060/0.355
From Base model E: 0.031/3.471/3.502, F: 0.201/0.455/0.430
Update GP model => 12/10
Loss:      101.870  2.300  1.150
From Surrogate  E: 0.011/100.000/3.470, F: 0.030/0.060/0.340
"""


def test_parse_log_counts_and_fields():
    s = parse_log(SAMPLE.splitlines())
    assert s.n_base == 2 and s.n_surrogate == 3
    assert s.refits == 2
    assert s.losses == [120.301, 118.009, 101.870]
    assert abs(s.base_fraction - 2 / 5) < 1e-12
    first = s.records[0]
    assert first.kind == "base"
    assert abs(first.energy - 3.499) < 1e-12       # served base energy
    assert abs(first.e_std - 0.020) < 1e-12
    assert abs(first.f_std - 0.159) < 1e-12
    assert abs(first.f_max - 0.417) < 1e-12
    sur = s.records[1]
    assert sur.kind == "surrogate"
    assert abs(sur.energy - 3.489) < 1e-12


def test_parse_log_with_logging_prefixes():
    lines = ["2026-08-16 10:00:01 INFO " + ln for ln in SAMPLE.splitlines()]
    s = parse_log(lines)
    assert s.n_base == 2 and s.n_surrogate == 3 and s.refits == 2


def test_base_fraction_series_decays():
    lines = (["From Base model E: 0.1/1.0/1.0, F: 0.2/0.3/0.3"] * 10
             + ["From Surrogate  E: 0.1/1.0/1.0, F: 0.02/0.06/0.3"] * 30)
    s = parse_log(lines)
    frac = s.base_fraction_series(window=10)
    assert abs(frac[0] - 1.0) < 1e-12 and abs(frac[-1]) < 1e-12
    assert np.all(np.diff(frac) <= 1e-12)


def test_plots_write_files(tmp_path):
    s = parse_log(SAMPLE.splitlines())
    f1 = plot_energy_scatter(s, n_images=5,
                             output_file=str(tmp_path / "e.png"))
    f2 = plot_convergence(s, window=2,
                          output_file=str(tmp_path / "c.png"))
    import os
    assert os.path.getsize(f1) > 0 and os.path.getsize(f2) > 0


def test_parse_real_dispatch_output():
    """The DispatchPolicy log lines themselves parse back (round-trip of
    the protocol, not a hand-written sample)."""
    from gpr_calculator_tpu.dispatch import DispatchPolicy

    class FakeGP:
        noise_e, noise_f = 0.01, 0.1
        use_base = use_surrogate = 0

        def add_structure(self, *_):
            pass

    pol = DispatchPolicy(FakeGP(), None, verbose=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pol.log_base(0.02, 3.47, 3.499, 0.159, 0.46, 0.417)
        pol.log_surrogate(0.018, 100.0, 3.489, 0.043, 0.06, 0.38)
    s = parse_log(buf.getvalue().splitlines())
    assert s.n_base == 1 and s.n_surrogate == 1
    assert abs(s.records[0].energy - 3.499) < 1e-9
    assert abs(s.records[1].energy - 3.489) < 1e-9
