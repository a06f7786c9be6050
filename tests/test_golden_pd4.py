"""Golden-artifact test: load the reference's bundled pd4-RBF model
(examples/database/pd4-RBF.{json,db}) -- real 220-atom periodic structures,
the published hyperparameters (sigma=24.99, l=3.107, zeta=2, SO3 nmax=3
lmax=4 rcut=5) -- refit the solve with opt=False and check that the
training-set errors land at the interpolation level the artifact records
(energy MAE 6.6e-5 eV/atom, force MAE 0.025 eV/A at full data;
a subset must interpolate at least as tightly)."""
import json

import numpy as np
import pytest

from gpr_calculator_tpu.models import GP

JSON = "/root/reference/examples/database/pd4-RBF.json"


@pytest.mark.slow
def test_pd4_golden_subset():
    gp = GP.load(JSON, N_max=8, log_file="/tmp/pd4.log")
    assert gp.kernel.name == "RBF"
    np.testing.assert_allclose(gp.kernel.sigma, 24.992775, rtol=1e-5)
    assert gp.descriptor.nmax == 3 and gp.descriptor.lmax == 4
    assert gp.N_energy == 8
    gp.fit(show=False, opt=False)
    E, E_pred, F, F_pred = gp.validate_data(show=True)
    # with the bundled hyperparameters the GP must interpolate its own
    # training set to the artifact's recorded level
    assert gp.error["energy_mae"] < 5e-4, gp.error
    assert gp.error["forces_mae"] < 0.05, gp.error
    assert gp.error["forces_r2"] > 0.99, gp.error


@pytest.mark.slow
def test_pd4_predict_consistency():
    """Predict E/F for a training structure: energy must match the stored
    label to the noise level."""
    gp = GP.load(JSON, N_max=6, log_file="/tmp/pd4b.log")
    gp.fit(show=False, opt=False)
    from gpr_calculator_tpu.io.ase_db import read_db
    row = read_db("/root/reference/examples/database/pd4-RBF.db")[0]
    atoms = row["atoms"]
    E, F, _, E_std, F_std = gp.predict_structure(atoms, return_std=True)
    E_label = row["data"]["energy"]
    assert abs(E - E_label) / len(atoms) < 1e-3
    # stored per-structure force labels at the training force points
    F_label = row["data"]["force"]
    for fid in row["data"]["force_in"]:
        assert np.abs(F[fid] - F_label[fid]).max() < 0.1
