"""Spatially-sharded inference parity (ref tests/distributed pattern applied
to the Inferencer): score_model under an h2 x w2 spatial mesh must reproduce
the serial run's metrics AND its raw-forecast output files — the full chain
of sharded rollout, metric quadrature psums, and the buffer gather from
spatial shards to the host HDF5 writer."""

import os

import h5py
import numpy as np
import pytest

from makani_tpu.parallel import mesh as pmesh
from tests.testutils import get_default_parameters, init_hdf5_dataset


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def test_sharded_score_model_matches_serial(tmp_path):
    from makani_tpu.utils.training.deterministic_trainer import Trainer
    from makani_tpu.utils.inference.inferencer import Inferencer

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(
        tmp_path,
        save_checkpoint="flexible",
        max_epochs=1,
        valid_autoreg_steps=2,
        save_raw_forecasts=True,
        metric_names=["rmse", "acc", "l1"],
        **paths,
    )
    t = Trainer(params)
    t.train()
    pmesh.cleanup()

    inf = Inferencer(params)
    out_serial = os.path.join(str(tmp_path), "inf_serial")
    logs_serial = inf.score_model(output_dir=out_serial)
    pmesh.cleanup()

    params["h_parallel_size"] = 2
    params["w_parallel_size"] = 2
    inf_d = Inferencer(params)
    assert inf_d.mesh.shape["h"] == 2 and inf_d.mesh.shape["w"] == 2
    out_dist = os.path.join(str(tmp_path), "inf_dist")
    logs_dist = inf_d.score_model(output_dir=out_dist)

    for m in ("rmse", "acc", "l1"):
        np.testing.assert_allclose(logs_dist[m], logs_serial[m], rtol=1e-4, atol=1e-6)
        for s in range(3):
            np.testing.assert_allclose(
                logs_dist[f"{m}_rollout/{s}"], logs_serial[f"{m}_rollout/{s}"],
                rtol=1e-4, atol=1e-6, err_msg=f"{m} step {s}",
            )

    with h5py.File(os.path.join(out_serial, "raw_forecasts.h5")) as f:
        fields_serial = f["fields"][...]
    with h5py.File(os.path.join(out_dist, "raw_forecasts.h5")) as f:
        fields_dist = f["fields"][...]
    assert fields_dist.shape == fields_serial.shape
    np.testing.assert_allclose(fields_dist, fields_serial, atol=2e-4)

    # spectra files must agree as well (the SHT runs on sharded fields)
    with h5py.File(os.path.join(out_serial, "spectra.h5")) as f:
        k = sorted(f.keys())[0]
        spec_serial = f[k][...]
    with h5py.File(os.path.join(out_dist, "spectra.h5")) as f:
        spec_dist = f[sorted(f.keys())[0]][...]
    np.testing.assert_allclose(spec_dist, spec_serial, rtol=1e-3, atol=1e-6)
