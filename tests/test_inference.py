"""Inference stack tests (ref makani tests/test_inference.py): train briefly,
then run the Inferencer end-to-end on real HDF5 data including output files."""

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


def test_inferencer_end_to_end(tmp_path):
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
    out_dir = os.path.join(str(tmp_path), "inference")
    logs = inf.score_model(output_dir=out_dir)

    assert np.isfinite(logs["rmse"])
    assert np.isfinite(logs["acc"])
    assert os.path.isfile(os.path.join(out_dir, "metrics.h5"))
    assert os.path.isfile(os.path.join(out_dir, "temporal_averages.h5"))
    assert os.path.isfile(os.path.join(out_dir, "spectra.h5"))
    assert os.path.isfile(os.path.join(out_dir, "raw_forecasts.h5"))

    with h5py.File(os.path.join(out_dir, "raw_forecasts.h5")) as f:
        fields = f["fields"]
        assert fields.shape[1] == 3  # rollout steps
        assert fields.shape[2] == 5  # channels
        assert np.isfinite(fields[...]).all()

    with h5py.File(os.path.join(out_dir, "metrics.h5")) as f:
        assert "rmse" in f
        assert f["rmse"].shape[0] == 3


def test_ensemble_inference(tmp_path):
    """HENS-style ensemble scoring: expand each IC into noise-perturbed members."""
    from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer
    from makani_tpu.utils.inference.inferencer import Inferencer

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(
        tmp_path,
        save_checkpoint="flexible",
        max_epochs=1,
        batch_size=4,
        ensemble_size=2,
        ensemble_parallel_size=2,
        valid_autoreg_steps=1,
        input_noise={"type": "white", "n_channels": 1, "mode": "concatenate", "sigma": 0.5, "alpha": 2.0},
        losses=[{"type": "crps", "channel_weights": "constant", "parameters": {"crps_type": "skillspread"}}],
        metric_names=["rmse", "crps", "spread", "ssr"],
        **paths,
    )
    t = EnsembleTrainer(params)
    t.train()
    pmesh.cleanup()

    inf = Inferencer(params)
    logs = inf.score_model(output_dir=None)
    assert np.isfinite(logs["crps"]) and np.isfinite(logs["ssr"])


def test_score_model_pads_ragged_ic_count(tmp_path):
    """5 ICs with batch 2 pads the last batch; metrics must equal the bs=1
    run (pad rows masked out of metrics and streaming buffers)."""
    from makani_tpu.utils.inference.inferencer import Inferencer

    paths = init_hdf5_dataset(tmp_path)

    def run(bs, out):
        params = get_default_parameters(
            tmp_path,
            batch_size=bs,
            n_ics=5,
            valid_autoreg_steps=1,
            metric_names=["rmse", "acc", "l1"],
            **paths,
        )
        inf = Inferencer(params)
        logs = inf.score_model(output_dir=out)
        pmesh.cleanup()
        mean, _ = inf.temporal_buffer.finalize()
        return logs, mean

    logs2, mean2 = run(2, os.path.join(str(tmp_path), "o2"))
    logs1, mean1 = run(1, os.path.join(str(tmp_path), "o1"))

    for k in ("rmse", "acc", "l1"):
        assert logs2[k] == pytest.approx(logs1[k], rel=1e-5)
    np.testing.assert_allclose(mean2, mean1, rtol=1e-4, atol=5e-6)


def test_wb2_roundtrip_through_inferencer_buffers(tmp_path):
    """VERDICT r4 item 9: the raw-forecast buffer the Inferencer writes must
    survive the WB2 layout conversion round-trip (the export path of
    data_process/convert_*_wb2*) — per-IC, per-step, bitwise."""
    from makani_tpu.utils.dataloaders.wb2_helpers import from_wb2_layout, to_wb2_layout
    from makani_tpu.utils.inference.inferencer import Inferencer
    from makani_tpu.utils.training.deterministic_trainer import Trainer

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(
        tmp_path,
        save_checkpoint="flexible",
        max_epochs=1,
        valid_autoreg_steps=2,
        save_raw_forecasts=True,
        metric_names=["rmse"],
        **paths,
    )
    t = Trainer(params)
    t.train()
    pmesh.cleanup()

    inf = Inferencer(params)
    out_dir = os.path.join(str(tmp_path), "inference_wb2")
    inf.score_model(output_dir=out_dir)

    names = list(params.get("channel_names"))
    with h5py.File(os.path.join(out_dir, "raw_forecasts.h5")) as f:
        fields = np.asarray(f["fields"])  # (ic, step, C, H, W)

    assert fields.ndim == 5 and fields.shape[2] == len(names)
    for ic in range(fields.shape[0]):
        stack = fields[ic]  # (T, C, H, W)
        wb2 = to_wb2_layout(stack, names)
        # WB2 layout: ascending latitudes, level-stacked atmo variables
        for k, v in wb2.items():
            if k.endswith("__levels"):
                assert list(v) == sorted(v)
        back = from_wb2_layout(wb2, names)
        np.testing.assert_array_equal(back, stack)
