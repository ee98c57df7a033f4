"""Reference-style resampled-shape config compatibility.

The reference keeps the native grid in ``img_shape_{x,y}`` and the model
grid in ``img_shape_{x,y}_resampled`` when ``subsampling_factor`` > 1
(ref data_loader_multifiles.py:475-482, YParams.py:118); its builders
consume the resampled pair (ref model_registry.py:167-170) — the published
FCN3 recipe trains with ``subsampling_factor: 2`` (ref
config/fourcastnet3.yaml:240). This repo's convention is single-name:
``img_shape_{x,y}`` IS the model grid. These tests pin the shim that folds
reference-written configs (model packages, converted checkpoints) into the
single-name convention before a model is built.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makani_tpu.models.model_registry import get_model, normalize_resampled_shapes
from makani_tpu.utils.yparams import ParamsBase

from tests.testutils import get_default_parameters


def test_normalize_folds_resampled_into_img_shape():
    p = ParamsBase(dict(img_shape_x=32, img_shape_y=64, img_shape_x_resampled=16, img_shape_y_resampled=32))
    normalize_resampled_shapes(p)
    assert p.get("img_shape_x") == 16 and p.get("img_shape_y") == 32


def test_normalize_noop_without_resampled_keys():
    p = ParamsBase(dict(img_shape_x=32, img_shape_y=64))
    normalize_resampled_shapes(p)
    assert p.get("img_shape_x") == 32 and p.get("img_shape_y") == 64


def test_model_builds_at_resampled_grid(tmp_path):
    """A reference-written config (native shape + resampled keys) must build
    and run the model on the resampled grid, not the native one."""
    params = get_default_parameters(
        tmp_path,
        img_shape_x=32,
        img_shape_y=64,
        img_shape_x_resampled=16,
        img_shape_y_resampled=32,
        add_zenith=False,
    )
    model, _ = get_model(params)
    C = len(params.get("in_channels"))
    x = jnp.zeros((1, C, 16, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, None)
    y = model.apply(variables, x, None)
    assert y.shape == (1, len(params.get("out_channels")), 16, 32)


def test_native_shape_input_rejected_after_fold(tmp_path):
    """Feeding the native-resolution grid into the resampled-built model must
    fail loudly (wrong spatial dims), proving the fold actually applied."""
    params = get_default_parameters(
        tmp_path,
        img_shape_x=32,
        img_shape_y=64,
        img_shape_x_resampled=16,
        img_shape_y_resampled=32,
        add_zenith=False,
    )
    model, _ = get_model(params)
    C = len(params.get("in_channels"))
    x16 = jnp.zeros((1, C, 16, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x16, None)
    x_native = jnp.zeros((1, C, 32, 64), jnp.float32)
    with pytest.raises(Exception):
        np.asarray(model.apply(variables, x_native, None))


def test_loader_single_name_convention_matches_reference_resampled(tmp_path):
    """This repo's loader publishes the subsampled grid directly under
    img_shape_{x,y} — numerically the same grid the reference publishes under
    the _resampled names (ceil(native/factor) with stride-reads)."""
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    from tests.testutils import init_hdf5_dataset

    paths = init_hdf5_dataset(tmp_path, years=(2017,), samples_per_year=8, nlat=18, nlon=36)
    params = get_default_parameters(tmp_path, subsampling_factor=2, **paths)
    ds = MultifilesDataset(params, paths["train_data_path"], train=True)
    assert ds.img_shape == (9, 18)  # ceil(18/2), ceil(36/2)
    assert params.get("img_shape_x") == 9 and params.get("img_shape_y") == 18
    sample = ds[0]
    inp, tar = sample["inp"], sample["tar"]
    assert inp.shape[-2:] == (9, 18) and tar.shape[-2:] == (9, 18)
    # the subsampled latitude grid is the strided native grid
    np.testing.assert_allclose(ds.lat_deg, np.linspace(90.0, -90.0, 18)[::2])
