"""Per-process sharded IO (ref makani/utils/dataloader.py:30-71 io_grid).

Each host reads only the (h, w) tile of the global grid that its devices own.
Tests: tile reads return exactly the tile (values AND zenith match the global
read's tile slice), tile ranges come from jax's own shard index map (uneven
721-style latitude splits included), and the h5py read pattern is restricted
to the tile rows.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.dataloader import init_distributed_io
from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset
from tests.testutils import get_default_parameters, init_hdf5_dataset


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def test_tile_read_matches_global_slice(tmp_path):
    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, **paths)
    full = MultifilesDataset(params, paths["train_data_path"], train=True)
    s_full = full[0]

    params_t = get_default_parameters(tmp_path, **paths)
    params_t["io_tile_x"] = (4, 10)  # rows of the 16-lat grid
    params_t["io_tile_y"] = (8, 24)  # cols of the 32-lon grid
    tiled = MultifilesDataset(params_t, paths["train_data_path"], train=True)
    s_tile = tiled[0]

    assert s_tile["inp"].shape[-2:] == (6, 16)
    np.testing.assert_allclose(s_tile["inp"], s_full["inp"][..., 4:10, 8:24], atol=0)
    np.testing.assert_allclose(s_tile["tar"], s_full["tar"][..., 4:10, 8:24], atol=0)
    np.testing.assert_allclose(s_tile["izen"], s_full["izen"][..., 4:10, 8:24], atol=1e-6)
    # global shape bookkeeping unchanged: the model grid stays global
    assert params_t["img_shape_x"] == params["img_shape_x"]


def test_tile_read_with_crop_and_subsampling(tmp_path):
    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, subsampling_factor=2, **paths)
    full = MultifilesDataset(params, paths["train_data_path"], train=True)
    s_full = full[0]
    H, W = s_full["inp"].shape[-2:]

    params_t = get_default_parameters(tmp_path, subsampling_factor=2, **paths)
    params_t["io_tile_x"] = (2, H)
    params_t["io_tile_y"] = (0, W // 2)
    tiled = MultifilesDataset(params_t, paths["train_data_path"], train=True)
    s_tile = tiled[0]
    np.testing.assert_allclose(s_tile["inp"], s_full["inp"][..., 2:H, : W // 2], atol=0)


def test_init_distributed_io_single_process_is_identity(tmp_path):
    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, **paths)
    params["img_shape_x"], params["img_shape_y"] = 16, 32
    mesh = pmesh.init(h=2, w=2, batch=2)
    tx, ty = init_distributed_io(params, mesh)
    # one process owns every tile -> reads everything
    assert tx == (0, 16) and ty == (0, 32)


def test_tile_ranges_follow_padded_shard_map_uneven():
    """Uneven latitude counts (721-style) follow the padded-lat convention:
    tiles come from GSPMD's shard boundaries on the padded grid, clamped to
    physical rows (the batch path pads the last tile back up)."""
    mesh = pmesh.init(h=4, w=2)
    H, W = 18, 32  # padded to 20 over h=4 -> shard starts 0,5,10,15
    Hp = H + (-H) % 4
    sharding = NamedSharding(mesh, P(None, None, "h", "w"))
    imap = sharding.devices_indices_map((1, 1, Hp, W))
    starts = sorted({(idx[2].start or 0) for idx in imap.values()})
    assert starts == [0, 5, 10, 15]
    stops = sorted({idx[2].stop or Hp for idx in imap.values()})
    assert stops == [5, 10, 15, 20]
