"""Dataloader front-end (ref makani/utils/dataloader.py:30-248).

Chooses the backend (multifiles HDF5 / synthetic) and wraps it in a simple
shuffling batch iterator producing numpy batches:

    inp: (B, (n_history+1)*C, H, W)    flattened history, normalized
    tar: (B, (n_future+1)*C, H, W)     flattened future steps, normalized
    zen: (B, n_history+1+n_future, 1, H, W)  cos zenith sequence (optional)

The zenith sequence is the concatenation of the input-window zenith and the
target zeniths except the last — exactly the window sequence the multistep
stepper slides over (replaces the reference's cached unpredicted features,
preprocessor.py:709-1017).

Device placement / host-to-device overlap happens in the trainer via
``jax.device_put`` with the mesh sharding; a Grain-based async prefetcher can
be slotted in behind the same interface.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, Optional

import numpy as np

__all__ = ["get_dataloader", "BatchIterator", "init_distributed_io"]


def init_distributed_io(params, mesh=None):
    """Per-process sharded IO (ref makani/utils/dataloader.py:30-71 io_grid).

    Computes the (h, w) tile of the global grid owned by this process's
    devices — taken directly from jax's own shard index map, so uneven
    latitude splits match GSPMD's layout exactly — and the slice of the
    global batch this process feeds. Single-process worlds read everything
    (one host owns all tiles); multi-host worlds read only their tile, which
    is what makes 0.25 deg input volumes (~600 MB/sample fp32) feasible.

    Sets ``params["io_tile_x"/"io_tile_y"]`` (row/col index ranges into the
    *final* cropped+subsampled grid) for datasets to restrict their reads.
    Returns (tile_x, tile_y).
    """
    import jax

    H = params.get("img_shape_x")
    W = params.get("img_shape_y")
    if mesh is None or jax.process_count() == 1:
        tile_x, tile_y = (0, H), (0, W)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # sharded arrays follow the padded-latitude convention (721 -> the
        # mesh multiple): tiles are computed on the padded grid and clamped
        # back to physical rows (the trainer pads the batch before assembly)
        nh, nw = mesh.shape["h"], mesh.shape["w"]
        Hp, Wp = H + (-H) % nh, W + (-W) % nw
        sharding = NamedSharding(mesh, P(None, None, "h", "w"))
        imap = sharding.devices_indices_map((1, 1, Hp, Wp))
        pidx = jax.process_index()
        rows, cols = [], []
        for dev, idx in imap.items():
            if dev.process_index != pidx:
                continue
            rows.append((idx[2].start or 0, idx[2].stop if idx[2].stop is not None else Hp))
            cols.append((idx[3].start or 0, idx[3].stop if idx[3].stop is not None else Wp))
        tile_x = (min(min(r[0] for r in rows), H), min(max(r[1] for r in rows), H))
        tile_y = (min(min(c[0] for c in cols), W), min(max(c[1] for c in cols), W))
    params["io_tile_x"] = tile_x
    params["io_tile_y"] = tile_y
    return tile_x, tile_y


def _assemble(samples):
    inp = np.stack([s["inp"] for s in samples])  # (B, T, C, H, W)
    tar = np.stack([s["tar"] for s in samples])
    B, T, C, H, W = inp.shape
    Bt, Tt, Ct, _, _ = tar.shape
    batch = {
        "inp": inp.reshape(B, T * C, H, W),
        "tar": tar.reshape(Bt, Tt * Ct, H, W),
    }
    if "izen" in samples[0]:
        izen = np.stack([s["izen"] for s in samples])  # (B, T, 1, H, W)
        tzen = np.stack([s["tzen"] for s in samples])  # (B, T', 1, H, W)
        if tzen.shape[1] > 1:
            zen = np.concatenate([izen, tzen[:, :-1]], axis=1)
        else:
            zen = izen
        batch["zen"] = zen
        batch["tzen"] = tzen
    return batch


class BatchIterator:
    """Shuffling batch iterator with double-buffered host prefetch.

    ``row_slice`` (multi-host): the slice of each *global* batch this process
    actually loads — the permutation is seeded identically on every process,
    so disjoint row slices partition the global batch exactly (the reference's
    DistributedSampler semantics).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 333,
        drop_last: bool = True,
        num_workers: int = 4,
        row_slice: Optional[slice] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.global_batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.num_workers = num_workers
        self.row_slice = row_slice
        self.process_local = row_slice is not None

    def set_epoch(self, epoch: int):
        """Pin the shuffle order to a global epoch number (the reference's
        DistributedSampler.set_epoch): makes batch order a pure function of
        the epoch so a checkpoint-restart resumes the identical trajectory."""
        self.epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        self.epoch += 1

        def fetch(batch_idx):
            if self.row_slice is not None:
                batch_idx = batch_idx[self.row_slice]
            return _assemble([self.dataset[int(i)] for i in batch_idx])

        batches = [idx[i : i + self.batch_size] for i in range(0, n - self.batch_size + 1, self.batch_size)]
        if not self.drop_last and n % self.batch_size:
            batches.append(idx[-(n % self.batch_size):])

        # double-buffered host prefetch
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(fetch, batches[0]) if batches else None
            for i in range(len(batches)):
                cur = nxt
                nxt = pool.submit(fetch, batches[i + 1]) if i + 1 < len(batches) else None
                yield cur.result()


def get_dataloader(params, location: str, mode: str = "train", final_eval: bool = False, mesh=None):
    """Returns (iterator, dataset)."""
    import jax

    train = mode == "train"

    # multi-host: each process reads only its (h, w) tile and its slice of the
    # global batch (ref dataloader.py:30-71 io_grid + DistributedSampler)
    row_slice = None
    if mesh is not None and jax.process_count() > 1:
        from makani_tpu.parallel import multihost

        init_distributed_io(params, mesh)
        E = params.get("ensemble_size", 1)
        if E > 1:
            # the ensemble trainer folds (B, E) -> B*E; the loader holds the
            # *unfolded* rows, so this process needs every batch row whose
            # members it owns (the ensemble axis may span processes —
            # ref config/fourcastnet3.yaml:222-233)
            fs = multihost.local_batch_slice(mesh, params.get("batch_size", 1) * E)
            row_slice = slice(fs.start // E, (fs.stop - 1) // E + 1)
        else:
            row_slice = multihost.local_batch_slice(mesh, params.get("batch_size", 1))

    if params.get("enable_synthetic_data", False) or params.get("data_loader_config", None) == "synthetic":
        from makani_tpu.utils.dataloaders.data_loader_dummy import DummyDataset

        dataset = DummyDataset(params, location, train=train, final_eval=final_eval)
    else:
        from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

        dataset = MultifilesDataset(params, location, train=train, final_eval=final_eval)

    batch_size = params.get("batch_size", 1)
    loader_kind = params.get("data_loader_config", "threaded")
    if loader_kind == "grain" and not params.get("enable_synthetic_data", False):
        try:
            from makani_tpu.utils.dataloaders.data_loader_grain import GrainDataLoader

            return (
                GrainDataLoader(
                    dataset,
                    batch_size=batch_size,
                    shuffle=train,
                    seed=params.get("seed", 333),
                    num_workers=params.get("num_data_workers", 2),
                    row_slice=row_slice,
                ),
                dataset,
            )
        except ImportError:
            pass
    it = BatchIterator(
        dataset,
        batch_size=batch_size,
        shuffle=train,
        seed=params.get("seed", 333),
        drop_last=True,
        num_workers=params.get("num_data_workers", 2),
        row_slice=row_slice,
    )
    return it, dataset
