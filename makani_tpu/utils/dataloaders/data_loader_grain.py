"""Grain-based async data pipeline (the DALI replacement; ref makani/utils/
dataloaders/data_loader_dali_2d.py:33-389 + dali_es_helper_2d.py).

Wraps the multifiles HDF5 dataset in a Grain pipeline: multi-worker sample
loading (each worker owns its own HDF5 handles), global shuffling per epoch,
batching, and background prefetch — the host-side analogue of DALI's async
GPU pipeline, feeding device_put'ed sharded arrays.

Falls back cleanly if grain is unavailable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

__all__ = ["GrainDataLoader"]


class _SampleSource:
    """grain RandomAccessDataSource over a makani_tpu dataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[int(idx)]


class GrainDataLoader:
    """Batched, shuffled, prefetching iterator with the BatchIterator interface."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 333,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        row_slice=None,
    ):
        import grain.python as grain

        self.dataset = dataset
        self.batch_size = batch_size
        self.global_batch_size = batch_size
        self.epoch = 0
        # multi-host: this process's rows of each global batch (identical
        # shuffles across processes partition the batch exactly)
        self.row_slice = row_slice
        self.process_local = row_slice is not None

        self._grain = grain
        source = _SampleSource(dataset)

        def make_iter(epoch):
            sampler = grain.IndexSampler(
                num_records=len(source),
                shuffle=shuffle,
                seed=seed + epoch,
                num_epochs=1,
                shard_options=grain.NoSharding(),
            )
            ops = [grain.Batch(batch_size=batch_size, drop_remainder=drop_last)]
            loader = grain.DataLoader(
                data_source=source,
                sampler=sampler,
                operations=ops,
                worker_count=num_workers,
                read_options=grain.ReadOptions(prefetch_buffer_size=prefetch * batch_size),
            )
            return iter(loader)

        self._make_iter = make_iter

    def set_epoch(self, epoch: int):
        """Pin shuffle order to a global epoch number (reference
        DistributedSampler.set_epoch) for checkpoint-restart reproducibility."""
        self.epoch = int(epoch)

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        it = self._make_iter(self.epoch)
        self.epoch += 1
        from makani_tpu.utils.dataloader import _assemble

        for samples in it:
            if self.row_slice is not None:
                if isinstance(samples, dict):
                    samples = {k: v[self.row_slice] for k, v in samples.items()}
                else:
                    samples = list(samples)[self.row_slice]
            # grain batches dict-of-arrays with a leading batch dim already
            if isinstance(samples, dict):
                batch = samples
                inp = np.asarray(batch["inp"])
                B, T, C, H, W = inp.shape
                out = {"inp": inp.reshape(B, T * C, H, W)}
                tar = np.asarray(batch["tar"])
                out["tar"] = tar.reshape(tar.shape[0], -1, H, W)
                if "izen" in batch:
                    izen = np.asarray(batch["izen"])
                    tzen = np.asarray(batch["tzen"])
                    zen = np.concatenate([izen, tzen[:, :-1]], axis=1) if tzen.shape[1] > 1 else izen
                    out["zen"] = zen
                    out["tzen"] = tzen
                yield out
            else:
                yield _assemble(list(samples))
