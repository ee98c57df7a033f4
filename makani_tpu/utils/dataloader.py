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

__all__ = ["get_dataloader", "BatchIterator"]


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
    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 333, drop_last: bool = True, num_workers: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.num_workers = num_workers

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


def get_dataloader(params, location: str, mode: str = "train", final_eval: bool = False):
    """Returns (iterator, dataset)."""
    train = mode == "train"
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
    )
    return it, dataset
