"""Autoencoder trainer (ref makani/utils/training/autoencoder_trainer.py:
56-767): trains the model to reconstruct its own input state (targets are the
inputs), used for pretraining encoders/decoders. Reuses the deterministic
trainer with the target stream replaced by the input stream.
"""

from __future__ import annotations

from makani_tpu.utils.training.deterministic_trainer import Trainer

__all__ = ["AutoencoderTrainer"]


class AutoencoderTrainer(Trainer):
    def _put_batch(self, batch):
        ae_batch = dict(batch)
        n_out_flat = batch["inp"].shape[1]
        # reconstruct the most recent input state
        ae_batch["tar"] = batch["inp"][:, -n_out_flat:]
        if "zen" in batch:
            T = self.params.get("n_history", 0) + 1
            ae_batch["zen"] = batch["zen"][:, :T]
        return super()._put_batch(ae_batch)
