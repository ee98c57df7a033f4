"""FourCastNet 3.1 (ref makani/models/networks/fourcastnet3_1.py:55-1177).

Variant of FCN3 distinguished by three things (everything else shares the
FCN3 backbone, which both files duplicate in the reference):

  * **sine activation** default (ref Sin module, :68),
  * **lmax-based cutoff heuristic** for the DISCO convolutions
    (``kernel_shape[0] * pi / lmax``, ref :55-57) instead of FCN3's
    nlat-based one,
  * **learned SST imputation** (ref :741-977): when an ``sst`` channel is
    present, a pointwise MLP conditioned on all input channels predicts fill
    values for its NaN (land) positions before encoding.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.imputation import MLPImputation
from makani_tpu.models.networks.fourcastnet3 import AtmoSphericNeuralOperatorNet

__all__ = ["AtmoSphericNeuralOperatorNet31"]


class AtmoSphericNeuralOperatorNet31(AtmoSphericNeuralOperatorNet):
    """FCN3.1: sin activation, lmax cutoffs, SST imputation."""

    activation_function: str = "sin"
    theta_cutoff_mode: str = "lmax"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # SST imputation (ref fourcastnet3_1.py:741-977): fill NaN (land)
        # positions of the sst channel(s) from the other fields before the
        # encoder sees them
        sst_idx = tuple(i for i, n in enumerate(self.channel_names) if n == "sst")
        if sst_idx:
            n_total = x.shape[1]
            x = MLPImputation(
                inp_chans=n_total,
                impute_chans=sst_idx,
                dtype=self.dtype,
                name="sst_imputation",
            )(x)
        return AtmoSphericNeuralOperatorNet.__call__(self, x, deterministic=deterministic)
