"""FourCastNet 3.1 (ref makani/models/networks/fourcastnet3_1.py).

Variant of FCN3 with a sine activation option and an lmax-based cutoff-radius
heuristic for the local convolutions; otherwise shares the FCN3 backbone.
"""

from __future__ import annotations

from makani_tpu.models.networks.fourcastnet3 import AtmoSphericNeuralOperatorNet

__all__ = ["AtmoSphericNeuralOperatorNet31"]


class AtmoSphericNeuralOperatorNet31(AtmoSphericNeuralOperatorNet):
    """FCN3.1: pass activation_function="sin" for the sine activation
    (registered in sfnonet._ACTIVATIONS); remaining architecture identical to
    the shared backbone."""
