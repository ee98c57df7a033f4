"""Bisect the FCN3.1 init-scale anomaly (VERDICT r4 weak #3).

Builds the dryrun-config FCN3.1, feeds unit-variance input, and reports the
untrained output std plus per-stage stds (encoder out, each block out,
decoder out), and a matrix over (basis, norm_mode, activation) to find the
amplifying component.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.models.networks.fourcastnet3_1 import AtmoSphericNeuralOperatorNet31
from makani_tpu.models.networks.fourcastnet3 import AtmoSphericNeuralOperatorNet

NAMES = ["u10m", "v10m", "t2m", "z500", "q500", "z700", "q700"]


def build31(basis="fourier-bessel th", norm="nodal", act="sin", layers=2):
    return AtmoSphericNeuralOperatorNet31(
        inp_shape=(25, 48),
        out_shape=(25, 48),
        kernel_shape=(2, 3),
        filter_basis_type=basis,
        filter_basis_norm_mode=norm,
        channel_names=NAMES,
        aux_channel_names=("xzen",),
        embed_dim=8,
        aux_embed_dim=4,
        pos_embed_dim=2,
        num_layers=layers,
        activation_function=act,
        normalization_layer="none",
        hard_thresholding_fraction=1.0,
        scale_factor=2,
        sfno_block_frequency=2,
        big_skip=False,
    )


def probe(model, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, 8, 25, 48).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x)
    _, state = model.apply(p, x, capture_intermediates=True)
    y = model.apply(p, x)
    taps = {}
    flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    for path, v in flat:
        key = "/".join(str(k.key) for k in path if hasattr(k, "key"))
        if isinstance(v, jnp.ndarray):
            taps[key] = float(jnp.std(v))
    return float(jnp.std(y)), taps


def main():
    print("== matrix over (basis, norm, act), 2-layer FCN3.1, unit input ==")
    for basis in ["fourier-bessel th", "morlet th", "harmonic"]:
        for norm in ["nodal", "mean"]:
            for act in ["sin", "gelu"]:
                m = build31(basis, norm, act)
                s, _ = probe(m)
                print(f"  basis={basis:18s} norm={norm:5s} act={act:4s} -> out std {s:.4f}")

    print("\n== per-stage taps at the dryrun config ==")
    m = build31()
    s, taps = probe(m)
    for k in sorted(taps):
        print(f"  {k}: {taps[k]:.4f}")
    print(f"  OUTPUT std: {s:.4f}")


if __name__ == "__main__":
    main()
