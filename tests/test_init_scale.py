"""Registry-wide init-output-scale pins.

Round-4 verdict (weak #3): an untrained FCN3.1 amplified unit-variance input
~2.8x per step under the nodal basis norm because DiscoConv's weight-init std
ignored the per-basis response mass of the psi tables. An untrained
forecaster must NOT amplify — the reference nets all halve/scale their init
gains so an untrained forward is a contraction (ref
makani/models/networks/sfnonet.py:899-932, fourcastnet3.py encoder/decoder
gain conventions). This suite pins that property for EVERY registered model
so a future init regression cannot land silently.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.yparams import ParamsBase

# untrained output std on unit-variance input must be O(<=1); 1.5 leaves
# headroom for small-shape variance while still catching the 2.8x anomaly
MAX_STD = 1.5

FCN_NAMES = ["u500", "t500", "q500", "u850", "t850", "q850", "t2m", "msl", "tcwv"]
GEN_NAMES = ["u10m", "v10m", "t2m", "z500", "q700"]


def _base(nettype, names, **over):
    cfg = dict(
        nettype=nettype,
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        atmo_embed_dim=8,
        surf_embed_dim=8,
        aux_embed_dim=4,
        pos_embed_dim=3,
        num_layers=2,
        num_heads=4,
        num_blocks=4,
        patch_size=(4, 4),
        sfno_block_frequency=2,
        kernel_shape=(2, 3),
        encoder_kernel_shape=(2, 2),
        channel_names=list(names),
        in_channels=list(range(len(names))),
        out_channels=list(range(len(names))),
        n_history=0,
        n_future=0,
        add_zenith=True,
        normalization_layer="none",
        losses=[{"type": "l2"}],
        multistep={"push_forward": False},
    )
    cfg.update(over)
    return ParamsBase(cfg)


CASES = {
    "SFNO": _base("SFNO", GEN_NAMES),
    "FNO": _base("FNO", GEN_NAMES),
    "AFNO": _base("AFNO", GEN_NAMES),
    "AFNOv2": _base("AFNOv2", GEN_NAMES, normalization_layer="layer_norm"),
    "ViT": _base("ViT", GEN_NAMES),
    "DebugNet": _base("DebugNet", GEN_NAMES),
    "SNO": _base("SNO", FCN_NAMES),
    "FCN3": _base("FCN3", FCN_NAMES),
    # the round-4 anomaly config: nodal basis norm + sin activation +
    # fourier-bessel th — the combination that amplified 2.8x
    "FCN3.1": _base(
        "FCN3.1",
        FCN_NAMES,
        embed_dim=8,
        filter_basis_type="fourier-bessel th",
        filter_basis_norm_mode="nodal",
        activation_function="sin",
        encoder_bias=False,
        hard_thresholding_fraction=1.0,
    ),
    "Pangu": _base(
        "Pangu",
        ["t2m", "msl", "u500", "t500", "u850", "t850"],
        patch_size=(2, 4, 4),
        window_size=(2, 3, 6),
    ),
}


@pytest.mark.parametrize("nettype", sorted(CASES))
def test_untrained_output_is_contractive(nettype):
    params = CASES[nettype]
    model, _ = get_model(params, multistep=False)

    C = len(params.get("channel_names"))
    B, H, W = 2, 24, 48
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, H, W))
    zen = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 1, H, W))
    p = model.init(jax.random.PRNGKey(0), x, zen)

    y = np.asarray(model.apply(p, x, zen))
    assert np.isfinite(y).all()
    std = float(y.std())
    assert std <= MAX_STD, f"{nettype}: untrained output std {std:.3f} > {MAX_STD} — init amplifies"
    assert std > 1e-4, f"{nettype}: untrained output std {std:.2e} — init degenerate/zero"


@pytest.mark.parametrize("norm", ["nodal", "mean", "support", "none"])
@pytest.mark.parametrize("basis", ["harmonic", "fourier-bessel th", "morlet th"])
def test_fcn31_init_scale_all_basis_conventions(basis, norm):
    """The DiscoConv init-std compensation must hold under every
    basis_norm_mode, not just the default (the nodal convention was the
    round-4 amplifier)."""
    params = CASES["FCN3.1"]
    cfg = dict(params.params)
    cfg.update(filter_basis_type=basis, filter_basis_norm_mode=norm)
    model, _ = get_model(ParamsBase(cfg), multistep=False)

    C = len(FCN_NAMES)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, C, 24, 48))
    zen = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 1, 24, 48))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    std = float(np.asarray(model.apply(p, x, zen)).std())
    assert std <= MAX_STD, f"basis={basis} norm={norm}: std {std:.3f}"
