"""Checkpoint conversion: synthetic makani-style torch state dict -> makani_tpu
params; shapes must match the flax tree exactly and the converted model must
produce finite output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _synth_makani_sfno_state(inp_chans=5, out_chans=5, embed=16, layers=2, enc_hidden=16, L=12, H=24, W=48):
    """Build a state dict with the reference's SFNO key layout/shapes."""
    import torch

    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(o, i):
        return torch.randn(o, i, 1, 1, generator=g)

    # encoder: Sequential [conv, act, conv_out]
    sd["model.encoder.fwd.0.weight"] = conv(enc_hidden, inp_chans)
    sd["model.encoder.fwd.0.bias"] = torch.randn(enc_hidden, generator=g)
    sd["model.encoder.fwd.2.weight"] = conv(embed, enc_hidden)
    sd["model.decoder.fwd.0.weight"] = conv(enc_hidden, embed)
    sd["model.decoder.fwd.0.bias"] = torch.randn(enc_hidden, generator=g)
    sd["model.decoder.fwd.2.weight"] = conv(out_chans, enc_hidden)
    sd["model.residual_transform.weight"] = conv(out_chans, inp_chans)

    for i in range(layers):
        t = f"model.blocks.{i}"
        sd[f"{t}.filter.filter.weight"] = torch.view_as_complex(torch.randn(1, embed, embed, L, 2, generator=g))
        sd[f"{t}.norm0.weight"] = torch.ones(embed)
        sd[f"{t}.norm0.bias"] = torch.zeros(embed)
        sd[f"{t}.norm1.weight"] = torch.ones(embed)
        sd[f"{t}.norm1.bias"] = torch.zeros(embed)
        sd[f"{t}.outer_skip.weight"] = conv(embed, embed)
        sd[f"{t}.mlp.fwd.0.weight"] = conv(2 * embed, embed)
        sd[f"{t}.mlp.fwd.0.bias"] = torch.randn(2 * embed, generator=g)
        sd[f"{t}.mlp.fwd.3.weight"] = conv(embed, 2 * embed)
        sd[f"{t}.mlp.fwd.3.bias"] = torch.randn(embed, generator=g)
    return sd


def test_convert_sfno_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    from makani_tpu.convert_checkpoint import convert_sfno_state_dict, load_torch_checkpoint
    from makani_tpu.models.model_registry import get_model
    from makani_tpu.utils.yparams import ParamsBase

    H, W, embed, layers = 24, 48, 16, 2
    sd = _synth_makani_sfno_state(embed=embed, layers=layers, H=H, W=W, L=12)
    path = str(tmp_path / "ckpt_mp0_v0.tar")
    torch.save({"model_state": sd}, path)

    state = load_torch_checkpoint(path)
    converted = convert_sfno_state_dict(state)

    # target tree from our model (no zenith; same architecture)
    params = ParamsBase(
        dict(
            nettype="SFNO",
            img_shape_x=H,
            img_shape_y=W,
            scale_factor=2,
            embed_dim=embed,
            num_layers=layers,
            max_modes=(12, 12),
            channel_names=["u10m", "v10m", "t2m", "z500", "q700"],
            in_channels=list(range(5)),
            out_channels=list(range(5)),
            n_history=0,
            n_future=0,
            add_zenith=False,
            normalization_layer="instance_norm",
        )
    )
    model, pre = get_model(params, multistep=False)
    x = jnp.zeros((1, 5, H, W))
    template = model.init(jax.random.PRNGKey(0), x)

    # every template leaf must be provided with matching shape
    t_flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(template)}
    c_flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(converted)}
    missing = set(t_flat) - set(c_flat)
    assert not missing, f"missing converted params: {sorted(missing)}"
    for k in t_flat:
        assert c_flat[k].shape == t_flat[k].shape, (k, c_flat[k].shape, t_flat[k].shape)

    # converted params drive the model to a finite output
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), jnp.ones((1, 5, H, W)))
    assert np.isfinite(np.asarray(y)).all()


def test_th_basis_guard_blocks_rederived_import(tmp_path):
    """convert_checkpoint must refuse a th-convention DISCO import that has
    no tabulated basis and no explicit override (docs/th_basis_import.md)."""
    from makani_tpu.convert_checkpoint import _guard_th_basis
    from makani_tpu.utils.yparams import ParamsBase

    cfg = ParamsBase(dict(filter_basis_type="morlet th"))
    with pytest.raises(SystemExit):
        _guard_th_basis(cfg, allow_rederived=False)
    # missing config entirely is also a refusal
    with pytest.raises(SystemExit):
        _guard_th_basis(None, allow_rederived=False)
    # explicit override passes
    _guard_th_basis(cfg, allow_rederived=True)
    _guard_th_basis(None, allow_rederived=True)
    # native (non-th) basis conventions pass without a table
    _guard_th_basis(ParamsBase(dict(filter_basis_type="morlet")))
    # a th convention WITH a table passes
    cfg_tab = ParamsBase(dict(filter_basis_type="morlet th", filter_basis_table=str(tmp_path / "b.npz")))
    _guard_th_basis(cfg_tab)


def test_th_basis_table_schema_roundtrip(tmp_path):
    """A table following the export schema (docs/th_basis_import.md) loads,
    registers, and reproduces its own values through the interpolator."""
    from makani_tpu.ops.disco import _tabulated_values, load_basis_table

    K, Nr, Na = 3, 64, 32
    rng = np.random.RandomState(0)
    r = np.linspace(0.0, 0.05, Nr)
    alpha = np.arange(Na) * (2 * np.pi / Na)
    vals = rng.randn(K, Nr, Na)
    path = tmp_path / "synthetic_3x.npz"
    np.savez_compressed(
        path,
        vals=vals,
        r=r,
        alpha=alpha,
        r_cutoff=np.float64(0.05),
        basis_type=np.bytes_(b"synthetic"),
        kernel_shape=np.asarray([3]),
        th_version=np.bytes_(b"test"),
    )
    basis_type = load_basis_table(str(path))
    assert basis_type.startswith("tabulated:")
    name = basis_type.split(":", 1)[1]
    # interpolation at the table's own nodes reproduces the values exactly
    rr = np.broadcast_to(r[:, None], (Nr, Na)).ravel()
    aa = np.broadcast_to(alpha[None, :], (Nr, Na)).ravel()
    got = _tabulated_values(rr, aa, name)
    np.testing.assert_allclose(got.reshape(K, Nr, Na), vals, rtol=0, atol=1e-12)
