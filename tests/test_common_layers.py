"""Common layers vs explicit numpy math (ref tests/test_layers.py, 981 LoC):
Conv1x1 grouped/channels-last equivalence, MLP structure, DropPath
statistics, LayerScale, patch embed/recovery round trip, init variance
scaling."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.common.layers import (
    MLP,
    Conv1x1,
    DropPath,
    LayerScale,
    PatchEmbed2D,
    PatchRecovery2D,
)

B, C, H, W = 2, 8, 6, 10


def test_conv1x1_matches_einsum_and_torch_semantics():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    m = Conv1x1(features=12)
    p = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(p, x))
    k = np.asarray(p["params"]["kernel"])[0]  # (C, 12)
    b = np.asarray(p["params"]["bias"])
    want = np.einsum("bchw,co->bohw", np.asarray(x), k) + b[None, :, None, None]
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_conv1x1_grouped_block_diagonal():
    """groups=2 must equal two independent half-channel convolutions."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    m = Conv1x1(features=12, groups=2, use_bias=False)
    p = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(p, x))
    k = np.asarray(p["params"]["kernel"])  # (2, C/2, 6)
    xa = np.asarray(x)
    want = np.concatenate(
        [np.einsum("bchw,co->bohw", xa[:, :4], k[0]), np.einsum("bchw,co->bohw", xa[:, 4:], k[1])], axis=1
    )
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_conv1x1_channels_last_parity():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    m_cf = Conv1x1(features=12, groups=2, use_bias=True)
    m_cl = Conv1x1(features=12, groups=2, use_bias=True, channels_last=True)
    p = m_cf.init(jax.random.PRNGKey(0), x)
    y_cf = np.asarray(m_cf.apply(p, x))
    y_cl = np.asarray(m_cl.apply(p, jnp.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(y_cl, (0, 3, 1, 2)), y_cf, atol=1e-5)


def test_conv1x1_bad_groups_raise():
    x = jnp.zeros((B, C, H, W))
    with pytest.raises(ValueError):
        Conv1x1(features=12, groups=3).init(jax.random.PRNGKey(0), x)


def test_mlp_structure_and_gain():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    m = MLP(hidden_features=16, out_features=C, gain=0.5)
    p = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(p, x))
    assert y.shape == (B, C, H, W)
    # fc2's init std follows sqrt(gain / hidden)
    k2 = np.asarray(p["params"]["fc2"]["kernel"])
    assert abs(k2.std() - math.sqrt(0.5 / 16)) < 0.2 * math.sqrt(0.5 / 16)


def test_drop_path_statistics_and_eval_identity():
    x = jnp.ones((64, 3, 4, 4))
    dp = DropPath(drop_prob=0.25)
    p = dp.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    # eval: identity
    np.testing.assert_array_equal(np.asarray(dp.apply(p, x, deterministic=True)), np.asarray(x))
    # train: whole samples either zero or scaled by 1/keep; mean preserved
    y = np.asarray(dp.apply(p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}))
    per_sample = y.reshape(64, -1)
    kept = per_sample[:, 0] > 0
    np.testing.assert_allclose(per_sample[kept], 1.0 / 0.75, atol=1e-6)
    np.testing.assert_allclose(per_sample[~kept], 0.0)
    assert abs(kept.mean() - 0.75) < 0.15


def test_layer_scale_both_layouts():
    x = jnp.ones((B, C, H, W)) * 2.0
    ls = LayerScale(num_chans=C, init_value=0.1)
    p = ls.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(ls.apply(p, x)), 0.2, atol=1e-6)
    ls_cl = LayerScale(num_chans=C, init_value=0.1, channels_last=True)
    x_cl = jnp.ones((B, H, W, C)) * 2.0
    np.testing.assert_allclose(np.asarray(ls_cl.apply(p, x_cl)), 0.2, atol=1e-6)


def test_patch_embed_recovery_shapes_and_locality():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, C, 8, 12).astype(np.float32))
    emb = PatchEmbed2D(patch_size=(2, 3), embed_dim=16)
    p = emb.init(jax.random.PRNGKey(0), x)
    y = emb.apply(p, x)
    assert y.shape == (B, 16, 4, 4)

    # locality: perturbing one patch changes only its token
    x2 = np.asarray(x).copy()
    x2[:, :, 0:2, 0:3] += 1.0
    y2 = emb.apply(p, jnp.asarray(x2))
    d = np.abs(np.asarray(y2) - np.asarray(y)).sum(axis=1)
    assert d[:, 0, 0].min() > 0
    assert np.abs(d[:, 1:, :]).max() < 1e-5 and np.abs(d[:, 0, 1:]).max() < 1e-5

    rec = PatchRecovery2D(patch_size=(2, 3), out_chans=C)
    pr = rec.init(jax.random.PRNGKey(1), y)
    z = rec.apply(pr, y)
    assert z.shape == (B, C, 8, 12)

    with pytest.raises(ValueError):
        emb.apply(p, jnp.zeros((B, C, 9, 12)))


def test_patch_embed_flatten_token_order():
    x = jnp.asarray(np.random.RandomState(5).randn(B, C, 8, 12).astype(np.float32))
    emb = PatchEmbed2D(patch_size=(2, 3), embed_dim=16, flatten=True)
    p = emb.init(jax.random.PRNGKey(0), x)
    tok = np.asarray(emb.apply(p, x))
    grid = np.asarray(PatchEmbed2D(patch_size=(2, 3), embed_dim=16).apply(p, x))
    np.testing.assert_allclose(tok.reshape(B, 4, 4, 16), np.transpose(grid, (0, 2, 3, 1)), atol=1e-6)
