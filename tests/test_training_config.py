"""Training-configuration math: schedules, grad clipping, weight-decay
masks, freeze-label interactions, and channel-group bookkeeping
(ref makani/utils/training_helpers.py, tests/test_trainer_utils.py role).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from makani_tpu.utils.training.optimizer import _no_decay_mask, get_optimizer, get_schedule
from makani_tpu.utils.yparams import ParamsBase


def _p(**kw):
    base = dict(lr=1e-2, scheduler="none", optimizer_type="Adam")
    base.update(kw)
    return ParamsBase(base)


# ---------------------------------------------------------------------------
# schedules: closed-form values
# ---------------------------------------------------------------------------


def test_cosine_schedule_closed_form():
    lr, T = 2e-3, 10
    s = get_schedule(_p(lr=lr, scheduler="CosineAnnealingLR", scheduler_T_max=T), steps_per_epoch=1)
    for t in [0, 3, 7, 10]:
        expect = 0.5 * lr * (1 + np.cos(np.pi * min(t, T) / T))
        assert float(s(t)) == pytest.approx(expect, rel=1e-6), t
    # clamps at alpha * lr beyond T_max
    assert float(s(25)) == pytest.approx(0.0, abs=1e-12)


def test_cosine_schedule_min_lr_floor():
    s = get_schedule(
        _p(lr=1e-2, scheduler="CosineAnnealingLR", scheduler_T_max=4, scheduler_min_lr=1e-4), steps_per_epoch=1
    )
    assert float(s(4)) == pytest.approx(1e-4, rel=1e-6)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-6)


def test_step_schedule_staircase():
    s = get_schedule(
        _p(lr=1e-2, scheduler="StepLR", scheduler_step_size=5, scheduler_gamma=0.1), steps_per_epoch=1
    )
    assert float(s(0)) == pytest.approx(1e-2)
    assert float(s(4)) == pytest.approx(1e-2)  # staircase: no decay inside a window
    assert float(s(5)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(9)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(10)) == pytest.approx(1e-4, rel=1e-6)


def test_warmup_prepends_linear_ramp():
    s = get_schedule(_p(lr=1e-2, scheduler="none", lr_warmup_steps=10), steps_per_epoch=1)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(5)) == pytest.approx(5e-3, rel=1e-6)
    assert float(s(10)) == pytest.approx(1e-2, rel=1e-6)
    assert float(s(50)) == pytest.approx(1e-2, rel=1e-6)


def test_steps_per_epoch_scales_epoch_schedules():
    # T_max is in epochs (reference convention); the per-step schedule
    # stretches by steps_per_epoch
    s = get_schedule(_p(lr=1e-2, scheduler="CosineAnnealingLR", scheduler_T_max=2), steps_per_epoch=50)
    assert float(s(50)) == pytest.approx(0.5 * 1e-2 * (1 + np.cos(np.pi / 2)), rel=1e-6)


# ---------------------------------------------------------------------------
# optimizer assembly behavior
# ---------------------------------------------------------------------------


def _toy_params():
    return {
        "encoder": {"hidden0": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}},
        "block0": {"norm1": {"weight": jnp.ones((4,)), "bias": jnp.zeros((4,))}, "mlp": {"fc1": {"kernel": jnp.ones((4, 8))}}},
        "pos_embed": jnp.ones((1, 3, 5, 1)),
    }


def test_no_decay_mask_excludes_bias_norm_posembed():
    mask = _no_decay_mask(_toy_params())
    assert mask["encoder"]["hidden0"]["kernel"] is True
    assert mask["encoder"]["hidden0"]["bias"] is False
    assert mask["block0"]["norm1"]["weight"] is False
    assert mask["block0"]["mlp"]["fc1"]["kernel"] is True
    assert mask["pos_embed"] is False


def test_global_norm_clipping_applies():
    p = _toy_params()
    tx, _ = get_optimizer(_p(optimizer_max_grad_norm=1.0, lr=1.0, optimizer_type="SGD"), p)
    state = tx.init(p)
    g = jax.tree.map(lambda a: jnp.full_like(a, 100.0), p)
    updates, _ = tx.update(g, state, p)
    gnorm = float(optax.global_norm(updates))
    assert gnorm == pytest.approx(1.0, rel=1e-4)


def test_weight_decay_skips_masked_leaves():
    p = _toy_params()
    tx, _ = get_optimizer(_p(optimizer_type="AdamW", weight_decay=0.1, lr=1.0), p)
    state = tx.init(p)
    zeros = jax.tree.map(jnp.zeros_like, p)
    updates, _ = tx.update(zeros, state, p)
    # with zero gradients, only decayed leaves move
    assert float(jnp.abs(updates["encoder"]["hidden0"]["kernel"]).max()) > 0
    assert float(jnp.abs(updates["encoder"]["hidden0"]["bias"]).max()) == 0.0
    assert float(jnp.abs(updates["pos_embed"]).max()) == 0.0


def test_grad_accumulation_steps_defer_updates():
    p = {"w": jnp.ones((3,))}
    tx, _ = get_optimizer(_p(optimizer_type="SGD", lr=1.0, grad_accumulation_steps=2), p)
    state = tx.init(p)
    g = {"w": jnp.ones((3,))}
    u1, state = tx.update(g, state, p)
    assert float(jnp.abs(u1["w"]).max()) == 0.0  # first micro-step: no update
    u2, state = tx.update(g, state, p)
    assert float(jnp.abs(u2["w"]).max()) > 0.0  # second: averaged update applies


def test_factored_adam_matches_dense_adam_on_small_leaves():
    """Leaves too small to factor must follow plain Adam exactly."""
    p = {"w": jnp.ones((4,))}  # 1-D: never factored
    tx_f, _ = get_optimizer(_p(optimizer_nu_factored=True, lr=1e-2), p)
    tx_d, _ = get_optimizer(_p(lr=1e-2), p)
    sf, sd = tx_f.init(p), tx_d.init(p)
    rngs = np.random.RandomState(0)
    for _ in range(4):
        g = {"w": jnp.asarray(rngs.randn(4).astype(np.float32))}
        uf, sf = tx_f.update(g, sf, p)
        ud, sd = tx_d.update(g, sd, p)
        np.testing.assert_allclose(np.asarray(uf["w"]), np.asarray(ud["w"]), rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# channel-group bookkeeping (features.py)
# ---------------------------------------------------------------------------


def test_channel_groups_split_atmo_surface_and_aux():
    from makani_tpu.utils.features import get_channel_groups, get_water_channels

    names = ["u10m", "v10m", "t2m", "sp", "u500", "v500", "z500", "u850", "v850", "z850", "tcwv"]
    aux = ["xzen0", "xoro", "xlsml"]
    atmo, surf, dyn_aux, stat_aux, plvls = get_channel_groups(names, aux)

    # pressure levels discovered and ordered; atmo channels grouped per level
    assert sorted(plvls) == [500, 850]
    assert len(atmo) == 6 and len(surf) == 5
    assert all(names[i] in ("u10m", "v10m", "t2m", "sp", "tcwv") for i in surf)
    # atmo indices reference the same variable set at each level
    n_per = len(atmo) // len(plvls)
    vars_by_level = [sorted(names[i][0] for i in atmo[k * n_per : (k + 1) * n_per]) for k in range(len(plvls))]
    assert vars_by_level[0] == vars_by_level[1] == ["u", "v", "z"]

    # water channels: tcwv and q-levels count, u/v/z do not
    water = get_water_channels(["tcwv", "q500", "u500", "z850", "q850"])
    assert set(water) == {0, 1, 4}


def test_auxiliary_channel_ordering_stable():
    from makani_tpu.utils.features import get_auxiliary_channels

    aux = get_auxiliary_channels(add_zenith=True, add_orography=True, add_landmask=True, n_noise_chan=2)
    # dynamic (zenith, noise) channels precede static ones; names are unique
    assert len(aux) == len(set(aux))
    zen_pos = [i for i, n in enumerate(aux) if n.startswith("xzen")]
    noise_pos = [i for i, n in enumerate(aux) if n.startswith("xnoise")]
    static_pos = [i for i, n in enumerate(aux) if not n.startswith(("xzen", "xnoise"))]
    assert max(zen_pos + noise_pos) < min(static_pos)
