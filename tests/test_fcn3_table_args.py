"""End-to-end table-args protocol on a real FCN3 train step (bench mirror).

bench.py's MAKANI_DISCO_TABLE_ARGS path (relay HTTP-413 fix for FCN3.1 /
0.25-degree psi tables) does: eval_shape the FULL train step to fill the
DISCO table registry, device_put the registry, then trace the step inside
``disco_table_context`` with the tables as an extra jit argument. The unit
tests (tests/test_disco_table_args.py) cover single convs; this covers the
composed model — grouped encoders/decoders (fused path), processor blocks
(two-stage), polar-FFT rows and value_and_grad + adam through the context.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from makani_tpu.models.model_registry import get_model
from makani_tpu.ops.disco import disco_table_context, disco_table_registry
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u500", "t500", "q500", "u850", "t850", "q850", "t2m", "msl", "tcwv"]


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def test_fcn3_train_step_table_args_parity():
    params = ParamsBase(
        dict(
            nettype="FCN3",
            img_shape_x=24,
            img_shape_y=48,
            scale_factor=2,
            embed_dim=16,
            atmo_embed_dim=8,
            surf_embed_dim=8,
            aux_embed_dim=4,
            num_layers=2,
            sfno_block_frequency=2,
            kernel_shape=(2, 2),
            encoder_kernel_shape=(2, 2),
            channel_names=list(NAMES),
            in_channels=list(range(len(NAMES))),
            out_channels=list(range(len(NAMES))),
            n_history=0,
            n_future=0,
            add_zenith=True,
            clamp_water=True,
            normalization_layer="instance_norm",
            losses=[{"type": "l2"}],
            multistep={"push_forward": False},
        )
    )
    model, _ = get_model(params, multistep=False)

    B, C, H, W = 1, len(NAMES), 24, 48
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, H, W))
    zen = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 1, H, W))
    tar = jax.random.normal(jax.random.PRNGKey(3), (B, C, H, W))
    p0 = model.init(jax.random.PRNGKey(0), x, zen)
    tx = optax.adam(1e-3)
    s0 = tx.init(p0)

    def base_step(p, s, inp, target, z):
        def loss_fn(q):
            pred = model.apply(q, inp, z)
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return loss, optax.apply_updates(p, updates), s

    # baked-constant reference
    loss_b, p_b, _ = jax.jit(base_step)(p0, s0, x, tar, zen)

    # bench protocol: registry-filling abstract trace, then context trace
    jax.eval_shape(base_step, p0, s0, x, tar, zen)
    tabs = {k: jnp.asarray(v) for k, v in disco_table_registry().items()}
    assert tabs, "FCN3 trace registered no DISCO tables"

    def step_args(p, s, inp, target, z, tabs_):
        with disco_table_context(tabs_):
            return base_step(p, s, inp, target, z)

    loss_a, p_a, _ = jax.jit(step_args)(p0, s0, x, tar, zen, tabs)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    da = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p_a, p_b)
    worst = max(jax.tree.leaves(da))
    assert worst < 1e-6, f"updated params diverge: max abs diff {worst}"
