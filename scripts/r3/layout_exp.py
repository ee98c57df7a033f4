"""Experiment: compile the bench train step with AUTO input/output layouts for
the carried state (params + optimizer state) so XLA chooses the dhconv weight
layout once, instead of relayout-copying ~1.7 GB of filter weights every step
(HLO census: ~58 Mcyc of per-step copies on the (1,384,384,120,2) stacks).

Prints baseline and auto-layout samples/s on the same process/device.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from makani_tpu.ops.precision import set_transform_precision

set_transform_precision("default")

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.experimental.layout import Format, Layout

from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.training.optimizer import scale_by_adam_factored
from makani_tpu.utils.yparams import ParamsBase


def build():
    nlat, nlon, batch = 361, 720, int(os.environ.get("BENCH_BATCH", 3))
    names = [f"ch{i}" for i in range(73)]
    params = ParamsBase(
        dict(
            nettype="SFNO", img_shape_x=nlat, img_shape_y=nlon, scale_factor=3, embed_dim=384,
            num_layers=8, operator_type="dhconv", normalization_layer="instance_norm",
            channel_names=names, in_channels=list(range(73)), out_channels=list(range(73)),
            n_history=0, n_future=0, add_zenith=True, compute_dtype="bfloat16",
            losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
            multistep={"push_forward": False},
        )
    )
    model, _ = get_model(params, multistep=True)
    loss_obj = LossHandler(params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 73, nlat, nlon).astype(np.float32))
    zen = jnp.asarray(rng.randn(batch, 1, 1, nlat, nlon).astype(np.float32))
    tar = jnp.asarray(rng.randn(batch, 73, nlat, nlon).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    tx = optax.chain(scale_by_adam_factored(mu_dtype=jnp.bfloat16), optax.scale_by_learning_rate(1e-3))
    s = tx.init(p)

    def train_step(p, s, inp, target, z):
        def loss_fn(q):
            pred = model.apply(q, inp, z, train=True)
            return loss_obj(pred, target, inp=inp, train=True)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return loss, optax.apply_updates(p, updates), s

    return train_step, p, s, x, tar, zen, batch


def timeit(step_fn, carry, args, steps=8, warmup=2):
    for _ in range(warmup):
        loss, *carry = step_fn(*carry, *args)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, *carry = step_fn(*carry, *args)
    float(loss)
    return (time.perf_counter() - t0) / steps


def main():
    train_step, p, s, x, tar, zen, batch = build()

    # donation deletes the originals; keep live copies for phase 2
    p0 = jax.tree.map(lambda a: jnp.array(a, copy=True), p)
    s0 = jax.tree.map(lambda a: jnp.array(a, copy=True), s)

    base = jax.jit(train_step, donate_argnums=(0, 1))
    dt = timeit(base, [p, s], (x, tar, zen))
    print(f"baseline: {batch/dt:.3f} samples/s ({dt*1e3:.1f} ms/step)", flush=True)

    auto = Format(Layout.AUTO)
    deflt = Format()
    # AUTO for the carried state; default layouts for the host-fed batch
    jitted = jax.jit(
        train_step,
        in_shardings=(auto, auto, deflt, deflt, deflt),
        out_shardings=(deflt, auto, auto),
        donate_argnums=(0, 1),
    )
    lowered = jitted.lower(p, s, x, tar, zen)
    compiled = lowered.compile()
    fmts = compiled.input_formats
    p_l, s_l = fmts[0][0], fmts[0][1]
    p2 = jax.device_put(p0, p_l)
    s2 = jax.device_put(s0, s_l)
    dt2 = timeit(compiled, [p2, s2], (x, tar, zen))
    print(f"auto-layout: {batch/dt2:.3f} samples/s ({dt2*1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
