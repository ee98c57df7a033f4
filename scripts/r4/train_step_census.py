"""Flagship-scale collective census of the FULL train step (VERDICT r3 #7).

AOT-compiles the complete training step (forward + loss + grad + adam
update) for SFNO and FCN3 at 0.25 deg (721 x 1440) on an 8-device virtual
CPU mesh carved h=2 x w=2 x batch=2, then counts the collectives XLA emits
and their logical bytes. This is the design evidence for the multi-chip
sharding: the reference's distributed SpectralConv issues 8 all-to-alls per
conv (ref mpu/fft.py:148-182); the psum_scatter Legendre + Ulysses FFT
layout here should show far fewer, and MAKANI_DISCO_HALO=1 should carry the
FCN3 local convs on small collective-permutes.

Run (slow: two 0.25-deg CPU compiles):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/r4/train_step_census.py [--nettype SFNO|FCN3|both] [--resolution 721 1440]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "r3")))
from disco_halo_census import census  # reuse the HLO collective parser


def build_params(nettype, nlat, nlon):
    from makani_tpu.utils.yparams import ParamsBase

    if nettype == "FCN3":
        names = ["u10m", "v10m", "u100m", "v100m", "t2m", "sp", "msl", "tcwv"]
        for v in ("u", "v", "z", "t", "q"):
            names += [f"{v}{p}" for p in (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)]
    else:
        names = [f"ch{i}" for i in range(73)]
    cfg = dict(
        nettype=nettype,
        img_shape_x=nlat,
        img_shape_y=nlon,
        scale_factor=3 if nettype == "SFNO" else 2,
        embed_dim=384,
        num_layers=8,
        operator_type="dhconv",
        normalization_layer="instance_norm" if nettype == "SFNO" else "none",
        channel_names=names,
        in_channels=list(range(73)),
        out_channels=list(range(73)),
        n_history=0,
        n_future=0,
        add_zenith=True,
        compute_dtype="bfloat16",
        checkpointing_level=3,
        losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
        lr=1e-3,
        optimizer_type="Adam",
        scheduler="none",
        multistep={"push_forward": False},
    )
    if nettype == "FCN3":
        cfg.update(
            atmo_embed_dim=45,
            surf_embed_dim=56,
            aux_embed_dim=36,
            num_layers=10,
            sfno_block_frequency=5,
            kernel_shape=[3, 3],
            filter_basis_type="morlet th",
            filter_basis_norm_mode="mean",
        )
    return ParamsBase(cfg)


def compile_train_step(nettype, nlat, nlon):
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from makani_tpu.models.model_registry import get_model
    from makani_tpu.parallel import mesh as pmesh
    from makani_tpu.parallel.sharding_rules import infer_param_partition_spec
    from makani_tpu.utils.loss import LossHandler
    from makani_tpu.utils.yparams import ParamsBase  # noqa: F401

    params = build_params(nettype, nlat, nlon)
    pmesh.cleanup()
    mesh = pmesh.init(h=2, w=2, batch=2)

    model, _ = get_model(params, multistep=True)
    loss_obj = LossHandler(params)

    Hpad = nlat + (-nlat) % 2
    rng = np.random.RandomState(0)
    ds = NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w"))
    zs = NamedSharding(mesh, P(("batch", "ensemble"), None, None, "h", "w"))
    x = jax.device_put(rng.randn(2, 73, Hpad, nlon).astype(np.float32), ds)
    tar = jax.device_put(rng.randn(2, 73, Hpad, nlon).astype(np.float32), ds)
    zen = jax.device_put(rng.randn(2, 1, 1, Hpad, nlon).astype(np.float32), zs)

    model_params = jax.eval_shape(lambda k: model.init(k, x, zen), jax.random.PRNGKey(0))
    specs = infer_param_partition_spec(model_params)
    pshard = jax.tree_util.tree_map(lambda sp: NamedSharding(mesh, sp), specs)
    model_params = jax.jit(lambda k: model.init(k, x, zen), out_shardings=pshard)(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt_state = jax.jit(tx.init)(model_params)

    def train_step(p, s, inp, target, z):
        def loss_fn(q):
            pred = model.apply(q, inp, z, train=True)
            return loss_obj(pred, target, inp=inp, train=True)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return loss, optax.apply_updates(p, updates), s

    compiled = jax.jit(train_step).lower(model_params, opt_state, x, tar, zen).compile()
    return compiled.as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nettype", default="both", choices=["SFNO", "FCN3", "both"])
    ap.add_argument("--resolution", type=int, nargs=2, default=(721, 1440))
    args = ap.parse_args()

    nlat, nlon = args.resolution
    nets = ["SFNO", "FCN3"] if args.nettype == "both" else [args.nettype]
    out = {}
    for nt in nets:
        txt = compile_train_step(nt, nlat, nlon)
        counts, bytes_ = census(txt)
        total_n, total_b = sum(counts.values()), sum(bytes_.values())
        print(f"\n== {nt} {nlat}x{nlon} h2w2b2 train step: {total_n} collectives, {total_b/1e6:.2f} MB logical ==")
        for op in sorted(counts, key=lambda o: -bytes_[o]):
            print(f"  {op:20s} n={counts[op]:3d}  {bytes_[op]/1e6:9.3f} MB")
        out[nt] = {"counts": dict(counts), "mbytes": {k: v / 1e6 for k, v in bytes_.items()}}
    print("\nJSON:", json.dumps(out))


if __name__ == "__main__":
    main()
