"""Rank the compiled train step's HLO ops by operand+output bytes.

Compiles the bench train step (via the relay when available) and parses the
optimized HLO text into a per-op byte/flop census — the relay exposes no
device trace, so this is the profiling substitute used to target byte cuts.
"""

import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("MAKANI_TRANSFORM_PRECISION", "default")

from makani_tpu.ops.precision import set_transform_precision

set_transform_precision("default")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.training.optimizer import scale_by_adam_factored
from makani_tpu.utils.yparams import ParamsBase

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f64": 8, "c64": 8, "s64": 8, "u64": 8, "s16": 2, "u16": 2}


def shape_bytes(s):
    # e.g. f32[3,384,361,720]{3,2,1,0} or (f32[..], bf16[..]) tuple
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    nlat, nlon, batch = 361, 720, 3
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

    lowered = jax.jit(train_step).lower(p, s, x, tar, zen)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"# HLO text: {len(txt)} chars", file=sys.stderr)

    # parse: every instruction line "  %name = TYPE op(...)" inside ENTRY/fusions
    # roll up by top-level op in the entry computation; fusion bodies counted
    # into their fusion op via the fusion's output + operand shapes only
    # (that approximates actual HBM traffic: fusion internals stay in registers)
    entry = None
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)[\s=]*\(", line) if line and not line.startswith(" ") else None
        if line.startswith("ENTRY") or (line and not line.startswith(" ") and "{" in line):
            name = re.search(r"%?([\w.\-]+)\s*\(", line)
            cur = name.group(1) if name else "?"
            comps[cur] = []
            if line.startswith("ENTRY"):
                entry = cur
            continue
        if cur and line.strip().startswith(("%", "ROOT")):
            comps[cur].append(line.strip())

    ops = []
    for line in comps.get(entry, []):
        m = re.match(r"(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|[\w\[\],{}]+)\s+([\w\-]+)\(", line)
        if not m:
            continue
        name, out_shape, op = m.groups()
        out_b = shape_bytes(out_shape)
        # operand shapes: every TYPE[dims] appearing after the op name
        rest = line[m.end():]
        in_b = shape_bytes(rest)
        meta = re.search(r'metadata=\{[^}]*op_name="([^"]*)"', line)
        tag = meta.group(1) if meta else ""
        ops.append((out_b + in_b, op, name, tag[:120]))

    ops.sort(reverse=True)
    total = sum(o[0] for o in ops)
    print(f"total logical bytes (entry ops): {total/1e9:.1f} GB over {len(ops)} ops")
    by_op = defaultdict(float)
    for b, op, _, _ in ops:
        by_op[op] += b
    print("\n== by op type ==")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {op:28s} {b/1e9:8.2f} GB")
    print("\n== top 40 ops ==")
    for b, op, name, tag in ops[:40]:
        print(f"  {b/1e9:7.3f} GB  {op:22s} {name[:40]:40s} {tag}")


if __name__ == "__main__":
    main()
