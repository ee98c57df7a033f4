"""Rank the compiled train step's HLO ops by the TPU compiler's own
estimated cycles (and by operand+output bytes).

The relay exposes no device trace, so this is the profiling substitute used
to target byte cuts: the optimized HLO's ``backend_config`` carries the
Mosaic/XLA cost model's ``estimated_cycles`` per fusion, and operand shapes
are recovered through a %name -> shape symbol table (they are not inline on
entry-computation lines).

Usage: python scripts/r3/analyze_hlo.py [--nlat 361 --nlon 720 --batch 3]
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

# PYTHONPATH=/root/repo breaks the axon plugin's startup imports; add the repo
# root at runtime instead
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
    "u8": 1, "f8e4m3fn": 1, "f64": 8, "c64": 8, "s64": 8, "u64": 8,
    "s16": 2, "u16": 2,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(s):
    total = 0
    for m in _SHAPE_RE.finditer(s):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


# "  %name = SHAPE op(%operand, ...), ..." / "  ROOT %name = ..."
_INST_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*((?:\([^=]*?\)|[\w\[\],{}:()$]+?))\s+([\w\-]+)\((.*)$"
)


def parse_hlo(txt):
    """Return (entry_ops, name2shape). entry_ops: list of dicts."""
    name2shape = {}
    comps = {}  # comp name -> list of (name, out_shape_str, op, rest)
    cur = None
    entry = None
    for line in txt.splitlines():
        if line and not line.startswith(" ") and "{" in line:
            m = re.search(r"%([\w.\-]+)\s*\(", line)
            cur = m.group(1) if m else None
            if cur is not None:
                comps[cur] = []
                if line.startswith("ENTRY"):
                    entry = cur
            continue
        if cur is None:
            continue
        m = _INST_RE.match(line)
        if not m:
            continue
        name, out_shape, op, rest = m.groups()
        name2shape[name] = out_shape
        comps[cur].append((name, out_shape, op, rest, line))
    return comps, entry, name2shape


def analyze(txt, top=45):
    comps, entry, name2shape = parse_hlo(txt)
    ops = []
    for name, out_shape, op, rest, line in comps.get(entry, []):
        if op in ("parameter", "constant", "get-tuple-element", "tuple", "bitcast"):
            continue
        out_b = shape_bytes(out_shape)
        # operand bytes: resolve %refs in the argument list (up to the closing paren)
        arg_str = rest.split(")", 1)[0]
        in_b = 0
        for ref in re.findall(r"%([\w.\-]+)", arg_str):
            in_b += shape_bytes(name2shape.get(ref, ""))
        cyc = 0
        mc = re.search(r'"estimated_cycles":"(\d+)"', line)
        if mc:
            cyc = int(mc.group(1))
        meta = re.search(r'op_name="([^"]*)"', line)
        tag = meta.group(1) if meta else ""
        ops.append(dict(bytes=out_b + in_b, cycles=cyc, op=op, name=name, tag=tag))

    total_b = sum(o["bytes"] for o in ops)
    total_c = sum(o["cycles"] for o in ops)
    # v5e ~ 940 MHz
    print(f"entry ops: {len(ops)}; logical bytes {total_b/1e9:.2f} GB; "
          f"estimated cycles {total_c/1e6:.1f} M (~{total_c/940e6*1e3:.1f} ms @940MHz)")

    for key in ("cycles", "bytes"):
        print(f"\n== by op type ({key}) ==")
        agg = defaultdict(float)
        for o in ops:
            agg[o["op"]] += o[key]
        for op, v in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
            unit = f"{v/1e6:9.1f} Mcyc" if key == "cycles" else f"{v/1e9:9.2f} GB"
            print(f"  {op:28s} {unit}")

    # group by coarse op_name prefix (jit(train_step)/... path segments)
    print("\n== by op_name path segment (cycles) ==")
    agg = defaultdict(float)
    for o in ops:
        tag = o["tag"]
        # strip jit wrappers, keep the most informative middle
        seg = re.sub(r"jit\([\w_]+\)/", "", tag)
        seg = "/".join(seg.split("/")[:3]) if seg else "(untagged)"
        agg[seg] += o["cycles"]
    for seg, v in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v/1e6:9.1f} Mcyc  {seg[:110]}")

    print(f"\n== top {top} ops by cycles ==")
    for o in sorted(ops, key=lambda d: -d["cycles"])[:top]:
        print(f"  {o['cycles']/1e6:8.2f} Mcyc {o['bytes']/1e9:7.3f} GB  {o['op']:18s} {o['name'][:36]:36s} {o['tag'][:100]}")
    return ops


def build_train_step(nlat, nlon, batch):
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

    # match the bench default (AUTO layouts on the carried state,
    # BENCH_AUTO_LAYOUT=1) so the census reflects the measured configuration
    if os.environ.get("BENCH_AUTO_LAYOUT", "1") == "1":
        try:
            from jax.experimental.layout import Format, Layout

            auto, deflt = Format(Layout.AUTO), Format()
            return jax.jit(
                train_step,
                in_shardings=(auto, auto, deflt, deflt, deflt),
                out_shardings=(deflt, auto, auto),
                donate_argnums=(0, 1),
            ).lower(p, s, x, tar, zen)
        except Exception as e:
            print(f"# auto-layout unavailable ({e}); default layouts", file=sys.stderr)
    return jax.jit(train_step, donate_argnums=(0, 1)).lower(p, s, x, tar, zen)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlat", type=int, default=361)
    ap.add_argument("--nlon", type=int, default=720)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--hlo-file", help="analyze a saved HLO text instead of compiling")
    ap.add_argument("--save-hlo", help="also dump the HLO text here")
    args = ap.parse_args()

    if args.hlo_file:
        txt = open(args.hlo_file).read()
    else:
        lowered = build_train_step(args.nlat, args.nlon, args.batch)
        compiled = lowered.compile()
        txt = compiled.as_text()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            print(f"# cost_analysis: flops={ca.get('flops', 0)/1e12:.3f} TF "
                  f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB", file=sys.stderr)
        except Exception as e:
            print(f"# cost_analysis failed: {e}", file=sys.stderr)
    if args.save_hlo:
        with open(args.save_hlo, "w") as f:
            f.write(txt)
    print(f"# HLO text: {len(txt)} chars", file=sys.stderr)
    analyze(txt)


if __name__ == "__main__":
    main()
