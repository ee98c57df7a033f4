"""Collective census: hand halo-exchange DISCO vs GSPMD-derived comms.

Compiles the FCN3 spatial-parity forward on an 8-device virtual CPU mesh
with MAKANI_DISCO_HALO on and off, and counts the collective ops XLA emits
(all-gather / all-to-all / collective-permute / all-reduce) plus their
logical bytes. The hand path should show small collective-permute halos
where GSPMD emits latitude all-gathers.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/r3/disco_halo_census.py
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f64": 8, "pred": 1}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(line):
    # output shape sits between "= " and the op name
    seg = line.split("=", 1)[1] if "=" in line else line
    seg = seg.split("(", 1)[0]
    total = 0
    for m in _SHAPE_RE.finditer(seg):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def census(txt):
    counts = defaultdict(int)
    bytes_ = defaultdict(int)
    for line in txt.splitlines():
        for op in ("all-gather", "all-to-all", "collective-permute", "all-reduce", "reduce-scatter"):
            if f" {op}(" in line or f" {op}-start(" in line:
                counts[op] += 1
                bytes_[op] += shape_bytes(line)
    return counts, bytes_


def compile_fcn3():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from makani_tpu.models.model_registry import get_model
    from makani_tpu.parallel import mesh as pmesh
    from makani_tpu.parallel.sharding_rules import infer_param_partition_spec
    from makani_tpu.utils.yparams import ParamsBase

    cfg = dict(
        nettype="FCN3",
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        channel_names=["u10m", "v10m", "t2m", "q700"],
        in_channels=[0, 1, 2, 3],
        out_channels=[0, 1, 2, 3],
        n_history=0,
        n_future=0,
        add_zenith=False,
    )
    pmesh.cleanup()
    mesh = pmesh.init(h=2, w=2, batch=2)
    m, _ = get_model(ParamsBase(dict(cfg)), multistep=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 24, 48).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    specs = infer_param_partition_spec(p)
    pd = jax.device_put(p, jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs))
    xd = jax.device_put(x, NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w")))
    compiled = jax.jit(m.apply).lower(pd, xd).compile()
    return compiled.as_text()


def main():
    results = {}
    for mode, env in [("halo", "1"), ("gspmd", "0")]:
        os.environ["MAKANI_DISCO_HALO"] = env
        txt = compile_fcn3()
        results[mode] = census(txt)

    for mode, (counts, bytes_) in results.items():
        total_n = sum(counts.values())
        total_b = sum(bytes_.values())
        print(f"\n== {mode}: {total_n} collectives, {total_b/1e6:.2f} MB logical ==")
        for op in sorted(counts, key=lambda o: -bytes_[o]):
            print(f"  {op:20s} n={counts[op]:3d}  {bytes_[op]/1e6:8.3f} MB")


if __name__ == "__main__":
    main()
