"""Minimal-repro bisect for the mix-first DISCO scan TPU-worker crash.

Round 4 observed (PERF.md): the FCN3 bench (published recipe, 0.5 deg, B=1,
scan 8, remat 3, bf16-DISCO) with MAKANI_DISCO_MIX_FIRST=1 compiled fine but
KILLED the TPU worker process twice during *execution*. The path was parked
opt-in with no root cause (VERDICT r4 item 6).

This script isolates the mix_first conv at the processor-block configuration
(the only place the flag changes the program: full-channel-mixing local convs
at the internal grid, ops/disco.py mix_first) and escalates through variants,
each in a FRESH SUBPROCESS, probing worker health between runs:

  health        trivial jitted op (worker alive?)
  fwd           jit(mix_first) forward only
  grad          jit(value_and_grad(sum(mix_first)))
  loop8         8 python-dispatched grad+update steps
  scan8         lax.scan of 8 grad+update steps  <- the bench shape of the crash
  scan8_nopolar scan8 with the polar-FFT branch stripped
  scan8_fp32    scan8 with MAKANI_DISCO_BF16=0

The first variant whose subprocess dies (or whose following health probe
fails) is the minimal repro. Run the ladder with no args; run a single
variant by name (used by the parent).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

# processor-block config of the published FCN3 recipe at 0.5 deg:
# internal grid 181x360 (scale_factor 2), 641-channel full-mix local conv,
# morlet th basis, kernel (3,3), theta_cutoff = 2 * nlat-cutoff
NLAT, NLON = int(os.environ.get("REPRO_NLAT", 181)), int(os.environ.get("REPRO_NLON", 360))
CHANS = int(os.environ.get("REPRO_CHANS", 641))
KERNEL = (3, 3)
BASIS = "morlet th"


def build():
    import jax.numpy as jnp
    import numpy as np
    from makani_tpu.ops.disco import DiscoConvS2, compute_cutoff_radius

    theta = 2 * compute_cutoff_radius(NLAT, KERNEL, BASIS)
    conv = DiscoConvS2(
        (NLAT, NLON), (NLAT, NLON), KERNEL,
        basis_type=BASIS, basis_norm_mode="mean",
        grid_in="equiangular", grid_out="equiangular", theta_cutoff=theta,
    )
    K = conv.psi_band.shape[1]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, CHANS, NLAT, NLON)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((1, CHANS, CHANS, K)) / np.sqrt(CHANS * K), jnp.float32)
    return conv, x, w


def run_variant(name: str) -> None:
    import jax
    import jax.numpy as jnp

    if name == "health":
        v = float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
        assert v == 128.0 * 128 * 128
        print("health OK")
        return

    conv, x, w = build()
    if name.endswith("_nopolar"):
        conv.polar_rows = []

    def loss_fn(wp):
        y = conv.mix_first(x, wp)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    t0 = time.time()
    if name == "fwd":
        f = jax.jit(lambda wp: jnp.sum(conv.mix_first(x, wp)))
        for _ in range(3):
            out = float(f(w))
    elif name == "grad":
        f = jax.jit(jax.value_and_grad(loss_fn))
        for _ in range(3):
            v, g = f(w)
            out = float(v)
    elif name == "loop8":
        f = jax.jit(jax.value_and_grad(loss_fn))
        wp = w
        for _ in range(8):
            v, g = f(wp)
            wp = wp - 1e-9 * g
        out = float(v)
    elif name.startswith("scan8"):
        def body(wp, _):
            v, g = jax.value_and_grad(loss_fn)(wp)
            return wp - 1e-9 * g, v

        @jax.jit
        def scan_step(wp):
            wp, vs = jax.lax.scan(body, wp, None, length=8)
            return wp, vs[-1]

        wp, v = scan_step(w)
        out = float(v)
        wp, v = scan_step(wp)  # the round-4 crashes were on later dispatches
        out = float(v)
    else:
        raise SystemExit(f"unknown variant {name}")
    print(f"{name} OK value={out:.3e} {time.time() - t0:.1f}s")


def main() -> None:
    ladder = ["health", "fwd", "grad", "loop8", "scan8", "scan8_nopolar", "scan8_fp32", "health"]
    budget = int(os.environ.get("REPRO_TIMEOUT", 2400))
    results = {}
    for name in ladder:
        env = dict(os.environ, MAKANI_DISCO_BF16="0" if name.endswith("_fp32") else "1")
        try:
            p = subprocess.run([sys.executable, os.path.abspath(__file__), name],
                               env=env, capture_output=True, text=True, timeout=budget)
            ok = p.returncode == 0
            tail = (p.stdout + p.stderr).strip().splitlines()[-2:]
            results[name] = (ok, p.returncode, " | ".join(tail)[-300:])
        except subprocess.TimeoutExpired:
            results[name] = (False, "timeout", "")
        print(f"[{name}] {'OK' if results[name][0] else 'FAIL'} rc={results[name][1]} :: {results[name][2]}", flush=True)
        if name != "health" and not results[name][0]:
            # probe worker health before judging: a dead worker fails everything
            hp = subprocess.run([sys.executable, os.path.abspath(__file__), "health"],
                                capture_output=True, text=True, timeout=600)
            print(f"[post-{name} health] rc={hp.returncode}", flush=True)
            if hp.returncode != 0:
                print(f"WORKER DEAD after variant {name!r} — minimal repro found; stopping.", flush=True)
                return
    print("ladder complete:", {k: v[0] for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        main()
