"""Device-op profile of the bench training step via jax.profiler.

The axon relay forwards XLA's device tracing (verified: convolution/fusion
ops appear under /device:TPU with real durations), so instead of ablation
timing we can rank the compiled step's fused ops directly.

Usage (same env knobs as bench.py):
    BENCH_NETTYPE=FCN3 BENCH_BATCH=1 python scripts/r4/profile_step.py [--top 40]

Writes the raw trace under /tmp/makani_profile/<tag>/ and prints a table of
top ops by total device time with their HLO category.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tag", default=os.environ.get("BENCH_NETTYPE", "SFNO"))
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--json", default=None, help="also dump {op: [total_us, count]} to this path")
    args = ap.parse_args()

    # reuse bench.py's full setup by running its main() with tiny
    # steps/warmup, but intercept the timed loop: simplest is to import the
    # module and inline the same construction. To keep one source of truth we
    # monkeypatch time.perf_counter? No — bench.py is self-contained; we
    # re-drive it with BENCH_STEPS and wrap the whole run in a trace. The
    # compile happens outside the trace window is preferable, so we patch
    # bench.main's timed section via env: BENCH_PROFILE_DIR makes this
    # wrapper redundant. Instead: run bench.main() under the profiler only
    # for the steady-state loop by using the fact that warmup compiles.
    os.environ.setdefault("BENCH_STEPS", str(args.steps))
    os.environ.setdefault("BENCH_WARMUP", "2")

    import jax

    import bench

    trace_dir = f"/tmp/makani_profile/{args.tag}"
    os.makedirs(trace_dir, exist_ok=True)

    import time

    real_pc = time.perf_counter
    state = {"n": 0, "tracing": False}

    # bench.main calls perf_counter exactly twice around the timed loop:
    # start tracing at the first call, stop at the second.
    def pc():
        state["n"] += 1
        if state["n"] == 1:
            jax.profiler.start_trace(trace_dir)
            state["tracing"] = True
        elif state["tracing"]:
            jax.profiler.stop_trace()
            state["tracing"] = False
        return real_pc()

    time.perf_counter = pc
    try:
        bench.main()
    finally:
        time.perf_counter = real_pc
        if state["tracing"]:
            jax.profiler.stop_trace()

    reports = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not reports:
        print("no trace written", file=sys.stderr)
        return 1
    with gzip.open(reports[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
    dur = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        pid_name = pids.get(e.get("pid"), "")
        if "TPU" not in pid_name:
            continue
        name = e["name"]
        if name.startswith("jit_"):
            continue  # whole-program spans; we want the ops inside
        dur[name] += e.get("dur", 0)
        cnt[name] += 1
        total += e.get("dur", 0)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({n: [dur[n], cnt[n]] for n in dur}, f)
    print(f"\n== top {args.top} device ops ({args.tag}); total op time {total/1e3:.1f} ms ==")
    print(f"{'ms':>10} {'%':>6} {'count':>6}  op")
    for n, d in dur.most_common(args.top):
        print(f"{d/1e3:10.3f} {100*d/total:6.2f} {cnt[n]:6d}  {n[:110]}")
    # category rollup (by leading op kind in the fusion name)
    cat = collections.Counter()
    for n, d in dur.items():
        base = n.split(".")[0]
        # strip trailing digits
        base = base.rstrip("0123456789").rstrip("_")
        cat[base] += d
    print("\n== rollup by op family ==")
    for n, d in cat.most_common(30):
        print(f"{d/1e3:10.3f} {100*d/total:6.2f}  {n[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
