"""Measured HBM traffic for the bench step's top fusions (VERDICT r4 item 4b).

The 0.5-deg ceiling argument previously rested on XLA's *logical* byte count
(cost_analysis). This script upgrades it to measured: it joins

  (a) per-op device durations from the relay's jax.profiler trace
      (scripts/r4/profile_step.py --json), with
  (b) per-op buffer bytes parsed from the optimized HLO entry computation
      (BENCH_DUMP_HLO) — output + operand buffer sizes per instruction,

and prints achieved GB/s per op against the v5e HBM peak (819 GB/s). If the
time-dominant fusions sit near the roofline, the residual step time is
bandwidth, not schedule slack.

Usage (same env knobs as bench.py):
    python scripts/r5/measured_bytes.py [--top 30]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

_ARRAY_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape: str) -> int:
    """Bytes of an HLO shape string (array or tuple)."""
    total = 0
    for dt, dims in _ARRAY_RE.findall(shape):
        if dt not in DTYPE_BYTES:
            continue  # token/opaque
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(\([^=]*?\)|\S+)\s+(\w+)\(")


def parse_entry(hlo_text: str):
    """name -> (output_bytes, [operand names]) for the ENTRY computation."""
    lines = hlo_text.splitlines()
    # find ENTRY computation block
    start = None
    for i, l in enumerate(lines):
        if l.startswith("ENTRY "):
            start = i
            break
    if start is None:
        raise SystemExit("no ENTRY computation in HLO dump")
    instrs = {}
    for l in lines[start + 1:]:
        if l.startswith("}"):
            break
        m = _INSTR_RE.match(l)
        if not m:
            continue
        name, shape, opcode = m.groups()
        # operand list: first parens group after the opcode
        rest = l[m.end():]
        depth, j = 1, 0
        while j < len(rest) and depth:
            if rest[j] == "(":
                depth += 1
            elif rest[j] == ")":
                depth -= 1
            j += 1
        operands = re.findall(r"%([\w.\-]+)", rest[:j])
        instrs[name] = (shape, opcode, operands)
    out = {}
    for name, (shape, opcode, operands) in instrs.items():
        ob = shape_bytes(shape)
        ib = sum(shape_bytes(instrs[o][0]) for o in operands if o in instrs)
        out[name] = (ob + ib, opcode)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    ap.add_argument("--hlo", default="/tmp/mb_hlo.txt")
    ap.add_argument("--prof", default="/tmp/mb_prof.json")
    ap.add_argument("--skip-run", action="store_true", help="reuse existing dump+trace files")
    args = ap.parse_args()

    env = dict(os.environ, BENCH_EXTRA="0")
    if not args.skip_run:
        print("== phase A: HLO dump ==", flush=True)
        e = dict(env, BENCH_DUMP_HLO=args.hlo)
        p = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")], env=e, text=True, capture_output=True)
        if p.returncode != 0:
            print(p.stderr[-2000:])
            return 1
        print("== phase B: device trace ==", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts/r4/profile_step.py"), "--json", args.prof, "--top", "5"],
            env=env, text=True, capture_output=True)
        if p.returncode != 0:
            print(p.stderr[-2000:])
            return 1

    with open(args.hlo) as f:
        per_op = parse_entry(f.read())
    with open(args.prof) as f:
        prof = json.load(f)

    rows = []
    unmatched_us = 0.0
    for name, (tot_us, cnt) in prof.items():
        key = name if name in per_op else name.lstrip("%")
        if key not in per_op:
            unmatched_us += tot_us
            continue
        nbytes, opcode = per_op[key]
        us = tot_us / max(cnt, 1)
        gbs = nbytes / (us * 1e-6) / 1e9 if us > 0 else 0.0
        rows.append((tot_us, us, cnt, nbytes, gbs, opcode, name))
    rows.sort(reverse=True)

    total_us = sum(r[0] for r in rows) + unmatched_us
    total_bytes_time = sum(r[3] * r[2] for r in rows)
    print(f"\n== measured HBM traffic, top {args.top} ops by device time "
          f"(peak {args.peak_gbs:.0f} GB/s) ==")
    print(f"{'tot ms':>8} {'%step':>6} {'us/exec':>8} {'MB':>8} {'GB/s':>7} {'%peak':>6}  op")
    for tot_us, us, cnt, nbytes, gbs, opcode, name in rows[: args.top]:
        print(f"{tot_us/1e3:8.2f} {100*tot_us/total_us:6.2f} {us:8.1f} {nbytes/1e6:8.1f} "
              f"{gbs:7.1f} {100*gbs/args.peak_gbs:6.1f}  {name[:90]}")
    print(f"\nmatched ops: {len(rows)}; unmatched device time {unmatched_us/1e3:.1f} ms "
          f"of {total_us/1e3:.1f} ms")
    print(f"aggregate achieved bandwidth over all matched ops: "
          f"{total_bytes_time/ (sum(r[0] for r in rows) * 1e-6) / 1e9:.1f} GB/s")
    # time-weighted %peak over the top rows (the ceiling claim)
    top = rows[: args.top]
    tw = sum(r[0] * min(r[4] / args.peak_gbs, 2.0) for r in top) / max(sum(r[0] for r in top), 1)
    print(f"time-weighted %peak over top {args.top}: {100*tw:.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
