"""Serial round-5 measurement queue on the single TPU chip.

Runs the VERDICT r4 measurement matrix one config at a time (the chip is a
shared single device — parallel runs corrupt timings), appending one JSON
line per config to the results file. Each config runs as a subprocess of
bench.py with BENCH_EXTRA=0 so a crash/OOM records an error row instead of
killing the queue.

Usage: python scripts/r5/bench_queue.py [--out /tmp/r5_queue.jsonl] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

FCN3_BASE = {
    "BENCH_NETTYPE": "FCN3",
    "BENCH_CHECKPOINTING": "3",
    "BENCH_SCAN": "8",
    "MAKANI_DISCO_BF16": "1",
}

CONFIGS = {
    # FCN3 B=2: the dense window removed the banded gather whose 10.2 GB XLA
    # relayout blocked B=2 in round 4 — does it fit now?
    "fcn3_b2": {**FCN3_BASE, "BENCH_BATCH": "2"},
    # per-band blocked dense GEMMs: FLOP inflation (stride*T+BL)/BL instead
    # of Hin/BL; T trades MXU M-occupancy against inflation
    "fcn3_tile64": {**FCN3_BASE, "BENCH_BATCH": "1", "MAKANI_DISCO_DENSE_TILE": "64"},
    "fcn3_tile128": {**FCN3_BASE, "BENCH_BATCH": "1", "MAKANI_DISCO_DENSE_TILE": "128"},
    # FCN3 at its published 0.25 deg pretraining resolution (ref
    # config/fourcastnet3.yaml:219-221: h2 x w2 on 80 GB GPUs)
    "fcn3_quarterdeg": {
        **FCN3_BASE,
        "BENCH_BATCH": "1",
        "BENCH_NLAT": "721",
        "BENCH_NLON": "1440",
        "BENCH_SCAN": "4",
        "BENCH_STEPS": "2",
    },
    # FCN3.1 and SNO: channels-last landed round 4, zero numbers exist
    "fcn31": {"BENCH_NETTYPE": "FCN3.1", "BENCH_BATCH": "1", "BENCH_SCAN": "8"},
    "sno": {"BENCH_NETTYPE": "SNO", "BENCH_BATCH": "1", "BENCH_CHECKPOINTING": "3", "BENCH_SCAN": "8", "MAKANI_DISCO_BF16": "1"},
    # ensemble-CRPS: the reference's flagship probabilistic workload shape
    # (ref ensemble.py:36-229, config/fourcastnet3.yaml:222-233) — folded
    # (B*E) batch, diffusion noise channels, skillspread CRPS. Never timed
    # on the chip before this round (VERDICT r4 missing #2).
    "sfno_ens4": {"BENCH_ENSEMBLE": "4", "BENCH_CHECKPOINTING": "1", "BENCH_SCAN": "8"},
    "sfno_ens16": {"BENCH_ENSEMBLE": "16", "BENCH_CHECKPOINTING": "3", "BENCH_SCAN": "4", "BENCH_STEPS": "2"},
    "fcn3_ens2": {**FCN3_BASE, "BENCH_ENSEMBLE": "2", "BENCH_SCAN": "4", "BENCH_STEPS": "2"},
    # --- round-5 follow-ups ---
    # fcn31 with the FCN3-family memory knobs (the first attempt ran without
    # ckpt/bf16-DISCO and OOMed — FCN3 needs both to fit at 0.5 deg)
    "fcn31_fit": {**FCN3_BASE, "BENCH_NETTYPE": "FCN3.1", "BENCH_BATCH": "1"},
    # ens4 at the bench-extra remat policy (the ckpt=1 row measured MFU 5.8%;
    # per-member cost analysis matches deterministic, so the gap is schedule)
    "sfno_ens4_st": {
        "BENCH_ENSEMBLE": "4",
        "BENCH_REMAT": "save_transforms_stats",
        "BENCH_CHECKPOINTING": "0",
        "BENCH_SCAN": "8",
    },
    # fcn31 at 0.5 deg died with relay HTTP 413 (compile request too large:
    # FCN3.1's dense DISCO tables baked as HLO constants); the banded window
    # formulation carries ~BL/Hin-fold smaller constants
    "fcn31_window": {
        **FCN3_BASE,
        "BENCH_NETTYPE": "FCN3.1",
        "BENCH_BATCH": "1",
        "MAKANI_DISCO_FUSED": "window",
    },
    # E=16 with the member-chunked fold (the unchunked E=16 encoder hidden
    # OOMed; 4-member chunks cap the activation peak)
    "sfno_ens16_chunk": {
        "BENCH_ENSEMBLE": "16",
        "BENCH_ENSEMBLE_CHUNK": "4",
        "BENCH_REMAT": "save_transforms_stats",
        "BENCH_SCAN": "4",
        "BENCH_STEPS": "2",
    },
    # 0.25 deg retry with blocked dense tables: at 721x1440 the full
    # (Hout, Hin) latitude tables are the dominant device-constant cost;
    # T=64 shrinks them ~Hin/(stride*T+BL)-fold
    "fcn3_quarterdeg_tile": {
        **FCN3_BASE,
        "BENCH_BATCH": "1",
        "BENCH_NLAT": "721",
        "BENCH_NLON": "1440",
        "BENCH_SCAN": "4",
        "BENCH_STEPS": "2",
        "MAKANI_DISCO_DENSE_TILE": "64",
    },
    # --- table-args retries: the HTTP 413 compile failures were the baked
    # psi-table constants; MAKANI_DISCO_TABLE_ARGS=1 ships them as one
    # device_put'd jit argument instead (tests/test_disco_table_args.py)
    "fcn31_targs": {
        **FCN3_BASE,
        "BENCH_NETTYPE": "FCN3.1",
        "BENCH_BATCH": "1",
        "MAKANI_DISCO_TABLE_ARGS": "1",
    },
    "fcn3_quarterdeg_targs": {
        **FCN3_BASE,
        "BENCH_BATCH": "1",
        "BENCH_NLAT": "721",
        "BENCH_NLON": "1440",
        "BENCH_SCAN": "4",
        "BENCH_STEPS": "2",
        "MAKANI_DISCO_TABLE_ARGS": "1",
    },
    # retry: first attempt died on a transient relay compile-helper HTTP 500
    # (TPU_WORKER_HOSTNAMES bootstrap failure), not a program error
    "sfno_ens16_chunk_r": {
        "BENCH_ENSEMBLE": "16",
        "BENCH_ENSEMBLE_CHUNK": "4",
        "BENCH_REMAT": "save_transforms_stats",
        "BENCH_SCAN": "4",
        "BENCH_STEPS": "2",
    },
    # ens4 with member-chunking (chunk=1): serializes members through one
    # deterministic-shaped forward — if the 4.5x per-member gap vs the
    # deterministic step is layout/schedule of the folded (B*E) batch, this
    # recovers it at the cost of scan overhead
    "sfno_ens4_chunk1": {
        "BENCH_ENSEMBLE": "4",
        "BENCH_ENSEMBLE_CHUNK": "1",
        "BENCH_REMAT": "save_transforms_stats",
        "BENCH_SCAN": "8",
    },
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_queue.jsonl")
    ap.add_argument("--timeout", type=int, default=3000)
    ap.add_argument("names", nargs="*", default=[])
    args = ap.parse_args()
    names = args.names or list(CONFIGS)

    for name in names:
        cfg = CONFIGS[name]
        env = dict(os.environ, BENCH_EXTRA="0", **cfg)
        t0 = time.time()
        row = {"name": name, "cfg": cfg}
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                env=env, capture_output=True, text=True, timeout=args.timeout,
            )
            line = next((l for l in reversed(p.stdout.strip().splitlines()) if l.startswith("{")), None)
            if p.returncode == 0 and line:
                row["result"] = json.loads(line)
            else:
                text = (p.stderr or "") + "\n" + (p.stdout or "")
                logpath = f"/tmp/r5_fail_{name}.log"
                with open(logpath, "w") as lf:
                    lf.write(text)
                lines = text.strip().splitlines()
                key = [l for l in lines if any(t in l for t in (
                    "RESOURCE_EXHAUSTED", "Out of memory", "exceeds the", "Error:"))][:3]
                row["error"] = f"rc={p.returncode}"
                row["log"] = logpath
                row["tail"] = " | ".join(key + lines[-3:])[-1200:]
        except subprocess.TimeoutExpired:
            row["error"] = f"timeout>{args.timeout}s"
        row["wall_s"] = round(time.time() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
