"""Smoke-test the driver-run bench entrypoint (bench.py) on CPU.

The driver executes ``python bench.py`` on the real chip at the end of every
round and records the last JSON line in BENCH_r{N}.json; a crash there loses
the round's headline measurement. This guards the three measured modes —
deterministic SFNO, FCN3 (DISCO family), and the folded ensemble-CRPS step —
at tiny shapes so a refactor cannot silently break the measurement path.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = {
    "BENCH_PLATFORM": "cpu",
    "BENCH_NLAT": "16",
    "BENCH_NLON": "32",
    "BENCH_EMBED": "16",
    "BENCH_LAYERS": "2",
    "BENCH_BATCH": "1",
    "BENCH_STEPS": "1",
    "BENCH_WARMUP": "1",
    "BENCH_SCAN": "1",
    "BENCH_EXTRA": "0",
}

MODES = {
    "sfno": {},
    "fcn3": {
        "BENCH_NETTYPE": "FCN3",
        "BENCH_ATMO_EMBED": "8",
        "BENCH_SURF_EMBED": "8",
        "BENCH_AUX_EMBED": "8",
        "BENCH_CHECKPOINTING": "3",
    },
    "ensemble": {"BENCH_ENSEMBLE": "2"},
    # the reference's flagship shape: DISCO-family model + folded ensemble-CRPS
    "fcn3_ensemble": {
        "BENCH_NETTYPE": "FCN3",
        "BENCH_ATMO_EMBED": "8",
        "BENCH_SURF_EMBED": "8",
        "BENCH_AUX_EMBED": "8",
        "BENCH_CHECKPOINTING": "3",
        "BENCH_ENSEMBLE": "2",
    },
}


def test_bench_extras_recorded():
    """The driver runs plain ``python bench.py``; the FCN3 and ensemble rows
    in BENCH_r*.json come from _run_extras subprocesses. Drive that exact
    path at tiny shapes: the headline JSON must carry extra.fcn3 and
    extra.ensemble sub-results (env BENCH_* shape knobs inherit into the
    children; only the nettype/ensemble knobs differ)."""
    env = dict(os.environ, **TINY)
    env.update(
        {
            "BENCH_EXTRA": "fcn3,ensemble",
            "BENCH_ATMO_EMBED": "8",
            "BENCH_SURF_EMBED": "8",
            "BENCH_AUX_EMBED": "8",
            "BENCH_ENSEMBLE_SIZE": "2",
            "BENCH_ENSEMBLE_REMAT": "none",
            "BENCH_FCN3_BATCH": "1",
        }
    )
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert p.returncode == 0, (p.stderr or p.stdout)[-2000:]
    line = next((l for l in reversed(p.stdout.strip().splitlines()) if l.startswith("{")), None)
    row = json.loads(line)
    assert "extra" in row, row
    for name in ("fcn3", "ensemble"):
        sub = row["extra"][name]
        assert "error" not in sub, sub
        assert sub["value"] > 0


@pytest.mark.parametrize("mode", sorted(MODES))
def test_bench_mode_emits_json(mode):
    env = dict(os.environ, **TINY, **MODES[mode])
    env.pop("XLA_FLAGS", None)  # single virtual device, like the driver run
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert p.returncode == 0, (p.stderr or p.stdout)[-2000:]
    line = next((l for l in reversed(p.stdout.strip().splitlines()) if l.startswith("{")), None)
    assert line, p.stdout[-2000:]
    row = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in row
    assert row["value"] > 0
    assert row["unit"] == "samples/s/chip"
    if mode == "ensemble":
        assert "crps" in row["metric"].lower() or "ens" in row["metric"].lower(), row["metric"]
