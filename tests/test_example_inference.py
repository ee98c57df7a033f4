"""CI run of the user-facing model-package inference example.

Pins the headless equivalent of the reference's
``notebooks/inference_model_package.ipynb``: demo mode builds a tiny
package on synthetic data, then drives the identical load -> rollout ->
plot path a user of a real trained package would take.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_demo_mode_writes_plots(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "inference_model_package.py"),
         "--demo", "--platform", "cpu", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert pngs, f"no plots written; stdout: {proc.stdout[-500:]}"
    # the demo package round-trips through the real package loader
    assert os.path.isdir(os.path.join(tmp_path, "demo_package")) or any(
        os.path.isdir(os.path.join(tmp_path, d)) for d in os.listdir(tmp_path)
    )
