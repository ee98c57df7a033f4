"""Visualization utilities (ref tests/test_visualize.py: every plot entry
point renders headless to a real file; the derived-quantity functors are
checked numerically).
"""

import os

import numpy as np
import pytest

from makani_tpu.utils.visualize import (
    VisualizationWrapper,
    plot_comparison,
    plot_field,
    plot_rollout_curves,
    render_rollout_video,
    windspeed,
)

NAMES = ["u10m", "v10m", "t2m", "u850", "v850"]


def _png_ok(path):
    assert os.path.isfile(path) and os.path.getsize(path) > 1000
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_windspeed_levels_and_broadcast():
    rng = np.random.default_rng(0)
    fields = rng.standard_normal((2, len(NAMES), 6, 8)).astype(np.float32)
    ws10 = windspeed(fields, NAMES, level="10m")
    ws850 = windspeed(fields, NAMES, level="850")
    assert ws10.shape == (2, 6, 8)
    np.testing.assert_allclose(ws10, np.hypot(fields[:, 0], fields[:, 1]), rtol=1e-6)
    np.testing.assert_allclose(ws850, np.hypot(fields[:, 3], fields[:, 4]), rtol=1e-6)
    with pytest.raises(ValueError):
        windspeed(fields, NAMES, level="500")  # no u500/v500 in the names


def test_plot_field_writes_png(tmp_path):
    out = str(tmp_path / "field.png")
    got = plot_field(np.random.default_rng(1).standard_normal((20, 40)), title="t2m", path=out)
    assert got == out
    _png_ok(out)


def test_plot_field_returns_figure_without_path():
    fig = plot_field(np.zeros((4, 8)))
    assert hasattr(fig, "savefig")
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_comparison_writes_png(tmp_path):
    rng = np.random.default_rng(2)
    out = str(tmp_path / "cmp.png")
    plot_comparison(rng.standard_normal((10, 20)), rng.standard_normal((10, 20)), title="u10m", path=out)
    _png_ok(out)


def test_render_rollout_video_gif(tmp_path):
    frames = np.random.default_rng(3).standard_normal((3, 8, 16)).astype(np.float32)
    out = str(tmp_path / "roll.gif")
    render_rollout_video(frames, out, title="t2m", fps=2)
    assert os.path.getsize(out) > 500
    with open(out, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")


def test_plot_rollout_curves_channel_selection(tmp_path):
    curves = {"rmse": np.linspace(0, 1, 10 * len(NAMES)).reshape(10, len(NAMES)), "acc": np.ones((10, len(NAMES)))}
    out = str(tmp_path / "curves.png")
    plot_rollout_curves(curves, NAMES, channels=["t2m", "u850"], dhours=6, path=out)
    _png_ok(out)
    with pytest.raises(ValueError):
        plot_rollout_curves(curves, NAMES, channels=["nope"], path=str(tmp_path / "x.png"))


def test_visualization_wrapper_async_pool(tmp_path):
    rng = np.random.default_rng(4)
    wrap = VisualizationWrapper(str(tmp_path / "viz"), NAMES, max_workers=2)
    pred = rng.standard_normal((len(NAMES), 8, 16)).astype(np.float32)
    tar = rng.standard_normal((len(NAMES), 8, 16)).astype(np.float32)
    roll = rng.standard_normal((3, len(NAMES), 8, 16)).astype(np.float32)
    wrap.add_comparison(pred, tar, "t2m", tag="e1")
    wrap.add_comparison(pred, tar, "u10m")
    wrap.add_video(roll, "v10m")
    done = wrap.finalize()
    assert len(done) == 3
    _png_ok(str(tmp_path / "viz" / "e1_t2m.png"))
    _png_ok(str(tmp_path / "viz" / "compare_u10m.png"))
    assert os.path.getsize(str(tmp_path / "viz" / "rollout_v10m.gif")) > 500
    # unknown channel surfaces as ValueError at submit time
    wrap2 = VisualizationWrapper(str(tmp_path / "viz2"), NAMES)
    with pytest.raises(ValueError):
        wrap2.add_comparison(pred, tar, "q500")
    wrap2.finalize()
