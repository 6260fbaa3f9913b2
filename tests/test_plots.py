"""Figure reproduction (reference doppler_tutorials/src/main_plot.py)."""

import os

import numpy as np

from mitsuba3dopplertof_tpu.utils import plots


def _metrics():
    rng = np.random.default_rng(0)
    out = {}
    for method in ("uniform", "antithetic"):
        for pcd in (0, 16):
            for hf in (0.0, 0.5, 1.0):
                for ho in (0.0, 0.5):
                    base = 1.0 if method == "uniform" else 0.3
                    out[(method, pcd, hf, ho)] = {
                        "mae": base / (1 + pcd) + 0.1 * hf
                        + rng.uniform(0, 0.01),
                        "rmse": base / (1 + pcd) + 0.02}
    return out


def test_smooth_preserves_mean_level():
    x = np.linspace(0, 1, 7)
    y = np.sin(2 * np.pi * x) + 2.0
    xs, ys = plots.smooth(x, y)
    assert len(xs) == len(ys) == 100
    assert abs(ys.mean() - y.mean()) < 0.2


def test_freq_vs_error_and_heatmap(tmp_path):
    m = _metrics()
    p1 = plots.plot_freq_vs_error(m, str(tmp_path), error="mae")
    p2 = plots.plot_freq_vs_error(m, str(tmp_path), error="mae", offset=0.5,
                                  do_smooth=False, svg=True)
    p3 = plots.plot_error_heatmap(m, str(tmp_path), "antithetic", 16,
                                  error="rmse")
    for p in p1 + p2 + p3:
        assert os.path.getsize(p) > 0
    assert any(p.endswith(".svg") for p in p2)


def test_method_image_grid_and_shift(tmp_path):
    rng = np.random.default_rng(1)
    images = {}
    for method in ("uniform", "antithetic"):
        for pcd in (0, 16):
            images[(method, pcd, 1.0, 0.0)] = rng.normal(
                0, 0.1, (8, 8, 3)).astype(np.float32)
    p = plots.plot_method_image_grid(
        images, str(tmp_path), ("uniform", "antithetic"), (0, 16),
        hetero_frequency=1.0, hetero_offset=0.0)
    q = plots.plot_shift_sweep(
        {s: {"rmse": 1.0 + (s - 0.5) ** 2} for s in (0.0, 0.25, 0.5, 1.0)},
        str(tmp_path))
    for f in p + q:
        assert os.path.getsize(f) > 0


def test_heatmap_missing_raises(tmp_path):
    import pytest
    with pytest.raises(ValueError):
        plots.plot_error_heatmap({}, str(tmp_path), "nosuch", 0)
