"""Paper-figure reproduction (reference doppler_tutorials/src/main_plot.py).

Renders the reference's figure families from the experiment data produced
by ``utils.experiments``:

  * frequency-vs-error curves per method x path_correlation_depth
    (main_plot.py plot_2d_freq_vs_error_by_expname_subplot — the paper's
    Fig. 12-shaped comparison)
  * frequency x offset error heatmaps
    (plot_2d_freq_vs_a / plot_3d_freq_vs_a_vs_error_by_expname)
  * ToF image mosaics, methods x correlation depths (plot_experiment1)
  * antithetic-shift sweep curves (Exp3)

Everything is headless (Agg) and writes PNG (+ optional SVG), so figures
reproduce in CI and on remote workers.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import numpy as np

__all__ = ["plot_freq_vs_error", "plot_error_heatmap",
           "plot_method_image_grid", "plot_shift_sweep", "smooth"]


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def smooth(x, y, n: int = 100):
    """Reference main_plot.py:78-83 — dense resample + moving average."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if len(x) < 3:
        return x, y
    xd = np.linspace(x.min(), x.max(), n)
    yd = np.interp(xd, x, y)
    k = max(n // 10, 1)
    kernel = np.ones(k) / k
    ys = np.convolve(np.pad(yd, (k // 2, k - 1 - k // 2), mode="edge"),
                     kernel, mode="valid")
    return xd, ys


def _save(fig, out_dir, name, svg):
    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, name + ".png")]
    fig.savefig(paths[0], bbox_inches="tight", dpi=200)
    if svg:
        paths.append(os.path.join(out_dir, name + ".svg"))
        fig.savefig(paths[1], bbox_inches="tight")
    _plt().close(fig)
    return paths


def plot_freq_vs_error(metrics: Dict, out_dir: str, error: str = "mae",
                       offset: Optional[float] = None, name: str = None,
                       do_smooth: bool = True, svg: bool = False):
    """Frequency-vs-error curves, one line per (method, pcd) — the paper's
    method-comparison figure. ``metrics``: {(method, pcd, hf, ho): {error:
    value}} from experiments.metrics_vs_gt. ``offset``: fix hetero_offset,
    or None to average over offsets (reference other_value='mean')."""
    plt = _plt()
    series = {}
    for (method, pcd, hf, ho), m in metrics.items():
        if offset is not None and abs(ho - offset) > 1e-9:
            continue
        series.setdefault((method, pcd), {}).setdefault(hf, []).append(
            m[error])
    fig, ax = plt.subplots(figsize=(6, 4.5))
    for (method, pcd), by_hf in sorted(series.items()):
        hfs = np.array(sorted(by_hf))
        ys = np.array([np.mean(by_hf[h]) for h in hfs])
        if do_smooth and len(hfs) >= 3:
            xs, ys = smooth(hfs, ys)
        else:
            xs = hfs
        ax.plot(xs, ys, label=f"{method} (pcd={pcd})")
    ax.set_xlabel("heterodyne frequency")
    ax.set_ylabel(error.upper())
    ax.legend(fontsize=8)
    off_tag = "mean" if offset is None else f"{offset:.2f}"
    return _save(fig, out_dir,
                 name or f"plot_freq_vs_{error}_offset_{off_tag}", svg)


def plot_error_heatmap(metrics: Dict, out_dir: str, method: str, pcd: int,
                       error: str = "mae", name: str = None,
                       svg: bool = False):
    """hetero_frequency x hetero_offset error heatmap for one method
    (reference plot_2d_freq_vs_a)."""
    plt = _plt()
    pts = {(hf, ho): m[error] for (mth, p, hf, ho), m in metrics.items()
           if mth == method and p == pcd}
    if not pts:
        raise ValueError(f"no metrics for method={method} pcd={pcd}")
    hfs = sorted({k[0] for k in pts})
    hos = sorted({k[1] for k in pts})
    grid = np.full((len(hos), len(hfs)), np.nan)
    for (hf, ho), v in pts.items():
        grid[hos.index(ho), hfs.index(hf)] = v
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(grid, origin="lower", aspect="auto",
                   extent=[min(hfs), max(hfs), min(hos), max(hos)])
    fig.colorbar(im, ax=ax, label=error.upper())
    ax.set_xlabel("heterodyne frequency")
    ax.set_ylabel("heterodyne offset")
    ax.set_title(f"{method} pcd={pcd}")
    return _save(fig, out_dir,
                 name or f"plot_freq_vs_offset_{error}_{method}_pcd{pcd}",
                 svg)


def plot_method_image_grid(images: Dict, out_dir: str,
                           methods: Iterable[str],
                           correlation_depths: Iterable[int],
                           hetero_frequency: float, hetero_offset: float,
                           exposure_time: float = 0.0015,
                           vmax: Optional[float] = None, name: str = None,
                           svg: bool = False):
    """ToF-image mosaic: rows = methods, cols = correlation depths
    (reference plot_experiment1's subplot grid). ``images``:
    {(method, pcd, hf, ho): rgb image} from experiments.run_method_grid."""
    from .image import to_tof_image

    plt = _plt()
    methods = list(methods)
    depths = list(correlation_depths)
    fig, axes = plt.subplots(len(methods), len(depths),
                             figsize=(3 * len(depths), 2.6 * len(methods)),
                             squeeze=False)
    tofs = {}
    for mi_, method in enumerate(methods):
        for di, pcd in enumerate(depths):
            img = images.get((method, pcd, hetero_frequency, hetero_offset))
            ax = axes[mi_][di]
            ax.set_xticks([])
            ax.set_yticks([])
            if img is None:
                ax.set_visible(False)
                continue
            tofs[(method, pcd)] = to_tof_image(np.asarray(img),
                                               exposure_time)
    vm = vmax if vmax is not None else (
        max(np.abs(t).max() for t in tofs.values()) if tofs else 1.0)
    for (method, pcd), tof in tofs.items():
        ax = axes[methods.index(method)][depths.index(pcd)]
        ax.imshow(tof, cmap="seismic", vmin=-vm, vmax=vm)
        if methods.index(method) == 0:
            ax.set_title(f"pcd={pcd}", fontsize=10)
        if depths.index(pcd) == 0:
            ax.set_ylabel(method, fontsize=10)
    fig.tight_layout()
    return _save(fig, out_dir, name or "plot_total", svg)


def plot_shift_sweep(metrics_by_shift: Dict, out_dir: str,
                     error: str = "rmse", name: str = None,
                     svg: bool = False):
    """Antithetic-shift sweep (Exp3): error vs shift.
    ``metrics_by_shift``: {shift: {error: value}}."""
    plt = _plt()
    shifts = sorted(metrics_by_shift)
    ys = [metrics_by_shift[s][error] for s in shifts]
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.plot(shifts, ys, marker="o")
    ax.set_xlabel("antithetic shift")
    ax.set_ylabel(error.upper())
    return _save(fig, out_dir, name or f"plot_shift_vs_{error}", svg)
