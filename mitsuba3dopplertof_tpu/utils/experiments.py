"""Paper-experiment drivers (reference doppler_tutorials/src/
main_experiment.py:22-139 + main_plot.py metrics).

Reproduces the reference's experiment grids:
  * Exp0 — ground truth: antithetic, path_correlation_depth=16, high spp,
           over the hetero_frequency x hetero_offset grid
  * Exp1 — time-sampling methods x path_correlation_depth
  * Exp2 — Exp1 without per-interval stratification
  * Exp3 — antithetic-shift sweep

Outputs .npy images under base_dir (resumable via exit_if_file_exists) and
a metrics dict vs the GT images (RMSE/MAE/PSNR/RelRMSE/SNR).
"""

from __future__ import annotations

import itertools
import os
from typing import Dict, List, Optional

import numpy as np

from .runner import run_scene_doppler_tof
from .image import to_tof_image, mae, rmse, psnr, relative_rmse, snr


def frequency_offset_grid(n: int = 11):
    """hetero_frequency x hetero_offset in linspace(0,1,n)^2
    (reference main_experiment.py:22-24)."""
    v = np.linspace(0.0, 1.0, n)
    return list(itertools.product(v, v))


def run_ground_truth(scene, base_dir: str, scene_name: str = "scene",
                     grid=None, total_spp: int = 4096,
                     w_g: float = 30.0, max_depth: int = 4, **kw):
    """Exp0 (reference main_experiment.py:73-84)."""
    grid = grid if grid is not None else frequency_offset_grid(3)
    out = {}
    for hf, ho in grid:
        img = run_scene_doppler_tof(
            scene=scene, scene_name=scene_name, base_dir=base_dir,
            expname="exp0_gt", hetero_frequency=hf, hetero_offset=ho,
            time_sampling_method="antithetic", path_correlation_depth=16,
            w_g=w_g, max_depth=max_depth, total_spp=total_spp, **kw)
        out[(hf, ho)] = img
    return out


def run_method_grid(scene, base_dir: str, scene_name: str = "scene",
                    grid=None, total_spp: int = 1024,
                    methods=("uniform", "stratified", "antithetic",
                             "antithetic_mirror"),
                    correlation_depths=(0, 1, 2, 16),
                    use_stratified_sampling_for_each_interval: bool = True,
                    w_g: float = 30.0, max_depth: int = 4, **kw):
    """Exp1/Exp2 (reference main_experiment.py:86-123)."""
    grid = grid if grid is not None else frequency_offset_grid(3)
    out = {}
    for method in methods:
        for pcd in correlation_depths:
            for hf, ho in grid:
                expname = f"{method}_pcd{pcd}"
                if not use_stratified_sampling_for_each_interval:
                    expname += "_nostrat"
                img = run_scene_doppler_tof(
                    scene=scene, scene_name=scene_name, base_dir=base_dir,
                    expname=expname, hetero_frequency=hf, hetero_offset=ho,
                    time_sampling_method=method, path_correlation_depth=pcd,
                    use_stratified_sampling_for_each_interval=(
                        use_stratified_sampling_for_each_interval),
                    w_g=w_g, max_depth=max_depth, total_spp=total_spp, **kw)
                out[(method, pcd, hf, ho)] = img
    return out


def run_shift_sweep(scene, base_dir: str, scene_name: str = "scene",
                    shifts=None, hetero_frequency: float = 1.0,
                    hetero_offset: float = 0.0, total_spp: int = 1024,
                    w_g: float = 30.0, max_depth: int = 4, **kw):
    """Exp3 (reference main_experiment.py:125-139)."""
    shifts = shifts if shifts is not None else np.linspace(0, 1, 11)
    out = {}
    for sh in shifts:
        img = run_scene_doppler_tof(
            scene=scene, scene_name=scene_name, base_dir=base_dir,
            expname=f"shift_{sh:.3f}", hetero_frequency=hetero_frequency,
            hetero_offset=hetero_offset, time_sampling_method="antithetic",
            antithetic_shift=float(sh), path_correlation_depth=16,
            w_g=w_g, max_depth=max_depth, total_spp=total_spp, **kw)
        out[float(sh)] = img
    return out


def metrics_vs_gt(images: Dict, gt_images: Dict,
                  exposure_time: float = 0.0015) -> Dict:
    """RMSE/MAE/PSNR/RelRMSE/SNR of scalar ToF images vs the ground truth
    (reference main_plot.py:53-70)."""
    out = {}
    for key, img in images.items():
        gk = key[-2:] if isinstance(key, tuple) and len(key) > 2 else key
        gt = gt_images.get(gk)
        if gt is None:
            continue
        a = to_tof_image(img, exposure_time)
        b = to_tof_image(gt, exposure_time)
        out[key] = {
            "rmse": rmse(a, b), "mae": mae(a, b), "psnr": psnr(a, b),
            "relrmse": relative_rmse(a, b), "snr": snr(a, b),
        }
    return out


__all__ = ["frequency_offset_grid", "run_ground_truth", "run_method_grid",
           "run_shift_sweep", "metrics_vs_gt"]
