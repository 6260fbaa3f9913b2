"""Experiment-harness utilities (port of the reference's doppler_tutorials
helpers — image conversion, metrics, velocity estimation, multi-pass
rendering drivers)."""

from .image import (to_tof_image, rgb2luminance, to_ldr_image,
                    calc_velocity_from_homo_hetero,
                    calc_velocity_from_homo_heteros,
                    mae, rmse, psnr, relative_rmse, snr)
from .runner import (render_image_multi_pass, run_scene_doppler_tof,
                     run_scene_velocity, run_scene_radiance)

__all__ = [
    "to_tof_image", "rgb2luminance", "to_ldr_image",
    "calc_velocity_from_homo_hetero", "calc_velocity_from_homo_heteros",
    "mae", "rmse", "psnr",
    "relative_rmse", "snr", "render_image_multi_pass",
    "run_scene_doppler_tof", "run_scene_velocity", "run_scene_radiance",
]
