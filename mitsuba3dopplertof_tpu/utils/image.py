"""ToF image conversion, velocity estimation and quality metrics.

Semantics follow the reference's experiment utilities
(reference doppler_tutorials/src/utils/image_utils.py:20-31,140-168 and
doppler_tutorials/src/main_plot.py:53-70) so experiment outputs are
numerically comparable.
"""

from __future__ import annotations

import numpy as np


def rgb2luminance(img: np.ndarray) -> np.ndarray:
    """BT.709 luminance (reference image_utils.py:20-21)."""
    img = np.asarray(img)
    return 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]


def to_tof_image(img, exposure_time: float = 0.0015) -> np.ndarray:
    """Scalar ToF image = luminance * T (reference image_utils.py:27-31;
    the integrator's output convention divides by T, reference README.md:29).
    """
    return rgb2luminance(np.asarray(img)) * exposure_time


def tone_map(c: np.ndarray, limit: float = 1.5) -> np.ndarray:
    lum = 0.3 * c[..., 0] + 0.6 * c[..., 1] + 0.1 * c[..., 2]
    return c / (1.0 + lum[..., None] / limit)


def to_ldr_image(img: np.ndarray) -> np.ndarray:
    return np.power(np.clip(tone_map(np.asarray(img)), 0.0, None), 1.0 / 2.2)


def calc_velocity_from_homo_hetero(homodyne, heterodyne, *,
                                   exposure_time: float = 0.0015,
                                   w_g: float = 30.0) -> np.ndarray:
    """Radial velocity from a homodyne/heterodyne image pair:
    v = -0.5 * Δω * c / ω_g with Δω = (r/(r-1))/T, r = hetero/homo
    (reference image_utils.py:140-168)."""
    homodyne = np.asarray(homodyne)
    heterodyne = np.asarray(heterodyne)
    ratio = np.divide(heterodyne, homodyne,
                      out=np.zeros_like(homodyne),
                      where=np.abs(homodyne) > 0)
    ratio = np.clip(ratio, -1.0, 0.999)
    delta_w = ratio * (1.0 / exposure_time) / (ratio - 1.0)
    speed_of_light = 3e8
    return -0.5 * delta_w * speed_of_light / (w_g * 1e6)


# ---------------------------------------------------------------------------
# Metrics (reference main_plot.py:53-70)
# ---------------------------------------------------------------------------

def mae(img, ref):
    return float(np.mean(np.abs(np.asarray(img) - np.asarray(ref))))


def rmse(img, ref):
    d = np.asarray(img) - np.asarray(ref)
    return float(np.sqrt(np.mean(d * d)))


def psnr(img, ref):
    peak = float(np.abs(np.asarray(ref)).max())
    r = rmse(img, ref)
    return float(20.0 * np.log10(peak / r)) if r > 0 else float("inf")


def relative_rmse(img, ref, eps: float = 1e-4):
    img = np.asarray(img)
    ref = np.asarray(ref)
    d = (img - ref) / (np.abs(ref) + eps)
    return float(np.sqrt(np.mean(d * d)))


def snr(img, ref):
    ref = np.asarray(ref)
    noise = np.asarray(img) - ref
    den = float(np.sum(noise * noise))
    if den == 0:
        return float("inf")
    return float(10.0 * np.log10(np.sum(ref * ref) / den))


__all__ = ["rgb2luminance", "to_tof_image", "tone_map", "to_ldr_image",
           "calc_velocity_from_homo_hetero", "mae", "rmse", "psnr",
           "relative_rmse", "snr"]


def calc_velocity_from_homo_heteros(homodynes, heterodynes, *,
                                    exposure_time: float = 0.0015,
                                    w_g: float = 30.0) -> np.ndarray:
    """Confidence-weighted multi-phase velocity estimate
    (reference image_utils.py:170-200): ratios from several phase offsets
    weighted by |homodyne| before the Doppler inversion."""
    ratio_sum = 0.0
    conf_sum = 0.0
    for homo, het in zip(homodynes, heterodynes):
        homo = np.asarray(homo)
        het = np.asarray(het)
        ratio = np.divide(het, homo, out=np.zeros_like(homo),
                          where=np.abs(homo) > 0)
        conf = np.abs(homo) + 1e-5 * exposure_time
        ratio_sum = ratio_sum + ratio * conf
        conf_sum = conf_sum + conf
    ratio = np.clip(ratio_sum / conf_sum, -1.0, 0.999)
    delta_w = ratio * (1.0 / exposure_time) / (ratio - 1.0)
    speed_of_light = 3e8
    return -0.5 * delta_w * speed_of_light / (w_g * 1e6)
