"""Filtered image resampling + ordered dithering.

``resample`` is the role of reference Bitmap::resample
(src/core/bitmap.cpp:251-324) built on the separable Resampler of
include/mitsuba/core/rfilter.h: per-axis weight tables from a
reconstruction filter (stretched by the ratio when minifying), boundary
conditions, optional value clamping, 2-lobed Lanczos default for
upsampling. Host-side numpy — resampling happens at scene-load /
output time, not in the render loop.

``dither_quantize`` is the role of the reference's dither-matrix256
(src/core/dither-matrix256.cpp, applied during Struct conversion):
mean-preserving ordered quantization of float images to uint8. The
reference ships a precomputed 256x256 table; we generate the 256x256
Bayer matrix recursively — same mechanism (deterministic tiled
threshold matrix, uniform on [0,1)), different constant data.
"""

from __future__ import annotations

import numpy as np

__all__ = ["resample", "resample_axis", "dither_matrix",
           "dither_quantize", "BOUNDARY_CONDITIONS"]

BOUNDARY_CONDITIONS = ("clamp", "repeat", "mirror", "zero", "one")


def _filter_eval(rfilter, x: np.ndarray) -> np.ndarray:
    """Evaluate a reconstruction-filter plugin (jnp eval) on host numpy."""
    return np.asarray(rfilter.eval(x)).astype(np.float64)


def _default_filter():
    from ..core.properties import Properties
    from ..rfilters import LanczosFilter
    p = Properties("lanczos")
    p["lobes"] = 2
    f = LanczosFilter(p)
    p.mark_queried("lobes")
    return f


def _boundary_index(idx: np.ndarray, n: int, bc: str):
    """Map out-of-range source indices per boundary condition. Returns
    (indices, extra weight-mask multiplier) — 'zero'/'one' keep the
    clamped index but zero the weight ('one' adds the constant later)."""
    if bc == "clamp":
        return np.clip(idx, 0, n - 1), None
    if bc == "repeat":
        return np.mod(idx, n), None
    if bc == "mirror":
        period = 2 * n - 2 if n > 1 else 1
        m = np.mod(idx, period)
        return np.where(m >= n, period - m, m), None
    if bc in ("zero", "one"):
        inside = (idx >= 0) & (idx < n)
        return np.clip(idx, 0, n - 1), inside.astype(np.float64)
    raise ValueError(f"unknown boundary condition {bc!r}")


def _weight_table(rfilter, n_src: int, n_tgt: int, bc: str):
    """(n_tgt, taps) weights + (n_tgt, taps) source indices, normalized —
    the reference Resampler's precomputed per-output weight table."""
    scale = n_src / n_tgt
    fscale = max(scale, 1.0)               # minification stretches the filter
    radius = float(rfilter.radius) * fscale
    taps = int(np.ceil(2.0 * radius)) + 1

    i = np.arange(n_tgt, dtype=np.float64)
    center = (i + 0.5) * scale             # target center in source coords
    first = np.ceil(center - radius - 0.5).astype(np.int64)
    j = first[:, None] + np.arange(taps)[None, :]       # (n_tgt, taps)
    x = (j + 0.5 - center[:, None]) / fscale
    w = _filter_eval(rfilter, x)
    w[np.abs(x) > float(rfilter.radius) + 1e-9] = 0.0

    idx, inside = _boundary_index(j, n_src, bc)
    norm = w.sum(axis=1, keepdims=True)
    norm[norm == 0.0] = 1.0
    w = w / norm                           # unit DC response (reference)
    one_w = None
    if inside is not None:
        one_w = (w * (1.0 - inside)).sum(axis=1) if bc == "one" else None
        w = w * inside
    return w, idx, one_w


def resample_axis(data: np.ndarray, n_tgt: int, rfilter=None,
                  bc: str = "clamp", clamp=None, axis: int = 0):
    """Resample one axis of ``data`` to ``n_tgt`` samples."""
    if rfilter is None:
        rfilter = _default_filter()
    data = np.moveaxis(np.asarray(data, np.float64), axis, 0)
    n_src = data.shape[0]
    w, idx, one_w = _weight_table(rfilter, n_src, n_tgt, bc)
    out = np.einsum("tk,tk...->t...", w, data[idx])
    if one_w is not None:
        out = out + one_w.reshape((-1,) + (1,) * (out.ndim - 1))
    if clamp is not None:
        out = np.clip(out, clamp[0], clamp[1])
    return np.moveaxis(out, 0, axis)


def resample(img: np.ndarray, size, rfilter=None, bc=("clamp", "clamp"),
             clamp=None):
    """Resample an (H, W[, C]) image to size = (width, height). Separable:
    horizontal pass then vertical, like Bitmap::resample. ``bc`` is the
    (horizontal, vertical) boundary-condition pair."""
    if rfilter is None:
        rfilter = _default_filter()
    w_t, h_t = int(size[0]), int(size[1])
    out = np.asarray(img, np.float64)
    if out.shape[1] != w_t:
        out = resample_axis(out, w_t, rfilter, bc[0], clamp, axis=1)
    if out.shape[0] != h_t:
        out = resample_axis(out, h_t, rfilter, bc[1], clamp, axis=0)
    return out.astype(np.float32)


def dither_matrix(bits: int = 8) -> np.ndarray:
    """(2^bits, 2^bits) ordered-dither threshold matrix, values uniform on
    [0, 1). Recursive Bayer construction; bits=8 gives the 256x256 tile
    (the reference's dither-matrix256 role)."""
    m = np.zeros((1, 1), np.float64)
    for _ in range(bits):
        n = m.shape[0]
        m = np.block([[4 * m + 0, 4 * m + 2],
                      [4 * m + 3, 4 * m + 1]])
        del n
    return ((m + 0.5) / m.size).astype(np.float32)


_DITHER = None


def dither_quantize(img: np.ndarray, levels: int = 255) -> np.ndarray:
    """Mean-preserving ordered quantization of a [0,1] float image to
    integer levels: floor(v * levels + threshold) with the tiled 256x256
    matrix (the reference applies this inside Struct conversion when
    writing 8-bit outputs)."""
    global _DITHER
    if _DITHER is None:
        _DITHER = dither_matrix(8)
    img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    h, w = img.shape[0], img.shape[1]
    t = np.tile(_DITHER, (-(-h // 256), -(-w // 256)))[:h, :w]
    if img.ndim == 3:
        t = t[..., None]
    return np.minimum(np.floor(img * levels + t), levels).astype(np.uint8)
