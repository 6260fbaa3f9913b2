"""Polarization visualization (reference src/python/python/polvis.py).

False-color visualizations of Stokes-integrator output following
"A Standardised Polarisation Visualisation for Images" (Wilkie & Weidlich,
SCCG 2010), matching the reference tool's semantics:

  * intensity      — the S0 (radiance) channels
  * polarizer(a)   — intensity after an ideal linear polarizer at angle a
  * s0..s3         — raw Stokes components (red=negative, green=positive)
  * dop            — degree of polarization (red ramp)
  * top            — type of polarization (cyan=linear, yellow=circular)
  * lin            — oscillation plane of linear polarization
  * cir            — chirality of circular polarization (blue=right,
                     yellow=left)
  * overlays       — 'direct' / 'luminance' compositing over the
                     black-and-white S0 image

Input layouts: the `stokes` integrator's developed image — RGB(+A) base
channels followed by 12 AOVs S0.R..S3.B — or a bare (H, W, 12) Stokes
stack. All math is pure numpy over the image; nothing touches the device.
"""

from __future__ import annotations

import numpy as np

__all__ = ["stokes_stack", "polvis_arrays", "apply_polarizer", "polvis",
           "main"]


def stokes_stack(img: np.ndarray) -> np.ndarray:
    """Extract the (H, W, 4, 3) Stokes stack [S0..S3][RGB] from a
    stokes-integrator image (15ch = RGB + 12, 16ch = RGBA + 12, or a bare
    12-channel stack)."""
    img = np.asarray(img, np.float32)
    c = img.shape[2]
    if c == 12:
        s = img
    elif c in (15, 16):
        s = img[:, :, c - 12:]
    else:
        raise ValueError(
            f"polvis: expected 12/15/16 channels from the stokes "
            f"integrator, got {c}")
    return s.reshape(s.shape[0], s.shape[1], 4, 3)


def _linear_polarizer_mueller(angle_rad: float) -> np.ndarray:
    """Ideal linear polarizer rotated by ``angle`` (counter-clockwise from
    horizontal): R(a) @ LP @ R(-a) in closed form (reference
    mueller.h linear_polarizer/rotated_element)."""
    c, s = np.cos(2 * angle_rad), np.sin(2 * angle_rad)
    return 0.5 * np.array([
        [1, c, s, 0],
        [c, c * c, c * s, 0],
        [s, c * s, s * s, 0],
        [0, 0, 0, 0]], np.float32)


def apply_polarizer(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Intensity (H, W, 3) after an ideal linear polarizer at
    ``angle_deg`` (reference polvis.py --polarizer)."""
    st = stokes_stack(img)                      # (H, W, 4, 3)
    LP = _linear_polarizer_mueller(np.radians(angle_deg))
    # S' = LP @ S per color channel; keep S0'
    return np.einsum("j,hwjc->hwc", LP[0], st)


def _safe_div(a, b):
    return np.divide(a, b, out=np.zeros_like(a), where=b != 0)


def polvis_arrays(img: np.ndarray, channel: int = None, scale: float = None,
                  normalize: bool = False, overlay: str = None) -> dict:
    """All false-color visualizations as float RGB arrays in [0, inf).

    ``channel``: use one RGB channel (0/1/2) for the false color instead of
    the RGB average. ``normalize``: normalize s1..s3 by S0 (--stokes_nrm).
    ``overlay``: None | 'direct' | 'luminance' compositing over the
    black-and-white intensity."""
    st = stokes_stack(img)
    if scale is not None:
        st = st * scale
    intensity = st[:, :, 0, :]
    if channel is not None:
        stokes = st[:, :, :, channel]
    else:
        stokes = st.mean(axis=3)               # (H, W, 4)

    s0 = stokes[:, :, 0]
    s3 = stokes[:, :, 3]
    s12 = np.sqrt(np.maximum(0.0, stokes[:, :, 1] ** 2
                             + stokes[:, :, 2] ** 2))
    s123 = np.sqrt(np.maximum(0.0, stokes[:, :, 1] ** 2
                              + stokes[:, :, 2] ** 2 + s3 ** 2))
    dop = _safe_div(s123, s0)
    rdop_l = _safe_div(s12, s123)
    rdop_c = _safe_div(np.abs(s3), s123)
    black_white = np.dstack([s0, s0, s0])
    z = np.zeros_like(s0)

    def composite(out, alpha2d):
        if overlay is None:
            return out
        a = alpha2d[:, :, None]
        if overlay == "luminance":
            out = out * s0[:, :, None]
        return out * a + black_white * (1.0 - a)

    out = {"intensity": intensity, "s0": np.dstack([s0, s0, s0])}
    for i in (1, 2, 3):
        v = _safe_div(stokes[:, :, i], s0) if normalize else stokes[:, :, i]
        fc = np.dstack([np.maximum(0, -v), np.maximum(0, v), z])
        out[f"s{i}"] = composite(fc, dop)

    out["dop"] = composite(np.dstack([dop, z, z]), dop)
    # cyan = linear, yellow = circular
    top = np.dstack([rdop_c, rdop_l + rdop_c, rdop_l]) * dop[:, :, None]
    out["top"] = composite(top, dop)

    s1n, s2n = _safe_div(stokes[:, :, 1], s0), _safe_div(stokes[:, :, 2], s0)
    lin = (np.dstack([np.maximum(0, -s1n), np.maximum(0, s1n), z])
           + np.dstack([np.maximum(0, s2n), np.maximum(0, s2n),
                        np.maximum(0, -s2n)])) * rdop_l[:, :, None]
    out["lin"] = composite(lin, rdop_l)

    s3n = _safe_div(s3, s0)
    cir = np.dstack([np.maximum(0, -s3n), np.maximum(0, -s3n),
                     np.maximum(0, s3n)]) * rdop_c[:, :, None]
    out["cir"] = composite(cir, rdop_c)
    return out


def polvis(fname: str, outputs=("intensity", "dop", "top", "lin", "cir"),
           polarizer: float = None, channel: int = None, scale: float = None,
           normalize: bool = False, overlay: str = None) -> list:
    """File driver: read a stokes EXR, write <name>_<viz>.png per output.
    Returns the list of files written."""
    from ..io.bitmap import read_exr, write_png

    name = fname[:-4] if fname.lower().endswith(".exr") else fname
    ch = read_exr(fname)
    if "S0.R" in ch:                       # named stokes AOV channels
        base = [ch[c] for c in ("R", "G", "B") if c in ch]
        aovs = [ch[f"S{i}.{c}"] for i in range(4) for c in "RGB"]
        img = np.stack(base + aovs, axis=-1)
    else:
        img = np.stack([ch[c] for c in sorted(ch)], axis=-1)
    arrays = polvis_arrays(img, channel=channel, scale=scale,
                           normalize=normalize, overlay=overlay)
    written = []
    for key in outputs:
        path = f"{name}_{key}.png"
        write_png(path, np.clip(arrays[key], 0.0, None))
        written.append(path)
    if polarizer is not None:
        im = apply_polarizer(img if scale is None else img * scale,
                             polarizer)
        path = f"{name}_polarizer_{polarizer:.02f}.png"
        write_png(path, np.clip(im, 0.0, None))
        written.append(path)
    return written


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="Polarization visualizations for stokes-integrator EXRs "
                    "(Wilkie & Weidlich, SCCG 2010).")
    p.add_argument("file", nargs="+")
    p.add_argument("-s", "--scale", type=float, default=None)
    p.add_argument("-i", "--intensity", action="store_true")
    p.add_argument("--polarizer", type=float, default=None, metavar="ANGLE")
    p.add_argument("--stokes", action="store_true")
    p.add_argument("--stokes_nrm", action="store_true")
    p.add_argument("--dop", action="store_true")
    p.add_argument("--top", action="store_true")
    p.add_argument("--lin", action="store_true")
    p.add_argument("--cir", action="store_true")
    p.add_argument("--channel", type=int, default=None)
    p.add_argument("--direct_overlay", action="store_true")
    p.add_argument("--luminance_overlay", action="store_true")
    a = p.parse_args(argv)

    outputs = []
    if a.intensity:
        outputs.append("intensity")
    if a.stokes or a.stokes_nrm:
        outputs += ["s0", "s1", "s2", "s3"]
    for k in ("dop", "top", "lin", "cir"):
        if getattr(a, k):
            outputs.append(k)
    overlay = ("luminance" if a.luminance_overlay
               else "direct" if a.direct_overlay else None)
    for f in a.file:
        files = polvis(f, outputs=outputs, polarizer=a.polarizer,
                       channel=a.channel, scale=a.scale,
                       normalize=a.stokes_nrm, overlay=overlay)
        for w in files:
            print(w)


if __name__ == "__main__":
    main()
