"""mi.Bitmap — the reference's image container API over numpy arrays
(reference include/mitsuba/core/bitmap.h + src/core/bitmap.cpp), so
tutorial snippets like

    mi.Bitmap(img).convert(mi.Bitmap.PixelFormat.RGB,
                           mi.Struct.Type.UInt8, True).write("out.png")

port unchanged. Data lives as a float32 (H, W, C) numpy array; reads and
writes dispatch on the file extension through io/bitmap.py.
"""

from __future__ import annotations

import enum

import numpy as np


class PixelFormat(enum.Enum):
    Y = "Y"
    YA = "YA"
    RGB = "RGB"
    RGBA = "RGBA"
    MultiChannel = "MultiChannel"


class ComponentFormat(enum.Enum):
    UInt8 = np.uint8
    Float16 = np.float16
    Float32 = np.float32


def _srgb_encode(x):
    return np.where(x <= 0.0031308, x * 12.92,
                    1.055 * np.maximum(x, 1e-9) ** (1 / 2.4) - 0.055)


def _srgb_decode(x):
    return np.where(x <= 0.04045, x / 12.92,
                    ((np.maximum(x, 0.0) + 0.055) / 1.055) ** 2.4)


class Bitmap:
    """Image container with the reference Bitmap's conversion surface."""

    PixelFormat = PixelFormat

    def __init__(self, source, pixel_format: PixelFormat = None,
                 srgb_gamma: bool = None):
        if isinstance(source, str):
            from .io.bitmap import read_bitmap
            self.data = np.asarray(read_bitmap(source), np.float32)
            self._gamma = False        # readers return linear float
        else:
            arr = np.asarray(source)
            self._gamma = (srgb_gamma if srgb_gamma is not None
                           else arr.dtype == np.uint8)
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            self.data = np.asarray(arr, np.float32)
            if self.data.ndim == 2:
                self.data = self.data[..., None]
        if pixel_format is not None:
            self.data = self._to_format(self.data, pixel_format)
        self._component = ComponentFormat.Float32

    # -- reference-compatible surface -----------------------------------
    @property
    def pixel_format(self) -> PixelFormat:
        return {1: PixelFormat.Y, 2: PixelFormat.YA, 3: PixelFormat.RGB,
                4: PixelFormat.RGBA}.get(self.data.shape[-1],
                                         PixelFormat.MultiChannel)

    def width(self) -> int:
        return self.data.shape[1]

    def height(self) -> int:
        return self.data.shape[0]

    def channel_count(self) -> int:
        return self.data.shape[-1]

    def size(self):
        return (self.data.shape[1], self.data.shape[0])

    @staticmethod
    def _to_format(d, pf: PixelFormat):
        c = d.shape[-1]
        if pf in (PixelFormat.Y, PixelFormat.YA):
            y = (d[..., :3] @ np.array([0.2126, 0.7152, 0.0722],
                                       np.float32)[:c if c < 3 else 3]
                 if c >= 3 else d[..., 0])
            y = y[..., None]
            if pf == PixelFormat.YA:
                a = d[..., 3:4] if c == 4 else np.ones_like(y)
                return np.concatenate([y, a], -1)
            return y
        if pf == PixelFormat.RGB:
            if c == 1:
                return np.repeat(d, 3, -1)
            return d[..., :3]
        if pf == PixelFormat.RGBA:
            rgb = np.repeat(d, 3, -1) if c == 1 else d[..., :3]
            a = d[..., 3:4] if c >= 4 else np.ones_like(rgb[..., :1])
            return np.concatenate([rgb, a], -1)
        return d

    def convert(self, pixel_format: PixelFormat = None,
                component_format=None, srgb_gamma: bool = None) -> "Bitmap":
        """Return a converted copy (bitmap.cpp convert): pixel-format
        remap, sRGB gamma encode/decode, component format (UInt8 clamps
        to [0,1] like the reference)."""
        out = Bitmap(self.data.copy(), srgb_gamma=self._gamma)
        if pixel_format is not None:
            out.data = self._to_format(out.data, pixel_format)
        if srgb_gamma is not None and srgb_gamma != self._gamma:
            out.data = (_srgb_encode(out.data) if srgb_gamma
                        else _srgb_decode(out.data))
            out._gamma = srgb_gamma
        if component_format is not None:
            if not isinstance(component_format, ComponentFormat):
                component_format = ComponentFormat(np.dtype(
                    component_format).type)
            out._component = component_format
        return out

    def write(self, path: str) -> None:
        from .io.bitmap import write_bitmap, write_png
        low = path.lower()
        if low.endswith(".png") or self._component == ComponentFormat.UInt8:
            # gamma already applied by convert (or raw linear if not)
            write_png(path, np.clip(self.data[..., :3]
                                    if self.data.shape[-1] >= 3
                                    else np.repeat(self.data, 3, -1),
                                    0.0, 1.0), gamma=False)
            return
        img = (self.data if self.data.shape[-1] >= 3
               else np.repeat(self.data, 3, -1))
        write_bitmap(path, img[..., :3])

    def resample(self, size, rfilter=None, bc=("clamp", "clamp"),
                 clamp=None) -> "Bitmap":
        """Filtered up/down-sampling to size=(width, height) — the role of
        reference Bitmap::resample (bitmap.cpp:251-324): separable
        reconstruction-filter resampling, 2-lobed Lanczos by default,
        per-axis boundary conditions in {clamp, repeat, mirror, zero,
        one}, optional value clamping."""
        from .io.resample import resample as _resample
        out = Bitmap(_resample(self.data, size, rfilter, bc, clamp),
                     srgb_gamma=self._gamma)
        out._component = self._component
        return out

    def write_async(self, path: str) -> None:
        import threading
        threading.Thread(target=self.write, args=(path,),
                         daemon=True).start()

    # -- numpy protocol ---------------------------------------------------
    def __array__(self, dtype=None):
        d = self.data
        if self._component == ComponentFormat.UInt8:
            # ordered dither, mean-preserving — the reference applies its
            # dither-matrix256 during Struct conversion to 8-bit
            from .io.resample import dither_quantize
            d = dither_quantize(d)
        elif self._component == ComponentFormat.Float16:
            d = d.astype(np.float16)
        return d.astype(dtype) if dtype is not None else d

    def __repr__(self):
        return (f"Bitmap[{self.pixel_format.value}, "
                f"{self.data.shape[1]}x{self.data.shape[0]}, "
                f"{self.data.shape[-1]}ch]")


__all__ = ["Bitmap", "PixelFormat", "ComponentFormat"]
