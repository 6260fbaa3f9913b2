"""mi.Bitmap compatibility surface (reference bitmap.h/bitmap.cpp):
construction from arrays and files, convert (format/gamma/component),
write dispatch, numpy protocol."""

import os

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi


def test_roundtrip_png(tmp_path):
    img = np.random.RandomState(0).rand(6, 7, 3).astype(np.float32)
    p = str(tmp_path / "x.png")
    mi.Bitmap(img).convert(mi.Bitmap.PixelFormat.RGB,
                           mi.Struct.Type.UInt8, True).write(p)
    back = mi.Bitmap(p)
    assert back.size() == (7, 6)
    # png readers return linear floats (decoded); compare after decode
    a = np.asarray(back)
    assert a.shape == (6, 7, 3) and 0.0 <= a.min() and a.max() <= 1.0


def test_exr_roundtrip_exact(tmp_path):
    img = np.random.RandomState(1).rand(5, 4, 3).astype(np.float32) * 3.0
    p = str(tmp_path / "x.exr")
    mi.Bitmap(img).write(p)
    back = np.asarray(mi.Bitmap(p))
    assert np.allclose(back, img, atol=2e-3)   # half-float storage


def test_gamma_encode_decode():
    img = np.full((2, 2, 3), 0.5, np.float32)
    enc = mi.Bitmap(img).convert(srgb_gamma=True)
    val = float(np.asarray(enc)[0, 0, 0])
    assert abs(val - (1.055 * 0.5 ** (1 / 2.4) - 0.055)) < 1e-5
    dec = enc.convert(srgb_gamma=False)
    assert np.allclose(np.asarray(dec), img, atol=1e-5)


def test_pixel_formats():
    img = np.random.rand(3, 3, 3).astype(np.float32)
    y = mi.Bitmap(img).convert(mi.Bitmap.PixelFormat.Y)
    assert y.channel_count() == 1
    lum = img @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    assert np.allclose(np.asarray(y)[..., 0], lum, atol=1e-5)
    rgba = mi.Bitmap(img).convert(mi.Bitmap.PixelFormat.RGBA)
    assert rgba.channel_count() == 4
    assert np.allclose(np.asarray(rgba)[..., 3], 1.0)


def test_uint8_array_input_decodes():
    raw = np.full((2, 2, 3), 128, np.uint8)
    b = mi.Bitmap(raw)
    assert abs(float(np.asarray(b)[0, 0, 0]) - 128 / 255.0) < 1e-6
