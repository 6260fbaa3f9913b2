"""Bitmap codec breadth (VERDICT round-1 missing item 8; reference
src/core/bitmap.cpp): PFM, PPM, Radiance RGBE and JPEG read/write plus
extension-dispatched read_bitmap/write_bitmap."""

import numpy as np
import pytest

from mitsuba3dopplertof_tpu.io import bitmap as B


@pytest.fixture()
def hdr_img():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 2.5, (13, 17, 3)).astype(np.float32)


@pytest.fixture()
def smooth_img():
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([0.2 + 0.6 * np.sin(x / 10.0) ** 2,
                    0.3 + 0.5 * np.cos(y / 8.0) ** 2,
                    0.1 + 0.02 * x / 48.0], axis=-1)
    return img.astype(np.float32)


def test_pfm_roundtrip_lossless(tmp_path, hdr_img):
    p = str(tmp_path / "t.pfm")
    B.write_pfm(p, hdr_img)
    assert np.allclose(B.read_pfm(p), hdr_img)


def test_ppm_roundtrip_8bit(tmp_path, hdr_img):
    p = str(tmp_path / "t.ppm")
    B.write_ppm(p, hdr_img)
    r = B.read_ppm(p)
    assert np.abs(r - np.clip(hdr_img, 0, 1)).max() < 1 / 255.0 + 1e-4


def test_rgbe_roundtrip_shared_exponent(tmp_path, hdr_img):
    p = str(tmp_path / "t.hdr")
    B.write_rgbe(p, hdr_img)
    r = B.read_rgbe(p)
    rel = np.abs(r - hdr_img) / np.maximum(
        hdr_img.max(axis=2, keepdims=True), 1e-6)
    assert rel.max() < 0.01, rel.max()


def test_jpeg_roundtrip_smooth(tmp_path, smooth_img):
    p = str(tmp_path / "t.jpg")
    B.write_jpeg(p, smooth_img)
    r = B.read_jpeg(p)
    assert np.abs(r - smooth_img).mean() < 0.02


def test_dispatch_read_write(tmp_path, smooth_img):
    for ext in ("pfm", "ppm", "hdr", "jpg", "png", "exr"):
        p = str(tmp_path / f"d.{ext}")
        B.write_bitmap(p, smooth_img)
        if ext == "png":
            continue      # png path is write-only tonemap helper
        r = B.read_bitmap(p)
        assert r.shape == smooth_img.shape
        tol = 0.05 if ext in ("jpg",) else 0.02
        assert np.abs(r - smooth_img).mean() < tol, ext
    with pytest.raises(Exception):
        B.write_bitmap(str(tmp_path / "x.tga"), smooth_img)
