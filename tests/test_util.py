"""mi.util compatibility surface (reference src/python/python/util.py:
convert_to_bitmap:523, write_bitmap:542, cornell_box:560)."""

import numpy as np

import mitsuba3dopplertof_tpu as mi


def test_convert_to_bitmap_srgb():
    lin = np.array([[[0.0, 0.0031308, 1.0]]], np.float32)
    out = mi.util.convert_to_bitmap(lin)
    assert out.dtype == np.uint8
    assert out[0, 0, 0] == 0 and out[0, 0, 2] == 255
    # linear passthrough
    raw = mi.util.convert_to_bitmap(lin, uint8_srgb=False)
    assert raw.dtype == np.float32 and np.allclose(raw, lin)


def test_write_bitmap_dispatch(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    p_png = str(tmp_path / "a.png")
    p_exr = str(tmp_path / "a.exr")
    mi.util.write_bitmap(p_png, img)
    mi.util.write_bitmap(p_exr, img)
    from mitsuba3dopplertof_tpu.io.bitmap import read_bitmap
    back = read_bitmap(p_exr)
    assert np.allclose(back[..., :3], img, atol=1e-3)   # EXR is linear
    ldr = read_bitmap(p_png)
    assert ldr.shape[:2] == (8, 8)


def test_cornell_box_renders():
    d = mi.cornell_box()
    assert d["sensor"]["fov"] == 39.3077
    d["sensor"]["film"]["width"] = d["sensor"]["film"]["height"] = 32
    d["sensor"]["sampler"]["sample_count"] = 8
    sc = mi.load_dict(d)
    img = np.asarray(mi.render(sc, spp=8, seed=0))
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()
    assert img.mean() > 0.01
    left = img[8:24, :6].mean(axis=(0, 1))
    right = img[8:24, -6:].mean(axis=(0, 1))
    assert left[0] > left[1], "left wall is red"
    assert right[1] > right[0], "right wall is green"


def test_scalar_transform4f_chain():
    """mi.ScalarTransform4f chains like the reference bindings:
    T.translate(a).rotate(ax, deg).scale(s) == translate @ rotate @ scale."""
    from mitsuba3dopplertof_tpu.core.transform import (translate, rotate,
                                                       scale)
    T = mi.ScalarTransform4f
    chained = T.translate([1, 2, 3]).rotate([0, 1, 0], 90).scale(2.0)
    expect = translate([1, 2, 3]) @ rotate([0, 1, 0], 90) @ scale(2.0)
    assert np.allclose(np.asarray(chained), expect)
    # usable directly in a scene dict to_world slot
    d = mi.cornell_box()
    d["sensor"]["to_world"] = T.look_at([0, 0, 3.9], [0, 0, 0], [0, 1, 0])
    d["sensor"]["film"]["width"] = d["sensor"]["film"]["height"] = 8
    d["sensor"]["sampler"]["sample_count"] = 2
    sc = mi.load_dict(d)
    img = np.asarray(mi.render(sc, spp=2, seed=0))
    assert np.isfinite(img).all()
    # application to a point and inverse round-trip
    p = T.translate([1, 0, 0]) @ [0.0, 0.0, 0.0]
    assert np.allclose(p, [1, 0, 0])
    inv = chained.inverse() @ chained
    assert np.allclose(np.asarray(inv), np.eye(4), atol=1e-12)
