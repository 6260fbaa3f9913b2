"""Polarization visualization tool (reference src/python/python/polvis.py,
Wilkie & Weidlich SCCG 2010 false-color conventions)."""

import numpy as np
import pytest

from mitsuba3dopplertof_tpu.utils import polvis as pv


def _img(S, h=4, w=5):
    """(h, w, 15) image: RGB base + 12 stokes AOVs, constant Stokes S
    replicated over RGB."""
    img = np.zeros((h, w, 15), np.float32)
    img[:, :, 0:3] = S[0]
    for i in range(4):
        for c in range(3):
            img[:, :, 3 + 3 * i + c] = S[i]
    return img


def test_polarizer_malus():
    """Ideal linear polarizer on horizontally polarized light follows
    Malus' law: I(theta) = I0 * cos^2(theta)."""
    img = _img([1.0, 1.0, 0.0, 0.0])      # fully linear, horizontal
    for ang, expect in [(0.0, 1.0), (45.0, 0.5), (90.0, 0.0)]:
        out = pv.apply_polarizer(img, ang)
        np.testing.assert_allclose(out, expect, atol=1e-6)
    # unpolarized light: always half
    img_u = _img([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(pv.apply_polarizer(img_u, 30.0), 0.5,
                               atol=1e-6)


def test_false_color_semantics():
    # fully linear horizontal: dop=1 (red ramp), lin green (s1>0), cir zero
    a = pv.polvis_arrays(_img([1.0, 1.0, 0.0, 0.0]))
    np.testing.assert_allclose(a["dop"][..., 0], 1.0, atol=1e-6)
    assert (a["lin"][..., 1] > 0.99).all()         # green = +S1
    np.testing.assert_allclose(a["cir"], 0.0, atol=1e-6)
    # top: cyan for linear -> green+blue, no red
    np.testing.assert_allclose(a["top"][..., 0], 0.0, atol=1e-6)
    assert (a["top"][..., 2] > 0.99).all()
    # fully circular right (S3=+1): cir blue, top yellow (red+green)
    b = pv.polvis_arrays(_img([1.0, 0.0, 0.0, 1.0]))
    assert (b["cir"][..., 2] > 0.99).all() and (b["cir"][..., 0] < 1e-6).all()
    assert (b["top"][..., 0] > 0.99).all() and (b["top"][..., 2] < 1e-6).all()
    # -S1: lin red
    c = pv.polvis_arrays(_img([1.0, -0.6, 0.0, 0.0]))
    assert (c["lin"][..., 0] > 0).all() and (c["lin"][..., 1] < 1e-6).all()


def test_overlay_and_channel():
    img = _img([0.5, 0.25, 0.0, 0.0])
    # direct overlay blends toward the BW image by alpha=dop
    a = pv.polvis_arrays(img, overlay="direct")
    dop = 0.5
    expect_blue = 0.5 * (1 - dop)        # false color has 0 blue
    np.testing.assert_allclose(a["dop"][..., 2], expect_blue, atol=1e-6)
    # single-channel selection equals the average here (all channels equal)
    b0 = pv.polvis_arrays(img, channel=0)
    bavg = pv.polvis_arrays(img)
    np.testing.assert_allclose(b0["dop"], bavg["dop"], atol=1e-6)


def test_file_driver(tmp_path):
    from mitsuba3dopplertof_tpu.io.bitmap import write_exr
    h, w = 6, 7
    rng = np.random.default_rng(0)
    s0 = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
    ch = {c: s0 for c in "RGB"}
    for i in range(4):
        for c in "RGB":
            v = s0 if i == 0 else (0.3 * s0 if i == 1
                                   else np.zeros_like(s0))
            ch[f"S{i}.{c}"] = v.astype(np.float32)
    p = tmp_path / "st.exr"
    write_exr(str(p), ch)
    files = pv.polvis(str(p), outputs=("intensity", "dop", "lin"),
                      polarizer=30.0)
    assert len(files) == 4
    import os
    for f in files:
        assert os.path.exists(f) and os.path.getsize(f) > 0


def test_bad_channel_count():
    with pytest.raises(ValueError):
        pv.stokes_stack(np.zeros((2, 2, 7), np.float32))
