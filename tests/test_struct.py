"""Struct / StructConverter (reference include/mitsuba/core/struct.h,
src/core/struct.cpp + src/core/tests/test_struct.py intent)."""

import numpy as np
import pytest

from mitsuba3dopplertof_tpu.core.struct import (
    Struct, StructConverter, FieldFlags as F, srgb_to_linear,
    linear_to_srgb)


def test_layout_offsets_size():
    s = (Struct().append("r", "uint8").append("g", "uint16")
         .append("x", "float32"))
    assert [f.offset for f in s.fields] == [0, 1, 3]   # packed
    assert s.size == 7 and s.alignment == 4
    assert s.has_field("g") and not s.has_field("q")
    assert s.field_names() == ["r", "g", "x"]


def test_identity_and_type_conversion():
    src = Struct().append("a", "int32").append("b", "float32")
    dst = Struct().append("a", "float64").append("b", "int16")
    data = np.zeros(3, dtype=src.dtype())
    data["a"] = [-5, 0, 123456]
    data["b"] = [1.7, -2.3, 40000.0]
    out = np.frombuffer(StructConverter(src, dst).convert(data.tobytes()),
                        dtype=dst.dtype())
    np.testing.assert_array_equal(out["a"], [-5.0, 0.0, 123456.0])
    # rounding + clamping to the int16 range
    np.testing.assert_array_equal(out["b"], [2, -2, 32767])


def test_normalized_roundtrip():
    src = Struct().append("v", "uint8", F.Normalized)
    dst = Struct().append("v", "float32")
    vals = np.arange(256, dtype=np.uint8)
    out = np.frombuffer(
        StructConverter(src, dst).convert(vals.tobytes()),
        dtype=dst.dtype())["v"]
    np.testing.assert_allclose(out, vals / 255.0, atol=1e-7)
    back = np.frombuffer(
        StructConverter(dst, src).convert(out.tobytes()),
        dtype=src.dtype())["v"]
    np.testing.assert_array_equal(back, vals)


def test_gamma_linearization():
    src = Struct().append("v", "uint8", F.Normalized | F.Gamma)
    dst = Struct().append("v", "float32")
    vals = np.array([0, 64, 128, 255], np.uint8)
    out = np.frombuffer(
        StructConverter(src, dst).convert(vals.tobytes()),
        dtype=dst.dtype())["v"]
    np.testing.assert_allclose(out, srgb_to_linear(vals / 255.0), rtol=1e-5)
    # round trip back to gamma u8
    back = np.frombuffer(
        StructConverter(dst, src).convert(out.tobytes()),
        dtype=src.dtype())["v"]
    np.testing.assert_array_equal(back, vals)
    # curve sanity
    assert abs(linear_to_srgb(srgb_to_linear(0.5)) - 0.5) < 1e-9


def test_endianness():
    src = Struct(byte_order="big").append("v", "uint32")
    dst = Struct(byte_order="little").append("v", "uint32")
    raw = b"\x01\x02\x03\x04"
    out = StructConverter(src, dst).convert(raw)
    assert out == b"\x04\x03\x02\x01"
    v = np.frombuffer(out, dtype=dst.dtype())["v"][0]
    assert v == 0x01020304


def test_default_and_missing():
    src = Struct().append("a", "float32")
    dst = (Struct().append("a", "float32")
           .append("b", "float32", F.Default, default=0.5))
    out = np.frombuffer(
        StructConverter(src, dst).convert(
            np.float32([1, 2]).tobytes()), dtype=dst.dtype())
    np.testing.assert_array_equal(out["b"], [0.5, 0.5])
    dst2 = Struct().append("c", "float32")
    with pytest.raises(ValueError):
        StructConverter(src, dst2).convert(np.float32([1]).tobytes())


def test_assert_flag():
    src = Struct().append("tag", "uint8", F.Assert, default=7).append(
        "v", "float32")
    dst = Struct().append("v", "float32")
    rec = np.zeros(2, src.dtype())
    rec["tag"] = 7
    rec["v"] = [3.0, 4.0]
    out = np.frombuffer(StructConverter(src, dst).convert(rec.tobytes()),
                        dtype=dst.dtype())
    np.testing.assert_array_equal(out["v"], [3.0, 4.0])
    rec["tag"] = 8
    with pytest.raises(ValueError):
        StructConverter(src, dst).convert(rec.tobytes())


def test_premultiplied_alpha():
    src = (Struct().append("r", "float32", F.PremultipliedAlpha)
           .append("a", "float32", F.Alpha))
    dst = (Struct().append("r", "float32")
           .append("a", "float32", F.Alpha))
    rec = np.zeros(3, src.dtype())
    rec["r"] = [0.25, 0.0, 0.5]
    rec["a"] = [0.5, 0.0, 1.0]
    out = np.frombuffer(StructConverter(src, dst).convert(rec.tobytes()),
                        dtype=dst.dtype())
    np.testing.assert_allclose(out["r"], [0.5, 0.0, 0.5])   # unpremultiply
    back = np.frombuffer(StructConverter(dst, src).convert(out.tobytes()),
                         dtype=src.dtype())
    np.testing.assert_allclose(back["r"], rec["r"])          # premultiply


def test_signed_normalized():
    src = Struct().append("v", "int8", F.Normalized)
    dst = Struct().append("v", "float32")
    vals = np.array([-128, -127, 0, 127], np.int8)
    out = np.frombuffer(
        StructConverter(src, dst).convert(vals.tobytes()),
        dtype=dst.dtype())["v"]
    np.testing.assert_allclose(out, [-1.0078740, -1.0, 0.0, 1.0],
                               atol=1e-2)
    assert out.min() >= -1.0 - 1e-6
