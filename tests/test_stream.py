"""Generic stream layer (reference src/core/{stream,fstream,mstream,
zstream,dstream,mmap}.cpp + src/core/tests/test_stream.py intent)."""

import gzip
import numpy as np
import pytest

from mitsuba3dopplertof_tpu.core.stream import (
    Stream, FileStream, MemoryStream, ZStream, DummyStream,
    MemoryMappedFile, EByteOrder)


def _roundtrip(s: Stream):
    s.write_u8(250)
    s.write_i16(-31000)
    s.write_u32(0xDEADBEEF)
    s.write_i64(-(1 << 60))
    s.write_f32(1.5)
    s.write_f64(-2.25e-100)
    s.write_bool(True)
    s.write_string("döppler")
    s.write_array(np.arange(7, dtype=np.float32) * 0.5)
    s.seek(0)
    assert s.read_u8() == 250
    assert s.read_i16() == -31000
    assert s.read_u32() == 0xDEADBEEF
    assert s.read_i64() == -(1 << 60)
    assert s.read_f32() == 1.5
    assert s.read_f64() == -2.25e-100
    assert s.read_bool() is True
    assert s.read_string() == "döppler"
    np.testing.assert_array_equal(s.read_array(np.float32, 7),
                                  np.arange(7, dtype=np.float32) * 0.5)


def test_memory_stream_roundtrip():
    s = MemoryStream(8)          # deliberately small: must grow
    _roundtrip(s)
    assert s.capacity() >= s.size() > 8 and s.owns_buffer()


def test_file_stream_roundtrip(tmp_path):
    p = tmp_path / "t.bin"
    s = FileStream(p, "w+")
    _roundtrip(s)
    s.close()
    assert s.is_closed()
    r = FileStream(p, "r")
    assert not r.can_write() and r.can_read()
    assert r.read_u8() == 250
    with pytest.raises(RuntimeError):
        r.write_u8(1)
    r.close()


def test_endianness_swap():
    s = MemoryStream()
    s.set_byte_order(EByteOrder.BigEndian)
    assert s.needs_endianness_swap() == (
        Stream.host_byte_order() != EByteOrder.BigEndian)
    s.write_u32(0x01020304)
    assert s.raw_buffer() == b"\x01\x02\x03\x04"   # big-endian on the wire
    s.seek(0)
    assert s.read_u32() == 0x01020304              # swapped back on read
    s.seek(0)
    s.set_byte_order(EByteOrder.LittleEndian)
    assert s.read_u32() == 0x04030201
    # arrays swap too
    s2 = MemoryStream()
    s2.set_byte_order(EByteOrder.BigEndian)
    s2.write_array(np.array([1, 256], dtype=np.uint16))
    assert s2.raw_buffer() == b"\x00\x01\x01\x00"
    s2.seek(0)
    np.testing.assert_array_equal(s2.read_array(np.uint16, 2), [1, 256])


def test_memory_stream_preallocated_never_grows():
    buf = bytearray(8)
    s = MemoryStream(buf)
    assert not s.owns_buffer()
    s.write_u32(7)
    s.write_u32(9)
    with pytest.raises(RuntimeError):
        s.write_u8(1)
    assert buf[:4] != b"\0\0\0\0"     # wrote through to the external buffer


def test_premature_end_raises():
    s = MemoryStream()
    s.write_u16(3)
    s.seek(0)
    with pytest.raises(EOFError):
        s.read_u32()


def test_read_line_token_skip():
    s = MemoryStream()
    s.write_bytes(b"hello world\r\n  tok1\ttok2\nlast")
    s.seek(0)
    assert s.read_line() == "hello world"
    assert s.read_token() == "tok1"
    assert s.read_token() == "tok2"
    s.seek(0)
    s.skip(6)
    assert s.read_line() == "world"


def test_truncate_and_seek_past_end():
    s = MemoryStream()
    s.write_bytes(b"abcdef")
    s.truncate(3)
    assert s.size() == 3 and s.raw_buffer() == b"abc"
    s.truncate(5)
    assert s.raw_buffer() == b"abc\0\0"   # zero-filled extension
    f = DummyStream()
    f.write_bytes(b"xyz")
    f.seek(10)
    f.write_bytes(b"q")
    assert f.size() == 11 and f.tell() == 11
    with pytest.raises(RuntimeError):
        f.read_bytes(1)


@pytest.mark.parametrize("ztype", [ZStream.EDeflateStream,
                                   ZStream.EGZipStream])
def test_zstream_roundtrip(tmp_path, ztype):
    payload = np.random.default_rng(0).integers(
        0, 255, 10000, dtype=np.uint8).tobytes() + b"tail" * 100
    p = tmp_path / "z.bin"
    z = ZStream(FileStream(p, "w+"), ztype)
    z.write_u32(len(payload))
    z.write_bytes(payload)
    child = z.child_stream()
    z.close()
    child.close()
    assert p.stat().st_size < len(payload) + 4    # actually compressed
    z = ZStream(FileStream(p, "r"), ztype)
    n = z.read_u32()
    assert z.read_bytes(n) == payload
    if ztype == ZStream.EGZipStream:              # gzip framing is real
        assert gzip.decompress(p.read_bytes())[4:] == payload


def test_zstream_gzip_interop(tmp_path):
    """gzip-framed ZStream output is readable by the gzip module and
    vice versa."""
    p = tmp_path / "g.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"from-python-gzip")
    z = ZStream(FileStream(p, "r"), ZStream.EGZipStream)
    assert z.read_bytes(16) == b"from-python-gzip"


def test_mmap(tmp_path):
    p = tmp_path / "m.bin"
    arr = np.arange(256, dtype=np.uint32)
    p.write_bytes(arr.tobytes())
    with MemoryMappedFile(p) as m:
        assert m.size() == 1024 and not m.can_write()
        np.testing.assert_array_equal(m.as_array(np.uint32), arr)
        s = m.as_stream()
        assert s.read_u32() == 0
        s.seek(4 * 100)
        assert s.read_u32() == 100
    with MemoryMappedFile(p, write=True) as m:
        m.as_array(np.uint32)[:]                 # readable
        m.data()[0:4] = b"\xff\xff\xff\xff"
    assert np.frombuffer(p.read_bytes(), np.uint32)[0] == 0xFFFFFFFF


def test_closed_stream_rejects_io():
    s = MemoryStream()
    s.write_u8(1)
    s.close()
    with pytest.raises(RuntimeError):
        s.read_bytes(1)
    with pytest.raises(RuntimeError):
        s.write_u8(2)
