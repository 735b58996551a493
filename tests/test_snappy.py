"""Pure-Python Snappy codec: golden vectors from the published format
(google/snappy format_description.txt + framing_format.txt) plus
property round-trips. The decompressor is the interoperability-critical
half (RocksDB SST blocks, Flink framed sections); golden vectors pin it
to the format, not to our own compressor."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bravo_spark.codecs import crc32c, snappy


# --- crc32c golden vectors (rfc 3720 / kat values) ---


def test_crc32c_golden():
    # well-known check value for "123456789"
    assert crc32c.crc32c(b"123456789") == 0xE3069283
    assert crc32c.crc32c(b"") == 0
    # 32 bytes of zeros (iSCSI test vector)
    assert crc32c.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_crc32c_mask_roundtrip():
    for v in (0, 1, 0xE3069283, 0xFFFFFFFF):
        assert crc32c.unmask(crc32c.mask(v)) == v


# --- raw block format ---


def test_decompress_literal_golden():
    # [uvarint 5][tag: literal len-1=4 -> 0x10]["hello"]
    assert snappy.decompress(b"\x05\x10hello") == b"hello"


def test_decompress_copy1_golden():
    # "abcd" then copy len 4 offset 4 -> "abcdabcd"
    # copy1 tag: kind=1, len-4=0 in bits 2-4, offset high 3 bits in 5-7
    # offset=4 -> high bits 0, next byte 4
    raw = b"\x08" + b"\x0c" + b"abcd" + b"\x01\x04"
    assert snappy.decompress(raw) == b"abcdabcd"


def test_decompress_overlapping_copy_rle():
    # snappy RLE: literal "a", copy offset 1 len 8 -> "a"*9
    # copy1: len=8 -> (8-4)=4 in bits 2-4 -> tag 0x11, offset byte 1
    raw = b"\x09" + b"\x00" + b"a" + b"\x11\x01"
    assert snappy.decompress(raw) == b"a" * 9


def test_decompress_copy2_golden():
    # literal "xy", copy2 offset 2 len 2 -> "xyxy"
    # copy2 tag: kind=2, len-1=1 -> 0x06; offset LE16 = 0x0002
    raw = b"\x04" + b"\x04" + b"xy" + b"\x06\x02\x00"
    assert snappy.decompress(raw) == b"xyxy"


def test_long_literal_length_bytes():
    data = bytes(range(256)) * 2  # 512 bytes, needs 2-byte literal length
    assert snappy.decompress(snappy.compress(data)) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_raw_roundtrip(data):
    assert snappy.decompress(snappy.compress(data)) == data


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=300000))
def test_raw_roundtrip_large(data):
    assert snappy.decompress(snappy.compress(data)) == data


# --- framing format ---


def test_frame_stream_identifier():
    out = snappy.frame_compress(b"abc")
    assert out.startswith(b"\xff\x06\x00\x00sNaPpY")


def test_frame_crc_verified():
    out = bytearray(snappy.frame_compress(b"payload"))
    out[-1] ^= 0xFF  # corrupt last data byte
    try:
        snappy.frame_decompress(bytes(out))
        raise AssertionError("corrupt frame accepted")
    except ValueError:
        pass


def test_frame_skippable_chunks_ignored():
    framed = bytearray(snappy.frame_compress(b"data"))
    # insert a skippable chunk (type 0x80) after the stream identifier
    framed[10:10] = b"\x80\x03\x00\x00xyz"
    assert snappy.frame_decompress(bytes(framed)) == b"data"


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200000))
def test_frame_roundtrip(data):
    assert snappy.frame_decompress(snappy.frame_compress(data)) == data
