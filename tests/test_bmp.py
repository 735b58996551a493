"""Pure-Python BMP codec (inventory/bmp.py).

Ground truth: BMP is lossless — the 24-bit encoder round-trips
byte-exactly — and hand-assembled headers pin the decoder paths the
encoder never writes (paletted depths, 16/32-bit, top-down rows,
bitfields); a real-world V5-header 32-bit bitfields file from CPython's
test data pins the in-the-wild layout."""

from __future__ import annotations

import os
import struct

import pytest
from hypothesis import given, settings, strategies as st

from bravo_spark.inventory import bmp as B
from bravo_spark.inventory import multimodal as mm


def _rgb(w: int, h: int) -> bytes:
    return bytes(
        ((x * 9) % 256, (y * 11) % 256, (x + y) % 256)[c]
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_rgb_roundtrip_lossless():
    for w, h in ((21, 13), (1, 1), (4, 4), (33, 2)):  # odd strides too
        raw = _rgb(w, h)
        assert B.bmp_decode_pixels(B.bmp_encode(w, h, "RGB", raw)) == (
            w, h, "RGB", raw,
        )


def test_grayscale_expands():
    g = bytes(((x * 5 + y * 7) % 256) for y in range(9) for x in range(17))
    w, h, m, out = B.bmp_decode_pixels(B.bmp_encode(17, 9, "L", g))
    assert (w, h, m) == (17, 9, "RGB")
    assert out == bytes(v for px in g for v in (px, px, px))


def _hand_bmp(w, h, bpp, rows: bytes, *, palette: bytes = b"", top_down=False,
              compression=0, masks: bytes = b"") -> bytes:
    hdr_size = 40 + len(masks)
    off = 14 + hdr_size + len(palette)
    head = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    head += struct.pack(
        "<IiiHHIIiiII", hdr_size, w, -h if top_down else h, 1, bpp,
        compression, len(rows), 0, 0, len(palette) // 4, 0,
    )
    return head + masks + palette + rows


def test_paletted_depths_decode():
    """1/4/8-bit paletted rows (BGRA quads, 4-byte row padding)."""
    pal = bytes((0, 0, 200, 0,  0, 200, 0, 0,  200, 0, 0, 0,  7, 7, 7, 0))
    # 8-bit: 5 px/row, stride pads to 8
    rows = bytes((0, 1, 2, 3, 0)) + bytes(3) + bytes((3, 2, 1, 0, 1)) + bytes(3)
    w, h, m, out = B.bmp_decode_pixels(_hand_bmp(5, 2, 8, rows, palette=pal))
    # bottom-up: file row 0 is image row 1
    px = [tuple(out[i : i + 3]) for i in range(0, 15, 3)]
    assert px == [(7, 7, 7), (0, 0, 200), (0, 200, 0), (200, 0, 0), (0, 200, 0)]
    # 4-bit: 3 px -> 2 bytes data + pad to 4
    rows4 = bytes((0x01, 0x20)) + bytes(2)
    w, h, m, out = B.bmp_decode_pixels(_hand_bmp(3, 1, 4, rows4, palette=pal))
    assert [tuple(out[i : i + 3]) for i in (0, 3, 6)] == [
        (200, 0, 0), (0, 200, 0), (0, 0, 200)
    ]
    # 1-bit
    rows1 = bytes((0b10100000,)) + bytes(3)
    w, h, m, out = B.bmp_decode_pixels(_hand_bmp(3, 1, 1, rows1, palette=pal[:8]))
    assert [tuple(out[i : i + 3]) for i in (0, 3, 6)] == [
        (0, 200, 0), (200, 0, 0), (0, 200, 0)
    ]


def test_top_down_rows():
    raw = _rgb(3, 2)
    # build top-down by hand: rows in image order, BGR
    rows = bytearray()
    for y in range(2):
        for x in range(3):
            i = (y * 3 + x) * 3
            rows += bytes((raw[i + 2], raw[i + 1], raw[i]))
        rows += bytes(3)  # stride 12 for 9 data bytes
    got = B.bmp_decode_pixels(_hand_bmp(3, 2, 24, bytes(rows), top_down=True))
    assert got == (3, 2, "RGB", raw)


def test_16_bit_565_and_555():
    # one pixel, pure red, both canonical layouts
    for masks, v in (
        (struct.pack("<III", 0xF800, 0x07E0, 0x001F), 0xF800),
        (struct.pack("<III", 0x7C00, 0x03E0, 0x001F), 0x7C00),
    ):
        rows = struct.pack("<H", v) + bytes(2)
        w, h, m, out = B.bmp_decode_pixels(
            _hand_bmp(1, 1, 16, rows, compression=3, masks=masks)
        )
        assert tuple(out) == (255, 0, 0), masks.hex()


def test_refusals_name_the_feature():
    raw = _rgb(4, 2)
    base = bytearray(B.bmp_encode(4, 2, "RGB", raw))
    struct.pack_into("<I", base, 30, 1)  # BI_RLE8
    with pytest.raises(B.BmpError, match="RLE8"):
        B.bmp_decode_pixels(bytes(base))
    with pytest.raises(B.BmpError, match="signature"):
        B.bmp_decode_pixels(b"XX" + bytes(60))
    # forged giant dims refuse before allocation
    bomb = bytearray(B.bmp_encode(4, 2, "RGB", raw))
    struct.pack_into("<ii", bomb, 18, 60000, 60000)
    with pytest.raises(B.BmpError, match="too large"):
        B.bmp_decode_pixels(bytes(bomb))


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 120),
    flip_pos=st.integers(0, 119),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    good = B.bmp_encode(9, 7, "RGB", _rgb(9, 7))
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(2, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 3:
        p = 2 + flip_pos % (len(data) - 2)
        data[p] ^= flip_val
    try:
        w, h, _, raw = B.bmp_decode_pixels(bytes(data))
        assert 0 < w and 0 < h and w * h <= 64_000_000
        assert len(raw) == w * h * 3
    except (B.BmpError, ValueError):
        pass


_REAL_BMP = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/imghdrdata/python.bmp"
)


@pytest.mark.skipif(not os.path.exists(_REAL_BMP), reason="no BMP on disk")
def test_foreign_encoder_file_decodes():
    """A real-world file with a BITMAPV5 header and 32-bit BI_BITFIELDS —
    a layout our encoder never writes."""
    payload = open(_REAL_BMP, "rb").read()
    w, h, m, raw = B.bmp_decode_pixels(payload)
    assert (w, h, m) == (16, 16, "RGB") and len(raw) == 768


def test_decode_pixels_dispatches_bmp_pure_python():
    raw = _rgb(20, 12)
    payload = B.bmp_encode(20, 12, "RGB", raw)
    assert mm.decode_pixels(payload) == (20, 12, "RGB", raw)
    png = mm.resize_pixels(payload, box=8)
    rw, rh, rm, rraw = mm.png_decode_pixels(png)
    assert (rw, rh) == mm.fit_box(20, 12, 8) and rm == "RGB"


def test_rle8_decodes():
    """Hand-assembled RLE8: runs, an absolute segment (word-padded), a
    delta skip (skipped pixels = index 0), end-of-line, end-of-bitmap."""
    pal = bytes((0, 0, 200, 0,  0, 200, 0, 0,  200, 0, 0, 0,  7, 7, 7, 0))
    # 6x2 image. Bottom row (file row 0): run 3x idx1, absolute [2,3,2], pad
    # Top row: run 2x idx2, delta (2,0) skips two -> idx0, then 2x idx3... but
    # only 6 wide: run2 + skip2 + run2 = 6
    rle = bytes((
        3, 1,  0, 3, 2, 3, 2, 0,   # run + absolute(3: 2,3,2) + pad byte
        0, 0,                      # end of line
        2, 2,  0, 2, 2, 0,  2, 3,  # run 2x2, delta dx=2, run 2x3
        0, 1,                      # end of bitmap
    ))
    payload = _hand_bmp(6, 2, 8, rle, palette=pal, compression=1)
    w, h, m, out = B.bmp_decode_pixels(payload)
    assert (w, h, m) == (6, 2, "RGB")
    px = [tuple(out[i : i + 3]) for i in range(0, len(out), 3)]
    red, green, blue, gray = (200, 0, 0), (0, 200, 0), (0, 0, 200), (7, 7, 7)
    # image row 0 = TOP = file row 1: 2x blue, 2x red(skipped->idx0), 2x gray
    assert px[:6] == [blue, blue, red, red, gray, gray]
    # image row 1 = BOTTOM = file row 0: 3x green, then abs 2,3,2 -> blue,gray,blue
    assert px[6:] == [green, green, green, blue, gray, blue]


def test_rle4_decodes():
    pal = bytes((0, 0, 200, 0,  0, 200, 0, 0,  200, 0, 0, 0,  7, 7, 7, 0))
    # 5x1: run of 4 alternating idx 1,2 then absolute 1 value idx3 (padded)
    rle = bytes((4, 0x12,  0, 3, 0x30, 0x00,  0, 1))
    # absolute count 3 would need... keep: abs run of 3 nibbles = 2 bytes + pad
    payload = _hand_bmp(5, 1, 4, rle, palette=pal, compression=2)
    w, h, m, out = B.bmp_decode_pixels(payload)
    px = [tuple(out[i : i + 3]) for i in range(0, len(out), 3)]
    green, blue = (0, 200, 0), (0, 0, 200)
    gray = (7, 7, 7)
    red = (200, 0, 0)
    # run: 1,2,1,2 -> green,blue,green,blue; absolute: 3,0,0 but width caps at 5
    assert px == [green, blue, green, blue, gray]


def test_rle_refusals():
    pal = bytes(16)
    with pytest.raises(B.BmpError, match="truncated"):
        B.bmp_decode_pixels(_hand_bmp(4, 2, 8, bytes((4, 1)), palette=pal,
                                      compression=1))
    with pytest.raises(B.BmpError, match="needs 8-bit"):
        B.bmp_decode_pixels(_hand_bmp(4, 2, 4, bytes((0, 1)), palette=pal,
                                      compression=1))
    with pytest.raises(B.BmpError, match="top-down"):
        B.bmp_decode_pixels(_hand_bmp(4, 2, 8, bytes((0, 1)), palette=pal,
                                      compression=1, top_down=True))
    # writes or line advances past the declared height must refuse
    with pytest.raises(B.BmpError, match="exceed declared height"):
        B.bmp_decode_pixels(_hand_bmp(4, 1, 8, bytes((0, 0, 0, 0, 2, 0, 0, 1)),
                                      palette=pal, compression=1))
    with pytest.raises(B.BmpError, match="beyond the last row"):
        B.bmp_decode_pixels(_hand_bmp(4, 1, 8, bytes((0, 0, 2, 5, 0, 1)),
                                      palette=pal, compression=1))


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    cut=st.integers(0, 40),
    flip_pos=st.integers(0, 39),
)
def test_rle_fuzz_never_hangs(seed, cut, flip_pos):
    import random

    rnd = random.Random(seed)
    rle = bytes(rnd.randrange(256) for _ in range(40)) + bytes((0, 1))
    pal = bytes(64)
    payload = bytearray(_hand_bmp(8, 4, 8, rle, palette=pal, compression=1))
    payload = payload[: max(54, len(payload) - cut)]
    if len(payload) > 55:
        payload[54 + flip_pos % (len(payload) - 54)] ^= 0xFF
    try:
        w, h, _, raw = B.bmp_decode_pixels(bytes(payload))
        assert len(raw) == w * h * 3
    except (B.BmpError, ValueError):
        pass


def test_bitfields_truncated_raises_bmperror_not_struct_error():
    """A BI_BITFIELDS payload cut before the mask dwords (offset 66) must
    raise BmpError — pre-fix the guard could never fire for hdr_size>=40
    and a raw struct.error leaked past decode_pixels' tiered fallback.
    Plain 40-byte info header: the masks follow it OUTSIDE hdr_size, so
    the header-overrun check cannot catch the cut."""
    head = b"BM" + struct.pack("<IHHI", 66, 0, 0, 66)
    head += struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 16, 3, 0, 0, 0, 0, 0,
    )
    assert len(head) == 54
    for cut in (54, 60, 65):
        with pytest.raises(B.BmpError, match="truncated"):
            B.bmp_decode_pixels(head[:cut] + b"\x00" * max(0, cut - 54))


def test_bitfields_with_invalid_depth_refuses_by_name():
    """BI_BITFIELDS is only defined for 16/32-bit depths; a 24-bit payload
    claiming it must refuse naming BI_BITFIELDS, not fall through to a
    generic compression refusal (or worse, BI_RGB decode)."""
    rows = bytes(6) + b"\x00\x00"
    payload = _hand_bmp(2, 1, 24, rows, compression=3)
    with pytest.raises(B.BmpError, match="BI_BITFIELDS.*24"):
        B.bmp_decode_pixels(payload)
