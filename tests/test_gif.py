"""Pure-Python GIF codec (inventory/gif.py).

Ground truth: GIF is LOSSLESS for ≤256-color content, so encode→decode
must be byte-exact — no tolerance bands. Decoder paths the encoder never
produces (interlace, transparency, local color tables, foreign LZW
streams) are pinned with hand-assembled byte vectors and real-world
files from foreign encoders (env-gated).
"""

from __future__ import annotations

import glob
import os
import struct

import pytest
from hypothesis import given, settings, strategies as st

from bravo_spark.inventory import gif as G
from bravo_spark.inventory import multimodal as mm


def _limited_rgb(w: int, h: int) -> bytes:
    # ≤256 distinct colors by construction (16 × 16 grid of color cells)
    return bytes(
        ((x * 16) % 256, (y * 16) % 256, 40)[c]
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_lzw_roundtrip_vectors():
    for min_code, data in [
        (2, b"\x00\x01\x02\x03" * 10),
        (2, b"\x00" * 300),            # long single-symbol run (KwKwK case)
        (8, bytes(range(256)) * 3),
        (8, b"\xff" * 1000),
    ]:
        enc = G._lzw_encode(min_code, data)
        dec = G._lzw_decode(min_code, enc, len(data) + 10)
        assert bytes(dec) == data, (min_code, len(data))


def test_lzw_kwkwk_case():
    """The cScSc pattern forces a code equal to next_code (decode must
    synthesize prev+first(prev)) — the classic LZW decoder edge."""
    data = b"\x01\x01\x01\x01\x01\x01\x01"
    enc = G._lzw_encode(2, data)
    assert bytes(G._lzw_decode(2, enc, 100)) == data


def test_rgb_roundtrip_lossless():
    w, h = 37, 21
    raw = _limited_rgb(w, h)
    payload = G.gif_encode(w, h, "RGB", raw)
    assert mm.parse_image_dims(payload) == (w, h)
    gw, gh, mode, out = G.gif_decode_pixels(payload)
    assert (gw, gh, mode) == (w, h, "RGB")
    assert out == raw  # bit-exact: GIF is palette-lossless


def test_grayscale_roundtrip_lossless():
    g = bytes(((x * 8 + y * 8) % 256) for y in range(13) for x in range(29))
    payload = G.gif_encode(29, 13, "L", g)
    gw, gh, mode, out = G.gif_decode_pixels(payload)
    assert (gw, gh, mode) == (29, 13, "RGB")
    assert out == bytes(v for px in g for v in (px, px, px))


def test_too_many_colors_refused_by_name():
    w, h = 32, 24  # 768 distinct colors
    raw = bytes(
        (i % 256, (i // 256) * 90 + 7, 13)[c]
        for i in range(w * h)
        for c in range(3)
    )
    with pytest.raises(G.GifError, match="256 distinct colors"):
        G.gif_encode(w, h, "RGB", raw)


def _reorder_interlaced(idx: bytes, w: int, h: int) -> bytes:
    """Rows in GIF interlace storage order (pass 1: 0,8,..; 2: 4,12,..;
    3: 2,6,..; 4: 1,3,..)."""
    out = bytearray()
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            out += idx[y * w : (y + 1) * w]
    return bytes(out)


def test_interlaced_frame_decodes():
    """Hand-assemble an interlaced GIF (our encoder never writes one): same
    palette image, rows stored in pass order, interlace flag set — must
    decode to the SAME pixels as the sequential encoding."""
    w, h = 11, 13
    raw = _limited_rgb(w, h)
    plain = G.gif_encode(w, h, "RGB", raw)
    # palette/index data from the encoder's own intermediate state
    palette = {}
    for i in range(0, len(raw), 3):
        palette.setdefault(tuple(raw[i : i + 3]), len(palette))
    idx = bytes(palette[tuple(raw[i : i + 3])] for i in range(0, len(raw), 3))
    bits = max(1, (len(palette) - 1).bit_length())
    min_code = max(2, bits)
    lzw = G._lzw_encode(min_code, _reorder_interlaced(idx, w, h))
    out = bytearray(plain[: 13 + 3 * (1 << bits)])  # header + GCT
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x40"  # interlaced
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    gw, gh, mode, got = G.gif_decode_pixels(bytes(out))
    assert (gw, gh, mode) == (w, h, "RGB")
    assert got == raw


def test_transparent_index_composites_background():
    """GCE-flagged transparent pixels show the logical-screen background
    color instead of the palette entry."""
    # palette: bg=red, then blue; 2x2 frame with one transparent pixel
    gct = bytes((200, 0, 0, 0, 0, 200)) + bytes(6)  # padded to 4 entries
    idx = bytes([1, 1, 0, 1])  # index 0 will be declared transparent
    lzw = G._lzw_encode(2, idx)
    payload = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x81, 0, 0]) + gct
        + b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # GCE: transparency on, idx 0
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([2, len(lzw)]) + lzw + b"\x00\x3b"
    )
    w, h, mode, out = G.gif_decode_pixels(payload)
    assert (w, h, mode) == (2, 2, "RGB")
    px = [tuple(out[i : i + 3]) for i in range(0, 12, 3)]
    # transparent pixel (idx 0) shows the bg color — which IS palette[0]
    # here, so assert the opaque ones too
    assert px == [(0, 0, 200), (0, 0, 200), (200, 0, 0), (0, 0, 200)]


def test_frame_iteration_multiframe():
    """Two image blocks → two independent frames (frame-sampling
    contract), the second offset into the logical screen."""
    w, h = 4, 4
    raw = _limited_rgb(w, h)
    base = G.gif_encode(w, h, "RGB", raw)
    # splice a second 2x2 frame at offset (1,1) reusing the GCT indices
    palette = {}
    for i in range(0, len(raw), 3):
        palette.setdefault(tuple(raw[i : i + 3]), len(palette))
    lzw = G._lzw_encode(max(2, (len(palette) - 1).bit_length()), bytes([0, 0, 0, 0]))
    frame2 = (
        b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00"
        + bytes([max(2, (len(palette) - 1).bit_length()), len(lzw)]) + lzw + b"\x00"
    )
    payload = base[:-1] + frame2 + b"\x3b"
    frames = list(G.gif_iter_frames(payload))
    assert len(frames) == 2
    assert frames[0][1:4] == (w, h, "RGB")
    assert frames[1][1:4] == (w, h, "RGB")  # composited on the full screen


def test_forged_dims_bomb_refused():
    payload = bytearray(G.gif_encode(4, 4, "RGB", _limited_rgb(4, 4)))
    struct.pack_into("<HH", payload, 6, 65000, 65000)
    with pytest.raises(G.GifError, match="too large"):
        G.gif_decode_pixels(bytes(payload))


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 200),
    flip_pos=st.integers(0, 199),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    good = G.gif_encode(12, 9, "RGB", _limited_rgb(12, 9))
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(6, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 7:
        p = 6 + flip_pos % (len(data) - 6)
        data[p] ^= flip_val
    try:
        w, h, _, raw = G.gif_decode_pixels(bytes(data))
        assert 0 < w <= 65535 and 0 < h <= 65535
        assert len(raw) == w * h * 3
    except (G.GifError, ValueError):
        pass


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 24), seed=st.integers(0, 2**32 - 1))
def test_random_palette_images_lossless(w, h, seed):
    import random

    rnd = random.Random(seed)
    colors = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
        for _ in range(rnd.randrange(1, 17))
    ]
    raw = b"".join(bytes(rnd.choice(colors)) for _ in range(w * h))
    payload = G.gif_encode(w, h, "RGB", raw)
    gw, gh, mode, out = G.gif_decode_pixels(payload)
    assert (gw, gh, mode, out) == (w, h, "RGB", raw)


_REAL_GIFS = sorted(
    glob.glob(
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "idlelib/Icons/*.gif"
    )
)


@pytest.mark.skipif(not _REAL_GIFS, reason="no foreign-encoder GIFs on disk")
def test_foreign_encoder_streams_decode():
    """Icons written by real-world encoders (various palettes, some with
    transparency) decode to header-consistent pixel buffers."""
    assert len(_REAL_GIFS) >= 3
    for path in _REAL_GIFS:
        payload = open(path, "rb").read()
        w, h, m, raw = G.gif_decode_pixels(payload)
        assert (w, h) == mm.parse_image_dims(payload)
        assert m == "RGB" and len(raw) == w * h * 3


def test_decode_pixels_dispatches_gif_pure_python():
    raw = _limited_rgb(20, 12)
    payload = G.gif_encode(20, 12, "RGB", raw)
    w, h, m, out = mm.decode_pixels(payload)
    assert (w, h, m, out) == (20, 12, "RGB", raw)
    png = mm.resize_pixels(payload, box=8)
    rw, rh, rm, rraw = mm.png_decode_pixels(png)
    assert (rw, rh) == mm.fit_box(20, 12, 8) and rm == "RGB"
    assert len(rraw) == rw * rh * 3


def test_animation_roundtrip_frame_exact():
    """gif_encode_animation → gif_iter_frames recovers every frame
    byte-for-byte (global palette, NETSCAPE loop block skipped as an
    extension, per-frame GCE carried)."""
    w, h = 9, 7
    frames = [
        bytes(((x + k) % 4 * 64, (y + k) % 4 * 64, k * 64)[c]
              for y in range(h) for x in range(w) for c in range(3))
        for k in range(4)
    ]
    anim = G.gif_encode_animation(w, h, frames, delay_cs=5)
    got = list(G.gif_iter_frames(anim))
    assert [i for i, *_ in got] == [0, 1, 2, 3]
    for (i, gw, gh, mode, raw), want in zip(got, frames):
        assert (gw, gh, mode) == (w, h, "RGB")
        assert raw == want, f"frame {i} drifted"


def test_animation_palette_overflow_refused():
    w, h = 16, 16
    frames = [
        bytes((k * 40 + x, y, x + y)[c] % 256
              for y in range(h) for x in range(w) for c in range(3))
        for k in range(4)
    ]
    with pytest.raises(G.GifError, match="across frames"):
        G.gif_encode_animation(w, h, frames)
