"""Pure-Python MJPEG-AVI demux/mux (inventory/avi.py).

Ground truth: the muxer stores JPEG payloads verbatim, so mux→demux is
byte-exact; decoded frame pixels are covered by the JPEG codec's own
pins. Hand-mutations pin the refusal paths (foreign codecs by name,
forged sizes, truncations)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings, strategies as st

from bravo_spark.inventory import avi as V
from bravo_spark.inventory import jpeg as J


def _frames(w: int, h: int, n: int) -> list[bytes]:
    return [
        J.jpeg_encode(
            w, h, "RGB",
            bytes(
                (x * 6 + k * 3, y * 5, x * 2 + y * 2 + k * 2)[c]
                for y in range(h)
                for x in range(w)
                for c in range(3)
            ),
            quality=95,
        )
        for k in range(n)
    ]


def test_mux_demux_byte_exact():
    frames = _frames(24, 16, 5)
    payload = V.avi_encode_mjpeg(24, 16, frames, fps=10)
    assert V.avi_meta(payload) == (24, 16, 5, 10_000, 500)
    got = list(V.avi_iter_frames(payload))
    assert [i for i, _ in got] == list(range(5))
    assert [f for _, f in got] == frames


def test_demuxed_frames_really_decode():
    w, h = 16, 16
    frames = _frames(w, h, 3)
    payload = V.avi_encode_mjpeg(w, h, frames)
    for _, jpeg in V.avi_iter_frames(payload):
        gw, gh, mode, raw = J.jpeg_decode_pixels(jpeg)
        assert (gw, gh, mode) == (w, h, "RGB") and len(raw) == w * h * 3


def test_odd_sized_frames_word_aligned():
    """RIFF chunks pad odd sizes; a frame with an odd byte length must not
    desync the walk."""
    frames = _frames(17, 9, 4)
    assert any(len(f) & 1 for f in frames), "fixture should hit odd sizes"
    payload = V.avi_encode_mjpeg(17, 9, frames)
    assert [f for _, f in V.avi_iter_frames(payload)] == frames


def test_foreign_codec_refused_by_name():
    payload = V.avi_encode_mjpeg(16, 16, _frames(16, 16, 2))
    # 'DIB ' stays here: uncompressed frames are signaled by
    # biCompression == 0, not by a 'DIB ' fourcc IN the compression field
    for fourcc in (b"H264", b"VP90", b"DIB "):
        bad = payload.replace(b"MJPG", fourcc)
        with pytest.raises(V.AviError, match="MJPEG/DIB only"):
            V.avi_meta(bad)


def test_not_avi_refused():
    with pytest.raises(V.AviError, match="RIFF/AVI"):
        V.avi_meta(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(V.AviError, match="RIFF/AVI"):
        V.avi_meta(b"\x00" * 40)


def test_forged_chunk_size_refused():
    payload = bytearray(V.avi_encode_mjpeg(16, 16, _frames(16, 16, 2)))
    movi_at = bytes(payload).find(b"movi")
    # the movi LIST's size field sits 8 bytes before its list-type
    struct.pack_into("<I", payload, movi_at - 4, 2_000_000_000)
    with pytest.raises(V.AviError, match="overruns"):
        V.avi_meta(bytes(payload))


def test_headerless_movi_refused():
    """movi data before any stream header must refuse, not guess."""
    movi = b"LIST" + struct.pack("<I", 4 + 8) + b"movi" + b"00dc" + struct.pack("<I", 0)
    body = b"AVI " + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(V.AviError, match="movi before"):
        V.avi_meta(payload)


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 300),
    flip_pos=st.integers(0, 299),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    good = V.avi_encode_mjpeg(16, 16, _frames(16, 16, 3))
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(4, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 5:
        p = 4 + flip_pos % (len(data) - 4)
        data[p] ^= flip_val
    try:
        w, h, n, fps_milli, dur = V.avi_meta(bytes(data))
        # the codec's own contract: positive dims under the 64 MP ceiling
        assert 0 < w and 0 < h and w * h <= 64_000_000 and n >= 1
    except (V.AviError, ValueError):
        pass


def test_second_stream_video_uses_right_chunk_prefix():
    """A file whose FIRST stream is audio must read '01dc' frames, not
    '00dc' — the stream index is positional."""
    frames = _frames(16, 16, 2)
    base = V.avi_encode_mjpeg(16, 16, frames)

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(t, body):
        return chunk(b"LIST", t + body)

    audio_strh = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 0, 0)
        + struct.pack("<HHHH", 0, 0, 0, 0)
    )
    audio_strl = lst(b"strl", chunk(b"strh", audio_strh) + chunk(b"strf", bytes(16)))
    video_strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 2, 0, 0, 0, 0)
        + struct.pack("<HHHH", 0, 0, 16, 16)
    )
    video_strf = struct.pack(
        "<IiiHH4sIiiII", 40, 16, 16, 1, 24, b"MJPG", 16 * 16 * 3, 0, 0, 0, 0
    )
    video_strl = lst(b"strl", chunk(b"strh", video_strh) + chunk(b"strf", video_strf))
    avih = bytes(56)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + audio_strl + video_strl)
    # stream 0 is audio ('00wb'), stream 1 is the video ('01dc'); an
    # unrelated '01wb' chunk must also be ignored by the frame walk
    movi = lst(
        b"movi",
        chunk(b"01wb", b"\x00" * 10)
        + chunk(b"01dc", frames[0])
        + chunk(b"00wb", b"\x00" * 8)
        + chunk(b"01dc", frames[1]),
    )
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got = [f for _, f in V.avi_iter_frames(payload)]
    assert got == frames

def test_strh_is_spec_56_bytes_with_rcframe_at_48():
    """AVISTREAMHEADER has exactly 8 dwords between wLanguage and rcFrame;
    the muxer once wrote a stray 9th, shifting rcFrame so spec-strict
    third-party parsers misread it. Pin the 56-byte layout and the frame
    rectangle's offset."""
    frames = _frames(16, 8, 2)
    payload = V.avi_encode_mjpeg(16, 8, frames, fps=10)
    pos = payload.index(b"strh")
    size = struct.unpack_from("<I", payload, pos + 4)[0]
    assert size == 56
    body = payload[pos + 8 : pos + 8 + size]
    assert body[:4] == b"vids" and body[4:8] == b"MJPG"
    scale, rate = struct.unpack_from("<II", body, 20)
    assert (scale, rate) == (1, 10)
    length = struct.unpack_from("<I", body, 32)[0]
    assert length == 2
    left, top, right, bottom = struct.unpack_from("<HHHH", body, 48)
    assert (left, top, right, bottom) == (0, 0, 16, 8)


def _rgb_frames(w, h, n):
    return [
        bytes(((x + y * 3 + k * 11 + c * 5) % 256)
              for y in range(h) for x in range(w) for c in range(3))
        for k in range(n)
    ]


def test_dib_mux_demux_pixel_exact():
    """Uncompressed 'DIB ' AVI: BI_RGB 24-bit frames are lossless, so
    mux → avi_iter_frames_pixels recovers every frame byte-exactly
    through the BMP pixel tier."""
    frames = _rgb_frames(13, 7, 4)  # odd width: exercises row padding
    payload = V.avi_encode_dib(13, 7, frames, fps=8)
    assert V.avi_frame_codec(payload) == "dib"
    assert V.avi_meta(payload) == (13, 7, 4, 8000, 500)
    got = list(V.avi_iter_frames_pixels(payload))
    assert [i for i, *_ in got] == list(range(4))
    for i, fw, fh, mode, raw in got:
        assert (fw, fh, mode) == (13, 7, "RGB")
        assert raw == frames[i]


def test_mjpeg_pixels_iterator_matches_direct_decode():
    frames = _frames(16, 16, 2)
    payload = V.avi_encode_mjpeg(16, 16, frames)
    assert V.avi_frame_codec(payload) == "mjpg"
    for (i, fw, fh, mode, raw), jpeg in zip(
        V.avi_iter_frames_pixels(payload), frames
    ):
        assert (fw, fh, mode, raw) == J.jpeg_decode_pixels(jpeg)


def test_dib_stored_frames_are_bare_pixel_arrays():
    # 4-wide 24-bit rows are already 4-byte aligned: stride == w*3
    frames = _rgb_frames(4, 2, 1)
    payload = V.avi_encode_dib(4, 2, frames)
    (_, stored), = V.avi_iter_frames(payload)
    assert len(stored) == 4 * 2 * 3
    # bottom-up BGR: the stored first row is the source LAST row reversed
    top = frames[0][:12]
    last_row_bgr = bytes(
        b for x in range(4)
        for b in frames[0][12 + 3 * x : 12 + 3 * x + 3][::-1]
    )
    assert stored[:12] == last_row_bgr
    assert stored[12:15] == top[2::-1]


def test_dib_bad_frame_size_refused():
    with pytest.raises(V.AviError, match="not 4x2 RGB"):
        V.avi_encode_dib(4, 2, [bytes(10)])
    with pytest.raises(V.AviError, match="at least one frame"):
        V.avi_encode_dib(4, 2, [])
