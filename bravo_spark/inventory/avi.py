"""Pure-Python MJPEG-in-AVI video demux/mux, no media libraries.

The VIDEO modality for the training-data pipeline, completing the
pure-Python container set (PNG/JPEG/GIF images, GIF animation, WAV
audio): AVI files whose video stream is Motion-JPEG or uncompressed
BI_RGB demux to per-frame payloads by walking the RIFF chunk tree
('hdrl' stream headers → 'movi' frame chunks), and each frame then
decodes through the matching pixel codec — MJPEG via the baseline JPEG
decoder (inventory/jpeg.py), 'DIB ' raw frames via the BMP pixel tier
(inventory/bmp.py; a DIB frame is a bare BMP payload) — REAL video
frame extraction with zero dependencies, the step the driver mandate
allows to be stubbed. Streams we cannot decode honestly (any other
FourCC — H.264, VP9, ...) refuse BY NAME; frame bytes are never faked.

The muxer writes a spec-conforming single-video-stream AVI (avih/strh/
strf headers, 'movi' with '00dc' chunks, idx1 index) and is the test
ground truth: mux→demux returns the identical JPEG payloads byte-for-
byte, and real JPEG decode of each recovered frame is covered by the
JPEG codec's own pins.

Scale shape: per-row work inside Arrow-batched ``mapInPandas`` — the
frame-sampling query demuxes only the SELECTED frames' byte ranges, the
same random-access pattern an ffmpeg-backed 100 TB job uses.
"""

from __future__ import annotations

import struct

__all__ = [
    "AviError",
    "avi_meta",
    "avi_frame_codec",
    "avi_iter_frames",
    "avi_iter_frames_pixels",
    "avi_encode_mjpeg",
    "avi_encode_dib",
]

_MAX_FRAMES = 1_000_000
_MJPEG_FOURCC = {b"MJPG", b"mjpg", b"dmb1", b"jpeg", b"JPEG"}


class AviError(ValueError):
    """Malformed or out-of-profile AVI; message names the reason."""


def _u32(buf: bytes, pos: int) -> int:
    if pos + 4 > len(buf):
        raise AviError("truncated AVI")
    return struct.unpack_from("<I", buf, pos)[0]


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in [pos, end);
    LIST chunks yield their list-type as fourcc with the body AFTER it."""
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        size = _u32(buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError(f"chunk {tag!r} overruns its parent")
        yield tag, body, size
        pos = body + size + (size & 1)  # word-aligned


def _parse(payload: bytes):
    """→ (width, height, fps_num, fps_den, n_frames, [(start, size), ...])
    for the first video stream; refuses non-MJPEG by codec name."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI payload")
    end = min(len(payload), 8 + _u32(payload, 4))

    width = height = None
    rate, scale = 0, 1
    stream_index = None  # index of the first video stream ('##dc' prefix)
    frames: list[tuple[int, int]] = []
    n_streams_seen = 0
    codec = None  # "mjpg" | "dib"
    strf_body = b""  # the stream's BITMAPINFOHEADER (+palette) for DIB

    def parse_strl(body: int, size: int) -> None:
        """One stream-header list; commits the FIRST 'vids' stream found
        (its chunk prefix is the stream's position among all streams)."""
        nonlocal width, height, rate, scale, stream_index, n_streams_seen
        nonlocal codec, strf_body
        fcc_type = fcc_handler = None
        r_ = s_ = None
        for tag, b, sz in _walk_chunks(payload, body, body + size):
            if tag == b"strh" and sz >= 32:
                fcc_type = payload[b : b + 4]
                fcc_handler = payload[b + 4 : b + 8]
                s_ = _u32(payload, b + 20)
                r_ = _u32(payload, b + 24)
            elif (
                tag == b"strf"
                and fcc_type == b"vids"
                and sz >= 40
                and stream_index is None
            ):
                # BITMAPINFOHEADER: biWidth/biHeight at +4/+8, biCompression +16
                comp = payload[b + 16 : b + 20]
                if comp == b"\x00\x00\x00\x00" and fcc_handler not in _MJPEG_FOURCC:
                    # biCompression == BI_RGB: uncompressed DIB frames —
                    # the BMP pixel tier (inventory/bmp.py) is the decoder
                    codec = "dib"
                elif comp in _MJPEG_FOURCC or fcc_handler in _MJPEG_FOURCC:
                    codec = "mjpg"
                else:
                    name = (comp or fcc_handler or b"?").decode("ascii", "replace")
                    raise AviError(
                        f"AVI video codec {name!r} not supported "
                        "pure-Python (MJPEG/DIB only)"
                    )
                width = _u32(payload, b + 4)
                h_signed = struct.unpack_from("<i", payload, b + 8)[0]
                height = -h_signed if h_signed < 0 else h_signed
                if width == 0 or height == 0 or width * height > 64_000_000:
                    raise AviError(
                        f"bad AVI video dimensions {width}x{h_signed}"
                    )
                rate, scale = r_ or 0, s_ or 1
                stream_index = n_streams_seen
                strf_body = payload[b : b + sz]
        n_streams_seen += 1

    for tag, body, size in _walk_chunks(payload, 12, end):
        if tag == b"LIST":
            list_type = payload[body : body + 4]
            if list_type == b"hdrl":
                for t2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                    if t2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                        parse_strl(b2 + 4, s2 - 4)
            elif list_type == b"movi":
                if stream_index is None:
                    raise AviError("AVI movi before any video stream header")
                want = b"%02ddc" % stream_index
                want2 = b"%02ddb" % stream_index
                for t2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                    if t2 in (want, want2):
                        frames.append((b2, s2))
                        if len(frames) > _MAX_FRAMES:
                            raise AviError("AVI frame count exceeds ceiling")
    if width is None or height is None:
        raise AviError("AVI has no video stream")
    if not frames:
        raise AviError("AVI video stream has no frames")
    return width, height, rate or 0, scale or 1, len(frames), frames, codec, strf_body


def avi_meta(payload: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, fps_milli, duration_ms) of the first
    video stream — fps in integer milli-fps (rate*1000//scale)."""
    w, h, rate, scale, n, _frames, _codec, _strf = _parse(payload)
    fps_milli = rate * 1000 // scale if scale else 0
    duration_ms = n * scale * 1000 // rate if rate else 0
    return w, h, n, fps_milli, duration_ms


def avi_frame_codec(payload: bytes) -> str:
    """Codec of the first video stream: ``"mjpg"`` (Motion-JPEG) or
    ``"dib"`` (uncompressed BI_RGB device-independent-bitmap frames)."""
    return _parse(payload)[6]


def avi_iter_frames(payload: bytes):
    """Yield (frame_index, stored_bytes) for the first video stream:
    the Motion-JPEG payload (decodable by
    ``inventory.jpeg.jpeg_decode_pixels``) for MJPEG streams, or the raw
    DIB pixel array for uncompressed streams — use
    ``avi_iter_frames_pixels`` for decoded pixels either way."""
    _w, _h, _r, _s, _n, frames, _codec, _strf = _parse(payload)
    for i, (start, size) in enumerate(frames):
        yield i, payload[start : start + size]


def avi_iter_frames_pixels(payload: bytes):
    """Yield (frame_index, width, height, mode, raw) with every frame
    decoded to real pixels through the matching pure-Python codec:
    MJPEG frames via the baseline JPEG decoder, uncompressed DIB frames
    by prepending a BITMAPFILEHEADER to the stream's strf
    (BITMAPINFOHEADER + palette) + frame bits and running the BMP pixel
    tier — 'DIB ' AVI frames ARE bare BMP payloads."""
    _w, _h, _r, _s, _n, frames, codec, strf = _parse(payload)
    if codec == "dib":
        from bravo_spark.inventory.bmp import bmp_decode_pixels as decode
        off = 14 + len(strf)
        head = b"BM"

        def to_payload(bits: bytes) -> bytes:
            return (
                head + struct.pack("<IHHI", off + len(bits), 0, 0, off)
                + strf + bits
            )
    else:
        from bravo_spark.inventory.jpeg import jpeg_decode_pixels as decode

        def to_payload(bits: bytes) -> bytes:
            return bits

    for i, (start, size) in enumerate(frames):
        fw, fh, mode, raw = decode(to_payload(payload[start : start + size]))
        yield i, fw, fh, mode, raw


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))


def _lst(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _mux(
    w: int, h: int, frames: list[bytes], fps: int,
    handler: bytes, strf: bytes, chunk_tag: bytes,
) -> bytes:
    """Shared single-video-stream AVI assembly (avih + strh/strf headers,
    'movi' body, idx1 index); the caller supplies codec-specific frame
    payloads, handler fourcc, strf body, and '00dc'/'00db' chunk tag."""
    if fps < 1:
        raise AviError("fps must be positive")
    n = len(frames)
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,        # max bytes/sec, padding, flags (HASINDEX)
        n, 0, 1,           # total frames, initial frames, streams
        max_size, w, h, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: flags, wPriority, wLanguage, then exactly 8 dwords
    # (InitialFrames, Scale, Rate, Start, Length, SuggestedBufferSize,
    # Quality, SampleSize) before the rcFrame shorts — 56 bytes total
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_size, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", avih)
        + _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(chunk_tag, f) for f in frames)
    movi = _lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the movi list-type
    idx = bytearray()
    off = 4
    for f in frames:
        idx += chunk_tag + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_encode_mjpeg(
    w: int, h: int, jpeg_frames: list[bytes], *, fps: int = 25
) -> bytes:
    """Mux pre-encoded JPEG payloads into a single-stream MJPEG AVI
    (avih + strh/strf headers, 'movi' body, idx1 index)."""
    if not jpeg_frames:
        raise AviError("animation needs at least one frame")
    for i, f in enumerate(jpeg_frames):
        if not f.startswith(b"\xff\xd8"):
            raise AviError(f"frame {i} is not a JPEG payload")
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    return _mux(w, h, jpeg_frames, fps, b"MJPG", strf, b"00dc")


def avi_encode_dib(
    w: int, h: int, rgb_frames: list[bytes], *, fps: int = 25
) -> bytes:
    """Mux raw RGB frames (top-left origin, w*h*3 bytes each) into an
    uncompressed 'DIB ' AVI: each frame is BMP-encoded by the pixel tier
    (inventory/bmp.py) and stored as its bare pixel array in a '00db'
    chunk, with the BMP info header as the stream's strf — the exact
    inverse of avi_iter_frames_pixels' DIB path."""
    from bravo_spark.inventory.bmp import bmp_encode

    if not rgb_frames:
        raise AviError("animation needs at least one frame")
    strf = b""
    dib_frames = []
    for i, f in enumerate(rgb_frames):
        if len(f) != w * h * 3:
            raise AviError(f"frame {i} is not {w}x{h} RGB ({len(f)} bytes)")
        bmp = bmp_encode(w, h, "RGB", bytes(f))
        off = struct.unpack_from("<I", bmp, 10)[0]
        strf = bmp[14:off]  # BITMAPINFOHEADER (BI_RGB, 24-bit)
        dib_frames.append(bmp[off:])
    return _mux(w, h, dib_frames, fps, b"DIB ", strf, b"00db")
