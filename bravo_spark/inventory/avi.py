"""Pure-Python MJPEG-in-AVI video demux/mux, no media libraries.

The VIDEO modality for the training-data pipeline, completing the
pure-Python container set (PNG/JPEG/GIF images, GIF animation, WAV
audio): AVI files whose video stream is Motion-JPEG demux to per-frame
JPEG payloads by walking the RIFF chunk tree ('hdrl' stream headers →
'movi' frame chunks), and each frame then decodes through the baseline
JPEG codec (inventory/jpeg.py) — REAL video frame extraction with zero
dependencies, the step the driver mandate allows to be stubbed. Streams
we cannot decode honestly (any non-MJPEG FourCC — H.264, VP9, raw RGB
...) refuse BY NAME; frame bytes are never faked.

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

__all__ = ["AviError", "avi_meta", "avi_iter_frames", "avi_encode_mjpeg"]

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

    def parse_strl(body: int, size: int) -> None:
        """One stream-header list; commits the FIRST 'vids' stream found
        (its chunk prefix is the stream's position among all streams)."""
        nonlocal width, height, rate, scale, stream_index, n_streams_seen
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
                if comp not in _MJPEG_FOURCC and fcc_handler not in _MJPEG_FOURCC:
                    name = (comp or fcc_handler or b"?").decode("ascii", "replace")
                    raise AviError(
                        f"AVI video codec {name!r} not supported "
                        "pure-Python (MJPEG only)"
                    )
                width = _u32(payload, b + 4)
                height = _u32(payload, b + 8)
                if width == 0 or height == 0 or width * height > 64_000_000:
                    raise AviError(
                        f"bad AVI video dimensions {width}x{height}"
                    )
                rate, scale = r_ or 0, s_ or 1
                stream_index = n_streams_seen
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
    return width, height, rate or 0, scale or 1, len(frames), frames


def avi_meta(payload: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, fps_milli, duration_ms) of the first
    video stream — fps in integer milli-fps (rate*1000//scale)."""
    w, h, rate, scale, n, _frames = _parse(payload)
    fps_milli = rate * 1000 // scale if scale else 0
    duration_ms = n * scale * 1000 // rate if rate else 0
    return w, h, n, fps_milli, duration_ms


def avi_iter_frames(payload: bytes):
    """Yield (frame_index, jpeg_bytes) for the first video stream. The
    bytes are the stored Motion-JPEG payload, decodable by
    ``inventory.jpeg.jpeg_decode_pixels``."""
    _w, _h, _r, _s, _n, frames = _parse(payload)
    for i, (start, size) in enumerate(frames):
        yield i, payload[start : start + size]


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
    if fps < 1:
        raise AviError("fps must be positive")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)
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
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_size, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the movi list-type
    idx = bytearray()
    off = 4
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
