"""Pure-Python WAV/PCM audio codec + deterministic signal features.

The audio modality for the training-data pipeline, same tier contract as
the image codecs (inventory/multimodal.py, jpeg.py, gif.py): RIFF/WAVE
containers with integer PCM (8/16/24/32-bit, any channel count) decode
REAL samples in-container with zero dependencies; compressed codecs
(float PCM, A-law/µ-law, MP3-in-RIFF, extensible subformats we can't
verify) refuse BY NAME — sample values are never faked. The encoder
writes canonical 44-byte-header PCM WAV and is the test ground truth:
integer PCM is lossless, so encode→decode round trips byte-exactly.

Feature extraction (``pcm_features``) is integer-exact — peak, RMS in
integer milli-units via isqrt, zero crossings, duration — so a SQL
oracle can reproduce every number closed-form for synthetic signals and
the driver's hash check covers the whole codec + DSP path.

Scale shape: per-row work inside Arrow-batched ``mapInPandas`` —
map-only; a 100 TB audio corpus distributes on payload rows and the
codec cost is the job.
"""

from __future__ import annotations

import math
import struct

__all__ = ["WavError", "wav_encode", "wav_decode", "wav_meta", "pcm_features"]

_MAX_SAMPLES = 256_000_000  # in-container decode ceiling (~16 min of 48k stereo)


class WavError(ValueError):
    """Malformed or out-of-profile WAV; message names the reason."""


def wav_encode(
    sample_rate: int, channels: int, bits: int, samples: list[int] | bytes
) -> bytes:
    """Canonical RIFF/WAVE PCM encode. ``samples`` is interleaved frames:
    a list of ints (signed for ≥16-bit, unsigned 0-255 for 8-bit — the
    WAV convention) or pre-packed little-endian bytes."""
    if bits not in (8, 16, 24, 32):
        raise WavError(f"PCM bit depth {bits} unsupported (8/16/24/32)")
    if channels < 1 or sample_rate < 1:
        raise WavError("channels and sample_rate must be positive")
    width = bits // 8
    if isinstance(samples, (bytes, bytearray)):
        data = bytes(samples)
        if len(data) % (width * channels):
            raise WavError("sample bytes not a whole number of frames")
    else:
        lo = 0 if bits == 8 else -(1 << (bits - 1))
        hi = 255 if bits == 8 else (1 << (bits - 1)) - 1
        out = bytearray()
        for s in samples:
            if not lo <= s <= hi:
                raise WavError(f"sample {s} outside {bits}-bit range")
            out += int(s & ((1 << bits) - 1)).to_bytes(width, "little")
        if len(out) % (width * channels):
            raise WavError("sample count not a whole number of frames")
        data = bytes(out)
    block_align = channels * width
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _parse(payload: bytes):
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body_end = pos + 8 + size
        if body_end > n:
            raise WavError(f"chunk {tag!r} overruns payload")
        body = payload[pos + 8 : body_end]
        if tag == b"fmt ":
            if len(body) < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
            if fmt is not None:
                break  # canonical order: fmt before data
        # chunks are word-aligned: odd sizes carry a pad byte
        pos = body_end + (size & 1)
    if fmt is None:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format not in (1, 6, 7):
        name = {3: "IEEE float", 0xFFFE: "extensible"}.get(
            audio_format, f"format {audio_format}"
        )
        raise WavError(f"non-integer-PCM WAV ({name}) not supported pure-Python")
    if audio_format in (6, 7):
        if bits != 8:
            raise WavError(f"G.711 WAV must be 8-bit, got {bits}")
    elif bits not in (8, 16, 24, 32):
        raise WavError(f"PCM bit depth {bits} unsupported (8/16/24/32)")
    if channels < 1 or sample_rate < 1:
        raise WavError("corrupt fmt chunk (zero channels or rate)")
    width = bits // 8
    if len(data) % (width * channels):
        # tolerate a trailing partial frame (truncated file): drop it
        data = data[: len(data) - len(data) % (width * channels)]
    if len(data) // width > _MAX_SAMPLES:
        raise WavError("audio too large for in-container decode")
    return audio_format, channels, sample_rate, bits, data


# G.711 expansion (the public-domain Sun g711.c formulas, as in the ITU
# spec): 8-bit companded byte → 13/14-bit signed linear sample
def _ulaw_to_linear(u: int) -> int:
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return 0x84 - t if u & 0x80 else t - 0x84


def _alaw_to_linear(a: int) -> int:
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


_ULAW_TABLE = [_ulaw_to_linear(i) for i in range(256)]
_ALAW_TABLE = [_alaw_to_linear(i) for i in range(256)]


def wav_meta(payload: bytes) -> tuple[int, int, int, int, int]:
    """(sample_rate, channels, bits, n_frames, duration_ms) from the
    container — header-level, but the data chunk's framing is validated.
    ``bits`` is the STORED width (8 for G.711 streams)."""
    _fmt, channels, sample_rate, bits, data = _parse(payload)
    n_frames = len(data) // (channels * bits // 8)
    return sample_rate, channels, bits, n_frames, n_frames * 1000 // sample_rate


def wav_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, channels, bits, samples) — interleaved ints, signed
    for ≥16-bit, unsigned for 8-bit (the WAV convention, preserved so
    encode(decode(x)) is byte-exact for linear PCM). G.711 A-law/µ-law
    streams EXPAND to signed linear samples and report bits=16 — the
    companded byte is a storage format, not a sample value."""
    fmt, channels, sample_rate, bits, data = _parse(payload)
    if fmt in (6, 7):
        table = _ALAW_TABLE if fmt == 6 else _ULAW_TABLE
        return sample_rate, channels, 16, [table[b] for b in data]
    width = bits // 8
    samples = []
    if bits == 8:
        samples = list(data)
    else:
        half = 1 << (bits - 1)
        full = 1 << bits
        for i in range(0, len(data), width):
            v = int.from_bytes(data[i : i + width], "little")
            samples.append(v - full if v >= half else v)
    return sample_rate, channels, bits, samples


def pcm_features(payload: bytes) -> dict[str, int]:
    """Integer-exact signal features of the FIRST channel:

    - ``n_frames``, ``duration_ms`` (floor),
    - ``peak``: max |sample| (8-bit values are re-centered by -128 first),
    - ``rms_milli``: isqrt(sum(s²) * 1_000_000 // n) — RMS in integer
      milli-units, exact for any engine that has isqrt,
    - ``zero_crossings``: sign flips between consecutive frames (zero
      samples carry the previous sign, the standard convention).
    """
    sample_rate, channels, bits, samples = wav_decode(payload)
    first = samples[::channels]
    if bits == 8:
        first = [s - 128 for s in first]
    n = len(first)
    if n == 0:
        return {
            "n_frames": 0, "duration_ms": 0, "peak": 0,
            "rms_milli": 0, "zero_crossings": 0,
        }
    peak = max(abs(s) for s in first)
    rms_milli = math.isqrt(sum(s * s for s in first) * 1_000_000 // n)
    crossings = 0
    prev_sign = 0
    for s in first:
        sign = 1 if s > 0 else (-1 if s < 0 else prev_sign)
        if prev_sign and sign and sign != prev_sign:
            crossings += 1
        prev_sign = sign
    return {
        "n_frames": n,
        "duration_ms": n * 1000 // sample_rate,
        "peak": peak,
        "rms_milli": rms_milli,
        "zero_crossings": crossings,
    }
