"""Pure-Python audio codecs (WAV / AIFF / AU) + deterministic features.

The audio modality for the training-data pipeline, same tier contract as
the image codecs (inventory/multimodal.py, jpeg.py, gif.py). Three
containers decode REAL samples in-container with zero dependencies:
RIFF/WAVE, AIFF/AIFC (incl. 'sowt' little-endian and 80-bit
extended-float rates), and Sun/NeXT .au. Sample formats: integer PCM
(8/16/24/32-bit, any channel count, both endiannesses), G.711 A-law and
µ-law expansion (audioop-cross-validated, reported as 16-bit linear),
and IEEE float/double frames (WAV format 3, AU encodings 6/7, AIFC
fl32/fl64) normalized to 16-bit linear via one shared clamp-and-round.
WAVE_FORMAT_EXTENSIBLE (0xFFFE) parses the 22-byte extension's
KSDATAFORMAT SubFormat GUID and dispatches to the same int-PCM /
float / G.711 paths, so extensible and plain headers over identical
frames decode identically; sub-width integer PCM (wValidBitsPerSample
< container bits, the spec's left-aligned 20-in-24 layout) decodes
with the insignificant low bits zeroed, so writer garbage in the pad
bits never reaches the samples. IMA/DVI ADPCM (format 0x11) expands its
block-structured nibble stream through the spec step/index tables
(decode core cross-validated against CPython's audioop per block,
reported as 16-bit linear). MS ADPCM (format 0x02) decodes too: each
block header re-anchors BOTH history samples and selects a predictor
pair from the fmt extension's coefficient table, then the spec
recurrence (predict /256 truncating toward zero, signed-nibble × delta,
fixed adaptation table with floor 16) expands one nibble per sample,
high nibble first, channel-alternating — pinned by hand-computed spec
vectors including a negative-product truncation case. Everything out
of profile — MP3-in-RIFF, 3-bit IMA variants, unknown subformat GUIDs,
sub-width extensible FLOAT/G.711 (the spec defines no left-aligned
layout for them), non-finite float samples — refuses BY NAME; sample
values are never faked. The encoder writes canonical 44-byte-header PCM WAV and is
the test ground truth: integer PCM is lossless, so encode→decode round
trips byte-exactly.

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

__all__ = [
    "WavError",
    "wav_encode",
    "wav_encode_float",
    "wav_encode_extensible",
    "wav_encode_adpcm",
    "wav_encode_msadpcm",
    "wav_decode",
    "wav_meta",
    "aiff_decode",
    "au_decode",
    "audio_decode",
    "pcm_decimate",
    "pcm_features",
    "signal_features",
]

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


def wav_encode_float(
    sample_rate: int, channels: int, vals: list[float], *, bits: int = 32
) -> bytes:
    """Canonical IEEE-float RIFF/WAVE encode (format 3, 32- or 64-bit
    little-endian frames) — the test/query ground truth for the float
    decode path."""
    if bits not in (32, 64):
        raise WavError(f"IEEE-float WAV must be 32- or 64-bit, got {bits}")
    if channels < 1 or sample_rate < 1:
        raise WavError("channels and sample_rate must be positive")
    if len(vals) % channels:
        raise WavError("sample count not a whole number of frames")
    width = bits // 8
    kind = "f" if bits == 32 else "d"
    data = struct.pack("<%d%s" % (len(vals), kind), *vals)
    fmt = struct.pack(
        "<HHIIHH", 3, channels, sample_rate,
        sample_rate * channels * width, channels * width, bits,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# the fixed 12-byte tail of every KSDATAFORMAT_SUBTYPE_* GUID
# ({xxxxxxxx-0000-0010-8000-00aa00389b71}); Data1 carries the format tag
_KS_GUID_SUFFIX = bytes.fromhex("00001000800000aa00389b71")


def _resolve_extensible(fmt_body: bytes, bits: int) -> tuple[int, int]:
    """WAVE_FORMAT_EXTENSIBLE fmt chunk → ``(format tag, pcm_shift)``.
    Layout after the 16-byte base: cbSize(2) wValidBitsPerSample(2)
    dwChannelMask(4) SubFormat GUID(16). Integer PCM accepts
    ``valid_bits <= bits`` (left-aligned sub-width samples — the spec's
    20-in-24 layout); ``pcm_shift`` is the count of insignificant low
    bits the decode must zero in each sample (``bits - valid_bits``
    when ``0 < valid_bits < bits``, else 0 — plain full-width and the
    unspecified ``valid_bits = 0`` case mask nothing). Unknown GUIDs,
    short extensions, ``valid_bits > bits``, and sub-width FLOAT
    containers (the spec defines no left-aligned float layout) refuse
    by name — values are never faked."""
    if len(fmt_body) < 40:
        raise WavError("extensible WAV fmt chunk shorter than 40 bytes")
    (cb_size, valid_bits) = struct.unpack("<HH", fmt_body[16:20])
    if cb_size < 22:
        raise WavError(f"extensible WAV cbSize {cb_size} < 22")
    guid = fmt_body[24:40]
    if guid[4:] != _KS_GUID_SUFFIX:
        raise WavError(
            f"extensible WAV subformat GUID {guid.hex()} not a "
            "KSDATAFORMAT subtype"
        )
    sub = int.from_bytes(guid[:4], "little")
    if sub not in (1, 3, 6, 7, 0x11):
        raise WavError(
            f"extensible WAV subformat {sub} not supported pure-Python"
        )
    shift = 0
    if sub == 1:
        if valid_bits > bits:
            raise WavError(
                f"extensible WAV claims {valid_bits} valid bits in a "
                f"{bits}-bit container"
            )
        if 0 < valid_bits < bits:
            shift = bits - valid_bits
    elif sub != 0x11 and valid_bits not in (0, bits):
        # for compressed subformats (ADPCM) the union field is
        # wSamplesPerBlock, not valid bits — the block-align derivation
        # in _parse is authoritative there; float/G.711 have no
        # left-aligned sub-width layout in the spec
        raise WavError(
            f"extensible WAV with {valid_bits} valid of {bits} container "
            "bits (sub-width non-integer PCM) not supported pure-Python"
        )
    return sub, shift


def wav_encode_extensible(
    sample_rate: int, channels: int, bits: int, samples, *, sub: int = 1
) -> bytes:
    """Re-wrap canonical PCM/float WAV as WAVE_FORMAT_EXTENSIBLE (the
    40-byte fmt chunk modern multi-channel tools emit) — the test
    ground truth for the extensible decode path: identical frames must
    decode identically through both headers."""
    if sub == 1:
        base = wav_encode(sample_rate, channels, bits, samples)
    elif sub == 3:
        base = wav_encode_float(sample_rate, channels, samples, bits=bits)
    else:
        raise WavError(f"extensible encode supports sub 1/3, got {sub}")
    # canonical layout: RIFF(12) fmt(8+16) data(8+...)
    data = base[44:]
    fmt = (
        base[20:36]  # the 16-byte base fmt, format tag patched below
        + struct.pack("<HHI", 22, bits, (1 << channels) - 1)
        + sub.to_bytes(4, "little")
        + _KS_GUID_SUFFIX
    )
    fmt = struct.pack("<H", 0xFFFE) + fmt[2:]
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
    fmt_body = b""
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
            fmt_body = body
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
    shift = 0
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format tag lives in the
        # 22-byte extension's KSDATAFORMAT SubFormat GUID (Data1 =
        # format tag, fixed 12-byte suffix); dispatch to the existing
        # int-PCM / IEEE-float / G.711 paths. shift = low bits to zero
        # for left-aligned sub-width integer PCM (valid_bits < bits).
        audio_format, shift = _resolve_extensible(fmt_body, bits)
    if audio_format not in (1, 2, 3, 6, 7, 0x11):
        raise WavError(
            f"non-PCM WAV (format {audio_format}) not supported pure-Python"
        )
    if channels < 1 or sample_rate < 1:
        raise WavError("corrupt fmt chunk (zero channels or rate)")
    if audio_format == 2:
        # MS ADPCM: block-structured nibble stream; the fmt extension
        # carries wSamplesPerBlock and the predictor coefficient table
        if bits != 4:
            raise WavError(f"MS ADPCM WAV must be 4-bit, got {bits}")
        spb, coefs = _ms_adpcm_fmt(fmt_body, channels, _align)
        data = data[: len(data) - len(data) % _align]  # whole blocks only
        if (len(data) // _align) * spb * channels > _MAX_SAMPLES:
            raise WavError("audio too large for in-container decode")
        return audio_format, channels, sample_rate, bits, data, _align, fmt_body, shift
    if audio_format == 0x11:
        # IMA/DVI ADPCM: block-structured nibble stream, width logic below
        # does not apply (bits = 4)
        if bits != 4:
            raise WavError(f"IMA ADPCM WAV must be 4-bit, got {bits}")
        if _align <= 4 * channels or _align % (4 * channels):
            raise WavError(
                f"IMA ADPCM block align {_align} invalid for "
                f"{channels} channel(s) (header + 4-byte data words)"
            )
        # tolerate a trailing partial block (truncated file): drop it
        data = data[: len(data) - len(data) % _align]
        spb = (_align - 4 * channels) * 2 // channels + 1
        if (len(data) // _align) * spb * channels > _MAX_SAMPLES:
            raise WavError("audio too large for in-container decode")
        return audio_format, channels, sample_rate, bits, data, _align, fmt_body, shift
    if audio_format == 3:
        if bits not in (32, 64):
            raise WavError(f"IEEE-float WAV must be 32- or 64-bit, got {bits}")
    elif audio_format in (6, 7):
        if bits != 8:
            raise WavError(f"G.711 WAV must be 8-bit, got {bits}")
    elif bits not in (8, 16, 24, 32):
        raise WavError(f"PCM bit depth {bits} unsupported (8/16/24/32)")
    width = bits // 8
    if len(data) % (width * channels):
        # tolerate a trailing partial frame (truncated file): drop it
        data = data[: len(data) - len(data) % (width * channels)]
    if len(data) // width > _MAX_SAMPLES:
        raise WavError("audio too large for in-container decode")
    return audio_format, channels, sample_rate, bits, data, _align, fmt_body, shift


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


# IMA/DVI ADPCM (WAV format 0x11): the IMA reference step-size and index
# tables, identical to CPython audioop's — the decode core is
# cross-validated against audioop.adpcm2lin per block in test_audio.py
_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(n: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA nibble → (new predictor, new step index), the exact
    integer recurrence of the IMA ADPCM reference (and audioop)."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if n & 8 else pred + diff
    if pred > 32767:
        pred = 32767
    elif pred < -32768:
        pred = -32768
    idx += _IMA_INDEX_TABLE[n]
    if idx < 0:
        idx = 0
    elif idx > 88:
        idx = 88
    return pred, idx


def _ima_adpcm_decode(data: bytes, channels: int, align: int) -> list[int]:
    """IMA ADPCM WAV data chunk → interleaved signed 16-bit samples.
    Each ``align``-byte block carries a 4-byte header per channel
    (initial sample int16 LE + step index + reserved) — the header
    sample IS the block's first output sample — then nibble data LOW
    nibble first, interleaved across channels in 4-byte words."""
    out: list[int] = []
    spb = (align - 4 * channels) * 2 // channels + 1
    for boff in range(0, len(data), align):
        block = data[boff : boff + align]
        preds: list[int] = []
        idxs: list[int] = []
        chans: list[list[int]] = []
        for c in range(channels):
            p = int.from_bytes(block[c * 4 : c * 4 + 2], "little", signed=True)
            i = block[c * 4 + 2]
            if i > 88:
                raise WavError(f"IMA ADPCM step index {i} out of range")
            preds.append(p)
            idxs.append(i)
            chans.append([p])
        body = block[4 * channels :]
        for woff in range(0, len(body), 4 * channels):
            for c in range(channels):
                p, i = preds[c], idxs[c]
                samples = chans[c]
                for b in body[woff + c * 4 : woff + c * 4 + 4]:
                    p, i = _ima_step(b & 0x0F, p, i)
                    samples.append(p)
                    p, i = _ima_step(b >> 4, p, i)
                    samples.append(p)
                preds[c], idxs[c] = p, i
        for k in range(spb):
            for c in range(channels):
                out.append(chans[c][k])
    return out


def wav_encode_adpcm(
    sample_rate: int,
    channels: int,
    samples: list[int],
    *,
    block_align: int | None = None,
) -> bytes:
    """IMA ADPCM WAV encoder (format 0x11) — the test ground truth for
    the decode path. Interleaved signed 16-bit input; the final partial
    block pads by holding the last frame (a decoder reports the padded
    length — ADPCM is block-quantized, like every real encoder). The
    step index carries across blocks per channel (the reference encoder
    behavior); each block header re-anchors the predictor exactly, so
    decode error never accumulates across blocks."""
    if channels < 1 or sample_rate < 1:
        raise WavError("channels and sample_rate must be positive")
    if block_align is None:
        block_align = 256 * channels
    if block_align <= 4 * channels or block_align % (4 * channels):
        raise WavError(
            f"IMA ADPCM block align {block_align} invalid for "
            f"{channels} channel(s)"
        )
    if len(samples) % channels:
        raise WavError("sample count not a whole number of frames")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise WavError(f"sample {s} outside 16-bit range")
    spb = (block_align - 4 * channels) * 2 // channels + 1
    n_frames = len(samples) // channels
    frames = [
        samples[f * channels : (f + 1) * channels] for f in range(n_frames)
    ]
    idxs = [0] * channels
    blocks = bytearray()
    for boff in range(0, n_frames, spb):
        chunk = frames[boff : boff + spb]
        while len(chunk) < spb:  # hold the last frame to fill the block
            chunk.append(chunk[-1])
        header = bytearray()
        nibbles: list[list[int]] = []
        for c in range(channels):
            pred = chunk[0][c]
            header += int(pred & 0xFFFF).to_bytes(2, "little")
            header += bytes((idxs[c], 0))
            ch_nibs = []
            i = idxs[c]
            for k in range(1, spb):
                s = chunk[k][c]
                step = _IMA_STEP_TABLE[i]
                diff = s - pred
                n = 0
                if diff < 0:
                    n = 8
                    diff = -diff
                if diff >= step:
                    n |= 4
                    diff -= step
                if diff >= step >> 1:
                    n |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    n |= 1
                pred, i = _ima_step(n, pred, i)
                ch_nibs.append(n)
            if len(ch_nibs) % 2:
                ch_nibs.append(0)
            nibbles.append(ch_nibs)
            idxs[c] = i
        body = bytearray()
        per_ch_bytes = [
            bytes(
                nb[j] | (nb[j + 1] << 4) for j in range(0, len(nb), 2)
            )
            for nb in nibbles
        ]
        for woff in range(0, len(per_ch_bytes[0]), 4):
            for c in range(channels):
                body += per_ch_bytes[c][woff : woff + 4]
        blocks += header + body
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, channels, sample_rate, byte_rate, block_align, 4, 2, spb,
    )
    data = bytes(blocks)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# MS ADPCM (WAV format 0x02): the public Microsoft multimedia spec's
# fixed adaptation table and the seven standard predictor pairs (files
# carry the table in the fmt extension; the standard seven lead it).
_MS_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
]
_MS_STD_COEFS = [
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
]


def _trunc_div(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero) — the MS ADPCM
    predictor divides a possibly-negative product by 256, and floor
    division would be off by one on negative remainders."""
    return -((-a) // b) if a < 0 else a // b


def _ms_adpcm_fmt(fmt_body: bytes, channels: int, align: int):
    """MS ADPCM fmt extension → (samples_per_block, coefficient pairs).
    Layout after the 16-byte base: cbSize(2) wSamplesPerBlock(2)
    wNumCoef(2) then wNumCoef (iCoef1, iCoef2) int16 pairs. Out-of-range
    block geometry refuses by name."""
    if len(fmt_body) < 22:
        raise WavError("MS ADPCM fmt extension truncated")
    cb_size, spb, n_coef = struct.unpack("<HHH", fmt_body[16:22])
    if cb_size < 4 + 4 * n_coef or n_coef < 1:
        raise WavError(f"MS ADPCM cbSize {cb_size} / wNumCoef {n_coef} invalid")
    if len(fmt_body) < 22 + 4 * n_coef:
        raise WavError("MS ADPCM coefficient table truncated")
    coefs = [
        struct.unpack("<hh", fmt_body[22 + 4 * k : 26 + 4 * k])
        for k in range(n_coef)
    ]
    if align <= 7 * channels:
        raise WavError(
            f"MS ADPCM block align {align} too small for "
            f"{channels} channel(s) (7-byte header per channel)"
        )
    capacity = (align - 7 * channels) * 2 // channels + 2
    if not 2 <= spb <= capacity:
        raise WavError(
            f"MS ADPCM samples-per-block {spb} outside [2, {capacity}] "
            f"for block align {align}"
        )
    return spb, coefs


def _ms_adpcm_decode(
    data: bytes, channels: int, align: int, spb: int, coefs
) -> list[int]:
    """MS ADPCM data chunk → interleaved signed 16-bit samples. Each
    ``align``-byte block carries a per-channel header (bPredictor byte,
    iDelta int16, iSamp1 int16, iSamp2 int16 — each field grouped
    across channels) whose iSamp2/iSamp1 ARE the block's first two
    output samples, then one nibble per sample HIGH nibble first,
    alternating channels per nibble. The recurrence is the spec's:
    predict from the two prior samples via the block's coefficient
    pair (/256 truncating toward zero), add signed-nibble × delta,
    clamp, then adapt delta through the fixed table (floor 16)."""
    out: list[int] = []
    n_coef = len(coefs)
    for boff in range(0, len(data) - len(data) % align, align):
        block = data[boff : boff + align]
        preds = []
        for c in range(channels):
            p = block[c]
            if p >= n_coef:
                raise WavError(
                    f"MS ADPCM predictor {p} out of range (table has "
                    f"{n_coef})"
                )
            preds.append(coefs[p])
        base = channels
        deltas = [
            int.from_bytes(block[base + 2 * c : base + 2 * c + 2],
                           "little", signed=True)
            for c in range(channels)
        ]
        base += 2 * channels
        s1 = [
            int.from_bytes(block[base + 2 * c : base + 2 * c + 2],
                           "little", signed=True)
            for c in range(channels)
        ]
        base += 2 * channels
        s2 = [
            int.from_bytes(block[base + 2 * c : base + 2 * c + 2],
                           "little", signed=True)
            for c in range(channels)
        ]
        chans = [[s2[c], s1[c]] for c in range(channels)]
        body = block[7 * channels :]
        need = (spb - 2) * channels
        for k in range(need):
            b = body[k >> 1]
            n = (b >> 4) if (k & 1) == 0 else (b & 0x0F)
            c = k % channels
            c1, c2 = preds[c]
            pred = _trunc_div(chans[c][-1] * c1 + chans[c][-2] * c2, 256)
            sn = n - 16 if n >= 8 else n
            pred += sn * deltas[c]
            if pred > 32767:
                pred = 32767
            elif pred < -32768:
                pred = -32768
            chans[c].append(pred)
            d = (_MS_ADAPT[n] * deltas[c]) >> 8
            deltas[c] = 16 if d < 16 else d
        for k in range(spb):
            for c in range(channels):
                out.append(chans[c][k])
    return out


def wav_encode_msadpcm(
    sample_rate: int,
    channels: int,
    samples: list[int],
    *,
    block_align: int | None = None,
) -> bytes:
    """MS ADPCM WAV encoder (format 0x02) — the test ground truth for
    the decode path. Interleaved signed 16-bit input; the final partial
    block pads by holding the last frame (block-quantized, like every
    real encoder). Per block and channel it trial-encodes all seven
    standard predictors and keeps the least-total-error one; the block
    header re-anchors both history samples exactly, so signals the
    chosen predictor tracks exactly (constants via (256,0), linear
    ramps via (512,-256)) round-trip sample-exact."""
    if channels < 1 or sample_rate < 1:
        raise WavError("channels and sample_rate must be positive")
    if block_align is None:
        block_align = 256 * channels
    if block_align <= 7 * channels:
        raise WavError(
            f"MS ADPCM block align {block_align} invalid for "
            f"{channels} channel(s)"
        )
    if (block_align - 7 * channels) * 2 % channels:
        raise WavError(
            f"MS ADPCM block align {block_align} leaves a fractional "
            f"nibble count per channel"
        )
    if len(samples) % channels:
        raise WavError("sample count not a whole number of frames")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise WavError(f"sample {s} outside 16-bit range")
    spb = (block_align - 7 * channels) * 2 // channels + 2
    n_frames = len(samples) // channels
    frames = [
        samples[f * channels : (f + 1) * channels] for f in range(n_frames)
    ]

    def trial(ch_samples, c1, c2):
        # simulate the exact decoder recurrence; returns (error, nibbles)
        s2, s1 = ch_samples[0], ch_samples[1]
        delta = 16
        nibs = []
        err_total = 0
        for target in ch_samples[2:]:
            pred = _trunc_div(s1 * c1 + s2 * c2, 256)
            sn = _trunc_div(target - pred, delta)
            if sn > 7:
                sn = 7
            elif sn < -8:
                sn = -8
            n = sn + 16 if sn < 0 else sn
            rec = pred + sn * delta
            if rec > 32767:
                rec = 32767
            elif rec < -32768:
                rec = -32768
            err_total += abs(rec - target)
            s2, s1 = s1, rec
            nibs.append(n)
            d = (_MS_ADAPT[n] * delta) >> 8
            delta = 16 if d < 16 else d
        return err_total, nibs

    blocks = bytearray()
    for boff in range(0, n_frames, spb):
        chunk = frames[boff : boff + spb]
        while len(chunk) < spb:  # hold the last frame to fill the block
            chunk.append(chunk[-1] if chunk else [0] * channels)
        best_pred = []
        best_nibs = []
        for c in range(channels):
            ch = [fr[c] for fr in chunk]
            best = None
            for pi, (c1, c2) in enumerate(_MS_STD_COEFS):
                err, nibs = trial(ch, c1, c2)
                if best is None or err < best[0]:
                    best = (err, pi, nibs)
            best_pred.append(best[1])
            best_nibs.append(best[2])
        header = bytearray(bytes(best_pred))
        for c in range(channels):
            header += (16).to_bytes(2, "little")  # iDelta, fixed trial seed
        for c in range(channels):
            header += int(chunk[1][c] & 0xFFFF).to_bytes(2, "little")
        for c in range(channels):
            header += int(chunk[0][c] & 0xFFFF).to_bytes(2, "little")
        # nibble stream: sample-major, channel-minor, high nibble first
        body = bytearray()
        acc = 0
        nbits = 0
        for k in range((spb - 2) * channels):
            n = best_nibs[k % channels][k // channels]
            acc = (acc << 4) | n
            nbits += 4
            if nbits == 8:
                body.append(acc)
                acc = 0
                nbits = 0
        if nbits:
            body.append(acc << 4)
        blocks += header + body
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH",
        2, channels, sample_rate, byte_rate, block_align, 4, 32, spb,
    ) + struct.pack("<H", len(_MS_STD_COEFS)) + b"".join(
        struct.pack("<hh", a, b) for a, b in _MS_STD_COEFS
    )
    data = bytes(blocks)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _float_to_i16(data: bytes, bits: int, byteorder: str) -> list[int]:
    """IEEE float frames → signed 16-bit linear samples, the shared
    normalization for float WAV (LE), float AU (BE), and AIFC fl32/fl64
    (BE): clamp to [-1, 1], scale by 32767, round half away from zero.
    Like G.711, the float is a storage format — bits reports 16.
    Non-finite samples refuse by name (values are never faked)."""
    width = bits // 8
    count = len(data) // width
    if count > _MAX_SAMPLES:
        raise WavError("audio too large for in-container decode")
    kind = "f" if bits == 32 else "d"
    vals = struct.unpack(
        ("<" if byteorder == "little" else ">") + str(count) + kind,
        data[: count * width],
    )
    out = []
    for f in vals:
        if not math.isfinite(f):
            raise WavError("non-finite float sample (NaN/Inf)")
        if f > 1.0:
            f = 1.0
        elif f < -1.0:
            f = -1.0
        mag = math.floor(abs(f) * 32767 + 0.5)
        out.append(mag if f >= 0 else -mag)
    return out


def wav_meta(payload: bytes) -> tuple[int, int, int, int, int]:
    """(sample_rate, channels, bits, n_frames, duration_ms) from the
    container — header-level, but the data chunk's framing is validated.
    ``bits`` is the STORED width (8 for G.711 streams, 4 for IMA
    ADPCM)."""
    fmt, channels, sample_rate, bits, data, align, fmt_body, shift = _parse(payload)
    if fmt == 0x11:
        spb = (align - 4 * channels) * 2 // channels + 1
        n_frames = (len(data) // align) * spb
    elif fmt == 2:
        spb, _coefs = _ms_adpcm_fmt(fmt_body, channels, align)
        n_frames = (len(data) // align) * spb
    else:
        n_frames = len(data) // (channels * bits // 8)
    return sample_rate, channels, bits, n_frames, n_frames * 1000 // sample_rate


def wav_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, channels, bits, samples) — interleaved ints, signed
    for ≥16-bit, unsigned for 8-bit (the WAV convention, preserved so
    encode(decode(x)) is byte-exact for linear PCM). G.711 A-law/µ-law
    streams EXPAND to signed linear samples and report bits=16 — the
    companded byte is a storage format, not a sample value. IEEE-float
    streams (format 3, 32/64-bit) likewise normalize to 16-bit linear
    via clamp-and-round (see _float_to_i16). IMA ADPCM blocks (format
    0x11) expand through the spec's step/index tables and report
    bits=16 as well; MS ADPCM blocks (format 0x02) expand through the
    coefficient-predictor recurrence, same report."""
    fmt, channels, sample_rate, bits, data, align, fmt_body, shift = _parse(payload)
    if fmt == 0x11:
        return (
            sample_rate, channels, 16,
            _ima_adpcm_decode(data, channels, align),
        )
    if fmt == 2:
        spb, coefs = _ms_adpcm_fmt(fmt_body, channels, align)
        return (
            sample_rate, channels, 16,
            _ms_adpcm_decode(data, channels, align, spb, coefs),
        )
    if fmt == 3:
        return sample_rate, channels, 16, _float_to_i16(data, bits, "little")
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
    if shift:
        # extensible sub-width integer PCM (valid_bits < container
        # bits): the valid bits are LEFT-aligned and the spec says the
        # low bits are insignificant — zero them so a writer that left
        # garbage there decodes identically to one that zeroed them
        # (works on two's-complement for signed and on unsigned 8-bit)
        mask = ~((1 << shift) - 1)
        samples = [v & mask for v in samples]
    return sample_rate, channels, bits, samples


def _f80_to_int(raw: bytes) -> int:
    """80-bit IEEE extended float (AIFF's sampleRate field) → nearest int.
    Layout: 1 sign + 15 exponent (bias 16383) + 64 mantissa with explicit
    integer bit."""
    if len(raw) != 10:
        raise WavError("extended float must be 10 bytes")
    sign = raw[0] >> 7
    exponent = ((raw[0] & 0x7F) << 8) | raw[1]
    mantissa = int.from_bytes(raw[2:10], "big")
    if exponent == 0 and mantissa == 0:
        return 0
    if exponent == 0x7FFF:
        raise WavError("non-finite AIFF sample rate")
    # value = mantissa * 2^(exponent - 16383 - 63)
    shift = exponent - 16383 - 63
    val = mantissa << shift if shift >= 0 else (mantissa + (1 << (-shift - 1))) >> -shift
    return -val if sign else val


def _be_pcm(data: bytes, bits: int) -> list[int]:
    """Big-endian SIGNED PCM (the AIFF/AU convention at every depth,
    including 8-bit — unlike WAV's unsigned 8-bit)."""
    width = bits // 8
    half = 1 << (bits - 1)
    full = 1 << bits
    out = []
    for i in range(0, len(data) - len(data) % width, width):
        v = int.from_bytes(data[i : i + width], "big")
        out.append(v - full if v >= half else v)
    return out


def aiff_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """AIFF / AIFC (IFF 'FORM') decode → (sample_rate, channels, bits,
    signed interleaved samples). AIFC compression types 'NONE' (BE PCM),
    'sowt' (LE PCM), G.711 'alaw'/'ulaw', and IEEE 'fl32'/'fl64'
    (normalized to 16-bit linear) decode; others refuse by name."""
    if len(payload) < 12 or payload[:4] != b"FORM":
        raise WavError("not an AIFF payload (missing FORM)")
    form_type = payload[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise WavError(f"FORM type {form_type!r} is not AIFF/AIFC")
    pos = 12
    n = len(payload)
    channels = bits = rate = nframes = None
    comp = b"NONE"
    data = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        body_end = pos + 8 + size
        if body_end > n:
            raise WavError(f"AIFF chunk {tag!r} overruns payload")
        body = payload[pos + 8 : body_end]
        if tag == b"COMM":
            if len(body) < 18:
                raise WavError("COMM chunk too short")
            channels, nframes, bits = struct.unpack(">hIh", body[:8])
            rate = _f80_to_int(body[8:18])
            if form_type == b"AIFC" and len(body) >= 22:
                comp = body[18:22]
        elif tag == b"SSND":
            if len(body) < 8:
                raise WavError("SSND chunk too short")
            offset, _blk = struct.unpack(">II", body[:8])
            data = body[8 + offset :]
        pos = body_end + (size & 1)  # chunks are word-aligned
    if channels is None or data is None:
        raise WavError("AIFF missing COMM or SSND chunk")
    if channels < 1 or rate < 1:
        raise WavError("corrupt COMM chunk")
    if comp in (b"NONE", b"sowt"):
        if bits not in (8, 16, 24, 32):
            raise WavError(f"AIFF PCM bit depth {bits} unsupported")
        if len(data) // (bits // 8) > _MAX_SAMPLES:
            raise WavError("audio too large for in-container decode")
        if comp == b"sowt":  # little-endian PCM (Mac convention)
            width = bits // 8
            half, full = 1 << (bits - 1), 1 << bits
            samples = []
            for i in range(0, len(data) - len(data) % width, width):
                v = int.from_bytes(data[i : i + width], "little")
                samples.append(v - full if v >= half else v)
        else:
            samples = _be_pcm(data, bits)
        return rate, channels, bits, samples
    if comp in (b"alaw", b"ALAW", b"ulaw", b"ULAW"):
        table = _ALAW_TABLE if comp.lower() == b"alaw" else _ULAW_TABLE
        if len(data) > _MAX_SAMPLES:
            raise WavError("audio too large for in-container decode")
        return rate, channels, 16, [table[b] for b in data]
    if comp in (b"fl32", b"FL32", b"fl64", b"FL64"):
        fbits = 32 if comp.lower() == b"fl32" else 64
        return rate, channels, 16, _float_to_i16(data, fbits, "big")
    raise WavError(
        f"AIFC compression {comp!r} not supported pure-Python "
        "(NONE/sowt/alaw/ulaw/fl32/fl64 only)"
    )


_AU_ENCODINGS = {1: ("ulaw", 8), 2: ("pcm", 8), 3: ("pcm", 16),
                 4: ("pcm", 24), 5: ("pcm", 32), 27: ("alaw", 8),
                 6: ("float", 32), 7: ("float", 64)}


def au_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Sun/NeXT .au decode → (sample_rate, channels, bits, signed
    samples). Encodings: µ-law (1), A-law (27), linear PCM 8/16/24/32
    (2-5), IEEE float/double (6/7, normalized to 16-bit linear); ADPCM
    refuses by name."""
    if len(payload) < 24 or payload[:4] != b".snd":
        raise WavError("not an AU payload (missing .snd)")
    offset, size, encoding, rate, channels = struct.unpack(
        ">IIIII", payload[4:24]
    )
    if offset < 24 or offset > len(payload):
        raise WavError("AU data offset out of range")
    if channels < 1 or rate < 1:
        raise WavError("corrupt AU header")
    end = len(payload) if size == 0xFFFFFFFF else min(len(payload), offset + size)
    data = payload[offset:end]
    if encoding not in _AU_ENCODINGS:
        name = {23: "G.721 ADPCM"}.get(encoding, f"encoding {encoding}")
        raise WavError(f"AU {name} not supported pure-Python")
    kind, bits = _AU_ENCODINGS[encoding]
    if len(data) // max(1, bits // 8) > _MAX_SAMPLES:
        raise WavError("audio too large for in-container decode")
    if kind == "ulaw":
        return rate, channels, 16, [_ULAW_TABLE[b] for b in data]
    if kind == "alaw":
        return rate, channels, 16, [_ALAW_TABLE[b] for b in data]
    if kind == "float":
        return rate, channels, 16, _float_to_i16(data, bits, "big")
    return rate, channels, bits, _be_pcm(data, bits)


def audio_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Container-dispatching decode: RIFF/WAVE, AIFF/AIFC, or Sun .au by
    magic → the shared (rate, channels, bits, samples) contract."""
    if payload[:4] == b"RIFF":
        return wav_decode(payload)
    if payload[:4] == b"FORM":
        return aiff_decode(payload)
    if payload[:4] == b".snd":
        return au_decode(payload)
    raise WavError("unrecognized audio container (RIFF/FORM/.snd)")


def pcm_decimate(samples: list[int], k: int) -> list[int]:
    """Integer boxcar decimation by ``k``: each output sample is the
    floor mean of ``k`` consecutive inputs (single channel). The
    anti-alias prefilter + downsample pair of a 48k→16k/16k→8k resample
    chain, kept integer-exact (floor division) so results are
    bit-identical in any engine; a trailing partial window is dropped
    whole, mirroring the codecs' torn-frame rule."""
    if k < 1:
        raise WavError("decimation factor must be >= 1")
    n = len(samples) - len(samples) % k
    return [sum(samples[i : i + k]) // k for i in range(0, n, k)]


def energy_fingerprint(samples: list[int], n_windows: int) -> int:
    """Acoustic fingerprint: split the signal into ``n_windows`` equal
    windows, compute each window's integer energy (sum of squares), and
    emit one bit per consecutive pair (later window louder). The
    Shazam-style energy-delta sketch reduced to its integer-exact core:
    gain changes scale every energy by the same square, so the
    fingerprint is invariant under amplification — the property that
    makes it a dedup/match key across re-levelled copies. Trailing
    samples beyond the last full window are dropped whole."""
    if n_windows < 2:
        raise WavError("fingerprint needs at least 2 windows")
    wlen = len(samples) // n_windows
    if wlen == 0:
        raise WavError("signal shorter than the window count")
    energies = [
        sum(s * s for s in samples[i * wlen : (i + 1) * wlen])
        for i in range(n_windows)
    ]
    bits = 0
    for a, b in zip(energies, energies[1:]):
        bits = (bits << 1) | (1 if b > a else 0)
    return bits


def pcm_features(payload: bytes) -> dict[str, int]:
    """Integer-exact signal features of the FIRST channel:

    - ``n_frames``, ``duration_ms`` (floor),
    - ``peak``: max |sample| (WAV 8-bit values are re-centered by -128
      first — AIFF/AU 8-bit is already signed),
    - ``rms_milli``: isqrt(sum(s²) * 1_000_000 // n) — RMS in integer
      milli-units, exact for any engine that has isqrt,
    - ``zero_crossings``: sign flips between consecutive frames (zero
      samples carry the previous sign, the standard convention).
    """
    is_wav = payload[:4] == b"RIFF"
    sample_rate, channels, bits, samples = audio_decode(payload)
    first = samples[::channels]
    if bits == 8 and is_wav:
        first = [s - 128 for s in first]
    return signal_features(first, sample_rate)


def signal_features(first: list[int], sample_rate: int) -> dict[str, int]:
    """The feature computation of :func:`pcm_features` over an already-
    decoded single-channel signal (e.g. after :func:`pcm_decimate`)."""
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
