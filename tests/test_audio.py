"""Pure-Python WAV/PCM codec + integer signal features (inventory/audio.py).

Ground truth: integer PCM is lossless — encode→decode round trips
value-exactly at every supported depth — and square/constant signals
have closed-form features. Foreign-encoder files (CPython's audiodata
fixtures at 8/16/24/32-bit) pin the parser against real-world layouts;
truncation/bitflip fuzz pins the never-hang contract.
"""

from __future__ import annotations

import glob
import struct

import pytest
from hypothesis import given, settings, strategies as st

from bravo_spark.inventory import audio as A


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_roundtrip_value_exact_all_depths(bits):
    lo = 0 if bits == 8 else -(1 << (bits - 1))
    hi = 255 if bits == 8 else (1 << (bits - 1)) - 1
    samples = [lo, hi, 0 if bits != 8 else 128] * 10 + [
        (i * 7919) % (hi - lo + 1) + lo for i in range(40)
    ]
    payload = A.wav_encode(11025, 1, bits, samples)
    sr, ch, got_bits, got = A.wav_decode(payload)
    assert (sr, ch, got_bits) == (11025, 1, bits)
    assert got == samples


def test_encode_decode_byte_fixpoint():
    samples = [((i * 37) % 2000) - 1000 for i in range(600)]
    p1 = A.wav_encode(8000, 2, 16, samples)
    sr, ch, bits, got = A.wav_decode(p1)
    assert A.wav_encode(sr, ch, bits, got) == p1


def test_square_wave_features_closed_form():
    amp, period, n = 1000, 25, 400
    wave = [amp if (i // period) % 2 == 0 else -amp for i in range(n)]
    f = A.pcm_features(A.wav_encode(8000, 1, 16, wave))
    assert f == {
        "n_frames": n,
        "duration_ms": n * 1000 // 8000,
        "peak": amp,
        "rms_milli": amp * 1000,  # square wave: RMS == amplitude, exactly
        "zero_crossings": (n - 1) // period,
    }


def test_zero_samples_carry_previous_sign():
    # +1, 0, -1: one crossing (the zero inherits +), then -1 → +1: two
    wave = [1, 0, -1, 1]
    f = A.pcm_features(A.wav_encode(8000, 1, 16, wave))
    assert f["zero_crossings"] == 2


def test_first_channel_only_features():
    # channel 0 constant, channel 1 alternating: features see channel 0
    inter = []
    for i in range(100):
        inter += [500, 500 if i % 2 == 0 else -500]
    f = A.pcm_features(A.wav_encode(8000, 2, 16, inter))
    assert f["peak"] == 500 and f["zero_crossings"] == 0
    assert f["rms_milli"] == 500 * 1000


def test_eight_bit_recentering():
    # 8-bit WAV is unsigned; features re-center by -128
    f = A.pcm_features(A.wav_encode(8000, 1, 8, [128] * 50))
    assert f["peak"] == 0 and f["rms_milli"] == 0
    f = A.pcm_features(A.wav_encode(8000, 1, 8, [228] * 50))
    assert f["peak"] == 100


def test_out_of_profile_refusals_name_the_codec():
    base = bytearray(A.wav_encode(8000, 1, 16, [0] * 10))
    fmt_at = base.find(b"fmt ") + 8
    mut = bytearray(base)
    struct.pack_into("<H", mut, fmt_at, 0xFFFE)
    with pytest.raises(A.WavError, match="extensible"):
        A.wav_decode(bytes(mut))
    # float WAV decodes since r10 — but only at its spec widths
    mut = bytearray(base)
    struct.pack_into("<H", mut, fmt_at, 3)  # IEEE float claiming 16-bit
    with pytest.raises(A.WavError, match="IEEE-float"):
        A.wav_decode(bytes(mut))
    # G.711 decodes since r8 — but only at its spec width
    mut = bytearray(base)
    struct.pack_into("<H", mut, fmt_at, 7)  # mu-law with 16-bit: invalid
    with pytest.raises(A.WavError, match="8-bit"):
        A.wav_decode(bytes(mut))
    with pytest.raises(A.WavError, match="RIFF"):
        A.wav_decode(b"OggS" + bytes(40))


def test_forged_size_bomb_refused():
    """A data chunk whose size field claims gigabytes must refuse on the
    framing check, not allocate."""
    base = bytearray(A.wav_encode(8000, 1, 16, [0] * 10))
    data_at = base.find(b"data")
    struct.pack_into("<I", base, data_at + 4, 2_000_000_000)
    with pytest.raises(A.WavError, match="overruns"):
        A.wav_decode(bytes(base))


def test_trailing_partial_frame_tolerated():
    payload = A.wav_encode(8000, 2, 16, [1, 2, 3, 4]) + b""
    # chop one byte off the data chunk and fix the size fields
    raw = bytearray(payload)
    raw[-1:] = b""
    struct.pack_into("<I", raw, 4, len(raw) - 8)
    data_at = bytes(raw).find(b"data")
    struct.pack_into("<I", raw, data_at + 4, len(raw) - data_at - 8)
    sr, ch, bits, samples = A.wav_decode(bytes(raw))
    assert samples == [1, 2]  # the torn frame is dropped whole


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 120),
    flip_pos=st.integers(0, 119),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    good = A.wav_encode(8000, 1, 16, [((i * 31) % 400) - 200 for i in range(50)])
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(4, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 5:
        p = 4 + flip_pos % (len(data) - 4)
        data[p] ^= flip_val
    try:
        sr, ch, bits, samples = A.wav_decode(bytes(data))
        assert sr >= 1 and ch >= 1 and bits in (8, 16, 24, 32)
    except (A.WavError, ValueError):
        pass


_REAL_WAVS = sorted(
    glob.glob(
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "test/audiodata/pluck-pcm*.wav"
    )
)


@pytest.mark.skipif(not _REAL_WAVS, reason="no foreign-encoder WAVs on disk")
def test_foreign_encoder_files_parse_and_roundtrip():
    """CPython's audio fixtures (one source signal at 8/16/24/32-bit)
    parse to consistent meta, and re-encoding the decoded samples
    reproduces a stream our decoder reads back identically."""
    assert len(_REAL_WAVS) >= 3
    metas = []
    for path in _REAL_WAVS:
        payload = open(path, "rb").read()
        sr, ch, bits, n, ms = A.wav_meta(payload)
        metas.append((sr, ch, n, ms))
        sr2, ch2, bits2, samples = A.wav_decode(payload)
        re = A.wav_encode(sr2, ch2, bits2, samples)
        assert A.wav_decode(re)[3] == samples
    assert len(set(metas)) == 1  # same recording at every depth

def _g711_wav(fmt_code: int, data: bytes, rate: int = 8000) -> bytes:
    hdr = struct.pack("<HHIIHH", fmt_code, 1, rate, rate, 1, 8)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(hdr) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(hdr)) + hdr
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_g711_golden_values():
    """Spec-derived expansion pins (ITU G.711 / the public-domain g711.c
    formulas): extreme and mid-scale bytes for both laws."""
    # 16-bit-linear scale (audioop width-2 convention): mu-law full
    # scale is +/-32124, the two zero codes decode to exactly 0
    assert A._ULAW_TABLE[0x00] == -32124
    assert A._ULAW_TABLE[0x80] == 32124
    assert A._ULAW_TABLE[0xFF] == 0
    assert A._ULAW_TABLE[0x7F] == 0
    # A-law full scale is +/-32256 at codes 0x2A/0xAA
    assert A._ALAW_TABLE[0x2A] == -32256
    assert A._ALAW_TABLE[0xAA] == 32256
    # both laws are odd-symmetric about the sign bit
    for i in range(128):
        assert A._ALAW_TABLE[i] == -A._ALAW_TABLE[i | 0x80]
        assert A._ULAW_TABLE[i] == -A._ULAW_TABLE[i | 0x80]


def test_g711_decodes_to_linear():
    data = bytes(range(0, 250, 5))
    for code, table in ((6, A._ALAW_TABLE), (7, A._ULAW_TABLE)):
        sr, ch, bits, got = A.wav_decode(_g711_wav(code, data))
        assert (sr, ch, bits) == (8000, 1, 16)  # expanded to linear
        assert got == [table[b] for b in data]
    # meta reports the STORED width
    assert A.wav_meta(_g711_wav(7, data))[2] == 8


def test_g711_cross_validated_against_audioop():
    """Full 256-value cross-check of both expansion tables against
    CPython's audioop (removed in 3.13 — skip where absent)."""
    audioop = pytest.importorskip("audioop")
    for i in range(256):
        assert A._ULAW_TABLE[i] == struct.unpack(
            "<h", audioop.ulaw2lin(bytes([i]), 2)
        )[0], f"ulaw byte {i}"
        assert A._ALAW_TABLE[i] == struct.unpack(
            "<h", audioop.alaw2lin(bytes([i]), 2)
        )[0], f"alaw byte {i}"


def test_g711_features_run():
    """The DSP feature path works on expanded G.711 samples (no 8-bit
    recentering — the expansion already yields signed linear)."""
    data = bytes([0x00, 0x80] * 50)  # full-scale mu-law alternation
    f = A.pcm_features(_g711_wav(7, data))
    assert f["peak"] == 32124 and f["zero_crossings"] == 99
    assert f["rms_milli"] == 32124 * 1000


def test_extended_float_parse():
    # hand vectors: 11025 = 0x400C AC44...0, 44100, 1, 0
    assert A._f80_to_int(bytes.fromhex("400CAC44000000000000")) == 11025
    assert A._f80_to_int(bytes.fromhex("400EAC44000000000000")) == 44100
    assert A._f80_to_int(bytes.fromhex("3FFF8000000000000000")) == 1
    assert A._f80_to_int(bytes(10)) == 0
    with pytest.raises(A.WavError, match="non-finite"):
        A._f80_to_int(bytes.fromhex("7FFF8000000000000000"))


_AUDIODATA = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/audiodata/"
)


@pytest.mark.skipif(
    not glob.glob(_AUDIODATA + "pluck-pcm16.*"), reason="no audio fixtures"
)
def test_cross_container_same_recording():
    """CPython ships ONE recording as WAV, AIFF, and AU — three container
    formats, three endiannesses, independently converted. All three must
    decode to the same frame count/rate/width and near-identical samples
    (the conversions carry ±11 LSB of dither), and the G.711-companded
    AIFC/AU variants must expand to the same signal within one companding
    quantization step. The strongest possible foreign validation: four
    parsers agreeing on the same ground truth."""
    wav = A.wav_decode(open(_AUDIODATA + "pluck-pcm16.wav", "rb").read())
    aif = A.aiff_decode(open(_AUDIODATA + "pluck-pcm16.aiff", "rb").read())
    au = A.au_decode(open(_AUDIODATA + "pluck-pcm16.au", "rb").read())
    assert wav[:3] == aif[:3] == au[:3] == (11025, 2, 16)
    assert len(wav[3]) == len(aif[3]) == len(au[3])
    assert max(abs(a - b) for a, b in zip(wav[3], aif[3])) <= 16
    assert max(abs(a - b) for a, b in zip(wav[3], au[3])) <= 16
    # companded variants: same signal within the G.711 step size
    alaw = A.aiff_decode(open(_AUDIODATA + "pluck-alaw.aifc", "rb").read())
    ulaw = A.au_decode(open(_AUDIODATA + "pluck-ulaw.au", "rb").read())
    assert alaw[:3] == ulaw[:3] == (11025, 2, 16)
    assert max(abs(a - b) for a, b in zip(wav[3], alaw[3])) <= 1024
    assert max(abs(a - b) for a, b in zip(wav[3], ulaw[3])) <= 1024


@pytest.mark.skipif(
    not glob.glob(_AUDIODATA + "pluck-pcm8.aiff"), reason="no audio fixtures"
)
def test_aiff_every_depth_consistent():
    metas = []
    for bits in (8, 16, 24, 32):
        r = A.aiff_decode(open(_AUDIODATA + f"pluck-pcm{bits}.aiff", "rb").read())
        metas.append((r[0], r[1], len(r[3])))
        assert r[2] == bits
    assert len(set(metas)) == 1


def test_audio_decode_dispatches_by_magic():
    pcm = A.wav_encode(8000, 1, 16, [5, -5] * 10)
    assert A.audio_decode(pcm)[3] == [5, -5] * 10
    with pytest.raises(A.WavError, match="unrecognized audio container"):
        A.audio_decode(b"OggS" + bytes(40))


def test_au_refusals_and_hand_built():
    # hand-built AU: .snd header, 16-bit BE PCM
    data = struct.pack(">hh", 1000, -1000) * 5
    payload = b".snd" + struct.pack(">IIIII", 24, len(data), 3, 8000, 1) + data
    rate, ch, bits, samples = A.au_decode(payload)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert samples == [1000, -1000] * 5
    # ADPCM refuses by name (float decodes since r10)
    bad = b".snd" + struct.pack(">IIIII", 24, 4, 23, 8000, 1) + bytes(4)
    with pytest.raises(A.WavError, match="ADPCM"):
        A.au_decode(bad)


def test_aiff_sowt_little_endian_variant():
    # hand-built AIFC with 'sowt' (little-endian) PCM
    comm = struct.pack(">hIh", 1, 3, 16) + bytes.fromhex("400CAC44000000000000")
    comm += b"sowt" + b"\x00"  # comp type + empty pstring name
    ssnd = struct.pack(">II", 0, 0) + struct.pack("<hhh", 100, -200, 300)
    def chunk(tag, body):
        return tag + struct.pack(">I", len(body)) + body + (b"\x00" * (len(body) & 1))
    payload = b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd) + 2) + b"AIFC"
    payload += chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    rate, ch, bits, samples = A.aiff_decode(payload)
    assert (rate, ch, bits) == (11025, 1, 16)
    assert samples == [100, -200, 300]


@settings(max_examples=50, deadline=None)
@given(
    container=st.sampled_from(["aiff", "au"]),
    cut=st.integers(0, 80),
    flip_pos=st.integers(0, 79),
    flip_val=st.integers(1, 255),
)
def test_aiff_au_malformed_fail_cleanly(container, cut, flip_pos, flip_val):
    if container == "au":
        data = struct.pack(">h", 123) * 30
        good = b".snd" + struct.pack(">IIIII", 24, len(data), 3, 8000, 1) + data
    else:
        comm = struct.pack(">hIh", 1, 30, 16) + bytes.fromhex("400CAC44000000000000")
        ssnd = struct.pack(">II", 0, 0) + struct.pack(">h", 123) * 30
        good = (
            b"FORM" + struct.pack(">I", 4 + 16 + 26 + 8 + len(ssnd)) + b"AIFF"
            + b"COMM" + struct.pack(">I", 18) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        )
    data_ = bytearray(good)
    data_ = data_[: max(4, len(data_) - cut % len(data_))]
    if len(data_) > 5:
        p = 4 + flip_pos % (len(data_) - 4)
        data_[p] ^= flip_val
    try:
        rate, ch, bits, samples = A.audio_decode(bytes(data_))
        assert rate >= 1 and ch >= 1
    except (A.WavError, ValueError):
        pass


def _float_wav(vals, bits=32, rate=8000, channels=1) -> bytes:
    kind = "f" if bits == 32 else "d"
    data = struct.pack("<%d%s" % (len(vals), kind), *vals)
    hdr = struct.pack(
        "<HHIIHH", 3, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(hdr) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(hdr)) + hdr
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_float_wav_golden_values():
    """IEEE-float WAV (format 3) normalizes to 16-bit linear: clamp to
    [-1, 1], scale by 32767, round half away from zero. Golden vector
    cross-checked against CPython floats."""
    vals = [0.0, 1.0, -1.0, 0.5, -0.5, 2.5, -7.0, 1.0 / 3.0]
    expect = [0, 32767, -32767, 16384, -16384, 32767, -32767,
              round(32767 / 3)]
    rate, ch, bits, samples = A.wav_decode(_float_wav(vals))
    assert (rate, ch, bits) == (8000, 1, 16)
    assert samples == expect
    # 64-bit double path hits the same values exactly for these inputs
    assert A.wav_decode(_float_wav(vals, bits=64))[3] == expect


def test_float_rounding_is_half_away_from_zero():
    # 0.5/32767 scales to exactly 0.5 in magnitude -> rounds to 1, not 0
    eps = 0.5 / 32767
    _, _, _, s = A.wav_decode(_float_wav([eps, -eps], bits=64))
    assert s == [1, -1]


def test_float_nonfinite_refuses_by_name():
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(A.WavError, match="non-finite"):
            A.wav_decode(_float_wav([0.0, bad]))


def test_float_cross_container_agreement():
    """The same float recording stored as WAV (LE), AU encoding 6 (BE
    f32), AU encoding 7 (BE f64), and AIFC fl32/fl64 must decode to the
    same 16-bit linear samples through the one shared normalizer."""
    vals = [0.25, -0.75, 0.001, -0.001, 0.9999, -0.123456]
    want = A.wav_decode(_float_wav(vals))[3]

    au32 = b".snd" + struct.pack(
        ">IIIII", 24, 4 * len(vals), 6, 8000, 1
    ) + struct.pack(">%df" % len(vals), *vals)
    au64 = b".snd" + struct.pack(
        ">IIIII", 24, 8 * len(vals), 7, 8000, 1
    ) + struct.pack(">%dd" % len(vals), *vals)
    assert A.au_decode(au32)[3] == want
    assert A.au_decode(au64)[3] == want

    for comp, kind, width in ((b"fl32", "f", 4), (b"fl64", "d", 8)):
        comm = struct.pack(">hIh", 1, len(vals), width * 8)
        comm += bytes.fromhex("400BFA00000000000000")  # 8000 Hz as f80
        comm += comp + b"\x00"
        ssnd = struct.pack(">II", 0, 0) + struct.pack(
            ">%d%s" % (len(vals), kind), *vals
        )
        body = (
            b"AIFC"
            + b"COMM" + struct.pack(">I", len(comm)) + comm + (b"\x00" * (len(comm) & 1))
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        )
        payload = b"FORM" + struct.pack(">I", len(body)) + body
        got = A.aiff_decode(payload)
        assert got[0] == 8000 and got[2] == 16
        assert got[3] == want, comp


def test_float_wav_features_run():
    feats = A.pcm_features(_float_wav([0.5, -0.5] * 20))
    assert feats["n_frames"] == 40
    assert feats["peak"] == 16384
    assert feats["zero_crossings"] == 39


def test_wav_encode_float_is_canonical():
    """wav_encode_float writes the same bytes as the hand-built format-3
    container and round-trips through wav_decode; 64-bit double variant
    included."""
    vals = [0.25, -0.125, 0.75, -0.5]
    assert A.wav_encode_float(8000, 1, vals) == _float_wav(vals)
    assert A.wav_encode_float(8000, 1, vals, bits=64) == _float_wav(vals, bits=64)
    sr, ch, bits, samples = A.wav_decode(A.wav_encode_float(11025, 2, vals))
    assert (sr, ch, bits) == (11025, 2, 16)
    assert samples == [8192, -4096, 24575, -16384]
    with pytest.raises(A.WavError, match="32- or 64-bit"):
        A.wav_encode_float(8000, 1, vals, bits=16)
    with pytest.raises(A.WavError, match="whole number of frames"):
        A.wav_encode_float(8000, 3, vals)


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 80),
    flip_pos=st.integers(0, 79),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_float_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    """The float-WAV path honors the same never-hang contract as integer
    PCM: truncations and bitflips either decode to a plausible frame or
    raise WavError — never a raw struct.error, never a hang. A flipped
    exponent byte can surface NaN/Inf, which must refuse by name."""
    good = A.wav_encode_float(8000, 1, [((i * 13) % 200 - 100) / 128.0
                                        for i in range(30)])
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(4, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 5:
        p = 4 + flip_pos % (len(data) - 4)
        data[p] ^= flip_val
    try:
        sr, ch, bits, samples = A.wav_decode(bytes(data))
        assert sr >= 1 and ch >= 1 and bits in (8, 16, 24, 32)
        assert all(-32767 <= s <= 32767 for s in samples) or bits != 16
    except (A.WavError, ValueError):
        pass


def test_pcm_decimate_golden():
    """Boxcar decimation: floor mean per window, trailing partial window
    dropped whole, negatives floor toward -inf only when unaligned
    (plateau-aligned windows are exact)."""
    assert A.pcm_decimate([1, 2, 3, 4, 5, 6], 2) == [1, 3, 5]
    assert A.pcm_decimate([10, 10, -10, -10], 2) == [10, -10]
    assert A.pcm_decimate([1, 2, 3, 4, 5], 2) == [1, 3]  # torn window
    assert A.pcm_decimate([-1, -2], 2) == [-2]  # floor: (-3)//2 = -2
    assert A.pcm_decimate([7, 8, 9], 1) == [7, 8, 9]
    with pytest.raises(A.WavError, match=">= 1"):
        A.pcm_decimate([1], 0)


def test_decimated_square_wave_is_square():
    amp, period, n, k = 500, 15, 150, 5
    wave = [amp if (i // period) % 2 == 0 else -amp for i in range(n)]
    dec = A.pcm_decimate(wave, k)
    want = [amp if (i // (period // k)) % 2 == 0 else -amp
            for i in range(n // k)]
    assert dec == want
    f = A.signal_features(dec, 1600)
    assert f["peak"] == amp and f["rms_milli"] == amp * 1000
    assert f["zero_crossings"] == (n // k - 1) // (period // k)


_SNDHDR_DIR = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/sndhdrdata"
)
_SNDHDR = glob.glob(_SNDHDR_DIR + "/sndhdr.*")


@pytest.mark.skipif(not _SNDHDR, reason="no sndhdr fixtures on disk")
def test_second_foreign_cross_container_family():
    """CPython's sndhdr fixtures are a SECOND independent recording
    shipped as WAV+AIFF+AIFC+AU (44.1 kHz stereo this time — different
    rate/channel shape from the pluck set): all four parsers must agree
    on the same ground truth, and the exotic containers (8SVX, HCOM,
    SNDT, VOC) must refuse cleanly, 8SVX naming its FORM type."""
    decoded = {}
    for ext in ("wav", "aiff", "aifc", "au"):
        payload = open(f"{_SNDHDR_DIR}/sndhdr.{ext}", "rb").read()
        decoded[ext] = A.audio_decode(payload)
    assert len({d[:3] for d in decoded.values()}) == 1  # rate/ch/bits
    assert decoded["wav"][:3] == (44100, 2, 16)
    samples = {ext: d[3] for ext, d in decoded.items()}
    assert all(s == samples["wav"] for s in samples.values())
    with pytest.raises(A.WavError, match="8SVX"):
        A.audio_decode(open(f"{_SNDHDR_DIR}/sndhdr.8svx", "rb").read())
    for exotic in ("hcom", "sndt", "voc"):
        with pytest.raises(A.WavError):
            A.audio_decode(open(f"{_SNDHDR_DIR}/sndhdr.{exotic}", "rb").read())


def test_energy_fingerprint_golden_and_invariance():
    # 4 windows of 2 samples: energies 2, 8, 8, 32 -> bits (8>2, 8>8, 32>8)
    s = [1, -1, 2, -2, 2, 2, 4, -4]
    assert A.energy_fingerprint(s, 4) == 0b101
    # gain invariance: scaling every sample scales every energy equally
    assert A.energy_fingerprint([3 * v for v in s], 4) == 0b101
    # trailing partial window dropped whole
    assert A.energy_fingerprint(s + [99], 4) == 0b101
    with pytest.raises(A.WavError, match="at least 2"):
        A.energy_fingerprint(s, 1)
    with pytest.raises(A.WavError, match="shorter"):
        A.energy_fingerprint([1, 2], 4)


def test_extensible_agrees_with_plain_pcm():
    # WAVE_FORMAT_EXTENSIBLE over identical frames must decode
    # identically to the canonical header — int PCM at every depth,
    # mono and stereo
    for bits in (8, 16, 24, 32):
        lo = 0 if bits == 8 else -(1 << (bits - 1))
        hi = 255 if bits == 8 else (1 << (bits - 1)) - 1
        samples = [lo, hi, (lo + hi) // 2, 0 if bits != 8 else 1] * 3
        for ch in (1, 2):
            plain = A.wav_decode(A.wav_encode(8000, ch, bits, samples))
            ext = A.wav_decode(
                A.wav_encode_extensible(8000, ch, bits, samples)
            )
            assert ext == plain
            # and the header really is extensible
            payload = A.wav_encode_extensible(8000, ch, bits, samples)
            fmt_at = payload.find(b"fmt ") + 8
            assert struct.unpack_from("<H", payload, fmt_at)[0] == 0xFFFE


def test_extensible_agrees_with_plain_float():
    vals = [0.0, 0.5, -0.5, 1.0, -1.0, 0.25, -0.125, 0.75]
    for bits in (32, 64):
        plain = A.wav_decode(A.wav_encode_float(8000, 2, vals, bits=bits))
        ext = A.wav_decode(
            A.wav_encode_extensible(8000, 2, bits, vals, sub=3)
        )
        assert ext == plain
        assert plain[2] == 16  # float normalizes to 16-bit linear


def test_extensible_meta_reports_container():
    payload = A.wav_encode_extensible(44100, 2, 24, [0] * 12)
    assert A.wav_meta(payload) == (44100, 2, 24, 6, 0)


def test_extensible_refusals_name_the_profile():
    good = bytearray(A.wav_encode_extensible(8000, 1, 16, [1, -1] * 4))
    fmt_at = good.find(b"fmt ") + 8

    # unknown SubFormat GUID suffix
    mut = bytearray(good)
    mut[fmt_at + 30] ^= 0xFF  # inside the GUID tail
    with pytest.raises(A.WavError, match="KSDATAFORMAT"):
        A.wav_decode(bytes(mut))

    # known suffix but unsupported subformat (2 = ADPCM)
    mut = bytearray(good)
    struct.pack_into("<I", mut, fmt_at + 24, 2)
    with pytest.raises(A.WavError, match="subformat 2"):
        A.wav_decode(bytes(mut))

    # truncated extension (cbSize < 22)
    mut = bytearray(good)
    struct.pack_into("<H", mut, fmt_at + 16, 10)
    with pytest.raises(A.WavError, match="cbSize"):
        A.wav_decode(bytes(mut))

    # valid_bits > container bits is a lie, not a layout
    mut = bytearray(good)
    struct.pack_into("<H", mut, fmt_at + 18, 20)
    with pytest.raises(A.WavError, match="20 valid bits"):
        A.wav_decode(bytes(mut))

    # sub-width FLOAT has no left-aligned layout in the spec: refuse
    flt = bytearray(A.wav_encode_extensible(8000, 1, 32, [0.5, -0.5], sub=3))
    fmt_at = flt.find(b"fmt ") + 8
    struct.pack_into("<H", flt, fmt_at + 18, 24)
    with pytest.raises(A.WavError, match="24 valid of 32"):
        A.wav_decode(bytes(flt))


def test_extensible_subwidth_pcm_masks_low_bits():
    # The spec's left-aligned sub-width layout (e.g. 20-in-24): the low
    # container bits are insignificant, so a writer that left garbage
    # there must decode sample-identical to one that zeroed them.
    cases = [
        (16, 12, [0x1230, -0x4560, 0x7FF0, -0x8000, 0, 0x0010]),
        (24, 20, [0x12345 << 4, -(0x54321 << 4), 0x7FFFF << 4, 0, 16, -16]),
    ]
    for bits, valid, clean_samples in cases:
        shift = bits - valid
        width = bits // 8
        ext = bytearray(
            A.wav_encode_extensible(8000, 1, bits, clean_samples)
        )
        fmt_at = ext.find(b"fmt ") + 8
        struct.pack_into("<H", ext, fmt_at + 18, valid)
        # clean sub-width file decodes exactly the encoded samples
        assert A.wav_decode(bytes(ext))[3] == clean_samples

        # now fill every pad bit with garbage in the data chunk
        data_at = bytes(ext).find(b"data") + 8
        dirty = bytearray(ext)
        for i in range(len(clean_samples)):
            dirty[data_at + i * width] |= (1 << shift) - 1
        got = A.wav_decode(bytes(dirty))
        assert got[3] == clean_samples, f"{valid}-in-{bits} mask failed"
        # and it agrees with the plain-header twin over the same frames
        plain = A.wav_decode(A.wav_encode(8000, 1, bits, clean_samples))
        assert got == plain


def test_extensible_valid_bits_zero_is_tolerated():
    # some writers leave wValidBitsPerSample = 0 (unspecified)
    payload = bytearray(A.wav_encode_extensible(8000, 1, 16, [5, -5] * 4))
    fmt_at = payload.find(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_at + 18, 0)
    assert A.wav_decode(bytes(payload))[3] == [5, -5] * 4


def test_extensible_g711_subformats_dispatch():
    # hand-wrap a mu-law stream in an extensible header: must expand
    # through the same G.711 table as format tag 7
    codes = bytes(range(0, 16))
    plain = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(codes)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(codes)) + codes
    )
    fmt_ext = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8)
        + struct.pack("<HHI", 22, 8, 1)
        + (7).to_bytes(4, "little") + A._KS_GUID_SUFFIX
    )
    ext = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 40 + 8 + len(codes)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 40) + fmt_ext
        + b"data" + struct.pack("<I", len(codes)) + codes
    )
    assert A.wav_decode(ext) == A.wav_decode(plain)


def _audioop_or_skip():
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        return audioop
    except ImportError:  # removed in Python 3.13
        pytest.skip("audioop unavailable")


def test_ima_adpcm_roundtrip_mono_and_meta():
    import math

    sig = [int(9000 * math.sin(x / 40)) for x in range(2000)]
    pay = A.wav_encode_adpcm(8000, 1, sig)
    sr, ch, bits, out = A.wav_decode(pay)
    assert (sr, ch, bits) == (8000, 1, 16)
    # block-quantized length: padded up to a whole number of blocks
    spb = (256 - 4) * 2 + 1
    n_blocks = -(-len(sig) // spb)
    assert len(out) == n_blocks * spb
    assert A.wav_meta(pay) == (8000, 1, 4, n_blocks * spb,
                               n_blocks * spb * 1000 // 8000)
    # every block re-anchors the predictor, so the first sample of each
    # block is EXACT; between anchors the slow signal tracks closely
    for b in range(n_blocks):
        assert out[b * spb] == sig[min(b * spb, len(sig) - 1)]
    err = max(abs(a - b) for a, b in zip(sig, out))
    assert err < 2000, err


def test_ima_adpcm_decode_cross_validated_against_audioop():
    """Per block: seed audioop's (predictor, index) state from the block
    header, swap each body byte's nibbles (WAV is low-nibble-first,
    audioop high-first), and the decoded samples must match exactly —
    on encoder output AND on adversarial random nibble streams."""
    import math
    import random

    audioop = _audioop_or_skip()

    def ref_block(block, align):
        pred = int.from_bytes(block[0:2], "little", signed=True)
        idx = block[2]
        swapped = bytes(
            ((b & 0x0F) << 4) | (b >> 4) for b in block[4:]
        )
        lin, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
        n = len(lin) // 2
        return [pred] + list(struct.unpack(f"<{n}h", lin))

    sig = [int(11000 * math.sin(x / 9)) for x in range(1500)]
    pay = A.wav_encode_adpcm(8000, 1, sig, block_align=128)
    data = pay[pay.find(b"data") + 8 :]
    assert len(data) % 128 == 0 and len(data) > 0
    decoded = A.wav_decode(pay)[3]
    spb = (128 - 4) * 2 + 1
    for k, boff in enumerate(range(0, len(data), 128)):
        block = data[boff : boff + 128]
        assert decoded[k * spb : (k + 1) * spb] == ref_block(block, 128)

    rng = random.Random(5)
    for _ in range(20):
        body = bytes(rng.randrange(256) for _ in range(44))
        hdr = struct.pack(
            "<hBB", rng.randrange(-32768, 32768), rng.randrange(89), 0
        )
        block = hdr + body
        assert A._ima_adpcm_decode(block, 1, len(block)) == ref_block(
            block, len(block)
        )


def test_ima_adpcm_stereo_channels_independent():
    # stereo with twice the mono block align has the same samples-per-
    # block; per-channel state is independent, so the deinterleaved
    # stereo decode must equal the two mono decodes
    import math

    left = [int(7000 * math.sin(x / 25)) for x in range(1200)]
    right = [int(5000 * math.cos(x / 17)) for x in range(1200)]
    inter = [v for pair in zip(left, right) for v in pair]
    st = A.wav_decode(A.wav_encode_adpcm(8000, 2, inter, block_align=512))[3]
    ml = A.wav_decode(A.wav_encode_adpcm(8000, 1, left, block_align=256))[3]
    mr = A.wav_decode(A.wav_encode_adpcm(8000, 1, right, block_align=256))[3]
    assert st[0::2] == ml
    assert st[1::2] == mr


def test_ima_adpcm_refusals_name_the_profile():
    pay = bytearray(A.wav_encode_adpcm(8000, 1, [0] * 505))
    fmt_at = pay.find(b"fmt ") + 8

    # 3-bit IMA variant
    mut = bytearray(pay)
    struct.pack_into("<H", mut, fmt_at + 14, 3)
    with pytest.raises(A.WavError, match="4-bit"):
        A.wav_decode(bytes(mut))

    # block align not a multiple of 4 bytes/channel
    mut = bytearray(pay)
    struct.pack_into("<H", mut, fmt_at + 12, 255)
    with pytest.raises(A.WavError, match="block align"):
        A.wav_decode(bytes(mut))

    # corrupt step index in a block header
    mut = bytearray(pay)
    mut[pay.find(b"data") + 8 + 2] = 97
    with pytest.raises(A.WavError, match="step index"):
        A.wav_decode(bytes(mut))

    # retagging the IMA fmt chunk as MS ADPCM fails by name: the IMA
    # extension (cbSize 2) cannot carry the MS coefficient table
    mut = bytearray(pay)
    struct.pack_into("<H", mut, fmt_at, 2)
    with pytest.raises(A.WavError, match="MS ADPCM fmt extension"):
        A.wav_decode(bytes(mut))

    with pytest.raises(A.WavError, match="block align"):
        A.wav_encode_adpcm(8000, 1, [0] * 8, block_align=9)


def test_ima_adpcm_trailing_partial_block_dropped():
    pay = A.wav_encode_adpcm(8000, 1, [100] * 1010, block_align=256)
    # truncate mid-block (fixing the size fields): only whole blocks decode
    raw = bytearray(pay[: len(pay) - 100])
    struct.pack_into("<I", raw, 4, len(raw) - 8)
    data_at = bytes(raw).find(b"data")
    struct.pack_into("<I", raw, data_at + 4, len(raw) - data_at - 8)
    spb = (256 - 4) * 2 + 1
    assert len(A.wav_decode(bytes(raw))[3]) == spb


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 120),
    flip_pos=st.integers(0, 119),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_adpcm_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    # the never-hang contract for the block-structured path: any
    # truncation/bitflip either decodes (to in-range samples) or raises
    # the named error — never hangs, never returns out-of-range values
    good = A.wav_encode_adpcm(
        8000, 1, [((i * 131) % 4000) - 2000 for i in range(600)],
        block_align=64,
    )
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(4, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 5:
        p = 4 + flip_pos % (len(data) - 4)
        data[p] ^= flip_val
    try:
        sr, ch, bits, samples = A.wav_decode(bytes(data))
        assert sr >= 1 and ch >= 1
        assert all(-32768 <= s <= 32767 for s in samples)
    except (A.WavError, ValueError):
        pass


# ---------------------------------------------------------------- MS ADPCM


def _ms_wav(align, spb, blocks, channels=1, rate=8000, coefs=None):
    """Hand-assemble an MS ADPCM WAV (format 0x02) around raw blocks."""
    coefs = A._MS_STD_COEFS if coefs is None else coefs
    fmt = struct.pack(
        "<HHIIHHHH", 2, channels, rate, 4000, align, 4,
        4 + 4 * len(coefs), spb,
    ) + struct.pack("<H", len(coefs)) + b"".join(
        struct.pack("<hh", a, b) for a, b in coefs
    )
    data = b"".join(blocks)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_ms_adpcm_hand_vector_spec_recurrence():
    # hand-computed per the Microsoft spec: predictor 1 = (512, -256),
    # delta 16, history s1=100 s2=50, nibbles 1, -1, 0, 2, -8, 4
    # (high nibble first).  Every expected value below was worked by
    # hand through predict = (s1*512 + s2*(-256))/256, +nibble*delta,
    # delta' = max(16, adapt[n]*delta >> 8).
    blk = bytes([1]) + struct.pack("<hhh", 16, 100, 50) + bytes(
        [0x1F, 0x02, 0x84]
    )
    sr, ch, bits, out = A.wav_decode(_ms_wav(10, 8, [blk]))
    assert (sr, ch, bits) == (8000, 1, 16)
    assert out == [50, 100, 166, 216, 266, 348, 302, 448]


def test_ms_adpcm_division_truncates_toward_zero():
    # predictor 5 = (460, -208) with s1=-1, s2=-2: the product is -44,
    # and the spec's C division gives trunc(-44/256) = 0 — floor
    # division would give -1 and the first predicted sample would
    # diverge.  All-zero nibbles then pin the whole tail.
    blk = bytes([5]) + struct.pack("<hhh", 16, -1, -2) + bytes(3)
    assert A.wav_decode(_ms_wav(10, 8, [blk]))[3] == [-2, -1] + [0] * 6


def test_ms_adpcm_roundtrip_exact_for_tracked_signals():
    # signals the chosen predictor tracks exactly are sample-exact:
    # constants via (256, 0), linear ramps via (512, -256)
    const = [1234] * 600
    sr, ch, bits, out = A.wav_decode(A.wav_encode_msadpcm(8000, 1, const))
    assert (sr, ch, bits) == (8000, 1, 16)
    assert out[:600] == const  # tail is block padding (held last frame)
    assert all(s == 1234 for s in out[600:])

    ramp = [-3000 + 7 * i for i in range(600)]
    out = A.wav_decode(A.wav_encode_msadpcm(8000, 1, ramp))[3]
    assert out[:600] == ramp

    # stereo: constant left, ramp right — channels stay independent
    left, right = [500] * 400, [-2000 + 9 * i for i in range(400)]
    inter = [v for pair in zip(left, right) for v in pair]
    out = A.wav_decode(A.wav_encode_msadpcm(8000, 2, inter))[3]
    assert out[: len(inter)] == inter


def test_ms_adpcm_meta_and_partial_block():
    pay = A.wav_encode_msadpcm(8000, 1, [100] * 1010, block_align=64)
    spb = (64 - 7) * 2 + 2  # 116 samples per mono block
    sr, ch, bits, n_frames, dur = A.wav_meta(pay)
    assert (sr, ch, bits) == (8000, 1, 4)  # stored width
    assert n_frames % spb == 0 and n_frames >= 1010
    # truncate mid-block (fixing the size fields): only whole blocks decode
    raw = bytearray(pay[: len(pay) - 30])
    struct.pack_into("<I", raw, 4, len(raw) - 8)
    data_at = bytes(raw).find(b"data")
    struct.pack_into("<I", raw, data_at + 4, len(raw) - data_at - 8)
    out = A.wav_decode(bytes(raw))[3]
    assert len(out) % spb == 0 and len(out) < 1010


def test_ms_adpcm_refusals_name_the_profile():
    good = bytearray(A.wav_encode_msadpcm(8000, 1, [0] * 300))
    fmt_at = good.find(b"fmt ") + 8

    # predictor index beyond the coefficient table
    mut = bytearray(good)
    mut[bytes(good).find(b"data") + 8] = 9
    with pytest.raises(A.WavError, match="predictor 9 out of range"):
        A.wav_decode(bytes(mut))

    # samples-per-block beyond the block's nibble capacity
    mut = bytearray(good)
    struct.pack_into("<H", mut, fmt_at + 18, 60000)
    with pytest.raises(A.WavError, match="samples-per-block"):
        A.wav_decode(bytes(mut))

    # coefficient table claimed longer than the chunk carries
    mut = bytearray(good)
    struct.pack_into("<H", mut, fmt_at + 20, 40)
    with pytest.raises(A.WavError, match="MS ADPCM"):
        A.wav_decode(bytes(mut))

    # block align too small for the per-channel headers
    mut = bytearray(good)
    struct.pack_into("<H", mut, fmt_at + 12, 7)
    with pytest.raises(A.WavError, match="block align"):
        A.wav_decode(bytes(mut))

    # MS ADPCM must be 4-bit
    mut = bytearray(good)
    struct.pack_into("<H", mut, fmt_at + 14, 8)
    with pytest.raises(A.WavError, match="4-bit"):
        A.wav_decode(bytes(mut))

    with pytest.raises(A.WavError, match="block align"):
        A.wav_encode_msadpcm(8000, 1, [0] * 8, block_align=7)


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 120),
    flip_pos=st.integers(0, 119),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_ms_adpcm_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    # the never-hang contract, same as the IMA path: any truncation or
    # bitflip either decodes to in-range samples or raises the named
    # error — never hangs, never returns out-of-range values
    good = A.wav_encode_msadpcm(
        8000, 1, [((i * 131) % 4000) - 2000 for i in range(600)],
        block_align=64,
    )
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(4, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 5:
        p = 4 + flip_pos % (len(data) - 4)
        data[p] ^= flip_val
    try:
        sr, ch, bits, samples = A.wav_decode(bytes(data))
        assert sr >= 1 and ch >= 1
        assert all(-32768 <= s <= 32767 for s in samples)
    except (A.WavError, ValueError):
        pass


# --- adversarial block headers: refusal-by-name vs silent wrong samples ---
#
# The truncation/bitflip fuzz above pins never-hang; these pin the SHARPER
# contract the module docstring promises: a header field that selects
# decode SEMANTICS (MS predictor index, IMA step index, fmt-level block
# geometry) refuses BY NAME when out of range, while fields that merely
# carry state (deltas, anchor samples, the IMA reserved byte) decode to
# in-range values — corrupt state is representable, corrupt semantics is
# not, and the two outcomes must never blur into "silently wrong".


def _ms_payload(channels):
    frames = [((i * 131) % 4000) - 2000 for i in range(600 * channels)]
    return bytearray(
        A.wav_encode_msadpcm(8000, channels, frames, block_align=64 * channels)
    )


def _ima_payload(channels):
    frames = [((i * 97) % 4000) - 2000 for i in range(600 * channels)]
    return bytearray(
        A.wav_encode_adpcm(8000, channels, frames, block_align=64 * channels)
    )


@settings(max_examples=40, deadline=None)
@given(
    channels=st.sampled_from([1, 2]),
    block=st.integers(0, 8),
    chan=st.integers(0, 1),
    bad=st.integers(7, 255),
)
def test_ms_adpcm_predictor_out_of_range_refuses_by_name(
    channels, block, chan, bad
):
    raw = _ms_payload(channels)
    align = 64 * channels
    data_at = bytes(raw).find(b"data", 36) + 8
    n_blocks = (len(raw) - data_at) // align
    pos = data_at + (block % n_blocks) * align + (chan % channels)
    raw[pos] = bad  # bPredictor: the 7-entry standard table has ids 0-6
    with pytest.raises(A.WavError, match="predictor"):
        A.wav_decode(bytes(raw))


@settings(max_examples=40, deadline=None)
@given(
    channels=st.sampled_from([1, 2]),
    block=st.integers(0, 8),
    chan=st.integers(0, 1),
    bad=st.integers(89, 255),
)
def test_ima_step_index_out_of_range_refuses_by_name(channels, block, chan, bad):
    raw = _ima_payload(channels)
    align = 64 * channels
    data_at = bytes(raw).find(b"data", 36) + 8
    n_blocks = (len(raw) - data_at) // align
    pos = data_at + (block % n_blocks) * align + (chan % channels) * 4 + 2
    raw[pos] = bad  # step index: the IMA table has 89 entries (0-88)
    with pytest.raises(A.WavError, match="step index"):
        A.wav_decode(bytes(raw))


@settings(max_examples=40, deadline=None)
@given(
    channels=st.sampled_from([1, 2]),
    bad_spb=st.one_of(st.integers(0, 1), st.integers(2000, 65535)),
)
def test_ms_adpcm_spb_inconsistent_with_align_refuses(channels, bad_spb):
    # wSamplesPerBlock outside [2, capacity(block_align)] is a geometry
    # lie: decoding would read nibbles past the block. Refuse by name.
    raw = _ms_payload(channels)
    fmt_at = bytes(raw).find(b"fmt ") + 8
    struct.pack_into("<H", raw, fmt_at + 18, bad_spb)
    with pytest.raises(A.WavError, match="samples-per-block"):
        A.wav_decode(bytes(raw))


@settings(max_examples=40, deadline=None)
@given(
    channels=st.sampled_from([1, 2]),
    bad_align=st.integers(0, 600),
)
def test_ima_block_align_inconsistent_refuses(channels, bad_align):
    # nBlockAlign must leave room for the 4-byte-per-channel header and
    # frame whole 4-byte data words per channel; anything else refuses
    if bad_align > 4 * channels and bad_align % (4 * channels) == 0:
        return  # valid geometry — covered by the positive tests
    raw = _ima_payload(channels)
    fmt_at = bytes(raw).find(b"fmt ") + 8
    struct.pack_into("<H", raw, fmt_at + 12, bad_align)
    with pytest.raises(A.WavError, match="block align"):
        A.wav_decode(bytes(raw))


@settings(max_examples=40, deadline=None)
@given(
    channels=st.sampled_from([1, 2]),
    block=st.integers(0, 8),
    chan=st.integers(0, 1),
    val=st.integers(0, 255),
)
def test_ima_reserved_byte_is_ignored(channels, block, chan, val):
    # the 4th header byte per channel is reserved: ANY value must decode
    # to the identical samples (state bytes never become refusals)
    raw = _ima_payload(channels)
    want = A.wav_decode(bytes(raw))
    align = 64 * channels
    data_at = bytes(raw).find(b"data", 36) + 8
    n_blocks = (len(raw) - data_at) // align
    pos = data_at + (block % n_blocks) * align + (chan % channels) * 4 + 3
    raw[pos] = val
    assert A.wav_decode(bytes(raw)) == want


@settings(max_examples=40, deadline=None)
@given(
    channels=st.sampled_from([1, 2]),
    block=st.integers(0, 8),
    chan=st.integers(0, 1),
    val=st.integers(-32768, 32767),
)
def test_ms_adpcm_corrupt_delta_decodes_in_range(channels, block, chan, val):
    # iDelta is STATE, not semantics: any int16 value decodes (the
    # adaptation floor clamps it to >=16 on the first step) to in-range
    # samples of the exact original length — corrupt audio, never a crash
    raw = _ms_payload(channels)
    n_want = len(A.wav_decode(bytes(raw))[3])
    align = 64 * channels
    data_at = bytes(raw).find(b"data", 36) + 8
    n_blocks = (len(raw) - data_at) // align
    pos = data_at + (block % n_blocks) * align + channels + 2 * (chan % channels)
    struct.pack_into("<h", raw, pos, val)
    sr, ch, bits, samples = A.wav_decode(bytes(raw))
    assert len(samples) == n_want
    assert all(-32768 <= s <= 32767 for s in samples)
