"""Pure-Python baseline JPEG codec (inventory/jpeg.py).

Ground truth strategy: no image library exists in this container, so the
decoder is pinned three ways — (1) mathematical unit vectors (DCT
orthonormality, Huffman canonicalization, EXTEND), (2) encode→decode
round trips across samplings/restart intervals with lossy-bounded error
and EXACT flat fields, (3) real-world JPEG streams produced by foreign
encoders (shipped in Python/Rust doc trees), env-gated so the suite
stays hermetic when they're absent.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from bravo_spark.inventory import jpeg as J
from bravo_spark.inventory import multimodal as mm


def _gradient_rgb(w: int, h: int) -> bytes:
    return bytes(
        ((x * 7) % 256 if c == 0 else (y * 11) % 256 if c == 1 else (x * 3 + y * 5) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_dct_matrix_orthonormal():
    eye = J._C @ J._C.T
    assert np.abs(eye - np.eye(8)).max() < 1e-12
    rng = np.random.RandomState(7)
    block = rng.rand(8, 8) * 255
    back = J._C.T @ (J._C @ block @ J._C.T) @ J._C
    assert np.abs(back - block).max() < 1e-9


def test_extend_matches_spec_vectors():
    # T.81 Table F.1: category t, low half negative, high half positive
    assert J._extend(0, 0) == 0
    assert J._extend(1, 1) == 1
    assert J._extend(0, 1) == -1
    assert J._extend(0b11, 2) == 3
    assert J._extend(0b00, 2) == -3
    assert J._extend(0b10, 2) == 2
    assert J._extend(0b01, 2) == -2


def test_huffman_canonical_codes():
    # 2 codes of len 2, 1 of len 3 -> codes 00, 01, 100
    tab = J._encode_table([0, 2, 1] + [0] * 13, [5, 6, 7])
    assert tab == {5: (0b00, 2), 6: (0b01, 2), 7: (0b100, 3)}
    dec = J._HuffTable([0, 2, 1] + [0] * 13, [5, 6, 7])
    assert dec.mincode[2] == 0 and dec.maxcode[2] == 1
    assert dec.mincode[3] == 0b100 and dec.maxcode[3] == 0b100


def test_oversubscribed_huffman_refused():
    with pytest.raises(J.JpegError, match="over-subscribed"):
        J._HuffTable([3] + [0] * 15, [1, 2, 3])  # 3 codes of length 1


def test_flat_field_roundtrips_exactly():
    for mode, bpp in (("L", 1), ("RGB", 3)):
        raw = bytes([128, 64, 200][:bpp]) * (24 * 24)
        payload = J.jpeg_encode(24, 24, mode, raw, quality=90)
        w, h, m, out = J.jpeg_decode_pixels(payload)
        assert (w, h, m) == (24, 24, mode)
        a = np.frombuffer(out, dtype=np.uint8).astype(int)
        b = np.frombuffer(raw, dtype=np.uint8).astype(int)
        assert np.abs(a - b).max() <= 1, f"flat {mode} drifted"


@pytest.mark.parametrize("sampling", ["444", "422", "420"])
@pytest.mark.parametrize("restart", [0, 2])
def test_gradient_roundtrip_all_samplings(sampling, restart):
    w0, h0 = 37, 21  # not MCU-aligned: exercises padding + crop
    raw = _gradient_rgb(w0, h0)
    payload = J.jpeg_encode(
        w0, h0, "RGB", raw, quality=95, sampling=sampling,
        restart_interval=restart,
    )
    w, h, m, out = J.jpeg_decode_pixels(payload)
    assert (w, h, m) == (w0, h0, "RGB")
    a = np.frombuffer(out, dtype=np.uint8).astype(int)
    b = np.frombuffer(raw, dtype=np.uint8).astype(int)
    # smooth gradient: 4:4:4 within DCT quant error; subsampled chroma
    # additionally pays the box-average
    limit = 3 if sampling == "444" else 10
    assert np.abs(a - b).max() <= limit, (sampling, np.abs(a - b).max())


def test_grayscale_restart_roundtrip():
    g = bytes(((x * x + y) % 256) for y in range(19) for x in range(33))
    payload = J.jpeg_encode(33, 19, "L", g, quality=90, restart_interval=3)
    w, h, m, out = J.jpeg_decode_pixels(payload)
    assert (w, h, m) == (33, 19, "L")
    a = np.frombuffer(out, dtype=np.uint8).astype(int)
    b = np.frombuffer(g, dtype=np.uint8).astype(int)
    assert np.abs(a - b).mean() < 3


def test_reencode_stability():
    """decode(encode(decode(encode(x)))) stays close to the first decode —
    the codec doesn't accumulate drift (catches asymmetric DCT/level-shift
    bugs that a single round trip can hide)."""
    raw = _gradient_rgb(32, 16)
    p1 = J.jpeg_encode(32, 16, "RGB", raw, quality=95)
    _, _, _, d1 = J.jpeg_decode_pixels(p1)
    p2 = J.jpeg_encode(32, 16, "RGB", d1, quality=95)
    _, _, _, d2 = J.jpeg_decode_pixels(p2)
    a = np.frombuffer(d1, dtype=np.uint8).astype(int)
    b = np.frombuffer(d2, dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() <= 2


def test_out_of_profile_refusals_name_the_feature():
    base = J.jpeg_encode(8, 8, "L", bytes(64), quality=90)
    # arithmetic-coded sequential
    arith = base.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(J.JpegError, match="coding process"):
        J.jpeg_decode_pixels(arith)
    with pytest.raises(J.JpegError, match="SOI"):
        J.jpeg_decode_pixels(b"\x80PNG\r\n\x1a\n")
    # SOF2 is SUPPORTED since r8 — but a baseline-shaped SOS header
    # (Ss=0, Se=63) inside a progressive frame is structurally invalid
    # and must refuse as malformed, not decode garbage
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(J.JpegError, match="mixes DC and AC"):
        J.jpeg_decode_pixels(prog)


def test_forged_dims_bomb_refused():
    """A tiny payload whose SOF claims enormous dims must refuse before
    allocating planes (same posture as the PNG inflate bound)."""
    base = bytearray(J.jpeg_encode(8, 8, "L", bytes(64), quality=90))
    i = base.find(b"\xff\xc0")
    # SOF body: len(2) precision(1) height(2) width(2)
    struct.pack_into(">HH", base, i + 5, 65000, 65000)
    with pytest.raises(J.JpegError, match="too large"):
        J.jpeg_decode_pixels(bytes(base))


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(0, 400),
    flip_pos=st.integers(0, 399),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode):
    """Corrupted payloads either decode (harmless bit flips in entropy
    data) or raise JpegError/ValueError — never hang, never crash with a
    foreign exception type."""
    good = J.jpeg_encode(16, 16, "L", bytes(range(256)), quality=85)
    data = bytearray(good)
    if mode in ("truncate", "both"):
        data = data[: max(2, len(data) - cut % len(data))]
    if mode in ("flip", "both") and len(data) > 4:
        p = 2 + flip_pos % (len(data) - 2)
        data[p] ^= flip_val
    try:
        w, h, _, raw = J.jpeg_decode_pixels(bytes(data))
        assert 0 < w <= 65535 and 0 < h <= 65535
        assert len(raw) in (w * h, w * h * 3)
    except (J.JpegError, ValueError):
        pass


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
    quality=st.integers(60, 100),
)
def test_random_noise_roundtrip_bounded(w, h, seed, quality):
    """Worst-case content (uniform noise) still round-trips with bounded
    error — the lossy floor is the quantization table, not a codec bug."""
    rng = np.random.RandomState(seed)
    raw = bytes(rng.randint(0, 256, size=w * h, dtype=np.uint8))
    payload = J.jpeg_encode(w, h, "L", raw, quality=quality)
    got_w, got_h, m, out = J.jpeg_decode_pixels(payload)
    assert (got_w, got_h, m) == (w, h, "L")
    a = np.frombuffer(out, dtype=np.uint8).astype(int)
    b = np.frombuffer(raw, dtype=np.uint8).astype(int)
    # quality>=60 keeps the largest luma quantizer <= ~200; DCT error is
    # spread but bounded — noise at q60 stays within ~half the table max
    assert np.abs(a - b).mean() < 40


_REAL_JPEGS = [
    p
    for p in (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "site-packages/IPython/core/tests/2x2.jpg",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "test/test_email/data/python.jpg",
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
        "rust/html/embedded-book/assets/verify.jpeg",
    )
    if os.path.exists(p)
]


@pytest.mark.skipif(not _REAL_JPEGS, reason="no foreign-encoder JPEGs on disk")
def test_foreign_encoder_streams_decode():
    """Streams produced by real-world encoders (incl. a 720×477 4:2:0
    photo) decode to header-consistent pixel buffers — validates the
    Huffman/MCU/upsampling paths against encodings our own writer never
    produces."""
    for path in _REAL_JPEGS:
        payload = open(path, "rb").read()
        w, h, m, raw = J.jpeg_decode_pixels(payload)
        assert (w, h) == mm.parse_image_dims(payload)
        assert len(raw) == w * h * (1 if m == "L" else 3)


def test_decode_pixels_dispatches_jpeg_pure_python():
    raw = _gradient_rgb(20, 12)
    payload = J.jpeg_encode(20, 12, "RGB", raw, quality=95)
    w, h, m, out = mm.decode_pixels(payload)
    assert (w, h, m) == (20, 12, "RGB")
    # resize tier: JPEG in, deterministic PNG out
    png = mm.resize_pixels(payload, box=8)
    rw, rh, rm, rraw = mm.png_decode_pixels(png)
    assert (rw, rh) == mm.fit_box(20, 12, 8) and rm == "RGB"
    assert len(rraw) == rw * rh * 3


def test_progressive_dispatches_pure_python():
    """SOF2 is in-profile since r8: the dispatcher decodes a progressive
    stream pure-Python instead of routing it to Pillow."""
    raw = _gradient_rgb(12, 8)
    prog = J.jpeg_encode_progressive(12, 8, "RGB", raw, quality=95)
    w, h, m, out = mm.decode_pixels(prog)
    assert (w, h, m) == (12, 8, "RGB")
    assert out == J.jpeg_decode_pixels(J.jpeg_encode(12, 8, "RGB", raw, quality=95))[3]


@pytest.mark.parametrize("sampling", ["444", "420"])
def test_progressive_equals_baseline(sampling):
    """Progressive encode (DC successive approximation + AC spectral
    bands) must decode to EXACTLY the baseline encoding's pixels — both
    quantize identically, so any divergence is a scan-path bug."""
    w0, h0 = 37, 21
    raw = _gradient_rgb(w0, h0)
    base = J.jpeg_decode_pixels(J.jpeg_encode(w0, h0, "RGB", raw, quality=95,
                                              sampling=sampling))
    prog = J.jpeg_decode_pixels(
        J.jpeg_encode_progressive(w0, h0, "RGB", raw, quality=95,
                                  sampling=sampling)
    )
    assert base == prog


def test_progressive_grayscale_equals_baseline():
    g = bytes(((x * 5 + y * 3) % 256) for y in range(19) for x in range(33))
    base = J.jpeg_decode_pixels(J.jpeg_encode(33, 19, "L", g, quality=85))
    prog = J.jpeg_decode_pixels(J.jpeg_encode_progressive(33, 19, "L", g, quality=85))
    assert base == prog


def _prog_vector_payload(scan2_entropy: bytes) -> bytes:
    """Minimal 8x8 grayscale SOF2 stream with custom 2-entry Huffman
    tables, a trivial DC scan, an AC first scan (Al=1) establishing
    coefficient k=1, and a caller-supplied refinement scan."""
    out = bytearray(b"\xff\xd8")
    # DQT 0: all ones (dequantization is identity)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1]) * 64
    # SOF2 8x8, 1 component, 1x1 sampling
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC table 0: single symbol 0 (category 0) -> code '0'
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x00"
    out += bytes([1] + [0] * 15) + bytes([0])
    # AC table 0: symbols 0x01, 0x00 -> codes 00, 01 (len 2)
    out += b"\xff\xc4" + struct.pack(">H", 21) + b"\x10"
    out += bytes([0, 2] + [0] * 14) + bytes([0x01, 0x00])
    # AC table 1 (refinement): symbols 0x11, 0x00 -> codes 00, 01
    out += b"\xff\xc4" + struct.pack(">H", 21) + b"\x11"
    out += bytes([0, 2] + [0] * 14) + bytes([0x11, 0x00])
    # scan 1: DC, Ah=0 Al=0, diff 0 -> code '0', padded 0111 1111
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x00])
    out += bytes([0b01111111])
    # scan 2: AC 1..63 first, Al=1, table 0:
    #   sym 0x01 ('00') value bit 1  -> coeff k=1 becomes extend(1,1)<<1 = 2
    #   sym 0x00 ('01') EOB          -> bits 00 1 01 + pad -> 0b00101111
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x01])
    out += bytes([0b00101111])
    # scan 3: AC 1..63 refinement Ah=1 Al=0 (byte 0x10), table 1
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x01, 1, 63, 0x10])
    out += scan2_entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_ac_refinement_hand_vector():
    """Spec-derived bit-level pin of the AC refinement path (T.81
    G.1.2.3), hand-assembled because our encoder deliberately never emits
    it: after the first AC scan the block holds k1=2; the refinement scan
    sends [sym 0x11]['0' sign]['1' correction][sym 0x00 EOB]:

    - sym 0x11 = run 1, magnitude 1 -> a NEW coefficient (-1, sign bit 0)
      lands after skipping one zero-history position;
    - walking to it passes k1 (nonzero history) whose correction bit '1'
      raises it 2 -> 3;
    - EOB corrects the (empty) remainder.

    Expected block: k1 = 3, k3 = -1 -> IDCT is fully determined."""
    # bits: 00 (sym 0x11) 0 (sign: negative) 1 (correction for k1) 01 (EOB)
    #       -> 0b0001 0111 with 1-padding -> 0x17
    payload = _prog_vector_payload(bytes([0b00010111]))
    w, h, mode, raw = J.jpeg_decode_pixels(payload)
    assert (w, h, mode) == (8, 8, "L")
    # reproduce the expected pixels from the coefficient block directly
    coeffs = np.zeros(64)
    coeffs[J.ZIGZAG[1]] = 3.0
    coeffs[J.ZIGZAG[3]] = -1.0
    px = J._C.T @ coeffs.reshape(8, 8) @ J._C + 128.0
    want = np.clip(np.rint(px), 0, 255).astype(np.uint8).tobytes()
    assert raw == want


_REAL_PROGRESSIVE = [
    p
    for p in (
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
        "rust/html/embedded-book/assets/f3.jpg",
    )
    if os.path.exists(p)
]


@pytest.mark.skipif(not _REAL_PROGRESSIVE, reason="no progressive JPEG on disk")
def test_foreign_progressive_stream_decodes():
    """A real progressive photo (libjpeg-style scan script incl. AC
    successive approximation) decodes to a header-consistent buffer with
    photographic statistics — the in-the-wild pin for the scan paths our
    encoder never emits."""
    payload = open(_REAL_PROGRESSIVE[0], "rb").read()
    w, h, m, raw = J.jpeg_decode_pixels(payload)
    assert (w, h) == mm.parse_image_dims(payload)
    assert m == "RGB" and len(raw) == w * h * 3
    a = np.frombuffer(raw, dtype=np.uint8)
    assert 40 < a.mean() < 220 and a.std() > 20  # not garbage, not flat


def test_bitreader_accumulator_stays_bounded():
    """The _BitReader/_BitWriter accumulators must stay O(1): reads only
    decrement nbits, so without the post-fill mask acc retains every
    consumed bit as an unbounded bigint and each shift is O(stream
    length) — quadratic decode (27x at 256x256, an effective hang on a
    legitimate multi-megapixel file within the 64 MP cap)."""
    rng = np.random.default_rng(11)
    # avoid 0xFF bytes so the stream never terminates on a marker
    data = bytes(int(b) % 0xFF for b in rng.integers(0, 255, size=50_000))
    br = J._BitReader(data, 0)
    for i in range(len(data) * 8 - 64):
        if i % 3 == 0:
            br.receive(2)
            i += 1  # receive(2) consumed an extra bit's worth below
        else:
            br.read_bit()
        # _fill exits with nbits in [25,32] and masks acc to nbits bits;
        # reads then only decrement nbits, so bit_length stays <= 32
        assert br.acc.bit_length() <= 32 and br.nbits <= 32
        if br.pos > len(data) - 16:
            break

    bw = J._BitWriter()
    for k in range(100_000):
        bw.write(k & 0x3FF, 11)
        assert bw.acc.bit_length() <= bw.nbits <= 18


def test_large_baseline_decode_linear_time():
    """4 MP baseline grayscale roundtrip completes in seconds (linear in
    stream size). Pre-fix the quadratic accumulator made this effectively
    hang; generous wall bound so slow CI never flakes."""
    import time

    w = h = 2048
    raw = ((np.add.outer(np.arange(h) * 11, np.arange(w) * 7) % 256)
           .astype(np.uint8).tobytes())
    payload = J.jpeg_encode(w, h, "L", raw, quality=85)
    t0 = time.monotonic()
    ww, hh, m, out = J.jpeg_decode_pixels(payload)
    elapsed = time.monotonic() - t0
    assert (ww, hh, m) == (w, h, "L") and len(out) == w * h
    assert elapsed < 60, f"4 MP decode took {elapsed:.1f}s - quadratic again?"
