"""inventory/multimodal.py: real container-header decoding (hand-built
format vectors, no image library), the deterministic fallback, the
dims-fit mirror, and — skip-marked where Pillow is absent — the
pixel-level tier."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from bravo_spark.inventory import multimodal as mm


def _png(w: int, h: int) -> bytes:
    """Minimal valid PNG: signature + IHDR + 1 IDAT (all-zero scanlines)
    + IEND, correct CRCs — built from the spec, no library."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + b"\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def _jpeg(w: int, h: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 + EOI — enough marker stream for a real
    parser to find the frame header."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )


@pytest.mark.parametrize(
    "maker,fmt",
    [(_png, "png"), (_gif, "gif"), (_jpeg, "jpeg")],
)
@pytest.mark.parametrize("dims", [(1, 1), (640, 480), (1, 65535), (300, 7)])
def test_header_dims_all_containers(maker, fmt, dims):
    payload = maker(*dims)
    assert mm.sniff_format(payload) == fmt
    assert mm.parse_image_dims(payload) == dims
    w, h, src = mm.decode_meta(payload)
    assert (w, h, src) == (*dims, "header")


def test_jpeg_skips_non_sof_segments():
    # progressive-style stream: DQT + DHT before SOF2
    body = b"\xff\xd8"
    body += b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"  # DQT
    body += b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"  # DHT (not SOF!)
    sof2 = struct.pack(">BHHB", 8, 99, 321, 3) + b"\x00" * 9
    body += b"\xff\xc2" + struct.pack(">H", 2 + len(sof2)) + sof2
    assert mm.parse_image_dims(body) == (321, 99)


def test_truncated_headers_refused():
    with pytest.raises(ValueError, match="IHDR"):
        mm.parse_image_dims(b"\x89PNG\r\n\x1a\n\x00\x00")
    with pytest.raises(ValueError, match="GIF"):
        mm.parse_image_dims(b"GIF89a\x10")
    with pytest.raises(ValueError, match="SOF"):
        mm.parse_image_dims(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError, match="not a recognized"):
        mm.parse_image_dims(b"plain text payload")


def test_synthetic_fallback_matches_oracle_formula():
    payload = "some document text".encode()
    w, h, src = mm.decode_meta(payload)
    digest = hashlib.md5(payload).hexdigest()
    assert src == "synthetic"
    assert w == 1 + int(digest[0:8], 16) % 1024
    assert h == 1 + int(digest[8:16], 16) % 1024


def test_fit_box_matches_sql_mirror():
    # the CASE expression in multimodal_resize, reimplemented literally
    def sql_fit(w, h, box=256):
        m = max(w, h)
        if m <= box:
            return w, h
        return max(1, (w * box) // m), max(1, (h * box) // m)

    for w in (1, 17, 255, 256, 257, 1024, 5000):
        for h in (1, 99, 256, 300, 4096):
            assert mm.fit_box(w, h) == sql_fit(w, h), (w, h)
    assert mm.fit_box(512, 2) == (256, 1)  # the max(1, …) floor


def test_pixel_tier_refuses_by_name_without_pillow():
    """Containers outside the pure-Python tiers (PNG common profile,
    baseline JPEG, GIF) still need Pillow; the refusal is named. JPEG/GIF
    payloads whose marker streams are header-only (no image data) refuse
    with their own codec's named error — they ARE in-profile, just
    malformed."""
    if mm.pil_available():
        pytest.skip("Pillow installed — refusal path not reachable")
    webp = b"RIFF" + bytes(4) + b"WEBPVP8 " + bytes(32)  # no pure tier
    with pytest.raises(ImportError, match="Pillow"):
        mm.decode_pixels(webp)
    with pytest.raises(ImportError, match="Pillow"):
        mm.resize_pixels(webp)
    from bravo_spark.inventory.gif import GifError
    from bravo_spark.inventory.jpeg import JpegError

    with pytest.raises(JpegError, match="EOI before SOS"):
        mm.decode_pixels(_jpeg(4, 4))
    with pytest.raises(JpegError, match="EOI before SOS"):
        mm.resize_pixels(_jpeg(4, 4))
    with pytest.raises(GifError, match="no image data"):
        mm.decode_pixels(_gif(4, 4))
    with pytest.raises(GifError, match="no image data"):
        mm.resize_pixels(_gif(4, 4))


def test_pixel_tier_real_decode():
    """PNG pixel decode is pure-Python — runs everywhere, no skip."""
    payload = _png(12, 5)
    w, h, mode, raw = mm.decode_pixels(payload)
    assert (w, h, mode) == (12, 5, "L")
    assert len(raw) == 12 * 5  # 8-bit grayscale
    assert raw == b"\x00" * 60


def test_pixel_tier_real_resize():
    out = mm.resize_pixels(_png(512, 128))
    assert mm.parse_image_dims(out) == (256, 64)
    # the output is itself a decodable common-profile PNG
    w, h, mode, raw = mm.png_decode_pixels(out)
    assert (w, h, mode) == (256, 64, "L") and raw == b"\x00" * (256 * 64)


def _png_rgb(w: int, h: int, pixel_fn, filters) -> bytes:
    """Spec-built RGB PNG with chosen per-scanline filter types — the
    encoder side of the filter algebra (RFC 2083 §6), so the decoder's
    un-filtering is exercised against independently constructed bytes."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rows = [
        [pixel_fn(x, y) for x in range(w)] for y in range(h)
    ]  # list of list of (r, g, b)
    flat = [
        bytes(c for px in row for c in px) for row in rows
    ]
    bpp = 3
    scan = bytearray()
    prev = bytes(w * bpp)
    for y, row in enumerate(flat):
        ft = filters[y % len(filters)]
        scan.append(ft)
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - ((a + b) >> 1)
            else:  # 4: Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[i] - pred
            scan.append(v & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def test_png_unfilter_all_filter_types():
    """Every RFC 2083 filter type (None/Sub/Up/Average/Paeth) reconstructs
    the same gradient image."""
    pixel = lambda x, y: ((x * 7) % 256, (y * 11) % 256, (x * y) % 256)
    want = bytes(
        c for y in range(9) for x in range(13) for c in pixel(x, y)
    )
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        payload = _png_rgb(13, 9, pixel, filters)
        w, h, mode, raw = mm.png_decode_pixels(payload)
        assert (w, h, mode) == (13, 9, "RGB"), filters
        assert raw == want, f"filter set {filters} mis-reconstructed"


def test_png_roundtrip_and_resample():
    """encode → decode is the identity; nearest-neighbor resample picks
    exact source pixels (integer grid, no interpolation drift)."""
    pixel = lambda x, y: ((x * 37) % 256, (y * 53) % 256, (x + y) % 256)
    raw = bytes(c for y in range(8) for x in range(32) for c in pixel(x, y))
    payload = mm.png_encode(32, 8, "RGB", raw)
    assert mm.parse_image_dims(payload) == (32, 8)
    assert mm.png_decode_pixels(payload) == (32, 8, "RGB", raw)

    out = mm.resize_pixels(payload, box=4)  # 32x8 -> 4x1
    w, h, mode, got = mm.png_decode_pixels(out)
    assert (w, h, mode) == (4, 1, "RGB")
    # center-based grid (Pillow's NEAREST convention): row (2*0+1)*8//2=4,
    # columns (2x+1)*32//8 = 4, 12, 20, 28
    want = b"".join(bytes(pixel(x, 4)) for x in (4, 12, 20, 28))
    assert got == want


def test_png_palette_depalettizes():
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    plte = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255))  # red, green, blue
    idx = b"\x00" + bytes((0, 1, 2)) + b"\x00" + bytes((2, 1, 0))
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(idx)) + chunk(b"IEND", b"")
    )
    w, h, mode, raw = mm.png_decode_pixels(payload)
    assert (w, h, mode) == (3, 2, "RGB")
    assert raw == bytes(
        (255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0)
    )


def test_png_unsupported_profiles_refused_by_name():
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    base = lambda ihdr: (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b"")
    )
    # depth 16 decodes since r8 (high-byte reduction, see the depth
    # tests below) — depth 3 stays structurally invalid
    with pytest.raises(ValueError, match="bit depth"):
        mm.png_decode_pixels(base(struct.pack(">IIBBBBB", 1, 1, 3, 0, 0, 0, 0)))
    with pytest.raises(ValueError, match="interlace method"):
        mm.png_decode_pixels(base(struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)))
    with pytest.raises(ValueError, match="PLTE"):
        mm.png_decode_pixels(base(struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)))
    sixteen = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\xAB\xCD"))  # filter + 1 sample
        + chunk(b"IEND", b"")
    )
    assert mm.png_decode_pixels(sixteen) == (1, 1, "L", b"\xAB")
    # Adam7 interlace is SUPPORTED since r8 (a 1x1 interlaced image is a
    # single pass-1 scanline) — proves the profile left the refusal list
    w, h, mode, raw = mm.png_decode_pixels(
        base(struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1))
    )
    assert (w, h, mode, raw) == (1, 1, "L", b"\x00")


def test_decode_query_runtime_selection(spark):
    """The multimodal_decode plumbing on a MIXED corpus: real image
    payloads decode via headers, text payloads via the fallback — one
    job, per-row selection, exactly what a 100 TB mixed crawl needs."""
    import pandas as pd

    rows = [
        (1, _png(640, 480)),
        (2, _gif(13, 37)),
        (3, _jpeg(1920, 1080)),
        (4, b"just some text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    def decode(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, src = mm.decode_meta(bytes(payload))
                out.append((doc_id, w, h, src))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "source"]
            )

    got = {
        r["doc_id"]: (r["width"], r["height"], r["source"])
        for r in df.mapInPandas(
            decode, "doc_id long, width long, height long, source string"
        ).collect()
    }
    assert got[1] == (640, 480, "header")
    assert got[2] == (13, 37, "header")
    assert got[3] == (1920, 1080, "header")
    fw, fh = mm.fake_dims(b"just some text")
    assert got[4] == (fw, fh, "synthetic")


def test_text_with_gif_magic_stays_synthetic():
    """GIF's magic is printable ASCII, so prose can start with it; the
    strict sniff used by the tier selector must keep such payloads on the
    deterministic-fake tier rather than decoding text bytes as dims."""
    prose = "GIF87a is one of two versions of the format".encode()
    assert mm.sniff_format(prose) == "gif"  # magic-only: ambiguous
    assert mm.sniff_format(prose, strict=True) is None
    _w, _h, src = mm.decode_meta(prose)
    assert src == "synthetic"

    # real GIFs pass strict: trailer right after the screen descriptor...
    g = _gif(13, 37)
    assert mm.sniff_format(g, strict=True) == "gif"
    assert mm.decode_meta(g) == (13, 37, "header")
    # ...and with a flagged global color table before the first block
    packed = 0x80  # table present, size 2^(0+1)=2 entries -> 6 bytes
    g2 = (
        b"GIF89a" + struct.pack("<HH", 5, 7) + bytes([packed, 0, 0])
        + b"\x00" * 6 + b"\x2c"
    )
    assert mm.sniff_format(g2, strict=True) == "gif"
    assert mm.decode_meta(g2) == (5, 7, "header")


# --- property tests: the PNG codec holds for arbitrary images ---

from hypothesis import given, settings, strategies as st  # noqa: E402

_MODES = st.sampled_from(["L", "LA", "RGB", "RGBA"])


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    mode=_MODES,
    seed=st.integers(0, 2**32 - 1),
)
def test_png_encode_decode_identity_property(w, h, mode, seed):
    """encode → decode is the identity for every mode/shape/content."""
    import random

    rnd = random.Random(seed)
    raw = bytes(rnd.randrange(256) for _ in range(w * h * len(mode)))
    assert mm.png_decode_pixels(mm.png_encode(w, h, mode, raw)) == (
        w, h, mode, raw,
    )


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    box=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_resize_property(w, h, box, seed):
    """resize_pixels output: exact fit_box dims, decodable, and every
    output pixel is a pixel of the source (nearest-neighbor picks, never
    interpolates)."""
    import random

    rnd = random.Random(seed)
    raw = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    out = mm.resize_pixels(mm.png_encode(w, h, "RGB", raw), box=box)
    ow, oh, mode, got = mm.png_decode_pixels(out)
    assert (ow, oh) == mm.fit_box(w, h, box) and mode == "RGB"
    src_pixels = {raw[i : i + 3] for i in range(0, len(raw), 3)}
    for i in range(0, len(got), 3):
        assert got[i : i + 3] in src_pixels


@settings(max_examples=120, deadline=None)
@given(
    cut=st.integers(0, 200),
    flip_pos=st.integers(0, 199),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
)
def test_png_decoder_malformed_inputs_fail_cleanly(cut, flip_pos, flip_val, mode):
    """Arbitrary truncations/corruptions of a valid PNG must either decode
    or raise ValueError — never hang, never leak struct/zlib internals,
    never return garbage silently accepted as a different shape."""
    base = mm.png_encode(9, 7, "RGB", bytes((i * 13) % 256 for i in range(9 * 7 * 3)))
    data = bytearray(base)
    if mode in ("truncate", "both"):
        data = data[: max(8, len(data) - cut % len(data))]
    if mode in ("flip", "both") and flip_pos < len(data):
        data[flip_pos] ^= flip_val
    try:
        w, h, m, raw = mm.png_decode_pixels(bytes(data))
    except ValueError:
        return  # named, controlled refusal
    assert len(raw) == w * h * len(m)


def test_png_decompression_bomb_capped():
    """A tiny IDAT claiming giant dims must refuse BEFORE allocating."""
    import struct as _st
    import zlib as _zl

    def chunk(tag, body):
        return (
            _st.pack(">I", len(body)) + tag + body
            + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = _st.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 0, 0, 0, 0)  # 1 Gpx
    bomb = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zl.compress(b"\x00")) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="megapixel"):
        mm.png_decode_pixels(bomb)


def test_png_idat_bomb_with_small_dims_refused():
    """A small-dims header whose IDAT inflates far beyond h scanlines must
    refuse with a bounded allocation — the inflate is capped at the
    expected pixel-stream size, so the bomb never materializes."""
    import struct as _st
    import zlib as _zl

    def chunk(tag, body):
        return (
            _st.pack(">I", len(body)) + tag + body
            + _st.pack(">I", _zl.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = _st.pack(">IIBBBBB", 10, 10, 8, 0, 0, 0, 0)  # claims 10x10
    bomb_idat = _zl.compress(b"\x00" * (64 << 20))  # inflates to 64 MB
    assert len(bomb_idat) < 1 << 17  # the payload itself is tiny
    bomb = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb_idat) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates"):
        mm.png_decode_pixels(bomb)


def test_adam7_interlaced_png_decodes():
    """Hand-assemble an Adam7-interlaced PNG (our encoder is sequential
    only): the same RGB image stored as 7 independently-filtered passes
    must decode to the SAME pixels as the sequential encoding — exercises
    pass geometry, per-pass unfiltering, and the scatter."""
    from bravo_spark.inventory.multimodal import _adam7_passes

    for w, h in [(12, 9), (8, 8), (1, 1), (3, 2), (17, 5)]:
        pixel = lambda x, y: ((x * 37) % 256, (y * 53) % 256, (x + y) % 256)
        raw = bytes(c for y in range(h) for x in range(w) for c in pixel(x, y))
        # per-pass streams, filter type 0 on every scanline
        passes = bytearray()
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            for j in range(ph):
                passes.append(0)
                for i in range(pw):
                    passes += bytes(pixel(x0 + i * dx, y0 + j * dy))

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
        payload = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(passes)))
            + chunk(b"IEND", b"")
        )
        gw, gh, mode, got = mm.png_decode_pixels(payload)
        assert (gw, gh, mode) == (w, h, "RGB"), (w, h)
        assert got == raw, f"interlaced {w}x{h} drifted"


def test_adam7_bad_inflate_size_refused():
    """An interlaced header whose IDAT inflates to the SEQUENTIAL size
    (missing the extra per-pass filter bytes) must refuse loudly."""
    w, h = 12, 9
    raw_seq = bytes((0,)) * 0
    lines = b"".join(b"\x00" + bytes(w * 3) for _ in range(h))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates to"):
        mm.png_decode_pixels(payload)


def _png_chunked(ihdr_body: bytes, idat_raw: bytes, plte: bytes | None = None) -> bytes:
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")


def test_png_sub_byte_palette_depths():
    """1/2/4-bit palette PNGs (MSB-first packing, padded row tails)
    depalettize to the same RGB as the equivalent 8-bit encoding."""
    plte = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7))  # 4 colors
    for depth, w in ((1, 10), (2, 7), (4, 5)):
        h = 3
        maxidx = min(4, 1 << depth) - 1
        idx = [[(x + y) % (maxidx + 1) for x in range(w)] for y in range(h)]
        per_byte = 8 // depth
        rows = bytearray()
        for y in range(h):
            rows.append(0)  # filter None
            acc, n, line = 0, 0, bytearray()
            for x in range(w):
                acc = (acc << depth) | idx[y][x]
                n += 1
                if n == per_byte:
                    line.append(acc)
                    acc, n = 0, 0
            if n:
                line.append(acc << (depth * (per_byte - n)))
            rows += line
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        gw, gh, mode, raw = mm.png_decode_pixels(_png_chunked(ihdr, bytes(rows), plte))
        assert (gw, gh, mode) == (w, h, "RGB")
        want = bytes(
            c for y in range(h) for x in range(w)
            for c in plte[idx[y][x] * 3 : idx[y][x] * 3 + 3]
        )
        assert raw == want, f"depth {depth}"


def test_png_one_bit_gray_scales_to_full_range():
    # 1-bit gray: 0 -> 0, 1 -> 255 (sample scaling, not raw bit values)
    w, h = 9, 2
    rows = bytearray()
    for y in range(h):
        rows.append(0)
        rows += bytes([0b10101010, 0b10000000] if y == 0 else [0b01010101, 0])
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)
    gw, gh, mode, raw = mm.png_decode_pixels(_png_chunked(ihdr, bytes(rows)))
    assert (gw, gh, mode) == (w, h, "L")
    assert raw[:9] == bytes([255, 0, 255, 0, 255, 0, 255, 0, 255])
    assert raw[9:] == bytes([0, 255, 0, 255, 0, 255, 0, 255, 0])


def test_png_16_bit_reduces_to_high_byte():
    """16-bit samples decode via the standard high-byte reduction — the
    gradient survives, Sub filtering at the 2-byte distance included."""
    w, h = 6, 2
    rows = bytearray()
    samples = [[(x * 4096 + y * 999) & 0xFFFF for x in range(w)] for y in range(h)]
    for y in range(h):
        rows.append(0)
        for x in range(w):
            rows += struct.pack(">H", samples[y][x])
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    gw, gh, mode, raw = mm.png_decode_pixels(_png_chunked(ihdr, bytes(rows)))
    assert (gw, gh, mode) == (w, h, "L")
    assert raw == bytes(s >> 8 for row in samples for s in row)
    # RGB 16-bit with a Sub-filtered row
    w = 4
    px0 = [struct.pack(">HHH", x * 1000, 65535 - x * 900, x * 77) for x in range(w)]
    line0 = b"".join(px0)
    row0 = b"\x00" + line0
    # row 1 = row 0 shifted; encode with Sub (type 1, bpp=6)
    line1 = b"".join(struct.pack(">HHH", x * 1000 + 256, 65535 - x * 900 - 512,
                                 x * 77 + 3) for x in range(w))
    filt = bytearray(b"\x01")
    for i in range(len(line1)):
        a = line1[i - 6] if i >= 6 else 0
        filt.append((line1[i] - a) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, 2, 16, 2, 0, 0, 0)
    gw, gh, mode, raw = mm.png_decode_pixels(_png_chunked(ihdr, bytes(row0 + filt)))
    assert (gw, gh, mode) == (w, 2, "RGB")
    want0 = bytes(b for p in px0 for b in p[0::2])
    assert raw[: w * 3] == want0
    assert raw[w * 3 : w * 3 + 3] == bytes(
        (256 >> 8, (65535 - 512) >> 8, 3 >> 8)
    )


def test_png_invalid_depth_combos_refused():
    for depth, ctype, msg in (
        (16, 3, "16-bit palette"),
        (2, 2, "only valid for gray/palette"),
        (3, 0, "bit depth 3"),
    ):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, ctype, 0, 0, 0)
        with pytest.raises(ValueError, match=msg):
            mm.png_decode_pixels(_png_chunked(ihdr, b"\x00\x00"))


def test_bilinear_resample_linear_gradient_closed_form():
    """Bilinear interpolation reproduces linear polynomials: resampling
    p + q*x + r*y gives the gradient evaluated at the fixed-point source
    coordinates with one half-up rounding — the exactness the oracle of
    multimodal_bilinear_resize relies on."""
    from bravo_spark.inventory.multimodal import resample_bilinear

    w, h, p, q, r = 11, 9, 30, 4, 3
    raw = bytes(p + q * x + r * y for y in range(h) for x in range(w))
    ow, oh = 16, 10
    out = resample_bilinear(raw, w, h, 1, ow, oh)
    dx, dy = 2 * ow, 2 * oh
    for idx, v in enumerate(out):
        sx = min(max((2 * (idx % ow) + 1) * w - ow, 0), (w - 1) * dx)
        sy = min(max((2 * (idx // ow) + 1) * h - oh, 0), (h - 1) * dy)
        num = p * dx * dy + q * sx * dy + r * sy * dx
        assert v == (num + dx * dy // 2) // (dx * dy), idx


def test_bilinear_identity_and_edges():
    from bravo_spark.inventory.multimodal import resample_bilinear

    raw = bytes(range(24))
    # identity resize returns the input exactly (all weights land on taps)
    assert resample_bilinear(raw, 6, 4, 1, 6, 4) == raw
    # 1x1 output of a constant image is the constant
    assert resample_bilinear(bytes([77] * 25), 5, 5, 1, 1, 1) == bytes([77])
    # 1-pixel source upscales to the constant
    assert resample_bilinear(bytes([9]), 1, 1, 1, 4, 4) == bytes([9] * 16)
    # RGB interleave: channels resample independently
    rgb = bytes([10, 200, 50] * 4)
    assert resample_bilinear(rgb, 2, 2, 3, 1, 1) == bytes([10, 200, 50])


def test_perceptual_hashes_properties():
    from bravo_spark.inventory.multimodal import ahash64, dhash64

    w, h = 24, 16
    raw = bytes(
        50 + 4 * min(x, w - 1 - x) + 2 * y
        for y in range(h) for x in range(w)
    )
    d, a = dhash64(raw, w, h, 1), ahash64(raw, w, h, 1)
    assert 0 <= d < (1 << 64) and 0 <= a < (1 << 64)
    # neither degenerate on structured content
    assert 8 <= bin(d).count("1") <= 56
    assert 8 <= bin(a).count("1") <= 56
    # exact brightness-shift invariance (the dedup-key contract)
    shifted = bytes(v + 7 for v in raw)
    assert dhash64(shifted, w, h, 1) == d
    assert ahash64(shifted, w, h, 1) == a
    # deterministic across calls and sensitive to real content change
    # (a 180-degree rotation of this symmetric tent is dHash-IDENTICAL —
    # that's correct behavior, so probe with a monotone ramp instead)
    assert dhash64(raw, w, h, 1) == d
    ramp = bytes(50 + 4 * x + 2 * y for y in range(h) for x in range(w))
    assert dhash64(ramp, w, h, 1) != d
    # RGB converts via integer 601 luma; a gray RGB triples to the same
    rgb = bytes(b for v in raw for b in (v, v, v))
    assert dhash64(rgb, w, h, 3) == d
    assert ahash64(rgb, w, h, 3) == a
