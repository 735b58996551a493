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
    if mm.pil_available():
        pytest.skip("Pillow installed — refusal path not reachable")
    with pytest.raises(ImportError, match="Pillow"):
        mm.decode_pixels(_png(4, 4))
    with pytest.raises(ImportError, match="Pillow"):
        mm.resize_pixels(_png(4, 4))


@pytest.mark.skipif(not mm.pil_available(), reason="Pillow not installed")
def test_pixel_tier_real_decode():
    payload = _png(12, 5)
    w, h, mode, raw = mm.decode_pixels(payload)
    assert (w, h) == (12, 5)
    assert len(raw) == 12 * 5  # 8-bit grayscale
    assert raw == b"\x00" * 60


@pytest.mark.skipif(not mm.pil_available(), reason="Pillow not installed")
def test_pixel_tier_real_resize():
    out = mm.resize_pixels(_png(512, 128))
    assert mm.parse_image_dims(out) == (256, 64)


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
