"""EXIF codec (inventory/exif.py): hand-assembled spec vectors, both
byte orders, GPS rational signs, strip/insert idempotence, and
malformation strictness."""

from __future__ import annotations

import struct

import pytest

from bravo_spark.inventory.exif import (
    ExifError,
    build_exif_app1,
    insert_exif,
    parse_exif,
    strip_exif,
)

# a minimal but real baseline JPEG (SOI + APP0/JFIF + EOI is not enough
# for our marker walker only up to SOS; segments() stops at SOS, so a
# truncated-but-marker-valid stream works for metadata purposes)
_JPEG = (
    b"\xff\xd8"  # SOI
    b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    b"\xff\xdb\x00\x05\x00\x00\x00"  # tiny (bogus-but-framed) DQT
    b"\xff\xd9"  # EOI treated as data past walker's interest
)


def _with_exif(**kw) -> bytes:
    return insert_exif(_JPEG, build_exif_app1(**kw))


def test_hand_assembled_spec_vector_parses():
    # TIFF built by hand from TIFF 6.0 / EXIF 2.3: II, magic 42, IFD0 at
    # 8 with ONE entry (Orientation=6), no next IFD
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<H", 6) + b"\x00\x00"
        + struct.pack("<I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    meta = parse_exif(_JPEG[:2] + app1 + _JPEG[2:])
    assert meta["orientation"] == 6 and meta["byte_order"] == "II"
    assert meta["gps"] is None


def test_hand_assembled_big_endian_vector_parses():
    # the MM twin, built by hand: big-endian shorts/longs, value
    # left-justified within the 4-byte field (TIFF 6.0 §2)
    tiff = (
        b"MM" + struct.pack(">HI", 42, 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 3) + b"\x00\x00"
        + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    meta = parse_exif(_JPEG[:2] + app1 + _JPEG[2:])
    assert meta["orientation"] == 3 and meta["byte_order"] == "MM"


@pytest.mark.parametrize("order", ["II", "MM"])
def test_roundtrip_orientation_datetime_gps(order):
    jpeg = _with_exif(
        orientation=5,
        datetime_str="2026:01/01 00:00:00".replace("/", ":"),
        gps=(48.8583, 2.2945),
        byte_order=order,
    )
    meta = parse_exif(jpeg)
    assert meta["byte_order"] == order
    assert meta["orientation"] == 5
    assert meta["datetime"] == "2026:01:01 00:00:00"
    lat, lon = meta["gps"]
    assert abs(lat - 48.8583) < 1e-4 and abs(lon - 2.2945) < 1e-4


def test_gps_south_west_signs():
    meta = parse_exif(_with_exif(gps=(-33.8688, -151.2093 + 302.4186)))
    lat, lon = meta["gps"]
    assert lat < 0 and lon > 0
    meta = parse_exif(_with_exif(gps=(-33.8688, -151.2093)))
    lat, lon = meta["gps"]
    assert abs(lat + 33.8688) < 1e-4 and abs(lon + 151.2093) < 1e-4


def test_strip_removes_exif_only():
    jpeg = _with_exif(orientation=3, gps=(1.0, 2.0))
    clean = strip_exif(jpeg)
    assert parse_exif(clean) is None
    assert clean == _JPEG  # nothing else touched
    assert strip_exif(clean) == clean  # idempotent


def test_xmp_app1_passes_through():
    xmp = b"http://ns.adobe.com/xap/1.0/\x00<x/>"
    app1 = b"\xff\xe1" + struct.pack(">H", len(xmp) + 2) + xmp
    jpeg = _JPEG[:2] + app1 + _JPEG[2:]
    assert parse_exif(jpeg) is None
    assert strip_exif(jpeg) == jpeg  # XMP survives redaction


def test_insert_is_idempotent_replace():
    j1 = _with_exif(orientation=2)
    j2 = insert_exif(j1, build_exif_app1(orientation=7))
    assert parse_exif(j2)["orientation"] == 7
    assert j2.count(b"Exif\x00\x00") == 1


def test_malformed_raises():
    with pytest.raises(ExifError, match="SOI"):
        parse_exif(b"PNG...")
    bad_tiff = b"Exif\x00\x00" + b"XX" + struct.pack("<HI", 42, 8)
    app1 = b"\xff\xe1" + struct.pack(">H", len(bad_tiff) + 2) + bad_tiff
    with pytest.raises(ExifError, match="byte order"):
        parse_exif(_JPEG[:2] + app1 + _JPEG[2:])
    # APP1 whose declared length overruns the available bytes
    overrun = b"\xff\xd8\xff\xe1\x00\x50Exif\x00\x00II" + b"\x00" * 4
    with pytest.raises(ExifError, match="overruns"):
        parse_exif(overrun)
    # IFD0 offset pointing past the TIFF stream
    tiff = b"II" + struct.pack("<HI", 42, 9999)
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    with pytest.raises(ExifError, match="out of range"):
        parse_exif(_JPEG[:2] + app1 + _JPEG[2:])


def test_real_decoder_still_reads_tagged_image(spark):
    """End-to-end with the repo's own JPEG codec: a pixel-real JPEG
    gains EXIF, the decoder still decodes it, and redaction keeps the
    pixel stream byte-identical."""
    import numpy as np

    from bravo_spark.inventory.jpeg import jpeg_decode_pixels, jpeg_encode

    raw = bytes((x * 8 + y) % 256 for y in range(16) for x in range(16))
    base = jpeg_encode(16, 16, "L", raw)
    tagged = insert_exif(base, build_exif_app1(orientation=8,
                                               gps=(10.5, -20.25)))
    w, h, mode, pix = jpeg_decode_pixels(tagged)
    assert (w, h) == (16, 16)
    assert parse_exif(tagged)["orientation"] == 8
    redacted = strip_exif(tagged)
    assert parse_exif(redacted) is None
    assert jpeg_decode_pixels(redacted)[3] == pix


def test_zero_denominator_gps_raises_exif_error():
    # real-world corrupt EXIF carries 0/0 rationals; the error class
    # must stay ExifError so redaction pipelines can quarantine by type
    jpeg = _with_exif(gps=(10.0, 20.0))
    span_start = jpeg.find(b"Exif\x00\x00")
    tiff = bytearray(jpeg)
    # zero out every rational denominator (4-byte LE words following
    # the GPS values area): simplest surgical corruption — find the
    # degree numerator 10 and zero its denominator word
    import struct as _struct

    needle = _struct.pack("<II", 10, 1)
    at = jpeg.find(needle, span_start)
    assert at > 0
    tiff[at + 4:at + 8] = b"\x00\x00\x00\x00"
    with pytest.raises(ExifError, match="zero denominator"):
        parse_exif(bytes(tiff))


def test_gps_pointer_with_count_gt1_raises_exif_error():
    jpeg = _with_exif(gps=(10.0, 20.0))
    import struct as _struct

    # find the GPS-IFD pointer entry (tag 0x8825, type LONG, count 1)
    # and bump its count to 2 so _value returns a tuple
    needle = _struct.pack("<HHI", 0x8825, 4, 1)
    at = jpeg.find(needle)
    assert at > 0
    bad = bytearray(jpeg)
    bad[at + 4:at + 8] = _struct.pack("<I", 2)
    with pytest.raises(ExifError):
        parse_exif(bytes(bad))


def test_apply_orientation_all_eight_hand_pinned():
    """3x2 grid [[0,1,2],[3,4,5]] through every EXIF 2.3 orientation,
    expected outputs derived by hand from the spec's table 6."""
    import numpy as np

    from bravo_spark.inventory.exif import apply_orientation

    raw = bytes(range(6))
    expected = {
        1: [[0, 1, 2], [3, 4, 5]],
        2: [[2, 1, 0], [5, 4, 3]],
        3: [[5, 4, 3], [2, 1, 0]],
        4: [[3, 4, 5], [0, 1, 2]],
        5: [[0, 3], [1, 4], [2, 5]],
        6: [[3, 0], [4, 1], [5, 2]],
        7: [[5, 2], [4, 1], [3, 0]],
        8: [[2, 5], [1, 4], [0, 3]],
    }
    for o, want in expected.items():
        out, w, h = apply_orientation(raw, 3, 2, o)
        got = np.frombuffer(out, np.uint8).reshape(h, w).tolist()
        assert got == want, (o, got)
        assert (w, h) == ((2, 3) if o >= 5 else (3, 2))


def test_apply_orientation_involutions_and_inverses():
    import numpy as np

    from bravo_spark.inventory.exif import apply_orientation

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    raw = img.tobytes()
    # flips and 180 are involutions
    for o in (2, 3, 4, 5, 7):
        once, w1, h1 = apply_orientation(raw, 24, 16, o)
        twice, w2, h2 = apply_orientation(once, w1, h1, o)
        assert (twice, w2, h2) == (raw, 24, 16), o
    # 90 CW then 270 CW is identity
    r90, w1, h1 = apply_orientation(raw, 24, 16, 6)
    back, w2, h2 = apply_orientation(r90, w1, h1, 8)
    assert (back, w2, h2) == (raw, 24, 16)


def test_apply_orientation_rejects_out_of_range():
    from bravo_spark.inventory.exif import apply_orientation

    with pytest.raises(ExifError, match="1..8"):
        apply_orientation(b"\x00" * 6, 3, 2, 9)
    with pytest.raises(ExifError, match="1..8"):
        apply_orientation(b"\x00" * 6, 3, 2, 0)


def test_redact_exif_column(spark):
    """llmops.redact_exif over a mixed binary column: tagged JPEGs are
    scrubbed and flagged, untagged JPEGs and non-JPEGs pass through."""
    from bravo_spark import llmops
    from bravo_spark.inventory.jpeg import jpeg_encode

    raw = bytes((x + y) % 256 for y in range(8) for x in range(8))
    base = jpeg_encode(8, 8, "L", raw)
    tagged = insert_exif(base, build_exif_app1(orientation=6,
                                               gps=(1.0, 2.0)))
    df = spark.createDataFrame(
        [(1, tagged), (2, base), (3, b"not a jpeg"), (4, None)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in
            llmops.redact_exif(df, "payload").collect()}
    assert rows[1].exif_redacted == 1
    assert parse_exif(bytes(rows[1].payload)) is None
    assert bytes(rows[1].payload) == base  # splice back to the original
    assert rows[2].exif_redacted == 0 and bytes(rows[2].payload) == base
    assert rows[3].exif_redacted == 0
    assert rows[4].payload is None and rows[4].exif_redacted == 0


def test_redact_exif_refuses_column_collisions(spark):
    from bravo_spark import llmops

    df = spark.createDataFrame(
        [(1, b"x", 0)], "doc_id long, payload binary, exif_redacted int"
    )
    with pytest.raises(ValueError, match="flag_col"):
        llmops.redact_exif(df, "payload")
    df2 = spark.createDataFrame(
        [(1, b"x", b"y")], "doc_id long, payload binary, other binary"
    )
    with pytest.raises(ValueError, match="overwrite"):
        llmops.redact_exif(df2, "payload", out_col="other")


def test_gps_seconds_rounding_carries_into_minutes_and_degrees():
    """Fractions just under a minute round to 60.00 s — the encoder must
    carry into minutes (and degrees at 59'59.995"+) instead of emitting
    an out-of-range 6000/100 seconds rational that parses one unit high."""
    from bravo_spark.inventory.exif import _deg_to_rationals

    # 10° 59' 59.9999" -> carries all the way to 11° 0' 0"
    assert _deg_to_rationals(10 + 59 / 60 + 59.9999 / 3600) == [
        (11, 1), (0, 1), (0, 100)]
    # 10° 30' 59.9999" -> carries into minutes only
    assert _deg_to_rationals(10 + 30 / 60 + 59.9999 / 3600) == [
        (10, 1), (31, 1), (0, 100)]
    # full encode->parse roundtrip stays within a rounding ulp
    deg = 10 + 59 / 60 + 59.9999 / 3600
    meta = parse_exif(_with_exif(gps=(deg, deg)))
    lat, _ = meta["gps"]
    assert abs(lat - deg) < 1e-4


def test_redact_exif_quarantine_isolates_torn_jpegs(spark):
    """Default stays fail-loud; quarantine=True nulls torn payloads and
    flags them -1 instead of killing the job — a torn marker stream may
    still carry intact Exif, so it must never pass through unredacted."""
    from pyspark.errors.exceptions.captured import PythonException

    from bravo_spark import llmops
    from bravo_spark.inventory.jpeg import jpeg_encode

    raw = bytes((x * y) % 256 for y in range(8) for x in range(8))
    base = jpeg_encode(8, 8, "L", raw)
    tagged = insert_exif(base, build_exif_app1(orientation=2))
    torn = tagged[: len(tagged) // 2]  # SOI intact, marker stream torn
    df = spark.createDataFrame(
        [(1, tagged), (2, torn), (3, b"plain text")],
        "doc_id long, payload binary",
    )

    with pytest.raises(PythonException, match="overruns the file"):
        llmops.redact_exif(df, "payload").collect()

    rows = {r.doc_id: r for r in
            llmops.redact_exif(df, "payload", quarantine=True).collect()}
    assert rows[1].exif_redacted == 1 and bytes(rows[1].payload) == base
    assert rows[2].exif_redacted == -1 and rows[2].payload is None
    assert rows[3].exif_redacted == 0
