"""EXIF (TIFF-IFD-in-APP1) parse / build / strip for JPEG payloads.

The multimodal-pipeline metadata step: orientation decides whether
pixels need rotating before feature extraction, and GPS tags are PII
that a training-data pipeline must detect and REDACT before anything
else touches the corpus. Pure Python over the public specs (JEITA
CP-3451 EXIF 2.3 / TIFF 6.0): an APP1 segment tagged ``Exif\\0\\0``
carries a TIFF stream — byte-order mark ``II``/``MM``, magic 42, then
linked IFDs of 12-byte entries ``(tag, type, count, value-or-offset)``.

Surface: IFD0's Orientation (0x0112), DateTime (0x0132), and the GPS
sub-IFD (pointer 0x8825) with latitude/longitude refs + rationals.
Unknown tags are ignored on read (the spec's own forward-compat rule);
XMP and other non-Exif APP1 segments are left untouched by
:func:`strip_exif`. Malformed TIFF structures raise :class:`ExifError`
with the failing offset — silent best-effort parsing is how GPS PII
survives a redaction pass.
"""

from __future__ import annotations

import struct

_SOI = b"\xff\xd8"
_EXIF_HEADER = b"Exif\x00\x00"

# TIFF field types → byte widths (the ones EXIF uses)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_GPS_IFD = 0x8825
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004


class ExifError(ValueError):
    """Malformed JPEG marker stream or TIFF/EXIF structure."""


# ---------------------------------------------------------------------------
# JPEG marker walking
# ---------------------------------------------------------------------------


def _segments(jpeg: bytes):
    """Yield ``(marker, start, end)`` for each marker segment up to SOS.
    ``start``/``end`` bound the whole segment including the FF-marker."""
    if jpeg[:2] != _SOI:
        raise ExifError("not a JPEG (missing SOI)")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            raise ExifError(f"expected marker at byte {pos}")
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS — entropy data follows, stop walking
            return
        seg_len = struct.unpack(">H", jpeg[pos + 2:pos + 4])[0]
        end = pos + 2 + seg_len
        if end > n:
            raise ExifError(f"segment at byte {pos} overruns the file")
        yield marker, pos, end
        pos = end


def _find_exif_app1(jpeg: bytes) -> tuple[int, int] | None:
    for marker, start, end in _segments(jpeg):
        if marker == 0xE1 and jpeg[start + 4:start + 10] == _EXIF_HEADER:
            return start, end
    return None


# ---------------------------------------------------------------------------
# TIFF decode
# ---------------------------------------------------------------------------


def _read_ifd(tiff: bytes, fmt: str, off: int) -> dict[int, tuple]:
    if off + 2 > len(tiff):
        raise ExifError(f"IFD offset {off} out of range")
    (count,) = struct.unpack_from(fmt + "H", tiff, off)
    entries: dict[int, tuple] = {}
    pos = off + 2
    for _ in range(count):
        if pos + 12 > len(tiff):
            raise ExifError(f"IFD entry at {pos} truncated")
        tag, ftype, n = struct.unpack_from(fmt + "HHI", tiff, pos)
        size = _TYPE_SIZES.get(ftype)
        if size is None:
            pos += 12  # unknown field type: spec says skip the entry
            continue
        total = size * n
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(fmt + "I", tiff, pos + 8)
            if voff + total > len(tiff):
                raise ExifError(f"tag 0x{tag:04x} value overruns TIFF data")
        entries[tag] = (ftype, n, voff)
        pos += 12
    return entries


def _value(tiff: bytes, fmt: str, entry: tuple):
    ftype, n, off = entry
    if ftype == 2:  # ASCII, NUL-terminated
        raw = tiff[off:off + n]
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if ftype == 3:
        vals = struct.unpack_from(f"{fmt}{n}H", tiff, off)
    elif ftype == 4:
        vals = struct.unpack_from(f"{fmt}{n}I", tiff, off)
    elif ftype == 5:
        raw = struct.unpack_from(f"{fmt}{2 * n}I", tiff, off)
        vals = tuple(
            (raw[2 * i], raw[2 * i + 1]) for i in range(n)
        )
    elif ftype in (1, 7):
        return tiff[off:off + n]
    else:  # pragma: no cover - filtered by _TYPE_SIZES
        raise ExifError(f"unhandled type {ftype}")
    return vals[0] if n == 1 else vals


def _rational_to_deg(triplet) -> float:
    try:
        (dn, dd), (mn, md), (sn, sd) = triplet
    except (TypeError, ValueError) as exc:
        raise ExifError(f"GPS coordinate is not a rational triplet: {exc}")
    if 0 in (dd, md, sd):
        # 0/0 rationals are common in real-world corrupt EXIF; a bare
        # ZeroDivisionError would bypass callers' ExifError quarantine
        raise ExifError("zero denominator in GPS rational")
    return dn / dd + mn / md / 60 + sn / sd / 3600


def parse_exif(jpeg: bytes) -> dict | None:
    """→ ``{"byte_order", "orientation", "datetime", "gps"}`` or ``None``
    when no Exif APP1 exists. ``gps`` is ``(signed_lat_deg,
    signed_lon_deg)`` or ``None``; refs S/W negate."""
    span = _find_exif_app1(jpeg)
    if span is None:
        return None
    tiff = jpeg[span[0] + 10:span[1]]
    if len(tiff) < 8:
        raise ExifError("TIFF stream truncated")
    order = tiff[:2]
    if order == b"II":
        fmt = "<"
    elif order == b"MM":
        fmt = ">"
    else:
        raise ExifError(f"bad TIFF byte order {order!r}")
    magic, ifd0_off = struct.unpack_from(fmt + "HI", tiff, 2)
    if magic != 42:
        raise ExifError(f"bad TIFF magic {magic}")
    ifd0 = _read_ifd(tiff, fmt, ifd0_off)
    out: dict = {
        "byte_order": order.decode(),
        "orientation": None,
        "datetime": None,
        "gps": None,
    }
    if TAG_ORIENTATION in ifd0:
        out["orientation"] = _value(tiff, fmt, ifd0[TAG_ORIENTATION])
    if TAG_DATETIME in ifd0:
        out["datetime"] = _value(tiff, fmt, ifd0[TAG_DATETIME])
    if TAG_GPS_IFD in ifd0:
        gps_off = _value(tiff, fmt, ifd0[TAG_GPS_IFD])
        if not isinstance(gps_off, int):
            raise ExifError(f"GPS IFD pointer is not a scalar: {gps_off!r}")
        gps = _read_ifd(tiff, fmt, gps_off)
        if GPS_LAT in gps and GPS_LON in gps:
            lat = _rational_to_deg(_value(tiff, fmt, gps[GPS_LAT]))
            lon = _rational_to_deg(_value(tiff, fmt, gps[GPS_LON]))
            if str(_value(tiff, fmt, gps.get(GPS_LAT_REF, (2, 1, 0)))) == "S":
                lat = -lat
            if str(_value(tiff, fmt, gps.get(GPS_LON_REF, (2, 1, 0)))) == "W":
                lon = -lon
            out["gps"] = (lat, lon)
    return out


# ---------------------------------------------------------------------------
# TIFF encode
# ---------------------------------------------------------------------------


def _deg_to_rationals(deg: float) -> list[tuple[int, int]]:
    deg = abs(deg)
    d = int(deg)
    m = int((deg - d) * 60)
    s = round(((deg - d) * 60 - m) * 60 * 100)
    # rounding can land on exactly 60.00 s for fractions just under a
    # minute — carry into minutes (and degrees) so the parse-back value
    # never floors one unit high
    if s == 6000:
        s, m = 0, m + 1
        if m == 60:
            m, d = 0, d + 1
    return [(d, 1), (m, 1), (s, 100)]


def build_exif_app1(
    *,
    orientation: int = 1,
    datetime_str: str | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Serialize a complete APP1 Exif segment (marker + length + payload)
    carrying IFD0 (orientation, optional datetime) and, when ``gps`` is
    given, a GPS sub-IFD with ref + rational triplets. Deterministic
    layout: IFD0, IFD0 out-of-line values, GPS IFD, GPS values."""
    if byte_order not in ("II", "MM"):
        raise ExifError(f"byte_order must be II or MM, got {byte_order!r}")
    fmt = "<" if byte_order == "II" else ">"

    ifd0: list[tuple[int, int, int, bytes | int]] = [
        (TAG_ORIENTATION, 3, 1, orientation),
    ]
    if datetime_str is not None:
        ifd0.append((TAG_DATETIME, 2, len(datetime_str) + 1,
                     datetime_str.encode("ascii") + b"\x00"))

    gps_entries: list[tuple[int, int, int, bytes | int]] = []
    if gps is not None:
        lat, lon = gps
        gps_entries = [
            (GPS_LAT_REF, 2, 2, (b"S" if lat < 0 else b"N") + b"\x00"),
            (GPS_LAT, 5, 3, _pack_rationals(fmt, _deg_to_rationals(lat))),
            (GPS_LON_REF, 2, 2, (b"W" if lon < 0 else b"E") + b"\x00"),
            (GPS_LON, 5, 3, _pack_rationals(fmt, _deg_to_rationals(lon))),
        ]
        ifd0.append((TAG_GPS_IFD, 4, 1, 0))  # offset patched below

    def ifd_size(entries) -> int:
        return 2 + 12 * len(entries) + 4

    ifd0.sort(key=lambda e: e[0])  # spec: ascending tag order
    ifd0_off = 8
    ifd0_vals_off = ifd0_off + ifd_size(ifd0)
    ifd0_vals = _collect_overflow(ifd0)
    gps_off = ifd0_vals_off + len(ifd0_vals)
    if gps is not None:
        ifd0 = [
            (t, ft, n, gps_off if t == TAG_GPS_IFD else v)
            for t, ft, n, v in ifd0
        ]
    gps_vals_off = gps_off + (ifd_size(gps_entries) if gps_entries else 0)
    gps_vals = _collect_overflow(gps_entries)

    tiff = bytearray()
    tiff += byte_order.encode() + struct.pack(fmt + "HI", 42, ifd0_off)
    tiff += _pack_ifd(fmt, ifd0, ifd0_vals_off)
    tiff += ifd0_vals
    if gps_entries:
        tiff += _pack_ifd(fmt, gps_entries, gps_vals_off)
        tiff += gps_vals

    payload = _EXIF_HEADER + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def _pack_rationals(fmt: str, rats: list[tuple[int, int]]) -> bytes:
    return b"".join(struct.pack(fmt + "II", a, b) for a, b in rats)


def _collect_overflow(entries) -> bytes:
    """Bytes area for values wider than 4 bytes, in entry order (the
    matching per-entry offsets are assigned by ``_pack_ifd``'s roll)."""
    out = bytearray()
    for _, ftype, n, v in entries:
        if isinstance(v, bytes) and len(v) > 4:
            out += v
            if len(out) % 2:  # spec: word-align offsets
                out += b"\x00"
    return bytes(out)


def _pack_ifd(fmt: str, entries, vals_off: int) -> bytes:
    out = bytearray(struct.pack(fmt + "H", len(entries)))
    roll = vals_off
    for tag, ftype, n, v in entries:
        out += struct.pack(fmt + "HHI", tag, ftype, n)
        if isinstance(v, int):
            if ftype == 3:
                out += struct.pack(fmt + "H", v) + b"\x00\x00"
            else:
                out += struct.pack(fmt + "I", v)
        elif len(v) <= 4:
            out += v.ljust(4, b"\x00")
        else:
            out += struct.pack(fmt + "I", roll)
            roll += len(v) + (len(v) % 2)
    out += struct.pack(fmt + "I", 0)  # next-IFD pointer: none
    return bytes(out)


# ---------------------------------------------------------------------------
# JPEG-level helpers
# ---------------------------------------------------------------------------


def insert_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (replacing any existing
    Exif APP1 so the operation is idempotent)."""
    stripped = strip_exif(jpeg)
    return stripped[:2] + app1 + stripped[2:]


def strip_exif(jpeg: bytes) -> bytes:
    """Remove every Exif APP1 segment; all other segments (including
    XMP APP1s and APP0/JFIF) pass through untouched — redaction must
    not re-encode pixels."""
    out = jpeg
    while True:
        span = _find_exif_app1(out)
        if span is None:
            return out
        out = out[:span[0]] + out[span[1]:]


# ---------------------------------------------------------------------------
# orientation normalization: apply the EXIF orientation to pixels
# ---------------------------------------------------------------------------

# TIFF/EXIF orientation semantics (EXIF 2.3 §4.6.4 table 6): where the
# row-0/column-0 of the STORED image sits in the VISUAL scene. Applying
# the transform below yields the upright image.
_ORIENT_OPS = {
    1: lambda a: a,                        # upright
    2: lambda a: a[:, ::-1],               # mirrored horizontally
    3: lambda a: a[::-1, ::-1],            # rotated 180
    4: lambda a: a[::-1, :],               # mirrored vertically
    5: lambda a: a.transpose(1, 0),        # mirrored + rotated 270 CW
    6: lambda a: a.transpose(1, 0)[:, ::-1],  # rotated 90 CW
    7: lambda a: a.transpose(1, 0)[::-1, ::-1],  # mirrored + rotated 90 CW
    8: lambda a: a.transpose(1, 0)[::-1, :],  # rotated 270 CW
}


def apply_orientation(raw: bytes, w: int, h: int, orientation: int) -> tuple[bytes, int, int]:
    """Rotate/flip a grayscale pixel buffer upright per its EXIF
    orientation → ``(raw, w, h)`` of the normalized image. Orientations
    5–8 swap the output dimensions. Pure numpy views — no copy until the
    final serialize. Unknown orientation values refuse by value (the
    spec reserves 1–8; silently passing a corrupt value through would
    feed sideways images to every downstream embedding)."""
    import numpy as np

    if orientation not in _ORIENT_OPS:
        raise ExifError(f"orientation must be 1..8, got {orientation}")
    a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
    out = np.ascontiguousarray(_ORIENT_OPS[orientation](a))
    oh, ow = out.shape
    return out.tobytes(), ow, oh
