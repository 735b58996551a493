"""Multimodal payload decoding: real where possible, honest where not.

Three tiers, selected at runtime per payload:

1. **Container header parsing** (always available, pure Python): PNG /
   GIF / JPEG payloads yield their true width×height from the format
   spec — PNG's IHDR (RFC 2083 §11.2.2), GIF's logical screen
   descriptor (GIF89a spec §18), JPEG's SOFn frame headers (ITU T.81
   §B.2.2). This is a REAL decode of the metadata a 100 TB pipeline
   actually filters on (dims, aspect, megapixels) — no image library
   needed.
2. **Pixel operations** (PIL, import-guarded): full decode and
   resampling when Pillow is installed; a named :class:`ImportError`
   otherwise — never silent garbage.
3. **Deterministic fake** (fallback for payloads that are not images,
   e.g. the synthetic text corpus): md5-derived dims, stable across
   engines so oracle SQL can reproduce them.

The reference has no multimodal surface; this module exists for the
training-data-pipeline extension (SURVEY §2 extension rows).
"""

from __future__ import annotations

import hashlib
import struct

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_GIF_MAGICS = (b"GIF87a", b"GIF89a")
_JPEG_MAGIC = b"\xff\xd8"

# SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC): markers whose segment carries
# the frame height/width (ITU T.81 Table B.1)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def sniff_format(payload: bytes, *, strict: bool = False) -> str | None:
    """'png' | 'gif' | 'jpeg' | None by container magic.

    PNG's 0x89 and JPEG's 0xFF magic bytes cannot begin valid UTF-8 text,
    but GIF's magic is printable ASCII — a text document can start with
    'GIF87a'. ``strict=True`` (used by the per-payload tier selector)
    additionally requires GIF's structural invariant: a valid block
    introducer right after the logical screen descriptor / global color
    table, which ASCII prose essentially never satisfies by accident."""
    if payload.startswith(_PNG_MAGIC):
        return "png"
    if payload[:6] in _GIF_MAGICS:
        if not strict or _gif_plausible(payload):
            return "gif"
        return None
    if payload.startswith(_JPEG_MAGIC):
        return "jpeg"
    return None


def _gif_plausible(payload: bytes) -> bool:
    # after the 13-byte header (+ global color table of 3*2^(N+1) bytes
    # when flagged) the next byte must introduce a block: image descriptor
    # 0x2C, extension 0x21, or trailer 0x3B (GIF89a spec §§18-20)
    if len(payload) < 14:
        return False
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    return pos < len(payload) and payload[pos] in (0x2C, 0x21, 0x3B)


def parse_image_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the container header — pure Python, no image
    library. Raises ``ValueError`` on a truncated/corrupt header or an
    unrecognized container."""
    fmt = sniff_format(payload)
    if fmt == "png":
        # 8B signature, 4B chunk length, b"IHDR", then width/height as
        # 4-byte big-endian each (RFC 2083 §11.2.2)
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("PNG payload truncated before IHDR")
        w, h = struct.unpack(">II", payload[16:24])
    elif fmt == "gif":
        # logical screen descriptor right after the 6-byte version block:
        # width/height as 2-byte LITTLE-endian each
        if len(payload) < 10:
            raise ValueError("GIF payload truncated before screen descriptor")
        w, h = struct.unpack("<HH", payload[6:10])
    elif fmt == "jpeg":
        w, h = _jpeg_dims(payload)
    else:
        raise ValueError("payload is not a recognized image container")
    if w <= 0 or h <= 0:
        raise ValueError(f"non-positive image dims {w}x{h}")
    return w, h


def _jpeg_dims(payload: bytes) -> tuple[int, int]:
    # walk marker segments to the first SOFn: [FF mm] [2B length incl.
    # itself] [precision 1B] [height 2B BE] [width 2B BE] ...
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynced")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                break
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return w, h
        pos += 2 + seglen
    raise ValueError("JPEG payload has no SOF frame header")


def fake_dims(payload: bytes, *, modulus: int = 1024) -> tuple[int, int]:
    """Deterministic md5-derived stand-in dims for non-image payloads —
    reproducible in any SQL engine (the oracle recomputes them), so the
    PLUMBING stays hash-checkable even where the data is not imagery."""
    digest = hashlib.md5(payload).hexdigest()
    return (
        1 + int(digest[0:8], 16) % modulus,
        1 + int(digest[8:16], 16) % modulus,
    )


def decode_meta(payload: bytes) -> tuple[int, int, str]:
    """(width, height, source): real header dims for real image payloads
    ('header'), md5 stand-ins for anything else ('synthetic'). The per-row
    runtime selection means the same job works on a mixed corpus; the
    strict sniff keeps text that merely STARTS with GIF's ASCII magic on
    the synthetic tier instead of decoding prose bytes as dims."""
    if sniff_format(payload, strict=True) is not None:
        w, h = parse_image_dims(payload)
        return w, h, "header"
    w, h = fake_dims(payload)
    return w, h, "synthetic"


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_pixels(payload: bytes):
    """Full pixel decode via Pillow → (width, height, mode, raw bytes).
    Import-guarded: a named error, not a fake, when Pillow is absent —
    pixel values cannot be faked honestly."""
    try:
        import io

        import PIL.Image
    except ImportError as exc:
        raise ImportError(
            "pixel decode needs Pillow (pip install pillow); header-level "
            "decode_meta works without it"
        ) from exc
    img = PIL.Image.open(io.BytesIO(payload))
    img.load()
    return img.width, img.height, img.mode, img.tobytes()


def fit_box(w: int, h: int, box: int = 256) -> tuple[int, int]:
    """Aspect-preserving integer fit into ``box``×``box`` — pure integer
    arithmetic so every engine (Spark, DuckDB, a GPU worker) computes the
    identical output shape."""
    m = max(w, h)
    if m <= box:
        return w, h
    return max(1, (w * box) // m), max(1, (h * box) // m)


def resize_pixels(payload: bytes, *, box: int = 256) -> bytes:
    """Real resample via Pillow (PNG-encoded output); named ImportError
    without it."""
    try:
        import io

        import PIL.Image
    except ImportError as exc:
        raise ImportError(
            "pixel resize needs Pillow; the dims-only fit (fit_box) works "
            "without it"
        ) from exc
    img = PIL.Image.open(io.BytesIO(payload))
    out_w, out_h = fit_box(img.width, img.height, box)
    buf = io.BytesIO()
    img.resize((out_w, out_h)).save(buf, format="PNG")
    return buf.getvalue()
