"""Pure-Python BMP (Windows DIB) codec — the last common legacy raster.

BI_RGB bitmaps decode to RGB: BITMAPINFOHEADER (and the larger V4/V5
headers that embed it), 1/4/8-bit paletted and 16/24/32-bit direct
color, bottom-up and top-down row orders, 4-byte row padding, plus the
RLE4/RLE8 compressions (encoded runs, word-aligned absolute segments,
delta skips, end-of-line/bitmap escapes). Bitfields beyond the canonical
565/555/888 and JPEG/PNG-in-BMP refuse BY NAME — pixel values are never
faked. The 24-bit encoder is the
test ground truth: BMP is lossless, so encode→decode is byte-exact.

IMPORTANT: this codec is deliberately NOT wired into
``multimodal.sniff_format``/``decode_meta`` — 'BM' is printable ASCII, a
text document can start with it, and the tier-selector semantics of the
gate-green ``multimodal_decode`` query are pinned by its oracle. BMP
participates only in the pixel tier (``decode_pixels``/``resize_pixels``)
where the full structural parse vets the payload.

Scale shape: per-row work inside Arrow-batched ``mapInPandas`` — same
contract as the PNG/JPEG/GIF tiers.
"""

from __future__ import annotations

import struct

__all__ = ["BmpError", "bmp_decode_pixels", "bmp_encode"]

_MAX_PIXELS = 64_000_000


class BmpError(ValueError):
    """Malformed or out-of-profile BMP; message names the reason."""


def bmp_decode_pixels(payload: bytes) -> tuple[int, int, str, bytes]:
    """Decode a BI_RGB bitmap → (width, height, "RGB", raw)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise BmpError("not a BMP (missing BM signature or header)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise BmpError(f"BMP core/OS2 header (size {hdr_size}) not supported")
    if 14 + hdr_size > len(payload):
        raise BmpError("BMP header overruns payload")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    palette_n = struct.unpack_from("<I", payload, 46)[0]
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h == 0:
        raise BmpError(f"bad BMP dimensions {w}x{h_signed}")
    if w * h > _MAX_PIXELS:
        raise BmpError("image too large for in-container decode (>64 MP)")
    if planes != 1:
        raise BmpError(f"BMP planes must be 1, got {planes}")
    masks = None
    if compression == 3 and bpp not in (16, 32):
        raise BmpError(
            f"BMP BI_BITFIELDS with {bpp}-bit depth not supported "
            "(16/32-bit only)"
        )
    if compression == 3:
        # BI_BITFIELDS: only the two canonical 16-bit layouts and the
        # byte-aligned 32-bit layout decode; exotic masks refuse
        if len(payload) < 66:
            raise BmpError("BI_BITFIELDS masks truncated")
        masks = struct.unpack_from("<III", payload, 54)
        known = {
            (0xF800, 0x07E0, 0x001F),  # 565
            (0x7C00, 0x03E0, 0x001F),  # 555
            (0x00FF0000, 0x0000FF00, 0x000000FF),  # canonical 32-bit
        }
        if masks not in known:
            raise BmpError(
                f"BMP bitfield masks {tuple(hex(m) for m in masks)} not "
                "supported (canonical 565/555/888 only)"
            )
    elif compression in (1, 2):
        want_bpp = 8 if compression == 1 else 4
        if bpp != want_bpp:
            raise BmpError(
                f"BMP RLE{want_bpp} needs {want_bpp}-bit depth, got {bpp}"
            )
        if top_down:
            raise BmpError("RLE BMP cannot be top-down (spec)")
    elif compression != 0:
        name = {4: "JPEG-in-BMP", 5: "PNG-in-BMP"}.get(
            compression, f"compression {compression}"
        )
        raise BmpError(f"BMP {name} not supported pure-Python")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise BmpError(f"BMP bit depth {bpp} is invalid")

    palette = None
    if bpp <= 8:
        n = palette_n or (1 << bpp)
        pal_at = 14 + hdr_size
        if pal_at + 4 * n > len(payload):
            raise BmpError("BMP palette overruns payload")
        palette = [
            payload[pal_at + 4 * i : pal_at + 4 * i + 3]  # BGR(A) quads
            for i in range(n)
        ]

    if compression in (1, 2):
        idx = _decode_rle(payload, data_offset, w, h, rle4=compression == 2)
        out = bytearray(w * h * 3)
        o = 0
        for row in range(h):
            src = (h - 1 - row) * w  # RLE rows are bottom-up
            for x in range(w):
                i = idx[src + x]
                if i >= len(palette):
                    raise BmpError(f"palette index {i} out of range")
                bgr = palette[i]
                out[o : o + 3] = (bgr[2], bgr[1], bgr[0])
                o += 3
        return w, h, "RGB", bytes(out)

    stride = (w * bpp + 31) // 32 * 4
    need = stride * h
    if data_offset + need > len(payload):
        raise BmpError(
            f"BMP pixel data needs {need} bytes at offset {data_offset}, "
            "overruns payload"
        )

    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = data_offset + src_row * stride
        o = row * w * 3
        if bpp == 24:
            for x in range(w):
                b, g, r = payload[base + 3 * x : base + 3 * x + 3]
                out[o : o + 3] = (r, g, b)
                o += 3
        elif bpp == 32:
            for x in range(w):
                b, g, r = payload[base + 4 * x : base + 4 * x + 3]
                out[o : o + 3] = (r, g, b)
                o += 3
        elif bpp == 16:
            rm, gm, bm = masks or (0x7C00, 0x03E0, 0x001F)  # default 555
            rs = (rm & -rm).bit_length() - 1
            gs = (gm & -gm).bit_length() - 1
            bs = (bm & -bm).bit_length() - 1
            for x in range(w):
                v = struct.unpack_from("<H", payload, base + 2 * x)[0]
                for m, s in ((rm, rs), (gm, gs), (bm, bs)):
                    c = (v & m) >> s
                    width = (m >> s).bit_length()
                    out[o] = c * 255 // ((1 << width) - 1)
                    o += 1
        else:  # paletted 1/4/8
            per_byte = 8 // bpp
            mask = (1 << bpp) - 1
            for x in range(w):
                byte = payload[base + x // per_byte]
                shift = 8 - bpp * (x % per_byte + 1)
                idx = (byte >> shift) & mask
                if idx >= len(palette):
                    raise BmpError(f"palette index {idx} out of range")
                bgr = palette[idx]
                out[o : o + 3] = (bgr[2], bgr[1], bgr[0])
                o += 3
    return w, h, "RGB", bytes(out)


def _decode_rle(
    payload: bytes, pos: int, w: int, h: int, *, rle4: bool
) -> bytearray:
    """RLE8/RLE4 palette-index decode (bottom-up row order, as stored):
    (count, value) runs, 0-escapes for end-of-line (0), end-of-bitmap
    (1), delta (2: dx, dy), and word-aligned absolute runs (≥3).
    Undefined (skipped) pixels are index 0, the conventional fill."""
    idx = bytearray(w * h)  # file order: row 0 is the BOTTOM row
    x = y = 0
    n = len(payload)
    while True:
        if pos + 2 > n:
            raise BmpError("RLE stream truncated (no end-of-bitmap)")
        count, val = payload[pos], payload[pos + 1]
        pos += 2
        if count > 0 or val >= 3:  # any branch that WRITES pixels
            if y >= h:
                raise BmpError("RLE data beyond the last row")
        if count > 0:  # encoded run
            if rle4:
                pair = ((val >> 4) & 0xF, val & 0xF)
                for i in range(count):
                    if x >= w:
                        break  # spec allows runs to stop at line end
                    idx[y * w + x] = pair[i & 1]
                    x += 1
            else:
                end = min(x + count, w)
                idx[y * w + x : y * w + end] = bytes([val]) * (end - x)
                x = end
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise BmpError("RLE rows exceed declared height")
            continue
        if val == 1:  # end of bitmap
            return idx
        if val == 2:  # delta
            if pos + 2 > n:
                raise BmpError("RLE delta truncated")
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
            if x > w or y >= h + 1:
                raise BmpError("RLE delta escapes the bitmap")
            continue
        # absolute mode: `val` literal indices, padded to a word boundary
        if rle4:
            nbytes = (val + 1) // 2
            pad = (nbytes & 1)
            if pos + nbytes + pad > n:
                raise BmpError("RLE absolute run truncated")
            for i in range(val):
                if x >= w:
                    break
                b = payload[pos + i // 2]
                idx[y * w + x] = (b >> 4) & 0xF if i % 2 == 0 else b & 0xF
                x += 1
            pos += nbytes + pad
        else:
            pad = val & 1
            if pos + val + pad > n:
                raise BmpError("RLE absolute run truncated")
            end = min(x + val, w)
            idx[y * w + x : y * w + end] = payload[pos : pos + (end - x)]
            x = end
            pos += val + pad


def bmp_encode(w: int, h: int, mode: str, raw: bytes) -> bytes:
    """24-bit BI_RGB bottom-up writer — the canonical interchange layout.
    mode "L" (w*h) or "RGB" (w*h*3); lossless."""
    if mode not in ("L", "RGB"):
        raise BmpError(f"bmp_encode supports L/RGB, not {mode!r}")
    bpp_in = 1 if mode == "L" else 3
    if len(raw) != w * h * bpp_in:
        raise BmpError(f"raw length {len(raw)} != {w}x{h}x{bpp_in}")
    if w <= 0 or h <= 0:
        raise BmpError("bad BMP dimensions")
    stride = (w * 3 + 3) // 4 * 4
    pixel_bytes = stride * h
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", 54 + pixel_bytes, 0, 0, 54)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes,
                       2835, 2835, 0, 0)
    pad = b"\x00" * (stride - w * 3)
    for row in range(h - 1, -1, -1):  # bottom-up
        line = bytearray()
        for x in range(w):
            if mode == "L":
                v = raw[row * w + x]
                line += bytes((v, v, v))
            else:
                i = (row * w + x) * 3
                line += bytes((raw[i + 2], raw[i + 1], raw[i]))  # BGR
        out += line + pad
    return bytes(out)
