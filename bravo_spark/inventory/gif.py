"""Pure-Python GIF codec (decode + encode), no image libraries.

Completes the multimodal pure-Python pixel tier set (PNG in
inventory/multimodal.py, JPEG in inventory/jpeg.py): GIF87a/GIF89a
payloads decode their FIRST frame to raw RGB in-container — full
variable-width LZW (clear/EOI codes, 12-bit cap, deferred clear),
global/local color tables, interlace de-weaving, transparency reported
via the background/transparent index but composited opaque (single-frame
contract). Later frames are reachable via ``gif_iter_frames`` for the
frame-sampling pipeline. Malformed streams raise :class:`GifError`
naming the defect; a forged-dims bomb refuses before allocation —
never hang, never fake pixels.

The encoder writes a spec-conforming GIF89a (global palette built from
the image, LZW-compressed) and is the test ground truth: GIF is
LOSSLESS for ≤256-color content, so encode→decode must be byte-exact —
a stronger pin than the JPEG tier's tolerance bounds. ≥257 distinct
colors refuse by name (palette quantization would fake pixels).

Reference parity note: the reference engine (king/bravo) has no image
path; this module serves the driver-mandated multimodal family, same
tier contract as the PNG/JPEG codecs.

Scale shape: runs per-row inside Arrow-batched ``mapInPandas``
(multimodal.decode_pixels / resize_pixels) — map-only, the per-payload
codec cost is the job.
"""

from __future__ import annotations

import struct

__all__ = [
    "GifError",
    "gif_decode_pixels",
    "gif_iter_frames",
    "gif_encode",
    "gif_encode_animation",
]

_MAX_PIXELS = 64_000_000  # same in-container plane ceiling as PNG/JPEG tiers


class GifError(ValueError):
    """Malformed or out-of-profile GIF; message names the reason."""


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, clear + EOI, 12-bit max)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    if not 2 <= min_code_size <= 11:
        raise GifError(f"LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1

    # dictionary as (prefix_index, last_byte); roots are single bytes
    prefix = [0] * 4096
    suffix = bytearray(4096)
    for i in range(clear):
        suffix[i] = i
    next_code = eoi + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0
    prev: int | None = None
    stack = bytearray()

    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                next_code = eoi + 1
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= next_code:
                    raise GifError("LZW: first code not a root")
                out.append(suffix[code])
                prev = code
                continue
            if code > next_code or (code == next_code and next_code >= 4096):
                raise GifError("LZW: code beyond dictionary")
            # expand `code` (or prev+first(prev) for the KwKwK case)
            cur = prev if code == next_code else code
            stack.clear()
            while cur >= clear:
                stack.append(suffix[cur])
                cur = prefix[cur]
            first = suffix[cur]
            stack.append(first)
            if code == next_code:
                stack.insert(0, first)
            out.extend(reversed(stack))
            if len(out) > max_pixels:
                raise GifError("LZW output exceeds declared frame size")
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = code
    return out  # stream ended without EOI: accept what decoded (common)


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _R:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise GifError("truncated GIF")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def sub_blocks(self) -> bytes:
        out = bytearray()
        while True:
            n = self.u8()
            if n == 0:
                return bytes(out)
            out += self.read(n)


def _color_table(r: _R, flags: int) -> list[tuple[int, int, int]] | None:
    if not flags & 0x80:
        return None
    n = 2 << (flags & 0x07)
    raw = r.read(3 * n)
    return [(raw[3 * i], raw[3 * i + 1], raw[3 * i + 2]) for i in range(n)]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(len(idx))
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = idx[src : src + w]
            src += w
    return out


def gif_iter_frames(payload: bytes):
    """Yield (frame_index, width, height, "RGB", raw) for every image
    block, each composited standalone against the logical screen's
    background (no inter-frame disposal blending — the frame-SAMPLING
    contract wants independent snapshots, not an animation player)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF (bad signature)")
    r = _R(payload)
    r.read(6)
    sw, sh = r.u16(), r.u16()
    flags = r.u8()
    bg_index = r.u8()
    r.u8()  # aspect
    if sw == 0 or sh == 0:
        raise GifError("zero logical screen dimension")
    if sw * sh > _MAX_PIXELS:
        raise GifError("image too large for in-container decode (>64 MP)")
    gct = _color_table(r, flags)
    transparent: int | None = None
    frame_i = 0
    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = r.u8()
            data = r.sub_blocks()
            if label == 0xF9 and len(data) >= 4:  # graphic control
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise GifError(f"unknown GIF block 0x{block:02X}")
        left, top, fw, fh = r.u16(), r.u16(), r.u16(), r.u16()
        iflags = r.u8()
        lct = _color_table(r, iflags)
        palette = lct or gct
        if palette is None:
            raise GifError("GIF frame has no color table")
        if fw == 0 or fh == 0 or fw * fh > _MAX_PIXELS:
            raise GifError("bad GIF frame dimensions")
        min_code = r.u8()
        idx = _lzw_decode(min_code, r.sub_blocks(), fw * fh)
        if len(idx) < fw * fh:
            raise GifError(
                f"LZW data ended early ({len(idx)} of {fw * fh} pixels)"
            )
        idx = idx[: fw * fh]
        if iflags & 0x40:
            idx = _deinterlace(idx, fw, fh)
        # composite onto the logical screen (background fill, opaque)
        bg = (
            palette[bg_index]
            if gct is not None and bg_index < len(palette)
            else (0, 0, 0)
        )
        npal = len(palette)
        out = bytearray(bytes(bg) * (sw * sh))
        for y in range(fh):
            sy = top + y
            if sy >= sh:
                break
            row = y * fw
            dst = (sy * sw + left) * 3
            for x in range(min(fw, sw - left)):
                p = idx[row + x]
                if p >= npal:
                    raise GifError(f"pixel index {p} outside {npal}-color table")
                if transparent is not None and p == transparent:
                    dst += 3
                    continue
                c = palette[p]
                out[dst] = c[0]
                out[dst + 1] = c[1]
                out[dst + 2] = c[2]
                dst += 3
        yield frame_i, sw, sh, "RGB", bytes(out)
        frame_i += 1
        transparent = None


def gif_decode_pixels(payload: bytes) -> tuple[int, int, str, bytes]:
    """First frame of a GIF → (width, height, "RGB", raw)."""
    for _, w, h, mode, raw in gif_iter_frames(payload):
        return w, h, mode, raw
    raise GifError("GIF contains no image data")


# ---------------------------------------------------------------------------
# Encoder (GIF89a, global palette, single frame)
# ---------------------------------------------------------------------------


def gif_encode(w: int, h: int, mode: str, raw: bytes) -> bytes:
    """Encode raw pixels as a single-frame GIF89a. Exact for ≤256 distinct
    colors (GIF is palette-lossless); more colors refuse by name rather
    than silently quantize. mode "L" (w*h bytes) or "RGB" (w*h*3)."""
    if mode not in ("L", "RGB"):
        raise GifError(f"gif_encode supports L/RGB, not {mode!r}")
    bpp = 1 if mode == "L" else 3
    if len(raw) != w * h * bpp:
        raise GifError(f"raw length {len(raw)} != {w}x{h}x{bpp}")
    if w == 0 or h == 0 or w > 65535 or h > 65535:
        raise GifError("bad GIF dimensions")

    if mode == "L":
        pixels = [(v, v, v) for v in raw]
    else:
        pixels = [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]
    palette: dict[tuple[int, int, int], int] = {}
    for p in pixels:
        if p not in palette:
            if len(palette) == 256:
                raise GifError(
                    "more than 256 distinct colors — GIF would quantize; "
                    "encode as PNG/JPEG instead"
                )
            palette[p] = len(palette)
    # color table size must be a power of two ≥ 2
    bits = max(1, (len(palette) - 1).bit_length())
    table_n = 1 << bits
    colors = list(palette)
    colors += [(0, 0, 0)] * (table_n - len(colors))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present, bg 0, aspect 0
    for c in colors:
        out += bytes(c)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = max(2, bits)
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, bytes(palette[p] for p in pixels))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_encode_animation(
    w: int, h: int, frames: list[bytes], *, delay_cs: int = 10
) -> bytes:
    """Multi-frame GIF89a from full-screen RGB frames (each w*h*3 bytes):
    one GLOBAL palette across all frames (≤256 distinct colors total,
    refuse by name beyond — same no-quantization contract as
    :func:`gif_encode`), a NETSCAPE loop extension, and a per-frame
    graphic control block carrying ``delay_cs``. Decodes frame-for-frame
    via :func:`gif_iter_frames` byte-exactly."""
    if not frames:
        raise GifError("animation needs at least one frame")
    for i, f in enumerate(frames):
        if len(f) != w * h * 3:
            raise GifError(f"frame {i} length {len(f)} != {w}x{h}x3")
    if w == 0 or h == 0 or w > 65535 or h > 65535:
        raise GifError("bad GIF dimensions")

    palette: dict[tuple[int, int, int], int] = {}
    for f in frames:
        for i in range(0, len(f), 3):
            p = (f[i], f[i + 1], f[i + 2])
            if p not in palette:
                if len(palette) == 256:
                    raise GifError(
                        "more than 256 distinct colors across frames — "
                        "GIF would quantize; encode frames as PNG instead"
                    )
                palette[p] = len(palette)
    bits = max(1, (len(palette) - 1).bit_length())
    table_n = 1 << bits
    colors = list(palette)
    colors += [(0, 0, 0)] * (table_n - len(colors))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])
    for c in colors:
        out += bytes(c)
    # NETSCAPE 2.0 infinite-loop application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    for f in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        lzw = _lzw_encode(
            min_code,
            bytes(palette[(f[i], f[i + 1], f[i + 2])] for i in range(0, len(f), 3)),
        )
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
