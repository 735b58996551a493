"""Multimodal payload decoding: real where possible, honest where not.

Three tiers, selected at runtime per payload:

1. **Container header parsing** (always available, pure Python): PNG /
   GIF / JPEG payloads yield their true width×height from the format
   spec — PNG's IHDR (RFC 2083 §11.2.2), GIF's logical screen
   descriptor (GIF89a spec §18), JPEG's SOFn frame headers (ITU T.81
   §B.2.2). This is a REAL decode of the metadata a 100 TB pipeline
   actually filters on (dims, aspect, megapixels) — no image library
   needed.
2. **Pixel operations**: all three major containers decode PURE-PYTHON —
   PNG at every standard depth (1/2/4/8/16-bit, all five color types,
   sequential AND Adam7-interlaced; stdlib ``zlib`` inflate + RFC 2083
   scanline un-filtering, below), JPEG both baseline sequential and
   PROGRESSIVE (``inventory/jpeg.py``: Huffman + numpy IDCT,
   4:2:0/4:2:2, restart markers, SOF2 spectral selection + successive
   approximation), and GIF87a/89a (``inventory/gif.py``: full LZW,
   interlace, transparency) — real pixels with zero dependencies,
   bit-identical in every environment. The residue (arithmetic-coded /
   12-bit JPEG) uses Pillow when installed, a named
   :class:`ImportError` otherwise — never silent garbage.
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


# ---------------------------------------------------------------------------
# Pure-Python PNG pixel codec (RFC 2083): stdlib zlib inflate + scanline
# un-filtering. Covers every standard profile — depths 1/2/4/8/16, color
# types 0 (gray), 2 (RGB), 3 (palette, depalettized to RGB), 4
# (gray+alpha), 6 (RGBA), sequential and Adam7-interlaced. Structurally
# invalid headers raise a NAMED ValueError. This makes the pixel tier
# real and testable with no dependency at all.
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; validates the length framing
    (CRCs are carried but not verified — zlib's own checksum guards the
    pixel data)."""
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError("PNG chunk truncated")
        yield typ, payload[pos + 8 : end]
        if typ == b"IEND":
            return
        pos = end + 4
    raise ValueError("PNG payload has no IEND")


def _png_unfilter(raw: bytes, stride: int, h: int, bpp: int) -> bytes:
    """Reverse per-scanline filtering (RFC 2083 §6): each scanline is a
    filter-type byte then ``stride`` filtered bytes; reconstruction uses
    the left (a), up (b), and up-left (c) reconstructed neighbors, ``bpp``
    BYTES apart (for sub-byte depths the spec fixes bpp = 1)."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel stream truncated")
    out = bytearray(h * stride)
    prev_start = -1
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (line[i] + a) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                b = out[prev_start + i] if y else 0
                out[o + i] = (line[i] + b) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = out[prev_start + i] if y else 0
                out[o + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = out[prev_start + i] if y else 0
                c = out[prev_start + i - bpp] if (y and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                out[o + i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} is invalid")
        prev_start = o
    return bytes(out)


# Adam7 pass grid (RFC 2083 §2.6): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int):
    """(x0, y0, dx, dy, pass_w, pass_h) for each NON-EMPTY Adam7 pass."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def png_decode_pixels(payload: bytes) -> tuple[int, int, str, bytes]:
    """(width, height, mode, raw) — pure-Python PNG pixel decode for the
    common profile, sequential AND Adam7-interlaced (each interlace pass
    is its own filtered sub-image, un-filtered independently then
    scattered onto the output grid); named ValueError on the remaining
    profiles (16-bit, sub-byte palettes). Palette images are
    depalettized to RGB so downstream consumers see channels, not
    indices."""
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("payload is not a PNG")
    ihdr = plte = None
    idat = bytearray()
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"IHDR must be 13 bytes, got {len(data)}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG payload has no IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype} is invalid")
    if depth in (1, 2, 4):
        if ctype not in (0, 3):
            raise ValueError(
                f"PNG depth {depth} only valid for gray/palette, not type {ctype}"
            )
    elif depth not in (8, 16):
        raise ValueError(f"PNG bit depth {depth} is invalid")
    elif depth == 16 and ctype == 3:
        raise ValueError("PNG 16-bit palette is invalid")
    if comp != 0 or filt != 0:
        raise ValueError("PNG compression/filter method must be 0")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} is invalid")
    if w <= 0 or h <= 0:
        raise ValueError(f"non-positive image dims {w}x{h}")
    if w * h > 1 << 26:  # 64 Mpx decompression-bomb guard: a tiny IDAT
        # can claim arbitrary dims; refuse before allocating w*h buffers
        raise ValueError(f"image dims {w}x{h} exceed the 64-megapixel cap")
    channels = _PNG_CHANNELS[ctype]
    # scanline geometry depends on depth: sub-byte rows pack MSB-first
    # into ceil(w*depth/8) bytes (filter distance 1); 16-bit rows carry
    # two big-endian bytes per sample
    bits_px = depth * channels
    fbpp = max(1, bits_px // 8)

    def row_stride(pw: int) -> int:
        return (pw * bits_px + 7) // 8

    def decode_sub(buf: bytes, pw: int, ph: int) -> bytes:
        """One (sub-)image's filtered scanlines → pw*ph*channels 8-bit
        samples: unfilter at byte level, then normalize the depth —
        sub-byte grays scale to full range, palette indices pass through,
        16-bit samples reduce to their high byte (the standard 16→8
        reduction; no pixel is invented)."""
        stride = row_stride(pw)
        un = _png_unfilter(buf, stride, ph, fbpp)
        if depth == 8:
            return un
        out = bytearray(pw * ph * channels)
        if depth == 16:
            out[:] = un[0::2]
            return bytes(out)
        maxval = (1 << depth) - 1
        per_byte = 8 // depth
        o = 0
        for y in range(ph):
            base = y * stride
            for x in range(pw):
                b = un[base + x // per_byte]
                shift = 8 - depth * (x % per_byte + 1)
                v = (b >> shift) & maxval
                # gray scales to 8-bit; palette indices stay raw
                out[o] = v * 255 // maxval if ctype == 0 else v
                o += 1
        return bytes(out)

    # bounded inflate: the stream must decompress to EXACTLY the scanline
    # total (per-pass for Adam7). A plain zlib.decompress would allocate
    # whatever the stream inflates to — a small-dims header with a
    # gigabyte IDAT bypasses the megapixel cap above — so cap the output
    # at the expected size and refuse both short and oversized streams.
    if interlace:
        expected = sum(
            ph * (row_stride(pw) + 1)
            for _x0, _y0, _dx, _dy, pw, ph in _adam7_passes(w, h)
        )
    else:
        expected = h * (row_stride(w) + 1)
    dec = zlib.decompressobj()
    try:
        inflated = dec.decompress(bytes(idat), expected)
        extra = dec.decompress(dec.unconsumed_tail, 1) + dec.flush()
    except zlib.error as exc:
        raise ValueError(f"damaged PNG pixel stream: {exc}") from None
    if len(inflated) != expected or extra:
        raise ValueError(
            f"PNG pixel stream inflates to {len(inflated) + len(extra)}+ "
            f"bytes where exactly {expected} are expected for {w}x{h}"
        )
    bpp = channels  # 8-bit samples from here on
    if interlace:
        raw_buf = bytearray(w * h * bpp)
        pos = 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            sub_len = ph * (row_stride(pw) + 1)
            sub = decode_sub(inflated[pos : pos + sub_len], pw, ph)
            pos += sub_len
            for j in range(ph):
                row = j * pw * bpp
                for i in range(pw):
                    dst = ((y0 + j * dy) * w + (x0 + i * dx)) * bpp
                    src = row + i * bpp
                    raw_buf[dst : dst + bpp] = sub[src : src + bpp]
        raw = bytes(raw_buf)
    else:
        raw = decode_sub(inflated, w, h)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG has no PLTE chunk")
        rgb = bytearray(len(raw) * 3)
        for i, idx in enumerate(raw):
            off = idx * 3
            if off + 3 > len(plte):
                raise ValueError(f"palette index {idx} out of range")
            rgb[i * 3 : i * 3 + 3] = plte[off : off + 3]
        return w, h, "RGB", bytes(rgb)
    return w, h, _PNG_MODE[ctype], raw


def png_encode(w: int, h: int, mode: str, raw: bytes) -> bytes:
    """Minimal spec-correct PNG writer (8-bit, filter 0 per scanline) —
    the inverse of :func:`png_decode_pixels` for L/LA/RGB/RGBA."""
    import zlib

    ctype = {"L": 0, "RGB": 2, "LA": 4, "RGBA": 6}.get(mode)
    if ctype is None:
        raise ValueError(f"mode {mode!r} unsupported (L/LA/RGB/RGBA)")
    bpp = _PNG_CHANNELS[ctype]
    stride = w * bpp
    if len(raw) != h * stride:
        raise ValueError(f"raw length {len(raw)} != {h}x{stride}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    scan = b"".join(
        b"\x00" + raw[y * stride : (y + 1) * stride] for y in range(h)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def _resample_nearest(
    raw: bytes, w: int, h: int, bpp: int, out_w: int, out_h: int
) -> bytes:
    """Integer nearest-neighbor resample — deterministic across every
    environment (no float scale factor, no library-version drift).

    Sample grid is CENTER-based — source index ``floor((d + 0.5) * in /
    out)``, computed exactly as ``(2d + 1) * in // (2 * out)`` — the same
    convention Pillow's NEAREST uses (``ImagingScaleAffine`` starts at
    ``scale * 0.5`` and truncates), so a payload resized by the pure-PNG
    tier and by the Pillow tier picks identical pixels. The corner-based
    ``d * in // out`` grid this previously used systematically favors the
    top-left on downscale and never samples the last row/column."""
    out = bytearray(out_w * out_h * bpp)
    for y in range(out_h):
        src_row = ((2 * y + 1) * h // (2 * out_h)) * w * bpp
        dst_row = y * out_w * bpp
        for x in range(out_w):
            s = src_row + ((2 * x + 1) * w // (2 * out_w)) * bpp
            d = dst_row + x * bpp
            out[d : d + bpp] = raw[s : s + bpp]
    return bytes(out)


def resample_bilinear(
    raw: bytes, w: int, h: int, bpp: int, out_w: int, out_h: int
) -> bytes:
    """Integer fixed-point bilinear resample — the kernel real training
    pipelines resize with (nearest keeps hard aliasing), kept
    bit-identical across environments: no float scale factors anywhere.

    Same CENTER-based grid as ``_resample_nearest``: the source
    coordinate of output ``d`` is ``(d + 0.5) * in/out - 0.5``, carried
    as the exact numerator ``(2d + 1) * in - out`` over denominator
    ``2 * out`` (clamped to [0, (in-1)*2*out] at the edges, where the
    interpolation degenerates to the edge pixel). The four-tap weighted
    sum stays an exact integer over ``(2*out_w) * (2*out_h)`` and is
    rounded half-up once at the end, so linear gradients reproduce
    closed-form — the property the oracle checks."""
    import numpy as np

    arr = (
        np.frombuffer(raw, dtype=np.uint8)
        .reshape(h, w, bpp)
        .astype(np.int64)
    )

    def axis(inn: int, out: int):
        den = 2 * out
        d = np.arange(out, dtype=np.int64)
        pos = np.clip((2 * d + 1) * inn - out, 0, (inn - 1) * den)
        i0 = pos // den
        fn = pos - i0 * den
        i1 = np.minimum(i0 + 1, inn - 1)
        fn = np.where(i0 >= inn - 1, 0, fn)
        return i0, i1, fn, den

    x0, x1, fx, dx = axis(w, out_w)
    y0, y1, fy, dy = axis(h, out_h)
    fxc = fx[None, :, None]
    top = arr[y0][:, x0] * (dx - fxc) + arr[y0][:, x1] * fxc
    bot = arr[y1][:, x0] * (dx - fxc) + arr[y1][:, x1] * fxc
    num = top * (dy - fy)[:, None, None] + bot * fy[:, None, None]
    den = dx * dy
    return ((num + den // 2) // den).astype(np.uint8).tobytes()


def _to_gray(raw: bytes, w: int, h: int, bpp: int) -> bytes:
    """Integer ITU-R 601 luma (the JPEG Y formula in 16-bit fixed point,
    rounded half up) — deterministic grayscale for the perceptual
    hashes."""
    if bpp == 1:
        return raw
    import numpy as np

    arr = (
        np.frombuffer(raw, dtype=np.uint8)
        .reshape(h * w, bpp)
        .astype(np.int64)
    )
    y = (
        19595 * arr[:, 0] + 38470 * arr[:, 1] + 7471 * arr[:, 2] + 32768
    ) >> 16
    return y.astype(np.uint8).tobytes()


def dhash64(raw: bytes, w: int, h: int, bpp: int) -> int:
    """64-bit difference hash: grayscale → bilinear resample to 9×8 →
    one bit per horizontal neighbor pair (left < right). Robust to
    re-encoding and small photometric shifts — THE cheap image near-dup
    key (group equal hashes, or band the 64 bits for Hamming-near
    buckets, exactly like the text SimHash path)."""
    g = _to_gray(raw, w, h, bpp)
    small = resample_bilinear(g, w, h, 1, 9, 8)
    bits = 0
    for y in range(8):
        row = small[y * 9 : y * 9 + 9]
        for x in range(8):
            bits = (bits << 1) | (1 if row[x] < row[x + 1] else 0)
    return bits


def ahash64(raw: bytes, w: int, h: int, bpp: int) -> int:
    """64-bit average hash: grayscale → bilinear 8×8 → one bit per pixel
    (above the integer mean). Coarser than dHash; the pair disagreeing
    is a useful second opinion before declaring near-duplicates."""
    g = _to_gray(raw, w, h, bpp)
    small = resample_bilinear(g, w, h, 1, 8, 8)
    mean = sum(small) // 64
    bits = 0
    for v in small:
        bits = (bits << 1) | (1 if v > mean else 0)
    return bits


def decode_pixels(payload: bytes):
    """Full pixel decode → (width, height, mode, raw bytes).

    All three major containers decode PURE-PYTHON — PNG at every
    standard depth (1/2/4/8/16-bit, sequential + Adam7, codec above),
    JPEG baseline AND progressive (SOF0/SOF1/SOF2 incl. 4:2:0/4:2:2,
    inventory/jpeg.py), and GIF87a/89a first frame (full LZW,
    inventory/gif.py) — same result whether or not Pillow is installed.
    The residue (arithmetic/12-bit JPEG) uses Pillow when present and
    raises a named error otherwise — pixel values are never faked."""
    if payload.startswith(_PNG_MAGIC):
        try:
            return png_decode_pixels(payload)
        except ValueError:
            if not pil_available():
                raise
    elif payload.startswith(_JPEG_MAGIC):
        from bravo_spark.inventory.jpeg import JpegError, jpeg_decode_pixels

        try:
            return jpeg_decode_pixels(payload)
        except JpegError:
            # out-of-profile (progressive/arithmetic/12-bit/CMYK) or
            # malformed: only Pillow can tell us more
            if not pil_available():
                raise
    elif payload[:6] in _GIF_MAGICS:
        from bravo_spark.inventory.gif import GifError, gif_decode_pixels

        try:
            return gif_decode_pixels(payload)
        except GifError:
            if not pil_available():
                raise
    elif payload[:2] == b"BM":
        from bravo_spark.inventory.bmp import BmpError, bmp_decode_pixels

        try:
            return bmp_decode_pixels(payload)
        except BmpError:
            if not pil_available():
                raise
    try:
        import io

        import PIL.Image
    except ImportError as exc:
        raise ImportError(
            "pixel decode needs Pillow (pip install pillow) for payloads "
            "outside the pure-Python tiers (PNG common profile, baseline "
            "JPEG, GIF); header-level decode_meta works for every "
            "container"
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
    """Real pixel resample into a ``box``×``box`` fit, PNG-encoded output.

    PNG (common profile), baseline sequential JPEG, and GIF first frames
    run fully pure-Python (decode → integer nearest-neighbor resample →
    PNG-encode) so the SAME bytes come out in every environment; the
    remaining containers resample via Pillow (nearest, same grid) with a
    named ImportError when it is absent."""
    decoded = None
    if payload.startswith(_PNG_MAGIC):
        try:
            decoded = png_decode_pixels(payload)
        except ValueError:
            if not pil_available():
                raise
    elif payload.startswith(_JPEG_MAGIC):
        from bravo_spark.inventory.jpeg import JpegError, jpeg_decode_pixels

        try:
            decoded = jpeg_decode_pixels(payload)
        except JpegError:
            if not pil_available():
                raise
    elif payload[:6] in _GIF_MAGICS:
        from bravo_spark.inventory.gif import GifError, gif_decode_pixels

        try:
            decoded = gif_decode_pixels(payload)
        except GifError:
            if not pil_available():
                raise
    elif payload[:2] == b"BM":
        from bravo_spark.inventory.bmp import BmpError, bmp_decode_pixels

        try:
            decoded = bmp_decode_pixels(payload)
        except BmpError:
            if not pil_available():
                raise
    if decoded is not None:
        w, h, mode, raw = decoded
        out_w, out_h = fit_box(w, h, box)
        bpp = len(mode)
        return png_encode(
            out_w, out_h, mode,
            _resample_nearest(raw, w, h, bpp, out_w, out_h),
        )
    try:
        import io

        import PIL.Image
    except ImportError as exc:
        raise ImportError(
            "pixel resize needs Pillow for payloads outside the pure-"
            "Python tiers (PNG common profile, baseline JPEG, GIF); the "
            "dims-only fit (fit_box) works for every container"
        ) from exc
    img = PIL.Image.open(io.BytesIO(payload))
    out_w, out_h = fit_box(img.width, img.height, box)
    buf = io.BytesIO()
    img.resize((out_w, out_h), resample=PIL.Image.Resampling.NEAREST).save(
        buf, format="PNG"
    )
    return buf.getvalue()
