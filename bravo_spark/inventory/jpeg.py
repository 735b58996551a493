"""Pure-Python baseline JPEG codec (decode + encode), no image libraries.

Closes the last multimodal refusal path: JFIF baseline sequential-DCT
payloads (SOF0/SOF1, Huffman entropy coding, 8-bit samples, grayscale or
YCbCr, any 1-4 sampling factors incl. 4:2:0 / 4:2:2, restart markers)
decode to raw pixels in-container, with numpy carrying the 8×8 DCT math.
Everything outside that profile — progressive (SOF2), hierarchical,
arithmetic coding, 12-bit precision, CMYK — refuses BY NAME so a caller
can route those payloads to Pillow where it exists; pixel values are
never faked.

The encoder is the test harness's ground-truth generator (and a usable
4:4:4 baseline writer): standard Annex K quantization tables with the
conventional quality scaling and the Annex K.3.3 Huffman tables, so its
output is a spec-conforming stream any decoder accepts. Decoder
correctness is pinned by encode→decode round trips (flat fields exact to
±1, gradients within quantization error) plus unit vectors for the
bit-reader, Huffman canonicalization, and IDCT — see
tests/test_multimodal.py.

Reference parity note: the reference engine has no image path at all
(king/bravo is Flink-state-only); this module serves the driver-mandated
multimodal family (SURVEY §2 extensions), same tier contract as the PNG
codec in inventory/multimodal.py.

Scale shape: decode/encode run per-row inside Arrow-batched
``mapInPandas`` plumbing (multimodal.decode_pixels / resize_pixels) — a
map-only plan whose per-payload cost is the codec itself, exactly how a
100 TB image-corpus job distributes.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "jpeg_decode_pixels", "jpeg_encode"]


class JpegError(ValueError):
    """Malformed or out-of-profile JPEG; message names the reason."""


# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

# zigzag index: ZIGZAG[i] = position in the 8x8 block (row-major) of the
# i-th coefficient in zigzag order (ITU-T T.81 Figure 5)
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1/K.2 example quantization tables (the de-facto standard bases)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3.3 standard Huffman tables as (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix C: forward = C @ B @ C.T, inverse =
    C.T @ B @ C. float64 — deterministic on every IEEE platform."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1 / np.sqrt(2)
    c[1:, :] *= 1.0
    return c * 0.5


_C = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman (canonical, T.81 Annex C/F)
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decoder state: mincode/maxcode/valptr per length
    (T.81 F.2.2.3 DECODE procedure)."""

    def __init__(self, bits: list[int], values: list[int]):
        if len(bits) != 16:
            raise JpegError("DHT: BITS must have 16 entries")
        if sum(bits) != len(values):
            raise JpegError("DHT: code count does not match value count")
        if sum(bits) == 0:
            raise JpegError("DHT: empty Huffman table")
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            if n and code > (1 << length):
                raise JpegError("DHT: over-subscribed Huffman table")
            code <<= 1
        self.values = values
        # 12-bit prefix LUT: maps the next 12 stream bits to (symbol,
        # code length) for every code of ≤12 bits (virtually all codes in
        # real tables) — turns the per-bit decode loop into one index.
        # Codes of 13-16 bits fall back to the canonical walk.
        lut: list[tuple[int, int] | None] = [None] * (1 << 12)
        code, k = 0, 0
        for length in range(1, 13):
            for _ in range(bits[length - 1]):
                base = code << (12 - length)
                sym = values[k]
                for suffix in range(1 << (12 - length)):
                    lut[base | suffix] = (sym, length)
                code += 1
                k += 1
            code <<= 1
        self.lut = lut


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing;
    stops at any non-RST marker (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # marker that ended the segment

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # past the end: feed 1-bits (spec'd pad); real overruns
                # surface as a marker/length error upstream
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                elif nxt is None:
                    raise JpegError("truncated entropy stream at 0xFF")
                else:
                    self.marker = nxt  # segment ends here
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        # drop already-consumed high bits: reads only decrement nbits, so
        # without this mask acc retains the whole consumed bitstream and
        # every shift is O(stream length) — quadratic decode on large files
        self.acc &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode(self, table: _HuffTable) -> int:
        # fast path: one 12-bit LUT probe (the _fill contract guarantees
        # ≥25 buffered bits, padding included, so the peek never starves)
        if self.nbits < 12:
            self._fill()
        hit = table.lut[(self.acc >> (self.nbits - 12)) & 0xFFF]
        if hit is not None:
            self.nbits -= hit[1]
            return hit[0]
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            if length >= 16:
                raise JpegError("Huffman decode: code longer than 16 bits")
            code = (code << 1) | self.read_bit()
            length += 1
        return table.values[table.valptr[length] + code - table.mincode[length]]

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # scan forward: entropy data must end with the marker
            while self.pos < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.pos + 1 < len(self.data)
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise JpegError(
                f"expected RST marker at restart interval, got "
                f"{self.marker!r}"
            )
        self.pos += 2
        self.marker = None


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): map the t-bit magnitude v to its signed
    coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def jpeg_decode_pixels(payload: bytes) -> tuple[int, int, str, bytes]:
    """Decode a baseline sequential JPEG → (width, height, mode, raw).

    mode is "L" (1 component) or "RGB" (3 components, JFIF YCbCr). Out-of-
    profile streams raise :class:`JpegError` naming the feature (so the
    tiered dispatcher can hand them to Pillow); malformed streams raise
    :class:`JpegError` naming the defect — never hang, never fake pixels.
    """
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (w, h, components)
    progressive = False
    restart_interval = 0
    pos = 2

    while True:
        if pos + 2 > len(payload):
            raise JpegError("truncated JPEG: no SOS before end of data")
        if payload[pos] != 0xFF:
            raise JpegError(f"marker expected at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone markers
        if marker == 0xD9:
            raise JpegError("EOI before SOS (no image data)")
        if pos + 2 > len(payload):
            raise JpegError("truncated marker segment header")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > len(payload):
            raise JpegError("marker segment overruns payload")
        body = payload[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                if i + n > len(body):
                    raise JpegError("DQT table overruns segment")
                if pq:
                    vals = np.frombuffer(body[i : i + n], dtype=">u2").astype(np.int32)
                else:
                    vals = np.frombuffer(body[i : i + n], dtype=np.uint8).astype(np.int32)
                table = np.zeros(64, dtype=np.int32)
                table[ZIGZAG] = vals  # stored in zigzag order
                qt[tq] = table
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                i += 1
                if i + 16 > len(body):
                    raise JpegError("DHT BITS overruns segment")
                bits = list(body[i : i + 16])
                i += 16
                n = sum(bits)
                if i + n > len(body):
                    raise JpegError("DHT values overrun segment")
                table = _HuffTable(bits, list(body[i : i + n]))
                i += n
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            if frame is not None:
                raise JpegError("multiple SOF segments")
            progressive = marker == 0xC2
            precision = body[0]
            if precision != 8:
                raise JpegError(f"unsupported sample precision {precision} (only 8-bit)")
            h_img = struct.unpack(">H", body[1:3])[0]
            w_img = struct.unpack(">H", body[3:5])[0]
            ncomp = body[5]
            if w_img == 0 or h_img == 0:
                raise JpegError("zero image dimension")
            if ncomp not in (1, 3):
                raise JpegError(
                    f"unsupported component count {ncomp} (grayscale or YCbCr only)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                h_s, v_s = hv >> 4, hv & 0x0F
                if not (1 <= h_s <= 4 and 1 <= v_s <= 4):
                    raise JpegError(f"bad sampling factors {h_s}x{v_s}")
                comps.append({"id": cid, "h": h_s, "v": v_s, "tq": tq})
            frame = (w_img, h_img, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            if progressive:
                return _decode_progressive(
                    payload, pos, body, frame, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ns = body[0]
            w_img, h_img, comps = frame
            if ns != len(comps):
                raise JpegError(
                    "non-interleaved multi-scan JPEG not supported pure-Python"
                )
            scan_sel = {}
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_sel[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(
                payload, pos, frame, qt, huff_dc, huff_ac, scan_sel,
                restart_interval,
            )
        # APPn / COM / others: skipped

    raise JpegError("unreachable")


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    qt,
    huff_dc,
    huff_ac,
    scan_sel,
    restart_interval: int,
) -> tuple[int, int, str, bytes]:
    w_img, h_img, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h_img + 8 * vmax - 1) // (8 * vmax)
    # hard ceiling against forged-dims memory bombs: the planes this scan
    # would materialize (same posture as the PNG codec's inflate bound)
    total_px = sum(
        (mcux * c["h"] * 8) * (mcuy * c["v"] * 8) for c in comps
    )
    if total_px > 64_000_000:
        raise JpegError("image too large for in-container decode (>64 MP planes)")

    coef = []
    for c in comps:
        if c["tq"] not in qt:
            raise JpegError(f"component references missing DQT table {c['tq']}")
        if c["id"] not in scan_sel:
            raise JpegError("SOS component id not in frame")
        td, ta = scan_sel[c["id"]]
        if td not in huff_dc or ta not in huff_ac:
            raise JpegError("SOS references missing Huffman table")
        coef.append(
            np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        )

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                dct, act = huff_dc[td], huff_ac[ta]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = _decode_block(br, dct, act)
                        coeffs[0] += pred[ci]
                        pred[ci] = coeffs[0]
                        coef[ci][my * c["v"] + by, mx * c["h"] + bx] = coeffs
            mcu_count += 1

    # one batched dequant + IDCT per plane — the entropy loop above is
    # inherently serial, but the transform is not
    planes = [
        _idct_plane(coef[ci], qt[c["tq"]]) for ci, c in enumerate(comps)
    ]
    return _assemble(frame, planes)


def _assemble(frame, planes) -> tuple[int, int, str, bytes]:
    """Upsample component planes to full resolution, crop to the image
    rectangle, and color-convert (shared by the baseline and progressive
    paths)."""
    w_img, h_img, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            # integer replication matches the MCU geometry exactly because
            # hmax/h and vmax/v are the per-axis subsampling ratios
            if hmax % c["h"] or vmax % c["v"]:
                raise JpegError(
                    f"non-integral sampling ratio {c['h']}x{c['v']} vs "
                    f"{hmax}x{vmax}"
                )
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h_img, :w_img])

    if len(comps) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w_img, h_img, "L", out.tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return w_img, h_img, "RGB", out.tobytes()


def _idct_plane(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Batched dequantize + 2-D IDCT: (bh, bw, 64) natural-order integer
    coefficients → (bh*8, bw*8) float pixel plane with the +128 level
    shift. One broadcasted matmul pair replaces per-block 8×8 products;
    row-chunked so the float64 transient stays bounded at the 64 MP
    cap."""
    bh, bw = coef.shape[:2]
    qv = q.reshape(64).astype(np.float64)
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    chunk = max(1, 2_000_000 // max(1, bw * 64))  # ~2M coeffs per slice
    for r0 in range(0, bh, chunk):
        part = coef[r0 : r0 + chunk].astype(np.float64) * qv
        n = part.shape[0]
        blocks = part.reshape(n, bw, 8, 8)
        # C.T @ block @ C as two axis contractions — ONE big GEMM each,
        # instead of gufunc-looped per-block 8×8 matmuls (~60× faster)
        t1 = np.tensordot(blocks, _C, axes=([2], [0]))  # → (n,bw,col,i)
        px = np.tensordot(t1, _C, axes=([2], [0])) + 128.0  # → (n,bw,i,l)
        out[r0 * 8 : (r0 + n) * 8] = (
            px.transpose(0, 2, 1, 3).reshape(n * 8, bw * 8)
        )
    return out


_ZIGZAG_L = ZIGZAG.tolist()  # plain-int lookup for the hot decode loop


def _decode_block(br: _BitReader, dct: _HuffTable, act: _HuffTable) -> list[int]:
    """One 8×8 block of dequantization-ready coefficients in NATURAL
    (row-major) order as a plain Python list (scalar numpy writes are
    ~3× slower in this hot loop); [0] is the DC *difference* (caller
    adds the predictor)."""
    coeffs = [0] * 64
    t = br.decode(dct)
    if t > 15:
        raise JpegError("DC category > 15")
    coeffs[0] = _extend(br.receive(t), t)
    k = 1
    while k < 64:
        rs = br.decode(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past end of block")
        coeffs[_ZIGZAG_L[k]] = _extend(br.receive(s), s)
        k += 1
    return coeffs


# ---------------------------------------------------------------------------
# Progressive decoder (SOF2): coefficients accumulate across scans —
# spectral selection (Ss..Se bands) and successive approximation (Ah/Al
# bit planes), per ITU T.81 Annex G.1.2 — then one reconstruction pass.
# ---------------------------------------------------------------------------


def _decode_progressive(
    payload: bytes,
    pos: int,
    sos_body: bytes,
    frame,
    qt,
    huff_dc,
    huff_ac,
    restart_interval: int,
) -> tuple[int, int, str, bytes]:
    w_img, h_img, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h_img + 8 * vmax - 1) // (8 * vmax)
    total_px = sum((mcux * c["h"] * 8) * (mcuy * c["v"] * 8) for c in comps)
    if total_px > 64_000_000:
        raise JpegError("image too large for in-container decode (>64 MP planes)")

    # coefficient store: MCU-padded block grid per component; non-
    # interleaved scans iterate only the ceil(sample/8) sub-grid
    coefs = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]
    for ci, c in enumerate(comps):
        cw = (w_img * c["h"] + hmax - 1) // hmax
        ch = (h_img * c["v"] + vmax - 1) // vmax
        c["bw"] = (cw + 7) // 8
        c["bh"] = (ch + 7) // 8
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}

    n_scans = 0
    while True:
        n_scans += 1
        if n_scans > 64:
            raise JpegError("more than 64 progressive scans (corrupt stream)")
        pos = _progressive_scan(
            payload, pos, sos_body, comps, by_id, coefs,
            huff_dc, huff_ac, restart_interval, mcux, mcuy,
        )
        # walk markers between scans (DHT/DRI/DQT updates, then SOS or EOI)
        sos_body = None
        while sos_body is None:
            if pos + 2 > len(payload):
                # missing EOI: tolerate (decode what we have), like baseline
                return _progressive_reconstruct(frame, qt, coefs, mcux, mcuy)
            if payload[pos] != 0xFF:
                raise JpegError(f"marker expected at offset {pos}")
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                return _progressive_reconstruct(frame, qt, coefs, mcux, mcuy)
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:
                continue
            if pos + 2 > len(payload):
                raise JpegError("truncated marker segment header")
            seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
            if seglen < 2 or pos + seglen > len(payload):
                raise JpegError("marker segment overruns payload")
            body = payload[pos + 2 : pos + seglen]
            pos += seglen
            if marker == 0xC4:  # DHT between scans
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0x0F
                    i += 1
                    bits = list(body[i : i + 16])
                    i += 16
                    n = sum(bits)
                    table = _HuffTable(bits, list(body[i : i + n]))
                    i += n
                    (huff_dc if tc == 0 else huff_ac)[th] = table
            elif marker == 0xDD:
                restart_interval = struct.unpack(">H", body[0:2])[0]
            elif marker == 0xDA:
                sos_body = body
            # DQT/APPn/COM between scans: skipped (tables fixed per frame)


def _progressive_scan(
    payload, pos, sos_body, comps, by_id, coefs,
    huff_dc, huff_ac, restart_interval, mcux, mcuy,
) -> int:
    """Decode one progressive scan; returns the payload offset of the
    marker that ended the entropy data."""
    ns = sos_body[0]
    scan_comps = []
    for c in range(ns):
        cs, tdta = sos_body[1 + 2 * c : 3 + 2 * c]
        if cs not in by_id:
            raise JpegError("SOS component id not in frame")
        scan_comps.append((by_id[cs], tdta >> 4, tdta & 0x0F))
    ss = sos_body[1 + 2 * ns]
    se = sos_body[2 + 2 * ns]
    ahal = sos_body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if ss > 63 or se > 63 or se < ss:
        raise JpegError(f"bad spectral band {ss}..{se}")
    if ss == 0 and se != 0:
        raise JpegError("progressive scan mixes DC and AC (Ss=0, Se>0)")
    if ss > 0 and ns != 1:
        raise JpegError("progressive AC scan must be single-component")
    if al > 13 or (ah and ah != al + 1):
        raise JpegError(f"bad successive approximation Ah={ah} Al={al}")

    br = _BitReader(payload, pos)
    eobrun = 0

    if ss == 0:
        # DC scan — interleaved over the MCU grid when ns>1, else the
        # component's own block grid
        preds = [0] * len(scan_comps)
        if ns > 1:
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    units.append((my, mx))
            mcu_count = 0
            for my, mx in units:
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    br.restart()
                    preds = [0] * len(scan_comps)
                for si, (ci, td, _ta) in enumerate(scan_comps):
                    c = comps[ci]
                    for iy in range(c["v"]):
                        for ix in range(c["h"]):
                            block = coefs[ci][my * c["v"] + iy, mx * c["h"] + ix]
                            preds[si] = _dc_unit(
                                br, block, ah, al, huff_dc, td, preds[si]
                            )
                mcu_count += 1
        else:
            ci, td, _ta = scan_comps[0]
            c = comps[ci]
            count = 0
            for byi in range(c["bh"]):
                for bxi in range(c["bw"]):
                    if restart_interval and count and count % restart_interval == 0:
                        br.restart()
                        preds = [0]
                    block = coefs[ci][byi, bxi]
                    preds[0] = _dc_unit(br, block, ah, al, huff_dc, td, preds[0])
                    count += 1
    else:
        ci, _td, ta = scan_comps[0]
        c = comps[ci]
        if ta not in huff_ac:
            raise JpegError("SOS references missing Huffman table")
        act = huff_ac[ta]
        count = 0
        for byi in range(c["bh"]):
            for bxi in range(c["bw"]):
                if restart_interval and count and count % restart_interval == 0:
                    br.restart()
                    eobrun = 0
                block = coefs[ci][byi, bxi]
                if ah == 0:
                    eobrun = _ac_first_unit(br, block, ss, se, al, act, eobrun)
                else:
                    eobrun = _ac_refine_unit(br, block, ss, se, al, act, eobrun)
                count += 1

    # the scan's entropy data ends at the next non-RST marker
    if br.marker is None:
        p = br.pos
        while p < len(payload):
            if (
                payload[p] == 0xFF
                and p + 1 < len(payload)
                and payload[p + 1] not in (0x00,)
                and not (0xD0 <= payload[p + 1] <= 0xD7)
            ):
                return p
            p += 1
        return len(payload)
    return br.pos


def _dc_unit(br, block, ah, al, huff_dc, td, pred):
    if ah == 0:  # first DC scan: Huffman-coded diffs of DC >> Al
        if td not in huff_dc:
            raise JpegError("SOS references missing Huffman table")
        t = br.decode(huff_dc[td])
        if t > 15:
            raise JpegError("DC category > 15")
        pred += _extend(br.receive(t), t)
        block[0] = pred << al
    else:  # refinement: one raw bit per block
        if br.read_bit():
            block[0] |= 1 << al
    return pred


def _ac_first_unit(br, block, ss, se, al, act, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise JpegError("AC run past spectral band")
        block[ZIGZAG[k]] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_unit(br, block, ss, se, al, act, eobrun) -> int:
    """Successive-approximation AC refinement (T.81 G.1.2.3): existing
    nonzero coefficients receive one correction bit when passed; runs and
    ZRL count only zero-history positions; an EOB run corrects the band
    remainder of each covered block."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode(act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: ZRL — advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refinement magnitude must be 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                ze = ZIGZAG[k]
                cur = int(block[ze])
                if cur != 0:
                    if br.read_bit() and (cur & p1) == 0:
                        block[ze] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            ze = ZIGZAG[k]
            cur = int(block[ze])
            if cur != 0 and br.read_bit() and (cur & p1) == 0:
                block[ze] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_reconstruct(frame, qt, coefs, mcux, mcuy):
    w_img, h_img, comps = frame
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise JpegError(f"component references missing DQT table {c['tq']}")
        planes.append(_idct_plane(coefs[ci], qt[c["tq"]]))
    return _assemble(frame, planes)


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, standard tables)
# ---------------------------------------------------------------------------


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """Conventional quality scaling (the same formula the ubiquitous
    libjpeg-derived encoders use): 1-100 → per-entry scale of the Annex K
    base table, clamped to [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # same bound as _BitReader._fill: keep only the unflushed tail
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from a canonical (BITS, HUFFVAL) spec."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a coefficient value (T.81 F.1.2.1.1:
    negatives encode as value-1 in ``category`` bits)."""
    t = abs(v).bit_length()
    return t, (v if v >= 0 else v - 1) & ((1 << t) - 1)


def _quantized_blocks(pad: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(bh, bw, 64) round-half-away quantized coefficients in ZIGZAG
    order for every 8×8 block of an 8-multiple plane — one batched
    forward DCT per row-chunk instead of per-block 8×8 matmuls. The ONE
    quantization routine both the baseline and progressive encoders use,
    so their coefficient grids are identical by construction."""
    h, w = pad.shape
    bh, bw = h // 8, w // 8
    qv = q.reshape(64)[ZIGZAG].astype(np.float64)
    out = np.empty((bh, bw, 64), dtype=np.int64)
    chunk = max(1, 2_000_000 // max(1, bw * 64))  # bound the float64 transient
    for r0 in range(0, bh, chunk):
        rows = pad[r0 * 8 : (r0 + chunk) * 8] - 128.0  # contiguous first
        n = rows.shape[0] // 8
        blocks = rows.reshape(n, 8, bw, 8).transpose(0, 2, 1, 3)
        # C @ block @ C.T as two axis contractions (one big GEMM each)
        t1 = np.tensordot(blocks, _C, axes=([2], [1]))  # → (n,bw,col,i)
        t2 = np.tensordot(t1, _C, axes=([2], [1]))  # → (n,bw,i,l)
        zz = t2.reshape(n, bw, 64)[:, :, ZIGZAG]
        # round half away from zero in one pass: trunc(x + copysign(.5,x))
        out[r0 : r0 + n] = (zz / qv + np.copysign(0.5, zz)).astype(np.int64)
    return out


def _write_block(bw: _BitWriter, qz: list[int], dc_tab, ac_tab, pred: int) -> int:
    """Entropy-code one block's ZIGZAG-order quantized coefficients
    (plain Python list) and return the new DC predictor."""
    diff = qz[0] - pred
    t, bits_ = _magnitude(diff)
    code, n = dc_tab[t]
    bw.write(code, n)
    bw.write(bits_, t)
    last_nz = 0
    for k in range(63, 0, -1):
        if qz[k]:
            last_nz = k
            break
    run = 0
    for k in range(1, last_nz + 1):
        v = qz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = ac_tab[0xF0]  # ZRL
            bw.write(code, n)
            run -= 16
        t, bits_ = _magnitude(v)
        code, n = ac_tab[(run << 4) | t]
        bw.write(code, n)
        bw.write(bits_, t)
        run = 0
    if last_nz < 63:
        code, n = ac_tab[0x00]  # EOB
        bw.write(code, n)
    return qz[0]


_SAMPLINGS = {
    # mode-RGB sampling name -> (h, v) factor per component (Y, Cb, Cr)
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
}


def _box_downsample(p: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Average fx×fy boxes (the conventional chroma decimation); edges are
    replicated first so partial boxes stay well-defined."""
    h, w = p.shape
    ph = (h + fy - 1) // fy * fy
    pw = (w + fx - 1) // fx * fx
    p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def jpeg_encode(
    w: int,
    h: int,
    mode: str,
    raw: bytes,
    *,
    quality: int = 90,
    sampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode raw pixels as a baseline sequential JFIF JPEG. mode "L"
    (w*h bytes) or "RGB" (w*h*3); ``sampling`` picks the chroma geometry
    ("444" no subsampling — tightest round trip; "422"/"420" the
    bandwidth-shaped layouts cameras emit); ``restart_interval`` > 0
    writes DRI + RSTn markers every that-many MCUs. Lossy by nature: flat
    fields survive within ±1, detail within the quantization error of
    ``quality``."""
    if mode not in ("L", "RGB"):
        raise JpegError(f"jpeg_encode supports L/RGB, not {mode!r}")
    bpp = 1 if mode == "L" else 3
    if len(raw) != w * h * bpp:
        raise JpegError(f"raw length {len(raw)} != {w}x{h}x{bpp}")
    if w == 0 or h == 0:
        raise JpegError("zero image dimension")
    if w > 65535 or h > 65535:
        raise JpegError("dimension exceeds JPEG 16-bit limit")
    if sampling not in _SAMPLINGS:
        raise JpegError(f"unknown sampling {sampling!r} (444/422/420)")

    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, bpp).astype(np.float64)
    if mode == "L":
        planes = [px[:, :, 0]]
        factors = [(1, 1)]
        qts = [_scaled_qt(_QT_LUMA, quality)]
        qids = [0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        factors = _SAMPLINGS[sampling]
        hmax = max(f[0] for f in factors)
        vmax = max(f[1] for f in factors)
        planes = [
            y,
            _box_downsample(cb, hmax // factors[1][0], vmax // factors[1][1]),
            _box_downsample(cr, hmax // factors[2][0], vmax // factors[2][1]),
        ]
        qts = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
        qids = [0, 1, 1]
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # pad each plane to its MCU-grid size by edge replication, then
    # quantize every block in one batched pass (zigzag-order int lists;
    # only the serial entropy write remains in the MCU loop)
    qz_lists = []
    for (fh, fv), p, qi in zip(factors, planes, qids):
        th, tw = mcuy * fv * 8, mcux * fh * 8
        pad = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        qz_lists.append(_quantized_blocks(pad, qts[qi]).tolist())

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        out += bytes([ci + 1, (fh << 4) | fv, qids[ci]])
    tables = (
        [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
        if ncomp == 1
        else [
            (0x00, _DC_LUMA), (0x10, _AC_LUMA),
            (0x01, _DC_CHROMA), (0x11, _AC_CHROMA),
        ]
    )
    for tclass, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tclass])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        out += bytes([ci + 1, td_ta])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for baseline

    bw = _BitWriter()
    preds = [0] * ncomp
    dc_tabs = [_encode_table(*_DC_LUMA)] + [_encode_table(*_DC_CHROMA)] * (ncomp - 1)
    ac_tabs = [_encode_table(*_AC_LUMA)] + [_encode_table(*_AC_CHROMA)] * (ncomp - 1)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        preds[ci] = _write_block(
                            bw, qz_lists[ci][my * fv + by][mx * fh + bx],
                            dc_tabs[ci], ac_tabs[ci], preds[ci],
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2): successive-approximation DC (Al=1 then the
# refinement bit-plane) + spectral-selection AC bands. This is the test
# harness's ground truth for the progressive DECODER paths above — the
# round trip must equal the baseline pipeline bit-for-bit, since both
# quantize identically. (AC successive approximation is deliberately NOT
# emitted: its correction-bit interleaving has no independent in-container
# validator, so that decoder path is pinned by a hand-assembled spec
# vector and real-world progressive files instead.)
# ---------------------------------------------------------------------------


def jpeg_encode_progressive(
    w: int,
    h: int,
    mode: str,
    raw: bytes,
    *,
    quality: int = 90,
    sampling: str = "444",
) -> bytes:
    """Encode raw pixels as a progressive (SOF2) JFIF JPEG with the scan
    script: interleaved DC (Al=1) → DC refinement → per-component AC
    bands 1-5 and 6-63. Same quantization as :func:`jpeg_encode`, so
    ``jpeg_decode_pixels`` returns identical pixels for both encodings."""
    if mode not in ("L", "RGB"):
        raise JpegError(f"jpeg_encode supports L/RGB, not {mode!r}")
    bpp = 1 if mode == "L" else 3
    if len(raw) != w * h * bpp:
        raise JpegError(f"raw length {len(raw)} != {w}x{h}x{bpp}")
    if w == 0 or h == 0 or w > 65535 or h > 65535:
        raise JpegError("bad image dimensions")
    if sampling not in _SAMPLINGS:
        raise JpegError(f"unknown sampling {sampling!r} (444/422/420)")

    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, bpp).astype(np.float64)
    if mode == "L":
        planes = [px[:, :, 0]]
        factors = [(1, 1)]
        qts = [_scaled_qt(_QT_LUMA, quality)]
        qids = [0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        factors = _SAMPLINGS[sampling]
        hmax_ = max(f[0] for f in factors)
        vmax_ = max(f[1] for f in factors)
        planes = [
            y,
            _box_downsample(cb, hmax_ // factors[1][0], vmax_ // factors[1][1]),
            _box_downsample(cr, hmax_ // factors[2][0], vmax_ // factors[2][1]),
        ]
        qts = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
        qids = [0, 1, 1]
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag coefficients for every block of the padded grids —
    # the SAME batched routine as the baseline encoder, so both encodings
    # carry identical coefficients by construction
    qz_all = []
    for (fh, fv), p, qi in zip(factors, planes, qids):
        th, tw = mcuy * fv * 8, mcux * fh * 8
        pad = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        qz_all.append(_quantized_blocks(pad, qts[qi]))

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        out += bytes([ci + 1, (fh << 4) | fv, qids[ci]])
    tables = (
        [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
        if ncomp == 1
        else [
            (0x00, _DC_LUMA), (0x10, _AC_LUMA),
            (0x01, _DC_CHROMA), (0x11, _AC_CHROMA),
        ]
    )
    for tclass, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tclass])
        out += bytes(bits) + bytes(vals)
    dc_tabs = [_encode_table(*_DC_LUMA)] + [_encode_table(*_DC_CHROMA)] * (ncomp - 1)
    ac_tabs = [_encode_table(*_AC_LUMA)] + [_encode_table(*_AC_CHROMA)] * (ncomp - 1)

    def sos(comp_ids, ss, se, ah, al_):
        seg = bytearray(
            b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        )
        for ci in comp_ids:
            td_ta = 0x00 if ci == 0 else 0x11
            seg += bytes([ci + 1, td_ta])
        seg += bytes([ss, se, (ah << 4) | al_])
        return seg

    # scan 1: interleaved DC, Al=1
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                fh, fv = factors[ci]
                for iy in range(fv):
                    for ix in range(fh):
                        v = int(qz_all[ci][my * fv + iy, mx * fh + ix, 0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        t, bits_ = _magnitude(diff)
                        code, n = dc_tabs[ci][t]
                        bw.write(code, n)
                        bw.write(bits_, t)
    bw.flush()
    out += sos(list(range(ncomp)), 0, 0, 0, 1) + bw.out

    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                fh, fv = factors[ci]
                for iy in range(fv):
                    for ix in range(fh):
                        bw.write(int(qz_all[ci][my * fv + iy, mx * fh + ix, 0]) & 1, 1)
    bw.flush()
    out += sos(list(range(ncomp)), 0, 0, 1, 0) + bw.out

    # per-component AC bands (non-interleaved; grid = ceil(sample/8))
    for ci in range(ncomp):
        fh, fv = factors[ci]
        cw = (w * fh + hmax - 1) // hmax
        ch = (h * fv + vmax - 1) // vmax
        bw_blocks = (cw + 7) // 8
        bh_blocks = (ch + 7) // 8
        for ss, se in ((1, 5), (6, 63)):
            bw = _BitWriter()
            for byi in range(bh_blocks):
                for bxi in range(bw_blocks):
                    qz = qz_all[ci][byi, bxi]
                    run = 0
                    emitted = False
                    for k in range(ss, se + 1):
                        v = int(qz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, n = ac_tabs[ci][0xF0]
                            bw.write(code, n)
                            run -= 16
                        t, bits_ = _magnitude(v)
                        code, n = ac_tabs[ci][(run << 4) | t]
                        bw.write(code, n)
                        bw.write(bits_, t)
                        run = 0
                        emitted = True
                    if run or not emitted:
                        code, n = ac_tabs[ci][0x00]  # EOB (run of 1)
                        bw.write(code, n)
            bw.flush()
            out += sos([ci], ss, se, 0, 0) + bw.out

    out += b"\xff\xd9"
    return bytes(out)
