"""CRC-32C (Castagnoli) and the snappy/RocksDB masking, pure Python.

Both the snappy framing format and RocksDB block trailers checksum with
CRC-32C and then apply the same rotation mask (framing_format.txt §3;
rocksdb util/crc32c.h Mask/Unmask). Table-driven byte-at-a-time is plenty:
checksums cover small framed chunks / block trailers, not bulk data.
"""

from __future__ import annotations

_POLY = 0x82F63B78  # reflected Castagnoli polynomial

_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


MASK_DELTA = 0xA282EAD8


def mask(crc: int) -> int:
    """Rotate right 15 bits and add a constant (both snappy framing and
    RocksDB store masked CRCs so checksums of checksums stay well-behaved)."""
    return (((crc >> 15) | (crc << 17)) + MASK_DELTA) & 0xFFFFFFFF


def unmask(masked: int) -> int:
    rot = (masked - MASK_DELTA) & 0xFFFFFFFF
    return ((rot >> 17) | (rot << 15)) & 0xFFFFFFFF
