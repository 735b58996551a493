"""Pure-Python raw LZ4 block decoder (lz4_Block_format.md).

Used for RocksDB SST blocks (kLZ4Compression / kLZ4HCCompression — HC
changes only the encoder's match search, the block format is identical)
and for lz4-java's LZ4BlockOutputStream framing in Spark state files.
Decode-only: everything we WRITE uses snappy, which round-trips with the
sibling codec in ``codecs/snappy.py``. Pure Python is fine here — state
and SST blocks are tens of KB and the engine's hot data path (parquet,
shuffle) never goes through this module.
"""

from __future__ import annotations


def decompress_block(src: bytes, dlen: int) -> bytes:
    """Decode one raw LZ4 block to exactly ``dlen`` bytes."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        dst += src[i : i + lit]
        i += lit
        if i >= n:
            break  # last sequence: literals only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        ml = token & 0xF
        if ml == 15:
            while True:
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(dst) - off
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset before start")
        for k in range(ml):  # may overlap — must copy byte-wise
            dst.append(dst[start + k])
    if len(dst) != dlen:
        raise ValueError(f"LZ4 block decoded {len(dst)} bytes, expected {dlen}")
    return bytes(dst)
