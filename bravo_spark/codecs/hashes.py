"""Hash parity with the reference's key-routing (SURVEY.md §2.9 E1/E2, §7.5).

Flink assigns a key to a key group with
``MathUtils.murmurHash(key.hashCode()) % maxParallelism``
(reference: bravo/writer/functions/ValueStateToKeyedStateRow.java:55 via
Flink KeyGroupRangeAssignment), and a key group to an operator subtask with
``keyGroup * parallelism / maxParallelism`` (types/KeyedStateRow.java:65-68).
Operator IDs are murmur3_128(uid) (utils/Identifiers.java:29-37).

These are public, documented algorithms (Apache Flink `MathUtils` /
`KeyGroupRangeAssignment`, Google Guava murmur3_128); a single bit of
divergence silently corrupts key routing, so everything here is golden-vector
tested (tests/test_codecs.py).
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF
INT_MIN = -(2**31)


def _to_signed32(v: int) -> int:
    v &= MASK32
    return v - (1 << 32) if v >= (1 << 31) else v


def _rotl32(v: int, r: int) -> int:
    v &= MASK32
    return ((v << r) | (v >> (32 - r))) & MASK32


def java_int_hash(v: int) -> int:
    """java.lang.Integer.hashCode — the value itself (as signed 32-bit)."""
    return _to_signed32(v)


def java_long_hash(v: int) -> int:
    """java.lang.Long.hashCode: (int)(v ^ (v >>> 32)) on the 64-bit pattern."""
    v &= 0xFFFFFFFFFFFFFFFF
    return _to_signed32(v ^ (v >> 32))


def java_string_hash(s: str) -> int:
    """java.lang.String.hashCode over UTF-16 code units."""
    h = 0
    data = s.encode("utf-16-be")
    for i in range(0, len(data), 2):
        cu = (data[i] << 8) | data[i + 1]
        h = (h * 31 + cu) & MASK32
    return _to_signed32(h)


def java_hash(key, kind: str | None = None) -> int:
    """Java hashCode of ``key``. ``kind`` ('int'|'long'|'string'|'boolean')
    pins the Java type — Integer vs Long hashCode differ for negative
    values, so typed callers (the codecs) always pass it; the heuristic
    default covers untyped use."""
    if kind == "int":
        return java_int_hash(key)
    if kind == "long":
        return java_long_hash(key)
    if kind == "string":
        return java_string_hash(key)
    if isinstance(key, bool):
        return 1231 if key else 1237
    if isinstance(key, int):
        if INT_MIN <= key < 2**31:
            return java_int_hash(key)
        return java_long_hash(key)
    if isinstance(key, str):
        return java_string_hash(key)
    raise TypeError(f"no java hashCode parity for {type(key)!r}")


def flink_murmur_hash(code: int) -> int:
    """Flink MathUtils.murmurHash(int) — murmur3 finalization of one int,
    folded to a non-negative int exactly like Flink does."""
    h = code & MASK32
    h = (h * 0xCC9E2D51) & MASK32
    h = _rotl32(h, 15)
    h = (h * 0x1B873593) & MASK32
    h = _rotl32(h, 13)
    h = (h * 5 + 0xE6546B64) & MASK32
    h ^= 4
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & MASK32
    h ^= h >> 16
    s = _to_signed32(h)
    if s >= 0:
        return s
    if s != INT_MIN:
        return -s
    return 0


def assign_to_key_group(key, max_parallelism: int, kind: str | None = None) -> int:
    """Flink KeyGroupRangeAssignment.assignToKeyGroup."""
    return flink_murmur_hash(java_hash(key, kind)) % max_parallelism


def operator_index_for_key_group(key_group: int, max_parallelism: int, parallelism: int) -> int:
    """Flink KeyGroupRangeAssignment.computeOperatorIndexForKeyGroup."""
    return key_group * parallelism // max_parallelism


def key_group_range_for_operator(max_parallelism: int, parallelism: int, op_index: int) -> range:
    """Flink KeyGroupRangeAssignment.computeKeyGroupRangeForOperatorIndex
    (inclusive start, exclusive end here)."""
    start = (op_index * max_parallelism + parallelism - 1) // parallelism
    end = ((op_index + 1) * max_parallelism - 1) // parallelism + 1
    return range(start, end)


# --- murmur3_128 (x64 variant, seed 0) — Guava/standard implementation, used
# for OperatorID = murmur3_128(operator-uid) parity. ---

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
MASK64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(v: int, r: int) -> int:
    v &= MASK64
    return ((v << r) | (v >> (64 - r))) & MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = 0) -> bytes:
    """128-bit murmur3 (x64), little-endian digest bytes like Guava's
    ``asBytes()``; operator_id(uid) == murmur3_128(uid.encode())."""
    h1 = seed & MASK64
    h2 = seed & MASK64
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64

    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")


def operator_id(uid: str) -> bytes:
    """Reference parity: utils/Identifiers.java:29-37 (Guava murmur3_128(0)
    over the UTF-8 uid)."""
    return murmur3_128(uid.encode("utf-8"))
