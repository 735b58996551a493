"""Flink TypeSerializer-compatible binary codecs (pure Python, no Spark).

Byte-format parity with the serialized state the reference engine reads and
writes (SURVEY.md §1.1 / §7 Phase 2). Formats follow Apache Flink's public
serializers (DataOutput big-endian primitives, StringValue 7-bit varints) and
the RocksDB keyed-state layouts the reference decodes:

- key-and-namespace bytes: ``[kg prefix (1-2B BE)][key][namespace][mapkey?]``
  (reference: utils/RocksDBUtils.java:35-42,94-101; prefix width
  utils/StateMetadataUtils.java:89-91)
- value-state value: ``[8B TTL ts?][value]``
  (reader/KeyedStateReader.java:279-283)
- map-state value: ``[1B null flag][TTL ts?][value]``
  (reader/MapStateKKVReader.java:71-77)
- list-state value: elements separated by a 1-byte delimiter, each optionally
  TTL-prefixed (utils/RocksDBUtils.java:160-192)
- length-prefixed byte arrays: 4B BE length + payload
  (Flink BytePrimitiveArraySerializer, used by the snapshot stream:
  reader/inputformat/RocksDBSavepointIterator.java:106-107)

Everything is implemented from the format descriptions, not translated code;
all functions are exercised by golden-vector tests in tests/test_codecs.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Any, Callable, Iterator

HIGH_BIT = 0x80
LIST_SEPARATOR = 0x2C  # ',' — Flink RocksDB list-state element delimiter
TTL_BYTES = 8


class ByteReader:
    # kryo_refs carries the per-value Kryo reference-resolution context
    # (codecs/kryo.py) so nested container codecs share the one graph;
    # kryo_pending_slot is the read-id a container codec adopts BEFORE
    # decoding its children (Kryo's kryo.reference(...) order), which is
    # what lets cyclic graphs materialize as cyclic Python containers
    __slots__ = ("buf", "pos", "kryo_refs", "kryo_pending_slot")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self.kryo_refs = None
        self.kryo_pending_slot = -1

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"need {n} bytes at {self.pos}, have {len(b)}")
        self.pos += n
        return b

    def skip(self, n: int) -> None:
        self.pos += n

    def available(self) -> int:
        return len(self.buf) - self.pos


# --- primitives (Java DataOutput: big-endian, fixed width) ---


def merge_utf16_surrogates(s: str) -> str:
    """Collapse CESU-8-style surrogate PAIRS into astral characters while
    letting lone surrogates (legal in Java strings) survive — the shared
    final step of every Java modified-UTF-8 decode (DataInput.readUTF,
    Kryo strings): both wire formats transport UTF-16 units, so a decoded
    Python string may hold d800-dfff units that Java semantics join."""
    return s.encode("utf-16-be", "surrogatepass").decode(
        "utf-16-be", "surrogatepass"
    )


def write_bool(v: bool) -> bytes:
    return b"\x01" if v else b"\x00"


def read_bool(r: ByteReader) -> bool:
    return r.read(1)[0] != 0


def write_byte(v: int) -> bytes:
    return struct.pack(">b", v)


def write_short(v: int) -> bytes:
    return struct.pack(">h", v)


def read_short(r: ByteReader) -> int:
    return struct.unpack(">h", r.read(2))[0]


def read_unsigned_short(r: ByteReader) -> int:
    return struct.unpack(">H", r.read(2))[0]


def write_int(v: int) -> bytes:
    return struct.pack(">i", v)


def read_int(r: ByteReader) -> int:
    return struct.unpack(">i", r.read(4))[0]


def write_long(v: int) -> bytes:
    return struct.pack(">q", v)


def read_long(r: ByteReader) -> int:
    return struct.unpack(">q", r.read(8))[0]


def write_double(v: float) -> bytes:
    return struct.pack(">d", v)


def read_double(r: ByteReader) -> float:
    return struct.unpack(">d", r.read(8))[0]


def write_float(v: float) -> bytes:
    return struct.pack(">f", v)


def read_float(r: ByteReader) -> float:
    return struct.unpack(">f", r.read(4))[0]


# --- Flink StringValue format: (len+1) as 7-bit varint, then each UTF-16
# char as a 7-bit varint; len field 0 encodes SQL NULL. ---


def _write_var(v: int, out: bytearray) -> None:
    while v >= HIGH_BIT:
        out.append((v | HIGH_BIT) & 0xFF)
        v >>= 7
    out.append(v)


def _read_var(r: ByteReader) -> int:
    shift = 0
    result = 0
    while True:
        b = r.read(1)[0]
        if b >= HIGH_BIT:
            result |= (b & 0x7F) << shift
            shift += 7
        else:
            result |= b << shift
            return result


def write_string(s: str | None) -> bytes:
    out = bytearray()
    if s is None:
        out.append(0)
        return bytes(out)
    units = s.encode("utf-16-be")
    n_units = len(units) // 2
    _write_var(n_units + 1, out)
    for i in range(0, len(units), 2):
        cu = (units[i] << 8) | units[i + 1]
        _write_var(cu, out)
    return bytes(out)


def read_string(r: ByteReader) -> str | None:
    n = _read_var(r)
    if n == 0:
        return None
    n -= 1
    units = bytearray()
    for _ in range(n):
        cu = _read_var(r)
        units.append((cu >> 8) & 0xFF)
        units.append(cu & 0xFF)
    return units.decode("utf-16-be")


# --- length-prefixed byte arrays (BytePrimitiveArraySerializer) ---


def write_bytes_prefixed(b: bytes) -> bytes:
    return struct.pack(">i", len(b)) + b


def read_bytes_prefixed(r: ByteReader) -> bytes:
    n = read_int(r)
    return r.read(n)


# --- codec registry: name -> (encode(value)->bytes, decode(ByteReader)->value) ---


@dataclass(frozen=True)
class Codec:
    name: str
    encode: Callable[[Any], bytes]
    decode: Callable[[ByteReader], Any]
    fixed_length: int = -1  # -1 = variable (Flink TypeSerializer.getLength())
    # POJO codecs carry their member (name, Codec) pairs so readers can map
    # the value to a Spark StructType; None for scalar/opaque codecs
    fields: tuple = None
    # tuple codecs carry their component codecs so the Tuple1 key unwrap
    # (unwrap_tuple1_key) can recover the single field codec; None otherwise
    components: tuple = None


def _mk_fixed(name: str, writer, reader, length: int) -> Codec:
    return Codec(name, writer, reader, length)


INT = _mk_fixed("int", write_int, read_int, 4)
LONG = _mk_fixed("long", write_long, read_long, 8)
SHORT = _mk_fixed("short", write_short, read_short, 2)
BOOL = _mk_fixed("boolean", write_bool, read_bool, 1)
DOUBLE = _mk_fixed("double", write_double, read_double, 8)
FLOAT = _mk_fixed("float", write_float, read_float, 4)
STRING = Codec("string", write_string, read_string, -1)
BYTES = Codec("bytes", write_bytes_prefixed, read_bytes_prefixed, -1)

# VoidNamespaceSerializer writes a single 0 byte.
VOID_NAMESPACE = Codec("void-namespace", lambda _v: b"\x00", lambda r: (r.skip(1), None)[1], 1)

CODECS: dict[str, Codec] = {
    c.name: c for c in (INT, LONG, SHORT, BOOL, DOUBLE, FLOAT, STRING, BYTES, VOID_NAMESPACE)
}


def tuple_codec(*codecs: Codec) -> Codec:
    """Flink TupleSerializer: fields serialized back-to-back in order."""

    def enc(values) -> bytes:
        return b"".join(c.encode(v) for c, v in zip(codecs, values, strict=True))

    def dec(r: ByteReader):
        return tuple(c.decode(r) for c in codecs)

    return Codec(
        "tuple<" + ",".join(c.name for c in codecs) + ">",
        enc,
        dec,
        -1,
        components=tuple(codecs),
    )


def unwrap_tuple1_key(codec: Codec) -> Codec:
    """Transparent Tuple1 key unwrap, mirroring the reference
    (reader/OperatorStateReader.java:110-119): when the restored key
    serializer is a TupleSerializer of ``Tuple1`` the reference swaps in
    the single field serializer, so keys surface as bare values instead
    of 1-tuples. A Tuple1's wire format IS its field's wire format
    (TupleSerializer writes fields back-to-back with no header), so the
    swap is byte-identical both directions — decode yields the field,
    encode accepts the bare value. Applied automatically by every keyed
    reader and by ``kv_to_state_rows``; wider tuples pass through."""
    if codec.components is not None and len(codec.components) == 1:
        return codec.components[0]
    return codec


# --- POJO (flink-core PojoSerializer) ---

POJO_IS_NULL = 1
POJO_NO_SUBCLASS = 2
POJO_IS_SUBCLASS = 4
POJO_IS_TAGGED_SUBCLASS = 8


def pojo_codec(fields) -> Codec:
    """Flink PojoSerializer wire format (flink-core
    ``PojoSerializer.serialize``/``deserialize``): one flags byte
    (IS_NULL=1, NO_SUBCLASS=2, IS_SUBCLASS=4, IS_TAGGED_SUBCLASS=8), then
    for each declared field a boolean null marker (1 = field absent)
    followed by the field serializer's bytes. ``fields`` is an ordered
    sequence of (name, Codec) pairs — the field order IS the wire order,
    exactly as the metadata-declared field serializers restore it in the
    reference (reader/OperatorStateReader.java:100-104); plugging this
    codec into any reader is the X2 deserializer-override hook
    (reader/KeyedStateReader.java:114-158).

    Subclass records (IS_SUBCLASS writes the class name, IS_TAGGED_SUBCLASS
    a registry tag, then the SUBCLASS serializer's fields) need a JVM class
    registry to resolve; they raise a named error rather than mis-decode.
    Values decode to dicts keyed by field name (a Spark struct column)."""
    fields = tuple((str(n), c) for n, c in fields)

    def enc(value) -> bytes:
        if value is None:
            return bytes([POJO_IS_NULL])
        out = bytearray([POJO_NO_SUBCLASS])
        for fname, c in fields:
            v = value[fname] if isinstance(value, dict) else getattr(value, fname)
            if v is None:
                out += b"\x01"
            else:
                out += b"\x00" + c.encode(v)
        return bytes(out)

    def dec(r: ByteReader):
        flags = r.read(1)[0]
        if flags & POJO_IS_NULL:
            return None
        if flags & (POJO_IS_SUBCLASS | POJO_IS_TAGGED_SUBCLASS):
            raise ValueError(
                "PojoSerializer subclass record (flags "
                f"{flags:#x}) needs the writing job's class registry; "
                "supply a custom codec for subclass POJOs"
            )
        return {
            fname: (None if r.read(1)[0] else c.decode(r))
            for fname, c in fields
        }

    name = "pojo<" + ",".join(f"{n}:{c.name}" for n, c in fields) + ">"
    return Codec(name, enc, dec, -1, fields)


# --- keygroup prefix (SURVEY §1.1; 1 byte iff maxParallelism <= 128) ---


def key_group_prefix_bytes(max_parallelism: int) -> int:
    return 1 if max_parallelism <= 128 else 2


def write_key_group(key_group: int, prefix_bytes: int) -> bytes:
    return key_group.to_bytes(prefix_bytes, "big")


def read_key_group(r: ByteReader, prefix_bytes: int) -> int:
    return int.from_bytes(r.read(prefix_bytes), "big")


# --- key-and-namespace bytes ---


def is_ambiguous_key_possible(key_codec: Codec, namespace_codec: Codec) -> bool:
    """RocksDBUtils.isAmbiguousKeyPossible:89-92 — when BOTH the key and the
    namespace serializers are variable-length, RocksDB appends each field's
    byte length (as little-endian bytes, one per consumed 8 bits) after the
    field so the key/namespace boundary stays decodable."""
    return key_codec.fixed_length < 0 and namespace_codec.fixed_length < 0


def _write_var_int_bytes(length: int) -> bytes:
    # RocksDBUtils.writeVariableIntBytes: emit (value & 0xFF), shift by 8,
    # repeat while non-zero — always at least one byte
    out = bytearray()
    v = length
    while True:
        out.append(v & 0xFF)
        v >>= 8
        if v == 0:
            return bytes(out)


def _skip_var_int_bytes(r: ByteReader, length: int) -> None:
    # RocksDBUtils.readVariableIntBytes: skip as many bytes as the writer
    # emitted for this length
    v = length
    while True:
        r.skip(1)
        v >>= 8
        if v == 0:
            return


def encode_key_ns(
    key: Any,
    key_codec: Codec,
    max_parallelism: int,
    *,
    key_group: int | None = None,
    namespace_codec: Codec = VOID_NAMESPACE,
    namespace: Any = None,
    map_key: Any = None,
    map_key_codec: Codec | None = None,
) -> bytes:
    """``[kg prefix][key][namespace][mapkey?]`` for one row. The key group
    defaults to Flink's assignment hash of the key (hash parity, E1)."""
    from bravo_spark.codecs import hashes

    if key_group is None:
        kind = key_codec.name if key_codec.name in ("int", "long", "string") else None
        key_group = hashes.assign_to_key_group(key, max_parallelism, kind)
    ambiguous = is_ambiguous_key_possible(key_codec, namespace_codec)
    out = bytearray()
    out += write_key_group(key_group, key_group_prefix_bytes(max_parallelism))
    kb = key_codec.encode(key)
    out += kb
    if ambiguous:  # RocksDBUtils.writeKey:106-121
        out += _write_var_int_bytes(len(kb))
    nb = namespace_codec.encode(namespace)
    out += nb
    if ambiguous:  # RocksDBUtils.writeNameSpace:72-88
        out += _write_var_int_bytes(len(nb))
    if map_key is not None:
        if map_key_codec is None:
            raise ValueError("map_key given without map_key_codec")
        out += map_key_codec.encode(map_key)
    return bytes(out)


def decode_key_ns(
    buf: bytes,
    key_codec: Codec,
    max_parallelism: int,
    *,
    namespace_codec: Codec = VOID_NAMESPACE,
    map_key_codec: Codec | None = None,
):
    """Inverse of encode_key_ns → (key_group, key, namespace, map_key)."""
    ambiguous = is_ambiguous_key_possible(key_codec, namespace_codec)
    r = ByteReader(buf)
    kg = read_key_group(r, key_group_prefix_bytes(max_parallelism))
    before = r.pos
    key = key_codec.decode(r)
    if ambiguous:  # RocksDBUtils.readKey:45-57
        _skip_var_int_bytes(r, r.pos - before)
    before = r.pos
    ns = namespace_codec.decode(r)
    if ambiguous:  # RocksDBUtils.readNamespace:59-70
        _skip_var_int_bytes(r, r.pos - before)
    mk = map_key_codec.decode(r) if map_key_codec is not None else None
    return kg, key, ns, mk


# --- value payloads ---


def encode_value_state(value: Any, codec: Codec, *, ttl_ts: int | None = None) -> bytes:
    out = bytearray()
    if ttl_ts is not None:
        out += write_long(ttl_ts)
    out += codec.encode(value)
    return bytes(out)


def decode_value_state(buf: bytes, codec: Codec, *, ttl: bool = False) -> Any:
    r = ByteReader(buf)
    if ttl:
        r.skip(TTL_BYTES)
    return codec.decode(r)


def encode_map_value(value: Any, codec: Codec, *, ttl_ts: int | None = None) -> bytes:
    """Map-state value: 1-byte null flag, then (TTL-prefixed) value. Null map
    values are representable but the reference rejects them on read
    (MapStateKKVReader.java:78-80) — we keep that semantic in the reader."""
    if value is None:
        return b"\x01"
    out = bytearray(b"\x00")
    if ttl_ts is not None:
        out += write_long(ttl_ts)
    out += codec.encode(value)
    return bytes(out)


def decode_map_value(buf: bytes, codec: Codec, *, ttl: bool = False) -> Any:
    r = ByteReader(buf)
    if read_bool(r):
        return None
    if ttl:
        r.skip(TTL_BYTES)
    return codec.decode(r)


def encode_list_state(values, codec: Codec, *, ttl_ts: int | None = None) -> bytes:
    """List-state value: elements joined by the 1-byte separator; each element
    TTL-prefixed when the state is TTL-wrapped."""
    parts = []
    for v in values:
        b = (write_long(ttl_ts) if ttl_ts is not None else b"") + codec.encode(v)
        parts.append(b)
    return bytes([LIST_SEPARATOR]).join(parts)


def decode_list_state(buf: bytes, codec: Codec, *, ttl: bool = False) -> list:
    """Streaming split that mirrors deserializeList/deserializeNextElement
    semantics (read element, then consume one separator byte if more data)."""
    r = ByteReader(buf)
    out = []
    while r.available() > 0:
        if ttl:
            r.skip(TTL_BYTES)
        out.append(codec.decode(r))
        if r.available() > 0:
            r.skip(1)
    return out


# --- full-snapshot keyed-state stream (KeyGroupsStateHandle contents) ---

END_OF_KEY_GROUP_MARK = 0xFFFF
FIRST_BIT_IN_BYTE_MASK = 0x80


def has_meta_follows_flag(first_key_byte: int) -> bool:
    return (first_key_byte & FIRST_BIT_IN_BYTE_MASK) != 0


def clear_meta_follows_flag(key: bytearray) -> None:
    key[0] &= ~FIRST_BIT_IN_BYTE_MASK & 0xFF


def set_meta_follows_flag(key: bytearray) -> None:
    key[0] |= FIRST_BIT_IN_BYTE_MASK


def write_key_group_section(
    entries: list[tuple[int, bytes, bytes]],
) -> bytes:
    """Serialize one key group's worth of ``(state_id, key_ns, value)``
    entries (already ordered by state_id) into the stream layout:

    ``[short state_id]([len k][k][len v][v])* ... [short next_state_id] ...``
    with the metadata-follows flag set on the last key before each state-id
    change and before the final ``0xFFFF`` end-of-key-group mark.
    """
    if not entries:
        return b""
    out = bytearray()
    out += struct.pack(">h", entries[0][0])
    for i, (state_id, key_ns, value) in enumerate(entries):
        key = bytearray(key_ns)
        nxt = entries[i + 1] if i + 1 < len(entries) else None
        if nxt is None or nxt[0] != state_id:
            set_meta_follows_flag(key)
        out += write_bytes_prefixed(bytes(key))
        out += write_bytes_prefixed(value)
        if nxt is None:
            out += struct.pack(">H", END_OF_KEY_GROUP_MARK)
        elif nxt[0] != state_id:
            out += struct.pack(">h", nxt[0])
    return bytes(out)


def iter_key_group_section(
    buf: bytes,
    state_id_to_name: dict[int, str],
    state_filter: Callable[[str], bool] = lambda _s: True,
) -> Iterator[tuple[str, bytes, bytes]]:
    """Decode one key-group section → (state_name, key_ns, value) rows.
    Unselected states are skipped without decoding payloads (F1 pushdown:
    4-byte length reads + skips only)."""
    r = ByteReader(buf)
    state_id = read_short(r)
    while state_id != -1 and (state_id & 0xFFFF) != END_OF_KEY_GROUP_MARK:
        name = state_id_to_name.get(state_id, f"state-{state_id}")
        selected = state_filter(name)
        key_len = read_int(r)
        key0 = r.buf[r.pos]
        meta_follows = has_meta_follows_flag(key0)
        if selected:
            key = bytearray(r.read(key_len))
            val = read_bytes_prefixed(r)
            clear_meta_follows_flag(key)
            yield name, bytes(key), val
        else:
            r.skip(key_len)
            r.skip(read_int(r))
        if meta_follows:
            nxt = read_unsigned_short(r)
            if nxt == END_OF_KEY_GROUP_MARK:
                return
            state_id = struct.unpack(">h", struct.pack(">H", nxt))[0]
    return
