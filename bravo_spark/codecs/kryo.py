"""Kryo-subset codec: the primitive wire formats Flink's KryoSerializer
emits for generic (non-POJO, non-tuple) state types.

The reference restores whatever ``TypeSerializer`` the snapshot metadata
names (``utils/StateMetadataUtils.java:149-162``); for generic types that is
Flink's Kryo wrapper, which calls ``kryo.writeClassAndObject`` per value
(auto-reset, so every value is self-contained). This module implements the
public Kryo stream format for the DEFAULT registrations — the nine
primitive-wrapper classes Kryo registers on construction, in order:
int=0, String=1, float=2, boolean=3, byte=4, char=5, short=6, long=7,
double=8 — plus the unregistered-class-name form used for ``byte[]``.
Layout per value::

    [class tag: varint(registration_id + 2); 0 = null, 1 = class-name form]
    [reference marker: varint 1, only when reference tracking is on and the
     type is reference-tracked (String, arrays — not primitive wrappers)]
    [payload: serializer-specific]

Payloads: int/long are zigzag varints (7-bit groups, 0x80 continuation);
float/double are fixed 4/8-byte big-endian IEEE bits; boolean/byte one
byte; char/short fixed 2-byte big-endian; String is one of three forms —
0x80|len+1 varint-flag header (bits 0-5 + 0x40 continuation in the first
byte, then 7-bit groups) followed by UTF-8, OR bare ASCII bytes with the
last char's high bit set, OR 0x80 alone for null.

Every branch is cross-validated in tests/test_kryo.py against the real
Kryo shipped inside this Spark's JVM (both reference-tracking settings,
both directions). Reference resolution is FULL for container graphs:
back-reference markers (> 1) return the already-decoded object from the
per-value graph, repeated class names resolve through the per-value
nameId cache, and container codecs register their result object BEFORE
decoding children (Kryo's ``kryo.reference`` order) — so CYCLIC graphs
(arr[0] = arr) decode to genuinely cyclic Python lists/dicts and encode
back with real back-reference markers (the write side tracks container
identity per value). A cyclic value still cannot materialize as a Spark
COLUMN (Arrow cannot serialize it) — cycles are a driver-side surgery
surface; only cycles through non-adopting payloads (immutable or custom
codecs) keep the named refusal.

Job-registered classes (the reference restores *whatever* serializer the
snapshot metadata names, ``reader/OperatorStateReader.java:100-104``)
decode through a user-supplied ``registrations`` mapping: ``{id: Codec}``
mirrors the writing job's ``kryo.register(Cls)`` order (user ids start at
9, after the constructor registrations), and ``{"fully.qualified.Name":
Codec}`` covers the unregistered class-name form. The payload ``Codec``
describes the registered serializer's wire format; without an entry the
refusal names the id/class so the user knows exactly what to supply.
"""

from __future__ import annotations

import struct
import threading
from contextlib import contextmanager

from bravo_spark.codecs.flink import ByteReader, Codec, merge_utf16_surrogates

_TAG_NULL = 0
_TAG_NAME = 1
# Kryo constructor registrations, in order (Kryo.java: int, String, float,
# boolean, byte, char, short, long, double) — tag = id + 2
_ID_INT, _ID_STRING, _ID_FLOAT, _ID_BOOL = 0, 1, 2, 3
_ID_BYTE, _ID_CHAR, _ID_SHORT, _ID_LONG, _ID_DOUBLE = 4, 5, 6, 7, 8
# user registrations start after the constructor's nine (Kryo.java
# getNextRegistrationId on a fresh instance)
_FIRST_USER_ID = 9


class KryoError(ValueError):
    pass


# --- varints (7-bit little-endian groups, 0x80 = continuation) ---


def read_varint(r: ByteReader) -> int:
    # Kryo caps variable-length longs at 9 bytes: bytes 1-8 hold 7-bit
    # groups with 0x80 continuation, the 9th holds bits 56-63 WHOLE (no
    # continuation bit — Input.readVarLong)
    result = 0
    for i in range(8):
        b = r.read(1)[0]
        result |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return result
    return result | (r.read(1)[0] << 56)


def write_varint(v: int) -> bytes:
    out = bytearray()
    for _ in range(8):
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v & 0xFF)  # 9th byte: bits 56-63 whole (Output.writeVarLong)
    return bytes(out)


def _zz_enc(v: int, bits: int) -> int:
    mask = (1 << bits) - 1
    return ((v << 1) ^ (v >> (bits - 1))) & mask


def _zz_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# --- strings (Kryo Output.writeString / Input.readString) ---


def read_kryo_string(r: ByteReader) -> str | None:
    b0 = r.read(1)[0]
    if b0 & 0x80:  # varint-flag length form
        length = b0 & 0x3F
        if b0 & 0x40:
            shift = 6
            while True:
                b = r.read(1)[0]
                length |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
        if length == 0:
            return None
        n_chars = length - 1
        # Kryo "chars" are UTF-16 code units, written as CESU-8: astral
        # characters arrive as TWO 3-byte surrogate sequences (each one
        # unit), never as a 4-byte UTF-8 sequence — consume exactly
        # n_chars units, then merge surrogate pairs
        out = []
        for _ in range(n_chars):
            c = r.read(1)[0]
            if c < 0x80:
                out.append(c.to_bytes(1, "big"))
            elif c < 0xE0:
                out.append(bytes([c]) + r.read(1))
            elif c < 0xF0:
                out.append(bytes([c]) + r.read(2))
            else:
                raise KryoError(
                    f"invalid Kryo UTF-8 lead byte {c:#x} (chars are "
                    "UTF-16 units; 4-byte sequences never occur)"
                )
        try:
            units = b"".join(out).decode("utf-8", "surrogatepass")
            # pairs merge to astral characters, lone units survive
            return merge_utf16_surrogates(units)
        except UnicodeDecodeError as exc:
            raise KryoError(f"damaged Kryo string payload: {exc}") from None
    # ASCII form: bytes until the high-bit-marked last char (all forced
    # below 0x80 by construction, so the decode cannot fail)
    chars = bytearray([b0])
    while not chars[-1] & 0x80:
        chars.append(r.read(1)[0])
    chars[-1] &= 0x7F
    return chars.decode("ascii")


def write_kryo_string(s: str | None) -> bytes:
    if s is None:
        return b"\x80"
    # always emit the varint-flag + CESU-8 form — spec-valid for any
    # string and what Kryo itself emits outside the short-pure-ASCII fast
    # path. The length counts UTF-16 units and astral characters encode
    # as two 3-byte surrogate sequences (Kryo writes char-by-char);
    # surrogatepass keeps unpaired surrogates (legal Java strings) intact.
    if all(ord(c) <= 0xFFFF for c in s):
        # BMP-only: CESU-8 == UTF-8 and unit count == len(s) — skip the
        # per-unit loop on the common path
        body = s.encode("utf-8", "surrogatepass")
        n_units = len(s)
    else:
        u16 = s.encode("utf-16-be", "surrogatepass")
        units = [
            int.from_bytes(u16[i : i + 2], "big")
            for i in range(0, len(u16), 2)
        ]
        body = b"".join(
            chr(u).encode("utf-8", "surrogatepass") for u in units
        )
        n_units = len(units)
    length = n_units + 1
    first = 0x80 | (length & 0x3F)
    rest = bytearray()
    length >>= 6
    if length:
        first |= 0x40
        while True:
            if length < 0x80:
                rest.append(length)
                break
            rest.append((length & 0x7F) | 0x80)
            length >>= 7
    return bytes([first]) + bytes(rest) + body


# --- tagged values ---

_EXPECT = {
    # expect name (doubles as the Flink-codec name for Spark type mapping)
    "int": _ID_INT,
    "string": _ID_STRING,
    "float": _ID_FLOAT,
    "boolean": _ID_BOOL,
    "byte": _ID_BYTE,
    "char": _ID_CHAR,
    "short": _ID_SHORT,
    "long": _ID_LONG,
    "double": _ID_DOUBLE,
    "bytes": None,  # class-name form "[B"
}


class _RefCtx:
    """Per-top-level-value Kryo resolution state (auto-reset means one
    ``writeClassAndObject`` value is one graph): ``objects`` mirrors
    MapReferenceResolver's read-object table (ids assigned in first-
    occurrence preorder), ``class_names`` mirrors the ClassResolver's
    nameId → class cache (used regardless of ``setReferences``)."""

    __slots__ = ("objects", "class_names")

    def __init__(self):
        self.objects: list = []
        self.class_names: dict[int, str] = {}


# sentinel for a reserved-but-unfilled read slot: a back-reference landing
# on it means the object graph is CYCLIC (the object refers to itself
# through some chain), which a value decoder cannot materialize
_PENDING = object()


def _read_ref(r: ByteReader):
    """Consume one reference marker (Kryo.readReferenceOrNull): returns
    ``("new", slot)`` when a fresh object follows (slot reserved, fill it
    after decoding — Kryo's nextReadId reservation order) or
    ``("ref", obj)`` for an ACYCLIC back-reference to an already-decoded
    object. Cyclic back-references (the slot is still pending) are
    refused by name."""
    m = read_varint(r)
    ctx = r.kryo_refs
    if m == 1:
        if ctx is None:
            return "new", -1
        ctx.objects.append(_PENDING)
        return "new", len(ctx.objects) - 1
    idx = m - 2
    if ctx is None or not 0 <= idx < len(ctx.objects):
        raise KryoError(
            f"Kryo back-reference to read-id {idx}: no such object in "
            "this value's graph — damaged stream or reference-tracking "
            "mismatch with the writing job"
        )
    obj = ctx.objects[idx]
    if obj is _PENDING:
        raise KryoError(
            f"cyclic Kryo back-reference (read-id {idx} is still being "
            "constructed) through a non-adopting payload codec: only "
            "container codecs (list/map/array) can materialize cycles — "
            "a custom codec must register its object before decoding "
            "children to participate in a cycle"
        )
    return "ref", obj


def _fill_ref(r: ByteReader, slot: int, value):
    if slot >= 0 and r.kryo_refs is not None:
        r.kryo_refs.objects[slot] = value
    return value


def _adopt_pending(r: ByteReader, obj) -> None:
    """Container codecs call this right after creating their (empty,
    mutable) result object and BEFORE decoding children — mirroring
    Kryo's ``kryo.reference(object)`` registration order. A child's
    back-reference to the enclosing container then resolves to the same
    Python object, so CYCLIC graphs (arr[0] = arr) materialize as
    genuinely cyclic Python lists/dicts instead of refusing. The
    ``_PENDING`` refusal in :func:`_read_ref` remains for cycles through
    non-adopting codecs (immutable or custom payloads), which cannot be
    patched after the fact."""
    slot = r.kryo_pending_slot
    if slot >= 0 and r.kryo_refs is not None:
        r.kryo_refs.objects[slot] = obj
    r.kryo_pending_slot = -1


def read_kryo_value(
    r: ByteReader,
    *,
    references: bool = True,
    expect: str | int | None = None,
    registrations: dict | None = None,
):
    """Decode one ``writeClassAndObject`` value. Returns the Python value
    (None for a null class tag). With ``expect`` set, a class tag other
    than the expected type's is refused by name at decode time — not left
    to surface as an opaque Arrow cast error columns away.

    ``expect`` may be a default-registration name (``_EXPECT`` key), a
    registration id ≥ 9, or a fully-qualified class name; the latter two
    need a matching ``registrations`` entry supplying the payload codec.

    Reference-resolution markers are fully honored: a back-reference
    returns the already-decoded object, class-name ids resolve through
    the per-value nameId cache (Kryo writes a repeated class's name once
    per value), and container payload codecs (e.g.
    :func:`object_array_codec`) register their result object before
    decoding children — so cyclic container graphs decode to genuinely
    cyclic Python lists/dicts (a driver-side surgery surface; Arrow
    cannot serialize them into a column). Cycles through non-adopting
    payloads are refused by name."""
    regs = registrations or {}
    # auto-reset: one writeClassAndObject value == one graph
    with _read_graph(r):
        return _read_tagged(
            r, references=references, expect=expect, regs=regs
        )


def _read_tagged(
    r: ByteReader, *, references: bool, expect, regs: dict
):
    tag = read_varint(r)
    if tag == _TAG_NULL:
        return None
    if expect is not None:
        if isinstance(expect, int):
            want = expect + 2
        elif expect in _EXPECT and expect != "bytes":
            want = _EXPECT[expect] + 2
        else:  # "bytes" or a custom class name — both use the name form
            want = _TAG_NAME
        if tag != want:
            raise KryoError(
                f"Kryo class tag {tag} where a {expect!r} value "
                f"(tag {want}) was expected"
            )
    if tag == _TAG_NAME:
        name_id = read_varint(r)
        names = r.kryo_refs.class_names
        if name_id in names:
            cls = names[name_id]  # repeated class: name written once
        else:
            cls = read_kryo_string(r)
            names[name_id] = cls
        if isinstance(expect, str) and expect not in _EXPECT and cls != expect:
            raise KryoError(
                f"Kryo class {cls!r} where a {expect!r} value was expected"
            )
        codec = regs.get(cls)
        if codec is not None:
            if references:
                kind, got = _read_ref(r)
                if kind == "ref":
                    return got
                r.kryo_pending_slot = got
                try:
                    val = codec.decode(r)
                finally:
                    r.kryo_pending_slot = -1
                return _fill_ref(r, got, val)
            return codec.decode(r)
        if cls != "[B":
            raise KryoError(
                f"unregistered Kryo class {cls!r}: supply a payload codec "
                f"via registrations={{{cls!r}: codec}}"
            )
        if references:
            kind, got = _read_ref(r)
            if kind == "ref":
                return got
            n = read_varint(r)  # length + 1, 0 = null
            return _fill_ref(
                r, got, None if n == 0 else bytes(r.read(n - 1))
            )
        n = read_varint(r)
        return None if n == 0 else bytes(r.read(n - 1))
    rid = tag - 2
    if rid >= _FIRST_USER_ID:
        codec = regs.get(rid)
        if codec is None:
            raise KryoError(
                f"Kryo registration id {rid}: beyond the default "
                "registrations — supply the writing job's codec via "
                f"registrations={{{rid}: codec}}"
            )
        if references:
            kind, got = _read_ref(r)
            if kind == "ref":
                return got
            r.kryo_pending_slot = got
            try:
                val = codec.decode(r)
            finally:
                r.kryo_pending_slot = -1
            return _fill_ref(r, got, val)
        return codec.decode(r)
    if rid == _ID_INT:
        return _zz_dec(read_varint(r))
    if rid == _ID_STRING:
        if references:
            kind, got = _read_ref(r)
            if kind == "ref":
                return got
            return _fill_ref(r, got, read_kryo_string(r))
        return read_kryo_string(r)
    if rid == _ID_FLOAT:
        return struct.unpack(">f", r.read(4))[0]
    if rid == _ID_BOOL:
        return r.read(1)[0] != 0
    if rid == _ID_BYTE:
        return struct.unpack(">b", r.read(1))[0]
    if rid == _ID_CHAR:
        return chr(struct.unpack(">H", r.read(2))[0])
    if rid == _ID_SHORT:
        return struct.unpack(">h", r.read(2))[0]
    if rid == _ID_LONG:
        return _zz_dec(read_varint(r))
    if rid == _ID_DOUBLE:
        return struct.unpack(">d", r.read(8))[0]
    raise KryoError(f"Kryo registration id {rid} has no decoder")


_WRITE_TLS = threading.local()


@contextmanager
def _read_graph(r: ByteReader):
    """One shared reference graph per top-level value on the READ side.
    Every decode entry point (read_kryo_value, container codec .decode)
    opens this scope; nested opens are no-ops, so elements of a container
    share the enclosing value's graph whichever door the decode came
    through."""
    top = r.kryo_refs is None
    if top:
        r.kryo_refs = _RefCtx()
    try:
        yield
    finally:
        if top:
            r.kryo_refs = None


class _WGraph:
    """WRITE-side reference graph: ``n`` counts every new-object marker
    written (the reader assigns one read-id per marker, in the same
    preorder), ``ids`` records identity → (read-id, class-expect) for
    MUTABLE CONTAINERS only — the objects a Python value graph can share
    or cycle through."""

    __slots__ = ("n", "ids")

    def __init__(self):
        self.n = 0
        self.ids: dict[int, tuple[int, object]] = {}


@contextmanager
def _write_names():
    """WRITE-side twin of :func:`_read_graph`: one nameId cache AND one
    reference graph per top-level value, whichever encode entry point
    opened it. Without a shared name cache a container writing two
    name-form elements would emit nameId 0 + the full name twice — bytes
    every conforming reader (including ours) misparses; without the
    shared reference graph a cyclic container would recurse forever."""
    top = getattr(_WRITE_TLS, "names", None) is None
    if top:
        _WRITE_TLS.names = {}
        _WRITE_TLS.wgraph = _WGraph()
    try:
        yield
    finally:
        if top:
            _WRITE_TLS.names = None
            _WRITE_TLS.wgraph = None


def _write_marker(value, expect_cls) -> tuple[bytes, bool]:
    """One reference marker on the write side (Kryo's
    writeReferenceOrNull): ``(varint(1), False)`` for a new object —
    advancing the read-id counter the reader will mirror — or
    ``(varint(read_id + 2), True)`` for a container already written in
    this value, in which case the caller must NOT write a payload.
    Identity is tracked for lists/dicts only; immutable values always
    write fresh (stream-legal, and byte-identical to the pre-cycle
    encoder)."""
    g = _WRITE_TLS.wgraph
    if isinstance(value, (list, dict)):
        hit = g.ids.get(id(value))
        if hit is not None:
            return write_varint(hit[0] + 2), True
        g.ids[id(value)] = (g.n, expect_cls)
    g.n += 1
    return write_varint(1), False


def _backref_element(v) -> bytes | None:
    """Class tag + back-reference bytes when ``v`` is a container already
    written in this value's graph (the only way a cycle or shared
    container reaches a container element encoder), else None. The class
    tag re-uses the class recorded at the object's first write — Kryo
    writes the class on EVERY occurrence, with the nameId cache
    compressing repeats."""
    g = getattr(_WRITE_TLS, "wgraph", None)
    if g is None or not isinstance(v, (list, dict)):
        return None
    hit = g.ids.get(id(v))
    if hit is None:
        return None
    gid, cls = hit
    if isinstance(cls, int):
        tag = write_varint(cls + 2)
    else:
        tag = write_varint(_TAG_NAME) + _write_class_name(cls)
    return tag + write_varint(gid + 2)


def _write_class_name(cls: str) -> bytes:
    """writeClass name form with per-value nameId caching: the first
    occurrence of a class within one value writes its nameId followed by
    the name string; repeats write the nameId ALONE — exactly what Kryo's
    ClassResolver emits (and what :func:`_read_tagged` reads back). The
    cache lives for one top-level write (auto-reset semantics); every
    encode entry point opens :func:`_write_names`, so it is always set."""
    names = _WRITE_TLS.names
    if cls in names:
        return write_varint(names[cls])
    names[cls] = len(names)
    return write_varint(names[cls]) + write_kryo_string(cls)


def write_kryo_value(
    value,
    expect: str | int,
    *,
    references: bool = True,
    registrations: dict | None = None,
) -> bytes:
    """Encode one value as ``writeClassAndObject`` bytes of the ``expect``
    type (a key of ``_EXPECT``, a registration id ≥ 9, or a class name —
    the latter two encode via their ``registrations`` payload codec).

    Duplicate IMMUTABLE values inside one value are written as fresh
    objects, not back-references — stream-legal (the reader simply
    assigns each its own read-id). Duplicate CONTAINER objects (same
    list/dict instance, including self-referential cycles) ARE written
    as back-reference markers — the only stream-legal encoding of a
    cycle; class NAMES cache per value, as Kryo requires."""
    with _write_names():
        return _write_tagged(
            value, expect, references=references,
            registrations=registrations,
        )


def _write_tagged(
    value,
    expect: str | int,
    *,
    references: bool = True,
    registrations: dict | None = None,
) -> bytes:
    regs = registrations or {}
    if value is None:
        return write_varint(_TAG_NULL)
    if isinstance(expect, int):
        codec = regs.get(expect)
        if codec is None:
            raise KryoError(
                f"Kryo registration id {expect}: no payload codec supplied"
            )
        out = write_varint(expect + 2)
        if references:
            marker, back = _write_marker(value, expect)
            out += marker
            if back:
                return out
        return out + codec.encode(value)
    if expect not in _EXPECT:
        codec = regs.get(expect)
        if codec is None:
            raise KryoError(f"unsupported Kryo expect type {expect!r}")
        out = write_varint(_TAG_NAME) + _write_class_name(expect)
        if references:
            marker, back = _write_marker(value, expect)
            out += marker
            if back:
                return out
        return out + codec.encode(value)
    if expect == "bytes":
        out = write_varint(_TAG_NAME) + _write_class_name("[B")
        if references:
            out += _write_marker(value, None)[0]
        return out + write_varint(len(value) + 1) + bytes(value)
    rid = _EXPECT[expect]
    out = write_varint(rid + 2)
    if rid == _ID_INT:
        return out + write_varint(_zz_enc(int(value), 32))
    if rid == _ID_STRING:
        if references:
            out += _write_marker(value, None)[0]
        return out + write_kryo_string(value)
    if rid == _ID_FLOAT:
        return out + struct.pack(">f", value)
    if rid == _ID_BOOL:
        return out + (b"\x01" if value else b"\x00")
    if rid == _ID_BYTE:
        return out + struct.pack(">b", int(value))
    if rid == _ID_CHAR:
        return out + struct.pack(">H", ord(value))
    if rid == _ID_SHORT:
        return out + struct.pack(">h", int(value))
    if rid == _ID_LONG:
        return out + write_varint(_zz_enc(int(value), 64))
    return out + struct.pack(">d", value)


def kryo_codec(
    expect: str | int = "string",
    *,
    references: bool = True,
    registrations: dict | None = None,
) -> Codec:
    """A :class:`~bravo_spark.codecs.flink.Codec` for Kryo-serialized state
    values (the X2 deserializer-override hook). ``expect`` names the value
    type (``kryo<expect>`` becomes the codec name — deliberately DISTINCT
    from the plain fixed-width codec names, which dispatch readers onto
    the numpy fixed-byte fast path that would bypass Kryo framing); the
    decoded class tag must agree with it. ``references`` mirrors
    ``kryo.setReferences`` of the writing job.

    ``registrations`` mirrors the writing job's custom ``kryo.register``
    calls: ``{id: payload_codec}`` in registration order (user ids start
    at 9) and/or ``{"fully.qualified.Name": payload_codec}`` for classes
    Kryo writes by name. ``expect`` may then be one of those ids/names.
    Ids below 9 are refused — they'd shadow Kryo's fixed constructor
    registrations (int=0 … double=8)."""
    regs = dict(registrations or {})
    for k in regs:
        if isinstance(k, int) and k < _FIRST_USER_ID:
            raise KryoError(
                f"registration id {k} shadows a Kryo default registration "
                f"(user ids start at {_FIRST_USER_ID})"
            )
    if isinstance(expect, int) or expect not in _EXPECT:
        if expect not in regs:
            raise KryoError(
                f"unsupported Kryo expect type {expect!r} (not a default "
                "registration and no registrations entry)"
            )

    def enc(v) -> bytes:
        return write_kryo_value(
            v, expect, references=references, registrations=regs
        )

    def dec(r: ByteReader):
        return read_kryo_value(
            r, references=references, expect=expect, registrations=regs
        )

    # a custom-class payload codec that declares fields (dict values, like
    # pojo_codec) keeps them visible so readers map the value to a Spark
    # struct column
    payload = regs.get(expect)
    fields = payload.fields if payload is not None else None
    return Codec(f"kryo<{expect}>", enc, dec, -1, fields=fields)


def _enc_element(v, *, references: bool, regs: dict) -> bytes:
    """One container element as writeClassAndObject bytes: NULL tag,
    a class-tag + back-reference pair for a container already written in
    this value (how cycles and shared sub-containers encode), or a fresh
    tagged write with the element type inferred from the Python type."""
    if v is None:
        return write_varint(_TAG_NULL)
    if references:
        back = _backref_element(v)
        if back is not None:
            return back
    return _write_tagged(
        v, _infer_element_expect(v, regs), references=references,
        registrations=regs,
    )


def _infer_element_expect(v, regs: dict | None = None) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, int):
        return "int" if -(2**31) <= v < 2**31 else "long"
    if isinstance(v, float):
        return "double"
    # nested containers: a Python list/dict maps onto whichever container
    # class the caller registered (ArrayList preferred over Object[] when
    # both are present — the common Flink state shape); a registrations
    # mapping is the single source of truth for class choice, exactly as
    # on the decode side
    if regs:
        if isinstance(v, list):
            for cls in ("java.util.ArrayList", "[Ljava.lang.Object;"):
                if cls in regs:
                    return cls
        if isinstance(v, dict) and "java.util.HashMap" in regs:
            return "java.util.HashMap"
    raise KryoError(
        f"cannot infer a Kryo element type for {type(v).__name__}; "
        "encode via an explicit registrations payload codec"
    )


def object_array_codec(
    *, references: bool = True, registrations: dict | None = None
) -> Codec:
    """Payload codec for Kryo's ObjectArraySerializer over ``Object[]``
    (non-final element type): ``varint(length + 1)`` then each element as
    a full ``writeClassAndObject`` — class tag + reference marker +
    payload. Use as ``registrations={"[Ljava.lang.Object;": object_array_
    codec(...)}``.

    Elements share the enclosing value's reference graph through the
    reader, so duplicate objects arrive as back-references (decoded to
    the already-read value) and a repeated element class writes its name
    once (nameId cache) — both JVM-cross-validated in tests/test_kryo.py.
    Encoding infers element tags from the Python types (bool/str/bytes/
    int/float) and writes duplicates as fresh objects (stream-legal)."""
    # preserve the caller's dict IDENTITY (even empty): the
    # self-referential registration pattern inserts this codec's own
    # class into the same mapping AFTER construction
    regs = {} if registrations is None else registrations

    def enc(vals) -> bytes:
        if vals is None:
            return write_varint(0)
        with _write_names():
            out = write_varint(len(vals) + 1)
            for v in vals:
                out += _enc_element(v, references=references, regs=regs)
        return out

    def dec(r: ByteReader):
        # ONE graph for the whole array, nested or standalone — a
        # per-element graph would desync nameId-cached class names and
        # back-references between elements
        with _read_graph(r):
            n = read_varint(r)
            if n == 0:
                return None
            out: list = []
            # register BEFORE children (Kryo's reference order): a child
            # back-reference to this array decodes to this same list
            _adopt_pending(r, out)
            for _ in range(n - 1):
                out.append(
                    read_kryo_value(
                        r, references=references, registrations=regs
                    )
                )
            return out

    return Codec("kryo-object-array", enc, dec, -1)


def collection_codec(
    *, references: bool = True, registrations: dict | None = None
) -> Codec:
    """Payload codec for Kryo's CollectionSerializer over plain
    ``java.util.ArrayList``-style collections (no generics optimization):
    ``varint(size)`` — NOTE: no +1, unlike arrays — then each element as
    a full ``writeClassAndObject``. Use as
    ``registrations={"java.util.ArrayList": collection_codec(...)}``.
    Elements share the enclosing value's reference graph; encoding infers
    element tags like :func:`object_array_codec`."""
    # preserve the caller's dict IDENTITY (even empty): the
    # self-referential registration pattern inserts this codec's own
    # class into the same mapping AFTER construction
    regs = {} if registrations is None else registrations

    def enc(vals) -> bytes:
        if vals is None:
            # unlike ObjectArraySerializer's length+1 scheme, Kryo's
            # collection payload has no in-band null representation —
            # null collections are encoded one level up by the
            # writeClassAndObject NULL class tag, which this payload
            # codec never sees when used standalone
            raise KryoError(
                "kryo-collection cannot encode None standalone — a null "
                "collection is a class-tag-level NULL; encode it through "
                "write_kryo_value, or pass an empty list"
            )
        with _write_names():
            out = write_varint(len(vals))
            for v in vals:
                out += _enc_element(v, references=references, regs=regs)
        return out

    def dec(r: ByteReader):
        with _read_graph(r):
            n = read_varint(r)
            out: list = []
            _adopt_pending(r, out)
            for _ in range(n):
                out.append(
                    read_kryo_value(
                        r, references=references, registrations=regs
                    )
                )
            return out

    return Codec("kryo-collection", enc, dec, -1)


def map_codec(
    *, references: bool = True, registrations: dict | None = None
) -> Codec:
    """Payload codec for Kryo's MapSerializer over plain
    ``java.util.HashMap``-style maps: ``varint(size)``, then each entry's
    key and value as full ``writeClassAndObject`` streams. Use as
    ``registrations={"java.util.HashMap": map_codec(...)}``. A decoded
    key that is unhashable in Python (e.g. a nested collection) is
    refused by name."""
    # preserve the caller's dict IDENTITY (even empty): the
    # self-referential registration pattern inserts this codec's own
    # class into the same mapping AFTER construction
    regs = {} if registrations is None else registrations

    def enc(d) -> bytes:
        if d is None:
            raise KryoError(
                "kryo-map cannot encode None standalone — a null map is a "
                "class-tag-level NULL; encode it through write_kryo_value, "
                "or pass an empty dict"
            )
        with _write_names():
            out = write_varint(len(d))
            for kk, vv in d.items():
                for v in (kk, vv):
                    out += _enc_element(v, references=references, regs=regs)
        return out

    def dec(r: ByteReader):
        with _read_graph(r):
            n = read_varint(r)
            out = {}
            _adopt_pending(r, out)
            for _ in range(n):
                kk = read_kryo_value(
                    r, references=references, registrations=regs
                )
                vv = read_kryo_value(
                    r, references=references, registrations=regs
                )
                try:
                    out[kk] = vv
                except TypeError:
                    raise KryoError(
                        f"Kryo map key of type {type(kk).__name__} is not "
                        "hashable in Python — decode via a custom codec"
                    ) from None
            return out

    return Codec("kryo-map", enc, dec, -1)
