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
both directions). Back-references (marker > 1) are refused by name — they
need the writing stream's object graph.

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


def _read_ref_marker(r: ByteReader) -> None:
    m = read_varint(r)
    if m != 1:
        raise KryoError(
            f"Kryo reference marker {m}: back-references need the writing "
            "stream's object graph — only self-contained values decode"
        )


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
    need a matching ``registrations`` entry supplying the payload codec."""
    regs = registrations or {}
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
        if name_id != 0:
            raise KryoError(
                f"Kryo class-name back-reference {name_id}: only "
                "self-contained values decode"
            )
        cls = read_kryo_string(r)
        if isinstance(expect, str) and expect not in _EXPECT and cls != expect:
            raise KryoError(
                f"Kryo class {cls!r} where a {expect!r} value was expected"
            )
        codec = regs.get(cls)
        if codec is not None:
            if references:
                _read_ref_marker(r)
            return codec.decode(r)
        if cls != "[B":
            raise KryoError(
                f"unregistered Kryo class {cls!r}: supply a payload codec "
                f"via registrations={{{cls!r}: codec}}"
            )
        if references:
            _read_ref_marker(r)
        n = read_varint(r)  # length + 1, 0 = null
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
            _read_ref_marker(r)
        return codec.decode(r)
    if rid == _ID_INT:
        return _zz_dec(read_varint(r))
    if rid == _ID_STRING:
        if references:
            _read_ref_marker(r)
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


def write_kryo_value(
    value,
    expect: str | int,
    *,
    references: bool = True,
    registrations: dict | None = None,
) -> bytes:
    """Encode one value as ``writeClassAndObject`` bytes of the ``expect``
    type (a key of ``_EXPECT``, a registration id ≥ 9, or a class name —
    the latter two encode via their ``registrations`` payload codec)."""
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
            out += write_varint(1)
        return out + codec.encode(value)
    if expect not in _EXPECT:
        codec = regs.get(expect)
        if codec is None:
            raise KryoError(f"unsupported Kryo expect type {expect!r}")
        out = (
            write_varint(_TAG_NAME) + write_varint(0) + write_kryo_string(expect)
        )
        if references:
            out += write_varint(1)
        return out + codec.encode(value)
    if expect == "bytes":
        out = write_varint(_TAG_NAME) + write_varint(0) + write_kryo_string("[B")
        if references:
            out += write_varint(1)
        return out + write_varint(len(value) + 1) + bytes(value)
    rid = _EXPECT[expect]
    out = write_varint(rid + 2)
    if rid == _ID_INT:
        return out + write_varint(_zz_enc(int(value), 32))
    if rid == _ID_STRING:
        if references:
            out += write_varint(1)
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
