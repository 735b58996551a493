"""Kryo-subset codec vs the REAL Kryo inside this Spark's JVM.

Both directions, both reference-tracking settings: bytes written by
``kryo.writeClassAndObject`` decode to equal Python values, and bytes from
``write_kryo_value`` are read back by ``kryo.readClassAndObject`` to the
original value (py4j unboxes the JVM result, which also pins the class
TAG: a wrong tag materializes as the wrong Java class). Types py4j cannot
construct (Float/Short/Byte/Character auto-unbox on the way in) are
validated decode-side-only through the JVM read-back."""

from __future__ import annotations

import math

import pytest

from bravo_spark.codecs import kryo as kr
from bravo_spark.codecs.flink import ByteReader


@pytest.fixture(scope="module")
def jk(spark):
    j = spark._jvm
    mk = j.com.esotericsoftware.kryo.Kryo

    class H:
        def __init__(self):
            self.j = j
            self.kryos = {}
            for refs in (True, False):
                k = mk()
                k.setReferences(refs)
                self.kryos[refs] = k

        def write(self, value, refs):
            out = j.com.esotericsoftware.kryo.io.Output(1 << 16, -1)
            self.kryos[refs].writeClassAndObject(out, value)
            b = bytes(out.toBytes())
            out.close()
            return b

        def read(self, data, refs):
            inp = j.com.esotericsoftware.kryo.io.Input(data)
            v = self.kryos[refs].readClassAndObject(inp)
            inp.close()
            return v

    return H()


STRINGS = [
    "hello",
    "hello world!",
    "",
    "a",
    "héllo✓ unicode ∀x",
    "astral \U0001D11E\U0001F389 mix",  # non-BMP: CESU-8 surrogate pairs
    "\U0001F600" * 40,
    "x" * 200,
    "y" * 100 + "é",
    "z" * 20000 + "é",
    None,
]


@pytest.mark.parametrize("refs", [True, False])
def test_strings_both_directions(jk, refs):
    for s in STRINGS:
        native = jk.write(s, refs)
        assert kr.read_kryo_value(ByteReader(native), references=refs) == s
        ours = kr.write_kryo_value(s, "string", references=refs)
        assert jk.read(ours, refs) == s


@pytest.mark.parametrize("refs", [True, False])
def test_integers_both_directions(jk, refs):
    # py4j sends Python ints < 2^31 as Integer, larger as Long — use that
    # to hit both registrations natively
    for v in (0, 1, -1, 42, -42, 300, 2**30, -(2**30)):
        native = jk.write(jk.j.java.lang.Integer(v), refs)
        assert kr.read_kryo_value(ByteReader(native), references=refs) == v
        assert jk.read(kr.write_kryo_value(v, "int", references=refs), refs) == v
    for v in (2**40, -(2**40), 977, -3, 2**62, 2**63 - 1, -(2**63)):
        native = jk.write(jk.j.java.lang.Long(v), refs)
        assert kr.read_kryo_value(ByteReader(native), references=refs) == v
        assert jk.read(kr.write_kryo_value(v, "long", references=refs), refs) == v


@pytest.mark.parametrize("refs", [True, False])
def test_double_bool_null_both_directions(jk, refs):
    for v in (1.5, -0.25, 1e300, math.pi):
        native = jk.write(v, refs)  # py4j float -> java.lang.Double
        assert kr.read_kryo_value(ByteReader(native), references=refs) == v
        assert jk.read(kr.write_kryo_value(v, "double", references=refs), refs) == v
    for v in (True, False):
        native = jk.write(v, refs)
        assert kr.read_kryo_value(ByteReader(native), references=refs) is v
        assert jk.read(kr.write_kryo_value(v, "boolean", references=refs), refs) == v
    assert kr.read_kryo_value(ByteReader(jk.write(None, refs)), references=refs) is None
    assert jk.read(kr.write_kryo_value(None, "string", references=refs), refs) is None


@pytest.mark.parametrize("refs", [True, False])
def test_byte_array_both_directions(jk, refs):
    for payload in (b"\x01\x02\xff", b"", bytes(range(256))):
        native = jk.write(bytearray(payload), refs)
        assert kr.read_kryo_value(ByteReader(native), references=refs) == payload
        ours = kr.write_kryo_value(payload, "bytes", references=refs)
        assert bytes(jk.read(ours, refs)) == payload


@pytest.mark.parametrize(
    "expect,value",
    [("float", 2.5), ("float", -0.125), ("short", -7), ("short", 32000),
     ("byte", 3), ("byte", -128), ("char", "Z"), ("char", "é")],
)
def test_unboxable_types_via_jvm_readback(jk, expect, value):
    # py4j cannot PASS these wrapper types (auto-unboxing), but the JVM
    # read-back pins both tag and payload: a wrong registration id would
    # materialize as a different class and unbox to a different value
    for refs in (True, False):
        ours = kr.write_kryo_value(value, expect, references=refs)
        assert jk.read(ours, refs) == value
        # and our own decoder round-trips what we wrote
        assert kr.read_kryo_value(ByteReader(ours), references=refs) == value


def test_kryo_codec_never_matches_fixed_fast_path():
    # the codec must NOT be named like a plain fixed-width codec: readers
    # dispatch on the name onto a numpy fixed-byte fast path that would
    # silently bypass Kryo framing on both read and write
    from bravo_spark.codecs import vectorized as vz
    from bravo_spark.codecs.kryo import kryo_codec
    from bravo_spark.sources.staterows import spark_type_for

    for expect in ("long", "int", "double", "boolean", "string", "byte",
                   "char", "short", "float", "bytes"):
        c = kryo_codec(expect)
        assert not vz.is_fixed(c), expect
        spark_type_for(c)  # still maps to a Spark column type


def test_tag_mismatch_refused_by_name():
    ours = kr.write_kryo_value("text", "string", references=True)
    with pytest.raises(kr.KryoError, match="'long'"):
        kr.read_kryo_value(ByteReader(ours), references=True, expect="long")


def test_refusals_are_named():
    # back-reference to a read-id that was never assigned
    data = kr.write_varint(3) + kr.write_varint(2)
    with pytest.raises(kr.KryoError, match="no such object"):
        kr.read_kryo_value(ByteReader(data), references=True)
    # non-default registration id
    with pytest.raises(kr.KryoError, match="registration id 40"):
        kr.read_kryo_value(ByteReader(kr.write_varint(42)), references=False)
    # unregistered class by name
    bogus = (
        kr.write_varint(1) + kr.write_varint(0)
        + kr.write_kryo_string("com.example.Foo")
    )
    with pytest.raises(kr.KryoError, match="com.example.Foo"):
        kr.read_kryo_value(ByteReader(bogus), references=False)


def test_lone_surrogates_roundtrip_pure_python():
    # legal Java strings (e.g. truncated mid-emoji) that real Kryo writes
    # as single CESU-8 units; py4j cannot transport them, so this pins our
    # own encode/decode symmetry
    for s in ("\ud800", "x\udfffy", "\ud800" * 3):
        buf = kr.write_kryo_string(s)
        got = kr.read_kryo_string(ByteReader(buf))
        assert got == s


# --- user-supplied registrations (the reference restores any metadata-named
# serializer; registrations={} is our spec-bearing analog) ---


def _date_payload_codec():
    """java.util.Date under Kryo's DefaultSerializers.DateSerializer:
    payload = writeVarLong(getTime(), true) — an optimizePositive varint
    of the epoch millis."""
    from bravo_spark.codecs.flink import Codec

    return Codec(
        "date-millis",
        lambda v: kr.write_varint(int(v)),
        lambda r: kr.read_varint(r),
        -1,
    )


@pytest.mark.parametrize("refs", [True, False])
def test_registered_custom_class_both_directions(jk, refs):
    """kryo.register(java.util.Date.class) takes id 9 on a fresh Kryo; a
    registrations={9: codec} mapping must decode the JVM's bytes and
    produce bytes the JVM reads back — both reference settings."""
    j = jk.j
    k = j.com.esotericsoftware.kryo.Kryo()
    k.setReferences(refs)
    reg = k.register(j.java.lang.Class.forName("java.util.Date"))
    # Flink's Kryo 2.24 hands the first user class id 9; the Kryo 4 in
    # this JVM registers void as id 9 so Date lands on 10 — the mapping
    # is keyed by whatever id the writing job's register() produced
    rid = reg.getId()
    assert rid >= 9

    def jwrite(value):
        out = j.com.esotericsoftware.kryo.io.Output(1 << 16, -1)
        k.writeClassAndObject(out, value)
        b = bytes(out.toBytes())
        out.close()
        return b

    def jread(data):
        inp = j.com.esotericsoftware.kryo.io.Input(data)
        v = k.readClassAndObject(inp)
        inp.close()
        return v

    regs = {rid: _date_payload_codec()}
    for millis in (0, 1, 1700000000123, 2**41):
        native = jwrite(j.java.util.Date(millis))
        got = kr.read_kryo_value(
            ByteReader(native), references=refs, expect=rid, registrations=regs
        )
        assert got == millis
        ours = kr.write_kryo_value(
            millis, rid, references=refs, registrations=regs
        )
        assert ours == native  # byte-exact, not just value-equal
        assert jread(ours).getTime() == millis


@pytest.mark.parametrize("refs", [True, False])
def test_unregistered_custom_class_by_name(jk, refs):
    """Without register(), Kryo writes the fully-qualified class name; a
    registrations={'java.util.Date': codec} entry must decode it and our
    encoder's name-form bytes must read back in the JVM."""
    j = jk.j
    regs = {"java.util.Date": _date_payload_codec()}
    millis = 1712345678901
    native = jk.write(j.java.util.Date(millis), refs)
    got = kr.read_kryo_value(
        ByteReader(native), references=refs, expect="java.util.Date",
        registrations=regs,
    )
    assert got == millis
    ours = kr.write_kryo_value(
        millis, "java.util.Date", references=refs, registrations=regs
    )
    assert jk.read(ours, refs).getTime() == millis


def test_kryo_codec_registration_validation():
    from bravo_spark.codecs.kryo import kryo_codec

    # ids below 9 would shadow the constructor registrations
    with pytest.raises(kr.KryoError, match="shadows"):
        kryo_codec(9, registrations={1: _date_payload_codec()})
    # expect naming an id/class with no registrations entry
    with pytest.raises(kr.KryoError, match="unsupported"):
        kryo_codec(11)
    with pytest.raises(kr.KryoError, match="unsupported"):
        kryo_codec("com.example.Missing")
    # a valid custom codec round-trips through the Codec interface
    c = kryo_codec(9, registrations={9: _date_payload_codec()})
    assert c.name == "kryo<9>"
    buf = c.encode(123456789)
    assert c.decode(ByteReader(buf)) == 123456789


def test_registered_id_wrong_expect_refused():
    regs = {9: _date_payload_codec(), 10: _date_payload_codec()}
    buf = kr.write_kryo_value(5, 9, references=False, registrations=regs)
    with pytest.raises(kr.KryoError, match="tag"):
        kr.read_kryo_value(
            ByteReader(buf), references=False, expect=10, registrations=regs
        )


# --- reference resolution: acyclic back-references + class-name ids ---

OBJ_ARRAY = "[Ljava.lang.Object;"


def _arr_regs(refs):
    # the array codec shares the SAME registrations mapping so elements
    # (Dates, even nested Object[]s) resolve through it
    regs = {"java.util.Date": _date_payload_codec()}
    regs[OBJ_ARRAY] = kr.object_array_codec(references=refs, registrations=regs)
    return regs


@pytest.mark.parametrize("refs", [True, False])
def test_object_array_both_directions(jk, refs):
    """Object[] of mixed defaults: JVM bytes decode to the Python list;
    our bytes read back in the JVM element-for-element."""
    j = jk.j
    arr = j.java.lang.reflect.Array.newInstance(
        j.java.lang.Class.forName("java.lang.Object"), 4
    )
    j.java.lang.reflect.Array.set(arr, 0, "first")
    j.java.lang.reflect.Array.set(arr, 1, j.java.lang.Integer(42))
    j.java.lang.reflect.Array.set(arr, 2, None)
    j.java.lang.reflect.Array.set(arr, 3, "second")
    native = jk.write(arr, refs)
    got = kr.read_kryo_value(
        ByteReader(native), references=refs, expect=OBJ_ARRAY,
        registrations=_arr_regs(refs),
    )
    assert got == ["first", 42, None, "second"]

    ours = kr.write_kryo_value(
        ["first", 42, None, "second"], OBJ_ARRAY,
        references=refs, registrations=_arr_regs(refs),
    )
    back = jk.read(ours, refs)
    assert [back[0], back[1], back[2], back[3]] == ["first", 42, None, "second"]


@pytest.mark.parametrize("refs", [True, False])
def test_class_name_id_reuse_across_elements(jk, refs):
    """Two unregistered Dates in one array: Kryo writes 'java.util.Date'
    ONCE, the second element carries only the cached nameId — with
    references on AND off (the class-name cache is independent of
    setReferences)."""
    j = jk.j
    arr = j.java.lang.reflect.Array.newInstance(
        j.java.lang.Class.forName("java.lang.Object"), 2
    )
    j.java.lang.reflect.Array.set(arr, 0, j.java.util.Date(1111))
    j.java.lang.reflect.Array.set(arr, 1, j.java.util.Date(2222))
    native = jk.write(arr, refs)
    assert native.count(b"java.util.Dat") == 1  # name written once
    got = kr.read_kryo_value(
        ByteReader(native), references=refs, expect=OBJ_ARRAY,
        registrations=_arr_regs(refs),
    )
    assert got == [1111, 2222]


def test_acyclic_back_reference_same_instance(jk):
    """The SAME Date instance twice: the second element is a genuine
    back-reference marker (read-id of the first), and decodes to the
    already-read value."""
    j = jk.j
    arr = j.java.lang.reflect.Array.newInstance(
        j.java.lang.Class.forName("java.lang.Object"), 3
    )
    d = j.java.util.Date(777777)
    j.java.lang.reflect.Array.set(arr, 0, d)
    j.java.lang.reflect.Array.set(arr, 1, j.java.lang.Integer(5))
    j.java.lang.reflect.Array.set(arr, 2, d)
    native = jk.write(arr, True)
    got = kr.read_kryo_value(
        ByteReader(native), references=True, expect=OBJ_ARRAY,
        registrations=_arr_regs(True),
    )
    assert got == [777777, 5, 777777]
    # the payload really is a back-reference: the millis varint appears once
    assert native.count(kr.write_varint(777777)) == 1


def test_cyclic_object_array_decodes_and_roundtrips(jk):
    """arr[0] = arr — the JVM writes the cycle; our decoder registers the
    container before its children (Kryo's reference order), so the result
    is a genuinely cyclic Python list. Our re-encode emits a real
    back-reference marker (our own decoder recovers the identity) and
    the JVM reads our bytes back into a self-referential array. (Byte
    equality with the JVM stream is NOT asserted: Kryo uses its
    ASCII short-string fast path for the class name where we always
    emit the spec's varint-flag form — both readers accept both.)"""
    j = jk.j
    arr = j.java.lang.reflect.Array.newInstance(
        j.java.lang.Class.forName("java.lang.Object"), 1
    )
    j.java.lang.reflect.Array.set(arr, 0, arr)
    native = jk.write(arr, True)
    got = kr.read_kryo_value(
        ByteReader(native), references=True, expect=OBJ_ARRAY,
        registrations=_arr_regs(True),
    )
    assert len(got) == 1 and got[0] is got  # identity, not deep-eq
    ours = kr.write_kryo_value(
        got, OBJ_ARRAY, references=True, registrations=_arr_regs(True)
    )
    # the cycle survives our own decode of our own bytes...
    got2 = kr.read_kryo_value(
        ByteReader(ours), references=True, expect=OBJ_ARRAY,
        registrations=_arr_regs(True),
    )
    assert len(got2) == 1 and got2[0] is got2
    # ...and the REAL Kryo reads our bytes into a self-referential array
    back = jk.read(ours, True)
    elem = j.java.lang.reflect.Array.get(back, 0)
    assert elem.equals(back)  # Object[] equals == identity


def test_cyclic_arraylist_and_hashmap_decode(jk):
    """Self-referential ArrayList and HashMap-value cycles through the
    collection/map codecs, JVM-written."""
    j = jk.j
    lst = j.java.util.ArrayList()
    lst.add(lst)
    lst.add("tail")
    regs = {}
    regs["java.util.ArrayList"] = kr.collection_codec(
        references=True, registrations=regs
    )
    got = kr.read_kryo_value(
        ByteReader(jk.write(lst, True)), references=True,
        expect="java.util.ArrayList", registrations=regs,
    )
    assert len(got) == 2 and got[0] is got and got[1] == "tail"

    m = j.java.util.HashMap()
    m.put("self", m)
    m.put("n", j.java.lang.Integer(3))
    mregs = {}
    mregs["java.util.HashMap"] = kr.map_codec(
        references=True, registrations=mregs
    )
    gm = kr.read_kryo_value(
        ByteReader(jk.write(m, True)), references=True,
        expect="java.util.HashMap", registrations=mregs,
    )
    assert gm["self"] is gm and gm["n"] == 3


def test_mutual_cycle_roundtrips_through_jvm(jk):
    """Two ArrayLists referencing each other: decode to mutually cyclic
    Python lists, re-encode, and the JVM reads our bytes back into the
    same mutual structure (a == b.get(0).get(0))."""
    j = jk.j
    a = j.java.util.ArrayList()
    b = j.java.util.ArrayList()
    a.add(b)
    b.add(a)
    regs = {}
    regs["java.util.ArrayList"] = kr.collection_codec(
        references=True, registrations=regs
    )
    got = kr.read_kryo_value(
        ByteReader(jk.write(a, True)), references=True,
        expect="java.util.ArrayList", registrations=regs,
    )
    assert got[0][0] is got and got[0] is not got
    ours = kr.write_kryo_value(
        got, "java.util.ArrayList", references=True, registrations=regs
    )
    back = jk.read(ours, True)
    assert back.get(0).get(0).equals(back) is True or back.get(0).get(
        0
    ) == back  # JVM identity through py4j equality


def test_shared_subcontainer_decodes_to_same_object(jk):
    """An ACYCLIC duplicate container ([inner, inner]) decodes to the
    same Python list twice, and our re-encode emits ONE payload plus a
    back-reference (the inner list's contents appear once in the
    bytes)."""
    j = jk.j
    inner = j.java.util.ArrayList()
    inner.add(j.java.lang.Integer(424243))
    outer = j.java.util.ArrayList()
    outer.add(inner)
    outer.add(inner)
    regs = {}
    regs["java.util.ArrayList"] = kr.collection_codec(
        references=True, registrations=regs
    )
    got = kr.read_kryo_value(
        ByteReader(jk.write(outer, True)), references=True,
        expect="java.util.ArrayList", registrations=regs,
    )
    assert got[0] is got[1] and got[0] == [424243]
    ours = kr.write_kryo_value(
        got, "java.util.ArrayList", references=True, registrations=regs
    )
    assert ours.count(kr.write_varint(kr._zz_enc(424243, 32))) == 1
    back = jk.read(ours, True)
    assert back.get(0) == back.get(1)


def test_cycle_through_non_adopting_codec_still_refused():
    """A cycle whose pending object is a CUSTOM payload (not a container
    the decoder can pre-register) must still refuse by name — the object
    cannot be patched after the fact. Hand-built bytes: class-name form,
    new-object marker, payload = one child that back-references read-id
    0 (the custom object itself, still pending)."""
    child_codec = {}

    def dec_payload(r):
        return kr.read_kryo_value(
            r, references=True, registrations=child_codec
        )

    from bravo_spark.codecs.flink import Codec

    box = Codec("box", lambda v: b"", dec_payload, -1)
    child_codec["com.example.Box"] = box
    # tag: name form, nameId 0 + class name, marker 1 (new, read-id 0),
    # payload: child = name form nameId 0 (cached), marker 2 (ref id 0)
    data = (
        kr.write_varint(1)  # _TAG_NAME
        + kr.write_varint(0) + kr.write_kryo_string("com.example.Box")
        + kr.write_varint(1)  # new object -> read-id 0
        + kr.write_varint(1) + kr.write_varint(0)  # child: same class
        + kr.write_varint(2)  # back-reference to read-id 0: pending
    )
    with pytest.raises(kr.KryoError, match="still being constructed"):
        kr.read_kryo_value(
            ByteReader(data), references=True,
            expect="com.example.Box", registrations=child_codec,
        )


def test_object_array_codec_standalone_roundtrip():
    """The Codec interface works outside a savepoint read (fresh graph
    per call), including nested byte[] elements whose '[B' name must hit
    the write-side nameId cache the second time."""
    c = kr.kryo_codec(
        OBJ_ARRAY, references=True, registrations=_arr_regs(True)
    )
    vals = ["a", 7, None, b"\x01\x02", True, 2.5, b"\x03", "a"]
    buf = c.encode(vals)
    assert c.decode(ByteReader(buf)) == vals
    # '[B' appears once in the stream (second byte[] reuses the nameId)
    assert buf.count(kr.write_kryo_string("[B")) == 1


# --- property test: object arrays round-trip for arbitrary element mixes ---

from hypothesis import given, settings, strategies as st  # noqa: E402

_ELEMENT = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**63), 2**63 - 1),
    st.floats(allow_nan=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)


@settings(max_examples=60, deadline=None)
@given(vals=st.lists(_ELEMENT, max_size=12), refs=st.booleans())
def test_object_array_roundtrip_property(vals, refs):
    """Arbitrary element mixes (nulls, dup strings/bytes → write-side
    nameId reuse, full-range ints, astral text) round-trip through the
    Codec interface under both reference settings."""
    regs = {}
    regs[OBJ_ARRAY] = kr.object_array_codec(references=refs, registrations=regs)
    c = kr.kryo_codec(OBJ_ARRAY, references=refs, registrations=regs)
    got = c.decode(ByteReader(c.encode(vals)))
    assert got == [bytes(v) if isinstance(v, bytearray) else v for v in vals]


@pytest.mark.parametrize("refs", [True, False])
def test_arraylist_both_directions(jk, refs):
    """java.util.ArrayList under CollectionSerializer: varint size (no
    +1), elements as writeClassAndObject — JVM bytes decode to the Python
    list and our bytes read back element-for-element."""
    j = jk.j
    regs = {"java.util.ArrayList": kr.collection_codec(references=refs)}
    lst = j.java.util.ArrayList()
    lst.add("ab")
    lst.add(j.java.lang.Integer(7))
    lst.add(None)
    lst.add("ab")
    native = jk.write(lst, refs)
    got = kr.read_kryo_value(
        ByteReader(native), references=refs,
        expect="java.util.ArrayList", registrations=regs,
    )
    assert got == ["ab", 7, None, "ab"]
    # empty collection
    assert kr.read_kryo_value(
        ByteReader(jk.write(j.java.util.ArrayList(), refs)),
        references=refs, expect="java.util.ArrayList", registrations=regs,
    ) == []
    # our encoding reads back in the JVM
    ours = kr.write_kryo_value(
        ["ab", 7, None, "ab"], "java.util.ArrayList",
        references=refs, registrations=regs,
    )
    back = jk.read(ours, refs)
    assert [back[0], back[1], back[2], back[3]] == ["ab", 7, None, "ab"]


@pytest.mark.parametrize("refs", [True, False])
def test_hashmap_both_directions(jk, refs):
    """java.util.HashMap under MapSerializer: varint size, key+value as
    writeClassAndObject per entry."""
    j = jk.j
    regs = {"java.util.HashMap": kr.map_codec(references=refs)}
    m = j.java.util.HashMap()
    m.put("a", "x")
    m.put("b", j.java.lang.Integer(9))
    native = jk.write(m, refs)
    got = kr.read_kryo_value(
        ByteReader(native), references=refs,
        expect="java.util.HashMap", registrations=regs,
    )
    assert got == {"a": "x", "b": 9}
    ours = kr.write_kryo_value(
        {"a": "x", "b": 9}, "java.util.HashMap",
        references=refs, registrations=regs,
    )
    back = jk.read(ours, refs)
    assert back.get("a") == "x" and back.get("b") == 9
    assert back.size() == 2


def test_container_codec_standalone_decode_shares_one_graph():
    """Calling a container payload codec's .decode directly (no enclosing
    read_kryo_value) must still give ALL elements one shared graph: a
    per-element graph would desync nameId-cached class names between
    elements (the second b'' element's cached '[B' would be re-read as
    payload bytes)."""
    regs = {}
    regs[OBJ_ARRAY] = kr.object_array_codec(references=True, registrations=regs)
    c = kr.kryo_codec(OBJ_ARRAY, references=True, registrations=regs)
    buf = c.encode([b"aa", None, b"bb"])
    # strip the outer class header + ref marker, then decode the payload
    # codec standalone — the mode its docstring advertises
    r = ByteReader(buf)
    kr.read_varint(r)  # NAME tag
    kr.read_varint(r)  # nameId
    kr.read_kryo_string(r)  # class name
    kr.read_varint(r)  # ref marker (new)
    assert regs[OBJ_ARRAY].decode(r) == [b"aa", None, b"bb"]


@settings(max_examples=150, deadline=None)
@given(
    cut=st.integers(0, 64),
    flip_pos=st.integers(0, 63),
    flip_val=st.integers(1, 255),
    mode=st.sampled_from(["truncate", "flip", "both"]),
    refs=st.booleans(),
)
def test_decoder_malformed_streams_fail_cleanly(cut, flip_pos, flip_val, mode, refs):
    """Arbitrary truncations/corruptions of a valid container stream must
    either decode or raise a controlled error (KryoError / EOFError) —
    never hang (huge claimed lengths drain the buffer and hit EOF, they
    don't allocate) and never leak other exception types."""
    regs = {}
    regs[OBJ_ARRAY] = kr.object_array_codec(references=refs, registrations=regs)
    base = kr.write_kryo_value(
        ["abc", 7, b"\x01\x02", None, "abc"], OBJ_ARRAY,
        references=refs, registrations=regs,
    )
    data = bytearray(base)
    if mode in ("truncate", "both"):
        data = data[: max(1, len(data) - cut % len(data))]
    if mode in ("flip", "both") and flip_pos < len(data):
        data[flip_pos] ^= flip_val
    try:
        kr.read_kryo_value(
            ByteReader(bytes(data)), references=refs, registrations=regs
        )
    except (kr.KryoError, EOFError):
        pass  # named, controlled refusals


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_reference_graph_roundtrip_property(data):
    """Random container DAGs with SHARED sub-containers (and optional
    self-cycles) survive our own encode→decode: values equal where
    acyclic, and every identity relation (shared or cyclic) is
    preserved — the write-side graph must mirror the reader's read-id
    preorder exactly, or back-references land on the wrong slot."""
    regs = {}
    regs["java.util.ArrayList"] = kr.collection_codec(
        references=True, registrations=regs
    )

    scalars = st.one_of(
        st.integers(-(2**31), 2**31 - 1),
        st.text(max_size=6),
        st.booleans(),
        st.none(),
    )
    # a pool of leaf lists, some reused in several places
    pool = [
        data.draw(st.lists(scalars, max_size=4)) for _ in range(3)
    ]
    top = []
    for _ in range(data.draw(st.integers(1, 6))):
        kind = data.draw(st.integers(0, 3))
        if kind == 0:
            top.append(data.draw(scalars))
        elif kind == 1:
            top.append(pool[data.draw(st.integers(0, 2))])  # shared
        elif kind == 2:
            top.append(list(pool[0]))  # equal but distinct
        else:
            top.append(top)  # self-cycle
    ours = kr.write_kryo_value(
        top, "java.util.ArrayList", references=True, registrations=regs
    )
    got = kr.read_kryo_value(
        ByteReader(ours), references=True,
        expect="java.util.ArrayList", registrations=regs,
    )
    assert len(got) == len(top)
    # identity relations are preserved pairwise
    for i in range(len(top)):
        for j in range(i + 1, len(top)):
            if isinstance(top[i], list) and top[i] is top[j]:
                assert got[i] is got[j], (i, j)
        if top[i] is top:
            assert got[i] is got
    # acyclic values compare equal element-wise
    for i, v in enumerate(top):
        if v is not top:
            assert got[i] == v
