"""Golden-vector + property tests for the Flink-format codec layer.

Format sources: Java DataOutput (big-endian fixed-width), Flink StringValue
7-bit varint strings, RocksDB keyed-state layouts per SURVEY.md §1.1, and the
key-routing hashes (Flink MathUtils.murmurHash / Guava murmur3_128).
"""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from bravo_spark.codecs import flink as fc
from bravo_spark.codecs import hashes as h


# ---------- primitives ----------

def test_primitive_golden_vectors():
    assert fc.write_int(1) == b"\x00\x00\x00\x01"
    assert fc.write_int(-1) == b"\xff\xff\xff\xff"
    assert fc.write_long(2**33) == b"\x00\x00\x00\x02\x00\x00\x00\x00"
    assert fc.write_bool(True) == b"\x01"
    assert fc.write_bool(False) == b"\x00"
    assert fc.write_short(-2) == b"\xff\xfe"
    assert fc.write_double(1.0) == b"\x3f\xf0\x00\x00\x00\x00\x00\x00"
    assert fc.write_bytes_prefixed(b"ab") == b"\x00\x00\x00\x02ab"


def test_string_golden_vectors():
    # Flink StringValue: varint(len+1), then each UTF-16 unit as varint.
    assert fc.write_string("abc") == b"\x04abc"
    assert fc.write_string("") == b"\x01"
    assert fc.write_string(None) == b"\x00"
    # 'é' = U+00E9 = 233 -> varint [0xE9, 0x01]
    assert fc.write_string("é") == b"\x02\xe9\x01"
    # length 128 -> len+1=129 -> varint [0x81, 0x01]
    s = "a" * 128
    assert fc.write_string(s)[:2] == b"\x81\x01"


@given(st.one_of(st.none(), st.text(max_size=300)))
def test_string_roundtrip(s):
    assert fc.read_string(fc.ByteReader(fc.write_string(s))) == s


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int_roundtrip(v):
    assert fc.read_int(fc.ByteReader(fc.write_int(v))) == v


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_roundtrip(v):
    assert fc.read_long(fc.ByteReader(fc.write_long(v))) == v


@given(st.binary(max_size=200))
def test_bytes_roundtrip(b):
    assert fc.read_bytes_prefixed(fc.ByteReader(fc.write_bytes_prefixed(b))) == b


def test_tuple_codec_roundtrip():
    tc = fc.tuple_codec(fc.INT, fc.STRING, fc.BOOL)
    buf = tc.encode((7, "hi", True))
    assert tc.decode(fc.ByteReader(buf)) == (7, "hi", True)


# ---------- hashes ----------

def test_java_hash_parity():
    # Integer.hashCode == value; Long.hashCode == (int)(v ^ (v >>> 32)).
    assert h.java_int_hash(42) == 42
    assert h.java_int_hash(-7) == -7
    assert h.java_long_hash(42) == 42
    assert h.java_long_hash(2**33 + 5) == (2 ^ 5)  # high ^ low word
    # String.hashCode golden values (well-known JDK results).
    assert h.java_string_hash("") == 0
    assert h.java_string_hash("a") == 97
    assert h.java_string_hash("abc") == 96354
    assert h.java_string_hash("hello") == 99162322


def test_java_string_hash_min_int():
    # "polygenelubricants".hashCode() == Integer.MIN_VALUE (famous JDK fact)
    assert h.java_string_hash("polygenelubricants") == -(2**31)


def test_flink_murmur_properties():
    seen = set()
    for code in [0, 1, -1, 42, 2**31 - 1, -(2**31), 123456789]:
        v = h.flink_murmur_hash(code)
        assert 0 <= v < 2**31
        seen.add(v)
    assert len(seen) > 5  # not degenerate


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_key_group_in_range(key):
    assert 0 <= h.assign_to_key_group(key, 128) < 128
    assert 0 <= h.assign_to_key_group(key, 4096) < 4096


def test_operator_index_partition_of_key_groups():
    # Every key group maps to exactly the operator whose range contains it.
    for maxp, par in [(128, 2), (128, 3), (4096, 7), (128, 128)]:
        for kg in range(maxp):
            idx = h.operator_index_for_key_group(kg, maxp, par)
            assert 0 <= idx < par
            assert kg in h.key_group_range_for_operator(maxp, par, idx)
        # ranges are a disjoint cover
        total = sum(len(h.key_group_range_for_operator(maxp, par, i)) for i in range(par))
        assert total == maxp


def test_murmur3_128_golden():
    # Empty input, seed 0 → all-zero digest (standard murmur3 x64 result).
    assert h.murmur3_128(b"") == b"\x00" * 16
    # Widely published vector (mmh3/pymmh3 test suite):
    # hash128("foo") == 168394135621993849475852668931176482145
    assert int.from_bytes(h.murmur3_128(b"foo"), "little") == \
        168394135621993849475852668931176482145
    assert len(h.operator_id("my-operator-uid")) == 16


# ---------- state-row layouts ----------

def test_key_ns_roundtrip_value_state():
    buf = fc.encode_key_ns(77, fc.INT, 128)
    kg, key, ns, mk = fc.decode_key_ns(buf, fc.INT, 128)
    assert key == 77 and mk is None
    assert kg == h.assign_to_key_group(77, 128)
    assert len(buf) == 1 + 4 + 1  # 1B prefix + int key + void ns


def test_key_ns_two_byte_prefix():
    buf = fc.encode_key_ns(77, fc.INT, 4096)
    assert len(buf) == 2 + 4 + 1
    kg, key, _, _ = fc.decode_key_ns(buf, fc.INT, 4096)
    assert kg == h.assign_to_key_group(77, 4096) and key == 77


def test_key_ns_ambiguous_var_len_suffixes():
    # var-len key + var-len namespace → RocksDB appends each field's byte
    # length after it (RocksDBUtils.writeKey/writeNameSpace with
    # ambiguousKeyPossible=true); fixed namespaces must NOT get suffixes
    ns_codec = fc.STRING
    buf = fc.encode_key_ns(
        "ab", fc.STRING, 128, namespace_codec=ns_codec, namespace="ns"
    )
    # layout: [1B kg][key "ab"=3B][len 1B][ns "ns"=3B][len 1B]
    assert len(buf) == 1 + 3 + 1 + 3 + 1
    assert buf[4] == 3 and buf[8] == 3  # little-endian single length bytes
    kg, key, ns, mk = fc.decode_key_ns(
        buf, fc.STRING, 128, namespace_codec=ns_codec
    )
    assert (key, ns, mk) == ("ab", "ns", None)
    # void (fixed) namespace stays suffix-free
    assert len(fc.encode_key_ns("ab", fc.STRING, 128)) == 1 + 3 + 1


def test_key_ns_ambiguous_multi_byte_length():
    # a 300-byte key needs a 2-byte little-endian length suffix
    key = "k" * 298  # string codec: 1-byte len marker? (var-len) — measure
    buf_plain = fc.STRING.encode(key)
    buf = fc.encode_key_ns(
        key, fc.STRING, 128, namespace_codec=fc.STRING, namespace="n"
    )
    klen = len(buf_plain)
    assert klen > 255
    # suffix bytes: klen & 0xFF, klen >> 8
    assert buf[1 + klen] == (klen & 0xFF) and buf[1 + klen + 1] == (klen >> 8)
    _, k2, ns2, _ = fc.decode_key_ns(
        buf, fc.STRING, 128, namespace_codec=fc.STRING
    )
    assert k2 == key and ns2 == "n"


def test_key_ns_map_state():
    buf = fc.encode_key_ns(5, fc.INT, 128, map_key="mk", map_key_codec=fc.STRING)
    kg, key, ns, mk = fc.decode_key_ns(buf, fc.INT, 128, map_key_codec=fc.STRING)
    assert (key, mk) == (5, "mk")


def test_value_state_ttl():
    raw = fc.encode_value_state(9, fc.INT, ttl_ts=123456789)
    assert len(raw) == 8 + 4
    assert fc.decode_value_state(raw, fc.INT, ttl=True) == 9
    assert fc.decode_value_state(fc.encode_value_state(9, fc.INT), fc.INT) == 9


def test_map_value_null_flag_and_ttl():
    assert fc.decode_map_value(fc.encode_map_value(None, fc.INT), fc.INT) is None
    assert fc.decode_map_value(fc.encode_map_value(3, fc.INT), fc.INT) == 3
    raw = fc.encode_map_value(3, fc.INT, ttl_ts=55)
    assert raw[0] == 0 and len(raw) == 1 + 8 + 4
    assert fc.decode_map_value(raw, fc.INT, ttl=True) == 3


def test_list_state_separator_roundtrip():
    raw = fc.encode_list_state([1, 2, 1], fc.INT)
    # 3 ints + 2 separator bytes
    assert len(raw) == 3 * 4 + 2
    assert raw[4] == fc.LIST_SEPARATOR
    assert fc.decode_list_state(raw, fc.INT) == [1, 2, 1]
    # TTL variant: each element prefixed with 8-byte ts
    raw_ttl = fc.encode_list_state([1, 2], fc.INT, ttl_ts=7)
    assert len(raw_ttl) == 2 * 12 + 1
    assert fc.decode_list_state(raw_ttl, fc.INT, ttl=True) == [1, 2]


def test_list_state_strings_roundtrip():
    vals = ["a", "bb", ""]
    raw = fc.encode_list_state(vals, fc.STRING)
    assert fc.decode_list_state(raw, fc.STRING) == vals


# ---------- key-group section stream ----------

def _mk_entries():
    rows = []
    for state_id, key, val in [(0, 1, 10), (0, 2, 20), (1, 1, 30), (1, 9, 90)]:
        kns = fc.encode_key_ns(key, fc.INT, 128, key_group=5)
        rows.append((state_id, kns, fc.encode_value_state(val, fc.INT)))
    return rows


def test_key_group_section_roundtrip():
    entries = _mk_entries()
    buf = fc.write_key_group_section(entries)
    names = {0: "count", 1: "sum"}
    got = list(fc.iter_key_group_section(buf, names))
    assert len(got) == 4
    assert [g[0] for g in got] == ["count", "count", "sum", "sum"]
    # key bytes come back with the meta-follows flag cleared → exact match
    assert [g[1] for g in got] == [e[1] for e in entries]
    assert [g[2] for g in got] == [e[2] for e in entries]


def test_key_group_section_state_filter_skips():
    entries = _mk_entries()
    buf = fc.write_key_group_section(entries)
    names = {0: "count", 1: "sum"}
    got = list(fc.iter_key_group_section(buf, names, lambda n: n == "sum"))
    assert [g[0] for g in got] == ["sum", "sum"]
    assert [fc.decode_value_state(g[2], fc.INT) for g in got] == [30, 90]


def test_key_group_section_empty():
    assert fc.write_key_group_section([]) == b""


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_key_group_section_property_roundtrip(raw_rows):
    # order by state id as the writer contract requires
    raw_rows = sorted(raw_rows, key=lambda t: t[0])
    entries = [
        (sid, fc.encode_key_ns(k, fc.INT, 128, key_group=0), fc.encode_value_state(v, fc.INT))
        for sid, k, v in raw_rows
    ]
    buf = fc.write_key_group_section(entries)
    names = {i: f"s{i}" for i in range(4)}
    got = list(fc.iter_key_group_section(buf, names))
    assert [(g[1], g[2]) for g in got] == [(e[1], e[2]) for e in entries]


# ---------------------------------------------------------------------------
# xxHash family (codecs/xxh.py) — public reference vectors; the deeper
# cross-validation (lz4-java XXHashFactory for 32/64, rocksdbjni kXXH3 SST
# files for XXH3 incl. the >240-byte long path) lives in
# tests/test_rocksdb_native.py
# ---------------------------------------------------------------------------


def test_xxh_reference_vectors():
    from bravo_spark.codecs.xxh import xxh3_64, xxh32, xxh64

    spam = b"Nobody inspects the spammish repetition"
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(spam) == 0xE2293B2F
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(spam) == 0xFBCEA83C8A378BF1
    assert xxh3_64(b"") == 0x2D06800538D394C2


def test_xxh3_all_length_classes_deterministic():
    from bravo_spark.codecs.xxh import xxh3_64

    base = bytes(range(256)) * 40
    seen = set()
    for n in (1, 3, 4, 8, 9, 16, 17, 128, 129, 240, 241, 1024, 1025, 5000):
        h = xxh3_64(base[:n])
        assert 0 <= h <= 0xFFFFFFFFFFFFFFFF
        seen.add(h)
    assert len(seen) == 14  # every length class yields a distinct hash


# ---------------------------------------------------------------------------
# POJO codec (flink-core PojoSerializer wire format)
# ---------------------------------------------------------------------------


def test_pojo_codec_golden_vectors():
    import struct

    pj = fc.pojo_codec([("cnt", fc.LONG), ("tag", fc.STRING), ("opt", fc.INT)])
    value = {"cnt": 5, "tag": "ab", "opt": None}
    # PojoSerializer.serialize: flags byte NO_SUBCLASS=2, then per field a
    # boolean null marker + field serializer bytes
    expect = (
        b"\x02"
        + b"\x00" + struct.pack(">q", 5)
        + b"\x00" + fc.write_string("ab")
        + b"\x01"
    )
    assert pj.encode(value) == expect
    assert pj.decode(fc.ByteReader(expect)) == value
    # null POJO: IS_NULL flag alone
    assert pj.encode(None) == b"\x01"
    assert pj.decode(fc.ByteReader(b"\x01")) is None


def test_pojo_codec_subclass_flags_raise():
    import pytest as _pytest

    pj = fc.pojo_codec([("a", fc.INT)])
    for flags in (4, 8):  # IS_SUBCLASS / IS_TAGGED_SUBCLASS
        with _pytest.raises(ValueError, match="subclass"):
            pj.decode(fc.ByteReader(bytes([flags]) + b"junk"))


def test_pojo_codec_value_state_roundtrip():
    pj = fc.pojo_codec([("cnt", fc.LONG), ("tag", fc.STRING)])
    for v in ({"cnt": 1, "tag": "x"}, {"cnt": -9, "tag": None}, None):
        buf = fc.encode_value_state(v, pj)
        assert fc.decode_value_state(buf, pj) == v
    # TTL-wrapped POJO (P8 composition)
    buf = fc.encode_value_state({"cnt": 7, "tag": "t"}, pj, ttl_ts=123456)
    assert fc.decode_value_state(buf, pj, ttl=True) == {"cnt": 7, "tag": "t"}


def test_composite_codecs_in_list_and_map_states():
    """Codec composition: POJO elements inside list state and Kryo values
    inside map state ride the same separator/null-flag/TTL machinery as
    primitives — no special-casing anywhere."""
    from bravo_spark.codecs.kryo import kryo_codec

    pj = fc.pojo_codec([("n", fc.INT), ("s", fc.STRING)])
    elems = [{"n": 1, "s": "a"}, {"n": -2, "s": None}, None]
    buf = fc.encode_list_state(elems, pj)
    assert fc.decode_list_state(buf, pj) == elems
    buf_ttl = fc.encode_list_state(elems, pj, ttl_ts=123)
    assert fc.decode_list_state(buf_ttl, pj, ttl=True) == elems

    kc = kryo_codec("string", references=True)
    for v in ("héllo", "", None):
        mb = fc.encode_map_value(v, kc, ttl_ts=456)
        assert fc.decode_map_value(mb, kc, ttl=True) == v
