"""Avro OCF codec (codecs/avro.py): python roundtrips, malformation
strictness, and CROSS-VALIDATION against the real avro-1.12.1.jar that
ships in Spark's JVM — files we write are read by real Avro, files real
Avro writes are read by us, across ALL SIX spec codecs
(null/deflate/snappy/bzip2/xz/zstandard — the last three closed the r16
named-refusal residual in r17) and the full supported type surface (the
same both-directions discipline as the SST/rocksdbjni and Snappy/xerial
pins).
"""

from __future__ import annotations

import json
import math
import os
import tempfile

import pytest

from bravo_spark.codecs.avro import AvroError, read_ocf, write_ocf

_SCHEMA = {
    "type": "record",
    "name": "Ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "kind", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "color",
            "type": {"type": "enum", "name": "Color",
                     "symbols": ["RED", "GREEN", "BLUE"]},
        },
        {
            "name": "fp",
            "type": {"type": "fixed", "name": "Fp16", "size": 4},
        },
    ],
}

_ROWS = [
    {
        "id": i,
        "kind": f"k{i % 3}",
        "score": i * 0.5,
        "flag": i % 2 == 0,
        "blob": bytes([i % 256, 0xFF]),
        "maybe": None if i % 4 == 0 else f"m{i}",
        "tags": [f"t{j}" for j in range(i % 3)],
        "attrs": {f"a{j}": i * j for j in range(i % 2 + 1)},
        "color": ["RED", "GREEN", "BLUE"][i % 3],
        "fp": bytes([i % 256] * 4),
    }
    for i in range(57)
]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy",
                                   "bzip2", "xz", "zstandard"])
def test_python_roundtrip(codec):
    blob = write_ocf(_SCHEMA, _ROWS, codec=codec, records_per_block=10)
    schema, recs = read_ocf(blob)
    assert schema["name"] == "Ev"
    assert list(recs) == _ROWS


def test_deterministic_output():
    assert write_ocf(_SCHEMA, _ROWS) == write_ocf(_SCHEMA, _ROWS)


def test_negative_and_wide_longs_roundtrip():
    sch = {"type": "record", "name": "L",
           "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 63, -64, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    _, recs = read_ocf(write_ocf(sch, [{"v": v} for v in vals]))
    assert [r["v"] for r in recs] == vals


def test_bad_magic_and_bad_codec_refuse_by_name():
    with pytest.raises(AvroError, match="magic"):
        list(read_ocf(b"PAR1aaaa")[1])
    with pytest.raises(AvroError, match="lz77-custom"):
        write_ocf(_SCHEMA, [], codec="lz77-custom")


def test_sync_marker_mismatch_detected():
    blob = bytearray(write_ocf(_SCHEMA, _ROWS[:5], codec="null"))
    blob[-3] ^= 0xFF  # corrupt the trailing sync marker
    _, recs = read_ocf(bytes(blob))
    with pytest.raises(AvroError, match="sync"):
        list(recs)


def test_truncated_block_detected():
    blob = write_ocf(_SCHEMA, _ROWS[:5], codec="null")
    _, recs = read_ocf(blob[:-10])
    with pytest.raises(AvroError):
        list(recs)


def test_union_value_must_match_a_branch():
    sch = {"type": "record", "name": "U",
           "fields": [{"name": "v", "type": ["null", "long"]}]}
    with pytest.raises(AvroError, match="union"):
        write_ocf(sch, [{"v": "not-a-long"}])


# ---------------------------------------------------------------------------
# cross-validation against the REAL avro jar in Spark's JVM
# ---------------------------------------------------------------------------


def _jvm(spark):
    return spark._jvm


def _real_read(spark, path):
    jvm = _jvm(spark)
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    out = []
    while reader.hasNext():
        out.append(reader.next())
    reader.close()
    return out


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy",
                                   "bzip2", "xz", "zstandard"])
def test_real_avro_reads_our_files(spark, codec):
    sch = {
        "type": "record", "name": "X",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
            {"name": "m", "type": ["null", "long"]},
        ],
    }
    rows = [
        {"id": i, "s": f"v{i}", "d": i / 7.0,
         "m": None if i % 3 == 0 else i * i}
        for i in range(123)
    ]
    blob = write_ocf(sch, rows, codec=codec, records_per_block=25)
    path = os.path.join(tempfile.mkdtemp(), f"ours_{codec}.avro")
    with open(path, "wb") as f:
        f.write(blob)
    got = _real_read(spark, path)
    assert len(got) == len(rows)
    for jrec, py in zip(got, rows):
        assert jrec.get("id") == py["id"]
        assert str(jrec.get("s")) == py["s"]
        assert math.isclose(jrec.get("d"), py["d"], rel_tol=0, abs_tol=0)
        assert jrec.get("m") == py["m"]


@pytest.mark.parametrize("codec_factory", ["nullCodec", "deflateCodec",
                                           "snappyCodec", "bzip2Codec",
                                           "xzCodec", "zstandardCodec"])
def test_we_read_real_avro_files(spark, codec_factory):
    jvm = _jvm(spark)
    sch_json = json.dumps(
        {
            "type": "record", "name": "Y",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "s", "type": "string"},
                {"name": "tags", "type": {"type": "array",
                                          "items": "string"}},
            ],
        }
    )
    sch = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    cf = jvm.org.apache.avro.file.CodecFactory
    if codec_factory == "deflateCodec":
        w.setCodec(cf.deflateCodec(6))
    elif codec_factory == "snappyCodec":
        w.setCodec(cf.snappyCodec())
    elif codec_factory == "bzip2Codec":
        w.setCodec(cf.bzip2Codec())
    elif codec_factory == "xzCodec":
        w.setCodec(cf.xzCodec(6))
    elif codec_factory == "zstandardCodec":
        w.setCodec(cf.zstandardCodec(3))
    path = os.path.join(tempfile.mkdtemp(), f"real_{codec_factory}.avro")
    w.create(sch, jvm.java.io.File(path))
    for i in range(200):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("id", i)
        rec.put("s", f"row {i} — utf8 ✓")
        tags = jvm.java.util.ArrayList()
        for j in range(i % 4):
            tags.add(f"t{j}")
        rec.put("tags", tags)
        w.append(rec)
    w.close()
    with open(path, "rb") as f:
        schema, recs = read_ocf(f.read())
    rows = list(recs)
    assert schema["name"] == "Y"
    assert len(rows) == 200
    assert rows[7] == {"id": 7, "s": "row 7 — utf8 ✓",
                       "tags": ["t0", "t1", "t2"]}
    assert rows[199]["tags"] == ["t0", "t1", "t2"]


def test_negative_varint_lengths_refused():
    import struct as _struct

    blob = bytearray(write_ocf(_SCHEMA, _ROWS[:3], codec="null"))
    # find the first block header after the 16-byte sync and force the
    # SIZE varint negative: zigzag(-1) = 0x01; block starts right after
    # header metadata — instead, corrupt surgically via a fresh minimal
    # container whose block size varint we control
    sch = {"type": "record", "name": "T",
           "fields": [{"name": "s", "type": "string"}]}
    good = write_ocf(sch, [{"s": "abcd"}], codec="null")
    # locate the block: it is count|size|payload|sync at the tail;
    # payload is 1 record = len varint + bytes; sync is last 16 bytes
    body_len = 1 + 1 + 4  # count=1 varint, size varint, payload(1+4)... 
    # robust approach: parse offsets by re-reading until the records()
    # loop start, then flip the size varint to 0x01 (-1 zigzag)
    tail = len(good) - 16  # sync
    payload_len = 1 + 4  # string len varint + 'abcd'
    size_pos = tail - payload_len - 1
    assert good[size_pos] == payload_len * 2  # zigzag(+n) = 2n
    bad = bytearray(good)
    bad[size_pos] = 0x01  # zigzag(-1)
    _, recs = read_ocf(bytes(bad))
    with pytest.raises(AvroError, match="negative"):
        list(recs)


def test_int_is_legal_for_double_union():
    sch = {"type": "record", "name": "U",
           "fields": [{"name": "x", "type": ["null", "double"]}]}
    _, recs = read_ocf(write_ocf(sch, [{"x": 0}, {"x": None}, {"x": 1.5}]))
    assert [r["x"] for r in recs] == [0.0, None, 1.5]


def test_count_bomb_refused():
    """A crafted block header claiming ~2^40 records in a tiny payload
    must refuse by name before the decode loop spins (the trailing
    bytes-consumed check fires only AFTER all claimed records yield)."""
    from bravo_spark.codecs.avro import _Decoder, _zigzag_encode

    blob = bytearray(write_ocf(json.dumps(_SCHEMA), _ROWS[:5], codec="null"))
    # locate the first block header: skip magic, metadata map, sync
    d = _Decoder(bytes(blob))
    d.raw(4)
    n = d.long()
    for _ in range(n):
        d.raw(d.long())
        d.raw(d.long())
    assert d.long() == 0
    d.raw(16)
    header_at = d.pos
    count = d.long()
    size = d.long()
    payload_and_rest = blob[d.pos:]
    forged = (
        bytes(blob[:header_at])
        + _zigzag_encode(1 << 40)
        + _zigzag_encode(size)
        + bytes(payload_and_rest)
    )
    _, records = read_ocf(forged)
    with pytest.raises(AvroError, match="claims .* records"):
        list(records)


def test_degenerate_zero_byte_records_still_decode():
    """Zero-field records encode to zero bytes — a legal block can carry
    more records than payload bytes; the bomb guard must not refuse it."""
    schema = {"type": "record", "name": "Empty", "fields": []}
    blob = write_ocf(json.dumps(schema), [{} for _ in range(100)])
    _, records = read_ocf(blob)
    assert list(records) == [{} for _ in range(100)]


def test_invalid_utf8_refuses_as_avro_error():
    schema = {"type": "record", "name": "S",
              "fields": [{"name": "s", "type": "string"}]}
    blob = bytearray(write_ocf(json.dumps(schema), [{"s": "abcd"}],
                               codec="null"))
    at = bytes(blob).rindex(b"abcd")
    blob[at] = 0xFF  # lone 0xFF is never valid UTF-8
    _, records = read_ocf(bytes(blob))
    with pytest.raises(AvroError, match="invalid UTF-8"):
        list(records)


def test_truncated_deflate_block_refuses_by_name():
    blob = bytearray(write_ocf(json.dumps(_SCHEMA), _ROWS, codec="deflate"))
    # find the deflate payload (between the 2nd sync marker pair):
    # corrupting any interior byte of the compressed stream must surface
    # as AvroError, not a bare zlib.error
    mid = len(blob) // 2
    blob[mid] ^= 0xA5
    _, records = read_ocf(bytes(blob))
    with pytest.raises((AvroError,)):
        list(records)


@pytest.mark.parametrize("codec", ["deflate", "bzip2", "xz"])
def test_trailing_junk_after_compressed_stream_refused(codec):
    """The block size frames the compressed stream exactly — bytes after
    the stream's end marker inside a block are a format violation and
    must refuse by name, not silently drop."""
    import struct as _struct

    blob = bytearray(write_ocf(json.dumps(_SCHEMA), _ROWS[:5],
                               codec=codec))
    # locate the (only) block: header after magic+meta+sync; splice 3
    # junk bytes after the compressed payload and bump the size varint
    from bravo_spark.codecs.avro import _Decoder, _zigzag_encode

    d = _Decoder(bytes(blob))
    d.raw(4)
    n = d.long()
    for _ in range(n):
        d.raw(d.long())
        d.raw(d.long())
    assert d.long() == 0
    d.raw(16)
    header_at = d.pos
    count = d.long()
    size = d.long()
    payload = bytes(blob[d.pos:d.pos + size])
    sync_and_rest = bytes(blob[d.pos + size:])
    forged = (
        bytes(blob[:header_at])
        + _zigzag_encode(count)
        + _zigzag_encode(size + 3)
        + payload + b"\x00\x01\x02"
        + sync_and_rest
    )
    _, records = read_ocf(forged)
    with pytest.raises(AvroError, match="junk byte"):
        list(records)


def test_hypothesis_random_records_roundtrip_all_codecs():
    """Property fuzz: random record values over the full type surface
    must round-trip bit-exactly through every codec."""
    from hypothesis import given, settings, strategies as st

    sch = {
        "type": "record", "name": "F",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "d", "type": "double"},
            {"name": "u", "type": ["null", "string"]},
            {"name": "a", "type": {"type": "array", "items": "long"}},
        ],
    }
    rec = st.fixed_dictionaries({
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.text(max_size=40),
        "b": st.binary(max_size=40),
        "d": st.floats(allow_nan=False),
        "u": st.none() | st.text(max_size=10),
        "a": st.lists(st.integers(min_value=-(2**31), max_value=2**31),
                      max_size=8),
    })

    @settings(max_examples=25, deadline=None)
    @given(rows=st.lists(rec, max_size=20),
           codec=st.sampled_from(["null", "deflate", "snappy",
                                  "bzip2", "xz", "zstandard"]))
    def check(rows, codec):
        _, recs = read_ocf(write_ocf(sch, rows, codec=codec,
                                     records_per_block=7))
        assert list(recs) == rows

    check()


def test_write_zstandard_without_compressor_raises_avro_error(monkeypatch):
    """write_ocf(codec='zstandard') in a pyarrow-less environment must
    surface the missing-compressor refusal AS AN AvroError (r17 ADVICE):
    callers catching AvroError rely on the module's refusal-by-name
    contract, and the fastpath's bare ValueError escapes that catch."""
    from bravo_spark.codecs import fastpath

    def _no_compressor(payload):
        raise ValueError("no zstd compressor in this environment")

    monkeypatch.setattr(fastpath, "zstd_compress", _no_compressor)
    schema = {"type": "record", "name": "R",
              "fields": [{"name": "x", "type": "long"}]}
    with pytest.raises(AvroError, match="zstandard"):
        write_ocf(schema, [{"x": 1}], codec="zstandard")


def test_write_ocf_streaming_sink_identical_bytes():
    """r20: write_ocf with a file-like ``out`` must stream the exact
    bytes the buffered form returns (block boundaries, sync markers,
    codec framing all identical) and return None."""
    import io

    for codec in ("null", "deflate", "snappy"):
        want = write_ocf(_SCHEMA, _ROWS, codec=codec, records_per_block=7)
        sink = io.BytesIO()
        ret = write_ocf(
            _SCHEMA, iter(_ROWS), codec=codec, records_per_block=7, out=sink
        )
        assert ret is None
        assert sink.getvalue() == want
