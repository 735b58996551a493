"""codecs/tfrecord.py + sources/tfrecord_source.py: the TFRecord /
tf.train.Example training-shard sink — golden wire vectors, framing
malformation classes, roundtrip fuzz, and the Spark shard lifecycle."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings, strategies as st

from bravo_spark.codecs.tfrecord import (
    TfRecordError,
    decode_example,
    encode_example,
    iter_tfrecords,
    write_tfrecords,
)


# ---------------------------------------------------------------------------
# golden vectors — hand-assembled per the public wire specs, never via the
# code under test


def test_example_golden_vector_hand_assembled():
    """encode_example({'a': b'hi', 'n': 7}) against bytes derived BY HAND
    from the protobuf encoding rules + feature.proto field numbers:
    Example.features(1) > map entry(1) > key(1)/value(2) >
    Feature.bytes_list(1)/int64_list(3) > *List.value(1)."""
    entry_a = bytes.fromhex("0a01611206" + "0a04" + "0a026869")
    entry_n = bytes.fromhex("0a016e1205" + "1a03" + "0a0107")
    features = b"\x0a" + bytes([len(entry_a)]) + entry_a \
        + b"\x0a" + bytes([len(entry_n)]) + entry_n
    expected = b"\x0a" + bytes([len(features)]) + features
    assert encode_example({"a": b"hi", "n": 7}) == expected
    # key order in the dict must not change the bytes (sorted emission)
    assert encode_example({"n": 7, "a": b"hi"}) == expected
    assert decode_example(expected) == {"a": [b"hi"], "n": [7]}


def test_tfrecord_framing_golden_vector():
    """One record of b'abc': length/crc layout per record_writer.cc —
    the masked-CRC primitive itself is the rocksdbjni-cross-validated
    codecs/crc32c (same polynomial, same 0xa282ead8 mask constant)."""
    from bravo_spark.codecs.crc32c import crc32c, mask

    blob = write_tfrecords([b"abc"])
    assert len(blob) == 8 + 4 + 3 + 4
    (length,) = struct.unpack_from("<Q", blob, 0)
    assert length == 3
    (lcrc,) = struct.unpack_from("<I", blob, 8)
    assert lcrc == mask(crc32c(blob[:8]))
    assert blob[12:15] == b"abc"
    (dcrc,) = struct.unpack_from("<I", blob, 15)
    assert dcrc == mask(crc32c(b"abc"))
    assert list(iter_tfrecords(blob)) == [b"abc"]


def test_float_list_and_unpacked_forms():
    # packed floats (what TF writes) — exact binary32 values
    enc = encode_example({"f": [0.5, -2.0]})
    assert decode_example(enc) == {"f": [0.5, -2.0]}
    # hand-built UNPACKED forms (legal per spec) decode identically:
    # Feature.float_list(2) > FloatList with two wire-5 value(1) fields
    fl = b"\x0d" + struct.pack("<f", 0.5) + b"\x0d" + struct.pack("<f", -2.0)
    feat = b"\x12" + bytes([len(fl)]) + fl
    entry = b"\x0a\x01f\x12" + bytes([len(feat)]) + feat
    ex = b"\x0a" + bytes([len(entry) + 2]) + b"\x0a" \
        + bytes([len(entry)]) + entry
    assert decode_example(ex) == {"f": [0.5, -2.0]}
    # unpacked int64: Int64List with wire-0 value(1) fields
    il = b"\x08\x07\x08\x2a"
    feat_i = b"\x1a" + bytes([len(il)]) + il
    entry_i = b"\x0a\x01n\x12" + bytes([len(feat_i)]) + feat_i
    ex_i = b"\x0a" + bytes([len(entry_i) + 2]) + b"\x0a" \
        + bytes([len(entry_i)]) + entry_i
    assert decode_example(ex_i) == {"n": [7, 42]}


def test_int64_negatives_and_bounds():
    for v in (-1, -(1 << 63), (1 << 63) - 1, 0):
        assert decode_example(encode_example({"n": v})) == {"n": [v]}


def test_unknown_fields_skip_per_spec():
    """A shard from a newer producer (extra fields at any level) must
    decode the known features, not refuse."""
    base = encode_example({"a": b"x"})
    # append an unknown varint field 9 to the Example message
    patched = base + b"\x48\x2a"
    assert decode_example(patched) == {"a": [b"x"]}


def test_refusal_classes():
    with pytest.raises(TfRecordError, match="bool"):
        encode_example({"b": True})
    with pytest.raises(TfRecordError, match="empty feature"):
        encode_example({"e": []})
    with pytest.raises(TfRecordError, match="unsupported"):
        encode_example({"o": object()})
    blob = write_tfrecords([b"abcdef", b"xyz"])
    # torn header / torn body / flipped CRCs — all named with offsets
    with pytest.raises(TfRecordError, match="torn record header"):
        list(iter_tfrecords(blob[:8]))
    with pytest.raises(TfRecordError, match="torn at byte"):
        list(iter_tfrecords(blob[:14]))
    bad_len = bytearray(blob)
    bad_len[8] ^= 0xFF
    with pytest.raises(TfRecordError, match="length CRC"):
        list(iter_tfrecords(bytes(bad_len)))
    bad_data = bytearray(blob)
    bad_data[12] ^= 0x01
    with pytest.raises(TfRecordError, match="data CRC"):
        list(iter_tfrecords(bytes(bad_data)))
    # absurd declared length refuses before allocating
    bomb = struct.pack("<Q", 1 << 40) + blob[8:]
    with pytest.raises(TfRecordError, match="declares"):
        list(iter_tfrecords(bomb, verify=False))


@given(
    feats=st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.one_of(
            st.lists(st.binary(max_size=20), min_size=1, max_size=4),
            st.lists(st.integers(min_value=-(1 << 63),
                                 max_value=(1 << 63) - 1),
                     min_size=1, max_size=4),
        ),
        min_size=0, max_size=5,
    ),
    n_recs=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=80, deadline=None)
def test_example_and_framing_roundtrip_fuzz(feats, n_recs):
    enc = encode_example(feats)
    expect = {k: list(v) for k, v in feats.items()}
    assert decode_example(enc) == expect
    blob = write_tfrecords([enc] * n_recs)
    got = list(iter_tfrecords(blob))
    assert got == [enc] * n_recs


def test_spark_shard_lifecycle(spark, tmp_path):
    """encode → shard write (plain path AND file:// URI, byte-identical,
    deterministic across runs) → binaryFile read → decode under an
    explicit schema; gzip whole-file variant reads back identically."""
    import hashlib
    import os

    from bravo_spark.sources.tfrecord_source import (
        decode_examples,
        encode_examples,
        read_tfrecords,
        write_tfrecord_shards,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}", [1.0 * i, 0.5]) for i in range(20)],
        "doc_id long, text string, emb array<double>",
    ).repartition(4)
    enc = encode_examples(df, ["doc_id", "text", "emb"])

    digests = []
    for run in ("w1", "w2", "file://" + str(tmp_path / "w3")):
        out = str(tmp_path / run) if "://" not in run else run
        assert write_tfrecord_shards(enc, out) == 20
        d = str(tmp_path / run.split("/")[-1])
        names = sorted(os.listdir(d))
        assert len(names) == 4 and all(n.endswith(".tfrecord")
                                       for n in names)
        digests.append([
            hashlib.md5(open(os.path.join(d, n), "rb").read()).hexdigest()
            for n in names
        ])
    assert digests[0] == digests[1] == digests[2]

    back = read_tfrecords(spark, str(tmp_path / "w1"))
    typed = decode_examples(
        back, "record",
        {"doc_id": "int", "text": "string", "emb": "float_list"},
    )
    rows = {r.doc_id: r for r in typed.collect()}
    assert len(rows) == 20
    assert rows[7].text == "text 7" and rows[7].emb == [7.0, 0.5]

    # gzip whole-file shards read back identically through the same glob
    gz = str(tmp_path / "gz")
    assert write_tfrecord_shards(enc, gz, compression="gzip") == 20
    assert all(n.endswith(".tfrecord.gz") for n in os.listdir(gz))
    back_gz = decode_examples(
        read_tfrecords(spark, gz), "record",
        {"doc_id": "int", "text": "string"},
    )
    assert sorted(r.text for r in back_gz.collect()) \
        == sorted(f"text {i}" for i in range(20))

    # schema drift refuses by name instead of silently mis-typing
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="missing from Example"):
        decode_examples(back, "record", {"nope": "int"}).collect()
    with pytest.raises(PythonException, match="scalar"):
        decode_examples(back, "record", {"emb": "float"}).collect()

    # NULL feature values refuse by name at encode time
    null_df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    with pytest.raises(PythonException, match="NULL in feature column"):
        encode_examples(null_df, ["doc_id", "text"]).count()


def test_torn_shard_fails_loudly(spark, tmp_path):
    import os

    from bravo_spark.sources.tfrecord_source import (
        encode_examples,
        read_tfrecords,
        write_tfrecord_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    out = str(tmp_path / "shards")
    write_tfrecord_shards(encode_examples(df, ["doc_id"]), out)
    shard = os.path.join(out, sorted(os.listdir(out))[0])
    blob = open(shard, "rb").read()
    with open(shard, "wb") as f:
        f.write(blob[:-3])
    with pytest.raises(Exception, match="TfRecordError|torn|CRC"):
        read_tfrecords(spark, out).count()


def test_review_findings_r19():
    """Post-review pins: int64 range refusal at encode, >64-bit varint
    refusal at decode, batch-CRC path refusals, and the magic-byte
    shard that must NOT be mistaken for gzip."""
    from bravo_spark.codecs.tfrecord import read_all_tfrecords

    # out-of-int64 encode refuses by name (modulo wrap would read back
    # sign-flipped)
    for v in (1 << 63, -(1 << 63) - 1, 1 << 70):
        with pytest.raises(TfRecordError, match="outside"):
            encode_example({"n": v})
    # a crafted 10-byte varint carrying bits past 2^64 refuses: build
    # an Int64List whose packed run is ff*9 7f
    bad = b"\xff" * 9 + b"\x7f"
    feat = b"\x1a" + bytes([len(bad) + 2]) + b"\x0a" \
        + bytes([len(bad)]) + bad
    entry = b"\x0a\x01n\x12" + bytes([len(feat)]) + feat
    ex = b"\x0a" + bytes([len(entry) + 2]) + b"\x0a" \
        + bytes([len(entry)]) + entry
    with pytest.raises(TfRecordError, match="past 64 bits"):
        decode_example(ex)
    # the max LEGAL 10-byte varint (bit 63 set) still decodes
    assert decode_example(encode_example({"n": -1})) == {"n": [-1]}

    # batch-CRC verification (the shard read path) refuses like the
    # scalar path, with offsets
    blob = write_tfrecords([b"abcdef", b"xyz"])
    assert read_all_tfrecords(blob) == [b"abcdef", b"xyz"]
    bad_data = bytearray(blob)
    bad_data[12] ^= 0x01
    with pytest.raises(TfRecordError, match="data CRC mismatch at byte 0"):
        read_all_tfrecords(bytes(bad_data))
    bad_len = bytearray(blob)
    bad_len[8] ^= 0xFF
    with pytest.raises(TfRecordError, match="length CRC"):
        read_all_tfrecords(bytes(bad_len))


def test_uncompressed_shard_with_gzip_magic_length(spark, tmp_path):
    """An UNCOMPRESSED .tfrecord whose first record is exactly 0x8b1f
    bytes starts with the gzip magic — inflate detection is by filename
    suffix (which the writer controls), so it must read correctly."""
    import os

    from bravo_spark.sources.tfrecord_source import read_tfrecords

    rec = b"\x00" * 0x8B1F  # length bytes 1f 8b 00 ...
    blob = write_tfrecords([rec])
    assert blob[:2] == b"\x1f\x8b"
    d = str(tmp_path / "s")
    os.makedirs(d)
    with open(os.path.join(d, "shard_00000.tfrecord"), "wb") as f:
        f.write(blob)
    got = read_tfrecords(spark, d).collect()
    assert len(got) == 1 and len(bytes(got[0].record)) == 0x8B1F


def test_decode_kind_mismatch_and_bool_refusals(spark):
    from pyspark.errors.exceptions.captured import PythonException

    from bravo_spark.sources.tfrecord_source import (
        decode_examples,
        encode_examples,
        read_tfrecords,  # noqa: F401 (suite import symmetry)
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    enc = encode_examples(df, ["doc_id", "text"]).select("example")
    # declared kind disagreeing with the stored kind refuses by name
    with pytest.raises(PythonException, match="declared kind"):
        decode_examples(enc, "example", {"doc_id": "string"}).collect()
    with pytest.raises(PythonException, match="declared kind"):
        decode_examples(enc, "example", {"text": "int"}).collect()
    # a boolean column cannot launder into Int64List via the Spark path
    bdf = spark.createDataFrame([(True,)], "flag boolean")
    with pytest.raises(PythonException, match="bool feature"):
        encode_examples(bdf, ["flag"]).count()


def test_mixed_value_lists_refuse_with_feature_name():
    """The list's type is decided by its first element; stragglers of a
    different type must refuse by name — bytes(5) would zero-fill an
    int into an apparently-valid BytesList, and the int64 range check
    would leak a bare TypeError on a str."""
    from bravo_spark.codecs.tfrecord import TfRecordError, encode_example

    with pytest.raises(TfRecordError, match="'b'.*int in a bytes list"):
        encode_example({"b": [b"x", 5]})
    with pytest.raises(TfRecordError, match="str in an int64 list"):
        encode_example({"x": [1, "a"]})
    with pytest.raises(TfRecordError, match="str in a float list"):
        encode_example({"f": [1.5, "a"]})
    with pytest.raises(TfRecordError, match="bool in an int64 list"):
        encode_example({"x": [1, True]})
    # int in a float-led list is deterministic and accepted
    from bravo_spark.codecs.tfrecord import decode_example
    ex = encode_example({"f": [1.5, 2]})
    assert decode_example(ex)["f"] == [1.5, 2.0]


def test_float32_overflow_refuses_with_feature_name():
    from bravo_spark.codecs.tfrecord import TfRecordError, encode_example

    with pytest.raises(TfRecordError, match="'f'.*float32 range"):
        encode_example({"f": [1e39]})
    # inf/nan are representable float32s — allowed
    import math
    encode_example({"f": [math.inf, math.nan]})


def test_streaming_restart_continuation(spark, tmp_path):
    """read_tfrecord_stream: shards landing AFTER the first drain are
    picked up by a restarted query from the same checkpoint, exactly
    once (the warc/avro streaming contract), through the same
    CRC-verified parse stage as the batch reader."""
    import os

    from bravo_spark.codecs.tfrecord import encode_example, write_tfrecords
    from bravo_spark.sources.tfrecord_source import (
        decode_examples,
        read_tfrecord_stream,
    )

    d = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(d)

    def shard(fname, ids):
        recs = [encode_example({"doc_id": i}) for i in ids]
        with open(os.path.join(d, fname), "wb") as f:
            f.write(write_tfrecords(recs))

    shard("s1.tfrecord", [1, 2])

    def drain():
        typed = decode_examples(
            read_tfrecord_stream(spark, d), "record", {"doc_id": "int"})
        q = (
            typed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.doc_id for r in spark.read.parquet(out).collect()}

    assert drain() == {1, 2}
    shard("s2.tfrecord", [3])
    assert drain() == {1, 2, 3}
    total_before = spark.read.parquet(out).count()
    assert drain() == {1, 2, 3}
    assert spark.read.parquet(out).count() == total_before == 3
