"""End-to-end tests for the Spark state-store source/sink.

The decisive test is ``test_rewrite_then_restart``: after our writer
replaces a state version, a REAL Structured Streaming query restarts from
that checkpoint and keeps aggregating — proving the rewritten bytes
(snappy framing, UnsafeRow encoding, key→partition routing, CRC hygiene)
are accepted by Spark itself, which is the same bar the reference meets by
restoring Flink jobs from rewritten savepoints (reference
README.md:24-44)."""

from __future__ import annotations

import struct
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bravo_spark.sources import spark_state as ss


# ---------------------------------------------------------------------------
# codec units
# ---------------------------------------------------------------------------


def test_unsafe_row_roundtrip_types():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.IntegerType()),
            T.StructField("c", T.DoubleType()),
            T.StructField("d", T.BooleanType()),
            T.StructField("e", T.StringType()),
            T.StructField("f", T.BinaryType()),
        ]
    )
    vals = (-(2**40), 7, 2.5, True, "héllo wörld", b"\x00\xff\x10")
    buf = ss.encode_unsafe_row(vals, schema)
    assert len(buf) % 8 == 0
    out = ss.decode_unsafe_row(buf, schema)
    assert out == vals


def test_unsafe_row_nulls_and_empty_string():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    for vals in [(None, "", 1.0), (5, None, None), (None, None, None)]:
        assert ss.decode_unsafe_row(ss.encode_unsafe_row(vals, schema), schema) == vals


def test_schema_guard_rejects_nested():
    # validation happens once at the read/write API boundary, not per row
    schema = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))])
    with pytest.raises(ValueError, match="unsupported field type"):
        ss._check_schema(schema)


def test_lz4_block_roundtrip_against_reference_vectors():
    # literals-only block: token 0x30, 3 literal bytes
    assert ss._lz4_block_decompress(b"\x30abc", 3) == b"abc"
    # overlap copy (RLE): literal 'a' then match offset 1 len 8 -> 'a'*9
    blk = b"\x14a\x01\x00\x00"
    assert ss._lz4_block_decompress(blk, 9) == b"a" * 9


def test_lz4_java_framing_raw_blocks():
    # per-block magic, token 0x10 = stored raw, trailing originalLen=0 block
    blk = b"hello state world"
    one = ss.LZ4_MAGIC + bytes([0x10]) + struct.pack("<iii", len(blk), len(blk), 0) + blk
    eof = ss.LZ4_MAGIC + bytes([0x10]) + struct.pack("<iii", 0, 0, 0)
    assert ss.decode_stream(one + one + eof) == blk * 2


def test_snappy_stream_roundtrip():
    payload = b"the quick brown fox " * 500
    framed = ss.encode_stream_snappy(payload, block_size=1024)
    assert framed[:8] == ss.SNAPPY_MAGIC
    assert ss.decode_stream(framed) == payload


def test_record_framing_tombstone_and_eof():
    payload = (
        struct.pack(">i", 3) + b"key" + struct.pack(">i", 2) + b"vv"
        + struct.pack(">i", 3) + b"ded" + struct.pack(">i", -1)
        + struct.pack(">i", -1)
    )
    recs = list(ss._iter_records(payload))
    assert recs == [(b"key", b"vv"), (b"ded", None)]


# ---------------------------------------------------------------------------
# live checkpoint integration
# ---------------------------------------------------------------------------


def _run_agg(spark, input_dir: str, ckpt: str):
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = stream.groupBy("k").agg(
        F.count("*").alias("cnt"), F.sum("v").alias("sv")
    )
    name = f"state_t_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {r["k"]: (r["cnt"], r["sv"]) for r in spark.table(name).collect()}


def test_read_matches_query_output(spark, tmp_path):
    spark.conf.set("spark.sql.streaming.stateStore.compression.codec", "snappy")
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5), ("c", 9), ("c", 1)], "k string, v int"
    ).coalesce(1).write.parquet(inp)
    out = _run_agg(spark, inp, ckpt)
    assert out == {"a": (2, 3), "b": (1, 5), "c": (2, 10)}

    st = ss.read_spark_state(spark, ckpt)
    cols = st.columns
    assert cols[0] == "partition_id" and cols[1] == "k"
    got = {r[1]: (r[2], r[3]) for r in st.collect()}
    assert got == out
    # partition routing matches Spark's HashPartitioning
    n = len(ss._partitions(ss._state_dir(ckpt, 0)))
    routed = {
        r["k"]: r["pid"]
        for r in spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
        .select("k", F.pmod(F.hash("k"), F.lit(n)).cast("int").alias("pid"))
        .collect()
    }
    assert {r[1]: r[0] for r in st.collect()} == routed


def test_rewrite_then_restart(spark, tmp_path):
    """Patch state (bump a counter, tombstone a key), then restart the real
    query on new input — Spark must load OUR files and continue from the
    patched values."""
    spark.conf.set("spark.sql.streaming.stateStore.compression.codec", "snappy")
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, v int"
    ).coalesce(1).write.parquet(inp)
    assert _run_agg(spark, inp, ckpt) == {"a": (2, 3), "b": (1, 5)}

    st = ss.read_spark_state(spark, ckpt)
    cnt_col, sv_col = st.columns[2], st.columns[3]
    patched = (
        st.drop("partition_id")
        .where(F.col("k") != "b")  # tombstone b everywhere
        .withColumn(cnt_col, F.col(cnt_col) + F.lit(100))
    )
    ver = ss.write_spark_state(spark, ckpt, patched)
    assert ver == ss.latest_version(ckpt)

    # our own reader sees the patch
    got = {r[1]: (r[2], r[3]) for r in ss.read_spark_state(spark, ckpt).collect()}
    assert got == {"a": (102, 3)}

    # the decisive step: more input, restart the REAL query on our files
    spark.createDataFrame(
        [("a", 10), ("b", 7)], "k string, v int"
    ).coalesce(1).write.mode("append").parquet(inp)
    out2 = _run_agg(spark, inp, ckpt)
    assert out2 == {"a": (103, 13), "b": (1, 7)}


def test_write_validates_missing_columns(spark, tmp_path):
    spark.conf.set("spark.sql.streaming.stateStore.compression.codec", "snappy")
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    spark.createDataFrame([("a", 1)], "k string, v int").coalesce(1).write.parquet(inp)
    _run_agg(spark, inp, ckpt)
    bad = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="missing columns"):
        ss.write_spark_state(spark, ckpt, bad)
