"""X1 custom reader, P7 window bounds, tuple-keyed state (Tuple1 unwrap)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from bravo_spark import api
from bravo_spark.codecs import flink as fc
from bravo_spark.sources import savepoint as sp
from bravo_spark.sources import staterows as sr


def test_custom_reader_udtf_shape(spark, tmp_path):
    # X1: one state row -> 0..n typed rows (here: emit key once per value unit)
    kv = spark.createDataFrame([(1, 2), (2, 3)], "key int, value int")
    rows = sr.kv_to_state_rows(kv, "Count", fc.INT, fc.INT)
    sp.write_savepoint(rows, str(tmp_path / "sv"), max_parallelism=128, parallelism=2)
    reader = api.OperatorStateReader(spark, str(tmp_path / "sv"))

    def explode_count(key_ns: bytes, value: bytes):
        r = fc.ByteReader(key_ns, 1)
        key = fc.INT.decode(r)
        n = fc.decode_value_state(value, fc.INT)
        for i in range(n):
            yield (key, i)

    schema = StructType(
        [StructField("key", IntegerType()), StructField("i", IntegerType())]
    )
    got = sorted(
        tuple(r) for r in reader.read_custom("Count", explode_count, schema).collect()
    )
    assert got == [(1, 0), (1, 1), (2, 0), (2, 1), (2, 2)]


def test_window_bounds_reader(spark, tmp_path):
    data = [("a", 0, 60_000, 5), ("b", 60_000, 120_000, 7)]
    kv = spark.createDataFrame(
        data, "key string, w_start long, w_end long, value int"
    )

    def enc(batches):
        for pdf in batches:
            out = {"state_name": [], "key_ns": [], "value": []}
            for k, ws, we, v in zip(
                pdf["key"], pdf["w_start"], pdf["w_end"], pdf["value"]
            ):
                ns = fc.write_long(int(ws)) + fc.write_long(int(we))
                kns = fc.encode_key_ns(
                    str(k), fc.STRING, 128,
                    # TimeWindow.Serializer is fixed-length 16 — not ambiguous
                    namespace_codec=fc.Codec("tw", lambda _v, _ns=ns: _ns, None, 16),
                )
                out["state_name"].append("window-contents")
                out["key_ns"].append(kns)
                out["value"].append(fc.encode_value_state(int(v), fc.INT))
            yield pd.DataFrame(out)

    rows = kv.mapInPandas(enc, schema=sr.STATE_ROW_SCHEMA)
    sp.write_savepoint(rows, str(tmp_path / "w"), max_parallelism=128, parallelism=2)
    reader = api.OperatorStateReader(spark, str(tmp_path / "w"))
    got = sorted(
        tuple(r)
        for r in reader.read_window_kv_with_bounds(api.STRING, api.INT).collect()
    )
    assert got == [("a", 0, 60_000, 5), ("b", 60_000, 120_000, 7)]


def test_tuple_keyed_state_roundtrip(spark, tmp_path):
    # composite (int, string) key via TupleSerializer layout; read back with
    # a custom reader (the reference handles tuple keys the same way:
    # the key serializer is a TupleSerializer).
    tup = fc.tuple_codec(fc.INT, fc.STRING)
    src = [((1, "a"), 10), ((2, "bb"), 20)]

    def enc(batches):
        for _ in batches:
            out = {"state_name": [], "key_ns": [], "value": []}
            for key, v in src:
                out["state_name"].append("t")
                out["key_ns"].append(
                    fc.encode_key_ns(key, tup, 128, key_group=5)
                )
                out["value"].append(fc.encode_value_state(v, fc.INT))
            yield pd.DataFrame(out)

    seed = spark.range(1)
    rows = seed.mapInPandas(enc, schema=sr.STATE_ROW_SCHEMA)
    sp.write_savepoint(rows, str(tmp_path / "t"), max_parallelism=128, parallelism=2)
    reader = api.OperatorStateReader(spark, str(tmp_path / "t"))

    def dec(key_ns: bytes, value: bytes):
        r = fc.ByteReader(key_ns, 1)
        k1, k2 = tup.decode(r)
        yield (k1, k2, fc.decode_value_state(value, fc.INT))

    schema = StructType(
        [
            StructField("k1", IntegerType()),
            StructField("k2", StringType()),
            StructField("value", IntegerType()),
        ]
    )
    got = sorted(tuple(r) for r in reader.read_custom("t", dec, schema).collect())
    assert got == [(1, "a", 10), (2, "bb", 20)]
