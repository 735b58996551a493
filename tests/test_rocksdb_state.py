"""Tests for the RocksDB state-store reader.

The live test runs a REAL RocksDB-provider streaming aggregation (the JVM
ships rocksdbjni) over two batches, then reads both committed versions with
our pure-Python SST pipeline — proving format compatibility end-to-end
against files an actual RocksDB instance wrote, including time travel to
the earlier version. The fixture tests pin the LSM resolution rules and the
format_version≥4 delta-encoded index parsing without Spark."""

from __future__ import annotations

import json
import os
import struct
import uuid
import zipfile

import pytest
from pyspark.sql import functions as F

from bravo_spark.sources import rocksdb_state as rs
from bravo_spark.sources import sst as sstmod


# ---------------------------------------------------------------------------
# unit: delta-encoded index blocks
# ---------------------------------------------------------------------------


def _uv(v: int) -> bytes:
    out = bytearray()
    while True:
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def test_delta_index_block_decode():
    # entry 1 (restart): shared=0, key "aa", full handle (offset 0, size 100)
    # entry 2 (delta): shared=2, zigzag size delta +8 → handle (105, 108)
    # entry 3 (delta): zigzag size delta -3 → handle (218, 105)
    block = bytearray()
    block += _uv(0) + _uv(2) + b"aa" + _uv(0) + _uv(100)
    block += _uv(2) + _uv(0) + _uv(16)  # zigzag(+8) = 16
    block += _uv(2) + _uv(0) + _uv(5)  # zigzag(-3) = 5
    block += struct.pack("<I", 0)  # restart offset
    block += struct.pack("<I", 1)  # restart count
    handles = list(sstmod.iter_index_handles_delta(bytes(block)))
    assert [(h.offset, h.size) for h in handles] == [
        (0, 100),
        (105, 108),
        (218, 105),
    ]


# ---------------------------------------------------------------------------
# unit: LSM resolution over a hand-built partition dir
# ---------------------------------------------------------------------------


def _write_partition_version(pdir, version: int, sst_entries: dict[str, list]):
    """sst_entries: dfs_name -> [(ukey, seq, vtype, value)] sorted."""
    os.makedirs(os.path.join(pdir, "SSTs"), exist_ok=True)
    names = []
    for dfs_name, entries in sst_entries.items():
        path = os.path.join(pdir, "SSTs", dfs_name)
        if not os.path.exists(path):
            w = sstmod.SstWriter(path)
            for ukey, seq, vtype, value in entries:
                w.add(ukey, seq, vtype, value)
            w.finish()
        names.append({
            "localFileName": dfs_name.split("-")[0] + ".sst",
            "dfsSstFileName": dfs_name,
            "sizeBytes": os.path.getsize(path),
        })
    meta = {"sstFiles": names, "numKeys": 0, "numInternalKeys": 0,
            "columnFamilyMapping": {}, "columnFamilyTypeMap": {},
            "maxColumnFamilyId": 0}
    with zipfile.ZipFile(os.path.join(pdir, f"{version}.zip"), "w") as z:
        z.writestr("metadata", "v1\n" + json.dumps(meta))


def test_lsm_resolution_shadowing_and_tombstone(tmp_path):
    pdir = str(tmp_path / "0")
    os.makedirs(pdir)
    sst1 = {
        "000008-aaaa.sst": [
            (b"ka", 2, sstmod.TYPE_VALUE, b"v1"),
            (b"kb", 3, sstmod.TYPE_VALUE, b"v2"),
        ]
    }
    _write_partition_version(pdir, 1, sst1)
    # version 2 adds a newer SST: ka overwritten, kb tombstoned, kc added
    sst2 = dict(sst1)
    sst2["000012-bbbb.sst"] = [
        (b"ka", 7, sstmod.TYPE_VALUE, b"v1x"),
        (b"kb", 8, sstmod.TYPE_DELETION, b""),
        (b"kc", 9, sstmod.TYPE_VALUE, b"v3"),
    ]
    _write_partition_version(pdir, 2, sst2)

    assert rs._load_partition_state(pdir, 1) == {b"ka": b"v1", b"kb": b"v2"}
    assert rs._load_partition_state(pdir, 2) == {b"ka": b"v1x", b"kc": b"v3"}


def test_virtual_column_families_rejected(tmp_path):
    pdir = str(tmp_path / "0")
    os.makedirs(pdir)
    meta = {"sstFiles": [], "columnFamilyMapping": {"cf1": 1}}
    with zipfile.ZipFile(os.path.join(pdir, "1.zip"), "w") as z:
        z.writestr("metadata", "v1\n" + json.dumps(meta))
    with pytest.raises(ValueError, match="virtual column families"):
        rs._load_partition_state(pdir, 1)


# ---------------------------------------------------------------------------
# live checkpoint integration (real rocksdbjni writes, our reader reads)
# ---------------------------------------------------------------------------


def _run_agg(spark, input_dir: str, ckpt: str):
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = stream.groupBy("k").agg(F.count("*").alias("cnt"), F.sum("v").alias("sv"))
    name = f"rocks_t_{uuid.uuid4().hex[:8]}"
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


def test_read_rocksdb_state_with_time_travel(spark, tmp_path):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        out1 = _run_agg(spark, inp, ckpt)
        assert out1 == {"a": (2, 3), "b": (1, 5)}

        spark.createDataFrame(
            [("a", 10), ("c", 4)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        out2 = _run_agg(spark, inp, ckpt)
        assert out2 == {"a": (3, 13), "b": (1, 5), "c": (1, 4)}

        latest = rs.latest_version(ckpt)
        assert latest == 2
        got2 = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert got2 == out2
        # time travel: version 1 is the state after the first batch
        got1 = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt, version=1).collect()
        }
        assert got1 == out1
    finally:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )


def test_read_rocksdb_changelog_checkpointing(spark, tmp_path):
    """Changelog-checkpointing mode: versions commit as {v}.changelog (no
    per-version zip). State must replay correctly at the latest version AND
    time-travel to version 1."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        out1 = _run_agg(spark, inp, ckpt)
        spark.createDataFrame(
            [("a", 10), ("c", 4)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        out2 = _run_agg(spark, inp, ckpt)

        import glob

        assert glob.glob(f"{ckpt}/state/0/*/*.changelog"), "no changelog files"
        assert rs.latest_version(ckpt) == 2
        got2 = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert got2 == out2
        got1 = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt, version=1).collect()
        }
        assert got1 == out1
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_rocksdb_rewrite_then_restart(spark, tmp_path):
    """State surgery on the RocksDB provider, proven by the real query:
    patch a counter and tombstone a key in a changelog-checkpointing
    store, then restart the query on new input — Spark's own RocksDB must
    replay OUR changelog and continue from the patched values."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        assert _run_agg(spark, inp, ckpt) == {"a": (2, 3), "b": (1, 5)}

        st = rs.read_rocksdb_spark_state(spark, ckpt)
        cnt_col = st.columns[2]
        patched = (
            st.drop("partition_id")
            .where(F.col("k") != "b")  # tombstone b
            .withColumn(cnt_col, F.col(cnt_col) + F.lit(100))
        )
        ver = rs.write_rocksdb_spark_state(spark, ckpt, patched)
        assert ver == rs.latest_version(ckpt)

        # our reader sees the patch
        got = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert got == {"a": (102, 3)}

        # the decisive step: restart the REAL query on our changelog
        spark.createDataFrame(
            [("a", 10), ("b", 7)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        out2 = _run_agg(spark, inp, ckpt)
        assert out2 == {"a": (103, 13), "b": (1, 7)}
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_rocksdb_rewrite_then_restart_zip_mode(spark, tmp_path):
    """Zip-per-version (default) RocksDB checkpoints rewrite too: the
    version's zip is rebuilt as a pure-Python RocksDB checkpoint — our
    SST + MANIFEST/CURRENT (sources/rocksdb_manifest.py) — and the
    restarted query's REAL RocksDB must open it and continue from the
    patched state."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        assert _run_agg(spark, inp, ckpt) == {"a": (2, 3), "b": (1, 5)}

        st = rs.read_rocksdb_spark_state(spark, ckpt)
        cnt_col = st.columns[2]
        patched = (
            st.drop("partition_id")
            .where(F.col("k") != "b")  # tombstone b
            .withColumn(cnt_col, F.col(cnt_col) + F.lit(100))
        )
        rs.write_rocksdb_spark_state(spark, ckpt, patched)

        # our reader sees the patch through the rebuilt zip
        got = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert got == {"a": (102, 3)}

        # the decisive step: restart — Spark's real RocksDB opens OUR
        # MANIFEST + SST
        spark.createDataFrame(
            [("a", 10), ("b", 7)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        out2 = _run_agg(spark, inp, ckpt)
        assert out2 == {"a": (103, 13), "b": (1, 7)}
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )


def test_manifest_writer_db_opened_by_real_rocksdb(spark, tmp_path):
    """The pure-Python DB-directory builder must produce a database real
    RocksDB opens with no repair: iterate + point-get byte-exactly."""
    from bravo_spark.sources.rocksdb_manifest import build_db_dir

    j = spark._jvm
    j.org.rocksdb.RocksDB.loadLibrary()
    path = str(tmp_path / "pydb")
    entries = [((b"key%04d" % i), (b"payload-%d|" % i) * (1 + i % 3)) for i in range(300)]
    build_db_dir(path, entries)
    opts = j.org.rocksdb.Options()
    opts.setCreateIfMissing(False)
    opts.setParanoidChecks(True)
    db = j.org.rocksdb.RocksDB.open(opts, path)
    try:
        it = db.newIterator()
        it.seekToFirst()
        got = []
        while it.isValid():
            got.append((bytes(it.key()), bytes(it.value())))
            it.next()
        assert got == sorted(entries)
        assert bytes(db.get(b"key0123")) == entries[123][1]
        assert db.get(b"missing") is None
    finally:
        db.close()


def test_write_incremental_checkpoint_roundtrip_and_native_open(spark, tmp_path):
    """The write half of S4: state rows -> per-subtask RocksDB dirs ->
    (a) our reader round-trips them, (b) REAL RocksDB opens every subtask
    directory with the expected column families — the core step of a
    RocksDB-backend restore."""
    from bravo_spark.codecs import flink as fc
    from bravo_spark.sources import checkpoint as ck
    from bravo_spark.sources import staterows as sr

    kvs = [(i, i * 10) for i in range(200)]
    kv_df = spark.createDataFrame(kvs, "key long, value long")
    rows = sr.kv_to_state_rows(
        kv_df, "Count", fc.LONG, fc.LONG, max_parallelism=128
    )
    out = str(tmp_path / "ckpt")
    meta = ck.write_incremental_checkpoint(
        rows, out, max_parallelism=128, parallelism=3
    )
    assert set(meta["subtasks"]) == {"0", "1", "2"}

    back = ck.read_incremental_checkpoint(spark, out)
    got = {
        r["key"]: r["value"]
        for r in sr.read_value_kv(back, "Count", fc.LONG, fc.LONG).collect()
    }
    assert got == dict(kvs)

    j = spark._jvm
    j.org.rocksdb.RocksDB.loadLibrary()
    total = 0
    for op in meta["subtasks"]:
        dbdir = f"{out}/op-{op}"
        cfs = [bytes(c).decode() for c in j.org.rocksdb.RocksDB.listColumnFamilies(
            j.org.rocksdb.Options(), dbdir)]
        assert set(cfs) == {"default", "Count"}
        descs = j.java.util.ArrayList()
        cfo = j.org.rocksdb.ColumnFamilyOptions()
        for n in cfs:
            descs.add(j.org.rocksdb.ColumnFamilyDescriptor(n.encode(), cfo))
        handles = j.java.util.ArrayList()
        db = j.org.rocksdb.RocksDB.open(j.org.rocksdb.DBOptions(), dbdir, descs, handles)
        try:
            it = db.newIterator(handles.get(cfs.index("Count")))
            it.seekToFirst()
            while it.isValid():
                total += 1
                it.next()
        finally:
            db.close()
    assert total == len(kvs)  # every key landed in exactly one subtask DB


def test_rocksdb_nested_array_state_rewrite_then_restart(spark, tmp_path):
    """Nested-state surgery on the RocksDB provider: an
    applyInPandasWithState query (state schema ``seen array<long>, cnt
    long``, stored as a nested struct value) checkpointed into a
    changelog-checkpointing RocksDB store is read, patched inside the
    nested struct, rewritten, and the restarted real query continues from
    the patched values — the provider x nested-codec combination the
    HDFS-provider twin (test_spark_state) can't cover."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    spark.conf.set(
        "spark.sql.streaming.stateStore.compression.codec", "snappy"
    )
    try:
        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], "k string, v long"
        ).coalesce(1).write.parquet(inp)

        def fn(key, pdf_iter, state):
            seen = list(state.get[0]) if state.exists else []
            for pdf in pdf_iter:
                seen.extend(int(x) for x in pdf["v"])
            state.update((seen, len(seen)))
            yield pd.DataFrame(
                {"k": [key[0]], "seen": [seen], "cnt": [len(seen)]}
            )

        def run():
            got = {}
            schema = spark.read.parquet(inp).schema
            stream = spark.readStream.schema(schema).parquet(inp)
            out = stream.groupBy("k").applyInPandasWithState(
                fn, "k string, seen array<long>, cnt long",
                "seen array<long>, cnt long", "update",
                GroupStateTimeout.NoTimeout,
            )

            def sink(df, _bid):
                for r in df.collect():
                    got[r["k"]] = (list(r["seen"]), r["cnt"])

            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return got

        assert run() == {"a": ([1, 2], 2), "b": ([5], 1)}

        st = rs.read_rocksdb_spark_state(spark, ckpt)
        assert "groupState" in st.columns
        patched = (
            st.drop("partition_id")
            .where(F.col("k") != "b")
            .withColumn(
                "groupState",
                F.col("groupState").withField(
                    "seen",
                    F.concat(
                        F.array(F.lit(999).cast("long")),
                        F.col("groupState.seen"),
                    ),
                ),
            )
        )
        rs.write_rocksdb_spark_state(spark, ckpt, patched)
        back = {
            r["k"]: list(r["groupState"]["seen"])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert back == {"a": [999, 1, 2]}

        spark.createDataFrame(
            [("a", 10), ("b", 7)], "k string, v long"
        ).coalesce(1).write.mode("append").parquet(inp)
        assert run() == {"a": ([999, 1, 2, 10], 4), "b": ([7], 1)}
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_rocksdb_reader_matches_sparks_builtin_statestore_source(spark, tmp_path):
    """Independent oracle for the RocksDB-provider reader: Spark 4's own
    spark.read.format('statestore') opens the same checkpoint with a real
    RocksDB; our pure-Python SST scan + changelog replay must return the
    identical state."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5), ("c", 9)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        _run_agg(spark, inp, ckpt)

        ours = {
            r["k"]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        builtin = {
            r["key"]["k"]: (r["value"]["count"], r["value"]["sum"])
            for r in spark.read.format("statestore").load(ckpt).collect()
        }
        assert ours == builtin and len(ours) == 3
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )


def test_rocksdb_join_state_rewrite_restart(spark, tmp_path):
    """RocksDB-provider twin of the stream-stream join surgery: the four
    named join stores land as real rocksdbjni checkpoints; read the left
    side with explicit schemas, coherently remove one user's buffered
    rows from both left stores (keyWithIndexToValue routed by the join
    key alone via partition_key_cols), and restart the REAL join — the
    deleted user's match must not appear."""
    import datetime as _dt

    from pyspark.sql import types as T

    prop = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        inp_l = str(tmp_path / "left")
        inp_r = str(tmp_path / "right")
        ckpt = str(tmp_path / "ckpt")
        outdir = str(tmp_path / "out")
        spark.createDataFrame(
            [(1, 10), (2, 20)], "uid long, a long"
        ).coalesce(1).write.parquet(inp_l)
        spark.createDataFrame(
            [(1, 100)], "r_uid long, b long"
        ).coalesce(1).write.parquet(inp_r)

        def run():
            ls = spark.readStream.schema("uid long, a long").parquet(inp_l)
            rs_ = spark.readStream.schema("r_uid long, b long").parquet(inp_r)
            j = ls.join(rs_, F.col("uid") == F.col("r_uid")).select(
                "uid", "a", "b"
            )
            q = (
                j.writeStream.format("parquet")
                .outputMode("append")
                .option("path", outdir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return {
                (r["uid"], r["b"]) for r in spark.read.parquet(outdir).collect()
            }

        assert run() == {(1, 100)}

        counts_key = T.StructType([T.StructField("uid", T.LongType())])
        counts_val = T.StructType([T.StructField("count", T.LongType())])
        rows_key = T.StructType(
            [T.StructField("uid", T.LongType()), T.StructField("index", T.LongType())]
        )
        rows_val = T.StructType(
            [
                T.StructField("uid", T.LongType()),
                T.StructField("a", T.LongType()),
                T.StructField("matched", T.BooleanType()),
            ]
        )
        # named store without schemas refuses by name
        with pytest.raises(ValueError, match="explicit"):
            rs.read_rocksdb_spark_state(
                spark, ckpt, store_name="left-keyToNumValues"
            )
        counts = rs.read_rocksdb_spark_state(
            spark, ckpt, store_name="left-keyToNumValues",
            key_schema=counts_key, value_schema=counts_val,
        )
        assert {r["uid"] for r in counts.collect()} == {1, 2}
        rows = rs.read_rocksdb_spark_state(
            spark, ckpt, store_name="left-keyWithIndexToValue",
            key_schema=rows_key, value_schema=rows_val,
        )
        rs.write_rocksdb_spark_state(
            spark, ckpt, counts.drop("partition_id").where(F.col("uid") != 2),
            store_name="left-keyToNumValues",
            key_schema=counts_key, value_schema=counts_val,
        )
        rs.write_rocksdb_spark_state(
            spark, ckpt, rows.drop("partition_id").where(F.col("uid") != 2),
            store_name="left-keyWithIndexToValue",
            key_schema=rows_key, value_schema=rows_val,
            partition_key_cols=["uid"],
        )
        left_now = rs.read_rocksdb_spark_state(
            spark, ckpt, store_name="left-keyWithIndexToValue",
            key_schema=rows_key, value_schema=rows_val,
        )
        assert {r["uid"] for r in left_now.collect()} == {1}

        spark.createDataFrame(
            [(1, 101), (2, 201)], "r_uid long, b long"
        ).coalesce(1).write.mode("append").parquet(inp_r)
        out2 = run()
        assert (1, 101) in out2
        assert all(uid != 2 for uid, _ in out2), out2
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )


def test_rocksdb_schema_evolution_migration_restart(spark, tmp_path):
    """RocksDB-provider twin of the schema-evolution surgery: the evolved
    query cold-fails STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE; after
    migrate_spark_state_schema(provider="rocksdb") rewrites the shared
    _metadata/schema file and the rows through the RocksDB writer, the
    evolved query restarts and continues from migrated values."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bravo_spark.sources import spark_state as ss

    prop = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        inp = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "k string, v long"
        ).coalesce(1).write.parquet(inp)

        def mk_fn(evolved):
            def fn(key, pdf_iter, state):
                if evolved:
                    tot, mn = state.get if state.exists else (0, None)
                else:
                    (tot,) = state.get if state.exists else (0,)
                    mn = None
                vals = [int(x) for pdf in pdf_iter for x in pdf["v"]]
                tot += sum(vals)
                if evolved:
                    cand = vals + ([mn] if mn is not None else [])
                    mn = min(cand) if cand else None
                    state.update((tot, mn))
                else:
                    state.update((tot,))
                yield pd.DataFrame({"k": [key[0]], "tot": [tot]})
            return fn

        def run(evolved):
            st_schema = "tot long, mn long" if evolved else "tot long"
            q = (
                spark.readStream.schema("k string, v long")
                .parquet(inp)
                .groupBy("k")
                .applyInPandasWithState(
                    mk_fn(evolved), "k string, tot long", st_schema,
                    "update", GroupStateTimeout.NoTimeout,
                )
                .writeStream.foreachBatch(lambda df, _b: df.count())
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        run(False)
        spark.createDataFrame(
            [("a", 5)], "k string, v long"
        ).coalesce(1).write.mode("append").parquet(inp)

        with pytest.raises(Exception, match="SCHEMA_NOT_COMPATIBLE"):
            run(True)

        old_key, old_val = ss.read_state_schema(ckpt)
        gs = next(f for f in old_val.fields if f.name == "groupState")
        new_gs = T.StructType(
            list(gs.dataType.fields) + [T.StructField("mn", T.LongType())]
        )
        new_val = T.StructType([
            T.StructField(f.name, new_gs if f.name == "groupState" else f.dataType)
            for f in old_val.fields
        ])
        st = rs.read_rocksdb_spark_state(spark, ckpt)
        migrated = st.drop("partition_id").withColumn(
            "groupState",
            F.struct(
                F.col("groupState.tot").alias("tot"),
                F.lit(None).cast("long").alias("mn"),
            ),
        )
        ss.migrate_spark_state_schema(
            spark, ckpt, migrated, new_value_schema=new_val, provider="rocksdb"
        )
        run(True)
        final = {
            r["k"]: tuple(r["groupState"])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert final == {"a": (6, 5), "b": (2, None)}
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )


def test_latest_version_names_missing_store(tmp_path):
    """latest_version on a store-name typo (or a partially-written
    checkpoint) must raise an error NAMING the store and the partitions
    missing it, not an opaque listdir FileNotFoundError (r15 advice) —
    and a partition legitimately missing a named store must be skipped,
    not fatal."""
    ckpt = tmp_path / "ckpt"
    sdir = ckpt / "state" / "0"
    (sdir / "0").mkdir(parents=True)  # partition 0: no named-store subdir
    (sdir / "1" / "left-store").mkdir(parents=True)
    (sdir / "1" / "left-store" / "3.changelog").write_bytes(b"")

    # typo'd store: every partition misses it — error names store + parts
    with pytest.raises(FileNotFoundError, match=r"'left-stor'.*\[0, 1\]"):
        rs.latest_version(str(ckpt), 0, "left-stor")

    # partially-present store: partition 0 is skipped, version found in 1
    assert rs.latest_version(str(ckpt), 0, "left-store") == 3


def test_compact_rocksdb_changelog_checkpoint_then_restart(spark, tmp_path):
    """Offline compaction: fold a changelog-only store into a full
    snapshot zip at the latest version — the upload background maintenance
    would have produced. Proven three ways: the zip appears per partition,
    our reader sees identical state THROUGH the zip path, and Spark's own
    restarted query continues correctly from the compacted checkpoint."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        _run_agg(spark, inp, ckpt)
        spark.createDataFrame(
            [("a", 10), ("c", 4)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        out2 = _run_agg(spark, inp, ckpt)

        import glob

        ver = rs.latest_version(ckpt)
        assert not glob.glob(f"{ckpt}/state/0/*/{ver}.zip"), "zip already there"
        before = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert before == out2

        got_ver = rs.compact_rocksdb_checkpoint(spark, ckpt)
        assert got_ver == ver
        pdirs = glob.glob(f"{ckpt}/state/0/[0-9]*")
        assert pdirs and all(
            os.path.exists(os.path.join(p, f"{ver}.zip")) for p in pdirs
        )
        # the zip path alone reproduces the state (changelog replay from
        # the new snapshot is empty)
        for p in pdirs:
            assert rs._load_partition_state(p, ver) == rs._load_zip_state(p, ver)
        after = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert after == before

        # Spark itself restarts on the compacted checkpoint and continues
        spark.createDataFrame(
            [("a", 100), ("d", 7)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        out3 = _run_agg(spark, inp, ckpt)
        assert out3 == {"a": (4, 113), "b": (1, 5), "c": (1, 4), "d": (1, 7)}
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_gc_rocksdb_checkpoint_reaps_only_orphans(spark, tmp_path):
    """GC deletes exactly the SSTs no version's zip references: compact
    twice at the same version (the rewrite orphans the first snapshot's
    SST), gc, and prove the referenced file survives, time travel to the
    zip version still works, and Spark's own restart continues."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        import glob

        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("b", 5)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        _run_agg(spark, inp, ckpt)
        ver = rs.compact_rocksdb_checkpoint(spark, ckpt)
        rs.compact_rocksdb_checkpoint(spark, ckpt, version=ver)  # orphan #1

        pdirs = glob.glob(f"{ckpt}/state/0/[0-9]*")
        n_ssts = sum(len(os.listdir(os.path.join(p, "SSTs"))) for p in pdirs)
        before = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }

        planned = rs.gc_rocksdb_checkpoint(spark, ckpt, dry_run=True)
        assert planned and all(os.path.exists(p) for p in planned)
        removed = rs.gc_rocksdb_checkpoint(spark, ckpt)
        assert sorted(removed) == sorted(planned)
        assert not any(os.path.exists(p) for p in removed)
        n_left = sum(len(os.listdir(os.path.join(p, "SSTs"))) for p in pdirs)
        assert n_left == n_ssts - len(removed) and n_left > 0

        # referenced snapshot still reads; idempotent second gc is a no-op
        after = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt, version=ver).collect()
        }
        assert after == before
        assert rs.gc_rocksdb_checkpoint(spark, ckpt) == []

        # Spark itself restarts on the gc'd checkpoint and continues
        spark.createDataFrame(
            [("a", 10)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        assert _run_agg(spark, inp, ckpt) == {"a": (2, 11), "b": (1, 5)}
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_prune_rocksdb_checkpoint_retention(spark, tmp_path):
    """Retention pruning on the changelog-mode RocksDB provider: zip at
    the floor, older changelogs dropped, orphans reaped; versions >=
    floor read, the real query restarts."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        import glob

        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        _run_agg(spark, inp, ckpt)
        spark.createDataFrame(
            [("b", 2)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        _run_agg(spark, inp, ckpt)
        spark.createDataFrame(
            [("a", 3)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        out3 = _run_agg(spark, inp, ckpt)

        assert rs.latest_version(ckpt) == 3
        removed = rs.prune_rocksdb_checkpoint(spark, ckpt, retain_versions=2)
        assert removed and all(not os.path.exists(p) for p in removed)
        assert any("1.changelog" in p for p in removed)
        pdirs = glob.glob(f"{ckpt}/state/0/[0-9]*")
        assert all(os.path.exists(os.path.join(p, "2.zip")) for p in pdirs)

        got3 = {
            r[1]: (r[2], r[3])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert got3 == out3
        assert {
            r[1]
            for r in rs.read_rocksdb_spark_state(spark, ckpt, version=2).collect()
        } == {"a", "b"}
        with pytest.raises(Exception):
            rs.read_rocksdb_spark_state(spark, ckpt, version=1).collect()

        spark.createDataFrame(
            [("c", 9)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        assert _run_agg(spark, inp, ckpt) == {
            "a": (2, 4), "b": (1, 2), "c": (1, 9)
        }
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_timer_reschedule_surgery_rocksdb_provider(spark, tmp_path):
    """The RocksDB-provider twin of the timer-reschedule surgery: patch a
    key's timeoutTimestamp into the past via the RocksDB state writer and
    the restarted applyInPandasWithState query fires that key's
    hasTimedOut handler, untouched timers stay silent."""
    import time as _time

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bravo_spark.sources import spark_state as ss

    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        inp = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "k string, v long"
        ).coalesce(1).write.parquet(inp)

        def fn(key, pdf_iter, state):
            if state.hasTimedOut:
                state.remove()
                yield pd.DataFrame({"k": [key[0]], "tot": [-999]})
                return
            (tot,) = state.get if state.exists else (0,)
            tot += sum(int(x) for pdf in pdf_iter for x in pdf["v"])
            state.update((tot,))
            state.setTimeoutDuration(3600_000)
            yield pd.DataFrame({"k": [key[0]], "tot": [tot]})

        def run(max_batches):
            got, seen = [], [0]

            def sink(df, _bid):
                got.extend((r["k"], r["tot"]) for r in df.collect())
                seen[0] += 1

            q = (
                spark.readStream.schema("k string, v long")
                .parquet(inp)
                .groupBy("k")
                .applyInPandasWithState(
                    fn, "k string, tot long", "tot long",
                    "update", GroupStateTimeout.ProcessingTimeTimeout,
                )
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            t0 = _time.time()
            while q.isActive and _time.time() - t0 < 150 and seen[0] < max_batches:
                _time.sleep(0.5)
            q.stop()
            q.awaitTermination(60)
            return sorted(got)

        assert run(1) == [("a", 1), ("b", 2)]

        st = rs.read_rocksdb_spark_state(spark, ckpt)
        assert st.columns[-1] == "timeoutTimestamp"
        patched = st.drop("partition_id").withColumn(
            "timeoutTimestamp",
            F.when(F.col("k") == "a", F.lit(1).cast("long")).otherwise(
                F.col("timeoutTimestamp")
            ),
        )
        rs.write_rocksdb_spark_state(spark, ckpt, patched)

        spark.createDataFrame(
            [("c", 9)], "k string, v long"
        ).coalesce(1).write.mode("append").parquet(inp)
        out2 = run(2)
        assert ("a", -999) in out2
        assert ("c", 9) in out2
        assert all(k != "b" for k, _ in out2)
        final = {
            r["k"]: tuple(r["groupState"])
            for r in rs.read_rocksdb_spark_state(spark, ckpt).collect()
        }
        assert final == {"b": (2,), "c": (9,)}
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_audit_checkpoint_rocksdb_findings(spark, tmp_path):
    """audit_checkpoint's RocksDB checks: orphan SSTs after a double
    compaction, and a broken changelog chain after deleting a middle
    changelog."""
    from bravo_spark import maintenance as mt

    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        import glob

        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        _run_agg(spark, inp, ckpt)
        spark.createDataFrame(
            [("b", 2)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(inp)
        _run_agg(spark, inp, ckpt)

        assert mt.audit_checkpoint(spark, ckpt).count() == 0

        ver = rs.compact_rocksdb_checkpoint(spark, ckpt)
        rs.compact_rocksdb_checkpoint(spark, ckpt, version=ver)  # orphans
        rows = mt.audit_checkpoint(spark, ckpt).collect()
        assert {r["check"] for r in rows} == {"orphan_sst"}
        rs.gc_rocksdb_checkpoint(spark, ckpt)
        assert mt.audit_checkpoint(spark, ckpt).count() == 0

        victim = glob.glob(f"{ckpt}/state/0/0/1.changelog")[0]
        os.remove(victim)
        rows = mt.audit_checkpoint(spark, ckpt).collect()
        chain = [r for r in rows if r["check"] == "broken_replay_chain"]
        # zip at 2 anchors versions >= 2, so only sub-anchor history
        # breaks... the anchor is max zip <= latest: latest=2, anchor=2,
        # missing range empty — deleting 1.changelog is then INVISIBLE to
        # the chain check because the zip anchors it. Delete the zip too:
        for z in glob.glob(f"{ckpt}/state/0/0/2.zip"):
            os.remove(z)
        rows = mt.audit_checkpoint(spark, ckpt).collect()
        chain = [r for r in rows if r["check"] == "broken_replay_chain"]
        assert chain and "missing changelogs [1]" in chain[0]["detail"]
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_compact_named_join_stores_rocksdb(spark, tmp_path):
    """RocksDB twin of the named-store maintenance proof: compact all
    four stream-stream join stores (changelog mode), per-store zips
    appear, left-side counts read identically, and the restarted join
    still matches buffered rows on new right-side input."""
    import datetime as _dt
    import glob

    from pyspark.sql import types as T

    from bravo_spark.sources import spark_state as ss

    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        inp_l = str(tmp_path / "left")
        inp_r = str(tmp_path / "right")
        ckpt = str(tmp_path / "ckpt")
        outdir = str(tmp_path / "out")
        t0 = _dt.datetime(2030, 1, 1, 10, 0, 0)
        spark.createDataFrame(
            [(1, t0), (2, t0)], "uid long, lts timestamp"
        ).coalesce(1).write.parquet(inp_l)
        spark.createDataFrame(
            [(1, t0 + _dt.timedelta(minutes=1))], "r_uid long, rts timestamp"
        ).coalesce(1).write.parquet(inp_r)

        def run():
            left = (
                spark.readStream.schema("uid long, lts timestamp")
                .parquet(inp_l).withWatermark("lts", "10 minutes")
            )
            right = (
                spark.readStream.schema("r_uid long, rts timestamp")
                .parquet(inp_r).withWatermark("rts", "10 minutes")
            )
            j = left.join(
                right,
                (F.col("uid") == F.col("r_uid"))
                & (F.col("rts") >= F.col("lts"))
                & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 5 MINUTES")),
            )
            q = (
                j.writeStream.format("parquet")
                .outputMode("append")
                .option("path", outdir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return {
                (r["uid"], r["rts"])
                for r in spark.read.parquet(outdir).collect()
            }

        assert run() == {(1, t0 + _dt.timedelta(minutes=1))}

        names = ss.list_store_names(ckpt)
        assert len(names) == 4
        counts_key = T.StructType([T.StructField("uid", T.LongType())])
        counts_val = T.StructType([T.StructField("count", T.LongType())])

        def left_counts():
            return {
                r["uid"]: r["count"]
                for r in rs.read_rocksdb_spark_state(
                    spark, ckpt, store_name="left-keyToNumValues",
                    key_schema=counts_key, value_schema=counts_val,
                ).collect()
            }

        before = left_counts()
        assert before == {1: 1, 2: 1}
        for name in names:
            ver = rs.compact_rocksdb_checkpoint(spark, ckpt, store_name=name)
            assert glob.glob(f"{ckpt}/state/0/[0-9]*/{name}/{ver}.zip"), name
        assert left_counts() == before

        spark.createDataFrame(
            [(2, t0 + _dt.timedelta(minutes=2))], "r_uid long, rts timestamp"
        ).coalesce(1).write.mode("append").parquet(inp_r)
        assert run() == {
            (1, t0 + _dt.timedelta(minutes=1)),
            (2, t0 + _dt.timedelta(minutes=2)),
        }
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_audit_reports_corrupt_zip_instead_of_crashing(spark, tmp_path):
    """A torn snapshot zip must surface as a corrupt_snapshot finding —
    the auditor cannot crash on the defect it exists to find."""
    from bravo_spark import maintenance as mt

    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        import glob

        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        _run_agg(spark, inp, ckpt)
        rs.compact_rocksdb_checkpoint(spark, ckpt)

        victim = sorted(glob.glob(f"{ckpt}/state/0/*/1.zip"))[0]
        with open(victim, "r+b") as f:
            f.truncate(10)  # torn write
        rows = mt.audit_checkpoint(spark, ckpt).collect()
        corrupt = [r for r in rows if r["check"] == "corrupt_snapshot"]
        assert corrupt and corrupt[0]["severity"] == "error"
        assert "version 1 zip unreadable" in corrupt[0]["detail"]
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(cl, "false")


def test_audit_sidecar_crc_mismatch_rocksdb(spark, tmp_path):
    """sidecar_crc_mismatch on the RocksDB provider: tamper a version
    zip's bytes without refreshing its ChecksumCheckpointFileManager
    sidecar — audit reports it; refreshing the sidecar clears it."""
    from bravo_spark import maintenance as mt
    from bravo_spark.sources.spark_state import _finalize_state_file

    prop = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        import glob

        inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", 1)], "k string, v int"
        ).coalesce(1).write.parquet(inp)
        _run_agg(spark, inp, ckpt)

        assert mt.audit_checkpoint(spark, ckpt).count() == 0

        zips = [
            z for z in sorted(glob.glob(f"{ckpt}/state/0/0/*.zip"))
            if os.path.exists(z + ".crc")
        ]
        assert zips, "no zip sidecars written — check provider config"
        with open(zips[0], "ab") as f:
            f.write(b"\x00")
        rows = mt.audit_checkpoint(spark, ckpt).collect()
        hits = [r for r in rows if r["check"] == "sidecar_crc_mismatch"]
        assert hits and os.path.basename(zips[0]) in hits[0]["detail"]
        # NOTE the tampered zip is still a VALID zip (trailing junk is
        # ignored by the central-directory parser), so corrupt_snapshot
        # stays silent — the sidecar check is what catches this class
        _finalize_state_file(zips[0])
        assert not [
            r for r in mt.audit_checkpoint(spark, ckpt).collect()
            if r["check"] == "sidecar_crc_mismatch"
        ]
    finally:
        spark.conf.set(
            prop,
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
