"""Spark state-store queries: read and rewrite Structured Streaming state.

The reference's whole purpose is operating on a streaming engine's
checkpointed state from the outside (reference README.md:7-24 — read a
Flink savepoint as a dataset, patch it, write a valid savepoint back).
These queries prove the same capability against Spark's OWN state backend
(sources/spark_state.py): run a real streaming aggregation, then

- ``spark_state_read``: parse the HDFSBackedStateStoreProvider files
  ourselves (snappy/lz4 framing, UnsafeRow codec) and show the decoded
  state equals the batch aggregation — the oracle computes exactly that;
- ``spark_state_rewrite``: patch the state like a bravo user would (drop a
  poisoned key, adjust counters), write spec-valid delta files back with
  Spark's own key→partition routing, and re-read them; the oracle applies
  the same patch to the batch aggregation.

``tests/test_spark_state.py`` goes one step further and RESTARTS a real
streaming query on rewritten files — the end-to-end proof the bytes are
Spark-compatible.

Scale: the streaming agg shuffles once on the grouping key; the state scan
is one task per state partition touching only that partition's files
(exactly the store's own layout); the rewrite shuffles once on the store's
``pmod(hash(key), n)`` routing.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.registry import query
from bravo_spark.sources.spark_state import read_spark_state, write_spark_state


def _run_streaming_agg(spark, sf_dir: str) -> str:
    """Run a per-event-type streaming aggregation to a fresh checkpoint and
    return the checkpoint dir. count(*) and sum(floor(value)) keep the agg
    buffers integer-typed, so state values are deterministic across engines
    (float sums are order-dependent; see the decimal trick elsewhere)."""
    from bravo_spark.inventory.scratch import (
        register_for_exit,
        stream_state_partitions,
    )

    ckpt = register_for_exit(tempfile.mkdtemp(prefix="bravo_spark_state_"))
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.floor("value").cast("long")).alias("sum_floor"),
    )
    name = f"state_agg_{uuid.uuid4().hex[:8]}"
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return ckpt


def _renamed_state(spark, ckpt: str):
    """State DataFrame with stable output names (the store's own value
    attribute names are internal), plus the raw frame for write-back."""
    st = read_spark_state(spark, ckpt)
    raw_cols = st.columns  # [partition_id, <key>, <cnt buf>, <sum buf>]
    out = st.select(
        F.col(raw_cols[1]).alias("event_type"),
        F.col(raw_cols[2]).alias("cnt"),
        F.col(raw_cols[3]).alias("sum_floor"),
    )
    return st, out


@query(
    "spark_state_read",
    oracle=(
        "SELECT event_type, count(*) AS cnt,"
        " CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor"
        " FROM events GROUP BY 1"
    ),
)
def spark_state_read(spark, sf_dir):
    ckpt = _run_streaming_agg(spark, sf_dir)
    _, out = _renamed_state(spark, ckpt)
    return out


@query(
    "spark_state_rewrite",
    oracle=(
        "SELECT event_type, count(*) + 1000 AS cnt,"
        " CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor"
        " FROM events WHERE event_type <> 'click' GROUP BY 1"
    ),
)
def spark_state_rewrite(spark, sf_dir):
    ckpt = _run_streaming_agg(spark, sf_dir)
    st, _ = _renamed_state(spark, ckpt)
    key_col, cnt_col = st.columns[1], st.columns[2]
    patched = st.drop("partition_id").where(F.col(key_col) != "click").withColumn(
        cnt_col, F.col(cnt_col) + F.lit(1000)
    )
    write_spark_state(spark, ckpt, patched)
    _, out = _renamed_state(spark, ckpt)
    return out


def _run_streaming_agg_rocksdb(spark, sf_dir: str) -> str:
    """Same aggregation as ``_run_streaming_agg`` but checkpointed through
    Spark's RocksDBStateStoreProvider — the state lands as REAL
    rocksdbjni-written SST files inside per-partition zips."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(prop, None)
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        return _run_streaming_agg(spark, sf_dir)
    finally:
        if old is None:
            spark.conf.unset(prop)
        else:
            spark.conf.set(prop, old)


@query(
    "rocksdb_state_read",
    oracle=(
        "SELECT event_type, count(*) AS cnt,"
        " CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor"
        " FROM events GROUP BY 1"
    ),
)
def rocksdb_state_read(spark, sf_dir):
    """State surgery read against Spark's RocksDB provider: the checkpoint
    is genuine rocksdbjni output (modern format_version 6 SSTs), parsed by
    the pure-Python SST reader + UnsafeRow decoder — the same decode chain
    a Flink RocksDB savepoint takes through sources/checkpoint.py."""
    from bravo_spark.sources.rocksdb_state import read_rocksdb_spark_state

    ckpt = _run_streaming_agg_rocksdb(spark, sf_dir)
    st = read_rocksdb_spark_state(spark, ckpt)
    raw_cols = st.columns
    return st.select(
        F.col(raw_cols[1]).alias("event_type"),
        F.col(raw_cols[2]).alias("cnt"),
        F.col(raw_cols[3]).alias("sum_floor"),
    )


def _run_streaming_agg_rocksdb_changelog(spark, sf_dir: str) -> str:
    """RocksDB provider WITH changelog checkpointing — the mode whose
    committed versions this module can rewrite."""
    prop = "spark.sql.streaming.stateStore.providerClass"
    cl = (
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled"
    )
    old_p = spark.conf.get(prop, None)
    old_c = spark.conf.get(cl, None)
    spark.conf.set(
        prop,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set(cl, "true")
    try:
        return _run_streaming_agg(spark, sf_dir)
    finally:
        for k, old in ((prop, old_p), (cl, old_c)):
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


@query(
    "rocksdb_state_rewrite",
    oracle=(
        "SELECT event_type, count(*) + 1000 AS cnt,"
        " CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor"
        " FROM events WHERE event_type <> 'click' GROUP BY 1"
    ),
)
def rocksdb_state_rewrite(spark, sf_dir):
    """State surgery WRITE against Spark's RocksDB provider (changelog
    checkpointing): patch the aggregation state — drop a key, bump the
    counters — rewrite the committed version's changelog with tombstone
    semantics mirrored from the HDFS writer, and re-read it through the
    SST+changelog replay chain. ``tests/test_rocksdb_state.py`` restarts
    the real query on the rewritten changelog for the end-to-end proof."""
    from bravo_spark.sources.rocksdb_state import (
        read_rocksdb_spark_state,
        write_rocksdb_spark_state,
    )

    ckpt = _run_streaming_agg_rocksdb_changelog(spark, sf_dir)
    st = read_rocksdb_spark_state(spark, ckpt)
    key_col, cnt_col = st.columns[1], st.columns[2]
    patched = (
        st.drop("partition_id")
        .where(F.col(key_col) != "click")
        .withColumn(cnt_col, F.col(cnt_col) + F.lit(1000))
    )
    write_rocksdb_spark_state(spark, ckpt, patched)
    out = read_rocksdb_spark_state(spark, ckpt)
    return out.select(
        F.col(out.columns[1]).alias("event_type"),
        F.col(out.columns[2]).alias("cnt"),
        F.col(out.columns[3]).alias("sum_floor"),
    )


def _run_agg_over(spark, df_writer, inp, ckpt):
    """Append ``df_writer``'s parquet to ``inp`` then run the streaming agg
    batch against ``ckpt``."""
    import uuid as _uuid

    from bravo_spark.inventory.scratch import stream_state_partitions

    agg_schema = (
        "event_type string, user_id long, value double"
    )
    stream = (
        spark.readStream.schema(agg_schema).parquet(inp)
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.floor("value").cast("long")).alias("sum_floor"),
    )
    name = f"rw_{_uuid.uuid4().hex[:8]}"
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(name)


def _rewind_workdir(tag: str) -> str:
    """pid-named work dir for the rewind queries — cleared at allocation
    and removed at process exit, like the snapshot.py fixtures."""
    import os

    from bravo_spark.inventory.scratch import scratch_dir

    work = scratch_dir(tag)
    os.makedirs(os.path.join(work, "in"))
    return work


def _land_batch(work: str, df, name: str) -> None:
    """Materialize a batch as a single parquet FILE directly under the
    input dir — the file stream source lists only the top level, so a
    nested dir (or multiple part files) would not be one ingestible file."""
    import glob
    import os
    import shutil

    tmp = os.path.join(work, f"stage_{name}")
    df.coalesce(1).write.parquet(tmp)
    shutil.copyfile(
        glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
        os.path.join(work, "in", name),
    )
    shutil.rmtree(tmp)


@query(
    "checkpoint_rewind",
    oracle=(
        "SELECT event_type, count(*) AS cnt,"
        " CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor"
        " FROM events GROUP BY 1"
    ),
)
def checkpoint_rewind(spark, sf_dir):
    """Undo-a-poisoned-batch surgery: batch 0 aggregates the even events;
    batch 1 ingests poison (value×1000); ``rewind_checkpoint`` truncates
    the offsets/commits/seen-files logs back to batch 0; the poison file is
    replaced by the true odd half and the query restarted. The final state
    must equal the clean full-events aggregation — which is exactly what
    the oracle computes. Proves log-surgery correctness end-to-end against
    Spark's own replay machinery."""
    import os

    from bravo_spark.sources.spark_state import rewind_checkpoint

    ev = catalog.table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    work = _rewind_workdir("rewind")
    inp = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    even = ev.filter(F.col("user_id") % 2 == 0)
    odd = ev.filter(F.col("user_id") % 2 == 1)

    _land_batch(work, even, "b0.parquet")
    _run_agg_over(spark, None, inp, ckpt)

    _land_batch(work, odd.withColumn("value", F.col("value") * 1000), "b1.parquet")
    _run_agg_over(spark, None, inp, ckpt)

    rewind_checkpoint(ckpt, 0)
    os.remove(os.path.join(inp, "b1.parquet"))
    _land_batch(work, odd, "b1.parquet")
    out = _run_agg_over(spark, None, inp, ckpt)
    return out.select("event_type", "cnt", "sum_floor")


@query(
    "file_sink_rewind",
    oracle="SELECT event_type, count(*) AS cnt FROM events GROUP BY 1",
)
def file_sink_rewind(spark, sf_dir):
    """Poisoned-batch undo with an exactly-once FILE SINK: batch 0 streams
    the even half into a parquet sink, batch 1 a poisoned odd half (rows
    duplicated); ``rewind_checkpoint`` + ``rewind_file_sink`` reset BOTH
    sides' logs to batch 0 (the sink's _spark_metadata de-lists and
    deletes the bad part files), the input is fixed, and the restarted
    query appends the clean odd half. The final log-aware read of the
    output dir must equal the clean per-type counts — a stale sink entry
    would double-count the undone batch, over-deletion would lose the
    committed one."""
    import os

    from bravo_spark.sources.spark_state import (
        rewind_checkpoint,
        rewind_file_sink,
    )

    ev = catalog.table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    work = _rewind_workdir("sink_rewind")
    inp = os.path.join(work, "in")
    outp = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    even = ev.filter(F.col("user_id") % 2 == 0)
    odd = ev.filter(F.col("user_id") % 2 == 1)

    def run_batch():
        schema = spark.read.parquet(inp).schema
        q = (
            spark.readStream.schema(schema)
            .parquet(inp)
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _land_batch(work, even, "b0.parquet")
    run_batch()
    _land_batch(work, odd.unionByName(odd), "b1.parquet")  # poison: doubled
    run_batch()

    rewind_checkpoint(ckpt, 0)
    rewind_file_sink(outp, 0)
    os.remove(os.path.join(inp, "b1.parquet"))
    _land_batch(work, odd, "b1.parquet")
    run_batch()
    return (
        spark.read.parquet(outp)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


_NESTED_REWRITE_ORACLE = """
SELECT k,
       CASE WHEN k % 2 = 0 THEN cnt_all + 1 ELSE cnt_odd END AS cnt,
       CAST(CASE WHEN k % 2 = 0 THEN sum_all - 1 ELSE sum_odd END
            AS BIGINT) AS seen_sum,
       CASE WHEN k % 2 = 0 THEN -1 ELSE min_odd END AS seen_min
FROM (
  SELECT user_id % 7 AS k,
         count(*) AS cnt_all,
         sum(event_id) AS sum_all,
         count(*) FILTER (WHERE event_id % 2 = 1) AS cnt_odd,
         sum(event_id) FILTER (WHERE event_id % 2 = 1) AS sum_odd,
         min(event_id) FILTER (WHERE event_id % 2 = 1) AS min_odd
  FROM events GROUP BY 1
) WHERE k % 2 = 0 OR cnt_odd > 0
"""


@query("nested_state_rewrite", oracle=_NESTED_REWRITE_ORACLE)
def nested_state_rewrite(spark, sf_dir):
    """NESTED-state surgery, oracle-checked end to end (r13): an
    ``applyInPandasWithState`` query keeps per-key state ``(seen
    array<long>, cnt long)`` — which Spark stores as a nested STRUCT value
    column — over the even-event_id half of ``events``; the state is then
    patched OUTSIDE the query (odd keys tombstoned, a ``-1`` sentinel
    inserted into every surviving key's array, inside the nested struct),
    rewritten with ``write_spark_state``, and the REAL query restarted on
    the odd half. The final state projects to scalars (cnt, array sum,
    array min), so the DuckDB oracle can state the outcome exactly: even
    keys carry all their events plus the sentinel; odd keys carry only
    the odd half (their patched-away state never existed at restart).

    This is the driver-level proof of the r13 nested UnsafeRow codec
    (arrays/maps/structs/decimals) — the pytest twins pin the byte layout
    against Spark's own UnsafeProjection/getters; this query pins the
    whole surgery loop against Spark's replay machinery with an
    independent SQL oracle.

    Scale: identical posture to ``checkpoint_rewind`` — the streaming agg
    shuffles once on the key; the state scan/rewrite is one task per
    state partition; the patch is a pure DataFrame transform on the
    nested column (JVM ``withField``/``concat``, no Python row work)."""
    import os

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = catalog.table(spark, sf_dir, "events").select(
        (F.col("user_id") % 7).alias("k"), F.col("event_id").alias("v")
    )
    work = _rewind_workdir("nested_rw")
    inp = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")

    def accumulate(key, pdf_iter, state):
        seen = list(state.get[0]) if state.exists else []
        for pdf in pdf_iter:
            seen.extend(int(x) for x in pdf["v"])
        seen.sort()  # order-insensitive state: batch arrival order varies
        state.update((seen, len(seen)))
        yield pd.DataFrame({"k": [key[0]], "n": [len(seen)]})

    def run_batch():
        from bravo_spark.inventory.scratch import stream_state_partitions

        schema = "k long, v long"
        stream = spark.readStream.schema(schema).parquet(inp)
        out = stream.groupBy("k").applyInPandasWithState(
            accumulate, "k long, n long", "seen array<long>, cnt long",
            "update", GroupStateTimeout.NoTimeout,
        )
        with stream_state_partitions(spark):
            q = (
                out.writeStream.foreachBatch(lambda df, _b: df.count())
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

    _land_batch(work, ev.filter(F.col("v") % 2 == 0), "b0.parquet")
    run_batch()

    st = read_spark_state(spark, ckpt)
    patched = (
        st.drop("partition_id")
        .where(F.col("k") % 2 == 0)  # tombstone odd keys
        .withColumn(
            "groupState",
            F.col("groupState").withField(
                "seen",
                F.concat(
                    F.array(F.lit(-1).cast("long")),
                    F.col("groupState.seen"),
                ),
            ).withField("cnt", F.col("groupState.cnt") + 1),
        )
    )
    write_spark_state(spark, ckpt, patched)

    _land_batch(work, ev.filter(F.col("v") % 2 == 1), "b1.parquet")
    run_batch()

    final = read_spark_state(spark, ckpt)
    return final.select(
        "k",
        F.col("groupState.cnt").alias("cnt"),
        F.aggregate(
            "groupState.seen", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("seen_sum"),
        F.array_min("groupState.seen").alias("seen_min"),
    )


_JOIN_STATE_REWRITE_ORACLE = """
WITH l AS (SELECT user_id AS k, event_id AS a FROM events WHERE event_id % 50 = 0),
     r1 AS (SELECT user_id AS k, event_id AS b FROM events WHERE event_id % 100 = 25),
     r2 AS (SELECT user_id AS k, event_id AS b FROM events WHERE event_id % 100 = 75),
     m AS (SELECT l.k, a, b FROM l JOIN r1 ON l.k = r1.k
           UNION ALL
           SELECT l.k, a, b FROM l JOIN r2 ON l.k = r2.k WHERE l.k % 5 <> 0)
SELECT k, count(*) AS pairs,
       CAST(sum(a) AS BIGINT) AS sum_a,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM m GROUP BY k
"""


@query("join_state_rewrite", oracle=_JOIN_STATE_REWRITE_ORACLE)
def join_state_rewrite(spark, sf_dir):
    """Stream-stream JOIN state surgery, oracle-checked end to end: a real
    equi-join of two file streams buffers its left side in the four
    schema-file-less named stores (``left-keyToNumValues``,
    ``left-keyWithIndexToValue``, right twins; the shape the reference
    operates on for Flink two-input operators). After batch 0 (all left
    rows + the first right half), every ``k % 5 == 0`` user's buffered
    left rows are surgically removed from BOTH left stores — coherently,
    counts matching surviving indices — with ``write_spark_state``'s
    named-store write path, and the REAL join restarts on the second
    right half. Batch-0 matches were already emitted, so the oracle is
    exact: all pairs against the first right half, only surviving users'
    pairs against the second.

    ``keyWithIndexToValue`` routes by the join key alone while its store
    key appends the buffer index — ``partition_key_cols`` proves the
    routing contract the restarted join depends on. No watermark: inner
    equi-joins never evict, so streaming equals the batch join exactly.

    Scale: the join shuffles both streams once on the key (Spark's own
    plan); the state scan/rewrite is one task per state partition; the
    surgery predicate is a pure DataFrame filter. Match density is
    bounded by the event_id modulus, not table size squared."""
    import os

    from pyspark.sql import types as T

    ev = catalog.table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_id") % 50 == 0).select(
        F.col("user_id").alias("k"), F.col("event_id").alias("a")
    )
    r1 = ev.filter(F.col("event_id") % 100 == 25).select(
        F.col("user_id").alias("rk"), F.col("event_id").alias("b")
    )
    r2 = ev.filter(F.col("event_id") % 100 == 75).select(
        F.col("user_id").alias("rk"), F.col("event_id").alias("b")
    )

    work = _rewind_workdir("join_rw")
    lin = os.path.join(work, "in")  # left stream dir (pre-made by helper)
    rin = os.path.join(work, "rin")
    outp = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(rin)

    def land(df, dirname, name):
        import glob
        import shutil

        tmp = os.path.join(work, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        shutil.copyfile(
            glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
            os.path.join(dirname, name),
        )
        shutil.rmtree(tmp)

    def run_batch():
        from bravo_spark.inventory.scratch import stream_state_partitions

        ls = spark.readStream.schema("k long, a long").parquet(lin)
        rs = spark.readStream.schema("rk long, b long").parquet(rin)
        j = ls.join(rs, F.col("k") == F.col("rk")).select("k", "a", "b")
        with stream_state_partitions(spark):
            q = (
                j.writeStream.format("parquet")
                .outputMode("append")
                .option("path", outp)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

    land(left, lin, "l0.parquet")
    land(r1, rin, "r0.parquet")
    run_batch()

    counts_key = T.StructType([T.StructField("k", T.LongType())])
    counts_val = T.StructType([T.StructField("count", T.LongType())])
    rows_key = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("index", T.LongType())]
    )
    rows_val = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.LongType()),
            T.StructField("matched", T.BooleanType()),
        ]
    )
    counts = read_spark_state(
        spark, ckpt, store_name="left-keyToNumValues",
        key_schema=counts_key, value_schema=counts_val,
    )
    rows = read_spark_state(
        spark, ckpt, store_name="left-keyWithIndexToValue",
        key_schema=rows_key, value_schema=rows_val,
    )
    write_spark_state(
        spark, ckpt, counts.drop("partition_id").where(F.col("k") % 5 != 0),
        store_name="left-keyToNumValues",
        key_schema=counts_key, value_schema=counts_val,
    )
    write_spark_state(
        spark, ckpt, rows.drop("partition_id").where(F.col("k") % 5 != 0),
        store_name="left-keyWithIndexToValue",
        key_schema=rows_key, value_schema=rows_val,
        partition_key_cols=["k"],
    )

    land(r2, rin, "r1.parquet")
    run_batch()

    return (
        spark.read.parquet(outp)
        .groupBy("k")
        .agg(
            F.count("*").alias("pairs"),
            F.sum("a").alias("sum_a"),
            F.sum("b").alias("sum_b"),
        )
    )


_SCHEMA_MIGRATION_ORACLE = """
SELECT user_id % 7 AS k,
       CAST(sum(event_id) AS BIGINT) AS tot,
       CAST((CASE WHEN count(*) FILTER (WHERE event_id % 2 = 0) > 0
                  THEN 1000 ELSE 0 END)
            + count(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT) AS cnt
FROM events GROUP BY 1
"""


@query("state_schema_migration", oracle=_SCHEMA_MIGRATION_ORACLE)
def state_schema_migration(spark, sf_dir):
    """Schema-EVOLUTION surgery, oracle-checked end to end: an
    ``applyInPandasWithState`` query sums values into ``(tot long)`` state
    over the even-event_id half of ``events``; the user then evolves the
    query to ALSO count events — which cold-fails the restart with
    STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE. ``migrate_spark_state_schema``
    rewrites the checkpoint's schema file to the evolved layout and the
    state rows with the new column seeded to 1000 (a sentinel only the
    migration path could produce), and the EVOLVED query restarts on the
    odd half. Final state is exact for the oracle: ``tot`` is the full
    sum either way; ``cnt`` is 1000 + the odd-event count for keys that
    existed at migration, just the odd count otherwise. The Spark analog
    of the reference's X2 type-change migration
    (KeyedStateReader custom deserializers, SURVEY §2.11).

    Scale: identical posture to ``nested_state_rewrite`` — one streaming
    shuffle on the key per batch; schema files are per-store metadata;
    the row migration is ``write_spark_state``'s one task per state
    partition."""
    import os

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bravo_spark.sources.spark_state import (
        migrate_spark_state_schema,
        read_state_schema,
    )

    ev = catalog.table(spark, sf_dir, "events").select(
        (F.col("user_id") % 7).alias("k"), F.col("event_id").alias("v")
    )
    work = _rewind_workdir("schema_mig")
    inp = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")

    def mk_fn(evolved):
        def fn(key, pdf_iter, state):
            if evolved:
                tot, cnt = state.get if state.exists else (0, 0)
            else:
                (tot,) = state.get if state.exists else (0,)
                cnt = 0
            vals = [int(x) for pdf in pdf_iter for x in pdf["v"]]
            tot += sum(vals)
            if evolved:
                cnt += len(vals)
                state.update((tot, cnt))
            else:
                state.update((tot,))
            yield pd.DataFrame({"k": [key[0]], "tot": [tot]})
        return fn

    def run_batch(evolved):
        from bravo_spark.inventory.scratch import stream_state_partitions

        st_schema = "tot long, cnt long" if evolved else "tot long"
        stream = spark.readStream.schema("k long, v long").parquet(inp)
        out = stream.groupBy("k").applyInPandasWithState(
            mk_fn(evolved), "k long, tot long", st_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
        with stream_state_partitions(spark):
            q = (
                out.writeStream.foreachBatch(lambda df, _b: df.count())
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

    _land_batch(work, ev.filter(F.col("v") % 2 == 0), "b0.parquet")
    run_batch(False)

    _old_key, old_val = read_state_schema(ckpt)
    gs = next(f for f in old_val.fields if f.name == "groupState")
    new_gs = T.StructType(
        list(gs.dataType.fields) + [T.StructField("cnt", T.LongType())]
    )
    new_val = T.StructType([
        T.StructField(f.name, new_gs if f.name == "groupState" else f.dataType)
        for f in old_val.fields
    ])
    st = read_spark_state(spark, ckpt)
    migrated = st.drop("partition_id").withColumn(
        "groupState",
        F.struct(
            F.col("groupState.tot").alias("tot"),
            F.lit(1000).cast("long").alias("cnt"),
        ),
    )
    migrate_spark_state_schema(spark, ckpt, migrated, new_value_schema=new_val)

    _land_batch(work, ev.filter(F.col("v") % 2 == 1), "b1.parquet")
    run_batch(True)

    final = read_spark_state(spark, ckpt)
    return final.select(
        "k",
        F.col("groupState.tot").alias("tot"),
        F.col("groupState.cnt").alias("cnt"),
    )


@query(
    "spark_state_diff",
    oracle=(
        "WITH h1 AS (SELECT event_type, count(*) AS c FROM events"
        " WHERE user_id % 2 = 0 GROUP BY 1),"
        " al AS (SELECT event_type, count(*) AS c FROM events GROUP BY 1)"
        " SELECT al.event_type,"
        " CAST(coalesce(h1.c, 0) AS BIGINT) AS cnt_before,"
        " CAST(al.c AS BIGINT) AS cnt_after,"
        " CAST(al.c - coalesce(h1.c, 0) AS BIGINT) AS delta_cnt"
        " FROM al LEFT JOIN h1 ON al.event_type = h1.event_type"
    ),
)
def spark_state_diff(spark, sf_dir):
    """Cross-version state delta on Spark's OWN backend — the twin of
    ``savepoint_diff`` (which diffs two Flink savepoints): run a real
    streaming aggregation over the first half of the events (one
    availableNow lifecycle → state version v1), append the second half
    and continue the same checkpoint (→ v2), then read BOTH committed
    versions of the store and report per-key before/after/delta. This is
    the audit a real operator runs before surgery: what changed between
    two checkpoints of the same query.

    Scale shape: each version read is one task per state partition
    touching only that partition's files; the diff itself is a 1:1
    equi-join on the grouping key (co-partitioned at real scale); the
    only collects are directory handles. The oracle recomputes both
    snapshots from the raw events."""
    import os

    from bravo_spark.inventory.scratch import register_for_exit
    from bravo_spark.sources.spark_state import latest_version

    inp = register_for_exit(tempfile.mkdtemp(prefix="bravo_diff_in_"))
    ckpt = register_for_exit(tempfile.mkdtemp(prefix="bravo_diff_ck_"))
    events = catalog.table(spark, sf_dir, "events")
    half1 = events.where(F.col("user_id") % 2 == 0)
    half2 = events.where(F.col("user_id") % 2 != 0)

    def run_batch(df, mode):
        from bravo_spark.inventory.scratch import stream_state_partitions

        df.write.mode(mode).parquet(inp)
        stream = spark.readStream.schema(events.schema).parquet(inp)
        agg = stream.groupBy("event_type").agg(F.count("*").alias("cnt"))
        with stream_state_partitions(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(f"diff_{uuid.uuid4().hex[:8]}")
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        return latest_version(ckpt)

    v1 = run_batch(half1, "overwrite")
    v2 = run_batch(half2, "append")
    assert v2 > v1, (v1, v2)

    def snap(version):
        st = read_spark_state(spark, ckpt, version=version)
        c = st.columns  # [partition_id, event_type, cnt]
        return st.select(F.col(c[1]).alias("event_type"), F.col(c[2]).alias("cnt"))

    before, after = snap(v1), snap(v2)
    return (
        after.alias("a")
        .join(before.alias("b"), on="event_type", how="left")
        .select(
            "event_type",
            F.coalesce(F.col("b.cnt"), F.lit(0)).cast("long").alias("cnt_before"),
            F.col("a.cnt").cast("long").alias("cnt_after"),
            (F.col("a.cnt") - F.coalesce(F.col("b.cnt"), F.lit(0)))
            .cast("long")
            .alias("delta_cnt"),
        )
    )
