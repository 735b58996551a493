"""Structured Streaming operators (SURVEY.md §2.10).

The reference is batch-over-frozen-snapshots, so streaming appears only as
state layouts it parses; our engine adds the live-path equivalents with
Spark Structured Streaming. ``streaming_window_counts`` runs a real
streaming query (file source → event-time tumbling window agg → memory
sink) with an availableNow trigger, so it terminates deterministically and
its complete-mode output equals the batch computation — which is exactly
what the DuckDB oracle computes.

At scale: the same query with ``writeStream.trigger(processingTime=...)``
against an object-store directory is the production shape; watermarking
(commented at the agg) bounds state for append-mode sinks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from bravo_spark import catalog

from bravo_spark.inventory.registry import query


@query(
    "streaming_window_counts",
    oracle=(
        "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,"
        " event_type, count(*) AS cnt,"
        " CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value"
        " FROM events GROUP BY 1, 2"
    ),
)
def streaming_window_counts(spark, sf_dir):
    static = catalog.table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    stream = (
        spark.readStream.schema(raw_schema)
        # file stream source needs a directory: stream the sf dir, select
        # the events table by glob
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream
        # production shape would add: .withWatermark("ts", "1 hour")
        # (complete-mode memory sink here needs no watermark and keeps the
        # output equal to the batch computation)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    _ = static  # catalog registration side effect retained
    return spark.table(name)
