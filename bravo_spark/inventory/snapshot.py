"""Snapshot-path queries: the binary codec/source/sink exercised end-to-end
inside an oracle-checked query.

``snapshot_roundtrip`` encodes per-key counts into Flink-format state rows
(P9), writes a savepoint (S7/S8), reads it back (S2/S3/S5) and decodes (P1)
— the identity transform — so the DuckDB oracle is simply the grouped count.
Any byte-level asymmetry in the codec/writer/reader breaks the hash match.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.codecs import flink as fc
from bravo_spark.inventory.registry import query
from bravo_spark.sources import savepoint as sp
from bravo_spark.sources import staterows as sr


@query(
    "snapshot_roundtrip",
    oracle="SELECT user_id AS key, count(*) AS value FROM events GROUP BY user_id",
)
def snapshot_roundtrip(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    counts = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count("*").alias("value")
    )
    rows = sr.kv_to_state_rows(counts, "Count", fc.LONG, fc.LONG, max_parallelism=128)
    out = os.path.join(
        tempfile.gettempdir(), f"bravo_snapshot_rt_{os.getpid()}"
    )
    shutil.rmtree(out, ignore_errors=True)
    sp.write_savepoint(
        rows, out, max_parallelism=128, parallelism=4, state_ids={"Count": 0}
    )
    # fused scan+decode (S2+P1 in one hop, like the reference's readers)
    return sp.read_savepoint_kv(spark, out, "Count", fc.LONG, fc.LONG)


@query(
    "snapshot_state_filter",
    oracle=(
        "SELECT user_id AS key, count(*) AS value FROM events"
        " WHERE event_type = 'click' GROUP BY user_id"
    ),
)
def snapshot_state_filter(spark, sf_dir):
    """Two states written; pushdown (F1) reads only one back."""
    ev = catalog.table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count("*").alias("value"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count("*").alias("value"))
    )
    rows = sr.kv_to_state_rows(clicks, "clicks", fc.LONG, fc.LONG).unionByName(
        sr.kv_to_state_rows(views, "views", fc.LONG, fc.LONG)
    )
    out = os.path.join(tempfile.gettempdir(), f"bravo_snapshot_sf_{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    sp.write_savepoint(
        rows, out, max_parallelism=128, parallelism=4,
        state_ids={"clicks": 0, "views": 1},
    )
    return sp.read_savepoint_kv(spark, out, "clicks", fc.LONG, fc.LONG)
