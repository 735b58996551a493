"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bravo_spark`` (see SURVEY.md §2 for the
operator inventory each query maps to).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The bravo-shaped workflow (ValueStateTransformationTest.java:55-100):
    model ``events`` as keyed value state (key=user_id), compute per-key
    counts (the StatefulCounter semantic), join-enrich against a lookup
    (deltas pattern) — scan → filter → project → aggregate → broadcast join.
    """
    from bravo_spark.inventory import QUERIES

    return QUERIES["join_enrich"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions,
    ordered so the correctness gate's checked window covers every §2 row
    and every flagship extension first (registry.GATE_PRIORITY)."""
    from bravo_spark.inventory import QUERIES
    from bravo_spark.inventory.registry import gate_ordered

    return gate_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    from bravo_spark.inventory import ORACLES
    from bravo_spark.inventory.registry import gate_ordered

    return gate_ordered(ORACLES)
