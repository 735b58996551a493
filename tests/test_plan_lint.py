"""plan_lint: each check triggered by a plan constructed to exhibit it,
and a clean plan produces no errors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bravo_spark.plan_lint import assert_scale_safe, lint_plan


def _checks(df):
    return {f.check: f.severity for f in lint_plan(df)}


def test_clean_plan_is_quiet(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = docs.where(F.col("doc_id") > 10).groupBy("source").count()
    found = _checks(agg)
    assert not any(s == "error" for s in found.values()), found
    assert_scale_safe(agg)  # must not raise


def test_cartesian_product_is_error(spark):
    # both sides must exceed the auto-broadcast threshold or Spark plans
    # the cross as a BroadcastNestedLoopJoin instead; lint only inspects
    # the plan, so the big ranges are never executed
    a = spark.range(50_000_000)  # 400 MB by Range stats > 64 MB threshold
    b = spark.range(50_000_000).withColumnRenamed("id", "id2")
    cross = a.crossJoin(b)
    found = _checks(cross)
    assert found.get("cartesian_product") == "error"
    with pytest.raises(AssertionError, match="cartesian_product"):
        assert_scale_safe(cross)
    # explicit allow-list lets a deliberate tiny cross through
    assert_scale_safe(cross, allow={"cartesian_product"})


def test_row_udf_is_error_and_pandas_udf_is_info(spark):
    from pyspark.sql.types import LongType

    df = spark.range(100)
    slow = df.select(F.udf(lambda x: x + 1, LongType())("id").alias("y"))
    assert _checks(slow).get("python_row_udf") == "error"

    from pyspark.sql.functions import pandas_udf

    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which the decorator signature-inference path rejects
    inc = pandas_udf(lambda s: s + 1, LongType())
    fast = df.select(inc("id").alias("y"))
    found = _checks(fast)
    assert "python_row_udf" not in found
    assert found.get("python_arrow_stage") == "info"
    assert_scale_safe(fast)


def test_single_partition_and_hint_findings(spark):
    df = spark.range(1000).withColumn("g", F.col("id") % 7)
    global_sort = df.orderBy("id").withColumn(
        "rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .orderBy("id")
        )
    )
    assert _checks(global_sort).get("single_partition_exchange") == "warn"

    hinted = df.join(F.broadcast(spark.range(7).withColumnRenamed("id", "g")), "g")
    assert _checks(hinted).get("broadcast_hint") == "info"


def test_unpushed_filter_is_info(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # coalesce blocks even the null-intolerance inference, so NOTHING
    # reaches the scan — the case the info exists for
    blocked = docs.where(F.coalesce(F.length("text") % 7, F.lit(0)) == 3)
    assert _checks(blocked).get("unpushed_scan_filter") == "info"
    # a plain comparison pushes (plus inferred IsNotNull) — quiet
    plain = docs.where(F.col("doc_id") > 10)
    assert "unpushed_scan_filter" not in _checks(plain)


# Queries whose CONSTRUCTION runs work (streaming lifecycles, state
# surgery, iterative driver loops, index writes) — linting them would
# execute the side effect; their plan properties are pinned individually
# in tests/test_plans.py where applicable.
_SIDE_EFFECTFUL_MARKERS = (
    "streaming", "rewrite", "rewind", "state_diff", "state_read",
    "state_migration", "savepoint_diff", "rescale", "lloyd", "bpe_train",
    "pagerank", "dedup_clusters", "dedup_semantic", "ivf_index_search",
    "write_roundtrip", "sink",
    # r17 registrations: construction writes a fixture / persists an
    # index or LM / runs a streaming drain before the returned plan
    "ingest", "index_stats", "persist",
)


def test_gate_window_has_no_lint_errors(spark, sf_dir):
    """Standing net: every side-effect-free gate query's plan must lint
    clean of ERROR findings (CartesianProduct, row-at-a-time Python
    UDFs). A future registration that reintroduces either fails here
    without needing a bespoke pin. (Warn-level findings are deliberate
    in places — k-row centroid broadcasts, bounded top-k funnels — and
    stay a judgment call, not a gate.)"""
    import __spark_entry__ as e
    from bravo_spark.inventory.registry import GATE_PRIORITY

    qs = e.queries()
    bad = {}
    for name in GATE_PRIORITY:
        if any(m in name for m in _SIDE_EFFECTFUL_MARKERS):
            continue
        errors = [
            f for f in lint_plan(qs[name](spark, sf_dir))
            if f.severity == "error"
        ]
        if errors:
            bad[name] = [f.check for f in errors]
    assert not bad, f"gate queries with lint errors: {bad}"
