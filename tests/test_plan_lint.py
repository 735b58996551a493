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
