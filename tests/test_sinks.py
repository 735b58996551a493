"""Dataset sink path: partitioned parquet output — the training-pipeline
write shape (partition pruning on read, bounded file sizes)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bravo_spark import catalog


def test_partitioned_parquet_roundtrip(spark, tmp_path, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    out = str(tmp_path / "by_lang")
    (
        docs.repartition("lang")  # one task per partition value → few files
        .write.partitionBy("lang")
        .option("maxRecordsPerFile", 10_000)
        .parquet(out)
    )
    # physical layout: one directory per language
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    src_langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert langs == src_langs

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    # partition pruning: a lang filter must scan only that partition
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()
    # the scan's partition filters mention lang (pruning, not a data filter)
    assert "lang" in plan
