"""The composed nightly-pipeline query: one keep/drop decision per document
with a full audit trail of WHY — the end-to-end shape a production
training-data pipeline actually ships, assembled from the engine's proven
components rather than re-implemented:

- ``url_dup``       — not the minimum-id holder of its canonical-URL group
                      (the FIRST stage of a CCNet/RefinedWeb-shaped crawl
                      pipeline: a crawler revisits the same page under
                      scheme/host/tracking-param variants, so URL-level
                      dedup runs before any content pass; r18, composing
                      llmops.canonicalize_urls)
- ``exact_dup``     — not the minimum-id holder of its identical-text group
- ``near_dup``      — in a MinHash-LSH cluster, not its representative
- ``low_quality``   — fails the Gopher/C4 rule set (quality_filter_pipeline)
- ``contaminated``  — shares a 4-gram with the eval slice (doc_id % 97 = 0)
- ``keep``          — a training doc with none of the above

Every component keeps its own scale shape (digest groupBy, band-bucket
join + O(log n) contraction, pure scan+project rules, broadcast eval
shingles); the composition only adds doc_id-keyed joins of doc-count-sized
flag relations. The oracle recomputes the whole decision in one SQL
statement — the recursive-CTE cluster labels included — so the pipeline's
end-to-end agreement is hash-checked, not just each stage's.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.dedup import (
    _DECON_N,
    _DECON_ORACLE,
    _URL_CANON_SQL,
    _cluster_cte_sql,
    _messy_url_col,
    dedup_minhash_lsh,
)
from bravo_spark.inventory.registry import query
from bravo_spark.inventory.textops import _quality_filter_sql


def _pipeline_oracle() -> str:
    return f"""
WITH RECURSIVE {_cluster_cte_sql()},
exact AS (
  SELECT doc_id, CASE WHEN doc_id <> min_id THEN 1 ELSE 0 END AS exact_dup
  FROM (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(lower(text)))
        AS min_id FROM documents) t
),
urld AS (
  SELECT doc_id,
    CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY canonical_url)
         THEN 1 ELSE 0 END AS url_dup
  FROM ({_URL_CANON_SQL}) uc
),
qual AS (SELECT doc_id, kept FROM ({_quality_filter_sql('duckdb')}) q),
decon AS (SELECT doc_id FROM ({_DECON_ORACLE}) dd)
SELECT d.doc_id,
  CASE WHEN d.doc_id % 97 = 0 THEN 1 ELSE 0 END AS is_eval,
  u.url_dup,
  e.exact_dup,
  CASE WHEN cl.doc_id IS NOT NULL AND cl.doc_id <> cl.cluster_id
       THEN 1 ELSE 0 END AS near_dup,
  CASE WHEN q.kept = 0 THEN 1 ELSE 0 END AS low_quality,
  CASE WHEN dc.doc_id IS NOT NULL THEN 1 ELSE 0 END AS contaminated,
  CASE WHEN d.doc_id % 97 <> 0 AND u.url_dup = 0 AND e.exact_dup = 0
        AND (cl.doc_id IS NULL OR cl.doc_id = cl.cluster_id)
        AND q.kept = 1 AND dc.doc_id IS NULL
       THEN 1 ELSE 0 END AS keep
FROM documents d
JOIN urld u USING (doc_id)
JOIN exact e USING (doc_id)
LEFT JOIN cl ON d.doc_id = cl.doc_id
JOIN qual q USING (doc_id)
LEFT JOIN decon dc ON d.doc_id = dc.doc_id
"""


@query("pipeline_clean_corpus", oracle=_pipeline_oracle())
def pipeline_clean_corpus(spark, sf_dir):
    """Per-document keep/drop with audit flags, composed from the engine's
    URL-dedup/dedup/quality/decontamination components. Stage order
    mirrors a production crawl pipeline: URL-level dedup first (cheapest
    key, collapses refetches before any content pass), then content
    dedup, quality, decontamination."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")

    # URL stage: synthesize the messy variants (documents carries no URL
    # column), canonicalize with the REAL canonicalizer, flag non-min
    # holders per canonical group — map-only Arrow batches + one shuffle
    # on the canonical string
    with_urls = docs.select("doc_id", _messy_url_col().alias("url"))
    urld = llmops.canonicalize_urls(with_urls, "url").select(
        "doc_id",
        F.when(
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy("canonical_url")),
            1,
        )
        .otherwise(0)
        .alias("url_dup"),
    )

    exact = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy(F.md5(F.lower("text")))),
            1,
        )
        .otherwise(0)
        .alias("exact_dup"),
    )

    pairs = dedup_minhash_lsh(spark, sf_dir)
    cl = llmops.connected_components(pairs).select(
        F.col("doc_id"), F.col("cluster_id")
    )

    qual = spark.sql(_quality_filter_sql("spark")).select("doc_id", "kept")

    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    decon = llmops.decontaminate(tr, ev, "doc_id", "text", n=_DECON_N).select(
        F.col("doc_id").alias("__dc_id"), F.lit(1).alias("__dc")
    )

    out = (
        docs.select("doc_id")
        .join(urld, "doc_id")
        .join(exact, "doc_id")
        .join(cl, "doc_id", "left")
        .join(qual, "doc_id")
        .join(decon, F.col("doc_id") == F.col("__dc_id"), "left")
    )
    near = F.when(
        F.col("cluster_id").isNotNull()
        & (F.col("doc_id") != F.col("cluster_id")),
        1,
    ).otherwise(0)
    keep = F.when(
        (F.col("doc_id") % 97 != 0)
        & (F.col("url_dup") == 0)
        & (F.col("exact_dup") == 0)
        & (F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id")))
        & (F.col("kept") == 1)
        & F.col("__dc").isNull(),
        1,
    ).otherwise(0)
    return out.select(
        "doc_id",
        F.when(F.col("doc_id") % 97 == 0, 1).otherwise(0).alias("is_eval"),
        "url_dup",
        "exact_dup",
        near.alias("near_dup"),
        F.when(F.col("kept") == 0, 1).otherwise(0).alias("low_quality"),
        F.when(F.col("__dc").isNotNull(), 1).otherwise(0).alias("contaminated"),
        keep.alias("keep"),
    )
