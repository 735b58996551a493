"""Deterministic sampling / splitting / sessionization for training-data
pipelines.

Hash-based sampling is the only kind that survives distribution: it needs no
coordination, no state, re-runs identically on any cluster layout, and
composes with incremental data (a document's split never changes when new
data arrives). All hashes are md5-derived so the DuckDB oracle agrees
bit-for-bit. Sessionization is the canonical per-key stateful operator,
expressed with native window functions (JVM-side, single shuffle on the
session key).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.registry import query


def _h32_spark(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def _h32_duck(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


@query(
    "train_val_split",
    oracle=(
        "SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id"
        " FROM (SELECT doc_id, CASE WHEN"
        f" {_h32_duck('CAST(doc_id AS VARCHAR)')} % 100 < 90"
        " THEN 'train' ELSE 'val' END AS split FROM documents) t GROUP BY split"
    ),
)
def train_val_split(spark, sf_dir):
    """90/10 split keyed on a stable document-id hash — assignment is a
    pure map-side expression; no shuffle until the (tiny) audit aggregate."""
    docs = catalog.table(spark, sf_dir, "documents")
    h = F.expr(_h32_spark("CAST(doc_id AS STRING)"))
    split = F.when(h % 100 < 90, F.lit("train")).otherwise(F.lit("val"))
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@query(
    "hash_sample",
    oracle=(
        "SELECT event_id, user_id FROM events WHERE"
        f" {_h32_duck('CAST(event_id AS VARCHAR)')} % 10000 < 100"
    ),
)
def hash_sample(spark, sf_dir):
    """Deterministic ~1% sample — re-runs and re-partitions identically."""
    ev = catalog.table(spark, sf_dir, "events")
    h = F.expr(_h32_spark("CAST(event_id AS STRING)"))
    return ev.filter(h % 10000 < 100).select("event_id", "user_id")


@query(
    "stratified_sample",
    oracle=(
        "SELECT event_type, count(*) AS n FROM (SELECT event_type FROM events"
        f" WHERE {_h32_duck('CAST(event_id AS VARCHAR)')} % 100 <"
        " CASE event_type WHEN 'purchase' THEN 50 WHEN 'error' THEN 50 ELSE 5 END"
        ") t GROUP BY event_type"
    ),
)
def stratified_sample(spark, sf_dir):
    """Per-stratum rates (oversample rare classes) with the same stable
    hash; rates are a broadcastable CASE, not a join."""
    ev = catalog.table(spark, sf_dir, "events")
    h = F.expr(_h32_spark("CAST(event_id AS STRING)"))
    rate = (
        F.when(F.col("event_type").isin("purchase", "error"), F.lit(50)).otherwise(
            F.lit(5)
        )
    )
    return (
        ev.filter(h % 100 < rate)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "sessionize",
    oracle=(
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id,"
        " count(*) AS n_events,"
        " min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_sec,"
        " max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_sec"
        " FROM ("
        "  SELECT user_id, ts, sum(is_new) OVER ("
        "   PARTITION BY user_id ORDER BY ts, event_id"
        "   ROWS UNBOUNDED PRECEDING) AS session_id"
        "  FROM ("
        "   SELECT user_id, ts, event_id,"
        "    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "     IS NULL OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER ("
        "     PARTITION BY user_id ORDER BY ts, event_id))) > 1800"
        "    THEN 1 ELSE 0 END AS is_new FROM events) g) s"
        " GROUP BY user_id, session_id"
    ),
)
def sessionize(spark, sf_dir):
    """Session windows (30-min gap) as native window functions: one shuffle
    on the session key, lag + running sum — the per-key stateful pattern
    without any Python. (The Structured Streaming equivalent is
    ``session_window(ts, '30 minutes')``.)"""
    ev = catalog.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    gap_new = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (sec - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
            1,
        ).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("is_new", gap_new)
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(sec).alias("start_sec"),
            F.max(sec).alias("end_sec"),
        )
    )


@query(
    "funnel_conversion",
    oracle=(
        "SELECT count(*) AS n_users,"
        " CAST(sum(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END)"
        "  AS BIGINT) AS signed_up,"
        " CAST(sum(CASE WHEN first_signup IS NOT NULL AND"
        "  first_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS converted"
        " FROM ("
        "  SELECT user_id,"
        "   min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,"
        "   min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase"
        "  FROM events GROUP BY user_id) u"
    ),
)
def funnel_conversion(spark, sf_dir):
    """Event-sequence funnel (signup → later purchase): conditional min per
    key, then ordering predicates — one shuffle, no self-join (the naive
    events⋈events formulation would be quadratic per user)."""
    ev = catalog.table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("fs"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("fs").isNotNull(), 1).otherwise(0)).alias("signed_up"),
        F.sum(
            F.when(F.col("fs").isNotNull() & (F.col("fp") > F.col("fs")), 1).otherwise(0)
        ).alias("converted"),
    )


@query(
    "retention_cohorts",
    oracle=(
        "SELECT cohort_day, activity_day, count(DISTINCT user_id) AS active_users"
        " FROM ("
        "  SELECT e.user_id,"
        "   CAST(floor(epoch(date_trunc('day', c.first_ts))) AS BIGINT) AS cohort_day,"
        "   CAST(floor(epoch(date_trunc('day', e.ts))) AS BIGINT) AS activity_day"
        "  FROM events e JOIN ("
        "   SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id) c"
        "  ON e.user_id = c.user_id) t"
        " GROUP BY cohort_day, activity_day"
    ),
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: first-seen day × activity day. The
    first-seen timestamp is a window min over ``user_id`` — ONE shuffle on
    the key and no join at all. (The previous formulation broadcast the
    ``groupBy(user_id).min(ts)`` cohort table back onto the fact scan:
    one row PER USER, i.e. scale-factor-proportional — a forced broadcast
    that hard-fails past Spark's broadcast limit at real corpus scale.)"""
    from pyspark.sql import Window

    ev = catalog.table(spark, sf_dir, "events")
    first_ts = F.min("ts").over(Window.partitionBy("user_id"))
    return ev.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("day", first_ts)).alias("cohort_day"),
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("activity_day"),
    ).groupBy("cohort_day", "activity_day").agg(
        F.count_distinct("user_id").alias("active_users")
    )


@query(
    "per_key_trend",
    oracle=(
        "SELECT user_id, n,"
        " CASE WHEN den = 0 THEN 0.0"
        "  ELSE CAST(num AS DOUBLE) / den END AS slope_cents_per_sec"
        " FROM ("
        "  SELECT user_id, count(*) AS n,"
        "   CAST(count(*) AS BIGINT) * sum(x * y) - sum(x) * sum(y) AS num,"
        "   CAST(count(*) AS BIGINT) * sum(x * x) - sum(x) * sum(x) AS den"
        "  FROM ("
        "   SELECT user_id,"
        "    CAST(floor(epoch(ts)) AS BIGINT) - min(CAST(floor(epoch(ts)) AS BIGINT))"
        "     OVER (PARTITION BY user_id) AS x,"
        "    CAST(round(value * 100) AS BIGINT) AS y"
        "   FROM events) t GROUP BY user_id) s"
    ),
)
def per_key_trend(spark, sf_dir):
    """Per-key OLS slope via ``applyInPandas`` — the batch grouped-UDF
    surface (one shuffle on the key, Arrow batches per group). All sums are
    integers (seconds offset × cents), so pandas and SQL aggregation agree
    exactly; only the final division is float. The closed-form SQL is the
    oracle."""
    import pandas as pd

    ev = catalog.table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = (pdf["sec"] - pdf["sec"].min()).astype("int64")
        y = pdf["cents"].astype("int64")
        n = len(pdf)
        num = int(n * int((x * y).sum()) - int(x.sum()) * int(y.sum()))
        den = int(n * int((x * x).sum()) - int(x.sum()) ** 2)
        s = 0.0 if den == 0 else num / den
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [n],
                "slope_cents_per_sec": [s],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        slope, schema="user_id long, n long, slope_cents_per_sec double"
    )


# ---------------------------------------------------------------------------
# Domain mixture sampling: per-source target rates applied by deterministic
# hash — the "data mixing" step of a training pipeline. Pure map-side row
# assignment (no shuffle); the rate table is a literal CASE, so at 100 TB
# this is a scan that emits the mixed corpus directly.
# ---------------------------------------------------------------------------

_MIX_RATES = [("src0", 10000), ("src1", 5000), ("src2", 2500)]  # per 10k
_MIX_DEFAULT = 1000


def _mix_sql(h32, strtype: str = "VARCHAR") -> str:
    rate = "CASE " + " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES
    ) + f" ELSE {_MIX_DEFAULT} END"
    h = h32(f"concat('mix:', CAST(doc_id AS {strtype}))")
    return (
        "SELECT doc_id, source FROM ("
        f" SELECT doc_id, source, {h} % 10000 AS u, {rate} AS rate"
        " FROM documents) t WHERE u < rate"
    )


@query("domain_mixture_sample", oracle=_mix_sql(_h32_duck))
def domain_mixture_sample(spark, sf_dir):
    """Weighted per-domain downsampling (100% / 50% / 25% / 10% tiers) via
    the shared md5 hash — identical row selection on every engine, rerun,
    and cluster layout."""
    return spark.sql(_mix_sql(_h32_spark, "STRING"))


# ---------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-token-capacity training bins.
# Packing is per-source shard (PARTITION BY source) — the scalable shape:
# a global greedy pack is inherently sequential, while per-shard packing
# parallelizes across shards and is what a real pipeline does anyway. The
# bin id is floor(exclusive-prefix-tokens / capacity): deterministic given
# the (source, doc_id) order, one window + one groupBy shuffle.
# ---------------------------------------------------------------------------

_PACK_CAP = 512


def _pack_sql(dialect: str) -> str:
    if dialect == "duckdb":
        ntok = "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
        bin_id = f"CAST(start_tok // {_PACK_CAP} AS BIGINT)"
    else:
        ntok = "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
        bin_id = f"CAST(start_tok div {_PACK_CAP} AS BIGINT)"
    return (
        "SELECT source, bin_id, count(*) AS n_docs,"
        " CAST(sum(n_tok) AS BIGINT) AS n_tokens,"
        " min(doc_id) AS first_doc, max(doc_id) AS last_doc FROM ("
        f" SELECT source, doc_id, n_tok, {bin_id} AS bin_id FROM ("
        "  SELECT source, doc_id, n_tok,"
        "   CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
        "   AS start_tok"
        f"  FROM (SELECT source, doc_id, {ntok} AS n_tok FROM documents) t) c) b"
        " GROUP BY source, bin_id"
    )


@query("sequence_pack", oracle=_pack_sql("duckdb"))
def sequence_pack(spark, sf_dir):
    """Token-capacity bin assignment for training-sequence packing (512
    tokens per bin, packed per source shard)."""
    return spark.sql(_pack_sql("spark"))


# ---------------------------------------------------------------------------
# Leakage-safe split: train/val assignment by NEAR-DUP CLUSTER, not by
# document — a near-duplicate pair can never straddle the split (the classic
# eval-leakage failure when splitting per-document). Composition of the LSH
# dedup clusters with the deterministic hash split: cluster representatives
# are hashed, singletons hash their own id. All joins are the bucketed LSH
# shapes — no doc² anywhere; the split itself is a map-side expression.
# ---------------------------------------------------------------------------


def _leakage_oracle() -> str:
    from bravo_spark.inventory.dedup import _cluster_cte_sql

    bucket = _h32_duck("CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)")
    return f"""
WITH RECURSIVE {_cluster_cte_sql()}
SELECT d.doc_id,
  coalesce(c.cluster_id, d.doc_id) AS cluster_id,
  CASE WHEN {bucket} % 100 < 90 THEN 'train' ELSE 'val' END AS split
FROM documents d LEFT JOIN cl c USING (doc_id)
"""


@query("leakage_safe_split", oracle=_leakage_oracle())
def leakage_safe_split(spark, sf_dir):
    from bravo_spark import llmops
    from bravo_spark.inventory.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir)
    cc = llmops.connected_components(pairs)
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id")
    j = docs.join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    h = F.expr(_h32_spark("CAST(cluster_id AS STRING)"))
    return j.withColumn(
        "split", F.when(h % 100 < 90, F.lit("train")).otherwise(F.lit("val"))
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle + shard assignment — the randomize-and-shard
# step before writing training data. A true global permutation would need a
# single-partition row_number (a scale-killer); instead the shard is a
# map-side hash (so assignment never shuffles) and the within-shard order
# is a window PARTITIONED BY shard — every shard numbers its rows in
# parallel. Reading shards in order then yields a corpus-wide
# pseudo-random document order, reproducible from the salt alone.
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_SHUFFLE_SALT = "'_shuf1'"


def _shard_sql(dialect: str) -> str:
    h32 = _h32_spark if dialect == "spark" else _h32_duck
    cast_s = (
        "CAST(doc_id AS STRING)" if dialect == "spark"
        else "CAST(doc_id AS VARCHAR)"
    )
    h = h32(f"concat({cast_s}, {_SHUFFLE_SALT})")
    return (
        f"SELECT doc_id, shard, CAST(row_number() OVER ("
        " PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS pos"
        f" FROM (SELECT doc_id, {h} AS h, CAST({h} % {_N_SHARDS} AS BIGINT)"
        " AS shard FROM documents) t"
    )


@query("shard_shuffle", oracle=_shard_sql("duckdb"))
def shard_shuffle(spark, sf_dir):
    """Salt-reproducible pseudo-random shard + position for every document."""
    return spark.sql(_shard_sql("spark"))


# ---------------------------------------------------------------------------
# Data-mixture report: per-source document/token counts and corpus shares
# in exact integer ppm — the diagnostic a mixture-weighted training run is
# tuned against. One aggregation shuffle; the corpus total is a one-row
# broadcast join; shares are integer division, bit-identical across
# engines.
# ---------------------------------------------------------------------------


def _mixture_report_sql(dialect: str) -> str:
    ntok = (
        "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
        if dialect == "spark"
        else "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
    )
    intdiv = "div" if dialect == "spark" else "//"
    return (
        "SELECT source, n_docs, n_tokens,"
        f" CAST(n_tokens * 1000000 {intdiv} total_tokens AS BIGINT)"
        " AS token_share_ppm FROM ("
        " SELECT source, count(*) AS n_docs,"
        f" CAST(sum({ntok}) AS BIGINT) AS n_tokens"
        " FROM documents GROUP BY source) p,"
        " (SELECT CAST(sum(" + ntok + ") AS BIGINT) AS total_tokens"
        " FROM documents) t"
    )


@query("source_mixture_report", oracle=_mixture_report_sql("duckdb"))
def source_mixture_report(spark, sf_dir):
    """Per-source docs/tokens and exact ppm token share of the corpus."""
    return spark.sql(_mixture_report_sql("spark"))


# ---------------------------------------------------------------------------
# Temperature-scaled mixture: the standard low-resource upweighting move
# (multilingual/multi-source training, T=2 i.e. alpha=0.5): sampling
# weight w_i = sqrt(n_tokens_i) flattens the raw token distribution, then
# a fixed budget is allocated by largest-remainder rounding so the
# per-source token targets sum EXACTLY to the budget. All arithmetic is
# either a single correctly-rounded IEEE op (sqrt — deterministic in
# every engine) floored to integers, or exact integer division — so even
# the allocation tie-breaks hash-match across engines.
# ---------------------------------------------------------------------------

_MIX_BUDGET = 1_000_000  # tokens to allocate across sources


def _mixture_temperature_sql(dialect: str) -> str:
    ntok = (
        "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
        if dialect == "spark"
        else "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
    )
    intdiv = "div" if dialect == "spark" else "//"
    # every total is a window over the ALREADY-AGGREGATED #sources-row
    # relation (sum(w) OVER (), sum(alloc) OVER ()) — a scalar-subquery /
    # cross-join formulation would inline the per_source aggregation into
    # each reference and re-scan the corpus per total (measured: 8 parquet
    # scans); this shape scans documents exactly once
    return f"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs, CAST(sum({ntok}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
weighted AS (
  SELECT source, n_docs, n_tokens,
    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
  FROM per_source),
base AS (
  SELECT *, CAST(sum(w) OVER () AS BIGINT) AS sw FROM weighted),
alloc AS (
  -- sw = 0 means every source tokenized to zero (degenerate corpus):
  -- Spark div and DuckDB // both yield NULL there, but NULL would then
  -- leak into the leftover window arithmetic with engine-dependent CASE
  -- behavior — pin the degenerate allocation to all-zero budgets instead
  SELECT source, n_docs, n_tokens, w,
    CAST(CASE WHEN sw = 0 THEN 0
              ELSE w * 1000000 {intdiv} sw END AS BIGINT) AS share_ppm,
    CAST(CASE WHEN sw = 0 THEN 0
              ELSE w * {_MIX_BUDGET} {intdiv} sw END AS BIGINT) AS alloc,
    CAST(CASE WHEN sw = 0 THEN 0
              ELSE w * {_MIX_BUDGET} % sw END AS BIGINT) AS rem,
    sw
  FROM base),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
    CAST(CASE WHEN sw = 0 THEN 0
              ELSE {_MIX_BUDGET} - sum(alloc) OVER () END AS BIGINT)
      AS leftover
  FROM alloc)
SELECT source, n_docs, n_tokens, w, share_ppm,
  CAST(alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
    AS token_budget
FROM ranked
"""


@query(
    "source_mixture_temperature",
    oracle=_mixture_temperature_sql("duckdb"),
)
def source_mixture_temperature(spark, sf_dir):
    """Temperature-flattened (alpha=0.5) source mixture with an exact
    largest-remainder budget allocation: per-source sqrt(token) weights,
    integer-ppm shares, and token budgets that sum to exactly the global
    budget (floor allocations, then +1 to the largest remainders with a
    deterministic (remainder desc, source) tie-break). One aggregation
    shuffle over the corpus; everything after runs on the ~#sources-row
    relation — metadata-scale at any corpus size."""
    return spark.sql(_mixture_temperature_sql("spark"))


# ---------------------------------------------------------------------------
# Token-budget mixture packing: select documents per source until an
# exact token budget fills — "compose a training mix of B tokens per
# domain", the budgeted counterpart of the rate-based
# domain_mixture_sample above. Scale-safe by construction: a single
# per-domain cumulative sum would serialize each domain into one window
# task, so the budget is SPLIT across 8 hash subshards (each gets
# budget/8 and fills independently) — parallelism ∝ domains × shards,
# selection stays deterministic (hash-ordered within shard), and the
# kept total undershoots the exact budget by at most one document per
# shard. Budget here: 25% of each source's own token mass, derived
# in-plan (a domain-grain aggregate joined back — no collect).
# ---------------------------------------------------------------------------

_BUDGET_SHARDS = 8
_BUDGET_FRACTION_DIV = 4  # keep ~1/4 of each source's tokens


def _budget_sql(dialect: str) -> str:
    if dialect == "duckdb":
        h32 = _h32_duck
        ntok = "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
        strtype = "VARCHAR"
        div = "//"
    else:
        h32 = _h32_spark
        ntok = "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
        strtype = "STRING"
        div = "DIV"
    shard = (
        h32(f"concat('bud:', CAST(doc_id AS {strtype}))")
        + f" % {_BUDGET_SHARDS}"
    )
    order = h32(f"concat('ord:', CAST(doc_id AS {strtype}))")
    return f"""
WITH d AS (
  SELECT doc_id, source, CAST({ntok} AS BIGINT) AS n_tokens,
         {shard} AS shard, {order} AS ord
  FROM documents
),
src AS (
  SELECT source,
         CAST(sum(n_tokens) {div} {_BUDGET_FRACTION_DIV} AS BIGINT)
           AS budget
  FROM d GROUP BY source
),
c AS (
  SELECT d.doc_id, d.source, d.n_tokens, d.shard,
         CAST(src.budget {div} {_BUDGET_SHARDS} AS BIGINT) AS shard_budget,
         sum(d.n_tokens) OVER (
           PARTITION BY d.source, d.shard
           ORDER BY d.ord, d.doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d JOIN src ON d.source = src.source
)
SELECT doc_id, source, n_tokens
FROM c WHERE cum <= shard_budget
"""


@query("token_budget_pack", oracle=_budget_sql("duckdb"))
def token_budget_pack(spark, sf_dir):
    """Exact-token-budget mixture selection: per source keep
    hash-ordered documents until ~25% of that source's token mass is
    reached, with the budget subsharded 8 ways so no domain serializes
    into one window task. Deterministic on every engine and layout;
    one domain-grain aggregate + one broadcastable join + one windowed
    cumulative sum."""
    return spark.sql(_budget_sql("spark"))
