"""Similarity search over embedding columns.

- **brute-force top-k** (the exact baseline): broadcast the query set,
  score every candidate, per-query top-k via window rank. At 100 TB the
  candidate scan is embarrassingly parallel; the only shuffle is the
  per-query top-k, whose input is already reduced to k × #partitions rows
  by partial ordering (Spark's window + filter benefits from AQE).
- **LSH-bucketed** (the scale path): sign-of-projection bucketing against a
  fixed set of hyperplanes (seed vectors), then exact scoring within the
  bucket only. Deterministic, so fully oracle-checked.
- **recall@k evaluation** closes the loop: on these *unclustered* random
  fixture embeddings single-probe bucketing measures 0-40% recall — the
  honest number the eval operator exists to surface. Production tuning
  (fewer planes, multi-probe over neighboring buckets, or IVF on real
  clustered data) trades candidate-set size for recall; the exact
  operator is always the correctness baseline.

Float determinism: dot products fold left-to-right in float64 on both
engines (verified empirically at build time); remaining ops are single IEEE
operations.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.registry import query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 6  # hyperplanes = embeddings of vec_id 0..5
_DOT = (
    "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
)


def _dot_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm_col(a):
    return F.sqrt(_dot_col(a, a))


_ANN_ORACLE = f"""
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
           WHERE vec_id < {N_QUERIES}),
     c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    {_DOT.format(a='q.e', b='c.e')} /
      (sqrt({_DOT.format(a='q.e', b='q.e')}) * sqrt({_DOT.format(a='c.e', b='c.e')}))
      AS cos
  FROM q JOIN c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) r
WHERE rank <= {TOP_K}
"""


@query("ann_cosine_topk", oracle=_ANN_ORACLE)
def ann_cosine_topk(spark, sf_dir):
    from bravo_spark import llmops

    emb = catalog.table(spark, sf_dir, "embeddings")
    return llmops.cosine_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=TOP_K
    )


def _bucket_sql_duck(rel: str) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_DOT.format(a=f'{rel}.e', b=f'p{k}.e')} > 0"
        f" THEN {1 << k} ELSE 0 END)"
        for k in range(N_PLANES)
    )
    return bits


_PLANES_DUCK = ", ".join(
    f"(SELECT CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id = {k}) p{k}"
    for k in range(N_PLANES)
)

_ANN_LSH_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
b AS (
  SELECT v.vec_id, v.e, {_bucket_sql_duck('v')} AS bucket
  FROM v, {_PLANES_DUCK}
),
q AS (SELECT * FROM b WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    {_DOT.format(a='q.e', b='c.e')} /
      (sqrt({_DOT.format(a='q.e', b='q.e')}) * sqrt({_DOT.format(a='c.e', b='c.e')}))
      AS cos
  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) r
WHERE rank <= {TOP_K}
"""


@query("ann_lsh_bucket", oracle=_ANN_LSH_ORACLE)
def ann_lsh_bucket(spark, sf_dir):
    """Scale path: candidates restricted to the query's hyperplane-sign
    bucket. The plane set is tiny and broadcast; bucketing is a map-side
    projection, and the join key is the bucket id — at 100 TB this is a
    hash join on a low-cardinality key instead of an all-pairs product."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    vecs = emb.select("vec_id", dbl.alias("e"))
    planes = [
        r["e"]
        for r in vecs.filter(F.col("vec_id") < N_PLANES)
        .orderBy("vec_id")
        .collect()  # N_PLANES tiny fixed vectors — metadata-scale collect
    ]
    # r19: the bucket bits and the cosine are built as SQL strings — the
    # per-plane Column loop (6 planes × lit-array + higher-order dot)
    # cost ~0.6 s of py4j round trips per call; one parse call builds the
    # identical expression tree (repr round-trips each double exactly)

    def dot_s(x: str, y: str) -> str:
        return (f"aggregate(zip_with({x}, {y}, (p, q) -> p * q), 0.0D,"
                " (acc, v) -> acc + v)")

    def arr_lit(p) -> str:
        # r20 (advice): repr of a non-finite double ('inf'/'nan') is not
        # parseable SQL — degenerate plane data must fail BY NAME here,
        # not as an opaque parse error downstream
        import math

        bad = [x for x in p if not math.isfinite(float(x))]
        if bad:
            raise ValueError(
                f"LSH plane carries non-finite component(s) {bad!r} — "
                "cannot build the bucket expression"
            )
        return "array(" + ", ".join(f"{float(x)!r}D" for x in p) + ")"

    bucket_sql = " + ".join(
        f"IF({dot_s('e', arr_lit(p))} > 0.0D, {1 << k}, 0)"
        for k, p in enumerate(planes)
    )
    b = vecs.withColumn("bucket", F.expr(bucket_sql))
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    cos = F.expr(
        f"{dot_s('qe', 'ce')}"
        f" / (sqrt({dot_s('qe', 'qe')}) * sqrt({dot_s('ce', 'ce')}))"
    )
    scored = (
        F.broadcast(q)
        .join(
            b.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("e").alias("ce"),
                F.col("bucket").alias("cb"),
            ),
            (F.col("qb") == F.col("cb")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


@query(
    "embedding_norms",
    oracle=(
        "SELECT vec_id, label,"
        " sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),"
        " CAST(embedding AS DOUBLE[]))) AS l2_norm FROM embeddings"
    ),
)
def embedding_norms(spark, sf_dir):
    emb = catalog.table(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    return emb.select("vec_id", "label", _norm_col(dbl).alias("l2_norm"))


@query(
    "doc_embedding_join",
    oracle=(
        "SELECT d.doc_id, d.lang, d.n_chars, e.label,"
        " sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),"
        "  CAST(e.embedding AS DOUBLE[]))) AS l2_norm"
        " FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id"
    ),
)
def doc_embedding_join(spark, sf_dir):
    """Cross-modal join: text metadata ⋈ embedding vectors on the shared
    id — the shape of every multimodal training-data pipeline (1:1 keyed
    join; at scale both sides bucket on the id so it is co-located)."""
    docs = catalog.table(spark, sf_dir, "documents")
    emb = catalog.table(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    e = emb.select(F.col("vec_id").alias("doc_id"), "label", _norm_col(dbl).alias("l2_norm"))
    return docs.select("doc_id", "lang", "n_chars").join(e, "doc_id")


# ---------------------------------------------------------------------------
# sketch-and-rescore ANN (llmops.sketch_topk): 256-bit sign-of-projection
# signatures, Hamming ranking, exact rescore of the top-C candidates.
# Deterministic end-to-end (md5-derived planes, left-fold float64 dots,
# integer Hamming with id tiebreaks), so the WHOLE approximate pipeline is
# oracle-checked — signatures, candidate sets, and final ranks.
# ---------------------------------------------------------------------------

SKETCH_PLANES = 256
SKETCH_DIM = 64
SKETCH_C = 50  # exact-rescore candidates per query (10% of the sf0.01 corpus)


def sketch_words_cte() -> str:
    """DuckDB CTE chain computing the packed signature words — the oracle
    twin of llmops.sketch_signatures."""
    return f"""
planes AS (
  SELECT j, list(CAST(('0x'||substr(md5(concat(j,',',d)),1,8)) AS BIGINT)
                 / 2147483648.0 - 1 ORDER BY d) AS p
  FROM range({SKETCH_PLANES}) t(j), range({SKETCH_DIM}) s(d)
  GROUP BY j
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
bits AS (
  SELECT v.vec_id, pl.j,
         CASE WHEN list_dot_product(v.e, pl.p) > 0 THEN 1 ELSE 0 END AS b
  FROM v CROSS JOIN planes pl
),
words AS (
  SELECT vec_id, j // 32 AS w,
         CAST(sum(b * (1::BIGINT << (j % 32))) AS BIGINT) AS word
  FROM bits GROUP BY 1, 2
)"""


_ANN_SKETCH_ORACLE = f"""
WITH {sketch_words_cte()},
qw AS (SELECT * FROM words WHERE vec_id < {N_QUERIES}),
ham AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(bit_count(xor(q.word, c.word))) AS BIGINT) AS ham
  FROM qw q JOIN words c ON q.w = c.w AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY ham, neighbor_id) AS rr
    FROM ham) t
  WHERE rr <= {SKETCH_C}
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    {_DOT.format(a='qv.e', b='cv.e')} /
      (sqrt({_DOT.format(a='qv.e', b='qv.e')}) * sqrt({_DOT.format(a='cv.e', b='cv.e')}))
      AS cos
  FROM cand
  JOIN v qv ON qv.vec_id = cand.query_id
  JOIN v cv ON cv.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) r
WHERE rank <= {TOP_K}
"""


@query("ann_sketch_topk", oracle=_ANN_SKETCH_ORACLE)
def ann_sketch_topk(spark, sf_dir):
    """The production ANN path for data without cluster structure: Hamming-
    rank 256-bit signatures, exact-rescore the top-{C}. Measured recall@5 on
    the fixtures: 0.90 with C = 10% of corpus (vs 0-40% for single-probe
    bucketing). Signature scan is 8 longs/row; ranking joins broadcast query
    signatures; only Q×C rows carry vectors."""
    from bravo_spark import llmops

    emb = catalog.table(spark, sf_dir, "embeddings")
    return llmops.sketch_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        dim=SKETCH_DIM,
        k=TOP_K,
        n_planes=SKETCH_PLANES,
        n_candidates=SKETCH_C,
    )


_SKETCH_RECALL_ORACLE = f"""
WITH exact_tk AS ({_ANN_ORACLE}),
sk_tk AS ({_ANN_SKETCH_ORACLE})
SELECT e.query_id,
  CAST(count(l.neighbor_id) AS BIGINT) AS hits,
  CAST(count(l.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM exact_tk e LEFT JOIN sk_tk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


@query("ann_sketch_recall_eval", oracle=_SKETCH_RECALL_ORACLE)
def ann_sketch_recall_eval(spark, sf_dir):
    """recall@k of the sketch-and-rescore ANN against the exact top-k —
    the measured gate for the approximate index (mean 0.90 on sf0.01)."""
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    sk = (
        ann_sketch_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(sk, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            (F.count("hit").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-flat (llmops.ivf_topk): deterministic centroids = corpus vectors
# [N_QUERIES, N_QUERIES + IVF_NLIST); assignment and probing by max cosine.
# ---------------------------------------------------------------------------

IVF_NLIST = 16
IVF_NPROBE = 4

_IVF_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)

_ANN_IVF_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
cent AS (SELECT vec_id AS cid, e AS ce FROM v
         WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + IVF_NLIST}),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        {_IVF_COS.format(a='v.e', b='c.ce')} DESC, c.cid) AS rn
    FROM v CROSS JOIN cent c) t
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT v.vec_id, c.cid,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        {_IVF_COS.format(a='v.e', b='c.ce')} DESC, c.cid) AS rn
    FROM v CROSS JOIN cent c WHERE v.vec_id < {N_QUERIES}) t
  WHERE rn <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    {_IVF_COS.format(a='q.e', b='c.e')} AS cos
  FROM cand
  JOIN v q ON q.vec_id = cand.query_id
  JOIN v c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) r
WHERE rank <= {TOP_K}
"""


@query("ann_ivf_topk", oracle=_ANN_IVF_ORACLE)
def ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN with fixed deterministic centroids and nprobe=4: the
    cell-partitioned scale path for CLUSTERED embedding spaces (each query
    touches ~nprobe/nlist of the corpus). Honestly evaluated next to
    sketch_topk by the recall queries — on these structureless fixtures the
    sketch wins; on real clustered data the inverted file prunes harder."""
    from bravo_spark import llmops

    emb = catalog.table(spark, sf_dir, "embeddings")
    cents = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + IVF_NLIST)
    )
    return llmops.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        cents,
        k=TOP_K,
        n_probe=IVF_NPROBE,
    )


_IVF_RECALL_ORACLE = f"""
WITH exact_tk AS ({_ANN_ORACLE}),
ivf_tk AS ({_ANN_IVF_ORACLE})
SELECT e.query_id,
  CAST(count(l.neighbor_id) AS BIGINT) AS hits,
  CAST(count(l.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM exact_tk e LEFT JOIN ivf_tk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


@query("ann_ivf_recall_eval", oracle=_IVF_RECALL_ORACLE)
def ann_ivf_recall_eval(spark, sf_dir):
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = (
        ann_ivf_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            (F.count("hit").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


_RECALL_ORACLE = f"""
WITH exact_tk AS ({_ANN_ORACLE}),
lsh_tk AS ({_ANN_LSH_ORACLE})
SELECT e.query_id,
  CAST(count(l.neighbor_id) AS BIGINT) AS hits,
  CAST(count(l.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM exact_tk e LEFT JOIN lsh_tk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


@query("ann_recall_eval", oracle=_RECALL_ORACLE)
def ann_recall_eval(spark, sf_dir):
    """Evaluation operator: recall@k of the LSH-bucketed ANN against the
    exact top-k — the measurement loop every approximate index needs.
    Composes two registered operators; entirely engine-side."""
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = (
        ann_lsh_bucket(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            (F.count("hit").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


# --- clustered-fixture IVF: Lloyd refinement demonstrated where IVF is
# actually applicable (reference has no ANN at all; this is extension
# surface measured honestly — the structureless-fixture evals above stay
# as the pessimistic bound) ---------------------------------------------
#
# The fixture derives a CLUSTERED 16-dim integer-component vector set from
# the embeddings table's vec_ids: cluster t = md5(id) % 12 (hash-based, so
# the 12 seed vectors id<12 do NOT land one-per-cluster), vector =
# 2*center(t) + md5 noise in [-3,3]. Integer components make every Lloyd
# mean EXACT cross-engine (bigint sum / count in IEEE double), so the
# refined centroids — and everything downstream — hash-match DuckDB.

_CK = 12  # true clusters == k-means k
_CDIM = 16
_CSCALE = 2
_CNPROBE = 1
_LLOYD_ITERS = 2

_CLUSTER_ID_SPARK = (
    "(CAST(conv(substring(md5(concat('c', vec_id)), 1, 8), 16, 10) AS BIGINT)"
    f" % {_CK})"
)
_CV_SPARK = (
    f"transform(sequence(0, {_CDIM - 1}), d -> CAST("
    f" {_CSCALE}*((({_CLUSTER_ID_SPARK}*37 + d*11) % 19) - 9)"
    " + (CAST(conv(substring(md5(concat(vec_id, '_', d)), 1, 8), 16, 10)"
    "    AS BIGINT) % 7 - 3)"
    " AS DOUBLE))"
)

_CLUSTER_ID_DUCK = (
    "(CAST(('0x' || substr(md5(concat('c', vec_id)), 1, 8)) AS BIGINT)"
    f" % {_CK})"
)
_CV_DUCK = (
    f"list_transform(range(0, {_CDIM}), d -> CAST("
    f" {_CSCALE}*((({_CLUSTER_ID_DUCK}*37 + d*11) % 19) - 9)"
    " + (CAST(('0x' || substr(md5(concat(vec_id, '_', d)), 1, 8)) AS BIGINT)"
    "    % 7 - 3)"
    " AS DOUBLE))"
)

_CCOS = (
    f"{_DOT.format(a='{a}', b='{b}')} / (sqrt({_DOT.format(a='{a}', b='{a}')})"
    f" * sqrt({_DOT.format(a='{b}', b='{b}')}))"
)


def _lloyd_ctes() -> str:
    """The shared oracle prefix: fixture + _LLOYD_ITERS assignment/update
    rounds, ending in a centroid relation named ``cent_f``."""

    def _asg(cent_rel: str) -> str:
        return f"""
  SELECT id, e, cid FROM (
    SELECT v.id, v.e, c.cid,
      row_number() OVER (PARTITION BY v.id ORDER BY
        {_CCOS.format(a='v.e', b='c.ce')} DESC, c.cid) rn
    FROM cv v CROSS JOIN {cent_rel} c) t WHERE rn = 1"""

    def _cent(asg_rel: str) -> str:
        return f"""
  SELECT cid, list(m ORDER BY pos) AS ce FROM (
    SELECT a.cid, d.pos,
      CAST(CAST(sum(a.e[d.pos + 1]) AS BIGINT) AS DOUBLE) / count(*) AS m
    FROM {asg_rel} a CROSS JOIN dims d GROUP BY a.cid, d.pos) GROUP BY cid"""

    ctes = [
        f"""cv AS (
  SELECT vec_id AS id, {_CV_DUCK} AS e FROM embeddings)""",
        f"seeds AS (SELECT id AS cid, e AS ce FROM cv WHERE id < {_CK})",
        f"dims AS (SELECT unnest(range(0, {_CDIM})) AS pos)",
    ]
    prev = "seeds"
    for i in range(_LLOYD_ITERS):
        ctes.append(f"asg{i} AS ({_asg(prev)})")
        ctes.append(f"cent{i} AS ({_cent(f'asg{i}')})")
        prev = f"cent{i}"
    ctes.append(f"cent_f AS (SELECT * FROM {prev})")
    return ",\n".join(ctes)


_LLOYD_CENT_ORACLE = f"""
WITH {_lloyd_ctes()}
SELECT cid, CAST(d.pos AS INTEGER) AS pos, ce[d.pos + 1] AS centroid
FROM cent_f CROSS JOIN dims d
"""

_IVF_CLUSTERED_ORACLE = f"""
WITH {_lloyd_ctes()},
asg_f AS (
  SELECT id, e, cid FROM (
    SELECT v.id, v.e, c.cid,
      row_number() OVER (PARTITION BY v.id ORDER BY
        {_CCOS.format(a='v.e', b='c.ce')} DESC, c.cid) rn
    FROM cv v CROSS JOIN cent_f c) t WHERE rn = 1),
probes AS (
  SELECT id AS query_id, e AS qe, cid FROM (
    SELECT v.id, v.e, c.cid,
      row_number() OVER (PARTITION BY v.id ORDER BY
        {_CCOS.format(a='v.e', b='c.ce')} DESC, c.cid) rn
    FROM cv v CROSS JOIN cent_f c WHERE v.id < {N_QUERIES}) t
  WHERE rn <= {_CNPROBE}),
ivf_tk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.id AS neighbor_id,
      row_number() OVER (PARTITION BY p.query_id ORDER BY
        {_CCOS.format(a='p.qe', b='a.e')} DESC, a.id) AS rank
    FROM probes p JOIN asg_f a ON a.cid = p.cid AND a.id <> p.query_id) r
  WHERE rank <= {TOP_K}),
exact_tk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.id AS query_id, c.id AS neighbor_id,
      row_number() OVER (PARTITION BY q.id ORDER BY
        {_CCOS.format(a='q.e', b='c.e')} DESC, c.id) AS rank
    FROM cv q JOIN cv c ON q.id <> c.id WHERE q.id < {N_QUERIES}) r
  WHERE rank <= {TOP_K})
SELECT e.query_id AS query_id,
  CAST(count(l.neighbor_id) AS BIGINT) AS hits,
  CAST(count(l.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM exact_tk e LEFT JOIN ivf_tk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


def _clustered_cv(spark, sf_dir):
    """Clustered-vector fixture relation, cached for the query cycle.

    r19: every consumer (Lloyd seeds, each Lloyd round's assignment map,
    the IVF build/append assignment, SemDeDup) sits in its own Spark job,
    and each job re-evaluated the md5-per-dimension fixture expression
    over the scan — ~5 evaluations per query run. The relation is
    (corpus × D doubles) — derived data a production pipeline would have
    as a materialized column — so cache it once per query cycle
    (query-cycle-scoped via llmops.release_caches; recomputed from
    parquet on every invocation, nothing persists across runs)."""
    from bravo_spark.llmops import track_cache

    emb = catalog.table(spark, sf_dir, "embeddings")
    return track_cache(
        emb.select(F.col("vec_id").alias("id"), F.expr(_CV_SPARK).alias("e"))
    )


def _lloyd_refine(cv):
    """_LLOYD_ITERS Lloyd rounds as pure DataFrame ops (no driver collect:
    the centroid relation is K×D rows, broadcast between rounds). Means are
    bigint-sum / count — exact for the integer-component fixture, so the
    result is bit-identical to the DuckDB oracle.

    r19 optimization (guide §2.4): each round previously shuffled the
    corpus twice — a corpus×k window argmax on id, then a corpus×D
    posexplode into a (cid, pos) aggregation. Now the assignment is the
    zero-shuffle broadcast argmax already pinned for the IVF family
    (llmops._assign_cells: k-row array-of-structs fold, value tie-break
    identical to the old ``ORDER BY ccos DESC, cid`` rn=1), and the
    centroid update aggregates per-dimension sums in ONE partial-
    aggregated groupBy(cid) — k groups, no row explosion. The cosine
    expression tree and the bigint-sum/count mean are unchanged IEEE
    operation-for-operation, so assignments and centroids stay
    bit-identical (oracle hashes pinned at all three SFs)."""
    from bravo_spark.llmops import _assign_cells

    id_type = dict(cv.dtypes).get("id", "bigint")
    cent = cv.filter(F.col("id") < _CK).select(
        F.col("id").alias("cid"), F.col("e").alias("ce")
    )
    sum_exprs = [f"sum(e[{d}]) AS _s{d}" for d in range(_CDIM)]
    mean_arr = "array({})".format(", ".join(
        f"CAST(CAST(_s{d} AS BIGINT) AS DOUBLE) / _n" for d in range(_CDIM)
    ))
    for _ in range(_LLOYD_ITERS):
        assigned = _assign_cells(
            cv, cent.select("cid", F.col("ce").alias("centroid"))
        ).select("id", "e", F.col("cell").cast(id_type).alias("cid"))
        cent = (
            assigned.groupBy("cid")
            .agg(F.expr("count(*) AS _n"), *[F.expr(s) for s in sum_exprs])
            .select("cid", F.expr(mean_arr).alias("ce"))
        )
    # r20 note: eager localCheckpoint between rounds (lineage truncation,
    # guide §3) was tried and REVERTED — interleaved A/B showed it flat on
    # this family and a consistent ~+0.35 s regression on
    # ann_ivf_clustered_recall: ReuseExchange already deduplicates the
    # repeated Lloyd subtrees within a job, so the eager per-round jobs
    # were pure added scheduling latency.
    return cent


@query("kmeans_lloyd_centroids", oracle=_LLOYD_CENT_ORACLE)
def kmeans_lloyd_centroids(spark, sf_dir):
    """Lloyd k-means refinement pinned cross-engine: every (cluster, dim)
    centroid coordinate after 2 assignment/update rounds hash-matches the
    unrolled DuckDB computation. Companion API: llmops.kmeans_centroids
    (decimal-mean variant for arbitrary float corpora)."""
    return _lloyd_refine(_clustered_cv(spark, sf_dir)).select(
        "cid", F.posexplode("ce").alias("pos", "centroid")
    )


@query("ann_ivf_clustered_recall", oracle=_IVF_CLUSTERED_ORACLE)
def ann_ivf_clustered_recall(spark, sf_dir):
    """IVF-flat on data IVF is FOR — hash-clustered vectors, Lloyd-refined
    centroids, single-probe (each query scans ~1/12 of the corpus): recall
    0.96 at k=5, vs 0.30 single-probe on the structureless fixture
    (ann_ivf_recall_eval). tests/test_llmops.py gates the mean at >=0.8."""
    from bravo_spark import llmops

    cv = _clustered_cv(spark, sf_dir)
    cent = _lloyd_refine(cv).select(
        F.col("cid").alias("id"), F.col("ce").alias("e")
    )
    ivf = llmops.ivf_topk(
        cv,
        cv.filter(F.col("id") < N_QUERIES),
        cent,
        id_col="id",
        vec_col="e",
        k=TOP_K,
        n_probe=_CNPROBE,
    ).select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
    exact = llmops.cosine_topk(
        cv, cv.filter(F.col("id") < N_QUERIES), id_col="id", vec_col="e", k=TOP_K
    ).select("query_id", "neighbor_id")
    return (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            (F.count("hit").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (llmops.pq_topk): deterministic codebook = corpus
# vectors [N_QUERIES, N_QUERIES + PQ_KS); m subspaces, ADC candidate rank by
# cosine against the reconstructed vector, exact rescore.
# ---------------------------------------------------------------------------

PQ_M = 8
PQ_KS = 16
PQ_CAND_FACTOR = 10
_PQ_SD = 8  # 64-dim fixtures / PQ_M

_PQ_DOT = "list_dot_product({a}, {b})"

_ANN_PQ_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
cbj AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, e FROM v
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_KS}),
cb AS (SELECT t.m, cbj.j,
         list_slice(cbj.e, t.m * {_PQ_SD} + 1, (t.m + 1) * {_PQ_SD}) AS csub
       FROM cbj CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) t),
codes AS (
  SELECT vec_id, m, j FROM (
    SELECT sv.vec_id, cb.m, cb.j,
      row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
        {_PQ_DOT.format(a='cb.csub', b='cb.csub')}
        - 2.0 * {_PQ_DOT.format(a='sv.vsub', b='cb.csub')}, cb.j) AS rn
    FROM (SELECT v.vec_id, t.m,
            list_slice(v.e, t.m * {_PQ_SD} + 1, (t.m + 1) * {_PQ_SD}) AS vsub
          FROM v CROSS JOIN
            (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) t) sv
    JOIN cb ON cb.m = sv.m) x
  WHERE rn = 1
),
recon AS (
  SELECT c.vec_id, flatten(list(cb.csub ORDER BY c.m)) AS re
  FROM codes c JOIN cb ON cb.m = c.m AND cb.j = c.j
  GROUP BY c.vec_id
),
approx AS (
  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
    {_PQ_DOT.format(a='q.e', b='r.re')}
      / (sqrt({_PQ_DOT.format(a='q.e', b='q.e')})
         * sqrt({_PQ_DOT.format(a='r.re', b='r.re')})) AS adc
  FROM v q JOIN recon r ON r.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY adc DESC, neighbor_id) AS crank FROM approx) t
  WHERE crank <= {PQ_CAND_FACTOR * TOP_K}
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    {_PQ_DOT.format(a='q.e', b='c.e')}
      / (sqrt({_PQ_DOT.format(a='q.e', b='q.e')})
         * sqrt({_PQ_DOT.format(a='c.e', b='c.e')})) AS cos
  FROM cand
  JOIN v q ON q.vec_id = cand.query_id
  JOIN v c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) r
WHERE rank <= {TOP_K}
"""


@query("ann_pq_topk", oracle=_ANN_PQ_ORACLE)
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN: m=8 sub-quantizers over the 64-dim
    fixtures, codes are 8 bytes per vector (32× smaller than the raw
    float32s — the memory-bound scale path), ADC candidate ranking against
    reconstructed vectors, exact rescore on a 10%-of-corpus candidate set.
    Measured 0.62 recall@5 on the structureless fixtures with the fixed
    16-centroid codebook (ann_pq_recall_eval) — honest like IVF's 0.30:
    PQ recall tracks codebook quality, and the Lloyd refinement of
    kmeans_lloyd_centroids plugs into each subspace on real data."""
    from bravo_spark import llmops

    emb = catalog.table(spark, sf_dir, "embeddings")
    cents = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + PQ_KS)
    )
    return llmops.pq_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        cents,
        k=TOP_K,
        m_subspaces=PQ_M,
        candidate_factor=PQ_CAND_FACTOR,
    )


_PQ_RECALL_ORACLE = f"""
WITH exact_tk AS ({_ANN_ORACLE}),
pq_tk AS ({_ANN_PQ_ORACLE})
SELECT e.query_id,
  CAST(count(l.neighbor_id) AS BIGINT) AS hits,
  CAST(count(l.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM exact_tk e LEFT JOIN pq_tk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


@query("ann_pq_recall_eval", oracle=_PQ_RECALL_ORACLE)
def ann_pq_recall_eval(spark, sf_dir):
    """Measured recall@k of the PQ index against the exact top-k."""
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    pq = (
        ann_pq_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(pq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            (F.count("hit").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (llmops.quantize_embeddings): the 4x storage
# compression step. Map-only; even the float vmin/vmax and the micro-unit
# reconstruction error hash-match the oracle because every step is a
# single IEEE operation both engines round identically.
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), mm AS (
  SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax FROM base
), q AS (
  SELECT vec_id, v, vmin, vmax, vmax - vmin AS rng,
    CASE WHEN vmax = vmin THEN list_transform(v, x -> 0)
         ELSE list_transform(v, x -> CAST(least(floor((x - vmin) * 255
              / (vmax - vmin)), 255) AS INT)) END AS codes
  FROM mm
)
SELECT vec_id, vmin, vmax, array_to_string(codes, ',') AS codes_csv,
  CAST(floor(CASE WHEN rng = 0 THEN 0 ELSE
    list_max(list_transform(range(1, len(v) + 1),
      i -> abs(v[i] - (vmin + codes[i] * rng / 255)))) END
    * 1000000) AS BIGINT) AS err_e6
FROM q
"""


@query("embedding_quantize", oracle=_QUANT_ORACLE)
def embedding_quantize(spark, sf_dir):
    """Per-vector int8 min-max quantization with reconstruction-error audit.

    The ``codes`` vector is serialized to a CSV string for the checked
    projection: the driver's pandas canonicalizer sorts the frame by every
    column, and a bare array cell is unhashable there (the one red row in
    CORRECTNESS_r06). Engine users call ``llmops.quantize_embeddings``
    directly and keep the typed array column."""
    from bravo_spark import llmops

    emb = catalog.table_spread(spark, sf_dir, "embeddings")
    q = llmops.quantize_embeddings(emb, "vec_id", "embedding", bits=8)
    return q.select(
        "vec_id", "vmin", "vmax",
        F.array_join(F.col("codes"), ",").alias("codes_csv"),
        "err_e6",
    )


# ---------------------------------------------------------------------------
# kNN label-vote evaluation: the canonical "are these embeddings any good"
# check a training-data pipeline runs when vectors carry ground-truth
# labels — exact top-k neighbors per sampled query, majority vote, per-
# label accuracy counts. Integer outputs only, so the whole eval is
# hash-checked.
# ---------------------------------------------------------------------------

N_LABEL_QUERIES = 50

_KNN_LABEL_ORACLE = f"""
WITH q AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) e
           FROM embeddings WHERE vec_id < {N_LABEL_QUERIES}),
     c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) e
           FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS n_label,
    {_DOT.format(a='q.e', b='c.e')} /
      (sqrt({_DOT.format(a='q.e', b='q.e')}) * sqrt({_DOT.format(a='c.e', b='c.e')}))
      AS cos
  FROM q JOIN c ON q.vec_id <> c.vec_id),
topk AS (
  SELECT query_id, n_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank FROM scored) r
  WHERE rank <= {TOP_K}),
votes AS (
  SELECT query_id, n_label, count(*) AS v FROM topk
  GROUP BY query_id, n_label),
pred AS (
  SELECT query_id, n_label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY v DESC, n_label) AS rk FROM votes) p
  WHERE rk = 1)
SELECT q.label,
  count(*) AS n_queries,
  CAST(sum(CASE WHEN p.pred_label = q.label THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct
FROM pred p JOIN q ON q.vec_id = p.query_id
GROUP BY q.label
"""


@query("ann_knn_label_eval", oracle=_KNN_LABEL_ORACLE)
def ann_knn_label_eval(spark, sf_dir):
    """Per-label kNN classification accuracy over sampled queries: exact
    cosine top-k (queries broadcast, candidates stream — the same
    embarrassingly-parallel scan as ann_cosine_topk), neighbor labels
    majority-voted with deterministic (count desc, label asc) tie-break,
    then (label, n_queries, n_correct). The labels join touches the tiny
    top-k relation, never the full corpus twice; output is integer-only
    so the hash check covers the whole pipeline."""
    from bravo_spark import llmops

    emb = catalog.table(spark, sf_dir, "embeddings")
    topk = llmops.cosine_topk(
        emb, emb.filter(F.col("vec_id") < N_LABEL_QUERIES), k=TOP_K
    )
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    votes = (
        topk.join(lab, "neighbor_id")
        .groupBy("query_id", "n_label")
        .agg(F.count("*").alias("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("v").desc(), "n_label")
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("n_label").alias("pred_label"))
    )
    truth = emb.filter(F.col("vec_id") < N_LABEL_QUERIES).select(
        F.col("vec_id").alias("query_id"), "label"
    )
    return (
        pred.join(truth, "query_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_queries"),
            F.sum(
                F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup = k-means
# cluster the embeddings, then drop near-duplicates WITHIN each cluster by
# pairwise cosine — the pairwise work is bounded by cluster size, never
# corpus², which is the whole point of clustering first (at 100 TB, k
# scales with the corpus so clusters stay a few thousand vectors). Reuses
# the Lloyd fixture/refinement above; keep rule: lowest id in a near-dup
# pair survives (greedy, deterministic).
# ---------------------------------------------------------------------------

_SEMDEDUP_T = 0.99

_SEMDEDUP_ORACLE = f"""
WITH {_lloyd_ctes()},
asg_f AS (
  SELECT id, e, cid FROM (
    SELECT v.id, v.e, c.cid,
      row_number() OVER (PARTITION BY v.id ORDER BY
        {_CCOS.format(a='v.e', b='c.ce')} DESC, c.cid) rn
    FROM cv v CROSS JOIN cent_f c) t WHERE rn = 1),
dup AS (
  SELECT DISTINCT b.id AS id
  FROM asg_f a JOIN asg_f b ON a.cid = b.cid AND a.id < b.id
  WHERE {_CCOS.format(a='a.e', b='b.e')} >= {_SEMDEDUP_T})
SELECT f.id, f.cid,
  CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM asg_f f LEFT JOIN dup d ON f.id = d.id
"""


@query("dedup_semantic_clusters", oracle=_SEMDEDUP_ORACLE)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup: Lloyd-refined k-means assignment, then within-cluster
    near-dup pruning at cosine >= 0.99 (keep the lowest id). Scale shape:
    the centroid relation (k rows) broadcasts; assignment is one pass;
    the pair join is an EQUI-join on cluster id (SMJ at scale, no
    nested-loop anywhere — pinned), so pairwise cost is sum(cluster²),
    bounded by choosing k ∝ corpus size exactly as the paper does. The
    oracle replays clustering AND pruning, so the value hash proves
    assignments, pair cosines, and the keep rule."""
    from bravo_spark import llmops

    cv = _clustered_cv(spark, sf_dir)
    cent = _lloyd_refine(cv).select("cid", "ce")
    return llmops.semantic_dedup(
        cv, cent, id_col="id", vec_col="e", threshold=_SEMDEDUP_T
    ).withColumnRenamed("cluster_id", "cid")


# ---------------------------------------------------------------------------
# Persisted IVF index (llmops.build_ivf_index / ivf_index_search): the
# build-once-query-many path. Same clustered fixture + Lloyd centroids as
# ann_ivf_clustered_recall, but the assignment is WRITTEN as
# cell-partitioned parquet plus a Hadoop-FS manifest and the search goes
# through load_ivf_index — so the oracle hash proves the whole persisted
# lifecycle: centroid serialization, cell routing, partition-pruned probe,
# rescore, and top-k, not just the in-memory math.
# ---------------------------------------------------------------------------

_IVF_INDEX_NPROBE = 2

_IVF_INDEX_ORACLE = f"""
WITH {_lloyd_ctes()},
asg_f AS (
  SELECT id, e, cid FROM (
    SELECT v.id, v.e, c.cid,
      row_number() OVER (PARTITION BY v.id ORDER BY
        {_CCOS.format(a='v.e', b='c.ce')} DESC, c.cid) rn
    FROM cv v CROSS JOIN cent_f c) t WHERE rn = 1),
probes AS (
  SELECT id AS query_id, e AS qe, cid FROM (
    SELECT v.id, v.e, c.cid,
      row_number() OVER (PARTITION BY v.id ORDER BY
        {_CCOS.format(a='v.e', b='c.ce')} DESC, c.cid) rn
    FROM cv v CROSS JOIN cent_f c WHERE v.id < {N_QUERIES}) t
  WHERE rn <= {_IVF_INDEX_NPROBE})
SELECT query_id, neighbor_id, cos FROM (
  SELECT p.query_id, a.id AS neighbor_id,
    {_CCOS.format(a='p.qe', b='a.e')} AS cos,
    row_number() OVER (PARTITION BY p.query_id ORDER BY
      {_CCOS.format(a='p.qe', b='a.e')} DESC, a.id) AS rk
  FROM probes p JOIN asg_f a ON a.cid = p.cid AND a.id <> p.query_id) r
WHERE rk <= {TOP_K}
"""


@query("ann_ivf_index_search", oracle=_IVF_INDEX_ORACLE)
def ann_ivf_index_search(spark, sf_dir):
    """Persisted-IVF lifecycle: build the index (frozen Lloyd centroids,
    cell-partitioned parquet assignments, Hadoop-FS manifest), then
    answer queries through load_ivf_index + the partition-pruned probe.
    Scale shape: build is one assignment pass + one partitioned write;
    a search reads ~n_probe/k of the corpus in FILE terms (parquet
    PartitionFilters, pinned in tests/test_llmops.py), broadcasts only
    the k-row centroid relation, and never re-clusters."""
    import tempfile

    from bravo_spark import llmops
    from bravo_spark.inventory.scratch import register_for_exit

    cv = _clustered_cv(spark, sf_dir)
    cent = _lloyd_refine(cv).select("cid", F.col("ce").alias("centroid"))
    # per-call dir (this row deliberately times the full build+probe
    # lifecycle), but registered for exit cleanup — repeated bench runs
    # previously leaked one index dir per call for the process lifetime
    path = register_for_exit(tempfile.mkdtemp(prefix="bravo_ivf_idx_"))
    llmops.build_ivf_index(cv, path, id_col="id", vec_col="e", centroids=cent)
    return llmops.ivf_index_search(
        spark, path, cv.where(F.col("id") < N_QUERIES),
        k=TOP_K, n_probe=_IVF_INDEX_NPROBE,
    )


# ---------------------------------------------------------------------------
# IVF index maintenance surface (llmops.ivf_index_append +
# ivf_index_stats): append a batch to the persisted index under the
# FROZEN centroids, then read the per-cell health relation back. The
# gate projection keeps the exactly-replayable columns — per-cell vector
# count and min assignment cosine (the fixture's integer components make
# every dot product exact, so cosines are bitwise identical across
# engines); mean_cos / frac_of_corpus are float aggregates and stay
# library-side (consumed by llmops.ivf_index_compact, which is
# recall-gated in tests/test_llmops.py).
# ---------------------------------------------------------------------------

_IVF_STATS_APPEND_N = 50

_IVF_STATS_ORACLE = f"""
WITH {_lloyd_ctes()},
allv AS (
  SELECT id, e FROM cv
  UNION ALL
  SELECT id + 1000000 AS id, e FROM cv WHERE id < {_IVF_STATS_APPEND_N}),
asg AS (
  SELECT id, cid, ac FROM (
    SELECT v.id, c.cid, {_CCOS.format(a='v.e', b='c.ce')} AS ac,
      row_number() OVER (PARTITION BY v.id ORDER BY
        {_CCOS.format(a='v.e', b='c.ce')} DESC, c.cid) rn
    FROM allv v CROSS JOIN cent_f c) t WHERE rn = 1)
SELECT cid AS cell, CAST(count(*) AS BIGINT) AS n_vectors,
  min(ac) AS min_cos
FROM asg GROUP BY cid
"""


@query("ann_ivf_index_stats", oracle=_IVF_STATS_ORACLE)
def ann_ivf_index_stats(spark, sf_dir):
    """Persisted-IVF maintenance surface: build (frozen Lloyd
    centroids) + ivf_index_append of a derived batch (the first
    _IVF_STATS_APPEND_N = 50 vectors re-keyed — so the oracle can
    replay the append's assignment exactly) happen ONCE per process behind a
    completeness marker (the same write-once fixture discipline as the
    WARC archives — the build/write lifecycle cost is already measured
    by ann_ivf_index_search); every call then runs ivf_index_stats —
    the drift signal ivf_index_compact consumes. Scale shape: the
    append assigns only the batch (O(batch) work, parquet append into
    cell dirs); the stats pass is one partial-aggregated shuffle on
    cell over the assignments and returns k rows."""
    import hashlib
    import os

    from bravo_spark import llmops
    from bravo_spark.inventory.scratch import scratch_path

    cv = _clustered_cv(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = scratch_path(f"ivf_stats_{tag}")
    marker = os.path.join(path, "_BRAVO_FIXTURE_COMPLETE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        cent = _lloyd_refine(cv).select("cid",
                                        F.col("ce").alias("centroid"))
        llmops.build_ivf_index(cv, path, id_col="id", vec_col="e",
                               centroids=cent)
        llmops.ivf_index_append(
            spark, path,
            cv.where(F.col("id") < _IVF_STATS_APPEND_N).select(
                (F.col("id") + 1_000_000).alias("id"), "e"
            ),
        )
        open(marker, "w").close()
    return llmops.ivf_index_stats(spark, path).select(
        "cell",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        "min_cos",
    )
