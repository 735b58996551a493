"""LLM-data-pipeline operators as a parameterized DataFrame API.

The inventory queries (bravo_spark.inventory.dedup / similarity) pin these
operators to the fixture tables for the oracle gate; this module is the
user-facing surface: every operator is DataFrame-in → DataFrame-out,
parameterized by column names and thresholds, with no dependency on the
test catalog. All hashing is md5-derived (deterministic across engines,
re-runs, and cluster layouts).

Scale notes are on each function; the common theme: inverted-index /
band-bucket joins instead of all-pairs products, map-side expressions
instead of Python, and explicit broadcast for per-key-small relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def _h32(expr: str) -> str:
    """32-bit md5-derived hash as a Spark SQL fragment (matches the DuckDB
    ``('0x' || substr(md5(x),1,8))::BIGINT`` form bit-for-bit)."""
    return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, sh). Map-side only."""
    idx = ", ".join(f"ws[i+{k}]" for k in range(n))
    toks = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)").alias("ws"),
    ).filter(F.size("ws") >= n)
    return toks.select(
        "id",
        F.explode(
            F.expr(f"transform(sequence(0, size(ws)-{n}), i -> concat_ws(' ', {idx}))")
        ).alias("sh"),
    ).distinct()


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(sig, keep_id, n_copies): one shuffle on a 128-bit digest."""
    return df.groupBy(F.md5(F.lower(text_col)).alias("sig")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, *, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ threshold via the inverted shingle index:
    shuffles on shingle (not doc²); the index is cached because it feeds the
    self-join twice plus the size table."""
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, n_hashes: int = 16, n: int = 3
) -> DataFrame:
    """(id, m0..m{n_hashes-1}): one shuffle (groupBy id) over the shingle
    relation; each permutation is an independent md5-derived hash."""
    sh = shingles(df, id_col, text_col, n)
    mins = [
        F.min(F.expr(_h32(f"concat('{j}', ':', sh)"))).alias(f"m{j}")
        for j in range(n_hashes)
    ]
    return sh.groupBy(F.col("id").alias("doc_id")).agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    n_bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: documents agreeing on ≥1 LSH band. The
    banded relation is computed once and cached; the join key is
    (band index, band hash) — a bucket join, never doc²."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes, n=n)
    band_cols = []
    for b in range(n_bands):
        cols = ", ".join(f"m{b * rows_per_band + r}" for r in range(rows_per_band))
        band_cols.append(F.expr(f"md5(concat_ws('_', {cols}))").alias(f"band{b}"))
    banded = sig.select("doc_id", *band_cols)
    stacked = None
    for b in range(n_bands):
        part = banded.select(
            "doc_id", F.col(f"band{b}").alias("bh"), F.lit(f"band{b}").alias("bi")
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    stacked = stacked.cache()
    a, b_ = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 32-bit frequency-weighted fingerprint; near-dups are
    found by grouping/banding the fingerprint — no pairwise join."""
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("w"),
    ).withColumn("wh", F.expr(_h32("w")))
    bits = None
    for j in range(32):
        bit = F.when(
            F.sum(
                F.when(F.expr(f"(wh >> {j}) & 1 = 1"), 1).otherwise(-1)
            ) > 0,
            F.lit(1 << j).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        bits = bit if bits is None else bits + bit
    return words.groupBy("doc_id").agg(bits.alias("simhash"))


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", *, max_iter: int = 20
) -> DataFrame:
    """(doc_id, cluster_id=min reachable id) by iterative min-label
    propagation — one join+aggregate per iteration, driver-coordinated loop
    until fixpoint (the GraphFrames CC pattern)."""
    p = pairs.cache()
    edges = (
        p.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(p.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .cache()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = labels.join(neigh, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.cache()
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector. Queries are
    broadcast; candidates stream. Deterministic: float64 left-fold dots,
    id tiebreak on equal similarity."""
    dbl = F.col(vec_col).cast("array<double>")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), dbl.alias("ce")
    ).withColumn("cn", F.sqrt(dot(F.col("ce"), F.col("ce"))))
    q = queries.select(F.col(id_col).alias("query_id"), dbl.alias("qe")).withColumn(
        "qn", F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    cos = dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
