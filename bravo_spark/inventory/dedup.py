"""Deduplication operators for large-scale training-data pipelines.

Four families, each designed for 100 TB first and oracle-checked at test SF:

- **exact**: hash-groupBy on normalized text — one shuffle on a 128-bit
  digest; no data-scale collects.
- **n-gram Jaccard**: exact all-pairs similarity via an inverted index
  (shingle → doc postings join). The shingle join IS the scale path: it
  shuffles on shingle (not doc²), and Catalyst/AQE handles postings skew.
- **MinHash + LSH**: signatures from a deterministic md5-derived hash
  family, banded; candidate pairs = any shared band. Fully deterministic,
  so even the LSH output is oracle-checkable — the oracle recomputes the
  same signatures in SQL.
- **SimHash**: 32-bit fingerprint from per-word hashes; near-dups share
  fingerprints (grouped), avoiding any pairwise join at scale.

Determinism: every hash is md5-derived (both engines agree bit-for-bit);
Jaccard's single double division is IEEE-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.registry import query

TOKEN_RE = "[a-z0-9]+"


@query(
    "dedup_exact",
    oracle=(
        "SELECT md5(lower(text)) AS sig, min(doc_id) AS keep_id,"
        " count(*) AS n_copies FROM documents GROUP BY 1"
    ),
)
def dedup_exact(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.lower("text")).alias("sig")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact all-pairs via inverted shingle index)
# ---------------------------------------------------------------------------

_JACCARD_T = 0.5
# posting-list skew cap: shingles in more documents than this are excluded
# from the similarity computation (Jaccard over the rare-shingle profile —
# the n-gram analog of stopword removal). Fixture shingle df maxes at 7
# (sf0.01) / 25 (sf0.1), so 100 changes nothing at test scale while
# bounding every posting list at corpus scale — one ubiquitous 3-gram can
# no longer create a doc² bucket in the self-join.
_MAX_SHINGLE_DF = 100


_NGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
  FROM documents WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) >= 3
), sh0 AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, len(ws)-1),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM toks
), rare AS (
  SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= {_MAX_SHINGLE_DF}
), sh AS (
  SELECT s.doc_id, s.sh FROM sh0 s JOIN rare r USING (sh)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_JACCARD_T}
"""


@query("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=_JACCARD_T,
        max_shingle_df=_MAX_SHINGLE_DF,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# 32-bit hash of a shingle under permutation j: the two 32-bit halves of ONE
# md5 digest combine as (a + j·b) mod 2^32 (Kirsch–Mitzenmacher double
# hashing) — one digest per shingle instead of N_HASHES, bit-identical on
# both engines. Matches llmops.minhash_signatures exactly.


def _h32_spark(j: int) -> str:
    a = "cast(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT)"
    b = "cast(conv(substring(md5(sh), 9, 8), 16, 10) AS BIGINT)"
    return f"({a} + {j} * {b}) % 4294967296"


def _h32_duck(j: int) -> str:
    a = "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT)"
    b = "CAST(('0x' || substr(md5(sh), 9, 8)) AS BIGINT)"
    return f"({a} + {j} * {b}) % 4294967296"


def _minhash_sql(dialect: str) -> str:
    h32 = _h32_spark if dialect == "spark" else _h32_duck
    mins = ", ".join(f"min({h32(j)}) AS m{j}" for j in range(N_HASHES))
    if dialect == "spark":
        sh_src = (
            "SELECT doc_id, explode(transform(sequence(0, size(ws)-3),"
            " i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh FROM ("
            f"SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}', 0) AS ws"
            " FROM documents) t WHERE size(ws) >= 3"
        )
    else:
        sh_src = (
            "SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),"
            " i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh FROM ("
            f"SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws"
            " FROM documents) t WHERE len(ws) >= 3"
        )
    return f"SELECT doc_id, {mins} FROM (SELECT DISTINCT doc_id, sh FROM ({sh_src}) s) d GROUP BY doc_id"


def _band_exprs() -> list[str]:
    out = []
    for b in range(N_BANDS):
        cols = ", ".join(f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        out.append(f"md5(concat_ws('_', {cols})) AS band{b}")
    return out


def _lsh_pairs_sql(dialect: str) -> str:
    sig = _minhash_sql(dialect)
    bands = ", ".join(_band_exprs())
    banded = f"SELECT doc_id, {bands} FROM ({sig}) s"
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS bh, '{b}' AS bi FROM ({banded}) t{i}"
        for i, b in enumerate(f"band{j}" for j in range(N_BANDS))
    )
    return (
        f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM ({unions}) a"
        f" JOIN ({unions}) b ON a.bh = b.bh AND a.bi = b.bi AND a.doc_id < b.doc_id"
    )


@query("dedup_minhash_signatures", oracle=_minhash_sql("duckdb"))
def dedup_minhash_signatures(spark, sf_dir):
    """Per-doc MinHash signature (16 hashes) — the building block; computed
    entirely map-side (per-doc shingle arrays, one md5 per shingle,
    permutations by double hashing): zero shuffles."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.minhash_signatures(docs, "doc_id", "text", n_hashes=N_HASHES)


@query("dedup_minhash_lsh", oracle=_lsh_pairs_sql("duckdb"))
def dedup_minhash_lsh(spark, sf_dir):
    """LSH candidate pairs: docs sharing ≥1 of 4 bands (4 rows each).
    At scale this replaces the all-pairs join with a band-bucket join; the
    banded relation is computed once and cached (the single-statement SQL
    kept as the oracle would evaluate the signature pipeline twice)."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, n_bands=N_BANDS
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit)
# ---------------------------------------------------------------------------


def _simhash_sql(dialect: str) -> str:
    if dialect == "spark":
        words = (
            "SELECT doc_id, explode(regexp_extract_all(lower(text),"
            f" '{TOKEN_RE}', 0)) AS w FROM documents"
        )
        h32 = "cast(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"
    else:
        words = (
            "SELECT doc_id, unnest(regexp_extract_all(lower(text),"
            f" '{TOKEN_RE}')) AS w FROM documents"
        )
        h32 = "CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)"
    bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (wh >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(32)
    )
    return (
        f"SELECT doc_id, {bits} AS simhash FROM ("
        f"SELECT doc_id, {h32} AS wh FROM ({words}) w) h GROUP BY doc_id"
    )


@query("dedup_simhash", oracle=_simhash_sql("duckdb"))
def dedup_simhash(spark, sf_dir):
    """32-bit SimHash per document (frequency-weighted word hashes); at
    scale near-dups are found by grouping on the fingerprint (or banding
    its bytes) — no pairwise join."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.simhash32(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (exact; threshold picked for the
# synthetic embeddings' similarity range)
# ---------------------------------------------------------------------------

_COS_T = 0.4

_DOT_DUCK = "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
_NORM_DUCK = (
    "sqrt(list_dot_product(CAST({s}.embedding AS DOUBLE[]),"
    " CAST({s}.embedding AS DOUBLE[])))"
)

_EMB_PAIRS_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  {_DOT_DUCK} / ({_NORM_DUCK.format(s='a')} * {_NORM_DUCK.format(s='b')}) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_DOT_DUCK} / ({_NORM_DUCK.format(s='a')} * {_NORM_DUCK.format(s='b')}) >= {_COS_T}
"""


@query("dedup_embedding_cosine", oracle=_EMB_PAIRS_ORACLE)
def dedup_embedding_cosine(spark, sf_dir):
    """Exact near-dup pairs by cosine ≥ t. Float determinism: dot products
    fold left-to-right in float64 on both engines (verified); the remaining
    ops are single IEEE operations. At 100 TB the all-pairs join is replaced
    by the LSH bucketing of ann_lsh_bucket — this is the exact baseline.

    table_spread (r19): the quadratic pair fold runs on the STREAM side
    of the nested-loop join, and the fixture's one-split scan ran all
    n²/2 cosines on ONE core (43 s single-run at sf0.1 → ~2 s spread);
    production inputs carry many splits and the spread is a no-op."""
    emb = catalog.table_spread(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    withnorm = emb.select(
        "vec_id",
        dbl.alias("e"),
        F.sqrt(
            F.aggregate(
                F.zip_with(dbl, dbl, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    a = withnorm.alias("a")
    b = withnorm.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= _COS_T)
    )


# ---------------------------------------------------------------------------
# embedding near-dup via LSH candidates → exact-cosine verify: the scale
# path a user should reach by default (llmops.embedding_near_dup_pairs).
# Candidates come from byte-bands of the 256-bit signature (equi-join on
# (band, value) — no BroadcastNestedLoopJoin anywhere in the plan, pinned
# by tests/test_plans.py), then exact cosine decides. The all-pairs form
# above remains only as the exact baseline.
# ---------------------------------------------------------------------------

_LSH_BAND_BITS = 8
_LSH_BANDS_PER_WORD = 32 // _LSH_BAND_BITS


def _emb_lsh_oracle() -> str:
    from bravo_spark.inventory.similarity import sketch_words_cte

    return f"""
WITH {sketch_words_cte()},
bands AS (
  SELECT vec_id, w * {_LSH_BANDS_PER_WORD} + s AS bi,
         (word >> (s * {_LSH_BAND_BITS})) & {(1 << _LSH_BAND_BITS) - 1} AS bh
  FROM words, range({_LSH_BANDS_PER_WORD}) rs(s)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.bi = b.bi AND a.bh = b.bh AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
  {_DOT_DUCK} / ({_NORM_DUCK.format(s='a')} * {_NORM_DUCK.format(s='b')}) AS cos
FROM cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE {_DOT_DUCK} / ({_NORM_DUCK.format(s='a')} * {_NORM_DUCK.format(s='b')}) >= {_COS_T}
"""


@query("dedup_embedding_lsh", oracle=_emb_lsh_oracle())
def dedup_embedding_lsh(spark, sf_dir):
    from bravo_spark import llmops
    from bravo_spark.inventory.similarity import SKETCH_DIM, SKETCH_PLANES

    emb = catalog.table(spark, sf_dir, "embeddings")
    return llmops.embedding_near_dup_pairs(
        emb, "vec_id", "embedding",
        threshold=_COS_T, dim=SKETCH_DIM, n_planes=SKETCH_PLANES,
        band_bits=_LSH_BAND_BITS,
    )


# ---------------------------------------------------------------------------
# Dedup clustering: connected components over the near-dup pair graph.
# The iterative min-label propagation below is the standard distributed CC
# (what GraphFrames does); each iteration is one join+aggregate, and the
# loop runs on the driver until a fixpoint — the legitimate Spark pattern
# for iterative algorithms. The oracle computes the same components with a
# recursive CTE (fine at oracle scale; the Spark path is the 100 TB path).
# ---------------------------------------------------------------------------

def _cluster_cte_sql() -> str:
    """Shared recursive-CTE prelude computing MinHash-LSH near-dup cluster
    labels — CTEs ``pairs``/``edges``/``reach``/``cl`` (cl: doc_id,
    cluster_id). Every oracle needing cluster labels composes this ONE
    definition (compose as ``WITH RECURSIVE {_cluster_cte_sql()}, ...``),
    so a change to cluster semantics cannot desynchronize one oracle from
    the Spark implementation."""
    return f"""pairs AS ({_lsh_pairs_sql('duckdb')}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node)"""


_CLUSTER_ORACLE = f"""
WITH RECURSIVE {_cluster_cte_sql()}
SELECT doc_id, cluster_id FROM cl
"""


@query("dedup_clusters", oracle=_CLUSTER_ORACLE)
def dedup_clusters(spark, sf_dir):
    from bravo_spark import llmops

    pairs = dedup_minhash_lsh(spark, sf_dir)
    return llmops.connected_components(pairs)


# ---------------------------------------------------------------------------
# Benchmark decontamination: word-n-gram overlap between the training corpus
# and a held-out evaluation set (doc_id % 97 = 0 plays the benchmark here).
# The eval shingle relation broadcasts; train shingles stream past it.
# ---------------------------------------------------------------------------

_DECON_N = 4

_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(0, len(ws) - {_DECON_N - 1}),
    i -> concat_ws(' ', {", ".join(f"ws[i+{k+1}]" for k in range(_DECON_N))})
  ))) AS sh
  FROM toks WHERE len(ws) >= {_DECON_N}
),
ev AS (SELECT doc_id AS eval_id, sh FROM grams WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, sh FROM grams WHERE doc_id % 97 <> 0)
SELECT tr.doc_id, count(DISTINCT tr.sh) AS n_shared_ngrams,
       count(DISTINCT ev.eval_id) AS n_eval_docs
FROM tr JOIN ev ON tr.sh = ev.sh
GROUP BY tr.doc_id
"""


@query("decontaminate_overlap", oracle=_DECON_ORACLE)
def decontaminate_overlap(spark, sf_dir):
    """Training docs contaminated by the pseudo-benchmark (any shared word
    4-gram), with overlap counts. llmops.decontaminate: broadcast the eval
    shingles, one shuffle on the train side."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    return llmops.decontaminate(tr, ev, "doc_id", "text", n=_DECON_N)


# ---------------------------------------------------------------------------
# Incremental dedup: a new ingest batch (doc_id % 5 = 0 plays today's
# batch) checked against the existing corpus — exact digests + shared LSH
# bands, both as semi joins keyed on digest/band. The corpus never pairs
# with itself: O(batch), not O(corpus²).
# ---------------------------------------------------------------------------


def _incremental_oracle() -> str:
    sig = _minhash_sql("duckdb")
    bands = ", ".join(_band_exprs())
    banded = f"SELECT doc_id, {bands} FROM ({sig}) s"
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS bh, '{b}' AS bi FROM ({banded}) u{i}"
        for i, b in enumerate(f"band{j}" for j in range(N_BANDS))
    )
    return f"""
WITH un AS ({unions}),
near AS (
  SELECT DISTINCT n.doc_id FROM un n
  JOIN un c ON n.bi = c.bi AND n.bh = c.bh
  WHERE n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
),
exact AS (
  SELECT DISTINCT n.doc_id FROM documents n
  JOIN documents c ON md5(lower(n.text)) = md5(lower(c.text))
  WHERE n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
)
SELECT d.doc_id,
  CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS exact_dup,
  CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS near_dup
FROM documents d
LEFT JOIN exact e ON d.doc_id = e.doc_id
LEFT JOIN near nr ON d.doc_id = nr.doc_id
WHERE d.doc_id % 5 = 0 AND (e.doc_id IS NOT NULL OR nr.doc_id IS NOT NULL)
"""


@query("dedup_incremental_batch", oracle=_incremental_oracle())
def dedup_incremental_batch(spark, sf_dir):
    """New-batch-vs-corpus dedup flags via llmops.dedup_against_corpus."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return llmops.dedup_against_corpus(
        new, corpus, "doc_id", "text", n_hashes=N_HASHES, n_bands=N_BANDS
    )


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2022): documents sharing any exact run
# of WINDOW consecutive tokens — the distributed inverted-window equivalent
# of the paper's suffix-array dedup (llmops.substring_collision_pairs).
# ---------------------------------------------------------------------------

_SUB_WINDOW = 15
# posting-list skew cap, same rationale as _MAX_SHINGLE_DF: 15-token
# boilerplate windows (headers, license blocks) in more documents than
# this are dropped before the self-join. Fixture window df maxes well
# below 100, so the cap changes nothing at test scale while bounding
# every posting list at corpus scale.
_MAX_WINDOW_DF = 100


def _substring_oracle() -> str:
    n = _SUB_WINDOW
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
  FROM documents
), wins0 AS (
  SELECT DISTINCT doc_id, md5(array_to_string(ws[i:i+{n - 1}], ' ')) AS w
  FROM (
    SELECT doc_id, ws, unnest(range(1, len(ws) - {n} + 2)) AS i
    FROM toks WHERE len(ws) >= {n})
), frequent AS (
  SELECT w FROM wins0 GROUP BY w HAVING count(*) > {_MAX_WINDOW_DF}
), wins AS (
  SELECT doc_id, w FROM wins0 WHERE w NOT IN (SELECT w FROM frequent)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM wins a JOIN wins b ON a.w = b.w AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@query("dedup_substring", oracle=_substring_oracle())
def dedup_substring(spark, sf_dir):
    """Exact {n}-token substring collision pairs over the corpus."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.substring_collision_pairs(
        docs, "doc_id", "text", window=_SUB_WINDOW,
        max_window_df=_MAX_WINDOW_DF,
    )


# ---------------------------------------------------------------------------
# line-level dedup (RefinedWeb / C4 boilerplate strip): lines appearing in
# more than _LINE_DF_CAP distinct documents are removed from every document
# (llmops.line_dedup_clean). The fixture documents are single-line, so the
# query builds deterministic multi-line "pages" around each: two global
# boilerplate lines (df = corpus), a per-source line (df = 25 per source
# group), a per-triple line (df <= 3), and a per-document line (df = 1) —
# the cap of 10 removes exactly the global + per-source lines and keeps
# body, per-triple, and per-document lines.
# ---------------------------------------------------------------------------

_LINE_DF_CAP = 10
_NAV_LINE = "NAV: home products docs contact about"
_FOOT_LINE = "COPYRIGHT 2026 example corpus all rights reserved"


def _line_dedup_oracle() -> str:
    return f"""
WITH pages AS (
  SELECT doc_id,
    '{_NAV_LINE}' || chr(10) ||
    'SRC: mirror of ' || source || ' collection index' || chr(10) ||
    text || chr(10) ||
    'GROUP: shard ' || CAST(doc_id // 3 AS VARCHAR) || ' of corpus' || chr(10) ||
    'REF: document ' || CAST(doc_id AS VARCHAR) || chr(10) ||
    '{_FOOT_LINE}' AS text
  FROM documents
), lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM pages
), freq AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS dfc FROM lines
    WHERE length(line) >= 10 GROUP BY line) t
  WHERE dfc > {_LINE_DF_CAP}
)
SELECT l.doc_id,
  coalesce(string_agg(CASE WHEN f.line IS NULL THEN l.line END,
                      chr(10) ORDER BY l.pos), '') AS clean_text,
  count(CASE WHEN f.line IS NOT NULL THEN 1 END) AS n_removed
FROM lines l LEFT JOIN freq f ON l.line = f.line
GROUP BY l.doc_id
"""


@query("dedup_lines", oracle=_line_dedup_oracle())
def dedup_lines(spark, sf_dir):
    """Cross-document line-level boilerplate removal over synthetic pages."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit(_NAV_LINE),
            F.concat(F.lit("SRC: mirror of "), F.col("source"),
                     F.lit(" collection index")),
            F.col("text"),
            F.concat(F.lit("GROUP: shard "),
                     F.expr("CAST(doc_id div 3 AS STRING)"),
                     F.lit(" of corpus")),
            F.concat(F.lit("REF: document "), F.col("doc_id").cast("string")),
            F.lit(_FOOT_LINE),
        ).alias("text"),
    )
    return llmops.line_dedup_clean(
        pages, "doc_id", "text", max_line_df=_LINE_DF_CAP
    )


# ---------------------------------------------------------------------------
# exact-substring dedup with SPAN REMOVAL — the actual output of Lee et al.
# 2022's dedup tool (llmops.substring_dedup_clean): every token covered by
# a repeated window is cut, survivors reassembled. A smaller window than
# dedup_substring's so the fixture corpus genuinely loses spans.
# ---------------------------------------------------------------------------

_CLEAN_WINDOW = 10


def _substring_clean_oracle() -> str:
    k = _CLEAN_WINDOW
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
  FROM documents
), wins AS (
  SELECT doc_id, i AS start, md5(array_to_string(ws[i:i+{k - 1}], ' ')) AS h
  FROM (
    SELECT doc_id, ws, unnest(range(1, len(ws) - {k} + 2)) AS i
    FROM base WHERE len(ws) >= {k}) t
), duph AS (
  SELECT h FROM wins GROUP BY h HAVING count(*) > 1
), tok AS (
  SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS pos
  FROM base
), covp AS (
  SELECT DISTINCT doc_id, unnest(range(start, start + {k})) AS pos
  FROM wins WHERE h IN (SELECT h FROM duph)
), kept AS (
  SELECT t.doc_id, t.tok, t.pos FROM tok t
  ANTI JOIN covp c ON t.doc_id = c.doc_id AND t.pos = c.pos
), totals AS (
  SELECT doc_id, len(ws) AS n FROM base WHERE len(ws) > 0
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY 1
)
SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
       t.n - coalesce(a.n_kept, 0) AS n_removed
FROM totals t LEFT JOIN agg a USING (doc_id)
"""


@query("dedup_substring_clean", oracle=_substring_clean_oracle())
def dedup_substring_clean(spark, sf_dir):
    """Corpus with every repeated 10-token run removed, per document."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    return llmops.substring_dedup_clean(
        docs, "doc_id", "text", window=_CLEAN_WINDOW
    )


# ---------------------------------------------------------------------------
# dedup materializer: pairs -> clusters -> kept corpus (the step a real
# pipeline actually ships — one minimum-id representative per near-dup
# cluster, singletons untouched). Composes the LSH pair finder with
# llmops.keep_cluster_representatives; the oracle recomputes the clusters
# with a recursive CTE over the same deterministic LSH pairs.
# ---------------------------------------------------------------------------

_KEEP_ORACLE = f"""
WITH RECURSIVE {_cluster_cte_sql()},
sizes AS (SELECT cluster_id, count(*) AS n FROM cl GROUP BY 1)
SELECT d.doc_id, coalesce(s.n, 1) AS cluster_size
FROM documents d
LEFT JOIN cl ON d.doc_id = cl.doc_id
LEFT JOIN sizes s ON cl.cluster_id = s.cluster_id
WHERE cl.doc_id IS NULL OR cl.doc_id = cl.cluster_id
"""


@query("dedup_keep_corpus", oracle=_KEEP_ORACLE)
def dedup_keep_corpus(spark, sf_dir):
    """Kept (deduplicated) corpus after MinHash-LSH clustering."""
    from bravo_spark import llmops

    docs = catalog.table_spread(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    kept = llmops.keep_cluster_representatives(
        docs.select("doc_id"), pairs
    )
    return kept.select("doc_id", F.col("cluster_size").cast("long"))


# ---------------------------------------------------------------------------
# LSH quality eval: precision/recall of the MinHash-LSH candidate pairs
# against the exact Jaccard >= threshold ground truth — the dedup analog of
# the ANN recall evals, in exact integer ppm. Quantifies the
# candidate-generation trade-off the banding parameters buy.
# ---------------------------------------------------------------------------

_LSH_EVAL_ORACLE = f"""
WITH exact AS (SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE}) x),
cand AS ({_lsh_pairs_sql('duckdb')}),
hit AS (
  SELECT count(*) AS n_hit FROM cand c
  JOIN exact e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
), sizes AS (
  SELECT (SELECT count(*) FROM exact) AS n_exact,
         (SELECT count(*) FROM cand) AS n_cand
)
SELECT n_exact, n_cand, n_hit,
  CASE WHEN n_cand = 0 THEN 0
       ELSE CAST(n_hit * 1000000 // n_cand AS BIGINT) END AS precision_ppm,
  CASE WHEN n_exact = 0 THEN 0
       ELSE CAST(n_hit * 1000000 // n_exact AS BIGINT) END AS recall_ppm
FROM sizes, hit
"""


@query("dedup_lsh_quality_eval", oracle=_LSH_EVAL_ORACLE)
def dedup_lsh_quality_eval(spark, sf_dir):
    """Precision/recall (exact integer ppm) of the LSH candidate pairs vs
    the exact-Jaccard ground truth the pair finder computes."""
    exact = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    cand = dedup_minhash_lsh(spark, sf_dir)
    hit = cand.join(exact, ["doc_a", "doc_b"]).agg(
        F.count("*").alias("n_hit")
    )
    sizes = (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(cand.agg(F.count("*").alias("n_cand")))
    )
    return (
        sizes.crossJoin(F.broadcast(hit))
        .selectExpr(
            "n_exact", "n_cand", "n_hit",
            "CASE WHEN n_cand = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(n_hit * 1000000 div n_cand AS BIGINT) END"
            " AS precision_ppm",
            "CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(n_hit * 1000000 div n_exact AS BIGINT) END"
            " AS recall_ppm",
        )
    )


# ---------------------------------------------------------------------------
# URL-level dedup (r17): the FIRST dedup stage of a CommonCrawl-shaped
# pipeline — CCNet/RefinedWeb collapse scheme/host/tracking-param URL
# variants BEFORE any content pass. The fixture synthesizes four
# deterministic variant classes per URL group from doc_id, runs the
# real canonicalizer (llmops.canonicalize_urls — urllib-backed, not a
# regexp approximation), and dedups on the canonical form; the oracle
# replays the variants' canonical form CLOSED-FORM from doc_id, so a
# canonicalizer that fails to collapse (or over-collapses) any variant
# class hash-fails.
# ---------------------------------------------------------------------------

# The closed-form canonical URL of the synthesized messy variants, as
# SQL over documents — shared by the dedup row's oracle and the composed
# pipeline's url_dup stage so both replay the SAME contract.
_URL_CANON_SQL = """
  SELECT doc_id,
    'site' || CAST((doc_id // 4) % 50 AS VARCHAR) || '.example/p/'
      || CAST(doc_id // 4 AS VARCHAR)
      || CASE WHEN doc_id % 4 = 3 THEN '?a=1&b=2' ELSE '' END
      AS canonical_url
  FROM documents
"""

_URL_DEDUP_ORACLE = f"""
SELECT canonical_url,
  CAST(count(*) AS BIGINT) AS n_dupes,
  CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM ({_URL_CANON_SQL}) canon GROUP BY canonical_url
"""


def _messy_url_col():
    """The four deterministic messy-URL variant classes per doc_id —
    plain https, shouted ``HTTP://WWW.…:80`` + fragment, ``:443`` +
    trailing slash + utm_source, and shuffled real params + a
    utm_campaign. The REAL canonicalizer must collapse them to the
    closed forms ``_URL_CANON_SQL`` replays."""
    g = (F.col("doc_id") / 4).cast("long")
    host = F.concat(F.lit("site"), (g % 50).cast("string"),
                    F.lit(".example"))
    pth = F.concat(F.lit("/p/"), g.cast("string"))
    v = F.col("doc_id") % 4
    return (
        F.when(v == 0, F.concat(F.lit("https://"), host, pth))
        .when(v == 1, F.concat(F.lit("HTTP://WWW."), F.upper(host),
                               F.lit(":80"), pth, F.lit("#frag")))
        .when(v == 2, F.concat(F.lit("https://"), host, F.lit(":443"),
                               pth, F.lit("/?utm_source=x")))
        .otherwise(F.concat(F.lit("https://"), host, pth,
                            F.lit("?b=2&utm_campaign=y&a=1")))
    )


@query("dedup_url_canonical", oracle=_URL_DEDUP_ORACLE)
def dedup_url_canonical(spark, sf_dir):
    """URL canonicalization + dedup: four messy variants per group —
    plain https, shouted ``HTTP://WWW.…:80`` with a fragment, ``:443``
    with a trailing slash and a ``utm_source`` param, and one with real
    params in shuffled order plus a ``utm_campaign`` — must collapse to
    one canonical form (the param-bearing variant keeps its sorted
    non-tracking params, so each group yields exactly two canonicals).
    Keep rule: lowest doc_id. Scale shape: canonicalization is map-only
    Arrow batches; the dedup is ONE shuffle on the canonical string —
    the same hash-groupBy spine as dedup_exact."""
    from bravo_spark import llmops

    docs = catalog.table(spark, sf_dir, "documents").select("doc_id")
    with_urls = docs.select("doc_id", _messy_url_col().alias("url"))
    canon = llmops.canonicalize_urls(with_urls, "url")
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_dupes"),
        F.min("doc_id").alias("keep_doc_id"),
    )
