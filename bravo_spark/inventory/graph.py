"""Link-graph centrality for corpus quality weighting.

Web-scale training corpora weight domains/pages by link-graph
centrality (CommonCrawl-style harvests rank hosts by PageRank-like
scores before sampling). This module runs the canonical Pregel-shaped
iteration on Spark: edges pre-joined with out-degrees and checkpointed
once, then each round is exactly one join shuffle (ranks onto edge
sources) plus one aggregation shuffle (mass onto targets) — the plan a
1000-executor job wants, with lineage truncated per round so the DAG
does not grow with the iteration count.

Cross-engine exactness: ranks are integers in fixed-point units and
every transfer uses floor division, so each iteration is bit-identical
in any engine — no float summation order, no transcendentals. The
damping term uses the initial uniform rank (a deterministic variant of
the 0.15/N teleport; mass lost to flooring is deliberately NOT
redistributed, same in both engines). The DuckDB oracle unrolls the
fixed iteration count into chained CTEs, the same pattern as
``bpe_train_merges``.

The link graph itself is derived deterministically from doc_ids (each
document links to one-to-three hash-selected neighbors, so degrees and
therefore ranks genuinely vary) and the operator has an exact oracle on
the driver's fixture tables; on a real corpus the edge relation comes
from the harvest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.registry import query

_ITERS = 5
_SCALE = 10**12
_MULT = 2654435761  # Knuth multiplicative hash constant
_STEP = 40503


def _pagerank_oracle() -> str:
    """The _ITERS-round iteration unrolled into chained CTEs."""
    rounds = []
    prev = "r0"
    for k in range(1, _ITERS + 1):
        rounds.append(
            f"""r{k} AS (
  SELECT nd.v AS v,
    CAST((SELECT b FROM base)
      + (85 * COALESCE(SUM({prev}.r // deg.d), 0)) // 100 AS BIGINT) AS r
  FROM nodes nd
  LEFT JOIN edges e ON e.t = nd.v
  LEFT JOIN {prev} ON {prev}.v = e.s
  LEFT JOIN deg ON deg.s = e.s
  GROUP BY nd.v)"""
        )
        prev = f"r{k}"
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS v FROM documents),
raw_edges AS (
  SELECT v AS s,
    (v * {_MULT} + j * {_STEP}) % (SELECT n FROM nn) AS t0
  FROM nodes, (SELECT UNNEST([1, 2, 3]) AS j) js
  WHERE j <= 1 + v % 3),
edges AS (
  SELECT DISTINCT s,
    CASE WHEN t0 = s THEN (t0 + 1) % (SELECT n FROM nn) ELSE t0 END AS t
  FROM raw_edges),
deg AS (SELECT s, COUNT(*) AS d FROM edges GROUP BY s),
base AS (SELECT (15 * ({_SCALE} // n)) // 100 AS b FROM nn),
r0 AS (SELECT v, {_SCALE} // (SELECT n FROM nn) AS r FROM nodes),
{",".join(rounds)}
SELECT v AS doc_id, r AS rank_units
FROM {prev} ORDER BY r DESC, v LIMIT 20
"""


@query("pagerank_centrality", oracle=_pagerank_oracle())
def pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by 5-round integer-exact PageRank over the
    hash-derived link graph (1-3 out-links per doc, self-links remapped).

    Scale shape: the edge+degree relation is built once (one distinct +
    one count shuffle) and localCheckpoint'ed; each round is one join
    shuffle on the source id and one sum shuffle on the target id —
    shuffle volume O(edges) per round, never O(N²). The only driver
    value is N (a count). Lineage truncated per round so 50 rounds plan
    like 5."""
    docs = catalog.table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("v")
    )
    n = docs.count()  # metadata-scale: one long on the driver
    r0 = _SCALE // n
    base = (15 * r0) // 100

    js = spark.range(1, 4).select(F.col("id").alias("j"))
    t0 = (F.col("v") * F.lit(_MULT) + F.col("j") * F.lit(_STEP)) % F.lit(n)
    edges = (
        docs.crossJoin(F.broadcast(js))
        # degree-varied graph (1-3 out-links by id) so ranks actually
        # differentiate — an all-permutation graph ties every node
        .filter(F.col("j") <= 1 + F.col("v") % 3)
        .select("v", t0.alias("t0"))
        .select(
            F.col("v").alias("s"),
            F.when(F.col("t0") == F.col("v"), (F.col("t0") + 1) % F.lit(n))
            .otherwise(F.col("t0"))
            .alias("t"),
        )
        .distinct()
    )
    deg = edges.groupBy("s").agg(F.count("*").alias("d"))
    ed = edges.join(deg, "s").localCheckpoint()  # reused every round

    ranks = docs.select("v", F.lit(r0).alias("r"))
    for _ in range(_ITERS):
        contrib = ed.join(ranks, ed["s"] == ranks["v"]).select(
            ed["t"].alias("v"), F.expr("r div d").alias("c")
        )
        mass = contrib.groupBy("v").agg(F.sum("c").alias("m"))
        ranks = (
            docs.join(mass, "v", "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.expr("(85 * coalesce(m, 0L)) div 100")
                ).alias("r"),
            )
            .localCheckpoint()
        )

    return (
        ranks.orderBy(F.col("r").desc(), F.col("v"))
        .limit(20)
        .select(F.col("v").alias("doc_id"), F.col("r").alias("rank_units"))
    )


# ---------------------------------------------------------------------------
# Web link graph — r19. The crawl pipeline's edge-extraction stage
# (llmops.extract_links -> llmops.host_link_graph, landed r18) under the
# oracle gate: deterministic anchor-carrying HTML is built IN-PLAN from
# `documents` (map-only JVM concat — no fixture, no write floor; the
# crawl READ path is already gated by warc_html_extract), then hrefs are
# regex-extracted, urljoin-resolved against the page URL, canonicalized,
# and collapsed to the host graph. Each page carries the href forms a
# real crawl holds: an absolute URL, a protocol-relative //host form
# with a tracking param (dropped by canonicalization), a relative path
# (same host -> host-grain self-loop, dropped), a javascript: link and a
# bare #fragment (both dropped by extract_links), an uppercased
# www.HOST:443 form (case/www/default-port collapse), plus a <link>
# element and a data-href decoy the anchor regex must NOT match. The
# oracle replays the surviving edge set closed-form from the doc_id
# arithmetic.
# ---------------------------------------------------------------------------

_WEB_LINK_ORACLE = """
WITH d AS (
  SELECT doc_id % 13 AS s,
         (7 * doc_id + 1) % 13 AS t1,
         (3 * doc_id + 5) % 13 AS t2,
         (5 * doc_id + 3) % 13 AS t3
  FROM documents
), e AS (
  SELECT s, t1 AS t FROM d WHERE t1 <> s
  UNION ALL SELECT s, t2 FROM d WHERE t2 <> s
  UNION ALL SELECT s, t3 FROM d WHERE t3 <> s
)
SELECT 'h' || CAST(s AS VARCHAR) || '.example' AS src_host,
       'h' || CAST(t AS VARCHAR) || '.example' AS dst_host,
       count(*) AS n_links
FROM e GROUP BY 1, 2
"""


@query("web_link_graph", oracle=_WEB_LINK_ORACLE)
def web_link_graph(spark, sf_dir):
    """Crawl-edge extraction end to end: per-document HTML (built
    in-plan, deterministic anchors derived from doc_id) -> href regex
    explode -> urljoin resolve + URL canonicalization (Arrow stage) ->
    host collapse -> (src_host, dst_host, n_links). Proves which link
    forms become graph edges: absolute and protocol-relative hrefs
    survive (tracking params canonicalized away, case/www/:443
    collapsed), relative same-host links die at the self-loop filter,
    javascript:/#fragment links die at extraction, and non-anchor
    href attributes (<link>, data-href) never match.

    Scale shape: one JVM regex explode + one Arrow resolve stage
    (shuffle-free), then host_link_graph's single partial-aggregated
    shuffle on the host pair — the full corpus is never shuffled at
    page grain. table_spread (not table): the per-href Python
    urljoin/canonicalize stage is CPU-heavy per document, and the
    fixture parquet is a single row group — at production scale the
    spread is a no-op (see catalog.table_spread)."""
    from bravo_spark import llmops as lo

    docs = catalog.table_spread(spark, sf_dir, "documents").select(
        "doc_id", "text")
    d = F.col("doc_id")

    def host(expr):
        return F.concat(F.lit("h"), (expr % 13).cast("string"),
                        F.lit(".example"))

    sid = d.cast("string")
    page = docs.select(
        "doc_id",
        F.concat(F.lit("http://www."), host(d), F.lit(":80/page/"),
                 sid).alias("page_url"),
        F.concat(
            F.lit('<html><head><title>p</title>'
                  '<link rel="alternate" href="http://nope.example/">'
                  '</head><body><p>'),
            F.substring("text", 1, 48),
            F.lit('</p><a class="n" data-href="http://decoy.example/"'
                  ' href="http://'),
            host(d * 7 + 1), F.lit("/a/"), sid,
            F.lit('">first</a><a href=\'//'),
            host(d * 3 + 5), F.lit("/b?utm_source=x&id="), sid,
            F.lit('\'>second</a><a href="/self/'), sid,
            F.lit('">self</a><a href="javascript:void(0)">js</a>'
                  '<a href="#frag">top</a><a href="http://WWW.'),
            F.upper(host(d * 5 + 3)),
            F.lit(':443/c">third</a></body></html>'),
        ).alias("html"),
    )
    edges = lo.extract_links(page, "html", "page_url")
    return lo.host_link_graph(edges, "page_url", "link")
