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

# Intermediates cached by this module, so long-running sessions can bound
# executor memory: release_caches() unpersists everything still live
# (unpersist is always safe — a not-yet-evaluated consumer just recomputes).
_LIVE_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and enroll it in the release_caches() lifecycle.

    PUBLIC contract for other modules (e.g. inventory/textops.py) that
    want query-cycle-scoped caching: anything cached through here is
    unpersisted by the registry wrapper's release_caches() before the
    next query, so repeated queries never accrete executor memory."""
    df = df.cache()
    _LIVE_CACHES.append(df)
    return df


# internal alias (predates the public name; same object, same lifecycle)
_cache = track_cache


def release_caches() -> None:
    """Unpersist every intermediate this module has cached. Called by the
    inventory query wrapper before each query (caches live exactly one
    query cycle) and usable directly in long sessions."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


def _h32(expr: str) -> str:
    """32-bit md5-derived hash as a Spark SQL fragment (matches the DuckDB
    ``('0x' || substr(md5(x),1,8))::BIGINT`` form bit-for-bit)."""
    return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    *,
    assert_unique: bool = False,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, sh). Map-side only —
    within-document dedup is ``array_distinct`` over the per-row shingle
    array BEFORE the explode (a document's shingles live in one row), not a
    post-explode ``distinct()``, which would shuffle the entire (id, sh)
    relation just to dedup groups that never span rows.

    PRECONDITION (as for every text op in this module): ``df`` has one row
    per ``id_col`` value. Pre-chunked corpora (several rows per document)
    must be reassembled first — duplicate (id, sh) pairs from sibling
    chunks would otherwise inflate the count(*)-based set sizes and
    intersections downstream. Pass ``assert_unique=True`` to verify the
    precondition inside the plan (one extra shuffle on id): a violating
    corpus then raises instead of silently corrupting similarity scores."""
    idx = ", ".join(f"ws[i+{k}]" for k in range(n))
    toks = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)").alias("ws"),
    )
    if assert_unique:
        from pyspark.sql import Window

        toks = (
            toks.withColumn(
                "_nrows", F.count(F.lit(1)).over(Window.partitionBy("id"))
            )
            .withColumn(
                "ws",
                F.when(
                    F.col("_nrows") > 1,
                    F.expr(
                        "raise_error(concat('shingles(): duplicate rows for "
                        "id ', cast(id AS string), ' — one row per document "
                        "is required (reassemble chunks first)'))"
                    ).cast("array<string>"),
                ).otherwise(F.col("ws")),
            )
            .drop("_nrows")
        )
    toks = toks.filter(F.size("ws") >= n)
    return toks.select(
        "id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(ws)-{n}), i -> concat_ws(' ', {idx}))"
                )
            )
        ).alias("sh"),
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(sig, keep_id, n_copies): one shuffle on a 128-bit digest."""
    return df.groupBy(F.md5(F.lower(text_col)).alias("sig")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs Jaccard ≥ threshold via the inverted shingle index:
    shuffles on shingle (not doc²); the index is cached because it feeds the
    self-join twice plus the size table.

    ``max_shingle_df`` caps posting-list skew: shingles appearing in more
    than this many documents are excluded from the similarity computation
    entirely (candidate generation AND intersection/size counts) — Jaccard
    over each document's RARE-shingle profile, the n-gram analog of
    stopword removal. A ubiquitous stop-shingle otherwise creates a
    quadratic hot partition at scale; excluding it bounds every posting
    list at ``max_shingle_df`` while near-dups keep their (overwhelmingly
    rare) shared shingles. The cap is the FREQUENT-shingle set
    (``groupBy(sh).count() > cap`` — partial aggregation collapses a hot
    shingle map-side, and the result is tiny by construction: ≤ corpus
    shingle volume / cap rows) broadcast into a left-anti join — map-side,
    zero skew. A window-count formulation would instead require every row
    of a hot shingle in ONE task (AQE cannot split a window partition),
    recreating exactly the quadratic hot spot the cap exists to bound.
    The frequent-set branch deliberately re-tokenizes instead of caching
    the pre-filter shingle relation: its map-side partial aggregation
    collapses to distinct-shingle cardinality while it pipelines with the
    scan, whereas materializing the full (id, sh) relation into executor
    memory a second time costs more than the extra CPU pass (measured at
    sf0.1, and the memory-pressure argument only strengthens at 100 TB).
    The capped relation is re-partitioned AND sorted on ``sh`` into the
    cache: the self-join below is a sort-merge join on ``sh``, and a cache
    that already carries hash(sh) partitioning and in-partition order
    gives it both sides exchange-free and sort-free. That exchange is
    skew-free precisely because the hot shingles are already gone — the
    same pre-shuffled layout built BEFORE the cap (as the window
    formulation did) would bottleneck on the hot keys."""
    sh = shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        frequent = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("dfc"))
            .filter(F.col("dfc") > max_shingle_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(frequent), "sh", "left_anti")
    sh = _cache(sh.repartition("sh").sortWithinPartitions("sh"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    # sizes has one row PER DOCUMENT — never broadcast it (at 10⁹ docs that
    # is a multi-GB driver-built broadcast). Plain shuffle joins; AQE still
    # broadcasts when the relation is genuinely small at runtime.
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def line_dedup_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_line_df: int,
    min_len: int = 10,
) -> DataFrame:
    """Cross-document line-level dedup (the RefinedWeb / C4 boilerplate
    strip): lines of at least ``min_len`` characters appearing in more than
    ``max_line_df`` distinct documents are removed from EVERY document;
    remaining lines are reassembled in original order. Returns
    (doc_id, clean_text, n_removed) — one row per input document, empty
    string when every line was boilerplate.

    Scale shape: the frequent-line set is tiny by construction (at most
    corpus line volume / max_line_df rows), so it BROADCASTS into the line
    stream — the big (doc, pos, line) relation is never shuffled for the
    membership test. Per-document doc-frequency dedup is ``array_distinct``
    over the per-row line array (map-side; a document's lines live in one
    row pre-explode), so the frequency aggregation's partial combine
    collapses hot boilerplate before its one shuffle. The only shuffle of
    the full relation is the final reassembly groupBy(doc) — which no
    formulation avoids, since the output is again one row per document.
    Lines travel the frequency path as md5 digests, not ~100-char strings."""
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    eligible = F.filter(
        F.array_distinct(F.split(F.col(text_col), "\n")),
        lambda l: F.length(l) >= min_len,
    )
    frequent = (
        df.select(F.explode(eligible).alias("line"))
        .select(F.md5("line").alias("lh"))
        .groupBy("lh")
        .agg(F.count("*").alias("dfc"))
        .filter(F.col("dfc") > max_line_df)
        .select("lh", F.lit(1).alias("dup"))
    )
    marked = lines.join(
        F.broadcast(frequent), F.md5(F.col("line")) == F.col("lh"), "left"
    )
    kept = F.when(F.col("dup").isNull(), F.struct("pos", "line"))
    return marked.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["line"]),
        ).alias("clean_text"),
        F.count(F.when(F.col("dup") == 1, 1)).alias("n_removed"),
    )


def substring_collision_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 20,
    max_window_df: int | None = None,
) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): pairs of documents sharing at least one
    EXACT run of ``window`` consecutive tokens, with the count of distinct
    shared windows — (doc_a, doc_b, n_shared). The suffix-array construction
    of the paper is replaced by the distributed equivalent: an inverted index
    of fixed-length token windows, which finds the same ≥window-token overlaps
    without any global sort.

    Scale: windows are md5-digested BEFORE the shuffle so the exchange moves
    32-byte keys, not ~100-char strings; shuffles on window-hash only (never
    doc²). ``max_window_df`` drops degenerate windows (boilerplate headers,
    license blocks) appearing in more than that many documents, bounding
    every posting list — same skew bound as ``ngram_jaccard_pairs``, and
    applied the same way: the FREQUENT set is tiny by construction
    (≤ window volume / cap rows), so it broadcasts into a map-side
    left-anti join; an equi-join against the huge rare set would shuffle
    the whole relation an extra time."""
    w = (
        shingles(df, id_col, text_col, window)
        .select("id", F.md5("sh").alias("w"))
    )
    if max_window_df is not None:
        frequent = (
            w.groupBy("w")
            .agg(F.count("*").alias("dfc"))
            .filter(F.col("dfc") > max_window_df)
            .select("w")
        )
        w = w.join(F.broadcast(frequent), "w", "left_anti")
    a, b = w.alias("a"), w.alias("b")
    return (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, n_hashes: int = 16, n: int = 3
) -> DataFrame:
    """(doc_id, m0..m{n_hashes-1}), computed entirely map-side: the distinct
    shingle set is a per-document array (set semantics via array_distinct —
    no global distinct shuffle), each shingle is digested ONCE, and the
    n_hashes permutations derive from the two md5 halves as
    ``(a + j·b) mod 2^32`` (Kirsch–Mitzenmacher double hashing). Zero
    shuffles and one digest per shingle — at 100 TB the signatures pipeline
    with the scan; the only shuffle in a minhash dedup is the band join.

    All n_hashes minima come from ONE ``aggregate`` traversal of the
    shingle array (running 16-long min vector, lambda-indexed ``transform``
    for the permutation id) — an ``array_min(transform(...))`` per
    permutation would re-scan the array n_hashes times per document."""
    idx = ", ".join(f"ws[i+{k}]" for k in range(n))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)").alias("ws"),
    ).filter(F.size("ws") >= n)
    ab = toks.select(
        "doc_id",
        F.expr(
            f"transform(array_distinct(transform(sequence(0, size(ws)-{n}),"
            f" i -> concat_ws(' ', {idx}))),"
            " s -> struct("
            "cast(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) AS ha,"
            " cast(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT) AS hb))"
        ).alias("hs"),
    )
    mins = ab.select(
        "doc_id",
        F.expr(
            f"aggregate(hs, array_repeat(cast(4294967296 as bigint),"
            f" {n_hashes}), (acc, h) -> transform(acc,"
            " (a, j) -> least(a, (h.ha + j * h.hb) % 4294967296)))"
        ).alias("mm"),
    )
    return mins.select(
        "doc_id", *[F.col("mm")[j].alias(f"m{j}") for j in range(n_hashes)]
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    n_bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Banded LSH relation: (doc_id, bh, bi) — one row per document per
    band, where bh is the md5 of that band's signature slice. This is the
    joinable surface for both self-dedup (minhash_lsh_pairs) and
    incremental dedup against an existing corpus (dedup_against_corpus)."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes, n=n)
    entries = []
    for b in range(n_bands):
        cols = ", ".join(f"m{b * rows_per_band + r}" for r in range(rows_per_band))
        entries.append(f"'band{b}', md5(concat_ws('_', {cols}))")
    # single explode pass — a union of per-band projections would recompute
    # the whole signature pipeline once per band
    return sig.select(
        "doc_id", F.explode(F.expr(f"map({', '.join(entries)})")).alias("bi", "bh")
    ).select("doc_id", "bh", "bi")


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
    stacked = _cache(
        minhash_bands(df, id_col, text_col, n_hashes=n_hashes, n_bands=n_bands, n=n)
    )
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


def keep_cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Materialize the DEDUPLICATED CORPUS from near-dup pairs: connected
    components over the pair graph, keep the minimum-id representative of
    every cluster plus all singletons. Returns the kept rows of ``docs``
    with a ``cluster_size`` column (1 for singletons) — the step that turns
    any pair-producing dedup above into an actual cleaned dataset.

    Scale shape: the component relation only contains documents that
    appear in a pair (the near-dup minority), so the corpus-sized side is
    touched by exactly one join on ``id_col``; cluster sizes aggregate the
    small component relation. No driver-side collects beyond
    connected_components' O(1) fixpoint fingerprints."""
    cl = connected_components(pairs, a_col, b_col, max_iter=max_iter).select(
        F.col("doc_id").alias("__cc_id"), F.col("cluster_id").alias("__cc_cluster")
    )
    sizes = cl.groupBy("__cc_cluster").agg(F.count("*").alias("cluster_size"))
    return (
        docs.join(cl, docs[id_col] == cl["__cc_id"], "left")
        .filter(F.col("__cc_id").isNull() | (F.col("__cc_id") == F.col("__cc_cluster")))
        .join(sizes, "__cc_cluster", "left")
        .select(*docs.columns, F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"))
    )


_TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid")

# module-level: canonical_url_str runs once per URL row inside the
# mapInPandas hot loop — per-call imports would be pure overhead there
import re as _re_url  # noqa: E402
from urllib.parse import parse_qsl, quote, urlencode, urlsplit  # noqa: E402

_HOST_RE = _re_url.compile(r"[a-z0-9]([a-z0-9.-]*[a-z0-9])?")
_SCHEME_RE = _re_url.compile(r"[A-Za-z][A-Za-z0-9+.-]*://")


def canonical_url_str(u) -> str | None:
    """Canonicalize ONE URL string for dedup — the scalar core
    :func:`canonicalize_urls` maps over a column (see there for the
    rule set). Returns None for junk (non-DNS hostname, invalid port,
    None input): a junk URL is not a dedup key, never an error."""
    if u is None:
        return None
    try:
        s = str(u).strip()
        # a scheme is a PREFIX — '://' anywhere later (a redirect URL in
        # a query param, say) must not suppress the default prefix
        if not _SCHEME_RE.match(s):
            s = "http://" + s
        parts = urlsplit(s)
        host = (parts.hostname or "").lower()
        if host.startswith("www."):
            host = host[4:]
        # urlsplit accepts anything up to the first '/' as a netloc; a
        # hostname outside the DNS charset is junk (e.g. free text).
        # Validated AFTER the www. strip so the check sees the host the
        # canonical form will carry (hypothesis found 'www.-0', whose
        # stripped form fails the charset rule — idempotence demands
        # judging the output, not the input)
        if not host or not _HOST_RE.fullmatch(host):
            return None
        port = parts.port  # None for default/absent
        if port is not None and port not in (80, 443):
            host = f"{host}:{port}"
        # percent-encode path characters outside the URL charset (raw
        # spaces etc.) — '%' stays safe so already-encoded sequences
        # survive, which keeps the form a fixed point
        path = quote(parts.path.rstrip("/"), safe="/%")
        q = [
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not k.startswith("utm_") and k not in _TRACKING_PARAMS
        ]
        query = urlencode(sorted(q))
        return host + path + ("?" + query if query else "")
    except ValueError:
        return None


def canonicalize_urls(
    df: DataFrame,
    url_col: str,
    *,
    out_col: str = "canonical_url",
) -> DataFrame:
    """URL canonicalization for crawl dedup — the FIRST dedup stage of a
    CommonCrawl-shaped pipeline (CCNet / RefinedWeb run URL-level dedup
    before any content pass, since a crawler revisits the same page
    under scheme/host/tracking-param variants). Appends ``out_col``:

    - scheme dropped (http/https fetch the same resource for dedup
      purposes); host lowercased, leading ``www.`` and default ports
      (:80/:443) stripped
    - fragment dropped (never sent to the server)
    - query: ``utm_*`` and click-tracking params (fbclid/gclid/...)
      dropped; the REST kept and sorted by key so parameter order never
      splits a dupe group
    - path: trailing slash stripped (root becomes empty)

    NULL or unparseable values canonicalize to NULL rather than failing
    the pass — a crawl index always contains junk URLs, and a junk URL
    is simply not a dedup key. Map-only Arrow-batched ``mapInPandas``;
    composes with exact dedup / keep-lowest-id downstream."""
    from pyspark.sql import types as T

    fields = df.schema.fields
    if url_col not in df.columns:
        raise ValueError(f"url_col {url_col!r} is not a column"
                         f" (have: {df.columns})")
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    schema = T.StructType(list(fields) + [T.StructField(out_col,
                                                        T.StringType())])
    cols = [f.name for f in fields]

    def canon(batches):
        import pandas as _pd

        for pdf in batches:
            out = _pd.DataFrame({c: pdf[c] for c in cols})
            out[out_col] = [canonical_url_str(u) for u in pdf[url_col]]
            yield out

    return df.mapInPandas(canon, schema)


# anchor hrefs, both quote styles; group 1 is the raw reference. The
# match is deliberately tag-shape-loose (crawl HTML is torn) but value
# strict (no quotes/whitespace inside).
_HREF_RE = (
    r"""(?i)<a\s[^>]*?(?<![\w-])href\s*=\s*["']\s*([^"'\s][^"']*)["']"""
)  # the lookbehind keeps data-href/ng-href from stealing the match


def extract_links(
    df: DataFrame,
    html_col: str,
    base_col: str,
    *,
    out_col: str = "link",
) -> DataFrame:
    """The web-graph edge builder / crawl-frontier step: one output row
    per anchor outlink — href values pulled from ``html_col``, resolved
    against the record's base URI (stdlib ``urljoin``: relative paths,
    protocol-relative ``//host``, rooted ``/path``), canonicalized with
    :func:`canonical_url_str`, non-fetchable schemes (javascript:,
    mailto:, data:) and fragment-only self-references dropped. Returns
    ``df``'s columns minus ``html_col`` plus ``out_col`` — feed it to a
    host-grain groupBy for the link graph :func:`host_link_graph` /
    PageRank consume.

    Scale shape: the href scan is a JVM-side ``regexp_extract_all`` +
    ``explode`` (whole-stage codegen, output amplification = links per
    page), then ONE Arrow-batched resolve stage — zero shuffles."""
    from urllib.parse import urljoin, urlsplit

    from pyspark.sql import types as T

    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    if "_href" in df.columns:
        raise ValueError("column '_href' collides with the internal"
                         " explode alias — rename it first")
    keep = [c for c in df.columns if c != html_col]
    hrefs = df.select(
        *keep,
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), 1)
        ).alias("_href"),
    )
    schema = T.StructType(
        [f for f in hrefs.schema.fields if f.name != "_href"]
        + [T.StructField(out_col, T.StringType())]
    )

    def resolve(batches):
        import pandas as _pd

        def canon_base(b: str, memo: dict):
            # a page explodes to MANY hrefs with the same base — memoize
            # the base's canonical form instead of re-deriving it per edge
            if b not in memo:
                memo[b] = canonical_url_str(b)
            return memo[b]

        for pdf in batches:
            # per-BATCH memo: a task over a large archive sees unbounded
            # distinct bases across its lifetime, and a page's hrefs
            # arrive within one explode batch anyway — the memo must not
            # grow for the task's whole life
            base_memo: dict = {}
            # positional zip, not itertuples: pandas renames the
            # underscore-prefixed _href field to a positional name there
            out_rows = {c: [] for c in schema.fieldNames()}
            for vals in zip(*(pdf[c] for c in keep),
                            pdf["_href"], pdf[base_col]):
                *kept, href, base = vals
                base = str(base or "")
                try:
                    absu = urljoin(base, str(href).strip())
                    scheme = urlsplit(absu).scheme.lower()
                except ValueError:
                    continue  # junk href: not a graph edge
                if scheme not in ("http", "https"):
                    continue  # javascript:/mailto:/data:/ftp: links
                canon = canonical_url_str(absu)
                if canon is None or canon == canon_base(base, base_memo):
                    continue  # junk or fragment-only self-reference
                for c, v in zip(keep, kept):
                    out_rows[c].append(v)
                out_rows[out_col].append(canon)
            yield _pd.DataFrame(out_rows)

    return hrefs.mapInPandas(resolve, schema)


def host_link_graph(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
) -> DataFrame:
    """Collapse page-level outlinks to the HOST graph — (src_host,
    dst_host, n_links), self-loops dropped — the relation PageRank-style
    centrality and spam-neighborhood analysis run on. Accepts BOTH url
    forms per column: raw URIs (the source page column usually is one)
    and :func:`canonical_url_str` output — the host extraction strips an
    optional scheme, port, and leading ``www.`` and lowercases, all
    JVM-side. One partial-aggregated shuffle on the host pair."""

    def host(col: str):
        h = F.regexp_replace(F.col(col),
                             r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
        # authority ends at the first /, ? or # (a canonical root URL
        # can be "host?query" with no slash); userinfo ends at the LAST
        # @ inside it — RFC 3986, and a torn-crawl password may itself
        # carry an unencoded '@' ('user:p@ss@a.example' → 'a.example')
        h = F.split(h, "[/?#]", 2).getItem(0)
        h = F.regexp_replace(h, r"^.*@", "")
        h = F.lower(h)
        # IPv6 literals keep their brackets; a TORN bracket authority
        # (no closing ']') keeps its own literal token rather than
        # collapsing every such row into one bogus ''-host node;
        # otherwise strip a :port
        bracketed = F.regexp_extract(h, r"^(\[[^\]]*\])", 1)
        h = F.when(
            h.startswith("["),
            F.when(bracketed != "", bracketed).otherwise(h),
        ).otherwise(F.split(h, ":", 2).getItem(0))
        return F.regexp_replace(h, r"^www\.", "")

    return (
        edges.select(host(src_col).alias("src_host"),
                     host(dst_col).alias("dst_host"))
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def extract_http_html(
    df: DataFrame,
    payload_col: str,
    *,
    prefix: str = "http_",
    quarantine: bool = False,
) -> DataFrame:
    """Parse captured HTTP/1.1 response messages — the payload of WARC
    ``WARC-Type: response`` records, i.e. what raw Common Crawl archives
    actually hold — into typed columns: ``<prefix>status`` (int),
    ``<prefix>charset`` (the resolved entity codec name) and
    ``<prefix>html`` (the framing-resolved, charset-decoded entity).
    This is the step between the WARC record split
    (``sources/warc_source.py``) and :func:`strip_markup`: chunked
    transfer coding and Content-Length framing are resolved by
    ``codecs/http.py`` (strict RFC 9112 — refusal by name with byte
    offsets), gzip/deflate Content-Encoding inflates output-bounded
    (entities are captured AS FETCHED), and the charset comes from
    Content-Type with UTF-8 fallback.

    A malformed message fails the task loudly by default. Real crawls
    always contain torn captures, so ``quarantine=True`` opts into
    isolating them instead of killing the pipeline: charset and html
    are NULLed, status set to -1, and ``<prefix>error`` records the
    named refusal — so the caller routes the original records to a
    quarantine sink by flag AND the drop profile is observable (group
    by the reason, don't just count a total; ``wet_convert`` does).
    ``<prefix>error`` is NULL on every successfully parsed row.
    Map-only Arrow-batched ``mapInPandas`` — pipelines with the archive
    scan at any scale."""
    from pyspark.sql import types as T

    from bravo_spark.codecs.http import (
        HttpError,
        charset_name,
        decode_content_encoding,
        parse_http_response,
    )

    status_col, charset_col, html_col, error_col = (
        prefix + "status", prefix + "charset", prefix + "html",
        prefix + "error")
    for c in (status_col, charset_col, html_col, error_col):
        if c in df.columns:
            raise ValueError(f"column {c!r} already exists — pick a"
                             " different prefix")
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(status_col, T.IntegerType()),
           T.StructField(charset_col, T.StringType()),
           T.StructField(html_col, T.StringType()),
           T.StructField(error_col, T.StringType())]
    )
    cols = df.columns

    def parse(batches):
        import pandas as _pd

        for pdf in batches:
            st, cs, tx, er = [], [], [], []
            for payload in pdf[payload_col]:
                try:
                    # a NULL payload (upstream join/union artifact) is a
                    # torn capture for quarantine purposes — bytes(None)
                    # would TypeError past the except below
                    if payload is None:
                        raise HttpError("NULL payload")
                    status, headers, body = parse_http_response(
                        bytes(payload))
                    body = decode_content_encoding(headers, body)
                except HttpError as exc:
                    if not quarantine:
                        raise
                    st.append(-1)
                    cs.append(None)
                    tx.append(None)
                    er.append(str(exc))
                    continue
                # one charset resolution drives BOTH the reported
                # column and the decode (header param → meta prescan
                # → utf-8)
                name = charset_name(headers, body)
                st.append(status)
                cs.append(name)
                tx.append(body.decode(name, errors="replace"))
                er.append(None)
            out = _pd.DataFrame({c: pdf[c] for c in cols})
            out[status_col] = _pd.array(st, dtype="Int32")
            out[charset_col] = cs
            out[html_col] = tx
            out[error_col] = er
            yield out

    return df.mapInPandas(parse, schema)


def dedup_against_corpus(
    new_df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    n_bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Incremental-ingest dedup: flag NEW documents that duplicate an
    EXISTING corpus — (doc_id, exact_dup, near_dup), one row per flagged
    new document. Exact = identical normalized text digest; near = any
    shared MinHash-LSH band.

    Scale shape: the corpus side reduces to two skinny distinct relations
    (128-bit digests; (band, hash) pairs) that only ever meet the new batch
    in semi joins keyed on digest/band — the corpus is never re-paired with
    itself, and a daily batch joins in O(batch) not O(corpus²)."""
    new_sig = new_df.select(
        F.col(id_col).alias("doc_id"), F.md5(F.lower(text_col)).alias("sig")
    )
    cor_sig = corpus.select(F.md5(F.lower(text_col)).alias("sig")).distinct()
    exact = (
        new_sig.join(cor_sig, "sig", "left_semi")
        .select("doc_id")
        .withColumn("exact_dup", F.lit(1))
    )
    nb = minhash_bands(new_df, id_col, text_col, n_hashes=n_hashes, n_bands=n_bands, n=n)
    cb = (
        minhash_bands(corpus, id_col, text_col, n_hashes=n_hashes, n_bands=n_bands, n=n)
        .select("bh", "bi")
        .distinct()
    )
    near = (
        nb.join(cb, ["bh", "bi"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("near_dup", F.lit(1))
    )
    return exact.join(near, "doc_id", "full").select(
        "doc_id",
        F.coalesce("exact_dup", F.lit(0)).alias("exact_dup"),
        F.coalesce("near_dup", F.lit(0)).alias("near_dup"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥1 word
    n-gram with an evaluation set. Returns (doc_id, n_shared_ngrams,
    n_eval_docs); inner-join the complement (or anti-join the flagged ids)
    to get the clean corpus.

    Scale: the train side shuffles on shingle once; the eval side is a
    benchmark — thousands of documents, not billions — so its shingle
    relation BROADCASTS and the whole check is map-side against the train
    shingle stream. n=5 word-grams is the usual contamination window
    (long enough that coincidental overlap is rare)."""
    tr = shingles(train, id_col, text_col, n)
    ev = shingles(eval_df, id_col, text_col, n).select(
        "sh", F.col("id").alias("eval_id")
    )
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.countDistinct("sh").alias("n_shared_ngrams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
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
    """(doc_id, cluster_id=min reachable id) by alternating large-star /
    small-star contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond").

    Each round: large-star points every node's LARGER neighbors at its
    minimum neighbor, small-star then points the smaller neighbors there
    too — the graph contracts toward one star per component in O(log n)
    rounds. Why this beats min-label propagation at 100 TB: propagation
    needs diameter-many rounds (a 10⁶-long near-dup chain = 10⁶ shuffles)
    and a celebrity node's full edge list meets its label in one join
    partition every round FOREVER; star contraction halves celebrity
    degrees each round (their leaves re-point to the component min and
    stop touching the hot node), per-node minima are map-side-combinable
    aggregations, and the joins are plain equi-joins AQE can skew-split.
    Fixpoint detection is an order-insensitive (count, xxhash64-sum) edge
    fingerprint — no extra subtract pass."""
    e = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .unionByName(pairs.select(F.col(b_col).alias("node")))
        .distinct()
        .cache()
    )
    prev_sig = None
    for i in range(max_iter):
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: for each u emit (v, m) for neighbors v > u,
        # m = min(neighbors ∪ {u}) — map-side-combinable min, equi-join
        lm = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(lm, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )  # canonical: u > v
        # small-star: for each u emit (x, m) for x ∈ smaller-neighbors ∪ {u},
        # m = their minimum; self-loops dropped
        sm = large.groupBy("u").agg(F.min("v").alias("m"))
        new_e = (
            large.join(sm, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .unionByName(sm.select("u", F.col("m").alias("v")))
            .distinct()
        )
        # truncate lineage EVERY round: e appears ~4× in each round's plan
        # (sym twice, its two consumers), so un-truncated lineage grows 4^k
        # and the plan alone OOMs the driver by round ~8. The fingerprint
        # collect below materializes the checkpoint immediately.
        new_e = new_e.localCheckpoint(eager=False).cache()
        row = new_e.agg(
            F.count("*").alias("n"),
            # decimal(38,0) sum: immune to ANSI long overflow at any row count
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        e.unpersist()
        e = new_e
        if sig == prev_sig:
            break
        prev_sig = sig
    # at fixpoint e is one star per component: (node, component-min) edges,
    # centers have no outgoing row. The min-agg also keeps the result
    # single-label-per-node even if max_iter cut contraction short.
    stars = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("cluster_id")
    )
    labels = (
        nodes.join(stars, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id"),
        )
    ).cache()
    # nodes must stay cached until labels materializes (labels.cache() is
    # lazy — unpersisting nodes here would force the caller's first action
    # to re-scan pairs); all three are released by the next query cycle's
    # release_caches()
    _LIVE_CACHES.extend((labels, e, nodes))
    return labels


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, *, bits: int = 8
) -> DataFrame:
    """Per-vector min-max scalar quantization of a float embedding column:
    (id, vmin, vmax, codes, err_e6) where ``codes`` holds each component as
    an integer level in [0, 2^bits - 1] and ``err_e6`` is the maximum
    absolute reconstruction error in integer micro-units. The storage
    compression step of an embedding pipeline (float32 → int8 is 4×
    smaller); ``vmin + code * (vmax - vmin) / levels`` dequantizes.

    Map-only — per-vector statistics mean zero shuffles at any corpus
    size. Determinism: every step is a single IEEE operation (sub, mul,
    div, floor) that both engines round identically, so even the
    float-valued vmin/vmax and the micro-unit error hash-match the SQL
    oracle; no transcendentals anywhere."""
    levels = (1 << bits) - 1
    staged = (
        df.select(
            F.col(id_col),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("__v"),
        )
        .withColumn("vmin", F.expr("array_min(__v)"))
        .withColumn("vmax", F.expr("array_max(__v)"))
        .withColumn(
            "codes",
            F.expr(
                "CASE WHEN vmax = vmin THEN transform(__v, x -> 0)"
                f" ELSE transform(__v, x -> CAST(least(floor((x - vmin)"
                f" * {levels} / (vmax - vmin)), {levels}) AS INT)) END"
            ),
        )
        .withColumn(
            "err_e6",
            F.expr(
                "CAST(floor(CASE WHEN vmax = vmin THEN CAST(0 AS DOUBLE) ELSE"
                " array_max(zip_with(__v, codes,"
                f" (x, c) -> abs(x - (vmin + c * (vmax - vmin) / {levels}))))"
                " END * 1000000) AS BIGINT)"
            ),
        )
    )
    return staged.select(id_col, "vmin", "vmax", "codes", "err_e6")


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


def substring_dedup_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 15,
) -> DataFrame:
    """Exact-substring dedup with SPAN REMOVAL (the actual output of Lee et
    al. 2022's tool, where ``substring_collision_pairs`` above only reports
    the collisions): every token covered by a ``window``-token run that
    occurs more than once in the corpus — across documents OR repeated
    within one — is removed, and each document's surviving tokens are
    reassembled in order. Returns (doc_id, clean_text, n_removed) over the
    normalized token stream (the same stream the paper's suffix array
    works on); documents with zero tokens are dropped.

    Scale shape: duplicate detection shuffles window DIGESTS once (the
    same inverted-index posture as the pair finder); covered positions
    collapse per document via collect_set into an array that joins back to
    the ONE-ROW-PER-DOCUMENT relation, and the rebuild is a map-side
    higher-order ``filter(ws, (x, i) -> ...)`` — the token-level relation
    is never shuffled, and no driver-side data collects exist."""
    k = window
    base = _cache(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"
            ).alias("ws"),
        ).filter(F.size("ws") > 0)
    )
    wins = (
        base.filter(F.size("ws") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(ws)-{k}), i -> "
                    f"struct(i AS start, md5(concat_ws(' ', slice(ws, i+1, {k}))) AS h))"
                )
            ).alias("w"),
        )
        .select("doc_id", F.col("w.start").alias("start"), F.col("w.h").alias("h"))
    )
    duph = (
        wins.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    cov = (
        wins.join(duph, "h", "left_semi")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(start, start + {k - 1})")).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("cov"))
    )
    joined = base.join(cov, "doc_id", "left")
    # kept positions via array_except (hash-set, linear in |ws| + |cov|) —
    # a filter with array_contains(cov, i) would be O(|ws| × |cov|),
    # quadratic for the boilerplate-heavy documents this op targets
    clean = F.when(
        F.col("cov").isNull(), F.concat_ws(" ", F.col("ws"))
    ).otherwise(
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_except(sequence(0, size(ws) - 1), cov),"
                " p -> ws[p])"
            ),
        )
    )
    n_removed = F.when(F.col("cov").isNull(), F.lit(0)).otherwise(
        F.size("cov")
    )
    return joined.select(
        "doc_id",
        clean.alias("clean_text"),
        n_removed.cast("long").alias("n_removed"),
    )


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(w, wc): distinct words × corpus frequency, words of ≥2 chars — the
    shared state both BPE entry points train on. The groupBy is the classic
    BPE scale move: it collapses a trillion-token corpus to its vocabulary
    (map-side combined) before any pair work happens."""
    return (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .filter(F.length("w") >= 2)
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, *, top_k: int = 100
) -> DataFrame:
    """The first iteration of BPE tokenizer training at corpus scale:
    count adjacent character pairs, weighted by word frequency, and return
    the ``top_k`` merge candidates as (pair, cnt).

    Pair counting runs over the VOCABULARY (``_word_vocab``), not the
    token stream; the second shuffle aggregates vocab-sized pair rows,
    and the top-k is Spark's distributed TakeOrderedAndProject (no
    single-partition window). Ties break on the pair string for
    determinism."""
    vocab = _word_vocab(df, text_col)
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(top_k)
    )


def _pair_counts_of(vocab: DataFrame, sign: int = 1) -> DataFrame:
    """(l, r, cnt): adjacent-pair counts of a (syms, wc) vocabulary
    relation, weighted by ``sign * wc``. ``sign=-1`` produces the
    retraction half of an incremental delta. Words must have ≥2 symbols
    (ANSI ``sequence(1, 0)`` would count DOWN) — both callers guarantee
    it."""
    return (
        vocab.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                )
            ).alias("p"),
            (F.col("wc") * F.lit(sign)).alias("d"),
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("d").alias("cnt"))
    )


def _bpe_round(
    vocab: DataFrame, pair_counts: DataFrame, left: str, right: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One incremental BPE merge round: apply the (left, right) merge and
    maintain the pair-count state from ONLY the affected words.

    Returns (new_vocab, new_pair_counts, affected) — all lazy; callers
    checkpoint. The delta aggregation (explode + groupBy) runs over the
    AFFECTED words alone (those whose symbol stream contains the pair);
    the untouched rest of the vocabulary is carried by a map-side filter,
    never re-exploded. Per-round shuffle work is therefore proportional
    to the affected-word pair volume plus the (much smaller) pair-count
    merge, not to the whole vocabulary — the property that makes a
    32k-100k-merge production train feasible, vs. the naive
    recount-everything round."""
    l_lit = left.replace("\\", "\\\\").replace("'", "\\'")
    r_lit = right.replace("\\", "\\\\").replace("'", "\\'")
    has_pair = F.expr(
        f"exists(sequence(1, size(syms) - 1),"
        f" i -> syms[i - 1] = '{l_lit}' AND syms[i] = '{r_lit}')"
    )
    # exact left-to-right merge: fold the symbol array, joining a symbol
    # into the accumulator's tail when (tail, symbol) is the chosen pair —
    # non-overlapping because the joined tail no longer equals `left`
    merge_expr = (
        "aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]),"
        f" (acc, x) -> CASE WHEN element_at(acc, -1) = '{l_lit}'"
        f" AND x = '{r_lit}'"
        f" THEN concat(slice(acc, 1, size(acc) - 1),"
        f" array(concat('{l_lit}', '{r_lit}')))"
        " ELSE concat(acc, array(x)) END)"
    )
    affected = vocab.filter(has_pair)
    merged = affected.select(F.expr(merge_expr).alias("syms"), "wc")
    # a fully-merged word (one symbol left) can never contribute a pair
    # again — dropping it shrinks the state and keeps _pair_counts_of's
    # sequence well-formed
    merged_kept = merged.filter(F.size("syms") >= 2)
    delta = _pair_counts_of(affected, -1).unionByName(
        _pair_counts_of(merged_kept, 1)
    )
    new_counts = (
        pair_counts.unionByName(delta)
        .groupBy("l", "r")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
    new_vocab = vocab.filter(~has_pair).unionByName(merged_kept)
    return new_vocab, new_counts, affected


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 10,
    _round_probe=None,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list [(left, right), ...] — the artifact a tokenizer ships.

    Iterative-algorithm posture (same as ``connected_components``): the
    state is TWO distributed relations — the vocabulary (distinct words ×
    frequency, as symbol arrays) and the adjacent-pair counts, maintained
    INCREMENTALLY. Each round collects exactly ONE row (the argmax pair —
    metadata-scale), then updates the pair counts from only the words
    containing the merged pair (retraction + insertion delta via
    :func:`_bpe_round`); untouched words are never re-exploded. The naive
    alternative — recount every pair across the whole vocabulary per
    round — makes a production 32k-100k-merge train ~n_merges full-corpus
    scans; here per-round shuffle work tracks the affected-word volume,
    which shrinks as training converges. Both state relations truncate
    lineage with ``localCheckpoint`` so the plan doesn't grow with the
    merge count — the same 4^k-lineage guard ``connected_components``
    documents. 100 TB cost statement: each round's eager
    ``localCheckpoint`` MATERIALIZES both state relations to executor
    block storage — per round that is one full write+read of the
    distinct-word vocabulary (|distinct words| ≪ corpus; for web-scale
    text ~10⁷-10⁸ rows, a few GB serialized) and of the pair-count
    table (≤ |vocab| × avg-word-len rows). At 32k merges this
    materialization, not the shuffles, dominates the train; it is the
    price of a bounded plan and bounded per-round recompute, and it
    amortizes because the corpus itself is touched exactly once
    (``_word_vocab``'s initial scan). The per-merge 1-row argmax
    ``collect`` is an inherent driver round-trip of greedy BPE (the
    merge order IS a sequential decision process); each is
    metadata-scale. Ties break on (left, right) for determinism — the
    incremental counts are integer-exact, so the argmax sequence is
    identical to the full-recount formulation's."""
    vocab = _word_vocab(df, text_col).select(
        F.expr("split(w, '')").alias("syms"), "wc"
    )
    vocab = vocab.localCheckpoint()
    # the round's union (untouched ∪ merged) concatenates partition lists;
    # without a coalesce the vocabulary's partition count would DOUBLE per
    # round (exponential task explosion by merge ~15) — pin it to the
    # initial shuffle's count for the whole train
    n_parts = max(vocab.rdd.getNumPartitions(), 1)
    pair_counts = _pair_counts_of(vocab).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts.orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        new_vocab, new_counts, _ = _bpe_round(vocab, pair_counts, left, right)
        prev_v, prev_c = vocab, pair_counts
        # eager checkpoints — prev blocks are reclaimable afterwards
        vocab = new_vocab.coalesce(n_parts).localCheckpoint()
        pair_counts = new_counts.localCheckpoint()
        prev_v.unpersist()
        prev_c.unpersist()
        if _round_probe is not None:
            # test hook: lets tests/test_llmops.py pin that per-round
            # plan depth is INVARIANT across merges (the localCheckpoint
            # truncation doing its job) without exposing loop state
            _round_probe(len(merges), vocab, pair_counts)
    # the final checkpoints drain with the other intermediates at the next
    # release_caches() (registry query wrapper / long-session callers)
    _LIVE_CACHES.append(vocab)
    _LIVE_CACHES.append(pair_counts)
    return merges


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    *,
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize with a trained BPE merge list: (id, tokens array<string>)
    — the inference half of ``bpe_train``. Standard rank-priority
    application: within each word, the lowest-rank applicable merge fires
    first, repeatedly, exactly like shipped tokenizers replay their merge
    table.

    Map-only; the merge table is a driver-side constant captured by an
    Arrow-batched ``mapInPandas`` (tokenization is inherently per-text
    compute — the batch path is the fast one, never a row-at-a-time UDF)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    import re as _re

    token_re = _re.compile(TOKEN_RE)

    def encode_word(w: str, cache: dict) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        syms = list(w)
        while len(syms) > 1:
            best_i, best_rank = -1, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]), len(ranks))
                if r < best_rank:
                    best_i, best_rank = i, r
            if best_i < 0 or best_rank >= len(ranks):
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[w] = syms
        return syms

    def tokenize(batches):
        import pandas as _pd

        cache: dict = {}
        for pdf in batches:
            ids, toks = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in token_re.findall(str(text).lower()):
                    out.extend(encode_word(w, cache))
                ids.append(doc_id)
                toks.append(out)
            yield _pd.DataFrame({id_col: ids, out_col: toks})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        tokenize, schema=f"{id_col} {id_type}, {out_col} array<string>"
    )


def token_rarity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-statistics document rarity score: (doc_id, n_toks, rarity_e6)
    where rarity_e6 is the mean ADD-ONE-SMOOTHED inverse token probability
    in integer micro-units — mean over the document's tokens of
    ``(N + V) * 1e6 div (c(tok) + 1)`` with N = corpus token count,
    V = vocabulary size, c = corpus frequency.

    This is the CCNet-style (Wenzek et al. 2019) corpus-LM quality signal
    in its log-free rational form: documents dominated by rare/garbled
    tokens score high, boilerplate scores low. Staying rational (integer
    division only, like the BM25 variant above) keeps the score bit-exact
    across engines — ln/exp are not correctly-rounded and would break the
    oracle hash.

    Scale shape: the token relation is cached and used twice (frequency
    aggregation, then the frequency join); both shuffles key on ``tok``
    with map-side partial aggregation, the (N, V) statistics are a one-row
    broadcast, and the final per-document reduction is the one unavoidable
    shuffle on doc_id. No UDFs, no data-scale collects."""
    toks = _cache(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
            ).alias("tok"),
        )
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    stats = counts.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v")
    )
    return (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.expr(
                "CAST(sum(CAST(n_total + v AS DECIMAL(38,0)) * 1000000"
                " div (c + 1)) div count(*) AS BIGINT)"
            ).alias("rarity_e6"),
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 10,
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Top-k documents per query by BM25: (query_id, doc_id, score_e6,
    rank). ``queries`` is a small (query_id, term) relation — broadcast.

    Scoring is the log-free rational-idf BM25 variant with k1=6/5, b=3/4:
    idf(t) = (N - df + ½)/(df + ½) (Robertson–Spärck Jones without the
    log). Every per-term score is then an exact ratio of integers, so it
    is computed in DECIMAL(38,0) and emitted as micro-units
    (``score_e6 = Σ_t ⌊10⁶·P_t/Q_t⌋``, a BIGINT): bit-identical across
    engines and an ORDER-FREE integer sum — no float summation anywhere.
    With P = 22·T·tf·(2N−2df+1) and Q = (2df+1)·(10·T·tf + 3T + 9·dl·N),
    where T = total corpus tokens, dl = document length.

    Scale: tokenize+tf shuffles on doc_id only; df(t) and the (N, T)
    stats are term-count-sized and broadcast; the final top-k windows by
    query_id. No doc×doc or doc×corpus products anywhere."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_toks")
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(term_col).alias("term")
    ).distinct()
    hits = (
        toks.join(F.broadcast(qt), toks.tok == qt.term)
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = (
        hits.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("dfreq"))
    )
    units = F.expr(
        "CAST(CAST(22 AS DECIMAL(38,0)) * total_toks * tf"
        " * (2*n_docs - 2*dfreq + 1) * 1000000 AS DECIMAL(38,0))"
        " div (CAST(2*dfreq + 1 AS DECIMAL(38,0))"
        " * (10*total_toks*tf + 3*total_toks + 9*dl*n_docs))"
    )
    scored = (
        hits.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", units.alias("u"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("u").alias("score_e6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_e6", "rank")
    )


# ---------------------------------------------------------------------------
# sketch-and-rescore ANN: wide bit signatures + Hamming ranking + exact
# rescore. On data without cluster structure, single-bucket LSH recall
# collapses (measured 0-40% on the fixtures); ranking by Hamming distance
# over a 256-bit signature and exact-scoring only the top-C candidates
# reaches 0.90+ recall with C = 10% of the corpus — and each stage is
# engine-deterministic, so the whole approximate pipeline is oracle-checked.
# ---------------------------------------------------------------------------


def _md5_plane(j: int, d: int) -> float:
    """Plane component in [-1, 1): md5-derived, bit-for-bit reproducible in
    any engine as ``hex32(md5(j || ',' || d)) / 2^31 - 1``."""
    import hashlib

    return int(hashlib.md5(f"{j},{d}".encode()).hexdigest()[:8], 16) / 2**31 - 1.0


def sketch_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    n_planes: int = 256,
) -> DataFrame:
    """(id, w0..w{n_planes/32-1}): sign-of-projection signature packed into
    32-bit words. Map-side only (Arrow-batched numpy); the projection loops
    over dimensions so every dot product is the exact left-to-right float64
    fold — bit-identical to ``aggregate(zip_with(...))`` in Spark SQL and
    ``list_dot_product`` in DuckDB, which is what makes an APPROXIMATE index
    oracle-checkable. At scale the signature is 8 longs per row (vs the
    raw vector's 256+ bytes), so the ranking scan is ~8× narrower."""
    import numpy as np
    import pandas as pd

    if n_planes % 32:
        raise ValueError("n_planes must be a multiple of 32")
    n_words = n_planes // 32
    planes = np.array(
        [[_md5_plane(j, d) for d in range(dim)] for j in range(n_planes)]
    )
    out_cols = ["id"] + [f"w{w}" for w in range(n_words)]
    schema = "id long, " + ", ".join(f"w{w} long" for w in range(n_words))
    shifts = (1 << np.arange(32, dtype=np.int64))[None, :]

    def sign_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({c: [] for c in out_cols})
                continue
            v = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            acc = np.zeros((len(v), planes.shape[0]))
            for d in range(dim):  # exact left-fold, vectorized across rows
                acc += np.outer(v[:, d], planes[:, d])
            bits = acc > 0
            out = {"id": pdf[id_col].to_numpy()}
            for w in range(n_words):
                out[f"w{w}"] = (bits[:, w * 32 : (w + 1) * 32] * shifts).sum(
                    axis=1
                )
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        sign_batches, schema=schema
    )


def sketch_topk(
    candidates: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    n_planes: int = 256,
    n_candidates: int = 50,
) -> DataFrame:
    """Approximate top-k by cosine: Hamming-rank the bit signatures, then
    exact-rescore the best ``n_candidates`` per query. The ranking join is
    a broadcast of the (small) query signatures against the skinny signature
    relation — no all-pairs product over raw vectors; only Q×C rows carry
    vectors into the exact stage. Ties break on (hamming, id) then
    (cos desc, id): fully deterministic."""
    n_words = n_planes // 32
    csig = sketch_signatures(candidates, id_col, vec_col, dim=dim, n_planes=n_planes)
    qsig = sketch_signatures(queries, id_col, vec_col, dim=dim, n_planes=n_planes)
    q = qsig.select(
        F.col("id").alias("query_id"),
        *[F.col(f"w{w}").alias(f"qw{w}") for w in range(n_words)],
    )
    ham = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"qw{w}").bitwiseXOR(F.col(f"w{w}")))
        ham = term if ham is None else ham + term
    ranked = (
        F.broadcast(q)
        .join(csig, F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"), ham.alias("ham"))
    )
    wnd = Window.partitionBy("query_id").orderBy("ham", "neighbor_id")
    cand = (
        ranked.withColumn("r", F.row_number().over(wnd))
        .filter(F.col("r") <= n_candidates)
        .select("query_id", "neighbor_id")
    )

    dbl = F.col(vec_col).cast("array<double>")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, qq: p * qq), F.lit(0.0), lambda acc, v: acc + v
        )

    cv = candidates.select(F.col(id_col).alias("neighbor_id"), dbl.alias("ce"))
    qv = queries.select(F.col(id_col).alias("query_id"), dbl.alias("qe"))
    cos = dot(F.col("qe"), F.col("ce")) / (
        F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("ce"), F.col("ce")))
    )
    scored = (
        F.broadcast(cand)
        .join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: every vector is assigned to its highest-
    cosine centroid (broadcast, map-side after one small cross join); a
    query scans only its ``n_probe`` nearest cells. The probe join is an
    equi-join on cell id — at 100 TB the corpus shuffles once on cell and
    each query touches ~n_probe/n_list of it.

    Centroids are caller-provided (deterministic — e.g. a fixed corpus
    sample or offline k-means); a Lloyd refinement is a driver loop over
    this same assignment primitive. On clustered embeddings IVF prunes
    hard at high recall; on structureless data prefer sketch_topk (the
    recall/candidate trade is measured by the ann_*_recall_eval queries)."""
    dbl = F.col(vec_col).cast("array<double>")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, qq: p * qq), F.lit(0.0), lambda acc, v: acc + v
        )

    # r19: vector and centroid norms are hoisted to per-ROW projections
    # (computed once before each join instead of re-folded inside every
    # pair's cosine); sqrt of the same dot is the same double, so
    # assignments, probe order, and output cosines are bit-identical
    cent = centroids.select(
        F.col(id_col).alias("cid"), dbl.alias("ce")
    ).withColumn("cn", F.sqrt(dot(F.col("ce"), F.col("ce"))))
    cv = candidates.select(F.col(id_col).alias("id"), dbl.alias("e"))
    qv = queries.select(F.col(id_col).alias("id"), dbl.alias("e"))
    ccos = dot(F.col("e"), F.col("ce")) / (F.col("nr") * F.col("cn"))
    wc = Window.partitionBy("id").orderBy(F.col("ccos").desc(), F.col("cid"))

    def assign(rel: DataFrame, top: int) -> DataFrame:
        return (
            rel.withColumn("nr", F.sqrt(dot(F.col("e"), F.col("e"))))
            .join(F.broadcast(cent))
            .select("id", "e", "nr", "cid", ccos.alias("ccos"))
            .withColumn("rn", F.row_number().over(wc))
            .filter(F.col("rn") <= top)
            .select("id", "e", "nr", "cid")
        )

    cells = assign(cv, 1)
    probes = assign(qv, n_probe).select(
        F.col("id").alias("query_id"), F.col("e").alias("qe"),
        F.col("nr").alias("qn"), "cid",
    )
    cos = dot(F.col("qe"), F.col("ce2")) / (F.col("qn") * F.col("nr"))
    scored = (
        F.broadcast(probes)
        .join(
            cells.select(
                F.col("id").alias("neighbor_id"), F.col("e").alias("ce2"),
                "nr", "cid",
            ),
            "cid",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def kmeans_centroids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_iter: int = 5,
) -> DataFrame:
    """Lloyd's k-means as a driver loop over DataFrame iterations — the
    centroid-refinement companion to ivf_topk (the same pattern as
    connected_components: one shuffle per iteration, driver only sees the
    loop counter). Deterministic end-to-end:

    - init: the ``n_clusters`` lowest-id vectors (no RNG);
    - assignment: max cosine, ties to the lowest centroid id;
    - update: per-dimension mean accumulated in DECIMAL(28,16) — exact and
      order-insensitive, so results don't wobble with partitioning.

    Returns (cid, centroid array<double>). Each iteration materializes only
    n_clusters × dim rows to the driver (metadata-scale) to re-broadcast
    centroids — the data-scale work stays distributed."""
    dbl = F.col(vec_col).cast("array<double>")
    vecs = df.select(F.col(id_col).alias("id"), dbl.alias("e")).cache()

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, qq: p * qq), F.lit(0.0), lambda acc, v: acc + v
        )

    init = (
        vecs.orderBy("id")
        .limit(n_clusters)
        .collect()  # n_clusters rows — metadata-scale
    )
    centroids = [(i, list(r["e"])) for i, r in enumerate(init)]

    for _ in range(n_iter):
        cent_df = F.broadcast(
            vecs.sparkSession.createDataFrame(
                centroids, "cid int, ce array<double>"
            )
        )
        ccos = dot(F.col("e"), F.col("ce")) / (
            F.sqrt(dot(F.col("e"), F.col("e")))
            * F.sqrt(dot(F.col("ce"), F.col("ce")))
        )
        wc = Window.partitionBy("id").orderBy(F.col("ccos").desc(), F.col("cid"))
        assigned = (
            vecs.join(cent_df)
            .select("id", "e", "cid", ccos.alias("ccos"))
            .withColumn("rn", F.row_number().over(wc))
            .filter(F.col("rn") == 1)
        )
        means = (
            assigned.select("cid", F.posexplode("e").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                F.avg(F.col("x").cast("decimal(28,16)")).cast("double").alias("m")
            )
            .groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select("cid", F.expr("transform(pm, p -> p.m)").alias("ce"))
            .collect()  # n_clusters rows
        )
        new = {r["cid"]: list(r["ce"]) for r in means}
        # empty cells keep their previous centroid
        centroids = [(cid, new.get(cid, ce)) for cid, ce in centroids]

    vecs.unpersist()
    return df.sparkSession.createDataFrame(centroids, "cid int, ce array<double>")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.4,
    dim: int,
    n_planes: int = 256,
    band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold WITHOUT the all-pairs product:
    LSH candidates from byte-bands of the bit signature (an equi-join on
    (band index, band value) — never doc²), verified by EXACT cosine, so
    precision is 1.0 and every reported cosine is exact.

    Recall is governed by banding physics: a pair at cosine t agrees on one
    ``band_bits``-bit band with probability (1 - arccos(t)/π)^band_bits.
    At real dedup thresholds (t ≥ 0.9 → ~0.29 per 8-bit band, ≥1 of 32
    bands ≈ certain) recall is ~1.0 with ~100× candidate pruning. At loose
    thresholds (t ≈ 0.4) no equi-join LSH can prune and recall
    simultaneously — use cosine_topk / sketch_topk for that regime."""
    if band_bits not in (4, 8, 16):
        raise ValueError("band_bits must be 4, 8, or 16")
    n_words = n_planes // 32
    per_word = 32 // band_bits
    mask = (1 << band_bits) - 1
    sig = sketch_signatures(df, id_col, vec_col, dim=dim, n_planes=n_planes)
    # one explode over an array of (band index, band hash) structs — a
    # SINGLE scan of the signature relation (and thus of the corpus); the
    # former per-band unionByName stacking rescanned and re-projected it
    # once per band (32× the corpus I/O when the cache was cold)
    bands = F.array(
        *[
            F.struct(
                F.lit(w * per_word + s).alias("bi"),
                F.shiftright(F.col(f"w{w}"), s * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bh"),
            )
            for w in range(n_words)
            for s in range(per_word)
        ]
    )
    stacked = sig.select("id", F.explode(bands).alias("band")).select(
        "id", F.col("band.bi").alias("bi"), F.col("band.bh").alias("bh")
    )
    stacked = _cache(stacked)
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
        .distinct()
    )

    dbl = F.col(vec_col).cast("array<double>")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, qq: p * qq), F.lit(0.0), lambda acc, v: acc + v
        )

    va = df.select(F.col(id_col).alias("vec_a"), dbl.alias("ea"))
    vb = df.select(F.col(id_col).alias("vec_b"), dbl.alias("eb"))
    cos = dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(dot(F.col("ea"), F.col("ea"))) * F.sqrt(dot(F.col("eb"), F.col("eb")))
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m_subspaces: int = 8,
    candidate_factor: int = 4,
) -> DataFrame:
    """Product-quantization ANN (Jégou, Douze, Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): vectors are chopped into
    ``m_subspaces`` subvectors, each encoded as the id of its nearest
    codebook centroid, and candidates are ranked by the cosine of the query
    against the RECONSTRUCTED (quantized) vector, then exactly rescored.

    Deterministic twin of the classic ADC scan: the codebook derives from
    ``codebook_vectors`` (fixed corpus rows here — Lloyd refinement per
    subspace plugs in where kmeans_lloyd_centroids does), encoding argmin
    uses the d² = |a|² − 2a·b + |b|² expansion with float64 left-fold dot
    products and id tiebreaks, so an ANSI-SQL oracle reproduces it
    bit-for-bit.

    Scale: the codebook is metadata-sized (m × ks subvectors, broadcast);
    encoding is one broadcast join + window over corpus×m rows (shuffles on
    vector id, never corpus²); the ADC scan is linear in corpus — compose
    with IVF cells for sublinear. Memory win is the point: codes are m
    bytes per vector vs 4·dim — the corpus index fits ~32× more vectors
    per executor."""
    dim = len(
        codebook_vectors.select(F.col(vec_col)).first()[0]
    )  # codebook is metadata-scale; one tiny driver action
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    sd = dim // m_subspaces
    dbl = F.col(vec_col).cast("array<double>")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, v: a + v
        )

    ms = F.explode(F.sequence(F.lit(0), F.lit(m_subspaces - 1))).alias("m")

    def subvec(col):
        return F.expr(f"slice({col}, m * {sd} + 1, {sd})")

    wj = Window.orderBy(id_col)
    cb = (
        codebook_vectors.select(F.col(id_col), dbl.alias("e"))
        .withColumn("j", F.row_number().over(wj) - 1)
        .select("j", "e", ms)
        .select("m", "j", subvec("e").alias("csub"))
        .withColumn("cnorm2", dot(F.col("csub"), F.col("csub")))
    )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), dbl.alias("ce"))
    csubs = c.select("neighbor_id", ms, F.col("ce")).select(
        "neighbor_id", "m", subvec("ce").alias("vsub")
    )
    # d² = |v|² − 2 v·c + |c|²; |v|² is rank-constant per (vector, m)
    d2 = F.col("cnorm2") - F.lit(2.0) * dot(F.col("vsub"), F.col("csub"))
    wenc = Window.partitionBy("neighbor_id", "m").orderBy(d2.asc(), F.col("j"))
    codes = (
        csubs.join(F.broadcast(cb), "m")
        .withColumn("rn", F.row_number().over(wenc))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "m", "j")
    )
    recon = (
        codes.join(F.broadcast(cb.select("m", "j", "csub")), ["m", "j"])
        .groupBy("neighbor_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "csub"))),
                    lambda x: x["csub"],
                )
            ).alias("re")
        )
        .withColumn("rn2", F.sqrt(dot(F.col("re"), F.col("re"))))
    )
    q = queries.select(F.col(id_col).alias("query_id"), dbl.alias("qe")).withColumn(
        "qn", F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    approx = (
        F.broadcast(q)
        .join(recon, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qe"), F.col("re")) / (F.col("qn") * F.col("rn2"))).alias(
                "adc"
            ),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    cand = (
        approx.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= candidate_factor * k)
        .select("query_id", "neighbor_id")
    )
    cwn = c.withColumn("cn", F.sqrt(dot(F.col("ce"), F.col("ce"))))
    cos = dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(cwn, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int = 200,
    stride: int = 150,
    out_col: str = "chunk",
) -> DataFrame:
    """Overlapping fixed-window chunking — the sequence-prep step every
    RAG index and pretraining pipeline runs before embedding/packing:
    chunk i covers characters [i*stride, i*stride + size) of the
    document, so consecutive chunks overlap by ``size - stride``
    characters and every character lands in at least one chunk.

    Map-only JVM expressions end to end: ``sequence`` builds the chunk
    offsets from the document length, ``explode`` fans them out, and
    ``substring`` slices — zero shuffles, zero Python, so at 100 TB this
    is a pure scan whose output is ~size/stride × the input bytes.
    Empty/NULL documents yield no chunks (there is nothing to index)."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError(
            f"stride {stride} > size {size} would drop characters between "
            "consecutive chunks"
        )
    n = F.length(F.col(text_col))
    return (
        df.where(n > 0)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
            ).alias("_ci"),
            F.col(text_col).alias("_t"),
        )
        .select(
            F.col(id_col),
            F.col("_ci").cast("long").alias("chunk_idx"),
            F.expr(f"substring(_t, _ci * {stride} + 1, {size})").alias(out_col),
        )
        .withColumn(
            f"{out_col}_chars", F.length(F.col(out_col)).cast("long")
        )
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    transitive: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every vector to its nearest
    centroid by cosine, then within each cluster mark the higher-id
    member of every pair with cosine >= ``threshold`` as a duplicate —
    keep-lowest-id, greedy and deterministic. Returns
    (id_col, cluster_id, keep int).

    ``centroids`` is (cluster_id, centroid array) — typically
    :func:`kmeans_centroids` output — and broadcasts (k rows). The
    pairwise join is an EQUI-join on cluster_id, so the work is
    sum(cluster²), bounded by choosing k ∝ corpus size exactly as the
    paper does; nothing here is ever corpus². The assignment caches for
    its three consumers (query-cycle-scoped via release_caches).

    ``transitive=True`` keeps ONE representative per transitive
    similarity GROUP (connected components over the above-threshold
    pairs, O(log n) star contraction) — the paper-faithful semantics.
    The default greedy rule drops a row only when some LOWER-id row is
    directly above threshold, so a chain c~d~a where only d sees a
    keeps BOTH a and c; transitive keeps just a.

    Degenerate inputs REFUSE BY NAME (since r19): a zero-norm vector has
    no direction to cosine-assign, so the assignment raises with the
    vector's condition spelled out instead of producing a NaN-ordered
    cluster (the IVF-family contract — see :func:`_assign_cells`).
    Callers with zero-norm embeddings must filter them first."""
    c_id, c_vec = centroids.columns[0], centroids.columns[1]

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def norm(a):
        return F.sqrt(dot(a, a))

    # r19 optimization (guide §2.4): the nearest-centroid assignment was a
    # corpus×k broadcast join + window argmax on _id — a full shuffle of
    # the vector corpus before any pairwise work. _assign_cells is the
    # zero-shuffle broadcast-fold argmax the IVF family already uses (same
    # cosine expression tree, same max-cosine/lowest-cid tie-break, so
    # assignments are bit-identical on any corpus without degenerate
    # vectors; a zero-norm vector now refuses BY NAME instead of taking a
    # NaN-ordered assignment — the IVF-family contract).
    cid_type = dict(centroids.dtypes)[c_id]
    asg = track_cache(
        _assign_cells(
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("e")),
            centroids.select(
                F.col(c_id).alias("cid"), F.col(c_vec).alias("centroid")
            ),
        ).select(
            F.col("id").alias("_id"),
            F.col("e").alias("_e"),
            F.col("cell").cast(cid_type).alias("_cid"),
            # r19: the norm is hoisted into the CACHED assignment — each
            # row's norm was previously re-folded inside every pair's
            # cosine (2 extra O(d) folds per pair in the dominant
            # sum(cluster²) stage); sqrt of the same dot is the same
            # double, so pair cosines are bit-identical
            norm(F.col("e")).alias("_nr"),
        )
    )
    a, b = asg.alias("a"), asg.alias("b")
    pcos = dot(F.col("a._e"), F.col("b._e")) / (
        F.col("a._nr") * F.col("b._nr")
    )
    pairs = (
        a.join(b, (F.col("a._cid") == F.col("b._cid"))
               & (F.col("a._id") < F.col("b._id")))
        .where(pcos >= F.lit(threshold))
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
    )
    if transitive:
        comp = connected_components(pairs)
        dup = (
            comp.where(F.col(comp.columns[0]) != F.col(comp.columns[1]))
            .select(F.col(comp.columns[0]).alias("_id"))
            .distinct()
        )
    else:
        dup = pairs.select(F.col("doc_b").alias("_id")).distinct()
    return (
        asg.select("_id", "_cid")
        .join(dup.withColumn("_d", F.lit(1)), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_cid").alias("cluster_id"),
            F.when(F.col("_d").isNull(), 1).otherwise(0).cast("int").alias("keep"),
        )
    )


def exact_k_sample(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic simple random sample of EXACTLY ``k`` rows: rank by
    ``md5(salt || id)`` and keep the k smallest. Unlike Bernoulli
    sampling (``hash_sample``-style fraction filters) the output size is
    exact, and unlike ``ORDER BY rand()`` it is reproducible — the same
    (corpus, salt, k) always selects the same rows, and adding rows
    never evicts a selected row unless the newcomer hashes lower
    (bounded churn, the property shard-stable eval sets need).

    Scale shape: Catalyst plans ORDER BY+LIMIT as TakeOrderedAndProject
    — each partition keeps its local top-k and only k rows per partition
    reach the driver-side merge, never a full sort (plan-pinned). k is
    assumed driver-friendly (an eval-set size, not a corpus size)."""
    if k <= 0:
        raise ValueError("k must be positive")
    ranked = df.withColumn(
        "_rk", F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )
    return ranked.orderBy("_rk").limit(k).drop("_rk")


def strip_markup(
    df: DataFrame, text_col: str, *, out_col: str = "clean_text"
) -> DataFrame:
    """HTML/XML → text for web-crawl corpora: drop <script>/<style>
    blocks and comments WITH their contents, strip remaining tags,
    decode the common entities, and collapse the whitespace the removals
    leave behind. Entirely JVM-side ``regexp_replace`` chains — map-only,
    zero Python, zero shuffles; not a browser (no JS, no CSS layout),
    which is exactly the trade every large-scale crawl pipeline makes."""
    c = F.col(text_col)
    # containers whose CONTENT is noise, then comments, then any tag
    for pat in (
        r"(?is)<script\b[^>]*>.*?</script>",
        r"(?is)<style\b[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
        r"(?s)<[^>]+>",
    ):
        c = F.regexp_replace(c, pat, " ")
    # numeric character references run BEFORE entity decoding so
    # "&amp;#65;" correctly yields the literal text "&#65;" instead of
    # double-decoding (its "&#" only appears after &amp; → &). Common
    # punctuation refs DECODE (a crawl's apostrophes/quotes/dashes are
    # real text, not noise); the remainder is REMOVED, not decoded —
    # arbitrary code-point synthesis isn't expressible JVM-side.
    for pat, rep in (
        (r"&#(?:39|x0*27);", "'"), (r"&#(?:34|x0*22);", "\""),
        (r"&#(?:8216|8217|x0*201[89]);", "'"),
        (r"&#(?:8220|8221|x0*201[cCdD]);", "\""),
        (r"&#(?:8211|8212|x0*201[34]);", "-"),
        (r"&#(?:160|x0*[aA]0);", " "),
    ):
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, r"&#x?[0-9a-fA-F]{1,6};", " ")
    # named entities, &amp; LAST so "&amp;lt;" yields literal "&lt;"
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&apos;", "'"), ("&amp;", "&"),
    ):
        c = F.regexp_replace(c, ent, rep)
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    size: int = 512,
    stride: int | None = None,
    out_col: str = "chunk_tokens",
) -> DataFrame:
    """Token-level sibling of :func:`chunk_documents`, for post-tokenizer
    pipelines: window i covers tokens [i*stride, i*stride + size) of the
    array column, so ``stride == size`` (the default) packs back-to-back
    training sequences and ``stride < size`` gives the overlapping
    windows long-context eval sets use. Map-only JVM expressions
    (``sequence`` → ``explode`` → ``slice``); empty/NULL token arrays
    yield no chunks."""
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError(
            f"stride {stride} > size {size} would drop tokens between "
            "consecutive chunks"
        )
    n = F.size(F.col(tokens_col))
    return (
        df.where(n > 0)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
            ).alias("_ci"),
            F.col(tokens_col).alias("_t"),
        )
        .select(
            F.col(id_col),
            F.col("_ci").cast("long").alias("chunk_idx"),
            F.expr(f"slice(_t, _ci * {stride} + 1, {size})").alias(out_col),
        )
        .withColumn(f"{out_col}_len", F.size(F.col(out_col)).cast("long"))
    )


def hash_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 4096,
    ngram: int = 1,
) -> DataFrame:
    """FastText-style feature hashing: word n-grams bucketed into a fixed
    ``dim``-dimensional space by the engine's md5-derived 32-bit hash —
    the feature extraction half of a linear text-quality classifier.
    Output is the LONG form (id, bucket, count): joinable, sortable, and
    shuffle-light (one partial-aggregated shuffle on (id, bucket));
    downstream scoring never materializes a dense vector."""
    if dim <= 0 or ngram <= 0:
        raise ValueError("dim and ngram must be positive")
    toks = df.select(
        F.col(id_col),
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)").alias(
            "_ws"
        ),
    )
    if ngram > 1:
        # n-grams as a zip of n SHIFTED prefixes — never slice() inside a
        # per-index lambda: Spark's Slice materializes the sub-array per
        # call, making transform(sequence, i -> slice(ws, i, n)) O(len²)
        # per document (measured 7.5× slower than this form at sf0.1).
        # The guard stays inside the expression: slice with a non-positive
        # length errors under ANSI, so a too-short document must yield
        # array() before any slice evaluates.
        expr = f"slice(_ws, 1, size(_ws) - {ngram - 1})"
        for j in range(1, ngram):
            expr = (
                f"zip_with({expr}, slice(_ws, {1 + j},"
                f" size(_ws) - {ngram - 1}), (a, b) -> concat(a, ' ', b))"
            )
        grams = toks.select(
            F.col(id_col),
            F.expr(
                f"CASE WHEN size(_ws) >= {ngram} THEN {expr}"
                " ELSE array() END"
            ).alias("_gs"),
        )
    else:
        grams = toks.select(F.col(id_col), F.col("_ws").alias("_gs"))
    return (
        grams.select(F.col(id_col), F.explode("_gs").alias("_g"))
        .select(
            F.col(id_col),
            (F.expr(_h32("_g")) % dim).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("count"))
    )


def linear_text_score(
    features: DataFrame,
    weights: list[float],
    *,
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> DataFrame:
    """Apply a trained linear classifier over :func:`hash_ngram_features`
    output: score(doc) = bias + Σ weights[bucket] · count, normalized by
    the document's total feature count (so long documents don't dominate).
    ``weights`` is the dense ``dim``-length vector — a genuinely
    fixed-size relation, broadcast. Returns (id, score double)."""
    spark = features.sparkSession
    w = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(weights)], "bucket int, w double"
    )
    return (
        features.join(F.broadcast(w), "bucket", "left")
        .groupBy(id_col)
        .agg(
            (
                F.lit(float(bias))
                + F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("count"))
                / F.sum("count")
            ).alias("score")
        )
    )


def _index_path(base: str, *parts: str) -> str:
    """Join index sub-paths with '/' regardless of scheme — the index
    root can be any Hadoop-FS URI (hdfs://, s3a://, file:), where
    ``os.path.join`` would be wrong on non-posix drivers and opaque
    about intent on posix ones."""
    return "/".join([base.rstrip("/"), *parts])


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path, jvm) for ``path`` via Spark's own Hadoop conf —
    the same filesystem the parquet writers above resolve, so the
    manifest lands NEXT TO the relations on s3a://..., not on the
    driver's local disk (the r15 verdict's one 100-TB posture break)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _fs_write_text(spark, path: str, text: str) -> None:
    fs, jpath, _ = _hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark, path: str) -> str:
    fs, jpath, jvm = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        raise FileNotFoundError(path)
    stream = fs.open(jpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


# Commit marker for ivf_index_compact's crash-atomic file swap: written
# AFTER the reassignment + merged centroids are fully staged, deleted as
# the commit's last step. While it exists the live assignments/centroids
# pair may be mid-swap, so load_ivf_index refuses by name.
_COMPACT_MARKER = "_COMPACT_COMMIT.json"

# The double-precision dot-product fold, as ONE parseable SQL string.
# The Python higher-order-function API (F.aggregate/F.zip_with with
# Python lambdas) builds the identical expression tree but costs many
# py4j round trips per fold (~1 ms each) — measured at ~0.3 s of pure
# driver-side plan construction per ivf_index_search call (r19, guide
# §1.2: per-call work). `0.0D` is the double literal (bare 0.0 would
# parse as DECIMAL); the fold order and operations are exactly those of
# the lambda form, so results are bit-identical.
_DOT_SQL = "aggregate(zip_with({x}, {y}, (p, q) -> p * q), 0.0D, (acc, v) -> acc + v)"


class IvfCompactInterrupted(RuntimeError):
    """An ivf_index_compact commit was interrupted mid-swap; the index
    refuses reads until :func:`finish_ivf_compact` rolls it forward."""


def _assign_cells(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """Per-row nearest-centroid assignment with NO shuffle of the
    vector corpus and NO row key: the k-row centroid relation folds into
    a 1-row array-of-structs broadcast (``collect_list`` — its
    SinglePartition exchange moves k model-scale rows, never vectors),
    and each
    vector row computes its argmax in one JVM higher-order fold with a
    VALUE-based tie-break (cos desc, cid asc), so the list's order never
    matters. This replaces the previous broadcast-join + row_number
    window, which (a) shuffled and (b) keyed row identity on
    monotonically_increasing_id — nondeterministic under stage retry, so
    a recomputed upstream partition could silently drop or duplicate
    index rows on a flaky cluster. Every input row yields exactly one
    output row or the task refuses BY NAME: a zero-norm vector has no
    direction to assign, so it raises (under the session's default ANSI
    mode a bare division would abort with an opaque DIVIDE_BY_ZERO; a
    silent sentinel cell would hide vectors from every health surface).
    A zero-norm CENTROID is merely never the argmax (``try_divide``
    scores it NULL); if NO centroid is cosine-comparable (empty or
    all-degenerate relation) the row refuses by name too.

    ``vecs``: (id, e array<double>); ``cent``: (cid, centroid).
    Returns (id, e, cell)."""
    # the centroid norm rides in the broadcast struct (r19): it was
    # re-folded per row × per centroid inside the cosine; sqrt of the
    # same dot computed once per centroid is the same double, so
    # assignments are unchanged
    cent_arr = F.broadcast(cent.agg(F.collect_list(
        F.struct(
            F.col("cid").cast("int").alias("cid"),
            F.col("centroid").cast("array<double>").alias("ce"),
            F.expr(
                "sqrt(aggregate(zip_with(CAST(centroid AS ARRAY<DOUBLE>),"
                " CAST(centroid AS ARRAY<DOUBLE>), (p, q) -> p * q), 0.0D,"
                " (acc, v) -> acc + v))"
            ).alias("cn"),
        )
    ).alias("_cents")))

    # r19 optimization (guide §1.2 step 2, per-task work — here the
    # per-CALL work): the fold below was built through the Python
    # higher-order-function API, which costs hundreds of py4j round
    # trips per call (measured ~0.25 s per _assign_cells invocation of
    # pure driver-side plan construction). The SAME expression tree
    # parsed from one SQL string is a single round trip; semantics,
    # tie-break, and the two refuse-by-name guards are unchanged
    # (tests/test_llmops.py pins both guards, test_plans.py the shape).
    dot = _DOT_SQL
    self_dot = dot.format(x="e", y="e")
    guarded_norm = F.expr(
        f"CASE WHEN sqrt({self_dot}) = 0.0D THEN raise_error("
        "'zero-norm vector cannot be cosine-assigned to an IVF cell') "
        f"ELSE sqrt({self_dot}) END"
    )
    best = (
        "aggregate("
        " transform(_cents, s -> struct("
        "   try_divide("
        f"    {dot.format(x='e', y='s.ce')},"
        "    _en * s.cn"
        "   ) AS c, s.cid AS cid)),"
        " struct(CAST('-Infinity' AS DOUBLE) AS c, CAST(-1 AS INT) AS cid),"
        " (acc, s) -> IF(s.c > acc.c OR (s.c = acc.c AND s.cid < acc.cid),"
        "               s, acc))"
    )
    cell = F.expr(
        f"CASE WHEN ({best}).c = CAST('-Infinity' AS DOUBLE) THEN raise_error("
        "'no centroid is cosine-comparable (empty or zero-norm"
        " centroid relation) — cannot assign IVF cells') "
        f"ELSE ({best}).cid END"
    )
    return (
        vecs.crossJoin(cent_arr)
        .withColumn("_en", guarded_norm)
        .select("id", "e", cell.alias("cell"))
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_iter: int = 5,
    centroids: DataFrame | None = None,
) -> dict:
    """Build a PERSISTED IVF index: k-means centroids + per-vector cell
    assignments, written as two parquet relations under ``path``
    (``centroids/``, ``assignments/`` — the latter PARTITIONED BY cell,
    so a probe reads only its cells' files) plus a tiny JSON manifest.
    Build once, query many: :func:`load_ivf_index` + :func:`ivf_topk`
    skip the clustering AND the corpus-wide assignment pass entirely,
    and cell-partition pruning turns each query into ~n_probe/n_clusters
    of the corpus in FILE terms, not just shuffle terms.

    ``centroids`` (cid int-like, centroid array<double>) skips the
    internal k-means — rebuild an index around externally-trained or
    frozen centroids (and the oracle-mirrored queries use it to pin the
    assignment/probe math to an exactly-replayable centroid set)."""
    import json as _json

    if centroids is not None:
        cents = centroids.select("cid", "centroid")
    else:
        cents = kmeans_centroids(
            df, id_col=id_col, vec_col=vec_col,
            n_clusters=n_clusters, n_iter=n_iter,
        ).select("cid", F.col("ce").alias("centroid"))
    cents.write.mode("overwrite").parquet(_index_path(path, "centroids"))

    spark = df.sparkSession
    cent = spark.read.parquet(_index_path(path, "centroids"))
    dbl = F.col(vec_col).cast("array<double>")
    vecs = df.select(F.col(id_col).alias("id"), dbl.alias("e"))

    # per-ROW argmax (ids need not be unique — a unioned re-run batch is
    # two legitimate copies) with no shuffle and no synthetic row key:
    # see _assign_cells
    asg = _assign_cells(vecs, cent).select(
        F.col("id").alias(id_col),
        F.col("e").alias(vec_col),
        "cell",
    )
    asg.write.mode("overwrite").partitionBy("cell").parquet(
        _index_path(path, "assignments")
    )
    manifest = {
        "version": 1, "id_col": id_col, "vec_col": vec_col,
        "n_clusters": n_clusters, "n_iter": n_iter,
        # record both relations' schemas so load_ivf_index skips parquet
        # footer inference (r19: two inference reads were ~0.18 s of
        # per-call latency on every search/stats/append — the
        # load_ngram_lm pattern). `asg`'s schema lists the partition
        # column `cell` LAST, matching partition-discovery order, so the
        # read-back column order is unchanged. ivf_index_append coerces
        # to the index's types and ivf_index_compact rewrites the same
        # columns, so the recorded schemas stay valid for the index's
        # whole maintenance lifecycle.
        "schemas": {
            "assignments": asg.schema.jsonValue(),
            "centroids": cent.schema.jsonValue(),
        },
    }
    _fs_write_text(
        spark, _index_path(path, "_bravo_ivf.json"), _json.dumps(manifest)
    )
    return manifest


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame, dict]:
    """(assignments, centroids, manifest) of a :func:`build_ivf_index`
    index. ``assignments`` is cell-partitioned parquet — a filter on
    ``cell`` becomes PartitionFilters (file pruning), which is what makes
    the persisted index cheaper than re-assigning per query batch.

    Refuses BY NAME while a :func:`ivf_index_compact` commit marker is
    present: between the marker landing and its removal the live
    assignments/centroids pair may be mid-swap (cells deleted but not
    yet replaced, centroids out of sync with assignments) — serving it
    would silently drop vectors. :func:`finish_ivf_compact` rolls the
    staged commit forward and clears the marker."""
    import json as _json

    fs, _, jvm = _hadoop_fs(spark, path)
    if fs.exists(jvm.org.apache.hadoop.fs.Path(
            _index_path(path, _COMPACT_MARKER))):
        raise IvfCompactInterrupted(
            f"{path}: an ivf_index_compact commit was interrupted "
            f"({_COMPACT_MARKER} present) — run finish_ivf_compact() "
            "to roll it forward before reading")
    manifest = _json.loads(
        _fs_read_text(spark, _index_path(path, "_bravo_ivf.json"))
    )
    schemas = manifest.get("schemas") or {}

    def _read(part: str) -> DataFrame:
        # a recorded schema skips parquet footer inference (pre-r19
        # manifests lack it and fall back)
        reader = spark.read
        if part in schemas:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(schemas[part]))
        return reader.parquet(_index_path(path, part))

    asg = _read("assignments")
    cent = _read("centroids")
    return asg, cent, manifest


def ivf_index_search(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Query a persisted IVF index: probe the ``n_probe`` nearest cells
    per query against the PRE-ASSIGNED corpus — no clustering, no
    corpus-wide assignment, and the cell filter prunes parquet partitions
    so only the probed cells' files are read. Returns
    (query_id, neighbor_id, cos) top-k per query, identical contract to
    :func:`ivf_topk`."""
    asg, cent, mf = load_ivf_index(spark, path)
    id_col, vec_col = mf["id_col"], mf["vec_col"]
    dbl = F.col(vec_col).cast("array<double>")

    # r19: query/centroid/candidate norms hoisted to per-row projections
    # before each join (previously re-folded inside every pair's cosine);
    # sqrt of the same dot is the same double — probe order and output
    # cosines are bit-identical. The folds parse from _DOT_SQL strings
    # instead of the lambda API: ~0.3 s of py4j plan construction per
    # call removed, identical expression tree (same as _assign_cells).
    q = queries.select(
        F.col(id_col).alias("query_id"), dbl.alias("qe")
    ).withColumn("qn", F.expr(f"sqrt({_DOT_SQL.format(x='qe', y='qe')})"))
    qcos = F.expr(
        f"{_DOT_SQL.format(x='qe', y='centroid')} / (qn * _cn)"
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_c").desc(), F.col("cell"))
    probes = (
        q.join(F.broadcast(cent.withColumn(
            "_cn",
            F.expr(f"sqrt({_DOT_SQL.format(x='centroid', y='centroid')})"),
        )))
        .select("query_id", "qe", "qn", F.col("cid").alias("cell"),
                qcos.alias("_c"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qe", "qn", "cell")
    )
    pcos = F.expr(f"{_DOT_SQL.format(x='qe', y='ce')} / (qn * _nr)")
    cand = probes.join(
        asg.select(
            F.col("cell"),
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("ce"),
        ).withColumn(
            "_nr", F.expr(f"sqrt({_DOT_SQL.format(x='ce', y='ce')})")
        ),
        "cell",
    ).where(F.col("neighbor_id") != F.col("query_id"))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", pcos.alias("cos"))
        .withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def ivf_index_append(spark, path: str, df: DataFrame) -> int:
    """Incremental index maintenance: assign NEW vectors with the saved
    centroids and APPEND them to the cell-partitioned assignments — no
    recluster, no touch of existing files (parquet append into the
    partition dirs). The centroids drift as the corpus grows; rebuild
    with :func:`build_ivf_index` when recall evals (ann_*_recall_eval)
    say so. Returns the number of vectors appended."""
    asg, cent, mf = load_ivf_index(spark, path)
    id_col, vec_col = mf["id_col"], mf["vec_col"]
    # coerce to the INDEX's column types: parquet append with a
    # differently-typed id (int literal vs the corpus's bigint) would
    # poison the partition dirs with schema-mismatched files
    id_type = dict(asg.dtypes)[id_col]
    vec_type = dict(asg.dtypes)[vec_col]
    dbl = F.col(vec_col).cast("array<double>")
    vecs = df.select(
        F.col(id_col).cast(id_type).alias("id"), dbl.alias("e")
    )

    # per-ROW argmax (an append batch carrying the same id twice keeps
    # both copies) with no shuffle and no synthetic row key: see
    # _assign_cells
    newly = _assign_cells(vecs, cent).select(
        F.col("id").alias(id_col),
        F.col("e").cast(vec_type).alias(vec_col),
        "cell",
    )
    # persist before the count so the write appends EXACTLY the counted
    # rows — without it the plan executes twice and a non-deterministic
    # input could make the returned count diverge from what landed
    newly = newly.persist()
    try:
        n = newly.count()
        newly.write.mode("append").partitionBy("cell").parquet(
            _index_path(path, "assignments")
        )
    finally:
        newly.unpersist()
    return n


def ivf_index_stats(spark, path: str) -> DataFrame:
    """Index-health relation for a persisted IVF index — the rebuild
    signal :func:`ivf_index_append` defers to: per cell, the vector
    count and the cosine-to-centroid distribution (mean/min). Appends
    assign new vectors to FROZEN centroids, so over time cells bloat
    unevenly and mean cosine drifts down; when the recall evals
    (ann_*_recall_eval) or these numbers say so, rebuild with
    :func:`build_ivf_index`. One distributed pass over the assignments
    (map + one partial-aggregated shuffle on cell); the result is k rows
    — metadata-scale. Columns: (cell, n_vectors, mean_cos, min_cos,
    frac_of_corpus)."""
    asg, cent, mf = load_ivf_index(spark, path)
    vec_col = mf["vec_col"]
    dbl = F.col(vec_col).cast("array<double>")

    # centroid norm hoisted into the broadcast relation (r19) — same
    # double, computed once per centroid instead of once per vector row;
    # folds from _DOT_SQL strings (the _assign_cells treatment) instead
    # of the py4j lambda API
    ccos = F.expr(
        f"{_DOT_SQL.format(x='e', y='centroid')}"
        f" / (sqrt({_DOT_SQL.format(x='e', y='e')}) * _cn)"
    )
    per_cell = (
        asg.select(F.col("cell"), dbl.alias("e"))
        .join(F.broadcast(cent.select(F.col("cid").alias("cell"),
                                      "centroid")
                          .withColumn("_cn", F.expr(
                              f"sqrt({_DOT_SQL.format(x='centroid', y='centroid')})"
                          ))),
              "cell")
        .select("cell", ccos.alias("_c"))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.avg("_c").alias("mean_cos"),
            F.min("_c").alias("min_cos"),
        )
    )
    total = per_cell.agg(F.sum("n_vectors").alias("_t"))
    return (
        per_cell.join(F.broadcast(total))  # 1-row relation
        .select(
            "cell", "n_vectors", "mean_cos", "min_cos",
            (F.col("n_vectors") / F.col("_t")).alias("frac_of_corpus"),
        )
    )


def ivf_index_compact(
    spark,
    path: str,
    *,
    min_mean_cos: float | None = None,
    max_frac: float | None = None,
    subsplit: int = 2,
    n_iter: int = 3,
) -> dict:
    """Close the IVF maintenance loop: CONSUME the drift signal
    :func:`ivf_index_stats` reports and recluster only the cells over
    threshold. :func:`ivf_index_append` assigns new vectors to FROZEN
    centroids, so a shifting corpus bloats some cells (probe cost grows)
    and drags their cosine-to-centroid down (recall drops). This splits
    each drifted cell into ``subsplit`` sub-cells via a WITHIN-CELL
    k-means — healthy cells' parquet partitions are never rewritten.

    A cell is drifted when ``mean_cos < min_mean_cos`` or
    ``frac_of_corpus > max_frac`` (give at least one bound). The first
    sub-cell reuses the old cell id, the rest get fresh ids, so the
    rewrite touches only the drifted + new ``cell=`` dirs; the centroid
    relation (k rows, metadata-scale) is rewritten wholly and the
    manifest's n_clusters updated. The swap is CRASH-ATOMIC: the
    reassignment and merged centroids are fully staged first, then a
    commit marker lands and the staged dirs are renamed over the live
    ones — :func:`load_ivf_index` refuses by name while the marker
    exists and :func:`finish_ivf_compact` rolls an interrupted commit
    forward, so a death at any point can never serve an index that
    silently dropped vectors. Drifted cells are few by the health
    predicate's nature;
    each split is a distributed fit over one cell's files only
    (PartitionFilters-pruned scan), so the driver loop is over a handful
    of cells, never over vectors.

    Returns ``{"drifted": [...], "new_cells": [...], "n_clusters": k'}``
    — empty ``drifted`` means the index was healthy and nothing was
    touched."""
    import json as _json

    if min_mean_cos is None and max_frac is None:
        raise ValueError("give min_mean_cos and/or max_frac — a compaction"
                         " with no health bound would recluster nothing")
    if subsplit < 2:
        raise ValueError("subsplit must be >= 2")
    asg, cent, mf = load_ivf_index(spark, path)
    id_col, vec_col = mf["id_col"], mf["vec_col"]

    stats = ivf_index_stats(spark, path).collect()  # k rows: model-scale
    drifted = sorted(
        int(r.cell) for r in stats
        if (min_mean_cos is not None and r.mean_cos < min_mean_cos)
        or (max_frac is not None and r.frac_of_corpus > max_frac
            and r.n_vectors >= subsplit)
    )
    if not drifted:
        return {"drifted": [], "new_cells": [],
                "n_clusters": mf["n_clusters"]}

    vec_type = dict(asg.dtypes)[vec_col]
    # fresh ids come from the CENTROID relation, not the stats: a cell
    # with zero assigned vectors has a centroid but no stats row, and
    # re-minting its cid would leave two centroids with one id
    cent_rows = cent.collect()  # k rows: model-scale
    next_cid = max(int(r.cid) for r in cent_rows) + 1
    new_cells: list[int] = []
    new_cent_rows: list[tuple[int, list[float]]] = []
    rewrites = None
    for cell in drifted:
        members = asg.filter(F.col("cell") == cell)  # partition-pruned
        sub = kmeans_centroids(
            members, id_col=id_col, vec_col=vec_col,
            n_clusters=subsplit, n_iter=n_iter,
        ).collect()  # subsplit rows
        # sub-cid 0 keeps the old cell id (its partition dir is
        # overwritten in place); the rest allocate fresh ids
        cid_map = {0: cell}
        for j in range(1, len(sub)):
            cid_map[j] = next_cid
            new_cells.append(next_cid)
            next_cid += 1
        pairs = [(cid_map[int(r.cid)], [float(x) for x in r.ce])
                 for r in sub]
        new_cent_rows.extend(pairs)
        subc = spark.createDataFrame(pairs,
                                     "cid int, centroid array<double>")
        dbl = F.col(vec_col).cast("array<double>")
        # per-ROW argmax: ivf_index_append never enforces id uniqueness
        # (a re-run append is two legitimate copies) and the compact
        # contract is that ONLY cell membership changes — _assign_cells
        # yields exactly one output row per member row with no shuffle
        # and no retry-fragile synthetic key
        reasg = _assign_cells(
            members.select(F.col(id_col).alias("id"), dbl.alias("e")),
            subc,
        ).select(
            F.col("id").alias(id_col),
            F.col("e").cast(vec_type).alias(vec_col),
            "cell",
        )
        rewrites = reasg if rewrites is None else rewrites.unionByName(reasg)

    # ---- crash-atomic commit: stage, mark, roll forward ----------------
    # No live file is touched until the reassignment AND the merged
    # centroid relation are fully staged next to the live dirs. Then the
    # commit marker lands (naming exactly which live cell dirs die) and
    # _apply_compact_commit executes the deletes+renames in an order
    # that is idempotent under replay. A death at ANY point leaves the
    # index either fully pre-compaction (marker never landed — the
    # staging dirs are inert leftovers the next compact overwrites) or
    # refusing by name until finish_ivf_compact rolls it forward —
    # never a silently vector-dropping index. (A dynamic partition
    # overwrite could not replace a reused cell id that receives no
    # members, and a bare delete+append window had no recovery marker.)
    stage_asg = _index_path(path, "_compact_stage_assignments")
    stage_cent = _index_path(path, "_compact_stage_centroids")
    (rewrites.write.mode("overwrite")
     .partitionBy("cell")
     .parquet(stage_asg))

    # the centroid relation is k' rows (model-scale): merge driver-side
    # so the staged write never reads the path its commit replaces
    gone = set(drifted)
    kept_rows = [
        (int(r.cid), [float(x) for x in r.centroid])
        for r in cent_rows if int(r.cid) not in gone
    ]
    spark.createDataFrame(
        kept_rows + [(int(c), e) for c, e in new_cent_rows],
        "cid int, centroid array<double>",
    ).write.mode("overwrite").parquet(stage_cent)

    # drifted cells whose reused id received NO members have no staged
    # cell dir; their stale live dirs must still die at commit, and the
    # marker records them so replay deletes them too (they can never
    # hold post-commit data — no staged dir takes their name)
    fs, _, jvm = _hadoop_fs(spark, path)
    staged_names = {
        st.getPath().getName()
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(stage_asg))
    }
    delete_only = [c for c in drifted
                   if f"cell={c}" not in staged_names]

    mf = dict(mf)
    mf["n_clusters"] = int(mf["n_clusters"]) + len(new_cells)
    marker = {"delete_only": delete_only, "manifest": mf}
    _fs_write_text(spark, _index_path(path, _COMPACT_MARKER),
                   _json.dumps(marker))
    _apply_compact_commit(spark, path)
    return {"drifted": drifted, "new_cells": new_cells,
            "n_clusters": mf["n_clusters"]}


def finish_ivf_compact(spark, path: str) -> bool:
    """Roll an interrupted :func:`ivf_index_compact` commit FORWARD.
    Returns True if a commit marker was found and applied, False if the
    index was not mid-compaction. Safe to call at any time: the marker
    only lands after the replacement data is fully staged, and every
    commit step is idempotent under replay, so repeated crashes during
    recovery converge on the committed index."""
    fs, _, jvm = _hadoop_fs(spark, path)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(
            _index_path(path, _COMPACT_MARKER))):
        return False
    _apply_compact_commit(spark, path)
    return True


def _apply_compact_commit(spark, path: str) -> None:
    """Execute (or re-execute) the staged compact commit. Replay-safe by
    construction: a staged cell dir disappears exactly when its rename
    lands, so on replay only the still-staged cells are (re)swapped; the
    delete_only cells can never hold post-commit data; the manifest
    rewrite is idempotent; the marker dies last."""
    import json as _json

    marker = _json.loads(
        _fs_read_text(spark, _index_path(path, _COMPACT_MARKER)))
    fs, _, jvm = _hadoop_fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    asg_root = _index_path(path, "assignments")
    stage_asg = P(_index_path(path, "_compact_stage_assignments"))
    stage_cent = P(_index_path(path, "_compact_stage_centroids"))

    for cell in marker["delete_only"]:
        d = P(_index_path(asg_root, f"cell={cell}"))
        if fs.exists(d):
            fs.delete(d, True)
    if fs.exists(stage_asg):
        for st in fs.listStatus(stage_asg):
            name = st.getPath().getName()
            if not name.startswith("cell="):
                continue  # _SUCCESS etc. die with the stage root
            dst = P(_index_path(asg_root, name))
            # a pre-existing dst is the STALE pre-compact dir of a
            # reused cell id (the staged dir still existing proves its
            # swap never landed) — replace it
            if fs.exists(dst):
                fs.delete(dst, True)
            if not fs.rename(st.getPath(), dst):
                raise IOError(f"compact commit: rename {name} failed")
        fs.delete(stage_asg, True)
    if fs.exists(stage_cent):
        dst = P(_index_path(path, "centroids"))
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(stage_cent, dst):
            raise IOError("compact commit: centroid swap rename failed")
    _fs_write_text(spark, _index_path(path, "_bravo_ivf.json"),
                   _json.dumps(marker["manifest"]))
    fs.delete(P(_index_path(path, _COMPACT_MARKER)), False)


# ---------------------------------------------------------------------------
# n-gram language-model quality filter (CCNet-style, stupid backoff)
# ---------------------------------------------------------------------------


def ngram_lm_counts(
    docs: DataFrame,
    text_col: str = "text",
    *,
    token_re: str = "[a-z0-9]+",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Train a trigram count model for stupid-backoff scoring
    (Brants et al. 2007, "Large Language Models in Machine Translation" —
    the smoothing explicitly designed for distributed MapReduce
    estimation; CCNet, Wenzek et al. 2020, is the pipeline precedent for
    LM-scoring crawl text before training).

    Returns ``(tri, bi, uni, tot)``:

    * ``tri``  — (w2, w1, w, c): trigram counts over ``<s> <s>``-padded
      lowercase token streams (so the first real token of every document
      trains a full-order event);
    * ``bi``   — (w1, w, c): bigram counts over the same padded streams;
    * ``uni``  — (w, c): unigram counts INCLUDING the pads (so every
      backoff context that can occur at scoring time has a row);
    * ``tot``  — a 1-row (n) relation with the unigram grand total.

    Scale shape: one map-side n-gram explode per order feeding a partial-
    aggregated ``groupBy`` — three shuffles whose outputs are VOCABULARY-
    sized (heavy-tailed, far smaller than the corpus). No collect: the
    grand total stays a 1-row relation for the scorer to broadcast.
    Documents with zero tokens contribute nothing (and score as no rows):
    Spark's ``sequence(3, 2)`` DESCENDS instead of emitting empty, so the
    window builders filter them out up front."""
    toks = docs.select(
        F.concat(
            F.array(F.lit("<s>"), F.lit("<s>")),
            F.expr(f"regexp_extract_all(lower({text_col}), '{token_re}', 0)"),
        ).alias("t")
    ).filter(F.size("t") >= 3)
    wins3 = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(3, size(t)), i ->"
                " array(element_at(t, i-2), element_at(t, i-1),"
                " element_at(t, i)))"
            )
        ).alias("p")
    )
    tri = wins3.groupBy(
        F.col("p")[0].alias("w2"), F.col("p")[1].alias("w1"),
        F.col("p")[2].alias("w"),
    ).agg(F.count("*").alias("c"))
    wins2 = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(2, size(t)), i ->"
                " array(element_at(t, i-1), element_at(t, i)))"
            )
        ).alias("p")
    )
    bi = wins2.groupBy(
        F.col("p")[0].alias("w1"), F.col("p")[1].alias("w")
    ).agg(F.count("*").alias("c"))
    unis = toks.select(F.explode("t").alias("w"))
    uni = unis.groupBy("w").agg(F.count("*").alias("c"))
    tot = unis.agg(F.count("*").alias("n"))
    return tri, bi, uni, tot


def ngram_lm_score(
    docs: DataFrame,
    lm: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    token_re: str = "[a-z0-9]+",
    keep_micro: int = 10_000,
) -> DataFrame:
    """Score documents with stupid backoff against an
    :func:`ngram_lm_counts` model and return per-document statistics.

    Per token (context ``w2 w1``, word ``w``), in EXACT integer
    micro-units so the result hashes identically on any engine (the
    repo-wide integer-micro-unit discipline — float log-probs differ in
    the last ulp across libms):

    * trigram hit:  ``c(w2 w1 w) * 1_000_000 div c(w2 w1)``
    * bigram hit:   ``c(w1 w) * 400_000 div c(w1)``   (α = 0.4)
    * unigram hit:  ``c(w) * 160_000 div N``          (α² = 0.16)
    * OOV:          ``160_000 div N``                 (count-1 floor)

    Output columns: ``(id_col, n_tokens, tri_hits, bi_hits, uni_hits,
    oov, lm_score_micro, keep, ppl_proxy)`` where ``lm_score_micro`` is
    the integer mean of the per-token micro scores, ``keep`` is 1 iff it
    reaches ``keep_micro``, and ``ppl_proxy`` (DOUBLE, the one float —
    derived deterministically from the integer micro scores, for human
    inspection; gate projections drop it) is
    ``exp(-mean(ln(max(micro,1)/1e6)))`` — the stupid-backoff analog of
    perplexity at micro-unit resolution.

    Scale shape: the scorer is five shuffle equi-joins of token-level
    rows against vocabulary-sized count relations plus one broadcast of
    the 1-row total — the unavoidable shape of distributed LM scoring
    (the counts are too big to broadcast at corpus scale); AQE handles
    the skewed head words. One final ``groupBy`` back to document grain."""
    tri, bi, uni, tot = lm
    sc = (
        docs.select(
            F.col(id_col),
            F.concat(
                F.array(F.lit("<s>"), F.lit("<s>")),
                F.expr(
                    f"regexp_extract_all(lower({text_col}), '{token_re}', 0)"
                ),
            ).alias("t"),
        )
        .filter(F.size("t") >= 3)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(3, size(t)), i ->"
                    " array(element_at(t, i-2), element_at(t, i-1),"
                    " element_at(t, i)))"
                )
            ).alias("p"),
        )
        .select(
            id_col,
            F.col("p")[0].alias("w2"), F.col("p")[1].alias("w1"),
            F.col("p")[2].alias("w"),
        )
    )
    j = (
        sc.join(
            tri.select(
                F.col("w2").alias("t_w2"), F.col("w1").alias("t_w1"),
                F.col("w").alias("t_w"), F.col("c").alias("tri_c"),
            ),
            (F.col("w2") == F.col("t_w2")) & (F.col("w1") == F.col("t_w1"))
            & (F.col("w") == F.col("t_w")),
            "left",
        )
        .join(
            bi.select(
                F.col("w1").alias("bc_w1"), F.col("w").alias("bc_w"),
                F.col("c").alias("ctx3_c"),
            ),
            (F.col("w2") == F.col("bc_w1")) & (F.col("w1") == F.col("bc_w")),
            "left",
        )
        .join(
            bi.select(
                F.col("w1").alias("b_w1"), F.col("w").alias("b_w"),
                F.col("c").alias("bi_c"),
            ),
            (F.col("w1") == F.col("b_w1")) & (F.col("w") == F.col("b_w")),
            "left",
        )
        .join(
            uni.select(F.col("w").alias("uc_w"), F.col("c").alias("ctx2_c")),
            F.col("w1") == F.col("uc_w"), "left",
        )
        .join(
            uni.select(F.col("w").alias("u_w"), F.col("c").alias("uni_c")),
            F.col("w") == F.col("u_w"), "left",
        )
        .join(F.broadcast(tot))  # 1-row relation
    )
    micro = F.expr(
        "CASE WHEN tri_c IS NOT NULL THEN tri_c * 1000000 DIV ctx3_c"
        " WHEN bi_c IS NOT NULL THEN bi_c * 400000 DIV ctx2_c"
        " WHEN uni_c IS NOT NULL THEN uni_c * 160000 DIV n"
        " ELSE 160000 DIV n END"
    )
    order_hit = F.expr(
        "CASE WHEN tri_c IS NOT NULL THEN 3 WHEN bi_c IS NOT NULL THEN 2"
        " WHEN uni_c IS NOT NULL THEN 1 ELSE 0 END"
    )
    per_doc = (
        j.select(id_col, micro.alias("micro"), order_hit.alias("o"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.expr("IF(o = 3, 1, 0)")).alias("tri_hits"),
            F.sum(F.expr("IF(o = 2, 1, 0)")).alias("bi_hits"),
            F.sum(F.expr("IF(o = 1, 1, 0)")).alias("uni_hits"),
            F.sum(F.expr("IF(o = 0, 1, 0)")).alias("oov"),
            F.sum("micro").alias("_sum_micro"),
            F.avg(-F.log(F.greatest(F.col("micro"), F.lit(1)) / 1e6)).alias(
                "_nll"
            ),
        )
    )
    return per_doc.select(
        id_col, "n_tokens", "tri_hits", "bi_hits", "uni_hits", "oov",
        F.expr("_sum_micro DIV n_tokens").alias("lm_score_micro"),
        F.expr(
            f"CAST(_sum_micro DIV n_tokens >= {keep_micro} AS INT)"
        ).alias("keep"),
        F.exp("_nll").alias("ppl_proxy"),
    )


# ---------------------------------------------------------------------------
# persisted positional inverted index + exact phrase search
# ---------------------------------------------------------------------------


def build_inverted_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_re: str = "[a-z0-9]+",
    n_buckets: int = 64,
) -> dict:
    """Build a PERSISTED positional inverted index: posting rows
    ``(term, doc_id, pos)`` written as parquet PARTITIONED BY
    ``bucket = xxhash64(term) mod n_buckets`` under ``path`` plus a tiny
    Hadoop-FS manifest — the text-retrieval twin of
    :func:`build_ivf_index`. Build once, query many:
    :func:`phrase_search` reads only the PHRASE TERMS' buckets in FILE
    terms (partition pruning), so a k-term query touches ~k/n_buckets of
    the index instead of rescanning the corpus.

    Positions are 1-based token offsets in the lowercase ``token_re``
    stream. One map-side posexplode, then ONE shuffle on ``bucket``
    before the partitioned write (r19, guide §6): without it every scan
    task writes a file into every bucket directory — tasks × n_buckets
    small files per build (measured 32×64 at bench scale; at corpus
    scale the same layout is the classic small-files problem). Clustered
    by bucket, the writer emits exactly one file per bucket per owning
    task, and per-term skew (stopwords) still spreads across the rows
    WITHIN a bucket file."""
    posts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), '{token_re}', 0)"
                )
            ).alias("pos0", "term"),
        )
        .select(
            "term",
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("bucket"),
        )
    )
    posts.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(_index_path(path, "postings"))
    manifest = {
        "version": 1, "kind": "inverted_index", "id_col": id_col,
        "token_re": token_re, "n_buckets": n_buckets,
    }
    import json as _json

    _fs_write_text(
        docs.sparkSession, _index_path(path, "_bravo_invidx.json"),
        _json.dumps(manifest),
    )
    return manifest


def load_inverted_index(spark: SparkSession, path: str):
    """→ ``(postings DataFrame, manifest)``. The postings relation keeps
    its ``bucket`` partition column so term filters prune at FILE level."""
    import json as _json

    manifest = _json.loads(
        _fs_read_text(spark, _index_path(path, "_bravo_invidx.json"))
    )
    if manifest.get("kind") != "inverted_index":
        raise ValueError(f"{path!r} is not an inverted index")
    posts = spark.read.parquet(_index_path(path, "postings"))
    return posts, manifest


def phrase_search(spark: SparkSession, path: str, phrase: str) -> DataFrame:
    """Exact phrase search against a :func:`build_inverted_index` index:
    per matching document, the match count and first (1-based) position.

    The probe filters each phrase term's posting list down by
    ``bucket`` (partition pruning — file-level) AND ``term`` (parquet
    predicate pushdown — row-group level), then chains positional
    adjacency equi-joins: term_i must appear at ``pos_0 + i``. k-1
    shuffle joins of single-term posting lists — each a tiny fraction
    of the index — then one groupBy back to document grain. Nothing
    rescans text; that is the entire point of a persisted index."""
    posts, mf = load_inverted_index(spark, path)
    import re as _re

    terms = _re.findall(mf["token_re"], phrase.lower())
    if not terms:
        raise ValueError(f"phrase {phrase!r} has no tokens")
    nb = mf["n_buckets"]

    def posting(i: int, term: str) -> DataFrame:
        return (
            posts.filter(
                (F.col("bucket") == F.pmod(F.xxhash64(F.lit(term)), F.lit(nb)))
                & (F.col("term") == term)
            )
            # anchor every term's position to where the PHRASE starts
            .select("doc_id", (F.col("pos") - i).alias("p0"))
        )

    cur = posting(0, terms[0])
    for i, t in enumerate(terms[1:], start=1):
        nxt = posting(i, t).withColumnRenamed("doc_id", "d2")
        cur = cur.join(
            nxt, (cur["doc_id"] == nxt["d2"]) & (cur["p0"] == nxt["p0"]),
            "inner",
        ).select(cur["doc_id"], cur["p0"])
    return cur.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"),
        F.min("p0").alias("first_pos"),
    )


def save_ngram_lm(
    lm: tuple[DataFrame, DataFrame, DataFrame, DataFrame], path: str
) -> dict:
    """Persist an :func:`ngram_lm_counts` model: the three count
    relations and the 1-row total as parquet under ``path`` plus a tiny
    Hadoop-FS manifest — train once on the big corpus, score many
    (the same build-once contract as the IVF and inverted indexes).
    All four writes are distributed; nothing is collected."""
    import json as _json

    tri, bi, uni, tot = lm
    tri.write.mode("overwrite").parquet(_index_path(path, "tri"))
    bi.write.mode("overwrite").parquet(_index_path(path, "bi"))
    uni.write.mode("overwrite").parquet(_index_path(path, "uni"))
    tot.write.mode("overwrite").parquet(_index_path(path, "tot"))
    # record each relation's DDL so load_ngram_lm can skip parquet
    # schema inference (r19: four footer-inference reads per load were
    # ~0.4 s of per-score-call latency)
    manifest = {
        "version": 1, "kind": "ngram_lm", "order": 3,
        "schemas": {
            "tri": tri.schema.jsonValue(),
            "bi": bi.schema.jsonValue(),
            "uni": uni.schema.jsonValue(),
            "tot": tot.schema.jsonValue(),
        },
    }
    _fs_write_text(
        tri.sparkSession, _index_path(path, "_bravo_ngram_lm.json"),
        _json.dumps(manifest),
    )
    return manifest


def load_ngram_lm(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """→ the ``(tri, bi, uni, tot)`` tuple :func:`ngram_lm_score`
    consumes, backed by the persisted parquet relations."""
    import json as _json

    manifest = _json.loads(
        _fs_read_text(spark, _index_path(path, "_bravo_ngram_lm.json"))
    )
    if manifest.get("kind") != "ngram_lm":
        raise ValueError(f"{path!r} is not a persisted n-gram LM")
    schemas = manifest.get("schemas") or {}

    def _read(part: str) -> DataFrame:
        # a recorded schema skips parquet footer inference (pre-r19
        # manifests lack it and fall back)
        reader = spark.read
        if part in schemas:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(schemas[part]))
        return reader.parquet(_index_path(path, part))

    return tuple(_read(part) for part in ("tri", "bi", "uni", "tot"))


def redact_exif(
    df: DataFrame,
    payload_col: str,
    *,
    out_col: str | None = None,
    flag_col: str = "exif_redacted",
    quarantine: bool = False,
) -> DataFrame:
    """Strip Exif APP1 segments from every JPEG in a binary column —
    the PII-redaction step a multimodal pipeline runs BEFORE anything
    else touches crawl images (GPS tags are location PII). Non-JPEG
    payloads pass through untouched with ``flag_col`` = 0; JPEGs gain
    ``flag_col`` = 1 iff an Exif segment was actually removed. The
    strip is a segment splice (inventory/exif.py) — pixels are never
    re-encoded, so the operation is lossless and idempotent.

    Malformed JPEG marker streams fail the task loudly (ExifError) by
    default rather than letting PII slip through a "best-effort" pass.
    Real crawl corpora always contain torn JPEGs, though, so
    ``quarantine=True`` opts into isolating them instead of killing the
    pipeline: the payload is NULLED (never passed through unredacted —
    a torn marker stream may still carry an intact Exif segment) and
    ``flag_col`` is set to -1 so the caller can route the originals to
    a quarantine sink by flag. Map-only mapInPandas; pipelines with the
    payload scan at any scale."""
    from pyspark.sql import types as T

    from bravo_spark.inventory.exif import ExifError, strip_exif

    out_col = out_col or payload_col
    # fail at PLAN time, not deep inside a task: a colliding flag_col
    # (e.g. re-running over already-redacted output) would produce a
    # duplicate schema field, and an out_col naming a different
    # existing column would silently overwrite its data
    if flag_col in df.columns:
        raise ValueError(f"flag_col {flag_col!r} already exists in the"
                         " DataFrame — name the new flag column")
    if out_col != payload_col and out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} would overwrite an"
                         " existing column")
    in_fields = df.schema.fields
    schema = T.StructType(
        [f for f in in_fields if f.name != out_col]
        + [T.StructField(out_col, T.BinaryType())]
        + [T.StructField(flag_col, T.IntegerType())]
    )
    other = [f.name for f in schema.fields
             if f.name not in (out_col, flag_col)]

    def scrub(batches):
        import pandas as _pd

        for pdf in batches:
            cleaned, flags = [], []
            for blob in pdf[payload_col]:
                raw = bytes(blob) if blob is not None else None
                if raw is None or raw[:2] != b"\xff\xd8":
                    cleaned.append(raw)
                    flags.append(0)
                    continue
                try:
                    red = strip_exif(raw)
                except ExifError:
                    if not quarantine:
                        raise
                    cleaned.append(None)
                    flags.append(-1)
                else:
                    cleaned.append(red)
                    flags.append(int(red != raw))
            out = _pd.DataFrame({c: pdf[c] for c in other})
            out[out_col] = cleaned
            out[flag_col] = flags
            yield out

    return df.mapInPandas(scrub, schema)


def train_linear_classifier(
    features: DataFrame,
    labels: DataFrame,
    *,
    dim: int,
    id_col: str = "doc_id",
    label_col: str = "label",
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Train the logistic-regression weights that
    :func:`linear_text_score` applies — the missing training half of the
    fastText-style quality classifier (features from
    :func:`hash_ngram_features`, long form; ``labels`` is (id, 0/1)).

    Full-batch gradient descent: each iteration is ONE distributed pass
    — score every document with the current broadcast weights (the same
    join/agg shape as the scorer itself), join the labels, push the
    per-document logistic error back onto its feature buckets, and
    aggregate per-bucket gradients. Only MODEL-sized data ever reaches
    the driver (a ``dim``-length gradient per iteration, same scale as
    the k-means centroid collects). Features are count-normalized per
    document exactly as the scorer normalizes, so train and apply see
    identical inputs.

    Returns ``(weights, bias)`` ready for ``linear_text_score``."""
    import math

    if dim <= 0 or iters <= 0:
        raise ValueError("dim and iters must be positive")
    spark = features.sparkSession
    lab = labels.select(
        F.col(id_col), F.col(label_col).cast("double").alias("_y")
    )
    totals = features.groupBy(id_col).agg(F.sum("count").alias("_tot"))
    base = (
        features.join(totals, id_col)
        .join(lab, id_col)
        .select(
            id_col, "bucket",
            (F.col("count") / F.col("_tot")).alias("_x"), "_y",
        )
    )
    base = track_cache(base)
    n_docs = base.select(id_col).distinct().count()
    if n_docs == 0:
        raise ValueError("no labeled documents after the join")

    w = [0.0] * dim
    bias = 0.0
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(i, x) for i, x in enumerate(w) if x != 0.0] or [(0, 0.0)],
            "bucket int, _w double",
        )
        scored = (
            base.join(F.broadcast(wdf), "bucket", "left")
            .groupBy(id_col, "_y")
            .agg(
                (F.lit(bias)
                 + F.sum(F.coalesce(F.col("_w"), F.lit(0.0)) * F.col("_x"))
                 ).alias("_s")
            )
            # logistic error: sigmoid(s) - y, JVM-side
            .select(
                id_col,
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_s")))
                 - F.col("_y")).alias("_e"),
            )
        )
        grad_rows = (
            base.join(scored, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_e") * F.col("_x")).alias("_g"))
            .collect()  # <= dim rows: model-scale, like k-means centroids
        )
        gbias = scored.agg(F.sum("_e")).first()[0] or 0.0
        # L2 decays EVERY weight, not just buckets that produced a data
        # gradient this iteration — otherwise untouched buckets never
        # shrink and the result is not full-batch L2-regularized GD
        if l2:
            w = [x * (1.0 - lr * l2) for x in w]
        for r in grad_rows:
            b = int(r.bucket)
            w[b] -= lr * r._g / n_docs
        bias -= lr * gbias / n_docs
        if not all(math.isfinite(x) for x in w) or not math.isfinite(bias):
            raise ValueError(
                "training diverged (non-finite weights) — lower lr"
            )
    return w, bias


def _chat_turn(role, content, turn_prefix: str, turn_suffix: str):
    """One rendered chat turn — ``{prefix}{role}\\n{content}{suffix}``.

    THE serialization shared by :func:`flatten_chat` and
    :func:`prep_preference_pairs`, factored out so the 'SFT and
    preference data leave the pipeline in one consistent
    serialization' guarantee is enforced by construction, not by two
    hardcoded literals drifting apart (a cross-test pins it too)."""
    return F.concat(F.lit(turn_prefix), role, F.lit("\n"), content,
                    F.lit(turn_suffix))


def flatten_chat(
    df: DataFrame,
    conv_col: str,
    *,
    roles: tuple[str, ...] = ("system", "user", "assistant"),
    turn_prefix: str = "<|im_start|>",
    turn_suffix: str = "<|im_end|>\n",
    quarantine: bool = False,
) -> DataFrame:
    """SFT conversation prep: parse a JSON conversation column, validate
    the turn structure, and flatten valid conversations into one
    training string — the step that turns a chat corpus into model
    input, and the last LLM-pipeline family this module lacked.

    ``conv_col`` holds a JSON array of ``{"role": ..., "content": ...}``
    turns (the common interchange shape of public chat corpora). A
    conversation is VALID iff it parses, is non-empty, every role is in
    ``roles``, every content is non-empty, at most one ``system`` turn
    sits at index 0, the remaining turns alternate strictly
    user/assistant starting with user, and the final turn is an
    assistant turn (a conversation without an assistant target has
    nothing to train on). Each rule has a named reason, assigned in
    priority order: ``unparseable_json``, ``empty_conversation``,
    ``unknown_role``, ``empty_content``, ``system_not_first``,
    ``broken_alternation``, ``no_assistant_target``.

    Adds columns: ``chat_reason`` (null = valid), ``chat_text`` (the
    turns rendered as ``{prefix}{role}\\n{content}{suffix}`` and
    concatenated — ChatML-shaped by default; null for invalid rows),
    ``n_turns``, ``n_assistant_turns``, ``assistant_chars`` (null for
    invalid rows). With ``quarantine=False`` (default) invalid rows are
    DROPPED — the training-set path; ``quarantine=True`` keeps them
    with the reason named, so the drop profile is observable (the
    redact_exif posture: quarantine, don't silently skip).

    Scale shape: everything is JVM-side (``from_json`` + higher-order
    array functions) — zero Python, zero shuffles, map-only at any
    corpus size; validity is decided per row with no cross-row state.
    """
    if "assistant" not in roles or "user" not in roles:
        raise ValueError("roles must include 'user' and 'assistant'")
    taken = {"chat_reason", "chat_text", "n_turns", "n_assistant_turns",
             "assistant_chars", "_conv"}
    clash = sorted(taken.intersection(df.columns))
    if clash:
        # the sibling contract (extract_http_html, canonicalize_urls):
        # never silently clobber caller columns
        raise ValueError(
            f"column(s) {clash} already exist on the input — rename "
            "them before flatten_chat")
    conv = F.from_json(
        F.col(conv_col), "array<struct<role:string,content:string>>"
    )
    n = F.size(conv)
    # ANSI-safe positional access (conv[0] throws out-of-bounds in
    # Spark 4 ANSI mode; try_element_at is the sanctioned null form)
    first_role = F.try_element_at(conv, F.lit(1)).getField("role")
    last_role = F.try_element_at(conv, n).getField("role")
    # turns after the optional leading system turn: must alternate
    # user/assistant starting with user
    body = F.when(
        first_role == "system", F.slice(conv, 2, n - 1)
    ).otherwise(conv)
    bad_alternation = F.exists(
        F.transform(
            body,
            lambda t, i: t.getField("role")
            != F.when(i % 2 == 0, "user").otherwise("assistant"),
        ),
        lambda b: b,
    )
    reason = (
        F.when(conv.isNull(), "unparseable_json")
        .when(n == 0, "empty_conversation")
        .when(
            F.exists(
                conv,
                lambda t: t.getField("role").isNull()
                | ~t.getField("role").isin(*roles),
            ),
            "unknown_role",
        )
        .when(
            F.exists(
                conv,
                lambda t: t.getField("content").isNull()
                | (F.length(t.getField("content")) == 0),
            ),
            "empty_content",
        )
        .when(
            F.exists(body, lambda t: t.getField("role") == "system"),
            "system_not_first",
        )
        .when(bad_alternation, "broken_alternation")
        .when(last_role != "assistant", "no_assistant_target")
    )
    out = df.withColumn("chat_reason", reason).withColumn(
        "_conv", conv
    )
    valid = F.col("chat_reason").isNull()
    conv2 = F.col("_conv")
    out = (
        out.withColumn(
            "chat_text",
            F.when(
                valid,
                F.array_join(
                    F.transform(
                        conv2,
                        lambda t: _chat_turn(
                            t.getField("role"), t.getField("content"),
                            turn_prefix, turn_suffix),
                    ),
                    "",
                ),
            ),
        )
        .withColumn("n_turns", F.when(valid, F.size(conv2)))
        .withColumn(
            "n_assistant_turns",
            F.when(
                valid,
                F.size(
                    F.filter(
                        conv2, lambda t: t.getField("role") == "assistant"
                    )
                ),
            ),
        )
        .withColumn(
            "assistant_chars",
            F.when(
                valid,
                F.aggregate(
                    F.filter(
                        conv2, lambda t: t.getField("role") == "assistant"
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, t: acc
                    + F.length(t.getField("content")).cast("long"),
                ),
            ),
        )
        .drop("_conv")
    )
    if not quarantine:
        out = out.filter(valid)
    return out


def prep_preference_pairs(
    df: DataFrame,
    prompt_col: str,
    chosen_col: str,
    rejected_col: str,
    *,
    turn_prefix: str = "<|im_start|>",
    turn_suffix: str = "<|im_end|>\n",
    quarantine: bool = False,
) -> DataFrame:
    """Preference-pair (DPO/RLHF reward-modeling) data prep — the
    post-training companion of :func:`flatten_chat`: validate
    (prompt, chosen, rejected) triples and render both completions
    through the same chat template, so SFT and preference data leave
    the pipeline in one consistent serialization.

    A triple is VALID iff prompt, chosen, and rejected are all
    non-null/non-empty and the two completions differ (an identical
    pair carries zero preference signal and silently biases a DPO
    loss toward its length prior). Named reasons, priority order:
    ``empty_prompt``, ``empty_chosen``, ``empty_rejected``,
    ``identical_pair``.

    Adds columns: ``pair_reason`` (null = valid), ``chosen_text`` /
    ``rejected_text`` (prompt as the user turn + completion as the
    assistant turn, ChatML-shaped; null for invalid rows), and
    ``length_gap`` (``length(chosen) - length(rejected)`` in chars —
    THE standard length-bias diagnostic: a corpus whose mean gap is
    far from zero teaches the reward model verbosity, so the column
    exists to be aggregated, not filtered on). ``quarantine=False``
    drops invalid rows; ``True`` keeps them with the reason named.

    Scale shape: pure JVM string expressions, map-only, zero shuffles
    at any corpus size; validity is per-row."""
    taken = {"pair_reason", "chosen_text", "rejected_text", "length_gap"}
    clash = sorted(taken.intersection(df.columns))
    if clash:
        raise ValueError(
            f"column(s) {clash} already exist on the input — rename "
            "them before prep_preference_pairs")
    p = F.col(prompt_col)
    c = F.col(chosen_col)
    r = F.col(rejected_col)
    reason = (
        F.when(p.isNull() | (F.length(p) == 0), "empty_prompt")
        .when(c.isNull() | (F.length(c) == 0), "empty_chosen")
        .when(r.isNull() | (F.length(r) == 0), "empty_rejected")
        .when(c == r, "identical_pair")
    )

    def render(completion):
        return F.concat(
            _chat_turn(F.lit("user"), p, turn_prefix, turn_suffix),
            _chat_turn(F.lit("assistant"), completion,
                       turn_prefix, turn_suffix),
        )

    out = df.withColumn("pair_reason", reason)
    valid = F.col("pair_reason").isNull()
    out = (
        out.withColumn("chosen_text", F.when(valid, render(c)))
        .withColumn("rejected_text", F.when(valid, render(r)))
        .withColumn(
            "length_gap",
            F.when(valid, (F.length(c) - F.length(r)).cast("long")),
        )
    )
    if not quarantine:
        out = out.filter(valid)
    return out
