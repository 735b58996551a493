"""Plan-quality regression tests: the physical plans Catalyst produces for
our queries must keep the properties that make them scale — broadcast for
dim joins, predicate pushdown into the parquet scan, column pruning, and no
gratuitous shuffles. A correctness-green query that loses one of these is a
perf bug at 100 TB even though every test stays green — so they're pinned
here.
"""

from __future__ import annotations

import pytest


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as e

    qs = e.queries()

    def plan_of(name: str, mode: str = "simple") -> str:
        jqe = qs[name](spark, SF)._jdf.queryExecution()
        if mode == "formatted":
            # toString() truncates long PushedFilters lists; formatted
            # explain prints each scan's full filter set
            jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            return jqe.explainString(jmode)
        if mode == "analyzed":
            # pre-optimization logical plan — where join hints
            # (ResolvedHint) are still visible before Catalyst consumes them
            return jqe.analyzed().toString()
        return jqe.executedPlan().toString()

    return plan_of


def test_join_enrich_join_selection_unpinned(plans):
    """Join SELECTION is deliberately unpinned (r15, the tpch_q3
    precedent): the enrichment side is `customer`, sf-proportional
    (~15 B rows at TPC-H-100TB), so the former forced-broadcast hint was
    a scale-killer the plan pin itself mandated. AQE broadcasts at
    fixture scale and degrades to a shuffled join at real scale; what we
    pin is that the join stays an equi-join with no hint residue."""
    p = plans("join_enrich")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "ResolvedHint" not in plans("join_enrich", "analyzed")


def test_join_enrich_prunes_columns(plans):
    # counts side should scan ONLY user_id
    assert "struct<user_id:bigint>" in plans("join_enrich")


def test_isin_filter_pushed_to_scan(plans):
    p = plans("f2_isin_filter")
    assert "In(l_returnflag" in p  # PushedFilters


def test_p1_pushes_equality_and_prunes(plans):
    p = plans("p1_value_kv")
    assert "EqualTo(event_type,click)" in p
    # only the 3 needed columns reach the scan
    assert "struct<event_id:bigint,event_type:string,value:double>" in p


def test_tpch_q3_pushes_date_ranges_no_pathological_join(plans):
    """Date predicates reach the parquet scans and both joins stay
    equi-joins. Join SELECTION is deliberately unpinned (r14): the
    filtered customer side is sf-proportional (~20% of the table — billions
    of rows at TPC-H-100TB), so a forced broadcast hint would hard-fail at
    scale; AQE broadcasts at fixture scale and picks SMJ at real scale."""
    p = plans("tpch_q3")
    assert "GreaterThan(l_shipdate" in p
    assert "LessThan(o_orderdate" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "ResolvedHint" not in plans("tpch_q3", "analyzed")


def test_scan_only_ops_have_no_shuffle(plans):
    # per-document ops are map-only: any Exchange is a regression
    # (text_chunk_overlap: sequence→explode→substring must also stay
    # JVM-side — a Python eval node would put every chunk through Arrow)
    for name in ("text_fingerprint", "text_token_count", "multimodal_meta",
                 "text_chunk_overlap"):
        p = plans(name)
        assert "Exchange" not in p, name
        assert "BatchEvalPython" not in p, name


def test_single_shuffle_aggregations(plans):
    # partial (map-side) agg + one exchange + final agg
    p = plans("a2_count_sum_per_key")
    assert p.count("Exchange") == 1
    assert "HashAggregate" in p


def test_embedding_lsh_dedup_has_no_nested_loop_join(plans):
    # the LSH→exact-verify composition must stay an equi-join pipeline;
    # a BroadcastNestedLoopJoin would mean the all-pairs product leaked back
    p = plans("dedup_embedding_lsh")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_embedding_lsh_band_stacking_is_single_scan(plans):
    # the (band, hash) stacking must be one explode over one signature
    # pass — the former 32-way unionByName re-evaluated the signature
    # mapInPandas (a full corpus scan + 256 dot products per row) once
    # per band leg when populating the cache. The printed plan shows the
    # cached fragment once per join side (2×, each with ONE embeddings
    # scan) + the two exact-verify sides = at most 4 scans; a union
    # stacking shows ~33+.
    p = plans("dedup_embedding_lsh")
    assert "Union" not in p
    assert p.count("Scan parquet") <= 4, p.count("Scan parquet")
    # each cached-fragment print contains a single explode generator
    assert p.count("Generate explode") <= 2


def test_sketch_ann_ranking_is_broadcast(plans):
    # query signatures broadcast against the skinny signature relation; the
    # only nested-loop join allowed is the tiny broadcast q≠c pairing
    p = plans("ann_sketch_topk")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_ngram_jaccard_caps_posting_lists(plans):
    # the df-capped candidate path keeps an aggregate (the shingle document-
    # frequency cap) upstream of the self-join
    p = plans("dedup_ngram_jaccard")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the cap must be a broadcast anti-join against the tiny frequent-
    # shingle set, never a count-over-window on sh: a window needs every
    # row of a hot shingle in ONE task — the exact skew the cap bounds —
    # and AQE cannot split a window partition
    assert "Window" not in p
    assert "LeftAnti, BuildRight" in p


def test_substring_dedup_caps_posting_lists(plans):
    # same skew bound as ngram-Jaccard: broadcast anti-join against the
    # frequent-window set, never a window-count and never a shuffle join
    # against the (huge) rare set
    p = plans("dedup_substring")
    assert "Window" not in p
    assert "LeftAnti, BuildRight" in p
    assert "CartesianProduct" not in p


def test_ngram_jaccard_never_hints_per_document_broadcast(spark):
    # the sizes relation has one row PER DOCUMENT (≈10⁹ rows at 100 TB) —
    # an explicit F.broadcast on it is a driver-side scale-killer. With
    # auto-broadcast disabled, any BroadcastExchange left in the plan can
    # only come from a hint; the ONLY hinted broadcast allowed is the
    # frequent-shingle anti-join build side (≤ shingle volume / cap rows —
    # bounded by construction, not by luck). AQE may still broadcast other
    # joins at runtime when a relation is GENUINELY small — that is the
    # desired behavior and doesn't show in the static plan.
    from bravo_spark import catalog, llmops

    docs = catalog.table(spark, SF, "documents")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable auto-broadcast BEFORE building (cache() plans its fragment
    # eagerly) so any BroadcastExchange left can only come from a hint;
    # drop cached fragments from earlier tests, which were planned with
    # auto-broadcast on and would be substituted into this plan
    llmops.release_caches()
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = llmops.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_shingle_df=100
        )
        p = df._jdf.queryExecution().executedPlan().toString()
        bcast_joins = [
            ln for ln in p.splitlines() if "BroadcastHashJoin" in ln
        ]
        assert bcast_joins, "frequent-shingle anti-join missing"
        assert all("LeftAnti" in ln for ln in bcast_joins), bcast_joins
        assert "CartesianProduct" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        llmops.release_caches()


def test_range_join_keeps_equi_component(plans):
    # the time band must ride on the user_id hash join as a post-filter;
    # a cross product here is quadratic at scale
    p = plans("range_join_clicks_before_purchase")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_left_outer_join_hint_free_equi_join(plans):
    """LeftOuter equi-join with the mktsegment filter pushed to the scan
    and NO broadcast hint — the filtered customer side is sf-proportional,
    so selection belongs to AQE (broadcast small, SMJ at scale)."""
    p = plans("left_outer_join")
    assert "LeftOuter" in p
    assert "EqualTo(c_mktsegment,BUILDING)" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "ResolvedHint" not in plans("left_outer_join", "analyzed")


def test_bucketed_join_is_exchange_free(spark, plans):
    # both sides bucketed+sorted on the join key: the join itself must not
    # shuffle — that's the whole point of paying the bucketed write once.
    # At fixture scale Spark prefers broadcast (also shuffle-free); disable
    # it to prove the bucketed sort-merge path is what backs the query at
    # sizes where broadcast stops being an option.
    import __spark_entry__ as e

    # build first (the query wrapper's tune() resets confs), then disable
    # broadcast before the lazy planning happens
    df = e.queries()["bucketed_join"](spark, SF)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p
        assert "Exchange" not in p
        assert "Bucketed: true" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q6_pushes_all_predicates_to_scan(plans):
    # date range, discount band, quantity cap all reach PushedFilters —
    # at 100 TB this query is a pruned scan plus a one-row exchange
    p = plans("tpch_q6_forecast", "formatted")
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p
    assert "GreaterThanOrEqual(l_discount" in p
    assert "LessThan(l_quantity" in p


def test_q7_broadcasts_both_nation_roles(plans):
    p = plans("tpch_q7_volume")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_q5_star_hints_only_fixed_size_dims(plans):
    """Only nation (25 rows) and region (5) carry broadcast hints; the
    composed supplier⋈nation⋈region relation is sf-proportional
    (supplier ~1 B rows at 100 TB) so its join with the fact side is
    AQE's call (r15, per the r14 verdict). Exactly the two inner hints
    may survive to the analyzed plan — a third means the outer
    broadcast(dims) crept back."""
    p = plans("tpch_q5_star")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    analyzed = plans("tpch_q5_star", "analyzed")
    assert analyzed.count("ResolvedHint") == 2, analyzed


def test_q19_extracts_per_side_implications(plans):
    # Catalyst must derive brand ∈ {...} for the part scan from the
    # OR-of-ANDs; losing this makes the join input the full part table
    p = plans("tpch_q19_disjunctive", "formatted")
    # the full OR-of-ANDs is pushed to BOTH scans (part sees the brand/size
    # disjunction, lineitem the quantity disjunction)
    assert "Or(Or(And(EqualTo(p_brand,Brand#12)" in p
    assert p.count("Or(Or(And(") >= 2
    assert "CartesianProduct" not in p


def test_q22_anti_join_is_broadcast(plans):
    p = plans("tpch_q22_global_sales")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_partitioned_scan_prunes_directories(plans):
    # the event_type IN (...) predicate must hit PartitionFilters (pruned
    # before any file is opened), not just a post-scan Filter
    p = plans("partitioned_prune_scan")
    assert "PartitionFilters: [" in p
    assert "event_type#" in p.split("PartitionFilters:")[1][:200]


def test_snapshot_write_plan_is_single_shuffle(spark, tmp_path):
    from bravo_spark.codecs import flink as fc
    from bravo_spark.sources import staterows as sr
    from bravo_spark.sources.staterows import (
        with_key_group_column,
        with_operator_index_column,
    )

    kv = spark.createDataFrame([(1, 1)], "key int, value int")
    rows = sr.kv_to_state_rows(kv, "s", fc.INT, fc.INT)
    routed = with_operator_index_column(
        with_key_group_column(rows, max_parallelism=128),
        max_parallelism=128,
        parallelism=2,
    )
    shuffled = routed.repartition(2, "op_index").sortWithinPartitions(
        "op_index", "key_group"
    )
    p = shuffled._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1  # the op-index repartition, nothing else
    # the key-group extraction must be a JVM expression, not a Python UDF
    assert "pythonUDF" not in p.lower() or "MapInPandas" in p


def test_q2_min_cost_window_after_broadcast_dims(plans):
    # region restriction broadcasts; the correlated-min decorrelation is a
    # window over p_partkey (one shuffle), never a self-join of the cost
    # relation
    p = plans("tpch_q2_min_cost_supplier")
    assert "BroadcastHashJoin" in p
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_q11_threshold_is_one_row_broadcast(plans):
    # the uncorrelated scalar total reaches the filter as a broadcast of a
    # single aggregated row, and both consumers of the grouped relation
    # read the cached per-partkey aggregates — the fact pipeline runs once
    p = plans("tpch_q11_important_stock")
    assert "BroadcastNestedLoopJoin" in p
    # both consumers hit the cache (the plan string still *prints* the
    # cached relation's defining parquet scans, so don't count those)
    assert p.count("InMemoryTableScan") >= 2


def test_q21_decorrelates_to_semi_and_anti(plans):
    p = plans("tpch_q21_waiting_supplier")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_bm25_no_cartesian_and_tiny_broadcasts_only(plans):
    # query terms, df(t) and the 1-row stats relation broadcast; anything
    # doc-sized must shuffle. The only nested-loop allowed is the 1-row
    # stats crossJoin.
    p = plans("text_bm25_topk")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_substring_dedup_is_hash_equi_join(plans):
    # inverted window index: equi-join on the window digest, never doc²
    p = plans("dedup_substring")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_multimodal_resize_is_map_only(plans):
    assert "Exchange" not in plans("multimodal_resize")


def test_quality_filter_is_map_only(plans):
    assert "Exchange" not in plans("quality_filter_pipeline")


def test_aqe_splits_planted_skew_join(spark):
    """Scale-posture pin: the session's AQE skew-join config actually
    fires. A planted celebrity key (1/3 of a 300k-row fact) joined to a
    dim under shuffle-join conditions must show SortMergeJoin(skew=true)
    in the FINAL adaptive plan — the mechanism the 100 TB design leans on
    for residual join skew (hot shingles/keys are pre-filtered by design,
    AQE catches what remains)."""
    from pyspark.sql import functions as F

    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(300000).select(
            F.when(F.col("id") % 3 == 0, 0).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(500).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k", "inner")
        assert len(j.collect()) == 100333
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "skew=true" in p, "AQE skew split did not fire"
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_line_dedup_broadcasts_frequent_set(plans):
    # the big (doc, pos, line) relation must meet the frequent-line set via
    # a broadcast join, never a shuffle join; the only shuffles are the
    # frequency agg (digest-sized rows, map-side combined) and the
    # per-document reassembly groupBy.
    p = plans("dedup_lines")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_embedding_quantize_is_map_only(plans):
    # per-vector quantization must not join or aggregate; the only
    # permissible Exchange is the fixture-spread round-robin repartition
    p = plans("embedding_quantize")
    assert p.count("Exchange") <= 1
    assert "Join" not in p and "HashAggregate" not in p


def test_shard_shuffle_window_is_partition_parallel(plans):
    # the within-shard numbering must be a window partitioned by shard —
    # a global row_number would plan a SinglePartition exchange, the
    # classic scale-killer for corpus-wide permutations
    p = plans("shard_shuffle")
    assert "SinglePartition" not in p
    assert "Window" in p


def test_pipeline_compose_has_no_cartesian_product(plans):
    # the composed clean-corpus query joins five flag relations on doc_id;
    # a CartesianProduct (or non-equi nested loop) would mean a join lost
    # its key during composition
    p = plans("pipeline_clean_corpus")
    assert "CartesianProduct" not in p


def test_bpe_pair_counts_topk_is_distributed(plans):
    # the top-k must be Spark's TakeOrderedAndProject, never a
    # single-partition window sort over the full pair relation
    p = plans("bpe_pair_counts")
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_datasource_isin_pushdown_fully_absorbed(spark, tmp_path):
    """The engine front door (spark.read.format("bravo_savepoint")) with
    an isin(state_name) predicate: the filter must be ABSORBED by
    pushFilters into the byte scan — no state_name comparison may remain
    in a post-scan Filter (only the isnotnull guard Spark keeps). Guards
    the DataSource contract against Spark upgrades, mirroring the
    library-path pin in test_snapshot_write_plan_is_single_shuffle."""
    from pyspark.sql import functions as F

    from bravo_spark.codecs import flink as fc
    from bravo_spark.sources import datasource as ds
    from bravo_spark.sources import savepoint as sp
    from bravo_spark.sources import staterows as sr

    kv = spark.createDataFrame([(k, k) for k in range(8)], "key int, value int")
    rows = sr.kv_to_state_rows(kv, "Count", fc.INT, fc.INT).unionByName(
        sr.kv_to_state_rows(kv, "Other", fc.INT, fc.INT)
    )
    out = str(tmp_path / "sp")
    sp.write_savepoint(
        rows, out, max_parallelism=128, parallelism=2,
        state_ids={"Count": 0, "Other": 1},
    )
    ds.register(spark)
    df = spark.read.format("bravo_savepoint").load(out).filter(
        F.col("state_name").isin("Count", "Other")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan bravo_savepoint" in plan
    # the isin comparison is gone from the Spark-side Filter: neither
    # value literal survives above the scan
    post_scan = plan.split("BatchScan")[0]
    assert "Count" not in post_scan and "Other" not in post_scan
    assert df.count() == 16


def test_q20_semi_join_chain(plans):
    """Q20's part-promotion shape must decorrelate to a semi-join chain
    (no correlated re-execution, no cartesian) — one of the four most
    distinctive TPC-H tail plans. Only the region (5 rows) and nation
    (25 rows) lookups may carry hints (r15): the filtered part side is
    sf-proportional, so its strategy is AQE's call — a third hint means
    the part broadcast crept back."""
    p = plans("tpch_q20_part_promotion")
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "LeftSemi" in p or "ExistenceJoin" in p
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    analyzed = plans("tpch_q20_part_promotion", "analyzed")
    assert analyzed.count("ResolvedHint") == 2, analyzed


def test_q16_exclusion_side_unhinted(plans):
    """Q16's NOT-IN exclusion list (suppliers with negative balance) is
    sf-proportional — the r15 sweep found it force-broadcast. Pin the
    fix: anti join stays, no hint residue anywhere in the query."""
    p = plans("tpch_q16_supplier_cnt")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "ResolvedHint" not in plans("tpch_q16_supplier_cnt", "analyzed")


def test_r8_modality_queries_are_map_only_and_pruned(plans):
    """The r8 codec-backed queries (JPEG/GIF roundtrips, GIF frame
    sampling, WAV features, AVI frame sampling) are per-payload work:
    their plans must stay map-shaped — no joins, no hash/aggregation
    exchange — with the parquet scan pruned to exactly (doc_id, text).
    A keyed shuffle or a wider scan here multiplies a 100 TB
    transcode's cost for nothing.

    r20 relaxation (guide §2.5): the previous zero-Exchange pin also
    forbade catalog.table_spread's CONDITIONAL round-robin, which
    serialized the per-document codec CPU onto one core whenever the
    fixture scan yields fewer splits than cores/2 (the one-row-group
    test parquet). The pin now allows AT MOST that single round-robin
    exchange — and only the round-robin kind; table_spread itself is
    a no-op at production split counts (pinned in
    tests/test_registry.py::test_table_spread_noop_on_many_splits)."""
    for name in (
        "multimodal_jpeg_roundtrip",
        "multimodal_gif_roundtrip",
        "multimodal_gif_frame_sample",
        "audio_wav_features",
        "video_avi_frame_sample",
        # r10 additions: float-PCM audio, raw-DIB video, and the
        # decimation stage, same contract
        "audio_float_features",
        "video_dib_frame_sample",
        "audio_resample_features",
        "multimodal_bilinear_resize",
        "image_phash_dedup",
        "audio_fingerprint",
    ):
        p = plans(name)
        assert p.count("Exchange") <= 1, name
        assert "hashpartitioning" not in p, name
        assert "Join" not in p, name
        if "Exchange" in p:
            assert "roundrobin" in p.lower(), name
        assert "struct<doc_id:bigint,text:string>" in p, name


def test_heavy_hitters_recount_is_broadcast_semi(plans):
    """The two-phase heavy-hitters recount must stay a broadcast
    semi-join against the tiny candidate set — a sort-merge or shuffle
    join here would drag the full token stream through an exchange,
    which is exactly what the pattern exists to avoid. The sketch
    output must be CACHED (InMemoryTableScan): its two consumers
    (candidate broadcast + the totals for the runtime coverage guard)
    would otherwise each rescan and re-sketch the whole token stream."""
    p = plans("heavy_hitters_two_phase")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "InMemoryTableScan" in p


# --- r12 rotation: plan pins for the newly gated rows ---------------------


def test_merge_upsert_is_one_full_outer_smj(plans):
    # MERGE semantics = exactly one full-outer sort-merge join on the
    # key; the md5-bucket changeset filters push into the parquet scans
    p = plans("corpus_merge_upsert")
    assert "FullOuter" in p and "SortMergeJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_savepoint_diff_is_full_outer_equijoin(plans):
    p = plans("savepoint_diff")
    assert "FullOuter" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_quality_calibration_single_exchange(plans):
    # rank window, count window, and the final group-by all reuse the
    # hash partitioning on source: one Exchange total — at 100 TB the
    # per-source distribution stats cost one shuffle, not three
    p = plans("quality_calibration_by_source")
    assert p.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in p  # JVM-side end to end


def test_corpus_drift_tv_single_corpus_pass(plans):
    # both the TV sum and its na/nb normalizer read the CACHED 50-row
    # head: the scan+explode lineage materializes once, not once per
    # branch (the BroadcastNestedLoopJoin is the broadcast-scalar
    # pattern — right side is the 1-row totals aggregate)
    p = plans("corpus_drift_tv")
    assert p.count("InMemoryTableScan") == 2
    assert "TakeOrderedAndProject" in p  # top-50 never global-sorts the vocab


def test_xml_roundtrip_prunes_and_partial_aggs(plans):
    p = plans("xml_source_roundtrip")
    assert "FileScan xml" in p
    assert "event_id" not in p  # unused column pruned from the xml scan
    assert "partial_count" in p  # map-side combine before the shuffle


def test_binary_file_ingest_is_map_only(plans):
    # ingest = list + read + project: zero shuffles, no Python UDF (md5
    # and the path regex are JVM expressions)
    p = plans("binary_file_ingest")
    assert "FileScan binaryFile" in p
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p


def test_schema_evolution_merge_single_scan(plans):
    # both pre- and post-evolution batches resolve to ONE mergeSchema
    # parquet scan + one aggregation shuffle
    p = plans("schema_evolution_merge")
    assert p.count("FileScan parquet") == 1
    assert p.count("Exchange hashpartitioning") == 1


def test_rescale_and_pagerank_no_pathological_joins(plans):
    for name in ("snapshot_rescale", "pagerank_centrality"):
        p = plans(name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


# --- r13 rotation INs: the newly gated queries keep their scale shapes ---
# (checkpoint_rewind / streaming_static_join / kmeans_lloyd_centroids are
# excluded by design: their query fns EXECUTE streaming restarts or Lloyd
# rounds as side effects, so "the plan" is just the final tiny readback —
# their scale posture is documented in their docstrings and proven by the
# oracle + restart tests instead. Same exclusion for the r14 registrations
# join_state_rewrite (two streaming-join batches plus named-store surgery;
# proof = oracle + the join restart tests in test_spark_state /
# test_rocksdb_state) and state_schema_migration (two stateful batches
# around a schema-file rewrite; proof = oracle + the evolution restart
# test in test_spark_state). Same exclusion for the r15 registration
# spark_state_diff (two streaming lifecycles on one checkpoint; the
# returned plan is just the tiny v1⋈v2 readback join; scale posture
# documented in its docstring, proof = oracle at three SFs).)


def test_streaming_static_join_has_no_forced_broadcast():
    """streaming_static_join can't be plan-pinned (it executes a
    streaming query; the returned DataFrame is the memory-sink readback),
    so pin the r15 fix at the source level: the static side (customer,
    sf-proportional) must not carry a broadcast hint — a forced broadcast
    there is re-executed per micro-batch (r14 verdict). The stream
    planner/AQE owns the strategy."""
    import inspect
    import re

    from bravo_spark.inventory import streaming

    module_src = inspect.getsource(streaming)
    # the function body runs from its def to the next top-level def
    m = re.search(
        r"^def streaming_static_join\(.*?(?=^@query|^def )",
        module_src,
        re.S | re.M,
    )
    assert m, "streaming_static_join not found in module source"
    body = m.group(0)
    assert "F.broadcast(" not in body and ".hint(" not in body, body


def test_retention_cohorts_window_min_no_join(plans):
    """The per-user first-seen day is a window min over ``user_id`` — one
    key shuffle, NO join of any kind. (The r13 formulation broadcast a
    one-row-per-user cohort table — unbounded cardinality, the worst of
    the three forced-broadcast sites the r13 verdict flagged.)"""
    p = plans("retention_cohorts")
    assert "Window" in p
    for join in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in p, join


def test_per_key_trend_is_single_shuffle_grouped_pandas(plans):
    """applyInPandas = exactly one Exchange (the group-key shuffle) feeding
    FlatMapGroupsInPandas; a second exchange would mean the OLS stage
    re-partitioned needlessly."""
    p = plans("per_key_trend")
    assert "FlatMapGroupsInPandas" in p
    assert p.count("Exchange") == 1


def test_approx_sketch_accuracy_single_fact_scan(plans):
    """Exact + approximate aggregates (HLL, t-digest) compute in ONE pass
    over events — the point of sketches; a second scan or a join to
    compare exact-vs-approx would defeat it."""
    p = plans("approx_sketch_accuracy")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p


def test_text_normalize_and_redact_are_map_only_jvm(plans):
    """NFKC-ish normalization and PII redaction are regexp/translate
    chains: zero shuffles, zero Python workers — pure map-side JVM at any
    scale."""
    for name in ("text_normalize", "text_redact_pii"):
        p = plans(name)
        assert "Exchange" not in p, name
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_word_freq_topk_has_partial_agg_and_tiny_topk(plans):
    """Two-phase vocabulary count: map-side partial aggregation before the
    word shuffle (the 100 TB lever — combiners collapse per-partition
    duplicates), then the global top-k runs on the tiny counted relation
    (one more exchange), never on raw tokens."""
    p = plans("word_freq_topk")
    assert "partial_count" in p or "partial count" in p.lower()
    assert p.count("Exchange") <= 3  # word shuffle + single-partition topk
    assert "BatchEvalPython" not in p


def test_doc_embedding_join_is_hash_equi_join(plans):
    """The cross-modal id join must stay a hash equi-join (broadcast at
    fixture scale, bucketed/co-located at 100 TB) — never a nested-loop."""
    p = plans("doc_embedding_join")
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_embedding_norms_is_map_only_jvm(plans):
    """L2 norms via F.aggregate over the vector column: no shuffle, no
    Python — the norm of 10^9 embeddings is a pure scan."""
    p = plans("embedding_norms")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_semantic_dedup_cluster_pair_join_shape(plans):
    """SemDeDup's pairwise work must stay an equi-join on cluster id
    (SMJ/shuffled at scale) — a CartesianProduct would mean the corpus²
    product leaked back. The only nested-loop joins allowed are the
    k-row centroid broadcasts inside Lloyd/assignment (fixed-size by
    construction). The assignment must be cached: without it the Lloyd
    chain replays for each of its three consumers."""
    p = plans("dedup_semantic_clusters")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert p.count("InMemoryTableScan") >= 2, p.count("InMemoryTableScan")


def test_markup_strip_and_chunk_tokens_are_map_only_jvm(plans):
    """The r16 text registrations stay pure map: regexp chains /
    split→sequence→explode→slice — zero shuffles, zero Python workers.
    At 100 TB both are scans whose cost is the expression engine."""
    for name in ("text_markup_strip", "text_chunk_tokens"):
        p = plans(name)
        assert "Exchange" not in p, name
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_hash_features_classify_shape(plans):
    """Hashed-feature linear scoring: partial aggregation before each of
    its two shuffles ((doc,bucket) feature counts, then per-doc score),
    the dim-row weight relation broadcast (genuinely fixed-size — hint
    allowed by the r14/r15 policy), and no Python anywhere."""
    p = plans("text_hash_features_classify")
    assert "partial_count" in p or "partial count" in p.lower()
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # feature shuffle + score shuffle (+ the weight broadcast which is
    # not a data-scale exchange); anything beyond that is a regression
    assert p.count("ShuffleExchange") <= 2 or p.count("Exchange hashpartitioning") <= 2


def test_ivf_index_search_prunes_cells(plans):
    """The persisted-IVF probe must reach the assignments scan as a
    partition filter (cell-partitioned parquet → file pruning) and keep
    every join an equi/broadcast join — the corpus never cross-joins
    the query set. (The k-row centroid relation broadcast inside
    assignment/probing is fixed-size by construction.)"""
    p = plans("ann_ivf_index_search", "formatted")
    assert "PartitionFilters: [isnotnull(cell" in p
    assert "CartesianProduct" not in p


def test_ivf_index_stats_broadcasts_centroids_with_partial_agg(plans):
    """The maintenance-stats pass must broadcast only the k-row centroid
    relation against the assignments scan and partial-aggregate the
    per-cell stats (map-side combine before the single shuffle on cell)
    — never shuffle the corpus against the centroids or cross-join."""
    p = plans("ann_ivf_index_stats")
    assert "CartesianProduct" not in p
    # exactly ONE keyless broadcast join is deliberate: the 1-row
    # corpus-total relation joined onto the k-row per-cell aggregate
    # (fixed-size both sides); any second one would be a real defect
    assert p.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "partial_count" in p or "HashAggregate" in p


def test_exif_redact_is_map_only_arrow(plans):
    """Tag -> redact -> verify is two Arrow-batched python stages + a
    JVM md5 projection: zero exchanges, no per-row Python UDF."""
    p = plans("multimodal_exif_redact")
    assert "Exchange" not in p
    assert "MapInPandas" in p or "mapInPandas" in p.lower()
    assert "BatchEvalPython" not in p  # row-at-a-time UDF never


def test_ngram_lm_persist_scores_from_loaded_relations(plans):
    """The persisted-scoring row must read the four saved count
    relations as parquet scans (not retrain inline) and keep every
    token join an equi-join."""
    p = plans("ngram_lm_persist_score", "formatted")
    assert p.count("Scan parquet") >= 4  # tri/bi/uni/tot read back
    assert "CartesianProduct" not in p
    # keyless broadcasts are the 1-row token-total relation only (the
    # stupid-backoff denominator; it surfaces twice in the physical
    # plan); every token-level join stays a hash equi-join
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p


def test_warc_html_extract_is_shuffle_free_arrow(plans):
    """Raw-crawl HTML extraction must stay archive-grain map-only: a
    binaryFile scan, two Arrow-batched python stages (WARC record
    split, HTTP parse), and the JVM regex strip chain — zero exchanges,
    no row-at-a-time Python UDF, no join of any kind."""
    p = plans("warc_html_extract")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p
    assert "Join" not in p
    assert p.lower().count("mapinpandas") >= 2  # WARC split + HTTP parse


def test_zip_shard_roundtrip_is_shuffle_free_arrow(plans):
    """ZIP shard ingest must stay shard-grain map-only: a binaryFile
    scan, ONE Arrow-batched python stage (directory walk + inflate +
    CRC), JVM projections — zero exchanges, no row-at-a-time Python
    UDF, no join (the TFRecord/WebDataset container posture)."""
    p = plans("zip_shard_roundtrip")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p
    assert "Join" not in p
    assert p.lower().count("mapinpandas") == 1


def test_chat_sft_flatten_is_pure_jvm_map(plans):
    """SFT conversation prep must stay map-only JVM: from_json +
    higher-order array functions over the parquet scan — zero
    exchanges, zero Python stages of ANY kind (not even Arrow), no
    joins. This is the one pipeline family where everything the
    operator needs is a built-in expression."""
    p = plans("chat_sft_flatten")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p
    assert "mapinpandas" not in p.lower()
    assert "Join" not in p


def test_dpo_pair_prep_is_pure_jvm_map(plans):
    """DPO pair prep must stay map-only JVM string expressions over
    the parquet scan — zero exchanges, zero Python stages, no joins."""
    p = plans("dpo_pair_prep")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p
    assert "mapinpandas" not in p.lower()
    assert "Join" not in p


def test_pipeline_url_stage_single_shuffle_on_canonical(plans):
    """The composed pipeline's r18 url_dup stage adds exactly one
    window shuffle keyed on the canonical string and one Arrow stage
    (the canonicalizer) — no Cartesian, no row-at-a-time UDF."""
    p = plans("pipeline_clean_corpus")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "hashpartitioning(canonical_url" in p


def test_ivf_assignment_never_shuffles_vectors(spark):
    """_assign_cells (build/append/compact assignment): the vector side
    must be scan → broadcast-fold join → project — the only Exchange is
    the SinglePartition fold of the k-row centroid relation. The
    previous join+window shape shuffled the corpus AND keyed row
    identity on monotonically_increasing_id (retry-nondeterministic)."""
    from bravo_spark import llmops

    vecs = spark.createDataFrame([(1, [1.0, 0.0])],
                                 "id long, e array<double>")
    cent = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])],
                                 "cid int, centroid array<double>")
    p = llmops._assign_cells(vecs, cent)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in p and "monotonically" not in p
    assert p.count("Exchange") == 2  # SinglePartition fold + its broadcast
    assert "BroadcastExchange" in p and "Exchange SinglePartition" in p


def test_web_link_graph_single_agg_exchange_no_joins(plans):
    """Crawl-edge extraction -> host graph: JVM regex explode + ONE
    Arrow resolve stage + one partial-aggregated shuffle on the host
    pair. The page-grain corpus is never joined; the only exchanges are
    the host-pair aggregation and table_spread's fixture round-robin
    (a no-op on multi-split production inputs)."""
    p = plans("web_link_graph")
    assert "Join" not in p
    assert "BatchEvalPython" not in p
    assert p.count("hashpartitioning") == 1  # the host-pair agg only
    assert p.count("Exchange") <= 2  # agg + fixture spread, nothing else
    assert p.lower().count("mapinpandas") == 1  # the urljoin/canon stage
    assert "Generate" in p  # the href explode stays JVM-side


def test_tfrecord_roundtrip_is_shuffle_free_arrow(plans):
    """TFRecord ingest must stay shard-grain map-only: a binaryFile
    scan, two Arrow-batched python stages (record split, Example
    decode) and a JVM md5 projection — zero exchanges, no joins, no
    row-at-a-time UDF."""
    p = plans("tfrecord_example_roundtrip")
    assert "Exchange" not in p
    assert "Join" not in p
    assert "BatchEvalPython" not in p
    assert p.lower().count("mapinpandas") == 2  # split + decode


def test_webdataset_roundtrip_is_shuffle_free_arrow(plans):
    """WebDataset ingest must stay shard-grain map-only: a binaryFile
    scan, ONE Arrow-batched python stage (tar parse + sample grouping)
    and JVM projections (key cast, md5, get_json_object) — zero
    exchanges, no joins, no row-at-a-time UDF."""
    p = plans("webdataset_roundtrip")
    assert "Exchange" not in p
    assert "Join" not in p
    assert "BatchEvalPython" not in p
    assert p.lower().count("mapinpandas") == 1
