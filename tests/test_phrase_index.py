"""Persisted positional inverted index + phrase search
(llmops.build_inverted_index / load_inverted_index / phrase_search):
hand-pinned positions, overlapping matches, bucket partition pruning,
and manifest contract.
"""

from __future__ import annotations

import pytest

from bravo_spark import llmops


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (1, "merge hash join beats nested loop"),
            (2, "hash join hash join twice here"),
            (3, "no phrase here, only hash and join apart"),
            (4, "a a a a"),  # overlapping self-phrase
            (5, ""),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path_factory.mktemp("inv") / "idx")
    llmops.build_inverted_index(docs, path, n_buckets=8)
    return path


def test_positions_and_counts(spark, idx):
    rows = {r.doc_id: r for r in
            llmops.phrase_search(spark, idx, "hash join").collect()}
    assert set(rows) == {1, 2}  # doc 3 has the terms but not adjacent
    assert rows[1].n_matches == 1 and rows[1].first_pos == 2  # 1-based
    assert rows[2].n_matches == 2 and rows[2].first_pos == 1


def test_overlapping_matches_all_counted(spark, idx):
    [r] = llmops.phrase_search(spark, idx, "a a").collect()
    assert r.doc_id == 4 and r.n_matches == 3 and r.first_pos == 1


def test_three_term_phrase_and_miss(spark, idx):
    [r] = llmops.phrase_search(spark, idx, "merge hash join").collect()
    assert r.doc_id == 1 and r.first_pos == 1
    assert llmops.phrase_search(spark, idx, "hash join missing").count() == 0
    assert llmops.phrase_search(spark, idx, "zzz").count() == 0


def test_single_term_degenerates_to_term_lookup(spark, idx):
    rows = {r.doc_id: r.n_matches for r in
            llmops.phrase_search(spark, idx, "hash").collect()}
    assert rows == {1: 1, 2: 2, 3: 1}


def test_bucket_partition_pruning_in_plan(spark, idx):
    df = llmops.phrase_search(spark, idx, "hash join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan must carry a bucket partition filter, not read all buckets
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters: [", 1)[1][:200]


def test_manifest_contract(spark, idx):
    posts, mf = llmops.load_inverted_index(spark, idx)
    assert mf["kind"] == "inverted_index" and mf["n_buckets"] == 8
    assert set(posts.columns) == {"term", "doc_id", "pos", "bucket"}
    with pytest.raises(ValueError, match="no tokens"):
        llmops.phrase_search(spark, idx, "?!")


def test_wrong_index_kind_refused(spark, tmp_path):
    import json

    path = str(tmp_path / "notidx")
    llmops._fs_write_text(
        spark, llmops._index_path(path, "_bravo_invidx.json"),
        json.dumps({"kind": "something_else"}),
    )
    with pytest.raises(ValueError, match="not an inverted index"):
        llmops.load_inverted_index(spark, path)
