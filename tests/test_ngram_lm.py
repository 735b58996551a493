"""Stupid-backoff n-gram LM (llmops.ngram_lm_counts / ngram_lm_score).

Hand-computed arithmetic on a tiny corpus pins every backoff tier —
trigram hit, bigram backoff (alpha = 0.4), unigram backoff (alpha^2),
and the OOV floor — in the exact integer micro-units the gate query
(text_lm_perplexity_filter) hashes.
"""

from __future__ import annotations

import pytest

from bravo_spark import llmops


@pytest.fixture(scope="module")
def lm(spark):
    # Train corpus: two documents, padded streams
    #   <s> <s> a b c
    #   <s> <s> a b d
    train = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d")], "doc_id long, text string"
    )
    return llmops.ngram_lm_counts(train, "text")


def test_counts(spark, lm):
    tri, bi, uni, tot = lm
    trid = {(r.w2, r.w1, r.w): r.c for r in tri.collect()}
    assert trid[("<s>", "<s>", "a")] == 2
    assert trid[("<s>", "a", "b")] == 2
    assert trid[("a", "b", "c")] == 1
    assert trid[("a", "b", "d")] == 1
    bid = {(r.w1, r.w): r.c for r in bi.collect()}
    assert bid[("<s>", "<s>")] == 2  # pads train the start context
    assert bid[("a", "b")] == 2
    unid = {r.w: r.c for r in uni.collect()}
    assert unid["<s>"] == 4 and unid["a"] == 2 and unid["c"] == 1
    # grand total includes pads: 2 docs x (2 pads + 3 tokens)
    assert tot.collect()[0].n == 10


def test_score_tiers(spark, lm):
    # Score "a b c x": positions score as
    #   a | <s> <s>  trigram hit: 2 * 1_000_000 div c(<s> <s>)=2 -> 1_000_000
    #   b | <s> a    trigram hit: 2 div 2                        -> 1_000_000
    #   c | a b      trigram hit: 1 * 1_000_000 div 2            ->   500_000
    #   x | b c      no trigram (b,c ctx seen once via doc 0? ctx
    #                c(b,c)=1 exists but (b,c,x) unseen), no bigram
    #                (c,x), x unseen entirely -> OOV floor:
    #                160_000 div 10 = 16_000
    val = spark.createDataFrame([(9, "a b c x")], "doc_id long, text string")
    row = llmops.ngram_lm_score(val, lm, "text", "doc_id").collect()[0]
    assert row.n_tokens == 4
    assert row.tri_hits == 3 and row.bi_hits == 0
    assert row.uni_hits == 0 and row.oov == 1
    assert row.lm_score_micro == (1_000_000 + 1_000_000 + 500_000 + 16_000) // 4
    assert row.keep == (1 if row.lm_score_micro >= 10_000 else 0)
    assert row.ppl_proxy > 1.0  # float proxy exists for humans


def test_bigram_and_unigram_backoff(spark, lm):
    # "b d c": b | <s> <s> -> no trigram (<s>,<s>,b), no bigram (<s>,b)...
    # wait: c(<s> b) unseen, so unigram tier: c(b)=2 -> 2*160_000 div 10
    #       = 32_000
    # d | <s> b -> ctx (<s>,b) never trained; trigram miss; bigram (b,d)
    #       seen once, ctx c(b)=2 -> 1 * 400_000 div 2 = 200_000
    # c | b d -> trigram (b,d,c) unseen; bigram (d,c) unseen; unigram
    #       c(c)=1 -> 160_000 div 10 = 16_000
    val = spark.createDataFrame([(7, "b d c")], "doc_id long, text string")
    row = llmops.ngram_lm_score(val, lm, "text", "doc_id").collect()[0]
    assert row.tri_hits == 0 and row.bi_hits == 1
    assert row.uni_hits == 2 and row.oov == 0
    assert row.lm_score_micro == (32_000 + 200_000 + 16_000) // 3


def test_empty_doc_scores_no_rows(spark, lm):
    val = spark.createDataFrame([(3, "?!")], "doc_id long, text string")
    assert llmops.ngram_lm_score(val, lm, "text", "doc_id").count() == 0


def test_save_load_scores_identically(spark, lm, tmp_path):
    path = str(tmp_path / "lm")
    llmops.save_ngram_lm(lm, path)
    loaded = llmops.load_ngram_lm(spark, path)
    val = spark.createDataFrame(
        [(9, "a b c x"), (7, "b d c")], "doc_id long, text string"
    )
    direct = {
        (r.doc_id, r.lm_score_micro, r.tri_hits, r.oov)
        for r in llmops.ngram_lm_score(val, lm, "text", "doc_id").collect()
    }
    persisted = {
        (r.doc_id, r.lm_score_micro, r.tri_hits, r.oov)
        for r in llmops.ngram_lm_score(val, loaded, "text",
                                       "doc_id").collect()
    }
    assert direct == persisted


def test_load_wrong_kind_refused(spark, tmp_path):
    import json

    path = str(tmp_path / "notlm")
    llmops._fs_write_text(
        spark, llmops._index_path(path, "_bravo_ngram_lm.json"),
        json.dumps({"kind": "ivf"}),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a persisted n-gram LM"):
        llmops.load_ngram_lm(spark, path)
