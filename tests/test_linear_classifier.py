"""train_linear_classifier: the training half of the hashed-feature
quality classifier. Separable synthetic corpora must train to high
accuracy THROUGH the real apply path (linear_text_score), and the
normalization must match between train and apply."""

from __future__ import annotations

import pytest

from bravo_spark import llmops


@pytest.fixture(scope="module")
def corpus(spark):
    good_words = ["clear", "concise", "informative", "structured", "cited"]
    bad_words = ["spam", "clickbait", "gibberish", "keyword", "stuffing"]
    rows = []
    for i in range(120):
        ws = [good_words[(i + j) % 5] for j in range(12)]
        rows.append((i, " ".join(ws), 1))
    for i in range(120, 240):
        ws = [bad_words[(i + j) % 5] for j in range(12)]
        rows.append((i, " ".join(ws), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_trains_to_high_accuracy_via_real_apply_path(spark, corpus):
    dim = 256
    feats = llmops.hash_ngram_features(corpus, "doc_id", "text", dim=dim)
    w, bias = llmops.train_linear_classifier(
        feats, corpus.select("doc_id", "label"), dim=dim, iters=15, lr=4.0
    )
    scored = llmops.linear_text_score(feats, w, id_col="doc_id", bias=bias)
    joined = scored.join(corpus.select("doc_id", "label"), "doc_id")
    n = joined.count()
    correct = joined.filter(
        "(score > 0 AND label = 1) OR (score <= 0 AND label = 0)"
    ).count()
    assert n == 240
    assert correct / n >= 0.95, f"accuracy {correct / n}"


def test_l2_shrinks_weights(spark, corpus):
    dim = 128
    feats = llmops.hash_ngram_features(corpus, "doc_id", "text", dim=dim)
    lab = corpus.select("doc_id", "label")
    w0, _ = llmops.train_linear_classifier(feats, lab, dim=dim, iters=6,
                                           lr=2.0, l2=0.0)
    w1, _ = llmops.train_linear_classifier(feats, lab, dim=dim, iters=6,
                                           lr=2.0, l2=0.5)
    assert sum(x * x for x in w1) < sum(x * x for x in w0)


def test_input_validation(spark, corpus):
    feats = llmops.hash_ngram_features(corpus, "doc_id", "text", dim=64)
    empty = corpus.filter("doc_id < 0").select("doc_id", "label")
    with pytest.raises(ValueError, match="no labeled documents"):
        llmops.train_linear_classifier(feats, empty, dim=64, iters=1)
    with pytest.raises(ValueError, match="positive"):
        llmops.train_linear_classifier(
            feats, corpus.select("doc_id", "label"), dim=0
        )
