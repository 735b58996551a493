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


def test_l2_decays_untouched_buckets_exactly(spark, corpus):
    """Full-batch L2 must shrink EVERY weight each iteration, including
    buckets that produced no data gradient. With one labeled doc whose
    features hit a known bucket set, a second iteration must multiply
    the untouched buckets... there are none untouched within one doc's
    buckets — so instead pin the closed form: after iter 1 all weights
    outside the doc's buckets stay 0, and the doc's bucket weights after
    iter 2 carry the (1 - lr*l2) decay factor applied to their iter-1
    value before the iter-2 data gradient lands."""
    import math

    dim = 32
    one = corpus.filter("doc_id = 0")
    feats = llmops.hash_ngram_features(one, "doc_id", "text", dim=dim)
    lab = one.select("doc_id", "label")
    lr, l2 = 1.0, 0.25

    rows = feats.collect()
    tot = sum(r["count"] for r in rows)
    xs = {int(r["bucket"]): r["count"] / tot for r in rows}

    # replicate two exact full-batch iterations driver-side
    w_ref, b_ref = [0.0] * dim, 0.0
    for _ in range(2):
        s = b_ref + sum(w_ref[b] * x for b, x in xs.items())
        e = 1.0 / (1.0 + math.exp(-s)) - 1.0  # label = 1, n_docs = 1
        w_ref = [x * (1.0 - lr * l2) for x in w_ref]
        for b, x in xs.items():
            w_ref[b] -= lr * e * x
        b_ref -= lr * e

    w, bias = llmops.train_linear_classifier(
        feats, lab, dim=dim, iters=2, lr=lr, l2=l2
    )
    assert bias == pytest.approx(b_ref, rel=1e-9)
    for i in range(dim):
        assert w[i] == pytest.approx(w_ref[i], rel=1e-9, abs=1e-12)
