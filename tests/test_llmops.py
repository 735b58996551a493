"""llmops operator-quality tests: not just determinism (the oracle gate
covers that) but that the operators do their job — planted near-duplicates
are actually found."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from bravo_spark import llmops


WORDS = (
    "the quick brown fox jumps over lazy dog spark state snapshot key value "
    "window batch stream filter join merge sort hash scan column row table"
).split()


def _corpus(spark, n_base=20, n_dups=10, seed=7):
    rng = random.Random(seed)
    docs = []
    for i in range(n_base):
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(60))))
    # planted near-dups: copy a base doc, perturb ~5% of tokens
    planted = []
    for j in range(n_dups):
        base_id = j % n_base
        toks = docs[base_id][1].split()
        for _ in range(3):
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
        docs.append((100 + j, " ".join(toks)))
        planted.append((base_id, 100 + j))
    return spark.createDataFrame(docs, "doc_id long, text string"), planted


def test_minhash_lsh_recall_on_planted_dups(spark):
    df, planted = _corpus(spark)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in llmops.minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    found = sum(1 for p in planted if p in pairs)
    # 95%-similar docs agree on ≥1 of 4 bands with very high probability
    assert found >= 8, f"recall too low: {found}/10; pairs={sorted(pairs)[:20]}"


def test_ngram_jaccard_finds_planted_and_scores_high(spark):
    df, planted = _corpus(spark)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in llmops.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.3
        ).collect()
    }
    found = [p for p in planted if p in got]
    assert len(found) >= 9
    assert all(got[p] > 0.4 for p in found)


def test_exact_dedup_counts_copies(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "Other")],
        "doc_id long, text string",
    )
    got = {r["keep_id"]: r["n_copies"] for r in llmops.exact_dedup(df, "doc_id", "text").collect()}
    assert got == {1: 2, 3: 1}


def test_simhash_near_dups_close_in_hamming(spark):
    df, planted = _corpus(spark)
    sh = {r["doc_id"]: r["simhash"] for r in llmops.simhash32(df, "doc_id", "text").collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    planted_d = [ham(sh[a], sh[b]) for a, b in planted]
    # unrelated random pairs for contrast
    other_d = [ham(sh[a], sh[b]) for a in range(5) for b in range(10, 15)]
    assert sum(planted_d) / len(planted_d) < sum(other_d) / len(other_d)


def test_connected_components_transitivity(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in llmops.connected_components(pairs).collect()}
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == got[22] == 20


def test_cosine_topk_self_similarity(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    # vector 100 = vector 0 scaled: cosine 1.0, must be rank-1 neighbor
    vecs.append((100, [v * 2.0 for v in vecs[0][1]]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    top = llmops.cosine_topk(df, q, k=3).collect()
    assert top[0]["neighbor_id"] == 100 and top[0]["rank"] == 1
    assert top[0]["cos"] == pytest.approx(1.0, abs=1e-12)
