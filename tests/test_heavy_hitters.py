"""The two-phase heavy-hitters sketch: vectorized weighted SpaceSaving,
its coverage invariant, and the runtime precondition guard.

Reference point: the exact top-k the plain group-by would compute — the
sketch phase may only ever PROPOSE candidates; the recount decides, and
when the coverage precondition fails the query must refuse loudly
instead of returning a silently wrong "exact" top-k (the r10 ADVICE
finding on flat head distributions).
"""

from __future__ import annotations

import collections
import random

import pandas as pd
import pytest

from bravo_spark.inventory.textops import _spacesaving_reduce


def _batches(tokens, size):
    for i in range(0, len(tokens), size):
        yield pd.Series(tokens[i : i + size], dtype="object")


def test_updates_scale_with_unique_not_tokens():
    # 60k tokens but only 7 unique per batch: the Python update loop
    # must run once per unique-token-per-batch, never per token.
    tokens = [f"t{i % 7}" for i in range(60_000)]
    counters, n_seen, evicted, n_updates = _spacesaving_reduce(
        _batches(tokens, 10_000), cap=200
    )
    assert n_seen == 60_000
    assert evicted == 0
    assert n_updates == 7 * 6  # unique-per-batch summed, not 60k
    assert counters == dict(collections.Counter(tokens))


def test_weighted_updates_match_exact_counts_below_cap():
    # below capacity the summary IS the exact per-partition vocabulary
    rng = random.Random(7)
    tokens = [f"w{rng.randrange(150)}" for _ in range(5_000)]
    counters, n_seen, evicted, _ = _spacesaving_reduce(
        _batches(tokens, 617), cap=200
    )
    assert evicted == 0 and n_seen == 5_000
    assert counters == dict(collections.Counter(tokens))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_coverage_invariant_under_adversarial_flat_load(seed):
    # near-uniform distribution sized right at the capacity margin —
    # the weighted-SpaceSaving guarantee must still hold: any token
    # ABSENT from the summary has true count <= min(counter) <= N/cap,
    # and every counter overestimates (counter >= true count).
    rng = random.Random(seed)
    cap = 50
    # ~3*cap near-equal tokens plus a thin genuine head
    tokens = [f"flat{rng.randrange(150)}" for _ in range(6_000)]
    tokens += ["head0"] * 400 + ["head1"] * 300
    rng.shuffle(tokens)
    counters, n_seen, evicted, _ = _spacesaving_reduce(
        _batches(tokens, 512), cap=cap
    )
    assert evicted == 1 and len(counters) == cap
    truth = collections.Counter(tokens)
    mn = min(counters.values())
    assert mn <= n_seen / cap
    for w, true_c in truth.items():
        if w not in counters:
            assert true_c <= mn, f"absent {w} exceeds min counter"
        else:
            assert counters[w] >= true_c, f"{w} undercounted"
    # anything above N/cap is guaranteed present — incl. the real head
    for w, true_c in truth.items():
        if true_c > n_seen / cap:
            assert w in counters


def test_eviction_ties_break_on_smallest_key():
    # force a full summary of equal counts, then insert a new token:
    # the evicted slot must be the lexicographically smallest key
    tokens = ["b", "a", "c", "z9"]
    counters, _, evicted, _ = _spacesaving_reduce(
        _batches(tokens, 1), cap=3
    )
    assert evicted == 1
    assert "a" not in counters and counters["z9"] == 2  # min(1) + 1


def _write_docs(tmp_path, texts):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    # the registry wrapper re-registers every catalog view for the dir
    from bravo_spark.catalog import TABLES

    for name in TABLES:
        if name != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{name}.parquet",
                str(tmp_path / f"{name}.parquet"),
            )
    return str(tmp_path)


def test_query_exact_on_zipfian_corpus(spark, tmp_path):
    # a clear head: the query's output must equal the exact top-20
    texts = []
    for d in range(40):
        words = []
        for r in range(1, 60):
            words += [f"tok{r:02d}"] * max(1, 120 // r)
        texts.append(" ".join(words))
    sf = _write_docs(tmp_path, texts)
    from bravo_spark.inventory.textops import heavy_hitters_two_phase

    rows = heavy_hitters_two_phase(spark, sf).collect()
    truth = collections.Counter(
        w for t in texts for w in t.lower().split()
    )
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(((r.w, r.cnt) for r in rows), key=lambda kv: (-kv[1], kv[0]))
    assert got == expect


def test_query_refuses_flat_head_instead_of_lying(spark, tmp_path):
    # >cap near-equal tokens in one partition: the coverage precondition
    # (ev == 0 or 20th recounted count * cap > N) fails and the query
    # must raise, never return a silently wrong "exact" top-20
    rng = random.Random(11)
    words = [f"u{i:04d}" for i in range(400) for _ in range(5)]
    rng.shuffle(words)
    texts = [" ".join(words)]  # one doc -> one partition -> evictions
    sf = _write_docs(tmp_path, texts)
    from bravo_spark.inventory.textops import heavy_hitters_two_phase

    with pytest.raises(Exception, match="coverage precondition"):
        heavy_hitters_two_phase(spark, sf).collect()
