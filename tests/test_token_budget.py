"""token_budget_pack: the selection must fill each (source, shard)
budget greedily — kept tokens never exceed the shard budget, and the
FIRST unkept document in shard order would overflow it (maximality).
"""

from __future__ import annotations

import duckdb


_CON = duckdb.connect()
_CON.sql(
    "CREATE VIEW documents AS SELECT * FROM "
    "read_parquet('/root/testdata/sf0.001/documents.parquet')"
)


def _q(sql):
    return _CON.sql(sql)


def test_budget_respected_and_greedy_maximal():
    from bravo_spark.inventory.sampling import (
        _BUDGET_SHARDS,
        _budget_sql,
    )

    base = _budget_sql("duckdb").split("SELECT doc_id, source, n_tokens")[0]
    # inside-knowledge query: per (source, shard), kept cum vs budget and
    # the first unkept document's size
    rows = _q(
        base
        + """
SELECT source, shard, shard_budget,
  sum(CASE WHEN cum <= shard_budget THEN n_tokens ELSE 0 END) AS kept,
  min(CASE WHEN cum > shard_budget THEN cum ELSE NULL END) AS first_over
FROM c GROUP BY source, shard, shard_budget
"""
    ).fetchall()
    assert rows, "no groups"
    for source, shard, budget, kept, first_over in rows:
        assert kept <= budget, (source, shard, kept, budget)
        if first_over is not None:
            # maximality: the next doc in shard order would overflow
            assert first_over > budget


def test_undershoot_bounded_by_shards_times_max_doc():
    """The subshard trade, quantified: per source the kept total
    undershoots the budget by LESS than shards x (largest doc) +
    shards (integer-division rounding) — negligible at corpus scale,
    large relative to the tiny fixture (which is why this pins the
    BOUND, not a fraction)."""
    from bravo_spark.inventory.sampling import (
        _BUDGET_SHARDS,
        _budget_sql,
    )

    base = _budget_sql("duckdb").split("SELECT doc_id, source, n_tokens")[0]
    rows = _q(
        base
        + """
SELECT source, min(shard_budget) * {sh} AS budget8,
  sum(CASE WHEN cum <= shard_budget THEN n_tokens ELSE 0 END) AS kept,
  max(n_tokens) AS max_doc
FROM c GROUP BY source
""".format(sh=_BUDGET_SHARDS)
    ).fetchall()
    for source, budget8, kept, max_doc in rows:
        assert kept <= budget8
        assert budget8 - kept < _BUDGET_SHARDS * (max_doc + 1), (
            source, budget8, kept, max_doc)
