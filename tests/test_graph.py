"""Integer-exact PageRank (inventory/graph.py).

Ground truth: an independent pure-Python implementation of the same
integer fixed-point spec — hash-derived edges, floor-division transfer,
uniform-base damping — must agree with the Spark query row-for-row.
"""

from __future__ import annotations

import duckdb

from bravo_spark.inventory.graph import _ITERS, _MULT, _SCALE, _STEP


def _reference_pagerank(node_ids: list[int], top: int = 20):
    n = len(node_ids)
    edges = set()
    for v in node_ids:
        for j in range(1, 2 + v % 3):
            t = (v * _MULT + j * _STEP) % n
            if t == v:
                t = (t + 1) % n
            edges.add((v, t))
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r0 = _SCALE // n
    base = (15 * r0) // 100
    rank = {v: r0 for v in node_ids}
    for _ in range(_ITERS):
        mass = {v: 0 for v in node_ids}
        for s, t in edges:
            mass[t] += rank[s] // deg[s]
        rank = {v: base + (85 * mass[v]) // 100 for v in node_ids}
    return sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:top]


def test_reference_impl_properties():
    ids = list(range(97))
    got = _reference_pagerank(ids)
    assert len(got) == 20
    # everyone receives at least the damping base; floor-division loss
    # keeps total mass at or under the initial budget
    assert all(r >= (15 * (_SCALE // 97)) // 100 for _, r in got)
    full = _reference_pagerank(ids, top=97)
    assert sum(r for _, r in full) <= _SCALE + 97


def test_spark_query_matches_reference(spark, sf_dir):
    from bravo_spark.inventory.graph import pagerank_centrality

    ids = [
        row[0]
        for row in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    want = _reference_pagerank(ids)
    got = [
        (row["doc_id"], row["rank_units"])
        for row in pagerank_centrality(spark, sf_dir).collect()
    ]
    assert got == want


def test_oracle_sql_matches_reference(sf_dir):
    from bravo_spark.inventory.registry import ORACLES

    ids = [
        row[0]
        for row in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    want = _reference_pagerank(ids)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    got = [tuple(r) for r in con.execute(
        ORACLES["pagerank_centrality"]
    ).fetchall()]
    assert got == want
