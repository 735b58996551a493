"""corpus_drift_tv's per-term TV expression must stay exact PAST int64.

The r10 ADVICE finding: |oa*nb - ob*na| * 1e6 leaves int64 once
per-snapshot token totals reach ~3M (N²·10⁶ ~ 1e13²·1e6), where Spark
would wrap silently while DuckDB raises — the engines would diverge at
exactly the scale the monitor exists for. The fix is 128-bit integer
arithmetic on both engines (DECIMAL(38,0) div / HUGEINT //); these pins
hold both against exact Python big-int floors at 100-TB-scale totals.
"""

from __future__ import annotations

import duckdb
import pytest

# (oa, ob, na, nb): per-term head counts and per-snapshot totals.
# The large cases put oa*nb ~ 1e26 — ~10 orders past int64.
CASES = [
    (7_213_456_789_012, 5_198_765_432_109,
     12_345_678_901_234, 11_111_111_111_111),
    (1, 9_999_999_999_999, 10_000_000_000_000, 10_000_000_000_001),
    (3_000_000, 2_999_999, 3_000_000, 3_000_000),  # the old ~3M cliff
    (0, 123_456_789, 987_654_321_000, 876_543_210_000),
]


def _spark_expr(oa, ob, na, nb):
    return (
        f"SELECT abs(CAST({oa} AS DECIMAL(38,0)) * {nb} -"
        f" CAST({ob} AS DECIMAL(38,0)) * {na}) * 1000000"
        f" div (2 * CAST({na} AS DECIMAL(38,0)) * {nb}) AS v"
    )


def _duck_expr(oa, ob, na, nb):
    return (
        f"SELECT abs(CAST({oa} AS HUGEINT) * {nb} -"
        f" CAST({ob} AS HUGEINT) * {na}) * 1000000"
        f" // (2 * CAST({na} AS HUGEINT) * {nb}) AS v"
    )


@pytest.mark.parametrize("oa,ob,na,nb", CASES)
def test_tv_term_exact_past_int64_on_both_engines(spark, oa, ob, na, nb):
    expect = abs(oa * nb - ob * na) * 1_000_000 // (2 * na * nb)
    got_spark = spark.sql(_spark_expr(oa, ob, na, nb)).collect()[0].v
    got_duck = duckdb.sql(_duck_expr(oa, ob, na, nb)).fetchone()[0]
    assert got_spark == expect, "Spark decimal term drifted"
    assert int(got_duck) == expect, "DuckDB hugeint term drifted"
