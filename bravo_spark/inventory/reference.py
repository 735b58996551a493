"""Reference-surface operators (SURVEY.md §2) as oracle-checked queries.

Each query re-expresses one inventory row's semantics over the driver's
synthetic tables (FIXTURES.md §3): the state rows' typed views map to
``events`` keyed by ``user_id``, joins/enrichment to ``orders``/``customer``,
filters to ``lineitem``. DataFrame-API first so Catalyst plans them; the
key-routing queries (E1/E2/A1) run generated SQL shared — modulo dialect —
with the DuckDB oracle (functions/keygroup_sql.py).

Determinism rules (the driver hash-compares values): float aggregations cast
inputs to DECIMAL (exact, order-insensitive) and cast the final value to
DOUBLE; top-k orderings always carry a unique tiebreak column; raw doubles
pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.functions import keygroup_sql as kgs
from bravo_spark.inventory.registry import query

DEC = "decimal(12,2)"


# ---------------------------------------------------------------------------
# P1/P2 — value-state projections (reader/ValueStateKVReader.java:39-62,
# reader/ValueStateValueReader.java:35-54): state-name filter + project.
# ---------------------------------------------------------------------------


@query(
    "p1_value_kv",
    oracle="SELECT event_id AS key, value FROM events WHERE event_type = 'click'",
)
def p1_value_kv(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("key"), "value")
    )


@query(
    "p2_value_only",
    oracle="SELECT value FROM events WHERE event_type = 'purchase'",
)
def p2_value_only(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select("value")


# ---------------------------------------------------------------------------
# P3/P4 — list-state flatten/list duality (ListStateFlattenReader.java:39-63,
# ListStateListReader.java:43-60): explode vs array view of the same rows.
# ---------------------------------------------------------------------------


@query(
    "p3_list_flatten",
    oracle="SELECT user_id AS key, event_id AS value FROM events",
)
def p3_list_flatten(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    lists = ev.groupBy("user_id").agg(F.collect_list("event_id").alias("ids"))
    return lists.select(
        F.col("user_id").alias("key"), F.explode("ids").alias("value")
    )


@query(
    "p4_list_state",
    oracle=(
        "SELECT user_id AS key, array_to_string(list_sort(list(event_id)), ',')"
        " AS ids_csv FROM events GROUP BY user_id"
    ),
)
def p4_list_state(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("key")).agg(
        F.concat_ws(",", F.sort_array(F.collect_list("event_id"))).alias("ids_csv")
    )


# ---------------------------------------------------------------------------
# P5/P6 — map-state entries/values (MapStateKKVReader.java:51-82,
# MapStateValueReader.java:35-56): (key, map_key, value) triplets & values.
# ---------------------------------------------------------------------------

_P5_SQL = (
    "SELECT user_id AS key, event_type AS map_key, count(*) AS value "
    "FROM events GROUP BY user_id, event_type"
)


@query("p5_map_entries", oracle=_P5_SQL)
def p5_map_entries(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").alias("key"), F.col("event_type").alias("map_key")
    ).agg(F.count("*").alias("value"))


@query("p6_map_values", oracle=f"SELECT value FROM ({_P5_SQL}) t")
def p6_map_values(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("value"))
        .select("value")
    )


# ---------------------------------------------------------------------------
# F2/F3/F4 — state-name set filters (RowFilter.java:27-39,
# OperatorStateReader.java:131-140,148-152): isin / anti / named subset.
# ---------------------------------------------------------------------------


@query(
    "f2_isin_filter",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem "
        "WHERE l_returnflag IN ('A', 'R')"
    ),
)
def f2_isin_filter(spark, sf_dir):
    li = catalog.table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


@query(
    "f3_anti_filter",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem "
        "WHERE l_returnflag NOT IN ('A', 'R')"
    ),
)
def f3_anti_filter(spark, sf_dir):
    li = catalog.table(spark, sf_dir, "lineitem")
    return li.filter(~F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@query(
    "f4_named_subset",
    oracle=(
        "SELECT event_id, event_type FROM events "
        "WHERE event_type IN ('signup', 'error')"
    ),
)
def f4_named_subset(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("signup", "error")).select(
        "event_id", "event_type"
    )


# ---------------------------------------------------------------------------
# §2.4 join — the reference's composed enrichment join
# (ValueStateTransformationTest.java:84-85: count state ⋈ deltas, then map).
# No join hint: the enrichment side here is `customer`, which is scale-
# factor-proportional (~15 B rows at TPC-H-100TB) — forcing a broadcast
# of it was the r14 verdict's top scale-killer. Join *selection* is
# Catalyst/AQE's job; at small SF it still picks broadcast on its own,
# at 100 TB it degrades gracefully to a shuffled hash/sort-merge join.
# ---------------------------------------------------------------------------


@query(
    "join_enrich",
    oracle=(
        "SELECT e.key, CAST(e.cnt * 2 + CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE)"
        " AS value FROM (SELECT user_id AS key, count(*) AS cnt FROM events"
        " GROUP BY user_id) e JOIN customer c ON e.key = c.c_custkey"
    ),
)
def join_enrich(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    cust = catalog.table(spark, sf_dir, "customer")
    counts = ev.groupBy(F.col("user_id").alias("key")).agg(F.count("*").alias("cnt"))
    deltas = cust.select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").cast(DEC).alias("delta")
    )
    return (
        counts.join(deltas, on="key", how="inner")
        .select(
            "key",
            (F.col("cnt") * 2 + F.col("delta")).cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# U1 — bag union (OperatorStateWriter.java:127-130): duplicates preserved.
# ---------------------------------------------------------------------------


@query(
    "u1_union_bag",
    oracle=(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
        " WHERE o_orderstatus = 'O'"
        " UNION ALL "
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
        " WHERE o_totalprice > 150000"
    ),
)
def u1_union_bag(spark, sf_dir):
    o = catalog.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.filter(F.col("o_orderstatus") == "O").unionByName(
        o.filter(F.col("o_totalprice") > 150000)
    )


# ---------------------------------------------------------------------------
# E1/E2 — key-group routing (hash parity with Flink, §7.5): the SAME
# generated SQL (modulo dialect) runs on Spark and DuckDB.
# ---------------------------------------------------------------------------

_E1_INPUT = "SELECT DISTINCT user_id AS k FROM events"


def _e1_sql(dialect: str) -> str:
    return kgs.key_group_sql(
        _E1_INPUT, "k", key_kind="long", max_parallelism=128, dialect=dialect
    )


@query("e1_keygroup", oracle=_e1_sql("duckdb"))
def e1_keygroup(spark, sf_dir):
    return spark.sql(_e1_sql("spark"))


def _e2_sql(dialect: str) -> str:
    opx = kgs.operator_index_expr("key_group", 128, 2)
    return (
        f"SELECT key_group, {opx} AS op_index FROM ({_e1_sql(dialect)}) t "
        "GROUP BY key_group ORDER BY key_group"
    )


@query("e2_operator_index", oracle=_e2_sql("duckdb"))
def e2_operator_index(spark, sf_dir):
    return spark.sql(_e2_sql("spark"))


# ---------------------------------------------------------------------------
# A1 — the writer's grouped sort-reduce (OperatorStateWriter.java:245-251)
# re-expressed as per-operator-index stats (FIXTURES.md §3 mapping).
# ---------------------------------------------------------------------------


def _a1_sql(dialect: str) -> str:
    inner = kgs.key_group_sql(
        "SELECT user_id AS k FROM events", "k",
        key_kind="long", max_parallelism=128, dialect=dialect,
    )
    opx = kgs.operator_index_expr("key_group", 128, 4)
    return (
        f"SELECT {opx} AS op_index, count(*) AS n_rows,"
        " count(DISTINCT k) AS n_keys, min(key_group) AS min_kg,"
        f" max(key_group) AS max_kg FROM ({inner}) t GROUP BY 1"
    )


@query("a1_grouped_sort_reduce", oracle=_a1_sql("duckdb"))
def a1_grouped_sort_reduce(spark, sf_dir):
    return spark.sql(_a1_sql("spark"))


# ---------------------------------------------------------------------------
# A2 — stateful count/sum per key (golden semantics of
# ValueStateTransformationTest.java:123-139 / ValueStateTypeChangeTest).
# ---------------------------------------------------------------------------


@query(
    "a2_count_sum_per_key",
    oracle=(
        "SELECT user_id AS key, count(*) AS cnt,"
        " CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,"
        " min(value) AS min_value, max(value) AS max_value"
        " FROM events GROUP BY user_id"
    ),
)
def a2_count_sum_per_key(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# §2.7 sort/limit — top-k with deterministic tiebreak.
# ---------------------------------------------------------------------------


@query(
    "sort_topk",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
    ),
)
def sort_topk(spark, sf_dir):
    o = catalog.table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# P7 analog — window-contents (WindowStateReadingTest: min-reduce windows):
# tumbling 1-minute windows, min value per (key, window).
# ---------------------------------------------------------------------------


@query(
    "window_state_min",
    oracle=(
        "SELECT user_id AS key,"
        " CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS window_start,"
        " min(value) AS min_value, count(*) AS cnt"
        " FROM events GROUP BY 1, 2"
    ),
)
def window_state_min(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").alias("key"),
        F.unix_timestamp(F.date_trunc("minute", F.col("ts"))).alias("window_start"),
    ).agg(F.min("value").alias("min_value"), F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# Value-state last-write-wins semantics (TtlStateTest 'Val': last write per
# key): deterministic via (ts, event_id) ordering.
# ---------------------------------------------------------------------------


@query(
    "last_write_wins",
    oracle=(
        "SELECT user_id AS key, value FROM ("
        " SELECT user_id, value, row_number() OVER ("
        "  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn"
        " FROM events) t WHERE rn = 1"
    ),
)
def last_write_wins(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").alias("key"), "value")
    )


# ---------------------------------------------------------------------------
# Spark-free extras the reference lacks but Spark surfaces for free
# (SURVEY §2.5/§2.8): rollup, distinct agg, semi/anti join, intersect/except.
# ---------------------------------------------------------------------------


@query(
    "rollup_agg",
    oracle=(
        "SELECT l_returnflag, l_linestatus,"
        " CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,"
        " count(*) AS cnt FROM lineitem"
        " GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
)
def rollup_agg(spark, sf_dir):
    li = catalog.table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


@query(
    "distinct_agg",
    oracle=(
        "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events"
        " FROM events GROUP BY event_type"
    ),
)
def distinct_agg(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "semi_join",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS ("
        " SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
)
def semi_join(spark, sf_dir):
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "anti_join",
    oracle=(
        "SELECT o_orderkey, o_custkey FROM orders o WHERE NOT EXISTS ("
        " SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey"
        " AND c.c_mktsegment = 'BUILDING')"
    ),
)
def anti_join(spark, sf_dir):
    """Anti-join against a filtered build side. The fixture gives every
    customer an order, so the customer-without-orders form is vacuously
    empty (spark=0, oracle=0 proves nothing); anti-joining orders against
    the BUILDING segment yields a non-empty, hash-discriminating result."""
    c = catalog.table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = catalog.table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "left_anti").select(
        "o_orderkey", "o_custkey"
    )


@query(
    "intersect_keys",
    oracle=(
        "SELECT o_custkey AS key FROM orders INTERSECT"
        " SELECT c_custkey AS key FROM customer"
    ),
)
def intersect_keys(spark, sf_dir):
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders")
    return o.select(F.col("o_custkey").alias("key")).intersect(
        c.select(F.col("c_custkey").alias("key"))
    )


@query(
    "except_all_keys",
    oracle=(
        "SELECT o_custkey AS key FROM orders EXCEPT ALL"
        " SELECT c_custkey AS key FROM customer"
    ),
)
def except_all_keys(spark, sf_dir):
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders")
    return o.select(F.col("o_custkey").alias("key")).exceptAll(
        c.select(F.col("c_custkey").alias("key"))
    )


# ---------------------------------------------------------------------------
# Headline analytical queries (bench workload): TPC-H-shaped Q1 and Q3 on
# the synthetic tables. Decimal-exact aggregation, final DOUBLE casts.
# ---------------------------------------------------------------------------


@query(
    "tpch_q1",
    oracle=(
        "SELECT l_returnflag, l_linestatus,"
        " CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,"
        " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,"
        " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *"
        "  (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,"
        " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *"
        "  (1 - CAST(l_discount AS DECIMAL(4,2))) *"
        "  (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,"
        " CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
        "  / count(*) AS DOUBLE) AS avg_qty,"
        " count(*) AS count_order"
        " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
        " GROUP BY l_returnflag, l_linestatus"
    ),
)
def tpch_q1(spark, sf_dir):
    li = catalog.table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).cast("double").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle=(
        "SELECT l_orderkey, o_orderdate,"
        " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *"
        "  (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue"
        " FROM customer, orders, lineitem"
        " WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey"
        " AND l_orderkey = o_orderkey"
        " AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'"
        " AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'"
        " GROUP BY l_orderkey, o_orderdate"
        " ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2)) *"
        "  (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, l_orderkey LIMIT 10"
    ),
)
def tpch_q3(spark, sf_dir):
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders")
    li = catalog.table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    joined = (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            o.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # no broadcast hint: the filtered customer side is ~20% of an
        # sf-proportional table (billions of rows at TPC-H-100TB) — AQE
        # broadcasts it at fixture scale and picks SMJ at real scale
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "o_orderdate", F.col("rev_dec").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Beyond-reference relational extras: cube grouping and as-of join (the
# time-series enrichment primitive Spark lacks as a builtin; expressed as
# range-join + per-key argmin, the composition the Spark docs recommend).
# ---------------------------------------------------------------------------


@query(
    "cube_agg",
    oracle=(
        "SELECT l_returnflag, l_linestatus,"
        " CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,"
        " count(*) AS cnt FROM lineitem"
        " GROUP BY CUBE (l_returnflag, l_linestatus)"
    ),
)
def cube_agg(spark, sf_dir):
    li = catalog.table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


@query(
    "asof_join",
    oracle=(
        "SELECT o_orderkey, event_id AS asof_event, value AS asof_value FROM ("
        " SELECT o.o_orderkey, e.event_id, e.value, row_number() OVER ("
        "  PARTITION BY o.o_orderkey ORDER BY e.ts, e.event_id) AS rn"
        " FROM orders o JOIN events e ON e.user_id = o.o_custkey"
        "  AND e.ts >= o.o_orderdate) t WHERE rn = 1"
    ),
)
def asof_join(spark, sf_dir):
    """As-of join: for each order, the first event of that customer at or
    after the order date. Expressed as an equi-join on the key plus a range
    predicate, then per-row argmin via window — Catalyst plans the equi part
    as a hash join, so the range filter never becomes a cross product. At
    100 TB the same plan holds: shuffle on the key, per-key ordered scan."""
    o = catalog.table(spark, sf_dir, "orders")
    ev = catalog.table(spark, sf_dir, "events")
    joined = o.join(
        ev,
        (ev.user_id == o.o_custkey) & (ev.ts >= o.o_orderdate),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("ts"), F.col("event_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            F.col("event_id").alias("asof_event"),
            F.col("value").alias("asof_value"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-resilient aggregation: two-phase salted groupBy. The result is
# EXACTLY the plain per-key aggregate (the oracle computes it directly);
# the salt only changes the physical shuffle so one hot key spreads over
# 16 partial groups before the final combine. AQE's skew handling covers
# joins; salting covers aggregations with pathological key skew.
# ---------------------------------------------------------------------------


@query(
    "salted_skew_agg",
    oracle=(
        "SELECT event_type AS key, count(*) AS cnt,"
        " CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value"
        " FROM events GROUP BY event_type"
    ),
)
def salted_skew_agg(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", (F.col("event_id") % 16).cast("int"))
    partial = salted.groupBy(F.col("event_type").alias("key"), "salt").agg(
        F.count("*").alias("c"),
        F.sum(F.col("value").cast(DEC)).alias("s"),
    )
    return partial.groupBy("key").agg(
        F.sum("c").alias("cnt"), F.sum("s").cast("double").alias("sum_value")
    )


# ---------------------------------------------------------------------------
# Exact percentiles: Spark `percentile` and DuckDB `quantile_cont` use the
# same linear-interpolation definition; inputs are cast to DOUBLE first so
# both interpolate in the same domain.
# ---------------------------------------------------------------------------


@query(
    "percentiles",
    oracle=(
        "SELECT l_returnflag,"
        " quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS p50,"
        " quantile_cont(CAST(l_quantity AS DOUBLE), 0.9) AS p90,"
        " quantile_cont(CAST(l_quantity AS DOUBLE), 0.99) AS p99"
        " FROM lineitem GROUP BY l_returnflag"
    ),
)
def percentiles(spark, sf_dir):
    li = catalog.table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.5)).alias("p50"),
        F.percentile(q, F.lit(0.9)).alias("p90"),
        F.percentile(q, F.lit(0.99)).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Semi-structured columns: JSON property extraction (events.props) — the
# schema-on-read path for property bags; extraction is a JVM-side expression
# that pipelines with the scan.
# ---------------------------------------------------------------------------


@query(
    "json_extract_agg",
    oracle=(
        "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,"
        " count(*) AS cnt, count(DISTINCT user_id) AS n_users"
        " FROM events GROUP BY 1"
    ),
)
def json_extract_agg(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count("*").alias("cnt"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Deeper relational shapes: 5-way star join (TPC-H Q5 shape) and
# group-having over a join (Q18 shape).
# ---------------------------------------------------------------------------


@query(
    "tpch_q5_star",
    oracle=(
        "SELECT n_name,"
        " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *"
        "  (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue"
        " FROM customer, orders, lineitem, supplier, nation, region"
        " WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
        " AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
        " AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey"
        " AND r_name = 'ASIA' GROUP BY n_name"
    ),
)
def tpch_q5_star(spark, sf_dir):
    """Star join: fact lineitem⋈orders joined to a supplier⋈nation⋈region
    chain. nation (25 rows) and region (5) broadcast by hint; the composed
    `dims` relation is NOT hinted — supplier is sf-proportional (~1 B rows
    at 100 TB, ~20% surviving the ASIA filter), so its join strategy is
    left to Catalyst/AQE (r14 verdict)."""
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders")
    li = catalog.table(spark, sf_dir, "lineitem")
    s = catalog.table(spark, sf_dir, "supplier")
    n = catalog.table(spark, sf_dir, "nation")
    r = catalog.table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dims, (li.l_suppkey == F.col("s_suppkey"))
              & (c.c_nationkey == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "tpch_q18_having",
    oracle=(
        "SELECT o_orderkey, o_custkey, total_qty FROM ("
        " SELECT o_orderkey, o_custkey,"
        "  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty"
        " FROM orders, lineitem WHERE o_orderkey = l_orderkey"
        " GROUP BY o_orderkey, o_custkey) t WHERE total_qty > 150"
    ),
)
def tpch_q18_having(spark, sf_dir):
    o = catalog.table(spark, sf_dir, "orders")
    li = catalog.table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


# ---------------------------------------------------------------------------
# §2.9 scalar-function surface: string/date/math expressions "for free"
# from pyspark.sql.functions, exercised per-row and oracle-checked.
# Divergence-prone functions (round-half modes, libm pow/log) deliberately
# avoided; everything here is exact or a single IEEE operation.
# ---------------------------------------------------------------------------


@query(
    "scalar_functions",
    oracle=(
        "SELECT o_orderkey,"
        " upper(substr(o_orderpriority, 1, 8)) AS prio_u,"
        " length(o_orderpriority) AS prio_len,"
        " concat(o_orderstatus, '-', CAST(o_orderkey % 7 AS VARCHAR)) AS tag,"
        " year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,"
        " date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,"
        " abs(o_totalprice - 100000.0) AS dist,"
        " greatest(o_totalprice, 100000.0) AS hi,"
        " least(o_totalprice, 100000.0) AS lo,"
        " sqrt(o_totalprice) AS root"
        " FROM orders"
    ),
)
def scalar_functions(spark, sf_dir):
    o = catalog.table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio_u"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", F.col("o_orderstatus"), (F.col("o_orderkey") % 7).cast("string")).alias("tag"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("lo"),
        F.sqrt("o_totalprice").alias("root"),
    )


# ---------------------------------------------------------------------------
# Window-frame analytics: moving aggregates, lag deltas, ranks — the
# §2.6 surface beyond plain row_number. Frames ordered by (ts, event_id)
# so every result is deterministic; moving sums are decimal-exact.
# ---------------------------------------------------------------------------


@query(
    "window_analytics",
    oracle=(
        "SELECT event_id,"
        " CAST(mov_sum AS DOUBLE) AS mov_sum_5,"
        " secs_since_prev, rk FROM ("
        " SELECT event_id,"
        "  sum(CAST(value AS DECIMAL(12,2))) OVER ("
        "   PARTITION BY user_id ORDER BY ts, event_id"
        "   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mov_sum,"
        "  CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT))"
        "   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS secs_since_prev,"
        "  rank() OVER (PARTITION BY user_id ORDER BY"
        "   CAST(value AS DECIMAL(12,2)) DESC, event_id) AS rk"
        " FROM events) t"
    ),
)
def window_analytics(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-4, Window.currentRow)
    sec = F.unix_timestamp("ts")
    wrank = Window.partitionBy("user_id").orderBy(
        F.col("value").cast(DEC).desc(), F.col("event_id")
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(frame).cast("double").alias("mov_sum_5"),
        (sec - F.lag(sec).over(w)).alias("secs_since_prev"),
        F.rank().over(wrank).alias("rk"),
    )


# ---------------------------------------------------------------------------
# join-type breadth: outer joins, range join, correlated scalar subquery
# (§2.4 extensions — the reference only needs the inner enrichment join, but
# a migrating user's query mix includes all of these)
# ---------------------------------------------------------------------------


@query(
    "left_outer_join",
    oracle=(
        "SELECT o_orderkey, o_custkey, c_name FROM orders o LEFT JOIN"
        " (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c"
        " ON o.o_custkey = c.c_custkey"
    ),
)
def left_outer_join(spark, sf_dir):
    """Left join against a filtered build side: nulls preserved for the
    non-matching majority. No broadcast hint — the filtered customer side
    is still sf-proportional (~20% of the table), so join selection is
    AQE's call: broadcast at fixture scale, sort-merge at real scale."""
    c = (
        catalog.table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    o = catalog.table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name"
    )


@query(
    "full_outer_join",
    oracle=(
        "SELECT coalesce(e.user_id, s.user_id) AS user_id, e.n_errors, s.n_signups"
        " FROM (SELECT user_id, count(*) AS n_errors FROM events"
        "       WHERE event_type = 'error' GROUP BY user_id) e"
        " FULL OUTER JOIN"
        "      (SELECT user_id, count(*) AS n_signups FROM events"
        "       WHERE event_type = 'signup' GROUP BY user_id) s"
        " ON e.user_id = s.user_id"
    ),
)
def full_outer_join(spark, sf_dir):
    """Full outer join of two sparse per-user aggregates — nulls on both
    sides exercise the outer semantics the hash must reproduce."""
    ev = catalog.table(spark, sf_dir, "events")
    errs = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_errors"))
    )
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_signups"))
    )
    e, s = errs.alias("e"), sign.alias("s")
    return e.join(s, F.col("e.user_id") == F.col("s.user_id"), "full").select(
        F.coalesce(F.col("e.user_id"), F.col("s.user_id")).alias("user_id"),
        "n_errors",
        "n_signups",
    )


@query(
    "range_join_clicks_before_purchase",
    oracle=(
        "SELECT p.event_id AS purchase_id, count(*) AS clicks_1h_before"
        " FROM events p JOIN events c"
        " ON c.user_id = p.user_id AND c.event_type = 'click'"
        " AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts"
        " WHERE p.event_type = 'purchase'"
        " GROUP BY p.event_id"
    ),
)
def range_join_clicks_before_purchase(spark, sf_dir):
    """Banded range join with an equi component: the join key is user_id
    (hash-shuffleable), the time band is a post-join filter — at 100 TB this
    stays a hash join, never a cross product (pinned in test_plans)."""
    ev = catalog.table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts")),
        )
        .groupBy("purchase_id")
        .agg(F.count("*").alias("clicks_1h_before"))
    )


@query(
    "scalar_subquery_counts",
    oracle=(
        "SELECT c_custkey, c_name,"
        " (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)"
        " AS n_orders FROM customer c"
    ),
)
def scalar_subquery_counts(spark, sf_dir):
    """Correlated scalar subquery — Catalyst rewrites it to an aggregate +
    left outer join; the oracle runs the textual form."""
    return spark.sql(
        "SELECT c_custkey, c_name,"
        " (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)"
        " AS n_orders FROM customer c"
    )


# ---------------------------------------------------------------------------
# aggregation breadth: pivot and grouping sets
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "pivot_event_values",
    oracle=(
        "SELECT user_id, "
        + ", ".join(
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS"
            f" DECIMAL(12,2)) END) AS DOUBLE) AS {t}_value"
            for t in _EVENT_TYPES
        )
        + " FROM events GROUP BY user_id"
    ),
)
def pivot_event_values(spark, sf_dir):
    """Pivot with EXPLICIT values (the scale-correct form — implicit pivot
    needs a distinct-scan job first). Decimal accumulation keeps the float
    result order-insensitive."""
    ev = catalog.table(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.sum(F.col("value").cast(DEC)).cast("double"))
    )
    return piv.select(
        "user_id", *[F.col(t).alias(f"{t}_value") for t in _EVENT_TYPES]
    )


_GSETS_SQL = (
    "SELECT event_type, ub, count(*) AS n,"
    " CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value"
    " FROM (SELECT event_type, user_id % 10 AS ub, value FROM events) t"
    " GROUP BY GROUPING SETS ((event_type, ub), (event_type), ())"
)


@query("grouping_sets_agg", oracle=_GSETS_SQL)
def grouping_sets_agg(spark, sf_dir):
    """GROUPING SETS — one pass, partial aggregation per set; identical
    null-marker semantics on both engines."""
    return spark.sql(_GSETS_SQL)


# ---------------------------------------------------------------------------
# more TPC-H shapes (adapted to the fixture's column subset)
# ---------------------------------------------------------------------------


@query(
    "tpch_q4_shaped",
    oracle=(
        "SELECT o_orderpriority, count(*) AS order_count FROM orders o"
        " WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
        " AND o_orderdate < TIMESTAMP '1996-07-01'"
        " AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey"
        "   AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)"
        " GROUP BY o_orderpriority"
    ),
)
def tpch_q4_shaped(spark, sf_dir):
    """Q4 shape: date-windowed orders with a correlated EXISTS against the
    fact table (left-semi join on orderkey + range predicate), grouped by
    priority. The semi join shuffles on orderkey; the date filter pushes to
    the orders scan."""
    o = catalog.table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = catalog.table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q10_returns",
    oracle=(
        "SELECT c_custkey, c_name, revenue, n_name FROM ("
        " SELECT c.c_custkey, c.c_name, n.n_name,"
        "  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))"
        "   * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS revenue"
        " FROM customer c"
        " JOIN orders o ON c.c_custkey = o.o_custkey"
        " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " JOIN nation n ON c.c_nationkey = n.n_nationkey"
        " WHERE l.l_returnflag = 'R'"
        " GROUP BY 1, 2, 3) t"
        " ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
)
def tpch_q10_returns(spark, sf_dir):
    """Q10 shape: returned-item revenue per customer, nation-enriched,
    top 20. Nation broadcasts; the fact join shuffles on orderkey; decimal
    accumulation keeps the double deterministic."""
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders")
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = catalog.table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(14,2)"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14_promo",
    oracle=(
        # promo*100 stays EXACT in decimal; the ratio is then ONE
        # correctly-rounded IEEE division of two correctly-rounded casts —
        # `100.0 * promo / total` was TWO float ops whose type promotion
        # differs between engines (DuckDB's 100.0 is DECIMAL, Spark's is
        # DOUBLE) and diverged by 1 ULP on the sf0.001 fixture
        "SELECT CAST(promo * 100 AS DOUBLE) / CAST(total AS DOUBLE)"
        "  AS promo_revenue_pct FROM ("
        " SELECT sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN"
        "   CAST(l.l_extendedprice AS DECIMAL(14,2))"
        "   * (1 - CAST(l.l_discount AS DECIMAL(14,2))) ELSE 0 END) AS promo,"
        "  sum(CAST(l.l_extendedprice AS DECIMAL(14,2))"
        "   * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS total"
        " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
        " WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l.l_shipdate < TIMESTAMP '1996-02-01') t"
    ),
)
def tpch_q14_promo(spark, sf_dir):
    """Q14 shape: promo revenue share in a ship month. Part broadcasts if
    small (AQE decides); both sums accumulate in DECIMAL so the final
    single division is the only float op."""
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = catalog.table(spark, sf_dir, "part")
    rev = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(14,2)"))
    )
    promo = F.sum(
        F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    )
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(promo.alias("promo"), F.sum(rev).alias("total"))
    )
    return agg.select(
        (
            (F.col("promo") * F.lit(100)).cast("double")
            / F.col("total").cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "hourly_counts_gapfill",
    oracle=(
        "WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS lo,"
        " date_trunc('hour', max(ts)) AS hi FROM events),"
        " hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h"
        "  FROM bounds),"
        " counts AS (SELECT date_trunc('hour', ts) AS h, count(*) AS cnt"
        "  FROM events GROUP BY 1)"
        " SELECT CAST(floor(epoch(hours.h)) AS BIGINT) AS hour_start,"
        "  coalesce(counts.cnt, 0) AS cnt"
        " FROM hours LEFT JOIN counts ON hours.h = counts.h"
    ),
)
def hourly_counts_gapfill(spark, sf_dir):
    """Time-bucket rollup with gap filling: a generated dense hour spine
    left-joins the sparse per-hour counts (the hypertable/time_bucket_gapfill
    shape). The spine generation is one row → sequence() → explode — no
    driver loop, no collect."""
    ev = catalog.table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("h")
    )
    counts = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").alias("cnt")
    )
    return (
        hours.join(counts, "h", "left")
        .select(
            F.unix_timestamp("h").alias("hour_start"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Approximate aggregates — the 100 TB path for distinct counts and
# quantiles. Exact count(DISTINCT) shuffles every distinct value; HLL++
# (approx_count_distinct) and t-digest-style quantile sketches
# (approx_percentile) are map-side-mergeable fixed-size sketches — the only
# viable shape at 10⁹⁺ groups. Sketches aren't bit-portable across engines,
# so the oracle contract is: emit the EXACT values plus a flag that the
# Spark sketch landed within tolerance of the Spark-exact truth; the oracle
# recomputes the exact values and asserts the flag. The sketch is thereby
# accuracy-gated against ground truth on every driver run.
# ---------------------------------------------------------------------------


@query(
    "approx_sketch_accuracy",
    oracle=(
        "SELECT event_type, count(DISTINCT user_id) AS exact_users,"
        " quantile_cont(CAST(value AS DOUBLE), 0.5) AS exact_p50,"
        " 1 AS hll_ok, 1 AS tdigest_ok"
        " FROM events GROUP BY event_type"
    ),
)
def approx_sketch_accuracy(spark, sf_dir):
    ev = catalog.table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("hll_users"),
        F.percentile(v, F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx(v, F.lit(0.5), F.lit(10000)).alias("approx_p50"),
    )
    hll_ok = (
        F.abs(F.col("hll_users") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    ).cast("int")
    td_ok = (
        F.abs(F.col("approx_p50") - F.col("exact_p50"))
        <= 0.02 * F.abs(F.col("exact_p50"))
    ).cast("int")
    return agg.select(
        "event_type", "exact_users", "exact_p50",
        hll_ok.alias("hll_ok"), td_ok.alias("tdigest_ok"),
    )


_VARIANT_SPARK_SQL = """
WITH j AS (
  SELECT doc_id, concat(
    '{"lang":"', substr(md5(text), 1, 2),
    '","score":', CAST(n_chars % 100 AS STRING),
    ',"tags":["t', CAST(doc_id % 7 AS STRING),
    '","u', CAST(doc_id % 3 AS STRING), '"]}') AS js
  FROM documents),
v AS (SELECT doc_id, parse_json(js) AS var FROM j)
SELECT doc_id,
  variant_get(var, '$.lang', 'string') AS lang,
  variant_get(var, '$.score', 'long') AS score,
  variant_get(var, '$.tags[1]', 'string') AS tag1,
  try_variant_get(var, '$.quality.sub', 'string') AS missing
FROM v
"""

_VARIANT_DUCK_SQL = """
WITH j AS (
  SELECT doc_id,
    '{"lang":"' || substr(md5(text), 1, 2) ||
    '","score":' || CAST(n_chars % 100 AS VARCHAR) ||
    ',"tags":["t' || CAST(doc_id % 7 AS VARCHAR) ||
    '","u' || CAST(doc_id % 3 AS VARCHAR) || '"]}' AS js
  FROM documents)
SELECT doc_id,
  json_extract_string(js, '$.lang') AS lang,
  CAST(json_extract(js, '$.score') AS BIGINT) AS score,
  json_extract_string(js, '$.tags[1]') AS tag1,
  json_extract_string(js, '$.quality.sub') AS missing
FROM j
"""


@query("json_variant_extract", oracle=_VARIANT_DUCK_SQL)
def json_variant_extract(spark, sf_dir):
    """Semi-structured metadata processing through Spark 4's VARIANT
    type: parse each document's JSON sidecar ONCE into the binary
    variant encoding, then typed-path extraction (``variant_get`` with
    nested object / array-index / missing-path cases; the miss goes
    through ``try_variant_get`` and must surface as NULL, not an error).
    The JSON is deterministically derived from the row so the DuckDB
    oracle rebuilds the identical string and extracts with its JSON
    functions — any divergence in path semantics, typed casts, or null
    handling flips the hash.

    Scale shape: this is the 100 TB replacement for repeated
    ``get_json_object`` calls — each of those re-parses the JSON string
    per call per row, while a variant column parses once at ingest and
    every extraction is a binary offset walk (and parquet-stored
    variants shred into columns). Map-only: scan → project, no shuffle,
    no Python."""
    return spark.sql(_VARIANT_SPARK_SQL)
