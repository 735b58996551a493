"""Remaining TPC-H query shapes, adapted to the fixture's column subset.

Each query here covers a relational operator pattern not exercised by the
shapes in ``reference.py`` (q1/q3/q4/q5/q10/q14/q18):

- q6  — pure scan+filter aggregation (predicate pushdown showcase)
- q7  — two-role dimension join (nation twice) + disjunctive pair predicate
- q13 — outer join with join-side filter + two-level aggregation
- q15 — aggregate feeding a scalar-subquery max equality
- q16 — NOT IN (anti join) + count(DISTINCT) grouped rollup
- q17 — correlated scalar average subquery (per-group threshold join)
- q19 — OR-of-ANDs disjunctive predicate spanning both join sides
- q22 — NOT EXISTS + uncorrelated scalar average + substring grouping

Float discipline (memory: harness quirks): every revenue sum accumulates in
DECIMAL and only the final value is cast to DOUBLE, so the hash is
summation-order-independent on both engines; averages are computed as
CAST(sum(DECIMAL) AS DOUBLE)/count — a single IEEE division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bravo_spark import catalog
from bravo_spark.inventory.registry import query

_DEC = "decimal(14,2)"


def _rev():
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (1 - CAST(l_discount AS DECIMAL(14,2)))"
)


@query(
    "tpch_q6_forecast",
    oracle=(
        "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))"
        " * CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) AS revenue"
        " FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l_shipdate < TIMESTAMP '1997-01-01'"
        " AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
)
def tpch_q6_forecast(spark, sf_dir):
    """Q6: revenue forecast — a single scan with every predicate pushed to
    parquet (date range, discount band, quantity cap) and a one-group
    aggregate. The whole query is map-side partials + one exchange of a
    single row; at 100 TB the cost is the scan, which row-group statistics
    prune on l_shipdate."""
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
        .cast("double")
        .alias("revenue")
    )


@query(
    "tpch_q7_volume",
    oracle=(
        "SELECT supp_nation, cust_nation, yr, CAST(sum(volume) AS DOUBLE)"
        " AS revenue FROM ("
        " SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,"
        f"  year(l.l_shipdate) AS yr, {_REV_SQL} AS volume"
        " FROM lineitem l"
        " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
        " JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " JOIN customer c ON c.c_custkey = o.o_custkey"
        " JOIN nation n1 ON s.s_nationkey = n1.n_nationkey"
        " JOIN nation n2 ON c.c_nationkey = n2.n_nationkey"
        " WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')"
        "  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) t"
        " GROUP BY supp_nation, cust_nation, yr"
    ),
)
def tpch_q7_volume(spark, sf_dir):
    """Q7: shipping volume between a nation pair by year. The same nation
    dimension joins twice in different roles (supplier side, customer side)
    — both broadcast; the disjunctive pair predicate filters after both are
    attached. Fact-side joins shuffle on orderkey/custkey; nation filters
    cannot push below the join because each disjunct spans both roles."""
    li = catalog.table(spark, sf_dir, "lineitem")
    s = catalog.table(spark, sf_dir, "supplier")
    o = catalog.table(spark, sf_dir, "orders")
    c = catalog.table(spark, sf_dir, "customer")
    n1 = catalog.table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = catalog.table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q13_custdist",
    oracle=(
        "SELECT c_count, count(*) AS custdist FROM ("
        " SELECT c.c_custkey, count(o.o_orderkey) AS c_count"
        " FROM customer c LEFT OUTER JOIN orders o"
        "  ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'"
        " GROUP BY c.c_custkey) t"
        " GROUP BY c_count"
    ),
)
def tpch_q13_custdist(spark, sf_dir):
    """Q13: order-count distribution. The priority predicate lives in the
    OUTER JOIN's ON clause (filtering the right side only — customers with
    zero qualifying orders survive with count 0), then a second, tiny
    aggregation over the per-customer counts. First agg shuffles on custkey;
    the second is a few hundred groups at any scale."""
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle=(
        "WITH rev AS ("
        " SELECT l_suppkey AS supplier_no,"
        f" sum({_REV_SQL}) AS total_rev"
        " FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l_shipdate < TIMESTAMP '1996-04-01'"
        " GROUP BY l_suppkey)"
        " SELECT s.s_suppkey, s.s_name,"
        " CAST(r.total_rev AS DOUBLE) AS total_revenue"
        " FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no"
        " WHERE r.total_rev = (SELECT max(total_rev) FROM rev)"
    ),
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: top supplier by quarterly revenue. The revenue aggregate feeds
    both the scalar max and the equality filter — computed once, reused via
    a single-row broadcast join (Spark's rewrite of the scalar subquery).
    DECIMAL totals make the max-equality exact; only the reported value
    becomes DOUBLE."""
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    s = catalog.table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.total_rev == top.max_rev)
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle=(
        "SELECT p.p_brand, p.p_type, p.p_size,"
        " count(DISTINCT l.l_suppkey) AS supplier_cnt"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
        " WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)"
        " AND l.l_suppkey NOT IN"
        "  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)"
        " GROUP BY p.p_brand, p.p_type, p.p_size"
    ),
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """Q16 shape (lineitem standing in for partsupp): distinct supplier
    counts per part class, excluding blacklisted suppliers. NOT IN becomes a
    broadcast anti join (the exclusion list is tiny and non-null, so the
    NULL-semantics trap of NOT IN doesn't bite); count(DISTINCT) expands to
    the standard two-phase distinct-then-count aggregation on the group
    keys."""
    bad = (
        catalog.table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = catalog.table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = catalog.table(spark, sf_dir, "lineitem").join(
        F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_qty",
    oracle=(
        "SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2)))"
        " AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
        " WHERE p.p_brand = 'Brand#23'"
        " AND l.l_quantity < (SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity"
        "  AS DECIMAL(14,2))) AS DOUBLE) / count(*)) FROM lineitem l2"
        "  WHERE l2.l_partkey = l.l_partkey)"
    ),
)
def tpch_q17_small_qty(spark, sf_dir):
    """Q17: small-quantity order revenue. The correlated average subquery
    decorrelates to a per-part aggregate joined back on partkey — one extra
    shuffle over the fact table, then a broadcast-joinable threshold
    relation (|parts| rows). The average is sum(DECIMAL)/count with one
    float division, so both engines agree bit-for-bit."""
    li = catalog.table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("tk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
                / F.count("*")
            )
        ).alias("qty_cap")
    )
    p = catalog.table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("tk"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_disjunctive",
    oracle=(
        f"SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
        " WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5"
        "   AND l.l_quantity BETWEEN 1 AND 11)"
        " OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10"
        "   AND l.l_quantity BETWEEN 10 AND 20)"
        " OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15"
        "   AND l.l_quantity BETWEEN 20 AND 30)"
    ),
)
def tpch_q19_disjunctive(spark, sf_dir):
    """Q19: OR-of-ANDs spanning both join sides. Catalyst extracts the
    common per-side implications (brand ∈ {...} pushes to the part scan,
    quantity ∈ [1,30] to the lineitem scan) while the full disjunction
    evaluates after the join — the textbook disjunctive-pushdown case."""
    li = catalog.table(spark, sf_dir, "lineitem")
    p = catalog.table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


_Q22_CODES = "('00', '01', '02', '03', '04', '05', '06')"


@query(
    "tpch_q22_global_sales",
    oracle=(
        "SELECT cntrycode, count(*) AS numcust,"
        " CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal"
        " FROM ("
        " SELECT substring(c_name, 16, 2) AS cntrycode, c_acctbal"
        " FROM customer c"
        f" WHERE substring(c_name, 16, 2) IN {_Q22_CODES}"
        "  AND c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2)))"
        "   AS DOUBLE) / count(*) FROM customer c2 WHERE c2.c_acctbal > 0.0"
        f"   AND substring(c2.c_name, 16, 2) IN {_Q22_CODES})"
        "  AND NOT EXISTS (SELECT 1 FROM orders o"
        "   WHERE o.o_custkey = c.c_custkey"
        "   AND o.o_orderpriority = '1-URGENT')) t"
        " GROUP BY cntrycode"
    ),
)
def tpch_q22_global_sales(spark, sf_dir):
    """Q22 shape: promising inactive accounts — above-average balance, no
    urgent orders (the fixture gives every customer SOME order, so the
    NOT EXISTS discriminates on urgent ones; 200+ qualify). The scalar
    average broadcasts as a single row; NOT EXISTS is a left-anti join
    against the filtered orders; the substring code groups ~100 ways."""
    codes = ["00", "01", "02", "03", "04", "05", "06"]
    c = catalog.table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 16, 2)
    )
    pool = c.filter(F.col("cntrycode").isin(codes))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double") / F.count("*"))
        .alias("avg_bal")
    )
    urgent = catalog.table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, pool.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
