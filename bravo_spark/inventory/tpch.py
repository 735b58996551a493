"""Remaining TPC-H query shapes, adapted to the fixture's column subset.

Each query here covers a relational operator pattern not exercised by the
shapes in ``reference.py`` (q1/q3/q4/q5/q10/q14/q18):

- q2  — correlated min subquery decorrelated to a window over partkey
- q6  — pure scan+filter aggregation (predicate pushdown showcase)
- q7  — two-role dimension join (nation twice) + disjunctive pair predicate
- q8  — conditional-share aggregation over a two-role nation join
- q9  — multi-fact join with arithmetic-on-both-sides profit expression
- q11 — uncorrelated scalar threshold via cached relation + 1-row broadcast
- q12 — join + conditional-sum lateness classification
- q13 — outer join with join-side filter + two-level aggregation
- q15 — aggregate feeding a scalar-subquery max equality
- q16 — NOT IN (anti join) + count(DISTINCT) grouped rollup
- q17 — correlated scalar average subquery (per-group threshold join)
- q19 — OR-of-ANDs disjunctive predicate spanning both join sides
- q20 — nested IN subqueries as a chain of semi joins
- q21 — EXISTS/NOT-EXISTS self-joins decorrelated to semi + anti
- q22 — NOT EXISTS + uncorrelated scalar average + substring grouping

With these, all 22 TPC-H query shapes are covered (the fixture lacks
partsupp and commit/receipt dates, so q2/q9/q11/q20 proxy supply cost
via lineitem and q12/q21 define lateness as ship date vs order date —
operator patterns preserved, literal columns adapted).

Float discipline (memory: harness quirks): every revenue sum accumulates in
DECIMAL and only the final value is cast to DOUBLE, so the hash is
summation-order-independent on both engines; averages are computed as
CAST(sum(DECIMAL) AS DOUBLE)/count — a single IEEE division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bravo_spark import catalog, llmops
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
    counts per part class, excluding blacklisted suppliers. NOT IN becomes
    an anti join (the exclusion list is non-null, so the NULL-semantics
    trap of NOT IN doesn't bite); count(DISTINCT) expands to the standard
    two-phase distinct-then-count aggregation on the group keys. The
    exclusion side is UNHINTED (r15): supplier is sf-proportional (~1 B
    rows at 100 TB, ~9% with negative balance), so join selection belongs
    to AQE — broadcast at fixture scale, shuffled anti at real scale."""
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
        bad, F.col("l_suppkey") == bad.s_suppkey, "left_anti"
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


@query(
    "tpch_q2_min_cost_supplier",
    oracle=(
        "WITH ps AS ("
        " SELECT l_partkey, l_suppkey,"
        "  min(CAST(l_extendedprice AS DECIMAL(14,2))) AS cost"
        " FROM lineitem GROUP BY 1, 2)"
        " SELECT s_acctbal, s_name, n_name, p_partkey, p_name,"
        "  CAST(cost AS DOUBLE) AS cost FROM ("
        " SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,"
        "  ps.cost, min(ps.cost) OVER (PARTITION BY p.p_partkey) AS min_cost"
        " FROM part p"
        " JOIN ps ON ps.l_partkey = p.p_partkey"
        " JOIN supplier s ON s.s_suppkey = ps.l_suppkey"
        " JOIN nation n ON n.n_nationkey = s.s_nationkey"
        " JOIN region r ON r.r_regionkey = n.n_regionkey"
        " WHERE p.p_size <= 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'"
        ") t WHERE cost = min_cost"
        " ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
    ),
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: cheapest supplier per part in a region. The fixture has no
    partsupp table, so per-(part, supplier) min line price from lineitem
    stands in for ps_supplycost; the correlated min subquery becomes a
    window min over p_partkey, evaluated after the region restriction —
    exactly the decorrelated plan an optimizer produces for Q2. nation and
    region broadcast; the cost relation shuffles once on partkey."""
    li = catalog.table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(_DEC)).alias("cost")
    )
    p = catalog.table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    s = catalog.table(spark, sf_dir, "supplier")
    n = catalog.table(spark, sf_dir, "nation")
    r = catalog.table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    return (
        p.join(ps, ps.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == ps.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q8_market_share",
    oracle=(
        "SELECT yr,"
        " CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume"
        "  ELSE 0 END) AS DOUBLE) / CAST(sum(volume) AS DOUBLE) AS DOUBLE)"
        "  AS mkt_share FROM ("
        f" SELECT year(o.o_orderdate) AS yr, {_REV_SQL} AS volume,"
        "  n2.n_name AS supp_nation"
        " FROM part p"
        " JOIN lineitem l ON p.p_partkey = l.l_partkey"
        " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
        " JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " JOIN customer c ON c.c_custkey = o.o_custkey"
        " JOIN nation n1 ON n1.n_nationkey = c.c_nationkey"
        " JOIN region r ON r.r_regionkey = n1.n_regionkey"
        " JOIN nation n2 ON n2.n_nationkey = s.s_nationkey"
        " WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'"
        "  AND o.o_orderdate >= TIMESTAMP '1996-01-01'"
        "  AND o.o_orderdate < TIMESTAMP '1998-01-01') t"
        " GROUP BY yr"
    ),
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 shape: one nation's share of regional order volume by year. The
    nation dimension joins twice (customer region restriction, supplier
    nationality); both legs broadcast. Numerator and denominator accumulate
    in DECIMAL and meet in one double division per year — the only float
    op, so the hash is summation-order-independent."""
    li = catalog.table(spark, sf_dir, "lineitem")
    p = catalog.table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = catalog.table(spark, sf_dir, "supplier")
    o = catalog.table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = catalog.table(spark, sf_dir, "customer")
    n1 = catalog.table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = catalog.table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = catalog.table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle=(
        "SELECT nation, yr, CAST(sum(amount) AS DOUBLE) AS sum_profit FROM ("
        " SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,"
        f"  {_REV_SQL} - CAST(0.1 AS DECIMAL(3,1))"
        "   * CAST(p.p_retailprice AS DECIMAL(14,2))"
        "   * CAST(l.l_quantity AS DECIMAL(14,2)) AS amount"
        " FROM part p"
        " JOIN lineitem l ON p.p_partkey = l.l_partkey"
        " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
        " JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " JOIN nation n ON n.n_nationkey = s.s_nationkey"
        " WHERE p.p_name LIKE '%widget%') t"
        " GROUP BY nation, yr"
    ),
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 shape: profit on a product line by supplier nation and year. With
    no partsupp table, supply cost is proxied as 10% of retail price ×
    quantity — same expression shape as ps_supplycost * l_quantity. All
    arithmetic stays in DECIMAL until the final cast; the part name filter
    prunes the probe side before the fact joins."""
    p = catalog.table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = catalog.table(spark, sf_dir, "lineitem")
    s = catalog.table(spark, sf_dir, "supplier")
    o = catalog.table(spark, sf_dir, "orders")
    n = catalog.table(spark, sf_dir, "nation")
    amount = _rev() - (
        F.lit("0.1").cast("decimal(3,1)")
        * F.col("p_retailprice").cast(_DEC)
        * F.col("l_quantity").cast(_DEC)
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle=(
        "WITH v AS ("
        " SELECT l.l_partkey AS partkey,"
        "  sum(CAST(l.l_extendedprice AS DECIMAL(14,2))"
        "   * CAST(l.l_quantity AS DECIMAL(14,2))) AS val"
        " FROM lineitem l"
        " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
        " JOIN nation n ON n.n_nationkey = s.s_nationkey"
        " WHERE n.n_name = 'NATION_7' GROUP BY 1)"
        " SELECT partkey, CAST(val AS DOUBLE) AS value FROM v"
        " WHERE val > (SELECT sum(val) * CAST(0.001 AS DECIMAL(6,4)) FROM v)"
    ),
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 shape: parts holding an outsized share of one nation's stock
    value (lineitem value standing in for partsupp availqty × cost). The
    grouped relation feeds both the scalar total and the output, so it is
    cached — per-partkey aggregates, a tiny fraction of the fact table at
    any scale — and the fact pipeline runs once; the total then reaches
    the filter as a one-row broadcast cross join, and the threshold
    comparison stays in exact DECIMAL on both engines."""
    li = catalog.table(spark, sf_dir, "lineitem")
    s = catalog.table(spark, sf_dir, "supplier")
    n = catalog.table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    val = F.col("l_extendedprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    v = (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(val).alias("val"))
    )
    v = llmops.track_cache(v)
    total = v.agg(
        (F.sum("val") * F.lit("0.001").cast("decimal(6,4)")).alias("threshold")
    )
    return (
        v.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("partkey", F.col("val").cast("double").alias("value"))
    )


@query(
    "tpch_q12_late_lines",
    oracle=(
        "SELECT priority_class,"
        " CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,"
        " count(*) AS total_lines FROM ("
        " SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')"
        "   THEN 'high' ELSE 'low' END AS priority_class,"
        "  l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY AS late"
        " FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'"
        "  AND l.l_shipdate < TIMESTAMP '1997-01-01') t"
        " GROUP BY 1"
    ),
)
def tpch_q12_late_lines(spark, sf_dir):
    """Q12 shape: late shipments by priority class. The fixture lacks
    commit/receipt dates and ship modes, so lateness is ship date > order
    date + 45 days and the two-way grouping is urgent/high vs rest — the
    same join + conditional-sum plan as Q12. The date filter pushes to the
    lineitem scan; the join shuffles on orderkey."""
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = catalog.table(spark, sf_dir, "orders")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .select(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("high")
            )
            .otherwise(F.lit("low"))
            .alias("priority_class"),
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")
            ).alias("late"),
        )
        .groupBy("priority_class")
        .agg(
            F.sum(F.when(F.col("late"), 1).otherwise(0))
            .cast("bigint")
            .alias("late_lines"),
            F.count("*").alias("total_lines"),
        )
    )


@query(
    "tpch_q20_part_promotion",
    oracle=(
        "SELECT s_name, s_acctbal FROM supplier"
        " WHERE s_suppkey IN ("
        "  SELECT l_suppkey FROM lineitem"
        "  WHERE l_partkey IN"
        "   (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')"
        "   AND l_shipdate >= TIMESTAMP '1997-01-01'"
        "   AND l_shipdate < TIMESTAMP '1998-01-01'"
        "  GROUP BY l_suppkey"
        "  HAVING sum(CAST(l_quantity AS DECIMAL(14,2))) > 200)"
        " AND s_nationkey IN ("
        "  SELECT n_nationkey FROM nation WHERE n_regionkey ="
        "   (SELECT r_regionkey FROM region WHERE r_name = 'AMERICA'))"
    ),
)
def tpch_q20_part_promotion(spark, sf_dir):
    """Q20 shape: suppliers who moved serious volume of one product line in
    a year, within a region — nested IN subqueries become a chain of semi
    joins (the grouped HAVING relation semi-joins supplier, the
    nation-region lookup broadcasts). The filtered part side is UNHINTED
    (r15): part is sf-proportional (~20 B rows at 100 TB; the name LIKE
    keeps a few percent — still hundreds of millions), so its semi-join
    strategy is AQE's call; nation (25 rows) keeps its hint. Shipped
    quantity stands in for partsupp availability."""
    parts = catalog.table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    movers = (
        li.join(parts, li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
        .filter(F.col("qty") > 200)
    )
    r = catalog.table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nations = catalog.table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    s = catalog.table(spark, sf_dir, "supplier")
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .join(F.broadcast(nations), s.s_nationkey == nations.n_nationkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle=(
        "WITH fact AS ("
        " SELECT l.l_orderkey, l.l_suppkey,"
        "  l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY AS late"
        " FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " WHERE o.o_orderstatus = 'F')"
        " SELECT s.s_name, count(*) AS numwait"
        " FROM fact l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey"
        " WHERE l1.late"
        " AND EXISTS (SELECT 1 FROM fact l2 WHERE l2.l_orderkey = l1.l_orderkey"
        "  AND l2.l_suppkey <> l1.l_suppkey)"
        " AND NOT EXISTS (SELECT 1 FROM fact l3 WHERE l3.l_orderkey = l1.l_orderkey"
        "  AND l3.l_suppkey <> l1.l_suppkey AND l3.late)"
        " GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 50"
    ),
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """Q21 shape: the sole late supplier on multi-supplier finished orders.
    EXISTS becomes a left-semi self-join on the order/supplier fact, NOT
    EXISTS a left-anti against its late subset — the classic decorrelated
    Q21 plan. Lateness is ship date vs order date (the fixture has no
    commit/receipt dates). The fact relation is scanned three times; at
    scale you'd localCheckpoint it once — the self-joins all shuffle on
    orderkey so the exchange is reused."""
    li = catalog.table(spark, sf_dir, "lineitem")
    o = catalog.table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    fact = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
            ).alias("late"),
        )
    )
    l1 = fact.filter(F.col("late")).alias("l1")
    l2 = fact.alias("l2")
    l3 = fact.filter(F.col("late")).alias("l3")
    s = catalog.table(spark, sf_dir, "supplier")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(s, s.s_suppkey == F.col("l1.l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
    )
