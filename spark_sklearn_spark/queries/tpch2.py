"""TPC-H Q2/Q4/Q8/Q9/Q11-Q17/Q19/Q20/Q22 adapted to the fixture schema.

With tpch.py (Q3/Q5/Q6/Q7/Q10/Q18/Q21) and the flagship ``q_agg_hash``
(the Q1 shape), this completes the 22-query TPC-H suite's SHAPES. The
fixture star schema (TESTDATA.md) omits partsupp and several columns
(shipmode, commitdate, phone, containers), so each query keeps its
canonical plan shape — correlated min, EXISTS semi, market-share
ratio, scalar-subquery HAVING, distribution-of-counts, NOT-IN anti —
with the missing inputs remapped onto columns the fixtures do have
(the part↔supplier relation comes from ``DISTINCT (l_partkey,
l_suppkey)`` in lineitem wherever partsupp is called for).

Scale notes (100 TB posture): nation/region broadcast always; part/
supplier broadcast only AFTER their selective filters (one brand/type
slice of a dim is small at any SF — the unfiltered dims are not);
every correlated aggregate is a key-partitioned window or a grouped
agg + equi-join, never a per-row subquery; scalar thresholds travel
as 1-row broadcast cross joins. Sums of doubles follow the decimal
policy in ``_helpers`` so Spark and DuckDB hash identically.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC, dsum, sql_dsum

_PAIRS_SQL = "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"


def _pairs(spark, d):
    """The partsupp stand-in: distinct (part, supplier) pairs observed
    in lineitem. One dedup shuffle, ~|partsupp| rows out."""
    return load(spark, d, "lineitem").select("l_partkey", "l_suppkey").distinct()


@query(
    "q_tpch_q2",
    oracle=f"""
        WITH eu AS (
            SELECT ps.l_partkey, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
            FROM {_PAIRS_SQL} ps
            JOIN supplier s ON s.s_suppkey = ps.l_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey
        FROM eu e
        JOIN part p ON p.p_partkey = e.l_partkey
        WHERE p.p_type = 'ECONOMY'
          AND e.s_acctbal = (
            SELECT min(e2.s_acctbal) FROM eu e2
            WHERE e2.l_partkey = e.l_partkey)
        ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
    """,
)
def q_tpch_q2(spark, d):
    """TPC-H Q2 (minimum-cost supplier): for each ECONOMY part, the
    EUROPE supplier(s) with the minimum account balance among those
    that supply it. partsupp -> distinct lineitem pairs; the
    correlated MIN subquery -> a min window partitioned by part key
    (one shuffle, no per-row subquery). Region/nation broadcast."""
    s = load(spark, d, "supplier")
    n = load(spark, d, "nation")
    r = load(spark, d, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, d, "part").filter(F.col("p_type") == "ECONOMY")
    eu = (
        _pairs(spark, d)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q4",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark, d):
    """TPC-H Q4 (order-priority checking): orders in 1997 H1 with at
    least one line shipped >30 days after order date (the fixture has
    no commit/receipt dates — lateness is remapped to ship lag).
    EXISTS -> leftsemi join on orderkey with the non-equi lag
    predicate, then a tiny hash agg on priority."""
    o = load(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, d, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q8",
    oracle=f"""
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               ROUND(
                 CAST(SUM(CASE WHEN n2.n_name = 'NATION_8'
                   THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))
                   ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE),
                 6) AS mkt_share
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def q_tpch_q8(spark, d):
    """TPC-H Q8 (national market share): NATION_8's share of PROMO
    part revenue sold into AMERICA, per order year. Two nation roles
    (customer side, supplier side) join the same broadcast dim twice;
    the share is a ratio of exact decimal sums rounded to 6 on both
    engines. Fact spine shuffles once on orderkey."""
    li = load(spark, d, "lineitem")
    o = load(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, d, "customer")
    s = load(spark, d, "supplier")
    p = load(spark, d, "part").filter(F.col("p_type") == "PROMO")
    n1 = load(spark, d, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load(spark, d, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, d, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_8", vol)
                    .otherwise(F.lit(0))
                    .cast(DEC)
                ).cast("double")
                / F.sum(vol.cast(DEC)).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q9",
    oracle=f"""
        SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity", "sum_profit")}
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%bolt%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark, d):
    """TPC-H Q9 (product-type profit): profit on '%bolt%' parts by
    supplier nation and order year. ps_supplycost (no partsupp in the
    fixture) is remapped to 0.6 * p_retailprice. The name filter
    shrinks part before its join; nation broadcasts; one spine
    shuffle on orderkey."""
    li = load(spark, d, "lineitem")
    s = load(spark, d, "supplier")
    p = load(spark, d, "part").filter(F.col("p_name").like("%bolt%"))
    o = load(spark, d, "orders")
    n = load(spark, d, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("profit"), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q_tpch_q11",
    oracle="""
        WITH eu_li AS (
            SELECT l.l_partkey, CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(30,10)) AS v
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT l_partkey, ROUND(CAST(SUM(v) AS DOUBLE), 2) AS part_value
        FROM eu_li
        GROUP BY l_partkey
        HAVING SUM(v) * 1000 > (SELECT SUM(v) FROM eu_li)
        ORDER BY part_value DESC, l_partkey
    """,
)
def q_tpch_q11(spark, d):
    """TPC-H Q11 (important stock): parts whose EUROPE-supplied value
    exceeds 1/1000 of the total. ps_supplycost*ps_availqty is remapped
    to extendedprice*quantity over EUROPE suppliers' lines. The scalar
    threshold is a 1-row aggregate broadcast-cross-joined back; the
    comparison runs in exact decimals (value*1000 > total) so neither
    engine can disagree at the boundary."""
    li = load(spark, d, "lineitem")
    s = load(spark, d, "supplier")
    n = load(spark, d, "nation")
    r = load(spark, d, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC).alias("v"))
    )
    per_part = eu.groupBy("l_partkey").agg(F.sum("v").alias("v_dec"))
    # the corpus total is the sum of the per-part decimal sums — exact
    # by associativity — so it derives from per_part instead of
    # re-evaluating the whole join subtree a second time (Catalyst
    # can't reuse it: the two aggs need different partitionings)
    total = per_part.agg(F.sum("v_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("v_dec") * 1000 > F.col("total_dec"))
        .select(
            "l_partkey",
            F.round(F.col("v_dec").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q_tpch_q12",
    oracle="""
        SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                    THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY ship_bucket
        ORDER BY ship_bucket
    """,
)
def q_tpch_q12(spark, d):
    """TPC-H Q12 (shipping modes / priority): the fixture has no
    l_shipmode, so lines bucket by ship lag instead (>90 days = SLOW);
    per bucket, count critical- vs normal-priority orders. Join +
    conditional aggregation, one spine shuffle, two result rows."""
    o = load(spark, d, "orders")
    li = load(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "SLOW"
            ).otherwise("FAST"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "q_tpch_q13",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark, d):
    """TPC-H Q13 (customer order-count distribution): orders per
    customer (zero included via left outer; the comment filter is
    remapped to priority), then the histogram of those counts. Two
    hash aggs; the second input is one row per customer — tiny."""
    c = load(spark, d, "customer")
    o = load(spark, d, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_tpch_q14",
    oracle="""
        SELECT ROUND(
            100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))
                ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE)
            / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE),
            6) AS promo_revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
    """,
)
def q_tpch_q14(spark, d):
    """TPC-H Q14 (promotion effect): PROMO parts' percentage of
    revenue in a 3-month ship window. Part joins the date-pruned fact
    (broadcast — one full dim but bounded |part|); the percentage is
    a ratio of exact decimal sums rounded to 6 on both engines."""
    li = load(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    p = load(spark, d, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0))
                    .cast(DEC)
                ).cast("double")
                / F.sum(rev.cast(DEC)).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
        WITH revenue AS (
            SELECT l.l_suppkey AS supplier_no,
                   {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "total_revenue")}
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
            GROUP BY supplier_no
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark, d):
    """TPC-H Q15 (top supplier): supplier(s) achieving the maximum
    6-month revenue. The revenue CTE is one hash agg; the scalar MAX
    is a 1-row aggregate broadcast-cross-joined back (no global
    window, no second scan); equality compares the decimal-rounded
    revenue so both engines pick the same winner(s)."""
    li = load(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    s = load(spark, d, "supplier")
    # revenue feeds both the scalar max and the final join; persist the
    # post-agg relation (#suppliers rows — small at ANY sf) so the
    # lineitem scan+agg runs once, not twice. bench/test clearCache()
    # hygiene evicts it, matching the minhash/simhash convention.
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    ).persist()
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q16",
    oracle=f"""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM {_PAIRS_SQL} ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_size <= 25
          AND ps.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark, d):
    """TPC-H Q16 (parts/supplier relationship): distinct supplier
    count per (brand, type, size) slice, excluding low-balance
    suppliers (the complaint filter remapped to s_acctbal). NOT IN ->
    left_anti against the tiny excluded-supplier set (broadcast);
    partsupp -> distinct lineitem pairs; distinct-agg shuffles on the
    group keys."""
    p = load(spark, d, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)
    )
    bad = load(spark, d, "supplier").filter(F.col("s_acctbal") < 1000).select(
        "s_suppkey"
    )
    return (
        _pairs(spark, d)
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q17",
    oracle="""
        WITH br AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#3'
        ), pavg AS (
            SELECT l_partkey,
                   ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                         / COUNT(l_quantity), 6) AS avg_qty
            FROM br GROUP BY l_partkey
        )
        SELECT ROUND(CAST(SUM(CAST(br.l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)
                     / 7.0, 2) AS avg_yearly
        FROM br JOIN pavg ON br.l_partkey = pavg.l_partkey
        WHERE br.l_quantity < 0.2 * pavg.avg_qty
    """,
)
def q_tpch_q17(spark, d):
    """TPC-H Q17 (small-quantity-order revenue): revenue lost to
    sub-20%-of-average-quantity orders for one brand. The correlated
    AVG becomes a grouped agg re-joined on partkey (both shuffles are
    on the same key and tiny after the brand filter); the threshold
    compares against an avg rounded to 6 on both engines, so the
    boundary row set is identical."""
    p = load(spark, d, "part").filter(F.col("p_brand") == "Brand#3")
    li = load(spark, d, "lineitem")
    br = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pavg = br.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count("l_quantity"),
            6,
        ).alias("avg_qty")
    )
    return (
        br.join(pavg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@query(
    "q_tpch_q19",
    oracle=f"""
        SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 1 AND l.l_quantity <= 15)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity >= 10 AND l.l_quantity <= 25)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 40
               AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q_tpch_q19(spark, d):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    OR'd (brand, size, quantity) clauses — the classic test that a
    disjunction over join-side columns still prunes (part pre-filters
    to the brand union and broadcasts; the residual OR evaluates
    post-join inside codegen, no fallback to BNLJ)."""
    li = load(spark, d, "lineitem")
    p = load(spark, d, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 40) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "q_tpch_q20",
    oracle="""
        SELECT s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_type = 'ECONOMY'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING SUM(CAST(l.l_quantity AS DECIMAL(30,10))) > 40)
        ORDER BY s.s_name
    """,
)
def q_tpch_q20(spark, d):
    """TPC-H Q20 (excess inventory): suppliers that moved >40 units of
    some ECONOMY part in 1997 (ps_availqty's half-stock test remapped
    to a shipped-quantity threshold; exact decimal sum so the HAVING
    boundary agrees). Nested IN -> grouped agg then leftsemi on
    suppkey; nation broadcasts."""
    li = load(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load(spark, d, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, d, "supplier")
    n = load(spark, d, "nation")
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 40)
        .select("l_suppkey")
    )
    return (
        s.join(movers, s.s_suppkey == F.col("l_suppkey"), "leftsemi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q_tpch_q22",
    oracle=f"""
        WITH pos AS (
            SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
                         / COUNT(c_acctbal), 6) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT n.n_name AS cntrycode,
               COUNT(*) AS numcust,
               {sql_dsum("c.c_acctbal", "totacctbal")}
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('ASIA', 'EUROPE')
          AND c.c_acctbal > (SELECT avg_bal FROM pos)
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
)
def q_tpch_q22(spark, d):
    """TPC-H Q22 (global sales opportunity): rich-but-dormant
    customers per nation — above-average balance (phone-prefix country
    codes remapped to ASIA/EUROPE nations), no orders since 2000.
    Scalar AVG broadcast-cross-joins; NOT EXISTS -> left_anti against
    the date-pruned orders; one agg on the surviving few rows."""
    c = load(spark, d, "customer")
    n = load(spark, d, "nation")
    r = load(spark, d, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    recent = load(spark, d, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count("c_acctbal"),
                6,
            ).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntrycode")
    )
