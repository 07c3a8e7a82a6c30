"""Aggregation queries (SURVEY.md §2B 'Aggregations').

Hash aggregation with map-side partial aggregation is automatic in
Spark (partial_sum → exchange on group keys → final_sum); these
queries only have to keep the aggregate expressions codegen-friendly.
Float policy per _helpers (exact decimal sums, rounded stat fns).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load, register_views
from ._helpers import davg, dsum, sql_davg, sql_dsum


@query(
    "q_agg_hash",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum("l_quantity", "sum_qty")},
               {sql_dsum("l_extendedprice", "sum_base_price")},
               {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
               {sql_davg("l_quantity", "avg_qty")},
               {sql_davg("l_extendedprice", "avg_price")},
               {sql_davg("l_discount", "avg_disc")},
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_hash(spark, d):
    """Flagship: TPC-H Q1 shape — scan → pushdown filter → hash agg
    (8 aggregates) over two low-cardinality keys."""
    li = load(spark, d, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark, d):
    """Multiple COUNT(DISTINCT) — Spark rewrites to expand + two-phase
    aggregation; stays fully distributed."""
    return (
        load(spark, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query("q_agg_approx_distinct")  # rows-only: HLL sketches are engine-specific
def q_agg_approx_distinct(spark, d):
    """approx_count_distinct (HyperLogLog++). Declared rows-only — the
    sketch is engine-specific so values can't hash-match DuckDB
    (SURVEY.md §2B)."""
    return (
        load(spark, d, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


@query(
    "q_agg_rollup",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               {sql_dsum("o_totalprice", "total")},
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_rollup(spark, d):
    """ROLLUP with grouping_id to disambiguate subtotal rows."""
    return (
        load(spark, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "total"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@query(
    "q_agg_cube",
    oracle=f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS n,
               {sql_dsum("value", "total")},
               CAST(GROUPING(event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
                    AS BIGINT) AS gid
        FROM events
        GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    """,
)
def q_agg_cube(spark, d):
    """CUBE over (event_type, day)."""
    ev = load(spark, d, "events").withColumn("day", F.date_trunc("day", "ts"))
    return (
        ev.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "total"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@query(
    "q_agg_grouping_sets",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               {sql_dsum("o_totalprice", "total")}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark, d):
    """Explicit GROUPING SETS via SQL (same Catalyst Expand plan as
    rollup/cube). Registers only the table it reads — view
    registration must never couple this query to other tables."""
    register_views(spark, d, tables=["orders"])
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               {sql_dsum("o_totalprice", "total")}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_agg_collect",
    oracle="""
        SELECT l_orderkey,
               array_to_string(list(l_linenumber ORDER BY l_linenumber), ',')
                   AS line_numbers,
               array_to_string(list(DISTINCT l_returnflag ORDER BY l_returnflag), ',')
                   AS flags
        FROM lineitem
        WHERE l_orderkey % 100 = 0
        GROUP BY l_orderkey
    """,
)
def q_agg_collect(spark, d):
    """collect_list / collect_set with explicit sort for determinism
    (Spark's collect order is partition-dependent, so both sides sort
    inside the aggregate). Arrays are serialized to CSV strings —
    the driver's order-insensitive value hash can't digest list cells,
    so declared output must be scalar columns only."""
    return (
        load(spark, d, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("line_numbers"),
            F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias(
                "flags"
            ),
        )
    )


@query(
    "q_agg_stats",
    oracle="""
        SELECT event_type,
               ROUND(stddev_samp(value), 6) AS sd,
               ROUND(var_samp(value), 6) AS var,
               ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS c,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95
        FROM events
        GROUP BY event_type
    """,
)
def q_agg_stats(spark, d):
    """Statistical aggregates. stddev/var/corr use numerically-stable
    single-pass merges in both engines — rounded to 6 to absorb
    merge-order noise. percentile() is exact linear interpolation in
    both (NIST type-7)."""
    ev = load(spark, d, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.corr("value", F.col("user_id").cast("double")), 6).alias("c"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


@query(
    "q_agg_histogram",
    oracle="""
        SELECT CAST(floor(o_totalprice / 25000.0) AS INTEGER) AS bucket,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                          AS DOUBLE), 2) AS sum_price
        FROM orders
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def q_agg_histogram(spark, d):
    """Equi-width histogram of order prices: bucket = floor(x / 25k)
    (prices span [1013, 500k) -> buckets 0..19). Plain arithmetic
    binning rather than width_bucket so both engines evaluate the
    identical IEEE double floor-division; the histogram itself is one
    partial+final hash agg over ~20 groups — the profile-a-column
    primitive that costs one scan no matter the table size."""
    o = load(spark, d, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
        .orderBy("bucket")
    )


# Promoted rows-only -> DECLARED in round 9 (VERDICT r8 item 4): the
# engine-defined GK sketch can't be SQL-mirrored, but the quantiles a
# 100 TB profile needs CAN be — as a VALUE-resolution histogram.
# Prices are cent-discrete, so grouping by exact integer cents gives a
# mergeable distribution (combinable per-value counts, the same
# algebra the GK sketch distributes with) whose quantiles are EXACT:
# p_q = min cents value whose running count reaches ceil(q·n/100),
# computed on the bounded distinct-value relation — never a per-group
# row sort. Spark's approx_percentile still runs, audited: gk_ok_q = 1
# iff the GK answer's rank interval intersects [⌈(q−ε)n⌉−2, ⌈(q+ε)n⌉+2]
# (ε = 1/accuracy; ±2 absorbs the rank-convention off-by-ones). The
# oracle pins the literal 1 — a GK guarantee violation hash-fails.
_APX_QS = (50, 90, 99)
_APX_ACC = 10000

_APX_PCT_COLS = ",\n           ".join(
    f"MIN(CASE WHEN cum >= (n_total * {q} + 99) // 100 THEN cents END)"
    f" AS p{q}_cents" for q in _APX_QS
)
_APX_OK_COLS = ",\n           ".join(
    f"CAST(1 AS BIGINT) AS gk_ok_{q}" for q in _APX_QS
)

_APX_ORACLE = f"""
    WITH hist AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem
      GROUP BY l_returnflag, cents
    ),
    cummed AS (
      SELECT l_returnflag, cents, c,
             CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY cents
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum,
             CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT)
                 AS n_total
      FROM hist
    )
    SELECT l_returnflag,
           ANY_VALUE(n_total) AS n,
           {_APX_PCT_COLS},
           {_APX_OK_COLS}
    FROM cummed
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query("q_agg_approx_percentile", oracle=_APX_ORACLE)
def q_agg_approx_percentile(spark, d):
    """Mergeable value-histogram percentiles per return flag, DECLARED
    (block comment above for the promotion argument), with Spark's
    GK approx_percentile audited against its own rank guarantee.
    Plan: one (flag, cents) combinable agg shrinks the stream
    map-side; windows and the audit join run on the bounded
    distinct-value relation, never the data."""
    from pyspark.sql import Window

    li = load(spark, d, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    hist = (
        li.select("l_returnflag", cents.alias("cents"))
        .groupBy("l_returnflag", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    cummed = hist.select(
        "l_returnflag",
        "cents",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n_total"),
    )
    pct_aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n_total * {q} + 99) div 100"),
                F.col("cents"),
            )
        ).alias(f"p{q}_cents")
        for q in _APX_QS
    ]
    exact = cummed.groupBy("l_returnflag").agg(
        F.any_value("n_total").alias("n"), *pct_aggs
    )
    # GK audit: rank interval of the engine's approx answer vs the
    # guarantee window, both read off the bounded histogram.
    qlist = ", ".join(str(q / 100) for q in _APX_QS)
    gk = li.groupBy("l_returnflag").agg(
        F.expr(
            f"approx_percentile(l_extendedprice, array({qlist}),"
            f" {_APX_ACC})"
        ).alias("p")
    )
    gk_cents = gk.select(
        "l_returnflag",
        *[
            F.floor(F.col("p")[i] * 100 + 0.5)
            .cast("long")
            .alias(f"v{q}")
            for i, q in enumerate(_APX_QS)
        ],
    )
    audit_aggs = []
    for q in _APX_QS:
        lower = F.expr(
            f"cast(floor(({q}.0d / 100 - 1.0d / {_APX_ACC})"
            " * any_value(n_total)) as bigint) - 2"
        )
        upper = F.expr(
            f"cast(ceil(({q}.0d / 100 + 1.0d / {_APX_ACC})"
            " * any_value(n_total)) as bigint) + 2"
        )
        cnt_le = F.sum(
            F.when(F.col("cents") <= F.col(f"v{q}"), F.col("c")).otherwise(0)
        )
        cnt_lt = F.sum(
            F.when(F.col("cents") < F.col(f"v{q}"), F.col("c")).otherwise(0)
        )
        audit_aggs.append(
            F.when((cnt_le >= lower) & (cnt_lt + 1 <= upper), 1)
            .otherwise(0)
            .cast("long")
            .alias(f"gk_ok_{q}")
        )
    audit = (
        cummed.join(F.broadcast(gk_cents), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(*audit_aggs)
    )
    return (
        exact.join(audit, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            *[f"p{q}_cents" for q in _APX_QS],
            *[f"gk_ok_{q}" for q in _APX_QS],
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_mode",
    oracle="""
        WITH c AS (
          SELECT l_returnflag, l_quantity, count(*) AS cnt
          FROM lineitem GROUP BY 1, 2
        ), r AS (
          SELECT l_returnflag, l_quantity, cnt,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY cnt DESC, l_quantity) AS rn
          FROM c
        )
        SELECT l_returnflag,
               CAST(l_quantity AS DOUBLE) AS mode_qty,
               CAST(cnt AS BIGINT) AS mode_count
        FROM r WHERE rn = 1
        ORDER BY l_returnflag
    """,
)
def q_agg_mode(spark, d):
    """Deterministic per-group mode (most frequent value, smallest
    value on frequency ties — built-in mode() leaves ties
    engine-defined, so it can never be hash-checked). Two chained
    combinable hash aggs: (group, value) counts, then max_by over a
    (count, -value) ordering struct — no window, no sort, and the
    second agg's input is already collapsed to distinct values. The
    same shape DuckDB's arg_max(x, ROW(cnt, -x)) expresses, so both
    engines break ties identically."""
    li = load(spark, d, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.max_by(
                "l_quantity",
                F.struct(F.col("cnt"), (-F.col("l_quantity")).alias("nq")),
            ).alias("mode_qty"),
            F.max("cnt").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_moments",
    oracle="""
        WITH s AS (
          SELECT l_returnflag,
                 count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS s1,
                 CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,10)))
                      AS DOUBLE) AS s2,
                 CAST(sum(CAST(l_quantity * l_quantity * l_quantity
                               AS DECIMAL(30,10))) AS DOUBLE) AS s3,
                 CAST(sum(CAST(l_quantity * l_quantity * l_quantity
                               * l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                     AS s4
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               n,
               CAST(floor(s1 / n * 1000000) AS BIGINT) AS mean_micro,
               CAST(floor((s2 / n - (s1/n) * (s1/n)) * 1000000)
                    AS BIGINT) AS var_pop_micro,
               CAST(floor((s3/n - 3 * (s1/n) * (s2/n) + 2 * (s1/n)
                           * (s1/n) * (s1/n))
                          / pow(s2 / n - (s1/n) * (s1/n), 1.5)
                          * 1000000) AS BIGINT) AS skewness_micro,
               CAST(floor(((s4/n - 4 * (s1/n) * (s3/n) + 6 * (s1/n)
                            * (s1/n) * (s2/n) - 3 * (s1/n) * (s1/n)
                            * (s1/n) * (s1/n))
                           / ((s2/n - (s1/n)*(s1/n))
                              * (s2/n - (s1/n)*(s1/n)))
                           - 3.0) * 1000000) AS BIGINT) AS kurtosis_micro
        FROM s
        ORDER BY l_returnflag
    """,
)
def q_agg_moments(spark, d):
    """Higher-moment statistics (population skewness, excess
    kurtosis) per group — computed from EXACT decimal raw-moment sums
    (Σx..Σx⁴) rather than the engines' built-in skewness()/kurtosis()
    whose one-pass update formulas and sample corrections differ and
    can never hash-match. The four moment sums travel through one
    combinable hash agg (map-side partials merge exactly — decimal
    addition is associative), then the central-moment algebra runs
    the same double expression tree on both engines (pow is the one
    libm-dependent call); outputs leave as floor(x*1e6) integer
    micro — the post-r8 rule for raw-double results. l_quantity⁴ ≤ 50⁴ keeps Σx⁴ far
    inside DECIMAL(30,10) range at any fixture scale. spread=True
    parallelizes the four per-row decimal power partials across cores
    (r17: 1-row-group fixture ran them in one scan task — 1.43 s →
    0.92 s at sf0.1; no-op on splittable production inputs)."""
    li = load(spark, d, "lineitem", spread=True)
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(30,10)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(30,10)")).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(30,10)")).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast("decimal(30,10)"))
        .cast("double")
        .alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n")
    m3 = F.col("s3") / F.col("n")
    m4 = F.col("s4") / F.col("n")
    var_pop = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var_pop, 1.5)
    kurt = (
        m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1
    ) / (var_pop * var_pop) - 3.0
    return s.select(
        "l_returnflag",
        "n",
        F.floor(m1 * 1000000).alias("mean_micro"),
        F.floor(var_pop * 1000000).alias("var_pop_micro"),
        F.floor(skew * 1000000).alias("skewness_micro"),
        F.floor(kurt * 1000000).alias("kurtosis_micro"),
    ).orderBy("l_returnflag")


@query(
    "q_agg_boolean",
    oracle="""
        SELECT event_type,
               CAST(count(CASE WHEN value > 500 THEN 1 END) AS BIGINT)
                   AS n_high,
               bool_and(value >= 0) AS all_nonneg,
               bool_or(value > 990) AS any_extreme,
               CAST(count(CASE WHEN value > 500 THEN 1 END) * 1000000
                    // count(*) AS BIGINT) AS frac_high_ppm
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_agg_boolean(spark, d):
    """Boolean/conditional aggregates — count_if, every (bool_and),
    some (bool_or), and a conditional fraction: the predicates-as-
    metrics idiom behind SLO dashboards ("% of requests over
    threshold"). All four are plain combinable aggregates (booleans
    merge with AND/OR — associative), one hash agg, map-side
    partials doing nearly all the work on low-cardinality keys."""
    ev = load(spark, d, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 500).alias("n_high"),
            F.every(F.col("value") >= 0).alias("all_nonneg"),
            F.some(F.col("value") > 990).alias("any_extreme"),
            F.expr(
                "count_if(value > 500) * 1000000L div count(*)"
            ).alias("frac_high_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_bitmap",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_agg_bitmap(spark, d):
    """Exact distinct counting via Spark 4's bitmap aggregates — the
    warehouse bitmap-index recipe: bucket each user_id
    (bitmap_bucket_number), OR the per-bucket position bitmaps
    (bitmap_construct_agg, a combinable binary aggregate whose
    partial state is a fixed 4 KB bitmap), count bits per bucket,
    sum counts per group. Shuffles carry bitmaps, not ids — the
    mergeable-exact alternative to both COUNT(DISTINCT)'s id shuffle
    and HLL's approximation. The oracle checks the VALUE with a plain
    COUNT(DISTINCT): the bitmap representation is engine-side but
    the count it produces is not."""
    ev = load(spark, d, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("cnt")
        )
    )
    counts = per_bucket.groupBy("event_type").agg(
        F.sum("cnt").alias("n_users")
    )
    totals = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return counts.join(totals, "event_type").orderBy("event_type")


@query(
    "q_agg_bitwise",
    oracle="""
        SELECT event_type,
               bit_and(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS mask_and,
               bit_or(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS mask_or,
               bit_xor(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS mask_xor,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_agg_bitwise(spark, d):
    """Bitwise aggregates (bit_and / bit_or / bit_xor) over a
    JSON-extracted feature mask — the flag-column analytics surface
    (capability intersections, union masks, parity checks). All three
    are commutative+associative integer folds, so they partial-
    aggregate map-side and are order-independent by construction:
    no decimal detour needed, exact on both engines."""
    ev = load(spark, d, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and("k").alias("mask_and"),
            F.bit_or("k").alias("mask_or"),
            F.bit_xor("k").alias("mask_xor"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )
