"""Reshape / statistical-summary / sampling operators: pivot, unpivot,
exact percentiles, deterministic hash sampling.

These round out the relational surface a reference user expects from a
DataFrame engine (pandas/sklearn users lean hard on pivot_table, melt,
quantile, and reproducible sampling when staging training data).

Scale notes: the pivot passes an EXPLICIT value list, so Spark skips
the extra distinct-collection job a dynamic pivot needs and the plan
is a single hash aggregate; unpivot is a Generate (no shuffle) before
its agg; hash sampling is a pure codegen'd filter that prunes at scan
time — none of these materialize driver-side state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC, dsum, sql_dsum

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = ["urgent", "high", "medium", "not_specified", "low"]


@query(
    "q_pivot_wide",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
               COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
               COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
               COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS not_specified,
               COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low,
               COUNT(*) AS total
        FROM orders
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def q_pivot_wide(spark, d):
    """Pivot (long -> wide): order counts per year x priority. The
    value list is explicit, so no pre-pass distinct job runs and the
    whole query is ONE hash aggregate with 5 conditional counts —
    the same plan the SQL oracle's CASE counts produce. Absent cells
    coalesce to 0 to match COUNT(CASE...)."""
    o = load(spark, d, "orders").withColumn("o_year", F.year("o_orderdate"))
    wide = o.groupBy("o_year").pivot("o_orderpriority", _PRIORITIES).count()
    total = o.groupBy("o_year").agg(F.count(F.lit(1)).alias("total"))
    return (
        wide.join(total, "o_year")
        .select(
            "o_year",
            *[
                F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
                for p, a in zip(_PRIORITIES, _PRIO_ALIAS)
            ],
            "total",
        )
        .orderBy("o_year")
    )


@query(
    "q_unpivot_long",
    oracle=f"""
        SELECT 'l_discount' AS measure, {sql_dsum("l_discount", "total")} FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', {sql_dsum("l_extendedprice", "total")} FROM lineitem
        UNION ALL
        SELECT 'l_quantity', {sql_dsum("l_quantity", "total")} FROM lineitem
        UNION ALL
        SELECT 'l_tax', {sql_dsum("l_tax", "total")} FROM lineitem
        ORDER BY measure
    """,
)
def q_unpivot_long(spark, d):
    """Unpivot / melt (wide -> long): the four lineitem measures fold
    into (measure, value) rows — an Expand node, zero shuffles —
    then one decimal-exact sum per measure. The melt shape is what
    feature-store exports and long-format training dumps use."""
    li = load(spark, d, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        long.groupBy("measure")
        .agg(dsum(F.col("value"), "total"))
        .orderBy("measure")
    )


@query(
    "q_agg_percentile",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
               ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
               ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q_agg_percentile(spark, d):
    """Exact linear-interpolation percentiles of l_quantity per
    return flag (Spark ``percentile`` == DuckDB ``quantile_cont``;
    both interpolate a + (b-a)*frac over the sorted run, and the
    inputs are identical parquet doubles, so the doubles agree before
    the round-6). Exact percentile sorts within each group — fine for
    a bounded group count; approx_percentile is the knob when groups
    are huge (its t-digest error breaks the oracle, so the declared
    query pins the exact form)."""
    li = load(spark, d, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_upsert_snapshot",
    oracle=f"""
        WITH changes AS (
            SELECT o_orderkey AS key, o_totalprice * 1.1 AS new_price,
                   FALSE AS is_delete
            FROM orders WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey + 10000000, o_totalprice, FALSE
            FROM orders WHERE o_orderkey % 100 = 7
            UNION ALL
            SELECT o_orderkey, CAST(NULL AS DOUBLE), TRUE
            FROM orders WHERE o_orderkey % 37 = 1
        ),
        merged AS (
            SELECT COALESCE(c.new_price, o.o_totalprice) AS price,
                   COALESCE(o.o_orderstatus, 'NEW') AS status
            FROM orders o
            FULL OUTER JOIN changes c ON o.o_orderkey = c.key
            WHERE COALESCE(c.is_delete, FALSE) = FALSE
        )
        SELECT status, COUNT(*) AS n_rows,
               {sql_dsum("price", "sum_price")}
        FROM merged GROUP BY status ORDER BY status
    """,
)
def q_upsert_snapshot(spark, d):
    """CDC upsert / SCD-1 snapshot maintenance without a table format:
    apply a deterministic changes batch (updates, inserts, deletes —
    synthesized from the orders keyspace so the oracle can mirror it)
    onto the base via ONE full-outer join on the key, coalescing
    changed columns and dropping delete rows. This is the MERGE INTO
    rewrite for plain-parquet pipelines: one shuffle on the key (or
    zero against a key-bucketed base table via sources/io
    .write_bucketed); Delta/Iceberg replace the rewrite with the same
    join plus file-level pruning, so the plan shape carries over."""
    o = load(spark, d, "orders")
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice") * 1.1).alias("new_price"),
        F.lit(False).alias("is_delete"),
    )
    ins = o.filter(F.col("o_orderkey") % 100 == 7).select(
        (F.col("o_orderkey") + 10000000).alias("key"),
        F.col("o_totalprice").alias("new_price"),
        F.lit(False).alias("is_delete"),
    )
    dels = o.filter(F.col("o_orderkey") % 37 == 1).select(
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("double").alias("new_price"),
        F.lit(True).alias("is_delete"),
    )
    changes = upd.unionByName(ins).unionByName(dels)
    merged = (
        o.join(changes, o.o_orderkey == changes.key, "full_outer")
        .filter(F.coalesce(F.col("is_delete"), F.lit(False)) == False)  # noqa: E712
        .select(
            F.coalesce(F.col("new_price"), F.col("o_totalprice")).alias("price"),
            F.coalesce(F.col("o_orderstatus"), F.lit("NEW")).alias("status"),
        )
    )
    return (
        merged.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("price"), "sum_price"),
        )
        .orderBy("status")
    )


@query(
    "q_sample_hash",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_sample,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2)
                 AS sum_price
        FROM orders
        WHERE (o_orderkey * 2654435761) % 4294967296 < 429496729
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def q_sample_hash(spark, d):
    """Deterministic ~10% sample via a Knuth multiplicative hash on
    the key, then a sanity aggregate. Unlike TABLESAMPLE / df.sample
    — whose row picks depend on partition layout and so can't be
    oracle-checked or reproduced across engines — a key-hash filter
    is a pure codegen'd predicate: same rows on any engine, any
    partitioning, any day. This is the reproducible-subset idiom for
    training-data pipelines (hash on a stable ID, threshold by
    sample rate); the arithmetic stays in exact int64 on both sides."""
    o = load(spark, d, "orders")
    h = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)
    return (
        o.filter(h < 429496729)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_sample_stratified",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_sample,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 <
              CASE WHEN lang = 'en' THEN 2147483648 ELSE 429496729 END
        GROUP BY lang
        ORDER BY lang
    """,
)
def q_sample_stratified(spark, d):
    """Stratified deterministic sampling: per-stratum rates (50% for
    'en', 10% for every other lang) applied through the same Knuth
    key-hash filter as q_sample_hash — the up/down-sampling idiom for
    rebalancing a training mix. The per-stratum threshold is a CASE
    over the stratum column, so the whole thing stays one codegen'd
    scan predicate: no shuffle, no per-stratum pass, reproducible on
    any engine/partitioning. sum(doc_id) pins the exact row picks,
    not just the counts."""
    docs = load(spark, d, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    thresh = F.when(F.col("lang") == "en", F.lit(2147483648)).otherwise(
        F.lit(429496729)
    )
    return (
        docs.filter(h < thresh)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("lang")
    )


@query(
    "q_pivot_dynamic",
    oracle="""
        SELECT event_type,
               COUNT(CASE WHEN dow = 0 THEN 1 END) AS dow_0,
               COUNT(CASE WHEN dow = 1 THEN 1 END) AS dow_1,
               COUNT(CASE WHEN dow = 2 THEN 1 END) AS dow_2,
               COUNT(CASE WHEN dow = 3 THEN 1 END) AS dow_3,
               COUNT(CASE WHEN dow = 4 THEN 1 END) AS dow_4,
               COUNT(CASE WHEN dow = 5 THEN 1 END) AS dow_5,
               COUNT(CASE WHEN dow = 6 THEN 1 END) AS dow_6
        FROM (SELECT event_type, dayofweek(ts) AS dow FROM events)
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_pivot_dynamic(spark, d):
    """Pivot with INFERRED spread values: when the value list isn't
    known at plan time, Spark runs a distinct pre-pass (bounded by
    the spread column's cardinality — fine for enum-like columns,
    a plan-time failure waiting to happen for unbounded ones, which
    is why q_pivot_wide's explicit-list form is the default here).
    The pre-pass result is sorted so the output column order is
    deterministic. Day-of-week bases differ across engines — Spark
    dayofweek is 1=Sunday..7=Saturday, DuckDB's is 0=Sunday..6 — so
    the Spark side subtracts 1 to match (the CLAUDE.md dayofweek
    trap). The declared contract pins columns dow_0..dow_6, so the
    pivot is given the full 0..6 value list: with inference alone an
    absent day-of-week at some fixture/scale would silently drop a
    column and fail the contract at plan level instead of flagging a
    data gap (and the explicit list also skips the distinct
    pre-pass job)."""
    ev = load(spark, d, "events").select(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    )
    wide = ev.groupBy("event_type").pivot("dow", list(range(7))).count()
    return (
        wide.select(
            "event_type",
            *[
                F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(f"dow_{c}")
                for c in range(7)
            ],
        )
        .orderBy("event_type")
    )


@query(
    "q_pivot_multi_agg",
    oracle="""
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                   AS click_n,
               CAST(floor(CAST(SUM(CASE WHEN event_type = 'click'
                     THEN CAST(value AS DECIMAL(30,10)) END) AS DOUBLE)
                          * 100) AS BIGINT) AS click_sum_cents,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                   AS purchase_n,
               CAST(floor(CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(30,10)) END) AS DOUBLE)
                          * 100) AS BIGINT) AS purchase_sum_cents,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                   AS error_n,
               CAST(floor(CAST(SUM(CASE WHEN event_type = 'error'
                     THEN CAST(value AS DECIMAL(30,10)) END) AS DOUBLE)
                          * 100) AS BIGINT) AS error_sum_cents
        FROM events
        WHERE user_id % 5 = 0
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def q_pivot_multi_agg(spark, d):
    """Pivot with MULTIPLE aggregates per pivoted value (count + sum
    per event type) — Spark names the output columns
    {value}_{aggAlias}, and pinning that naming against the oracle is
    the point: multi-agg pivots are where silent column-name drift
    breaks downstream schemas. Explicit value list (the
    q_pivot_dynamic rule), decimal-path sums leaving as floor(x*100)
    integer cents, one partial+final agg; the %5 slice bounds the
    declared output."""
    ev = load(spark, d, "events").filter(F.col("user_id") % 5 == 0)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "error"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(
                F.sum(F.col("value").cast(DEC)).cast("double") * 100
            ).alias("sum_cents"),
        )
    )
    # a (user, type) combination with no rows pivots to NULL counts in
    # Spark while the oracle's COUNT(CASE ...) yields 0 — coalesce the
    # count cells (q_pivot_dynamic's rule; sums are NULL on BOTH sides)
    return out.select(
        "user_id",
        F.coalesce("click_n", F.lit(0)).alias("click_n"),
        F.col("click_sum_cents"),
        F.coalesce("purchase_n", F.lit(0)).alias("purchase_n"),
        F.col("purchase_sum_cents"),
        F.coalesce("error_n", F.lit(0)).alias("error_n"),
        F.col("error_sum_cents"),
    ).orderBy("user_id")
