"""Lakehouse maintenance & layout operators (round 5): incremental
aggregate maintenance (snapshot ⊕ delta merge) and multi-dimensional
Z-order clustering keys.

Both are the table-maintenance half of a production lake: continuous
aggregates that absorb a day's delta without recomputing history, and
data layout that keeps min/max file skipping effective for more than
one predicate column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC

# --------------------------------------------------------------------------
# Incremental aggregate maintenance
# --------------------------------------------------------------------------

INCR_CUTOFF = "1997-01-01"


# ROUND-safe: sum_price rounds the decimal-exact sum of 2-dp money
# back to 2 dp — the sum sits within ~1e-6 of an exact cents value,
# never near a .005 tie on either engine.
@query(
    "q_agg_incremental",
    oracle="""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                   AS order_month,
               count(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                          AS DOUBLE), 2) AS sum_price,
               CAST(max(o_orderkey) AS BIGINT) AS max_key
        FROM orders
        GROUP BY 1
        ORDER BY order_month
    """,
)
def q_agg_incremental(spark, d):
    """Incremental aggregate maintenance (the materialized-view /
    continuous-aggregate merge): history BEFORE the cutoff and the
    fresh delta AFTER it are aggregated separately into partial
    states, then merged by re-aggregating the union — and because
    count/sum/max are algebraic, the merged rollup is bit-identical
    to a full recompute (which is exactly what the oracle runs). At
    100 TB this is the shape that turns a daily refresh from a
    full-history scan into (stored snapshot) + (one day of delta):
    the snapshot side here stands in for the stored agg table. Sums
    ride the exact decimal path end-to-end (partials AND merge), so
    merge order cannot perturb the result. Two combinable hash aggs
    + one union + one ~|months|-row re-agg — no window, no join."""
    o = load(spark, d, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("order_month")

    def partial(df):
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("psum"),
            F.max("o_orderkey").alias("pmax"),
        )

    cutoff = F.lit(INCR_CUTOFF).cast("timestamp")
    snapshot = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        snapshot.unionByName(delta)
        .groupBy("order_month")
        .agg(
            F.sum("pn").alias("n_orders"),
            F.round(F.sum("psum").cast("double"), 2).alias("sum_price"),
            F.max("pmax").alias("max_key"),
        )
        .orderBy("order_month")
    )


# --------------------------------------------------------------------------
# Z-order clustering keys
# --------------------------------------------------------------------------

Z_BITS = 8  # 8 bits per dimension -> 16-bit Morton key


def _interleave_bits(x, y, bits: int):
    """Morton (Z-order) interleave of two `bits`-bit integer columns —
    pure integer arithmetic, identical on any engine: bit i of x lands
    at position 2i, bit i of y at 2i+1."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def _interleave_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@query(
    "q_layout_zorder",
    oracle=f"""
        WITH dims AS (
          SELECT o_orderkey,
                 CAST(o_custkey % 256 AS BIGINT) AS cdim,
                 CAST(datediff('day', TIMESTAMP '1995-01-01',
                               o_orderdate) % 256 AS BIGINT) AS tdim
          FROM orders
        ), zk AS (
          SELECT o_orderkey, cdim, tdim,
                 {_interleave_sql('cdim', 'tdim', Z_BITS)} AS zkey
          FROM dims
        )
        SELECT CAST(zkey // 256 AS BIGINT) AS file_bucket,
               count(*) AS n_rows,
               CAST(min(cdim) AS BIGINT) AS cust_min,
               CAST(max(cdim) AS BIGINT) AS cust_max,
               CAST(min(tdim) AS BIGINT) AS day_min,
               CAST(max(tdim) AS BIGINT) AS day_max
        FROM zk
        GROUP BY 1
        ORDER BY file_bucket
    """,
)
def q_layout_zorder(spark, d):
    """Z-order (Morton) clustering keys for two-dimensional data
    layout: interleave the low bits of a customer bucket and a
    date bucket so that sorting by the single zkey co-locates rows
    that are close in BOTH dimensions. The declared output is the
    per-file-bucket min/max envelope of each dimension (zkey >> 8 ≈
    a target file), i.e. exactly the statistics a lake format keeps
    for skipping — after a Z-order rewrite every bucket spans ≤ a
    16×16 tile of the (customer, day) plane instead of a full-range
    stripe, so point/range predicates on EITHER column prune most
    files. Production write path: `df.repartitionByRange(N, zkey)
    .sortWithinPartitions(zkey).write...` — one range shuffle; the
    key build itself is 16 codegen'd integer ops per row, no
    shuffle. Integer arithmetic end-to-end: both engines agree
    exactly."""
    o = load(spark, d, "orders")
    dims = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("cdim"),
        (
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).cast("long")
            % 256
        ).alias("tdim"),
    )
    zk = dims.withColumn(
        "zkey", _interleave_bits(F.col("cdim"), F.col("tdim"), Z_BITS)
    )
    return (
        zk.groupBy(
            F.floor(F.col("zkey") / 256).cast("long").alias("file_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cdim").alias("cust_min"),
            F.max("cdim").alias("cust_max"),
            F.min("tdim").alias("day_min"),
            F.max("tdim").alias("day_max"),
        )
        .orderBy("file_bucket")
    )
