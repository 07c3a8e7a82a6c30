"""Feature-engineering operators (round 7): one-hot encoding, the
hashing trick, smoothed target encoding, and quantile binning — the
tabular-feature preprocessing a training pipeline runs between the
warehouse and the trainer. The reference's sklearn bridge assumes
these happen driver-side in pandas; here each is a declared
distributed query.

Scale shapes: one-hot and feature-hashing are pure projections (map
side, whole-stage codegen — zero shuffle beyond the final agg);
target encoding is two tiny hash aggs joined broadcast; quantile
binning computes the edge row once (a per-group sort bounded by group
count) and broadcasts it to a stateless map over the fact table — at
100 TB every shape stays one scan + one bounded agg.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC, h56

# --------------------------------------------------------------------------
# One-hot encoding (fixed vocabulary)
# --------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_ONEHOT_COLS_SQL = ",\n".join(
    f"CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END AS seg_{s.lower()}"
    for s in _SEGMENTS
)

_ONEHOT_ORACLE = f"""
    SELECT c_custkey,
           {_ONEHOT_COLS_SQL},
           ROUND(CAST(CAST(c_acctbal AS DECIMAL(30,10)) AS DOUBLE), 2)
               AS acctbal
    FROM customer
    ORDER BY c_custkey
    LIMIT 500
"""


@query("q_feat_onehot", oracle=_ONEHOT_ORACLE)
def q_feat_onehot(spark, d):
    """One-hot encode c_mktsegment against the FIXED segment
    vocabulary (explicit value list, not inferred — the same rule as
    q_pivot_dynamic's explicit pivot values: inferred categories make
    the output schema data-dependent, which breaks both the driver
    contract and any 100 TB job whose downstream schema is pinned).
    Pure projection: wholestage-codegen map, no shuffle; the LIMIT
    rides TakeOrderedAndProject."""
    cust = load(spark, d, "customer")
    cols = [
        F.when(F.col("c_mktsegment") == s, 1)
        .otherwise(0)
        .alias(f"seg_{s.lower()}")
        for s in _SEGMENTS
    ]
    return (
        cust.select(
            "c_custkey",
            *cols,
            F.round(F.col("c_acctbal").cast(DEC).cast("double"), 2).alias(
                "acctbal"
            ),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Hashing trick (signed feature hashing)
# --------------------------------------------------------------------------

FH_B = 32  # buckets


def _fh_sql(token_expr: str) -> str:
    h = f"(('0x' || substr(md5({token_expr}), 1, 14))::BIGINT)"
    return (
        f"SELECT {h} % {FH_B} AS bucket,"
        f" CASE WHEN ({h} >> 10) & 1 = 1 THEN 1 ELSE -1 END AS sign"
    )


_FEATHASH_ORACLE = f"""
    WITH toks AS (
      {_fh_sql("'seg:' || c_mktsegment")} FROM customer
      UNION ALL
      {_fh_sql("'nat:' || CAST(c_nationkey AS VARCHAR)")} FROM customer
      UNION ALL
      {_fh_sql("'bal:' || CAST(CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS VARCHAR)")}
      FROM customer
    )
    SELECT bucket,
           COUNT(*) AS n_tokens,
           CAST(SUM(sign) AS BIGINT) AS signed_sum
    FROM toks
    GROUP BY bucket
    ORDER BY bucket
"""


@query("q_feat_hashing", oracle=_FEATHASH_ORACLE)
def q_feat_hashing(spark, d):
    """Signed feature hashing (the hashing trick): three token
    families (segment, nation, binned balance) hashed into 32 buckets
    with a ±1 sign bit drawn from the same 56-bit hash — the
    unbiased-collision construction from Weinberger et al. Output is
    the per-bucket token count and signed sum. Scale: tokens are
    generated inline (no vocabulary build, the whole point of the
    trick), so the plan is a generate + ONE partial+final agg into 32
    cells — feature extraction over 100 TB with a constant-size
    shuffle."""
    cust = load(spark, d, "customer")

    def tok(expr: str) -> F.Column:
        h = h56(expr)
        return F.struct(
            F.pmod(h, F.lit(FH_B)).alias("bucket"),
            F.when(F.shiftright(h, 10).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias("sign"),
        )

    toks = cust.select(
        F.explode(
            F.array(
                tok("concat('seg:', c_mktsegment)"),
                tok("concat('nat:', cast(c_nationkey as string))"),
                tok(
                    "concat('bal:', cast(cast(floor(c_acctbal / 1000.0d)"
                    " as bigint) as string))"
                ),
            )
        ).alias("t")
    )
    return (
        toks.groupBy(F.col("t.bucket").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("t.sign").alias("signed_sum"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Smoothed target encoding
# --------------------------------------------------------------------------

TE_SMOOTH = 10  # pseudo-count weight on the global mean

_TARGET_ORACLE = f"""
    WITH labeled AS (
      SELECT c.c_custkey, c.c_mktsegment, n.n_name,
             CASE WHEN EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT'
             ) THEN 1.0 ELSE 0.0 END AS y
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    gmean AS (
      SELECT CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE)
               / COUNT(*) AS g
      FROM labeled
    ),
    levels AS (
      SELECT 'segment' AS feature, c_mktsegment AS level,
             COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS s
      FROM labeled GROUP BY c_mktsegment
      UNION ALL
      SELECT 'nation' AS feature, n_name AS level,
             COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS s
      FROM labeled GROUP BY n_name
    )
    SELECT l.feature, l.level, l.n,
           ROUND((l.s + {TE_SMOOTH} * g.g) / (l.n + {TE_SMOOTH}), 6)
               AS encoded
    FROM levels l, gmean g
    ORDER BY l.feature, l.level
"""


@query("q_feat_target_encode", oracle=_TARGET_ORACLE)
def q_feat_target_encode(spark, d):
    """Smoothed target encoding of two categoricals (market segment,
    nation) against a binary target (customer ever placed an URGENT
    order): enc = (sum_y + m*global_mean) / (n + m), m=10 — the
    standard leakage-damped mean encoding. Label build is a
    broadcast-able semi-join; the encodings are two tiny hash aggs
    cross-joined with the single global-mean row. Sums ride the
    decimal policy so the smoothed means match bit-for-bit."""
    cust = load(spark, d, "customer")
    nation = load(spark, d, "nation")
    orders = load(spark, d, "orders")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    labeled = (
        cust.join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left")
        .select(
            "c_mktsegment",
            "n_name",
            F.when(F.col("o_custkey").isNotNull(), 1.0)
            .otherwise(0.0)
            .alias("y"),
        )
    )
    glob = labeled.agg(
        (
            F.sum(F.col("y").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("g")
    )

    def enc(key: str, feature: str):
        return labeled.groupBy(F.col(key).alias("level")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("y").cast(DEC)).cast("double").alias("s"),
        ).select(F.lit(feature).alias("feature"), "level", "n", "s")

    levels = enc("c_mktsegment", "segment").unionAll(enc("n_name", "nation"))
    return (
        levels.crossJoin(F.broadcast(glob))
        .select(
            "feature",
            "level",
            "n",
            F.round(
                (F.col("s") + TE_SMOOTH * F.col("g"))
                / (F.col("n") + TE_SMOOTH),
                6,
            ).alias("encoded"),
        )
        .orderBy("feature", "level")
    )


# --------------------------------------------------------------------------
# Quantile binning
# --------------------------------------------------------------------------

_DECILES = [i / 10.0 for i in range(1, 10)]

_EDGE_COLS_SQL = ", ".join(
    f"ROUND(quantile_cont(o_totalprice, {q}), 6) AS e{i}"
    for i, q in enumerate(_DECILES, start=1)
)
_BIN_SUM_SQL = " + ".join(
    f"CASE WHEN o.o_totalprice > e.e{i} THEN 1 ELSE 0 END"
    for i in range(1, 10)
)

_QBIN_ORACLE = f"""
    WITH e AS (SELECT {_EDGE_COLS_SQL} FROM orders),
    binned AS (
      SELECT o.o_totalprice, ({_BIN_SUM_SQL}) AS bin
      FROM orders o, e
    )
    SELECT bin, COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 6) AS lo,
           ROUND(MAX(o_totalprice), 6) AS hi,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                      AS DOUBLE), 2) AS sum_price
    FROM binned
    GROUP BY bin
    ORDER BY bin
"""


@query("q_feat_quantile_bin", oracle=_QBIN_ORACLE)
def q_feat_quantile_bin(spark, d):
    """Decile binning of order prices: exact-percentile edges
    (rounded to 6 BEFORE comparison, per the repo float policy), bin
    = number of edges strictly below the value. The edge row is a
    single global agg broadcast to a stateless map — the
    Bucketizer-style transform as a plan: one bounded sort for the
    edges, one scan to assign, one 10-cell agg. approx_percentile is
    the drop-in at 100 TB where the exact sort is too hot; the
    declared query pins the exact form the oracle can mirror."""
    orders = load(spark, d, "orders").select("o_totalprice")
    # ONE percentile aggregate evaluating all nine fractions over a
    # single sorted buffer (nine separate percentile() aggs each
    # re-buffer the whole column — measured 6.5 s -> ~1 s at sf0.1).
    edges = orders.agg(
        F.percentile(
            "o_totalprice", F.array(*[F.lit(q) for q in _DECILES])
        ).alias("es")
    ).select(
        *[
            F.round(F.col("es").getItem(i - 1), 6).alias(f"e{i}")
            for i in range(1, 10)
        ]
    )
    bin_col = sum(
        [
            F.when(F.col("o_totalprice") > F.col(f"e{i}"), 1).otherwise(0)
            for i in range(1, 10)
        ],
        start=F.lit(0),
    ).alias("bin")
    binned = orders.crossJoin(F.broadcast(edges)).select(
        "o_totalprice", bin_col
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2
            ).alias("sum_price"),
        )
        .orderBy("bin")
    )
