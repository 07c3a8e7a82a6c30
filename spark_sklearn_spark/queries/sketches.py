"""Portable probabilistic sketches (round 7): count-min, Bloom filter,
HyperLogLog — each built from the repo's 56-bit md5-head hash so the
SAME sketch is computable in Spark and DuckDB and the queries are
*declared* (hash-checked), unlike typical approx-sketch operators that
can only get a rows>0 check.

Parity note: the reference surface has no sketch operators
(spark-sklearn is an sklearn bridge); these extend the LLM-pipeline
layer (SURVEY §2B) — cardinality / membership / frequency estimation
are the workhorses of 100 TB corpus profiling, where exact
count-distinct of n-grams or URLs is itself a massive shuffle.

Scale shapes:
- count-min BUILD is a map + one hash agg into D·W cells (≤4096 rows
  out regardless of input size — a mergeable partial agg, exactly how
  a 1000-executor build behaves); the ESTIMATE side broadcasts the
  finished counter table.
- Bloom BUILD collapses the member set to ≤m distinct bit positions
  (broadcastable); PROBE is a broadcast join + count==k test — no
  shuffle of the probe side beyond its own aggregation.
- HLL is ONE hash agg to (group, bucket) registers (m=256 per group)
  then a per-group rollup: the sketch merge is max(), so partial aggs
  combine map-side — the canonical distributed distinct-estimate.
  Register sums use the integer trick S = Σ 2^(49-M) as BIGINT so the
  harmonic mean is exact on both engines (no float-order noise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import h56, sql_h56

# Salted wrappers over the central _helpers.h56/sql_h56 (the one
# proven cross-engine md5-head form): the salt prefix picks the
# hash-family member.


def _h56(salt: str, col: str) -> F.Column:
    return h56(f"concat('{salt}', {col})")


def _sql_h56(salt: str, expr: str) -> str:
    return sql_h56(f"'{salt}' || {expr}")


# --------------------------------------------------------------------------
# Count-min sketch: frequency estimation for heavy hitters
# --------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row

_CMS_ORACLE = f"""
    WITH src AS (
      SELECT CAST(l_partkey AS VARCHAR) AS key, l_partkey FROM lineitem
    ),
    rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
    cells AS (
      SELECT r, {_sql_h56("cms", "r || ':' || key")} % {CMS_W} AS idx,
             COUNT(*) AS cnt
      FROM src, rows_
      GROUP BY r, idx
    ),
    truth AS (
      SELECT l_partkey, CAST(l_partkey AS VARCHAR) AS key,
             COUNT(*) AS true_cnt
      FROM lineitem GROUP BY l_partkey
    ),
    probe AS (
      SELECT t.l_partkey, t.true_cnt, MIN(c.cnt) AS est_cnt
      FROM truth t, rows_ r
      JOIN cells c
        ON c.r = r.r
       AND c.idx = {_sql_h56("cms", "r.r || ':' || t.key")} % {CMS_W}
      GROUP BY t.l_partkey, t.true_cnt
    )
    SELECT l_partkey, true_cnt, est_cnt,
           est_cnt - true_cnt AS overcount
    FROM probe
    ORDER BY true_cnt DESC, l_partkey
    LIMIT 20
"""


@query("q_sketch_countmin", oracle=_CMS_ORACLE)
def q_sketch_countmin(spark, d):
    """Count-min sketch over lineitem part frequencies: D=4 hash rows
    × W=1024 counters, estimate = min over rows, reported against the
    exact count for the top-20 parts (overcount ≥ 0 always — CMS
    never underestimates). The build is one partial+final hash agg
    into ≤4096 cells — at 100 TB each executor emits at most 4096
    partial counters per task, so the shuffle is O(cells), not
    O(rows); the probe joins the finished (broadcast-sized) counter
    table. Same-named CTE mirror in DuckDB; md5-head hashing keeps
    every cell index identical across engines."""
    li = load(spark, d, "lineitem").select(
        "l_partkey", F.col("l_partkey").cast("string").alias("key")
    )
    truth = li.groupBy("l_partkey", "key").agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    # r17: the cell index h56('cms' || r || ':' || key) depends only on
    # (r, key), so the build rides the SAME per-key count agg as the
    # truth side and sums per-key counts into cells — identical cell
    # totals (Σ per-key counts = row count per cell) with 4 md5s per
    # DISTINCT part instead of 4 per lineitem ROW (≈30× fewer at
    # sf0.1), and the ×4 explode runs over the key relation, not the
    # fact stream. Still a mergeable ≤4096-cell agg at any scale.
    rows = [
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(_h56("cms", f"'{r}:' || key"), F.lit(CMS_W)).alias("idx"),
        )
        for r in range(CMS_D)
    ]
    cells = (
        truth.select(
            "true_cnt", F.explode(F.array(*rows)).alias("c")
        )
        .groupBy(F.col("c.r").alias("r"), F.col("c.idx").alias("idx"))
        .agg(F.sum("true_cnt").alias("cnt"))
    )
    probe = truth.select(
        "l_partkey",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            _h56("cms", f"'{r}:' || key"), F.lit(CMS_W)
                        ).alias("idx"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("l_partkey", "true_cnt", F.col("p.r").alias("r"), F.col("p.idx").alias("idx"))
    est = (
        probe.join(F.broadcast(cells), ["r", "idx"])
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return (
        est.withColumn("overcount", F.col("est_cnt") - F.col("true_cnt"))
        .orderBy(F.desc("true_cnt"), "l_partkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Bloom filter: membership with counted false positives
# --------------------------------------------------------------------------

BF_M = 4096  # bits
BF_K = 3  # hash functions

_BLOOM_ORACLE = f"""
    WITH members AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    ks AS (SELECT unnest([0, 1, 2]) AS k),
    bits AS (
      SELECT DISTINCT
        {_sql_h56("bf", "k || ':' || CAST(o_custkey AS VARCHAR)")} % {BF_M}
            AS pos
      FROM members, ks
    ),
    probe AS (
      SELECT c.c_custkey, c.c_nationkey,
        {_sql_h56("bf", "k || ':' || CAST(c_custkey AS VARCHAR)")} % {BF_M}
            AS pos
      FROM customer c, ks
    ),
    hits AS (
      SELECT p.c_custkey, p.c_nationkey,
             COUNT(b.pos) AS n_hit
      FROM probe p LEFT JOIN bits b ON p.pos = b.pos
      GROUP BY p.c_custkey, p.c_nationkey
    ),
    flagged AS (
      SELECT h.c_custkey, h.c_nationkey,
             CASE WHEN h.n_hit = {BF_K} THEN 1 ELSE 0 END AS maybe,
             CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS member
      FROM hits h LEFT JOIN members m ON h.c_custkey = m.o_custkey
    )
    SELECT c_nationkey,
           COUNT(*) AS n_probed,
           CAST(SUM(member) AS BIGINT) AS n_member,
           CAST(SUM(maybe) AS BIGINT) AS n_maybe,
           CAST(SUM(CASE WHEN maybe = 1 AND member = 0
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_pos
    FROM flagged
    GROUP BY c_nationkey
    ORDER BY c_nationkey
"""


@query("q_sketch_bloom", oracle=_BLOOM_ORACLE)
def q_sketch_bloom(spark, d):
    """Bloom-filter membership: build m=4096/k=3 bits over customers
    with an URGENT order, probe EVERY customer, and report per-nation
    probe/member/maybe/false-positive counts (no false negatives by
    construction — the oracle would catch one as n_maybe < n_member).
    The bit set is ≤4096 distinct positions regardless of member
    count → broadcast to the probe side; the probe is 3 rows per key
    aggregated back to count==k, i.e. one narrow pass over the probe
    table. This is the scale-shape of Spark's own bloom-join pushdown,
    spelled out as a declared operator."""
    orders = load(spark, d, "orders")
    cust = load(spark, d, "customer").select("c_custkey", "c_nationkey")
    members = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    ks = list(range(BF_K))
    bits = (
        members.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            _h56("bf", f"'{k}:' || cast(o_custkey as string)"),
                            F.lit(BF_M),
                        )
                        for k in ks
                    ]
                )
            ).alias("pos")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe = cust.select(
        "c_custkey",
        "c_nationkey",
        F.explode(
            F.array(
                *[
                    F.pmod(
                        _h56("bf", f"'{k}:' || cast(c_custkey as string)"),
                        F.lit(BF_M),
                    )
                    for k in ks
                ]
            )
        ).alias("pos"),
    )
    hits = (
        probe.join(F.broadcast(bits), "pos", "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    )
    flagged = hits.join(
        F.broadcast(members), hits.c_custkey == members.o_custkey, "left"
    ).select(
        "c_nationkey",
        F.when(F.col("n_hit") == BF_K, 1).otherwise(0).alias("maybe"),
        F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("member"),
    )
    return (
        flagged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum("member").alias("n_member"),
            F.sum("maybe").alias("n_maybe"),
            F.sum(
                F.when((F.col("maybe") == 1) & (F.col("member") == 0), 1)
                .otherwise(0)
            ).alias("n_false_pos"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# HyperLogLog: grouped cardinality estimation
# --------------------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 buckets
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7182725932495458  # 0.7213 / (1 + 1.079/256)
# alpha * m^2 * 2^49, folded to ONE double literal used verbatim on
# both engines (a DuckDB decimal literal would overflow in the
# unfolded product, and folding guarantees identical rounding).
HLL_NUMER = 2.6499581405668102e19
_W48 = (1 << 48) - 1

_HLL_ORACLE = f"""
    WITH hashed AS (
      SELECT event_type,
             {_sql_h56("hll", "CAST(user_id AS VARCHAR)")} AS h
      FROM events
    ),
    parts AS (
      SELECT event_type, h >> 48 AS bucket, h & {_W48} AS w
      FROM hashed
    ),
    regs AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN w = 0 THEN 49
                      ELSE 49 - length(bin(w)) END) AS m
      FROM parts
      GROUP BY event_type, bucket
    ),
    per_group AS (
      SELECT event_type,
             COUNT(*) AS n_buckets,
             SUM(1::BIGINT << (49 - m)) AS s_present
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             {HLL_M} - n_buckets AS v,
             {HLL_NUMER!r}
               / CAST(s_present
                      + ({HLL_M} - n_buckets) * {1 << 49} AS DOUBLE)
                 AS e_raw
      FROM per_group
    ),
    corrected AS (
      SELECT event_type,
             CASE WHEN e_raw <= {2.5 * HLL_M} AND v > 0
                  THEN {HLL_M} * ln({HLL_M} / CAST(v AS DOUBLE))
                  ELSE e_raw END AS e
      FROM est
    ),
    truth AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS true_distinct
      FROM events GROUP BY event_type
    )
    SELECT t.event_type, t.true_distinct,
           ROUND(c.e, 3) AS hll_est,
           ROUND((c.e - t.true_distinct) / t.true_distinct, 6) AS rel_err
    FROM truth t JOIN corrected c ON t.event_type = c.event_type
    ORDER BY t.event_type
"""


@query("q_sketch_hll", oracle=_HLL_ORACLE)
def q_sketch_hll(spark, d):
    """HyperLogLog distinct-users per event type, p=8 (256 registers),
    against the exact COUNT(DISTINCT). Registers are max(rho) over a
    56-bit md5-head hash — bucket = top 8 bits, rho = leading-zero
    rank of the low 48 via length(bin(w)) (identical in both engines).
    The harmonic-mean denominator is summed as Σ 2^(49-M) in BIGINT —
    exact integer arithmetic, so the only floats are the final
    division and the small-range ln() correction, both rounded.
    Scale: ONE hash agg to (group, bucket) — 256 mergeable registers
    per group whatever the row count — then a 256-row rollup per
    group; this is how distributed distinct-estimates avoid the exact
    count's full shuffle of every key."""
    ev = load(spark, d, "events").select(
        "event_type", _h56("hll", "cast(user_id as string)").alias("h")
    )
    parts = ev.select(
        "event_type",
        F.shiftright("h", 48).alias("bucket"),
        F.col("h").bitwiseAND(F.lit(_W48)).alias("w"),
    )
    regs = parts.groupBy("event_type", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 49).otherwise(
                F.lit(49) - F.length(F.bin("w"))
            )
        ).alias("m")
    )
    per_group = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 49 - m)")).alias(
            "s_present"
        ),
    )
    est = per_group.select(
        "event_type",
        (F.lit(HLL_M) - F.col("n_buckets")).alias("v"),
        (
            F.lit(HLL_NUMER)
            / (
                F.col("s_present")
                + (F.lit(HLL_M) - F.col("n_buckets")) * F.lit(1 << 49)
            ).cast("double")
        ).alias("e_raw"),
    )
    corrected = est.select(
        "event_type",
        F.when(
            (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("v") > 0),
            F.lit(HLL_M) * F.log(F.lit(HLL_M) / F.col("v").cast("double")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e"),
    )
    truth = (
        load(spark, d, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("true_distinct"))
    )
    return (
        truth.join(corrected, "event_type")
        .select(
            "event_type",
            "true_distinct",
            F.round(F.col("e"), 3).alias("hll_est"),
            F.round(
                (F.col("e") - F.col("true_distinct"))
                / F.col("true_distinct"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# HLL register merge (distributed sketch union)
# --------------------------------------------------------------------------

_HLL_MERGE_ORACLE = f"""
    WITH hashed AS (
      SELECT source,
             {_sql_h56("hll", "CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ),
    parts AS (
      SELECT source, h >> 48 AS bucket, h & {_W48} AS w FROM hashed
    ),
    per_source AS (
      SELECT source, bucket,
             MAX(CASE WHEN w = 0 THEN 49
                      ELSE 49 - length(bin(w)) END) AS m
      FROM parts GROUP BY source, bucket
    ),
    merged AS (
      SELECT bucket, MAX(m) AS m FROM per_source GROUP BY bucket
    ),
    rollup_ AS (
      SELECT COUNT(*) AS n_buckets,
             SUM(1::BIGINT << (49 - m)) AS s_present
      FROM merged
    ),
    est AS (
      SELECT {HLL_M} - n_buckets AS v,
             {HLL_NUMER!r}
               / CAST(s_present
                      + ({HLL_M} - n_buckets) * {1 << 49} AS DOUBLE)
                 AS e_raw
      FROM rollup_
    ),
    sketch AS (
      SELECT CASE WHEN e_raw <= {2.5 * HLL_M} AND v > 0
                  THEN {HLL_M} * ln({HLL_M} / CAST(v AS DOUBLE))
                  ELSE e_raw END AS e
      FROM est
    ),
    truth AS (
      SELECT COUNT(DISTINCT doc_id) AS true_distinct,
             COUNT(DISTINCT source) AS n_sources
      FROM documents
    )
    SELECT t.n_sources, t.true_distinct,
           ROUND(s.e, 3) AS merged_est,
           ROUND((s.e - t.true_distinct) / t.true_distinct, 6) AS rel_err
    FROM truth t, sketch s
"""


@query("q_sketch_hll_merge", oracle=_HLL_MERGE_ORACLE)
def q_sketch_hll_merge(spark, d):
    """HLL MERGEABILITY: per-source register sets union into one
    global sketch by taking max(register) per bucket — the property
    that lets 1000 executors each sketch their shard and combine in
    a 256-row reduce instead of shuffling every key (and lets a
    warehouse store per-partition sketches and union them at query
    time). Estimates the global distinct doc count from per-source
    sketches; the oracle repeats the two-level merge exactly."""
    docs = load(spark, d, "documents").select(
        "source", _h56("hll", "cast(doc_id as string)").alias("h")
    )
    parts = docs.select(
        "source",
        F.shiftright("h", 48).alias("bucket"),
        F.col("h").bitwiseAND(F.lit(_W48)).alias("w"),
    )
    per_source = parts.groupBy("source", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 49).otherwise(
                F.lit(49) - F.length(F.bin("w"))
            )
        ).alias("m")
    )
    merged = per_source.groupBy("bucket").agg(F.max("m").alias("m"))
    rollup = merged.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 49 - m)")).alias(
            "s_present"
        ),
    )
    est = rollup.select(
        (F.lit(HLL_M) - F.col("n_buckets")).alias("v"),
        (
            F.lit(HLL_NUMER)
            / (
                F.col("s_present")
                + (F.lit(HLL_M) - F.col("n_buckets")) * F.lit(1 << 49)
            ).cast("double")
        ).alias("e_raw"),
    )
    sketch = est.select(
        F.when(
            (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("v") > 0),
            F.lit(HLL_M) * F.log(F.lit(HLL_M) / F.col("v").cast("double")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e")
    )
    truth = load(spark, d, "documents").agg(
        F.countDistinct("doc_id").alias("true_distinct"),
        F.countDistinct("source").alias("n_sources"),
    )
    return truth.crossJoin(F.broadcast(sketch)).select(
        "n_sources",
        "true_distinct",
        F.round(F.col("e"), 3).alias("merged_est"),
        F.round(
            (F.col("e") - F.col("true_distinct"))
            / F.col("true_distinct"),
            6,
        ).alias("rel_err"),
    )
