"""Cross-engine portability canary (VERDICT r7 item 2).

One declared query whose columns each exercise ONE portability
primitive the Spark<->DuckDB differential contract depends on, every
column an exact BIGINT. When the driver's oracle environment drifts
(DuckDB version bump, value-canonicalization change), the canary's
failing COLUMN names the broken mechanism in a single driver row —
round 7 needed a forensic session to trace 10 hash-fails to uncast
HUGEINT sums; this query would have said so outright.

Primitives covered (one column each, see q_dq_engine_canary):
  md5-head 56-bit hash cast        (CLAUDE.md portable-hash idiom)
  SUM(integer) type parity          (HUGEINT vs long — the r7 red)
  round-to-6 of an exact double     (HALF_UP boundary behavior)
  -0.0 normalization via ``+ 0.0``  (q_sample_weighted's r7 bug)
  floor-before-integer-cast         (float vs integer division)
  libm ln at micro quantization     (Java Math.log vs C std::log)
  date_trunc('month') epoch         (DATE vs TIMESTAMP return type)
  ISO day-of-week remap             (Sunday-base vs Monday-base)
  decimal(30,10) exact-sum policy   (the float-sum contract)
  descending ``sequence`` guard     (hi < lo yields descending)
  exact-.5 round direction          (half-away/HALF_UP, not banker's)
  tie-adjacent floor quantization   (the r8 integer-ppm escape hatch)
  double-literal parse parity       (strtod + folded-constant policy,
                                     the sketches.HLL_NUMER mechanism)
  bitshift/mask extraction          (the r9 bootstrap byte-draw
                                     mechanism: >> and & on bigint)
  scale-6 multiply-round tie        (the r8-adjudicated DuckDB
                                     x*1e6-lands-on-.5 mechanism)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC, h56, sql_h56

_CANARY_ORACLE = f"""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(n_nationkey) AS BIGINT) AS sum_int,
      {sql_h56("'canary:' || CAST(MIN(n_nationkey) AS VARCHAR)")}
          AS md5_head,
      CAST(round(ROUND(2.0 / 3.0, 6) * 1000000.0) AS BIGINT)
          AS round6_micro,
      CAST(CASE WHEN CAST(ROUND(-0.000000001, 6) + 0.0 AS VARCHAR)
                     LIKE '-%'
                THEN 1 ELSE 0 END AS BIGINT) AS negzero_norm,
      CAST(floor(CAST(7 AS DOUBLE) / 2) AS BIGINT) AS intdiv_floor,
      CAST(floor(ln(2.0) * 1000000.0) AS BIGINT) AS ln_micro,
      CAST(epoch(CAST(date_trunc('month',
                                 TIMESTAMP '2024-03-15 12:34:56')
                      AS TIMESTAMP)) AS BIGINT) AS trunc_month_epoch,
      CAST(isodow(DATE '2024-03-15') AS BIGINT) AS iso_dow,
      CAST(round(CAST(SUM(CAST(0.1 AS DECIMAL(30,10))) AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS decsum_micro,
      CAST(len(generate_series(3, 1)) AS BIGINT) AS seq_desc_len,
      CAST(round(2.5) AS BIGINT) AS round_half_dir,
      CAST(floor(CAST(5e-7 AS DOUBLE) * 1000000.0) AS BIGINT)
          AS tie_floor_micro,
      CAST(floor(CAST('0.7213475204444817' AS DOUBLE)
                 * 1000000000000000000.0) AS BIGINT) AS dbl_literal_atto,
      CAST((1234605616436508552 >> 16) & 255 AS BIGINT) AS bitshift_mask,
      CAST(round(round(CAST(0.1234565 AS DOUBLE), 6) * 1000000.0)
           AS BIGINT) AS round_tie_micro
    FROM nation
"""


@query("q_dq_engine_canary", oracle=_CANARY_ORACLE)
def q_dq_engine_canary(spark, d):
    """Portability canary: each BIGINT column isolates one cross-engine
    primitive, so a driver-environment drift shows up as a named
    column, not a bare hash mismatch. Constant-size output (one row
    from the 25-row nation table) — the cost is one metadata-scale
    agg, the value is one-row forensics for every future round.

    Notes pinned by column:
      sum_int — DuckDB SUM(INTEGER) is HUGEINT; the r7 driver hasher
        distinguishes it from long, hence the CAST on the oracle side.
      negzero_norm — ROUND(-1e-9, 6) is -0.0 in DuckDB but +0.0 via
        Spark's BigDecimal path; ``+ 0.0`` is the documented
        normalization, probed via the string repr's sign (ANSI mode
        forbids the 1/x sign probe): 0 on BOTH engines iff the
        normalization keeps working.
      seq_desc_len — DuckDB generate_series(3, 1) is EMPTY (len 0)
        while Spark sequence(3, 1) yields [3, 2, 1] (len 3), so the
        Spark side pins the literal 0 after guarding: the column
        verifies the ORACLE side's behavior stays put and documents
        the trap (CLAUDE.md: sequence with hi < lo descends).
    """
    nation = load(spark, d, "nation")
    ln2_micro = F.floor(F.log(F.lit(2.0)) * 1000000.0).cast("long")
    agg = nation.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_nationkey").alias("sum_int"),
        F.min("n_nationkey").alias("_mn"),
        F.sum(F.lit(0.1).cast(DEC)).alias("_decsum"),
    )
    return agg.select(
        "n_rows",
        "sum_int",
        h56("concat('canary:', cast(_mn as string))").alias("md5_head"),
        F.round(F.round(F.lit(2.0) / 3.0, 6) * 1000000.0, 0)
        .cast("long")
        .alias("round6_micro"),
        F.when(
            (F.round(F.lit(-0.000000001), 6) + 0.0)
            .cast("string")
            .startswith("-"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("negzero_norm"),
        F.floor(F.lit(7).cast("double") / 2).cast("long")
        .alias("intdiv_floor"),
        ln2_micro.alias("ln_micro"),
        F.date_trunc("month", F.lit("2024-03-15 12:34:56").cast("timestamp"))
        .cast("long")
        .alias("trunc_month_epoch"),
        (((F.dayofweek(F.lit("2024-03-15").cast("date")) + 5) % 7) + 1)
        .cast("long")
        .alias("iso_dow"),
        F.round(F.col("_decsum").cast("double") * 1000000.0, 0)
        .cast("long")
        .alias("decsum_micro"),
        F.lit(0).cast("long").alias("seq_desc_len"),
        # exact representable .5 must round AWAY (3), not banker's (2):
        # if either engine moves to round-half-even this column reds
        F.round(F.lit(2.5), 0).cast("long").alias("round_half_dir"),
        # the r8 escape hatch: floor(x*1e6) of a tie-adjacent literal is
        # one identical IEEE multiply + floor on both engines — the
        # ROUND(raw-double) ulp lottery (CLAUDE.md r8) cannot reach it
        F.floor(F.lit(5e-7) * 1000000.0).cast("long")
        .alias("tie_floor_micro"),
        # strtod parity + folded-one-double-literal policy (HLL_NUMER):
        # both engines must parse the 17-digit literal to the same IEEE
        # double and keep the big multiply in double, never DECIMAL
        F.floor(
            F.lit("0.7213475204444817").cast("double")
            * 1000000000000000000.0
        )
        .cast("long")
        .alias("dbl_literal_atto"),
        # bitwise extraction parity (the r9 bootstrap byte-draw
        # mechanism): shiftright/>> must be arithmetic on the same
        # two's-complement bigint and & must mask identically
        F.expr("shiftright(1234605616436508552L, 16) & 255")
        .cast("long")
        .alias("bitshift_mask"),
        # the r8-adjudicated multiply-round tie, probed head-on: the
        # double nearest 0.1234565 sits BELOW the .5 boundary, yet
        # BOTH engines round it UP today — DuckDB because its
        # multiply-based round lands the product exactly on 123456.5
        # and breaks half-away, Spark because BigDecimal.valueOf goes
        # through the SHORTEST string repr ("0.1234565"), not the
        # exact binary expansion. Either implementation moving (exact
        # BigDecimal, half-even product) flips this column to 123456.
        F.round(F.round(F.lit(0.1234565), 6) * 1000000.0, 0)
        .cast("long")
        .alias("round_tie_micro"),
    )
