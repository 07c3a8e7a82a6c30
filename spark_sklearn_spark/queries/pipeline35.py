"""Round-15 batch: multiple-testing control, unseen-mass estimation,
and Markov removal-effect attribution.

Three operators:

- q_ml_fdr_bh: Benjamini–Hochberg FDR over the per-event-type
  hour-of-day uniformity test family. Each type gets a 2-df
  chi-square goodness-of-fit across three equal 8-hour buckets,
  whose survival function is EXACTLY exp(-chi2/2) — the one
  chi-square tail with a closed form on the proven libm surface
  (exp only; no erf/gamma). BH then ranks the m p-values and
  rejects ranks ≤ k* = max{i : p_i ≤ i·alpha/m}, with the standard
  step-up adjusted p (running min of m·p_j/j from the bottom).
  The chi-square numerator Σ(3·O_b − n)² is exact BIGINT (missing
  buckets contribute n² each); everything past the per-type
  collapse is an m-row (|event_types|) relation.
- q_text_good_turing: Good–Turing frequency spectrum per language —
  count-of-counts N_r for r ≤ 5, the Turing estimate
  r* = (r+1)·N_{r+1}/N_r (exact integer micro), and the unseen
  mass P_0 = N_1/N (exact integer ppm): the "how much vocabulary
  have we not seen yet" companion to q_text_heaps_law's growth
  curve and q_text_hapax's N_1 share. Two stacked combinable hash
  aggs, then joins on the ≤|distinct-frequency| spectrum relation.
- q_behavior_removal_effect: Markov removal-effect attribution on
  q_behavior_markov's transition chain with absorbing conversion.
  Channels are the non-purchase event types; a transition to a
  purchase event absorbs into 'conv', end-of-stream into 'drop'.
  For each scenario (baseline + one removed channel) the start
  vector walks K=6 unrolled power steps over the ppm-integer
  transition matrix — every step is Σ v·t div 1e6 on exact BIGINTs,
  so both engines floor identically — and the conversion inflows
  accumulate. removal_effect = (conv_base − conv_removed)/conv_base
  and attribution = each effect's share of the total (the
  Anderl et al. 2016 "Markov graph" attribution output).

Reference parity: the public repo (databricks/spark-sklearn 0.3.0)
has no relational engine — these extend the SURVEY §2B surface,
cited to the public statistics they implement (Benjamini & Hochberg
1995 step-up FDR; Good 1953 frequency estimation; Anderl, Becker,
von Wangenheim & Schumann 2016 Markov attribution).

Portability: the pipeline32/34 posture — exact BIGINT moments,
exp-only floats, floor-ppm/micro/q9 integer outputs, BIGINT casts
on every aggregate (DuckDB SUM→HUGEINT), truncating integer
division via the native Spark `div` / DuckDB `//` pair, and the
monotone step arithmetic keeping conv_removed ≤ conv_base exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load, register_views

# --------------------------------------------------------------------------
# Benjamini–Hochberg FDR over the hour-uniformity test family
# --------------------------------------------------------------------------
#
# ONE SQL text runs verbatim on both engines: hour(), exp(), floor(),
# least(), ROW_NUMBER/MIN/MAX windows are all shared-surface. Past
# the per-type collapse everything is STACKED GLOBAL WINDOWS over the
# m-row relation (m = number of event types) — count, rank, step-up
# running min, and the k* rejection threshold — deliberately no
# m/k* self-joins: each extra CTE consumer re-anchors the corpus
# scan (the lineage trap; the join form measured 2.4 s vs 1.1 s at
# sf0.1). alpha = 0.05 enters as the exact double 20.0e0 on the
# other side of the inequality (p·20·m ≤ i), so no inexact constant
# is multiplied differently across engines.

_FDR_BH_SQL = """
    WITH bc AS (
      SELECT event_type,
             CASE WHEN hour(ts) < 8 THEN 0
                  WHEN hour(ts) < 16 THEN 1 ELSE 2 END AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events
      GROUP BY event_type,
               CASE WHEN hour(ts) < 8 THEN 0
                    WHEN hour(ts) < 16 THEN 1 ELSE 2 END
    ),
    tot AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM bc GROUP BY event_type
    ),
    scored AS (
      SELECT b.event_type,
             t.n,
             CAST(SUM((3 * b.c - t.n) * (3 * b.c - t.n)) AS BIGINT)
                 + (3 - t.nb) * t.n * t.n AS chi2_num
      FROM bc b JOIN tot t ON t.event_type = b.event_type
      GROUP BY b.event_type, t.n, t.nb
    ),
    pvals AS (
      SELECT event_type, n,
             CAST(chi2_num AS DOUBLE) / (3 * n) AS chi2,
             exp(-(CAST(chi2_num AS DOUBLE) / (3 * n)) / 2.0e0) AS p
      FROM scored
    ),
    ranked AS (
      SELECT event_type, n, chi2, p,
             CAST(COUNT(*) OVER () AS BIGINT) AS m,
             CAST(ROW_NUMBER() OVER (ORDER BY p, event_type)
                  AS BIGINT) AS i
      FROM pvals
    ),
    adjusted AS (
      SELECT event_type, n, chi2, p, i,
             CASE WHEN p * 20.0e0 * m <= CAST(i AS DOUBLE)
                  THEN i ELSE CAST(0 AS BIGINT) END AS hit,
             MIN(m * p / CAST(i AS DOUBLE))
                 OVER (ORDER BY i DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS p_adj
      FROM ranked
    )
    SELECT event_type,
           n AS n_events,
           CAST(floor(chi2 * 1000000) AS BIGINT) AS chi2_micro,
           CAST(floor(p * 1000000000) AS BIGINT) AS p_q9,
           i AS rank_p,
           CAST(CASE WHEN i <= MAX(hit) OVER () THEN 1 ELSE 0 END
                AS BIGINT) AS rejected,
           CAST(floor(least(1.0e0, p_adj) * 1000000000) AS BIGINT)
               AS p_adj_q9
    FROM adjusted
    ORDER BY i
"""


@query("q_ml_fdr_bh", oracle=_FDR_BH_SQL)
def q_ml_fdr_bh(spark, d):
    """Benjamini–Hochberg step-up FDR over the per-event-type
    hour-of-day uniformity family (module comment): one combinable
    (type, 8h-bucket) count collapse does the corpus-sized work
    map-side; the test statistics, ranks, k* threshold and adjusted
    p-values are stacked global windows on the m-row type relation
    (no joins — each join consumer would re-anchor the scan)."""
    register_views(spark, d, ["events"])
    return spark.sql(_FDR_BH_SQL)


# --------------------------------------------------------------------------
# Good–Turing frequency spectrum and unseen mass
# --------------------------------------------------------------------------
#
# All-integer: N_r, N_{r+1}, N, N_1 are counts; the Turing estimate
# r* = (r+1)·N_{r+1}/N_r and the unseen mass N_1/N are exact integer
# micro/ppm divisions ((r+1)·N_{r+1}·1e6 < 2^63 while N_{r+1} < 1.5e12).
# The spectrum join is (lang, r)→(lang, r+1) on the count-of-counts
# relation — bounded by the number of DISTINCT frequencies (O(√N)),
# never the vocabulary.

_GOOD_TURING_ORACLE = """
    WITH words AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    counts AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM words GROUP BY lang, w
    ),
    spectrum AS (
      SELECT lang, c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
      FROM counts GROUP BY lang, c
    ),
    tot AS (
      SELECT lang,
             CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
                 AS n1
      FROM spectrum GROUP BY lang
    )
    SELECT s.lang, s.r, s.n_r,
           COALESCE(nx.n_r, 0) AS n_r_next,
           (s.r + 1) * COALESCE(nx.n_r, 0) * 1000000 // s.n_r
               AS r_star_micro,
           t.n1 * 1000000 // t.n_tokens AS p0_ppm
    FROM spectrum s
    LEFT JOIN spectrum nx ON nx.lang = s.lang AND nx.r = s.r + 1
    JOIN tot t ON t.lang = s.lang
    WHERE s.r <= 5
    ORDER BY s.lang, s.r
"""


@query("q_text_good_turing", oracle=_GOOD_TURING_ORACLE)
def q_text_good_turing(spark, d):
    """Good–Turing spectrum per language (module comment): N_r for
    r ≤ 5, the Turing-smoothed r* and the unseen mass P_0 = N_1/N —
    two stacked combinable hash aggs ((lang,word) then (lang,count)),
    then a self-join on the distinct-frequency spectrum relation;
    exact integer micro/ppm outputs."""
    docs = load(spark, d, "documents")
    words = docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
    counts = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    spectrum = counts.groupBy("lang", F.col("c").alias("r")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    tot = spectrum.groupBy("lang").agg(
        F.sum(F.expr("r * n_r")).alias("n_tokens"),
        F.sum(F.expr("CASE WHEN r = 1 THEN n_r ELSE 0 END")).alias("n1"),
    )
    nxt = spectrum.selectExpr(
        "lang", "r - 1 AS r", "n_r AS n_r_next_raw"
    )
    return (
        spectrum.filter(F.col("r") <= 5)
        .join(nxt, ["lang", "r"], "left")
        .join(tot, "lang")
        .selectExpr(
            "lang",
            "r",
            "n_r",
            "COALESCE(n_r_next_raw, 0L) AS n_r_next",
            "(r + 1) * COALESCE(n_r_next_raw, 0L) * 1000000L div n_r"
            " AS r_star_micro",
            "n1 * 1000000L div n_tokens AS p0_ppm",
        )
        .orderBy("lang", "r")
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution with absorbing conversion
# --------------------------------------------------------------------------
#
# The transition construction mirrors q_behavior_markov's pinned
# (ts, event_id) lead-ordering; the matrix is ppm-integer
# (c·1e6 div rowsum), the start vector q9-integer, and every power
# step is CAST(SUM(v·t) AS BIGINT) div 1e6 — one floor per cell,
# identical on both engines (v ≤ 1e9, t ≤ 1e6, ≤|channels| terms:
# the sum stays under 2^63 by 3 orders). Removal keeps the FULL
# start denominator (journeys touching the removed channel are
# lost, not renormalized — the defining property of the removal
# effect), and step monotonicity (subset of sources, identical
# matrix, floor is monotone) guarantees conv_removed ≤ conv_base
# EXACTLY, not just in expectation — the invariant the tests pin.

_REMOVAL_STEPS = 6

# Absorbing-state labels reserved INSIDE the event_type namespace.
# A real event type with one of these names would silently merge
# into the absorbing state identically on BOTH engines — consistent
# but wrong attribution with no red anywhere (ADVICE r15 item 2) —
# so the driver-side walk refuses loudly instead: the declared Spark
# side errors before the oracle's silent merge can hash-match it.
_REMOVAL_SENTINELS = frozenset({"conv", "drop", "__base__"})


def _removal_sql(divop: str) -> str:

    steps = []
    for k in range(1, _REMOVAL_STEPS + 1):
        steps.append(f"""v{k} AS (
          SELECT v.rm, t.dst AS state,
                 CAST(SUM(v.m * t.p_ppm) AS BIGINT) {divop} 1000000
                     AS m
          FROM v{k - 1} v JOIN t ON t.src = v.state
          WHERE t.dst <> 'conv' AND t.dst <> 'drop'
            AND t.dst <> v.rm
          GROUP BY v.rm, t.dst
        )""")
        steps.append(f"""c{k} AS (
          SELECT v.rm,
                 CAST(SUM(v.m * t.p_ppm) AS BIGINT) {divop} 1000000
                     AS m
          FROM v{k - 1} v JOIN t ON t.src = v.state
          WHERE t.dst = 'conv'
          GROUP BY v.rm
        )""")
    inflows = " UNION ALL ".join(
        f"SELECT rm, m FROM c{k}" for k in range(1, _REMOVAL_STEPS + 1)
    )
    return f"""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT src,
             CASE WHEN nxt IS NULL THEN 'drop'
                  WHEN nxt = 'purchase' THEN 'conv'
                  ELSE nxt END AS dst,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE src <> 'purchase'
      GROUP BY src, CASE WHEN nxt IS NULL THEN 'drop'
                         WHEN nxt = 'purchase' THEN 'conv'
                         ELSE nxt END
    ),
    rowsum AS (
      SELECT src, CAST(SUM(c) AS BIGINT) AS s FROM trans GROUP BY src
    ),
    t AS (
      SELECT tr.src, tr.dst, tr.c * 1000000 {divop} r.s AS p_ppm
      FROM trans tr JOIN rowsum r ON r.src = tr.src
    ),
    firsts AS (
      SELECT event_type AS src,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    starts AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS k
      FROM firsts WHERE rn = 1 AND src <> 'purchase'
      GROUP BY src
    ),
    s_tot AS (SELECT CAST(SUM(k) AS BIGINT) AS s FROM starts),
    scen AS (
      SELECT DISTINCT src AS rm FROM trans
      UNION ALL SELECT '__base__' AS rm
    ),
    v0 AS (
      SELECT sc.rm, st.src AS state,
             st.k * 1000000000 {divop} tt.s AS m
      FROM scen sc
      JOIN starts st ON st.src <> sc.rm
      CROSS JOIN s_tot tt
    ),
    {", ".join(steps)},
    conv AS (
      SELECT rm, CAST(SUM(m) AS BIGINT) AS cm
      FROM ({inflows}) u GROUP BY rm
    ),
    base AS (
      SELECT COALESCE((SELECT cm FROM conv WHERE rm = '__base__'), 0)
          AS cm
    ),
    eff AS (
      SELECT sc.rm AS channel, b.cm AS conv_base_q9,
             COALESCE(cv.cm, 0) AS conv_removed_q9,
             b.cm - COALESCE(cv.cm, 0) AS e
      FROM scen sc
      LEFT JOIN conv cv ON cv.rm = sc.rm
      CROSS JOIN base b
      WHERE sc.rm <> '__base__'
    ),
    e_tot AS (SELECT CAST(SUM(e) AS BIGINT) AS te FROM eff)
    SELECT eff.channel, eff.conv_base_q9, eff.conv_removed_q9,
           eff.e * 1000000 {divop} NULLIF(eff.conv_base_q9, 0)
               AS removal_effect_ppm,
           eff.e * 1000000 {divop} NULLIF(et.te, 0)
               AS attribution_ppm
    FROM eff CROSS JOIN e_tot et
    ORDER BY eff.channel
    """


@query("q_behavior_removal_effect", oracle=_removal_sql("//"))
def q_behavior_removal_effect(spark, d):
    """Markov removal-effect attribution (module comment). ONE
    corpus pass — a single user-partitioned window projection
    (lead + row_number share the window spec) into a combinable
    (src, nxt, is_first) count agg — then a BOUNDED collect
    (≤ |types|·(|types|+2) cells) and the exact-integer walk runs
    driver-side: the unrolled-CTE twin re-anchored the events scan
    through all 12 step consumers (10.4 s at sf0.1 vs 1.3 s — the
    WITH-RECURSIVE lineage trap in CTE clothing; bounded collects
    are the sanctioned escape, q_ml_kcenter_init precedent). Every
    walk operation is nonneg-integer multiply/sum/truncdiv, so the
    driver replay and the oracle's SQL walk agree bit-for-bit.

    Degenerate-data agreement (ADVICE r15): the oracle's base CTE is
    a scalar-subquery COALESCE so a corpus with NO conversions yields
    one row per channel with conv_base_q9 = 0 and NULL ratios on
    BOTH engines (previously the empty base CTE zeroed the oracle's
    row set while the walk still emitted channels); and the walk
    REFUSES (ValueError) if a real event type collides with the
    reserved 'conv'/'drop'/'__base__' labels — see _removal_walk."""
    ev = load(spark, d, "events")
    cells = (
        ev.selectExpr(
            "event_type AS src",
            "lead(event_type) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) AS nxt",
            "CASE WHEN row_number() OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END"
            " AS is_first",
        )
        .filter(F.col("src") != "purchase")
        .groupBy("src", "nxt", "is_first")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: |types| × (|types|+2) × 2 cells
    )
    return spark.createDataFrame(
        _removal_walk(cells),
        schema="channel string, conv_base_q9 long, conv_removed_q9"
        " long, removal_effect_ppm long, attribution_ppm long",
    ).orderBy("channel")


def _removal_walk(cells) -> list[tuple]:
    """The exact-integer removal-effect walk over the collected
    (src, nxt, is_first, n) transition cells — module-level so the
    sentinel guard is unit-testable without fixture data. Raises
    ValueError if a REAL event type collides with a reserved
    absorbing-state label (see _REMOVAL_SENTINELS)."""
    observed = {row.src for row in cells} | {
        row.nxt for row in cells if row.nxt is not None
    }
    clash = observed & _REMOVAL_SENTINELS
    if clash:
        raise ValueError(
            "event_type namespace collides with reserved removal-"
            f"effect sentinel label(s) {sorted(clash)}; both engines "
            "would silently merge these into the absorbing state"
        )
    trans: dict[tuple[str, str], int] = {}
    starts: dict[str, int] = {}
    for row in cells:
        dst = (
            "drop"
            if row.nxt is None
            else ("conv" if row.nxt == "purchase" else row.nxt)
        )
        trans[(row.src, dst)] = trans.get((row.src, dst), 0) + row.n
        if row.is_first == 1:
            starts[row.src] = starts.get(row.src, 0) + row.n
    rowsum: dict[str, int] = {}
    for (src, _), c in trans.items():
        rowsum[src] = rowsum.get(src, 0) + c
    t_ppm = {
        (src, dst): c * 1000000 // rowsum[src]
        for (src, dst), c in trans.items()
    }
    chans = sorted(rowsum)
    s_tot = sum(starts.values())
    out_rows = []
    conv_by_rm: dict[str, int] = {}
    for rm in [*chans, "__base__"]:
        v = {
            src: k * 1000000000 // s_tot
            for src, k in starts.items()
            if src != rm
        }
        conv = 0
        for _ in range(_REMOVAL_STEPS):
            conv += (
                sum(
                    m * t_ppm.get((src, "conv"), 0)
                    for src, m in v.items()
                )
                // 1000000
            )
            nv: dict[str, int] = {}
            for dst in chans:
                if dst == rm:
                    continue
                tot = sum(
                    m * t_ppm.get((src, dst), 0) for src, m in v.items()
                )
                if tot > 0:
                    nv[dst] = tot // 1000000
            v = nv
        conv_by_rm[rm] = conv
    base = conv_by_rm["__base__"]
    effs = {rm: base - conv_by_rm[rm] for rm in chans}
    te = sum(effs.values())
    for rm in chans:
        e = effs[rm]
        out_rows.append(
            (
                rm,
                base,
                conv_by_rm[rm],
                e * 1000000 // base if base > 0 else None,
                e * 1000000 // te if te > 0 else None,
            )
        )
    return out_rows
