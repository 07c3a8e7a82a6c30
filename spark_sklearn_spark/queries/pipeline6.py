"""LLM-pipeline + event-history operators, batch 6 (round 6):
batch sessionization, hourly OHLC rollup, SCD-2 history build,
word-distribution entropy scoring, and asymmetric containment dedup.

The first three are the event-history family a warehouse runs next to
the streaming jobs (streaming_batch.py holds the readStream twins):
sessionize assigns gap-based session ids in batch, OHLC is the
classic first/last/min/max time-bucket rollup, and SCD-2 turns a
change stream into validity intervals. The last two extend the text
family: entropy is the Gopher-style token-diversity quality signal,
and containment is the asymmetric dedup tier that catches quotes /
subset documents Jaccard misses (|A∩B|/|A| high while |A∩B|/|A∪B|
low when |A| ≪ |B|).

Scale notes: sessionize and SCD-2 are each ONE user-partitioned
window shuffle (lag/lead + running sum share the partitioning);
OHLC's two row_number orderings reuse one exchange and the final
hash agg emits |types|·|hours| cells regardless of corpus size;
entropy is explode → two combinable hash aggs; containment rides the
same DF-capped postings join as q_dedup_ngram (bigram_overlap — the
fan-out-bounded, never-doc×doc core).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC
from .pipeline2 import _BIGRAMS_SQL

# --------------------------------------------------------------------------
# Batch sessionization (gap-based session ids)
# --------------------------------------------------------------------------

SESSION_GAP_US = 1800 * 1_000_000  # 30 min, the industry-default gap


@query(
    "q_behavior_sessionize",
    oracle=f"""
        WITH o AS (
          SELECT user_id, event_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events
        ), s AS (
          SELECT *, CASE WHEN prev IS NULL
                           OR date_diff('microseconds', prev, ts)
                              > {SESSION_GAP_US}
                         THEN 1 ELSE 0 END AS s_new
          FROM o
        ), t AS (
          SELECT *, SUM(s_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)
                        AS session_id
          FROM s
        )
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(ts) AS t_start,
               MAX(ts) AS t_end,
               date_diff('microseconds', MIN(ts), MAX(ts)) AS duration_us,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2)
                   AS sum_value
        FROM t
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
)
def q_behavior_sessionize(spark, d):
    """Batch sessionization: a new session starts when a user's
    inter-event gap exceeds 30 minutes — the batch twin of
    q_stream_session's session_window (the warehouse backfill job
    next to the streaming one). lag + running-sum-of-boundaries share
    ONE (user_id; ts, event_id) window partitioning, so the whole
    assignment is a single shuffle; the per-session rollup then aggs
    on (user_id, session_id), which is a refinement of the same key —
    at 100 TB this is two narrow passes over a user-partitioned
    stream, never a global sort. Ties broken by event_id on both
    engines; value sums on the exact decimal path."""
    ev = load(spark, d, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    sess = (
        ev.withColumn(
            "s_new",
            F.when(
                prev_us.isNull()
                | (F.unix_micros("ts") - prev_us > SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("s_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("duration_us"),
            F.round(
                F.sum(F.col("value").cast(DEC)).cast("double"), 2
            ).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# Hourly OHLC rollup (first/last/min/max per time bucket)
# --------------------------------------------------------------------------


@query(
    "q_ts_ohlc",
    oracle="""
        WITH h AS (
          SELECT event_type, event_id, value,
                 CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, ts
          FROM events
        ), rn AS (
          SELECT *,
                 row_number() OVER (PARTITION BY event_type, hour
                                    ORDER BY ts, event_id) AS rn_f,
                 row_number() OVER (PARTITION BY event_type, hour
                                    ORDER BY ts DESC, event_id DESC) AS rn_l
          FROM h
        )
        SELECT event_type, hour,
               MAX(CASE WHEN rn_f = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_l = 1 THEN value END) AS close,
               COUNT(*) AS volume,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2)
                   AS turnover
        FROM rn
        GROUP BY event_type, hour
        ORDER BY event_type, hour
    """,
)
def q_ts_ohlc(spark, d):
    """Hourly OHLC (open/high/low/close) per event type — the
    canonical first/last/extremes time-bucket rollup of metric and
    market pipelines. First/last are picked by row_number under a
    total order (ts, event_id), so ties cannot flip across engines;
    both orderings share the (event_type, hour) partitioning, so
    Spark reuses one exchange and adds a sort per direction. The
    final hash agg emits |event_types|·|hours| cells — bounded by the
    calendar, not the corpus, so the result of a 100 TB scan is KBs.
    open/high/low/close are picked raw doubles (no float summation);
    the turnover sum runs on the exact decimal path."""
    ev = load(spark, d, "events").select(
        "event_type",
        "event_id",
        "value",
        "ts",
        F.date_trunc("hour", "ts").alias("hour"),
    )
    wf = Window.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    wl = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = ev.withColumn("rn_f", F.row_number().over(wf)).withColumn(
        "rn_l", F.row_number().over(wl)
    )
    return (
        rn.groupBy("event_type", "hour")
        .agg(
            F.max(F.when(F.col("rn_f") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_l") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.round(
                F.sum(F.col("value").cast(DEC)).cast("double"), 2
            ).alias("turnover"),
        )
        .orderBy("event_type", "hour")
    )


# --------------------------------------------------------------------------
# SCD-2 history build (change stream -> validity intervals)
# --------------------------------------------------------------------------


@query(
    "q_cdc_scd2",
    oracle="""
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               value,
               CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
                   AS is_current
        FROM events
        WHERE user_id % 20 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, version
    """,
)
def q_cdc_scd2(spark, d):
    """SCD type-2 history build: each change event for a key becomes
    a version row with [valid_from, valid_to) bounds and a current
    flag — the dimension-history twin of q_upsert_snapshot's SCD-1
    overwrite. ONE key-partitioned window shuffle computes version
    number, interval end (lead), and currency together; at 100 TB
    this partitions by the natural key and never sees a global sort.
    The deterministic user_id % 20 slice keeps the declared output a
    bounded sample of the version table (the operator itself is
    slice-free); tie order pinned by (ts, event_id) on both
    engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        load(spark, d, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("user_id", "event_id", "ts", "value")
    )
    return (
        ev.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("version"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            "value",
            F.when(F.lead("ts").over(w).isNull(), 1)
            .otherwise(0)
            .alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# --------------------------------------------------------------------------
# Word-distribution entropy (token-diversity quality signal)
# --------------------------------------------------------------------------


@query(
    "q_text_entropy",
    oracle="""
        WITH words AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ), counts AS (
          SELECT doc_id, word, COUNT(*) AS c
          FROM words GROUP BY doc_id, word
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct,
               ROUND(ln(CAST(SUM(c) AS DOUBLE))
                     - CAST(SUM(CAST(c * ln(CAST(c AS DOUBLE))
                                     AS DECIMAL(30,10))) AS DOUBLE)
                       / SUM(c), 6) AS entropy
        FROM counts
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def q_text_entropy(spark, d):
    """Per-document Shannon entropy of the word distribution — the
    token-diversity quality signal (low entropy = degenerate/repetitive
    text; complements q_text_repetition's n-gram repeat ratios).
    Computed as ln(n) - Σ c·ln(c) / n so every ln argument is an
    INTEGER count — both engines evaluate ln on identical inputs, and
    the term sum runs on the exact decimal path (the same portability
    posture as q_text_pmi's shared ln expression). Shape: explode →
    (doc, word) hash agg → doc hash agg, both combinable, no windows —
    the shuffles carry counts, never text."""
    docs = load(spark, d, "documents")
    counts = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.log(F.sum("c").cast("double"))
                - F.sum(
                    (F.col("c") * F.log(F.col("c").cast("double"))).cast(
                        DEC
                    )
                ).cast("double")
                / F.sum("c"),
                6,
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Asymmetric containment (quote / subset-document detection)
# --------------------------------------------------------------------------

CONTAIN_TAU = 0.6


@query(
    "q_text_containment",
    oracle=f"""
        WITH {{_BIGRAMS_SQL}},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY doc_a, doc_b
        ), scored AS (
            SELECT i.doc_a, i.doc_b,
                   ROUND(i.c * 1.0 / sa.n, 6) AS cont_a,
                   ROUND(i.c * 1.0 / sb.n, 6) AS cont_b,
                   ROUND(i.c * 1.0 / (sa.n + sb.n - i.c), 6) AS jacc
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
        )
        SELECT doc_a, doc_b, cont_a, cont_b, jacc
        FROM scored
        WHERE greatest(cont_a, cont_b) >= {CONTAIN_TAU}
        ORDER BY doc_a, doc_b
    """.replace("{_BIGRAMS_SQL}", _BIGRAMS_SQL),
)
def q_text_containment(spark, d):
    """Asymmetric gram containment C(A,B) = |A∩B| / |A| for candidate
    pairs — the dedup tier that catches quotes and subset documents:
    a short doc fully embedded in a long one has high containment but
    low Jaccard, so q_dedup_ngram's symmetric threshold misses it.
    Rides the same DF-capped postings join as q_dedup_ngram
    (pipeline2.bigram_overlap — fan-out bounded by DF_CAP, never
    doc×doc); both directions plus Jaccard are emitted so the caller
    sees WHY a pair surfaced. Ratios rounded to 6 before the
    threshold on both engines."""
    from .pipeline2 import bigram_overlap

    ov = bigram_overlap(spark, d)
    return (
        ov.select(
            "doc_a",
            "doc_b",
            F.round(F.col("c") / F.col("na"), 6).alias("cont_a"),
            F.round(F.col("c") / F.col("nb"), 6).alias("cont_b"),
            F.round(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6
            ).alias("jacc"),
        )
        .filter(F.greatest("cont_a", "cont_b") >= CONTAIN_TAU)
        .orderBy("doc_a", "doc_b")
    )
