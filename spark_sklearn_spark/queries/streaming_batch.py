"""Streaming semantics, batch-checked (SURVEY.md §2B 'Streaming-only').

``window()`` / ``session_window()`` produce identical results under
batch and streaming execution — Structured Streaming's core design —
so the windowed aggregations are *declared* here against DuckDB
oracles (epoch-aligned time_bucket / gap-cumsum session emulation),
while the engine-only behaviors (watermarks, stateful dedup, arbitrary
state) run as true ``readStream`` executions in ``streaming/jobs.py``
and register rows-only.

Scale notes: tumbling/sliding aggs are plain hash aggregations after
the window projection (partial agg + one shuffle). Session windows
shuffle by user then merge-sort per key — the same plan streaming
uses, minus the state store.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ..streaming.jobs import (
    dedup_within_watermark,
    running_user_state,
    windowed_counts_with_watermark,
)
from ._helpers import sql_dsum, dsum


@query(
    "q_stream_tumbling",
    oracle=f"""
        SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP)
                   AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               {sql_dsum("value", "total")}
        FROM events
        GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, d):
    """Tumbling 10-minute windows per event_type. Spark's window()
    starts are epoch-aligned, exactly DuckDB's time_bucket — both
    engines bucket identically in UTC."""
    ev = load(spark, d, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "q_stream_sliding",
    oracle=f"""
        WITH slid AS (
            SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP)
                       AS window_start, event_type, value
            FROM events
            UNION ALL
            SELECT CAST(time_bucket(INTERVAL '10 minutes',
                                    ts - INTERVAL '5 minutes')
                        + INTERVAL '5 minutes' AS TIMESTAMP)
                       AS window_start, event_type, value
            FROM events
        )
        SELECT window_start, event_type,
               CAST(count(*) AS BIGINT) AS n,
               {sql_dsum("value", "total")}
        FROM slid GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark, d):
    """Sliding windows (10 min, slide 5): every event lands in exactly
    two windows. The oracle expands the two slide phases as shifted
    tumbling buckets — the same window-assignment rule Spark's
    Expand-based window() implements."""
    ev = load(spark, d, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "q_stream_session",
    oracle="""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL '30 minutes'
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS is_start
          FROM events
        ), sessions AS (
          SELECT user_id, ts,
                 sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM marked
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS last_event,
               CAST(count(*) AS BIGINT) AS n_events
        FROM sessions GROUP BY user_id, sess_id
    """,
)
def q_stream_session(spark, d):
    """Session windows (30-minute gap) per user — declared via the
    lag/cumsum gap-start emulation in SQL. Spark's session_window
    start is the first event's ts; last_event is aggregated explicitly
    (rather than comparing Spark's end = last+gap convention)."""
    ev = load(spark, d, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )


@query("q_stream_watermark")  # rows-only: true streaming execution
def q_stream_watermark(spark, d):
    """Real readStream: tumbling agg behind a 10-minute watermark,
    append mode (windows emit only when final). See streaming/jobs.py."""
    return windowed_counts_with_watermark(spark, d)


@query(
    "q_stream_watermark_final",
    oracle="""
        WITH mx AS (
          SELECT MAX(ts) - INTERVAL 10 MINUTE AS wm FROM events
        )
        SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP)
                   AS window_start,
               e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events e, mx
        WHERE CAST(date_trunc('hour', e.ts) AS TIMESTAMP)
              + INTERVAL 1 HOUR <= mx.wm
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def q_stream_watermark_final(spark, d):
    """Watermarked append-mode windows, DECLARED: the emitted set
    after one availableNow pass is exactly the windows whose END is
    at or below the final watermark (max event ts - 10 min) — pinned
    empirically (719 of 720 fixture windows emit; the last hour is
    withheld as unfinalized). The oracle reproduces that emission
    rule in SQL, so the watermark SEMANTICS — not just row counts —
    are hash-checked. Exact end==watermark ties are unreachable with
    microsecond fixture timestamps (rule measured strict-or-equal
    indistinguishable)."""
    return (
        windowed_counts_with_watermark(spark, d)
        .select("window_start", "event_type", F.col("n"))
        .orderBy("window_start", "event_type")
    )


@query("q_stream_dedup")  # rows-only: true streaming execution
def q_stream_dedup(spark, d):
    """Real readStream: dropDuplicatesWithinWatermark on event_id —
    bounded-state streaming dedup."""
    return dedup_within_watermark(spark, d)


@query(
    "q_stream_dedup_keys",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type
    """,
)
def q_stream_dedup_keys(spark, d):
    """Real readStream dropDuplicatesWithinWatermark, DECLARED: dedup
    on the coarse (user_id, event_type) key and project only the key
    columns — the kept-row choice is batch-order-dependent but the key
    set equals batch DISTINCT exactly under the single availableNow
    micro-batch (the q_stream_join declaration argument), so streaming
    dedup gets a real hash row instead of rows-only."""
    from ..streaming.jobs import dedup_keys_within_watermark

    return dedup_keys_within_watermark(spark, d).orderBy(
        "user_id", "event_type"
    )


@query("q_stream_stateful")  # rows-only: true streaming execution
def q_stream_stateful(spark, d):
    """Real readStream: arbitrary per-user running state via
    applyInPandasWithState."""
    return running_user_state(spark, d)


@query(
    "q_stream_stateful_final",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(value) AS max_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def q_stream_stateful_final(spark, d):
    """applyInPandasWithState, DECLARED: with a single availableNow
    micro-batch each user's state updates exactly once, so the
    update-mode emission IS the final state — per-user event count
    and running max, which must equal the batch aggregate bit-for-bit
    (count is integral; max never sums floats). This closes the
    arbitrary-stateful row of the streaming matrix with a real hash
    check while q_stream_stateful keeps exercising the multi-update
    path rows-only."""
    return running_user_state(spark, d).orderBy("user_id")


@query(
    "q_stream_join",
    oracle="""
        SELECT c.event_id AS click_id, p.event_id AS purchase_id,
               c.user_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM events c
        JOIN events p ON c.user_id = p.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        ORDER BY click_id, purchase_id
    """,
)
def q_stream_join(spark, d):
    """Real readStream stream-stream interval join (clicks x
    purchases within 30 min, watermarked state eviction on both
    sides), DECLARED against the equivalent batch join: the
    single-file availableNow source runs one micro-batch, so no row
    can be watermark-dropped and the streaming result must equal the
    SQL oracle exactly. See streaming/jobs.py for the state-bound
    argument."""
    from ..streaming.jobs import click_purchase_interval_join

    return click_purchase_interval_join(spark, d)


@query(
    "q_stream_static_join",
    oracle="""
        WITH firstday AS (
            SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort
            FROM events GROUP BY user_id
        )
        SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_day,
               e.event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events e JOIN firstday f ON e.user_id = f.user_id
        GROUP BY 1, 2
        ORDER BY cohort_day, event_type
    """,
)
def q_stream_static_join(spark, d):
    """Real readStream stream-static join (streaming/jobs.py): events
    stream ⋈ static per-user cohort dim, aggregated per (cohort day,
    event type). DECLARED: the static side is deterministic and the
    single-file availableNow source runs one micro-batch, so the
    streaming result equals the batch SQL exactly."""
    from ..streaming.jobs import stream_static_enrich

    return stream_static_enrich(spark, d).orderBy("cohort_day", "event_type")


@query(
    "q_stream_upsert_final",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(floor(SUM(CAST(value AS DECIMAL(30,10))) * 100)
                    AS BIGINT) AS sum_cents
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_stream_upsert_final(spark, d):
    """foreachBatch MERGE maintenance, DECLARED: the algebraic merge
    (count/decimal-sum absorb per-batch deltas) guarantees the
    maintained table equals the from-scratch aggregate over
    everything ingested — so after the availableNow pass the table
    must hash-match the batch SQL exactly, proving the sink-side
    streaming path (partial agg -> versioned MERGE -> table read)
    end-to-end, not merely rows>0."""
    from ..streaming.jobs import foreach_batch_upsert

    return foreach_batch_upsert(spark, d)


@query("q_stream_foreach_upsert")  # rows-only: true streaming execution
def q_stream_foreach_upsert(spark, d):
    """Real foreachBatch sink: each micro-batch's partial aggregate
    states MERGE into an accumulating per-event-type table
    (idempotent algebraic merge — the streaming twin of
    q_agg_incremental). See streaming/jobs.py:foreach_batch_upsert;
    rows-only because the maintained table lives engine-side."""
    from ..streaming.jobs import foreach_batch_upsert

    return foreach_batch_upsert(spark, d)



@query(
    "q_stream_topk",
    oracle="""
        WITH bucketed AS (
          SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)
                     AS window_start,
                 user_id,
                 COUNT(*) AS n_events
          FROM events
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT window_start, user_id, n_events,
                 ROW_NUMBER() OVER (PARTITION BY window_start
                                    ORDER BY n_events DESC, user_id)
                     AS rnk
          FROM bucketed
        )
        SELECT window_start, rnk, user_id, n_events
        FROM ranked
        WHERE rnk <= 3
        ORDER BY window_start, rnk
    """,
)
def q_stream_topk(spark, d):
    """Windowed top-k: the 3 most active users per tumbling hour —
    the leaderboard shape a streaming job materializes per window
    via foreachBatch (rank-within-window is not incrementally
    updatable, so production emits it at window close; the batch
    plan here IS that per-window computation). Counts first shrink
    (window, user) to one row via a combinable agg, then row_number
    partitions BY WINDOW — many small partitions, no global sort.
    Deterministic ties by user_id."""
    ev = load(spark, d, "events")
    from pyspark.sql import Window as W

    bucketed = ev.groupBy(
        F.window("ts", "1 hour").alias("win"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_rank = W.partitionBy("win").orderBy(
        F.desc("n_events"), "user_id"
    )
    return (
        bucketed.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("win.start").alias("window_start"),
            "rnk",
            "user_id",
            "n_events",
        )
        .orderBy("window_start", "rnk")
    )
