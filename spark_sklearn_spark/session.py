"""Session helpers.

Parity: ``python/spark_sklearn/util.py#createLocalSparkSession``
(SURVEY.md §2A row A11) — the reference ships a convenience builder
for a local SparkSession; ours additionally pins the configs required
for oracle parity (UTC session timezone, Arrow on) and for local-mode
efficiency (AQE, shuffle partitions ≈ cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def createLocalSparkSession(
    appName: str = "spark_sklearn_spark",
    cpus: int | None = None,
) -> SparkSession:
    """Create (or reuse) a local SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*`` (all cores).
    Settings chosen for a single-JVM local run but written so the same
    plans scale on a real cluster: AQE handles runtime coalescing and
    skew joins; shuffle partitions are a starting hint only.
    """
    n = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS), which PySpark 4.x
        # rejects; read nanos as long session-wide (sources/io.py
        # rebuilds the µs timestamp). Set here at build time so the
        # behavior is declared, not a mid-session surprise — io.load()
        # still sets it defensively for foreign sessions (the driver
        # builds its own).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Silence WindowExec's "No Partition Defined" WARN: every
    # unpartitioned window in this repo runs on a LIMIT/agg-bounded
    # relation (operators/ranking.py documents the policy), Spark 4's
    # EliminateWindowPartitions strips any constant partition key we
    # could add, and the GENUINE scale gate is mechanical —
    # plans.assert_scalable rejects SinglePartition exchanges in
    # tests/test_plans.py — so the log line is pure noise here
    # (VERDICT r8 item 6).
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # logging backend absent/changed — cosmetic only
    return spark
