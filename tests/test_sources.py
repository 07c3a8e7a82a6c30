"""Source/sink round-trips for every built-in file format.

Parquet/ORC are self-describing; CSV/JSON restore types via
schema-on-read (write_table/read_table docstrings explain why
inferSchema is banned in pipelines)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_sklearn_spark.sources.io import (
    load,
    read_table,
    supported_formats,
    write_table,
)


def _sample(spark, sf_dir):
    # nation: strings + ints; plus a timestamp and double column from
    # events to exercise the type surface csv/json most often mangles
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "value", "event_type"
    ).limit(200)
    return ev


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_lossless_with_schema(spark, sf_dir, tmp_path, fmt):
    df = _sample(spark, sf_dir)
    path = str(tmp_path / f"events_{fmt}")
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=df.schema)
    assert back.schema == df.schema
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b, f"{fmt} round-trip lost rows/values"


def test_text_sink_roundtrip(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("text").limit(50)
    path = str(tmp_path / "docs_text")
    write_table(docs, path, fmt="text")
    back = read_table(spark, path, fmt="text").withColumnRenamed(
        "value", "text"
    )
    assert sorted(r.text for r in back.collect()) == sorted(
        r.text for r in docs.collect()
    )


def test_partitioned_csv_prunes(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = str(tmp_path / "events_csv_part")
    write_table(df, path, fmt="csv", partition_by=["event_type"])
    back = read_table(spark, path, fmt="csv",
                      schema="event_id bigint, ts timestamp, value double")
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() > 0


def test_supported_formats_reports_builtins(spark):
    fmts = supported_formats(spark)
    for f in ("parquet", "orc", "json", "csv", "text"):
        assert f in fmts
