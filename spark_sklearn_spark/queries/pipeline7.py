"""Round-7 batch: source round-trips (JSON-lines, ORC), compaction
planning over an ingest manifest, and near-dup-graph degree
distribution.

The round-trip pair completes the sink/source format matrix as
DECLARED queries (parquet: everywhere; csv: q_source_csv_roundtrip;
avro: probed in tests — the package isn't on the classpath here):
each writes a deterministic slice through the format and re-aggregates
it, while the oracle aggregates the original parquet — the hash
equality proves the round-trip lossless.

Compaction planning is the lakehouse maintenance primitive: given a
manifest of (file, rows) stats, assign source files to target files
by cumulative row budget. The manifest here is derived (portable-hash
bucket per row simulates the ingest's file assignment — 48 skewed
"files"); at 100 TB the manifest is a real table and the SAME plan
query runs over it — the window cumsum is over files, never rows.

Degree distribution rides the memoized near-dup edge snapshot
(pipeline2.near_dup_edges) — the graph-health profile (how clustered
is my duplication?) next to q_graph_triangles/q_graph_pagerank.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..registry import query
from ..sources.io import load, read_table, warehouse_path, write_table
from ._helpers import DEC
from .pipeline2 import _BIGRAMS_SQL, near_dup_edges

# --------------------------------------------------------------------------
# JSON-lines round-trip
# --------------------------------------------------------------------------


@query(
    "q_source_jsonl_roundtrip",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS sum_chars,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM documents
        WHERE doc_id % 7 = 0
        GROUP BY lang
        ORDER BY lang
    """,
)
def q_source_jsonl_roundtrip(spark, d):
    """JSON-lines sink → source round-trip, hash-declared: a
    deterministic documents slice goes out as JSONL and comes back
    with the writer's explicit schema (schema-on-read — inference is
    a second scan and can guess differently), then re-aggregates.
    The oracle aggregates the parquet source directly, so hash
    equality proves the text round-trip lossless for
    bigint/string payloads. JSONL is the interchange format every
    LLM-corpus pipeline ingests; this is the q_source_csv_roundtrip
    twin for it."""
    path = warehouse_path("jsonl_roundtrip", d)
    docs = (
        load(spark, d, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "lang", "n_chars")
    )
    write_table(docs, path, fmt="json")
    back = read_table(
        spark,
        path,
        fmt="json",
        schema="doc_id bigint, lang string, n_chars bigint",
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# ORC round-trip
# --------------------------------------------------------------------------


@query(
    "q_source_orc_roundtrip",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                          AS DOUBLE), 2) AS sum_price,
               MIN(o_orderdate) AS min_date,
               MAX(o_orderdate) AS max_date
        FROM orders
        WHERE o_orderkey % 10 = 0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q_source_orc_roundtrip(spark, d):
    """ORC sink → source round-trip (the second columnar format Spark
    ships natively): a deterministic orders slice is written to ORC
    and read back — no schema argument needed, ORC keeps types — then
    re-aggregated; the oracle aggregates the parquet source. Proves
    bigint/double/string/timestamp survive the ORC writer/reader
    bit-exactly (doubles still ride the decimal-sum policy since the
    AGGREGATION order differs, not the values)."""
    path = warehouse_path("orc_roundtrip", d)
    orders = (
        load(spark, d, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    )
    write_table(orders, path, fmt="orc")
    back = read_table(spark, path, fmt="orc")
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2
            ).alias("sum_price"),
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Compaction planning over an ingest manifest
# --------------------------------------------------------------------------

COMPACT_FILES = 48  # simulated ingest files in the manifest
COMPACT_TARGET = 4096  # rows per compacted target file

_COMPACT_ORACLE = f"""
    WITH manifest AS (
      SELECT (('0x' || substr(md5('f:' || CAST(l_orderkey AS VARCHAR)),
                              1, 14))::BIGINT) % {COMPACT_FILES} AS file_id,
             COUNT(*) AS rows_
      FROM lineitem
      GROUP BY file_id
    ),
    planned AS (
      SELECT file_id, rows_,
             SUM(rows_) OVER (ORDER BY file_id
                              ROWS UNBOUNDED PRECEDING) - rows_
                 AS cum_before
      FROM manifest
    )
    SELECT CAST(floor(cum_before / {COMPACT_TARGET}.0) AS BIGINT)
               AS target_file,
           COUNT(*) AS n_source_files,
           SUM(rows_) AS rows_,
           MIN(file_id) AS first_src,
           MAX(file_id) AS last_src
    FROM planned
    GROUP BY target_file
    ORDER BY target_file
"""


@query("q_layout_compaction", oracle=_COMPACT_ORACLE)
def q_layout_compaction(spark, d):
    """Small-file compaction plan: bin-pack source files into target
    files of ~4096 rows by cumulative budget (first-fit in file
    order — the deterministic plan OPTIMIZE-style maintenance jobs
    execute). The manifest is per-file row counts; here it's derived
    by hashing rows into 48 skewed buckets (a stand-in for the
    ingest's real file assignment), one hash agg. The plan itself —
    ordered cumsum + floor-div — runs over the MANIFEST (48 rows, one
    single-partition window over file stats, never over data rows),
    which is exactly why it scales: at 100 TB the manifest of a
    million files is still metadata-sized."""
    li = load(spark, d, "lineitem").select(
        F.pmod(
            F.expr(
                "cast(conv(substr(md5(concat('f:',"
                " cast(l_orderkey as string))), 1, 14), 16, 10) as bigint)"
            ),
            F.lit(COMPACT_FILES),
        ).alias("file_id")
    )
    manifest = li.groupBy("file_id").agg(F.count(F.lit(1)).alias("rows_"))
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, 0)
    planned = manifest.withColumn(
        "cum_before", F.sum("rows_").over(w) - F.col("rows_")
    )
    return (
        planned.groupBy(
            F.floor(F.col("cum_before") / float(COMPACT_TARGET))
            .cast("long")
            .alias("target_file")
        )
        .agg(
            F.count(F.lit(1)).alias("n_source_files"),
            F.sum("rows_").alias("rows_"),
            F.min("file_id").alias("first_src"),
            F.max("file_id").alias("last_src"),
        )
        .orderBy("target_file")
    )


# --------------------------------------------------------------------------
# Near-dup graph degree distribution
# --------------------------------------------------------------------------

_DEGREE_ORACLE = f"""
    WITH {_BIGRAMS_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    ),
    edges AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE ROUND(i.c * 1.0 / (sa.n + sb.n - i.c), 6) >= 0.4
    ),
    degs AS (
      SELECT doc_id, COUNT(*) AS degree FROM (
        SELECT doc_a AS doc_id FROM edges
        UNION ALL
        SELECT doc_b AS doc_id FROM edges
      ) GROUP BY doc_id
    )
    SELECT degree, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM degs
    GROUP BY degree
    ORDER BY degree
"""


@query("q_graph_degree_dist", oracle=_DEGREE_ORACLE)
def q_graph_degree_dist(spark, d):
    """Degree distribution of the near-dup graph (docs with >= 1
    edge): how clustered is the duplication — a long tail of
    degree-1 pairs compacts fine, a hub of degree-400 means a
    template blowing up the transitive closure. Spark side rides the
    memoized edge snapshot (near_dup_edges — one parquet re-read
    after the first build), then two tiny hash aggs; the oracle
    recomputes the edges from scratch in SQL. Degree counting is
    symmetrize (unionAll) + groupBy — never materializes anything
    larger than the edge list."""
    e = near_dup_edges(spark, d)
    degs = (
        e.select(F.col("doc_a").alias("doc_id"))
        .unionAll(e.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        degs.groupBy("degree")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("degree")
    )
