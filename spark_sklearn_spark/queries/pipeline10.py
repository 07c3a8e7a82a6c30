"""Round-8 continuation: mergeable histogram quantiles, epoch-mix
planning, and a dirty-CSV robustness source.

Histogram quantiles are the DECLARED member of the quantile family:
q_agg_percentile is exact (per-group sort), q_agg_approx_percentile is
rows-only (t-digest internals aren't SQL-mirrorable) — the fixed-bin
histogram sketch is both mergeable (combinable per-bin counts, the
100 TB path) and deterministic (bin edges are data-independent), so
the whole sketch hash-verifies. Epoch planning is the data-mixing step
after q_mix_budget: when a source's token mass is smaller than its
budget, the recipe REPEATS it — integer epoch math, the published
LLM-data practice of capped multi-epoch sampling. The dirty-CSV source
exercises Spark's PERMISSIVE corrupt-record channel end-to-end with a
deterministic fault set, closing the sources matrix's error-path row.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..registry import query
from ..sources.io import load, warehouse_path

# --------------------------------------------------------------------------
# Mergeable fixed-bin histogram quantiles
# --------------------------------------------------------------------------

HQ_BIN = 5.0  # value units per bin; events.value spans ~[0, 500)
HQ_PCTS = (50, 90, 99)

_HQ_PCT_COLS = ",\n           ".join(
    f"MIN(CASE WHEN cum >= (n_total * {p} + 99) // 100 THEN bin END)"
    f" AS p{p}_bin" for p in HQ_PCTS
)

_HQ_ORACLE = f"""
    WITH binned AS (
      SELECT event_type,
             CAST(floor(value / {HQ_BIN!r}) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM events
      GROUP BY event_type, bin
    ),
    cummed AS (
      SELECT event_type, bin, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_total
      FROM binned
    )
    SELECT event_type,
           ANY_VALUE(n_total) AS n,
           {_HQ_PCT_COLS}
    FROM cummed
    GROUP BY event_type
    ORDER BY event_type
"""


@query("q_sketch_hist_quantiles", oracle=_HQ_ORACLE)
def q_sketch_hist_quantiles(spark, d):
    """Mergeable histogram quantiles: values bin into a fixed
    equi-width grid (edges data-independent), per-bin counts are
    COMBINABLE (the property t-digest buys with far more machinery —
    partial bins merge by addition, so the sketch distributes and
    re-aggregates freely at 100 TB), and quantile p reads off the
    first bin whose running count reaches ceil(p*n/100). The whole
    construction is integer-exact, so unlike approx_percentile it
    hash-verifies: the DECLARED quantile-sketch row of the family.
    Plan: one (type, bin) hash agg shrinks the stream map-side, then
    windows over the BOUNDED bin relation (~100 rows/type), never the
    data."""
    ev = load(spark, d, "events").select(
        "event_type",
        F.floor(F.col("value") / HQ_BIN).cast("long").alias("bin"),
    )
    binned = ev.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cummed = binned.select(
        "event_type",
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n_total"),
    )
    pct_aggs = [
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(f"(n_total * {p} + 99) div 100"),
                F.col("bin"),
            )
        ).alias(f"p{p}_bin")
        for p in HQ_PCTS
    ]
    return (
        cummed.groupBy("event_type")
        .agg(F.any_value(F.col("n_total")).alias("n"), *pct_aggs)
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Epoch-mix planning (capped repetition to fill per-source budgets)
# --------------------------------------------------------------------------

EPOCH_BUDGET = 50_000  # target tokens per source
EPOCH_CAP = 4  # max repeats of any source (diminishing-returns cap)

_EPOCH_ORACLE = f"""
    WITH masses AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                 AS tokens_per_epoch
      FROM documents
      GROUP BY source
    )
    SELECT source, n_docs, tokens_per_epoch,
           CAST(least(({EPOCH_BUDGET} + tokens_per_epoch - 1)
                      // tokens_per_epoch, {EPOCH_CAP}) AS BIGINT)
               AS epochs,
           CAST(least(({EPOCH_BUDGET} + tokens_per_epoch - 1)
                      // tokens_per_epoch, {EPOCH_CAP})
                * tokens_per_epoch AS BIGINT) AS tokens_served,
           CAST(CASE WHEN least(({EPOCH_BUDGET} + tokens_per_epoch - 1)
                                // tokens_per_epoch, {EPOCH_CAP})
                          * tokens_per_epoch < {EPOCH_BUDGET}
                     THEN {EPOCH_BUDGET}
                          - least(({EPOCH_BUDGET} + tokens_per_epoch - 1)
                                  // tokens_per_epoch, {EPOCH_CAP})
                            * tokens_per_epoch
                     ELSE 0 END AS BIGINT) AS shortfall
    FROM masses
    ORDER BY source
"""


@query("q_mix_epochs", oracle=_EPOCH_ORACLE)
def q_mix_epochs(spark, d):
    """Epoch-mix planning: per source, how many capped repeats
    (epochs) fill its token budget — the step after q_mix_budget's
    selection, implementing the published multi-epoch recipe (small
    high-quality sources repeat up to a cap; the shortfall column is
    the mass the mixer must source elsewhere). Pure integer ceiling
    division on ONE combinable per-source agg — a metadata-sized plan
    at any corpus size."""
    docs = load(spark, d, "documents")
    masses = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("tokens_per_epoch"),
    )
    epochs = F.least(
        F.expr(
            f"({EPOCH_BUDGET}L + tokens_per_epoch - 1)"
            " div tokens_per_epoch"
        ),
        F.lit(EPOCH_CAP).cast("long"),
    )
    served = epochs * F.col("tokens_per_epoch")
    return masses.select(
        "source",
        "n_docs",
        "tokens_per_epoch",
        epochs.alias("epochs"),
        served.alias("tokens_served"),
        F.when(served < EPOCH_BUDGET, EPOCH_BUDGET - served)
        .otherwise(0)
        .cast("long")
        .alias("shortfall"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Dirty-CSV robustness source (PERMISSIVE corrupt-record channel)
# --------------------------------------------------------------------------

_DIRTY_ORACLE = """
    SELECT lang,
           COUNT(*) AS n_good,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(3 AS BIGINT) AS n_corrupt_total
    FROM documents
    WHERE doc_id % 11 = 0
    GROUP BY lang
    ORDER BY lang
"""


@query("q_source_csv_dirty", oracle=_DIRTY_ORACLE)
def q_source_csv_dirty(spark, d):
    """Error-path source handling: a documents slice serializes to
    CSV text with THREE deterministic malformed lines injected
    (non-numeric id, non-numeric count, bare garbage), then reads in
    PERMISSIVE mode with a _corrupt_record channel. Good rows
    re-aggregate per language; the corrupt count rides along as a
    constant column the oracle pins — proving the reader drops
    nothing silently (3 in, 3 flagged; a malformed row landing in the
    good set would shift the per-lang sums and fail the hash). This
    is the sources-matrix row every ingest pipeline needs: the
    schema-on-read contract under dirty input."""
    path = warehouse_path("csv_dirty", d)
    docs = (
        load(spark, d, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id", "lang", "n_chars")
    )
    lines = docs.select(
        F.concat_ws(
            ",",
            F.col("doc_id").cast("string"),
            "lang",
            F.col("n_chars").cast("string"),
        ).alias("value")
    )
    # each line must FAIL parsing (type error), not merely under-fill:
    # a short row ("1,en") pads nulls in PERMISSIVE mode and would land
    # in the good set — only unparseable cells hit _corrupt_record
    bad = spark.createDataFrame(
        [("not_a_number,xx,12",), ("9,en,notanumber",), ("garbage line",)],
        "value string",
    )
    lines.unionAll(bad).write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "doc_id bigint, lang string, n_chars bigint,"
            " _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # corrupt-record parsing requires the raw column to be materialized
    # alongside (Spark requirement: cache or project both)
    back = back.cache()
    corrupt_total = back.filter(
        F.col("_corrupt_record").isNotNull()
    ).select(F.count(F.lit(1)).alias("n_corrupt_total"))
    good = back.filter(F.col("_corrupt_record").isNull())
    return (
        good.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_good"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(corrupt_total))
        .select("lang", "n_good", "sum_chars", "n_corrupt_total")
        .orderBy("lang")
    )
