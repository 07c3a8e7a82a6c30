"""Grouped apply — port of the reference's ``gapply``.

Parity: ``python/spark_sklearn/group_apply.py#gapply`` (SURVEY.md §2A
row A4). The reference materialized each group via
``collect_list(struct(*cols))`` + a pickled Python UDF + ``explode``;
on modern Spark the same semantics are native:
``df.groupBy(keys).applyInPandas`` shuffles once and streams Arrow
batches — no per-row pickling, no single-row array blow-up.

Signature note: the reference took a ``GroupedData`` and dug the keys
out of the private ``_jgd``; we take (df, keys) explicitly — same
user-visible contract (``func(key_tuple, pandas.DataFrame) ->
pandas.DataFrame`` with a caller-supplied result StructType), public
API only.

The reference's constraint is inherited: one group must fit in one
task's memory. For 100 TB inputs, key cardinality must exceed
executor count and no single group may exceed a few GB — callers with
skewed groups should pre-aggregate or salt (operators/salting.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def gapply(
    df: DataFrame,
    keys: Union[str, list[str]],
    func: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    schema: Union[StructType, str],
    *cols: str,
) -> DataFrame:
    """Apply ``func(key, pdf) -> pdf`` to each group of ``df``.

    ``cols`` restricts which columns ``func`` sees (defaults to all
    non-key columns, matching the reference's behavior).
    """
    if isinstance(keys, str):
        keys = [keys]
    if not isinstance(schema, (StructType, str)):
        raise TypeError("schema must be a StructType or DDL string")
    use_cols = list(cols) or [c for c in df.columns if c not in keys]

    def _wrapped(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return func(key, pdf[use_cols])

    # Project BEFORE the grouping shuffle: applyInPandas is opaque to
    # Catalyst, so without this the full row width is scanned, shuffled
    # and Arrow-serialized even though func only reads use_cols.
    #
    # Pin the exchange to core count: AQE coalesces shuffle partitions
    # by BYTE size, which is calibrated for JVM operators — after the
    # projection the shuffle is small enough that coalescing starved
    # the per-row-expensive Python stage of workers (measured 2.2 s at
    # 32 partitions vs 6.2 s coalesced on the events fixture). An
    # explicit keyed repartition to defaultParallelism is exempt from
    # coalescing, satisfies the groupBy's distribution (no second
    # exchange), and scales with the cluster, not a constant.
    # dict.fromkeys dedups when a caller passes a key column in cols
    # (duplicate names would make the groupBy ambiguous), matching
    # ml_api.KeyedEstimator.fit's projection.
    base = df.select(*dict.fromkeys([*keys, *use_cols]))
    n = df.sparkSession.sparkContext.defaultParallelism
    return base.repartition(n, *keys).groupBy(*keys).applyInPandas(_wrapped, schema)
