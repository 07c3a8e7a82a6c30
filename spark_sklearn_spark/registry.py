"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2B registers here with a name, a
callable ``(spark, sf_dir) -> DataFrame``, and (when the semantics are
exactly SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__``
re-exports these dicts verbatim.

Declared queries (with an oracle) are hash-checked by the driver;
rows-only queries (oracle=None) get a weaker rows>0 check — reserve
those for genuinely non-SQL-expressible ops (approximate sketches,
ML training, streaming state).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run."""
    from . import queries  # noqa: F401  (importing populates the registry)
