"""One-off experiment: does a deterministic-key repartition after the
single-row-group fixture scan speed up map-heavy queries?

Usage: python tools/exp_spread.py <sf_dir> <query...>

For each query: time the current plan (noop sink, reps), then
monkeypatch the query module's `load` to hash-repartition each table
by its primary key to defaultParallelism, rebuild, and time again.
Throwaway measurement tool (guide §1); not part of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

PK = {
    "lineitem": ["l_orderkey", "l_linenumber"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__  # noqa: F401  (populates the registry)
    from spark_sklearn_spark import registry
    from spark_sklearn_spark.session import createLocalSparkSession
    from spark_sklearn_spark.sources import io as src_io

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()))
    spark = createLocalSparkSession("exp_spread", cpus)
    n_par = spark.sparkContext.defaultParallelism

    orig_load = src_io.load

    def spread_load(spark, d, name, spread=False):
        # `spread` swallowed deliberately: call sites that already pass
        # load(..., spread=True) must not double-repartition here, and
        # the baseline branch below uses orig_load spread-off anyway.
        df = orig_load(spark, d, name)
        return df.repartition(n_par, *[F.col(c) for c in PK[name]])

    def run(df) -> float:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    import importlib

    for name in names:
        fn = registry.QUERIES[name]
        mod = importlib.import_module(fn.__module__)
        # baseline
        base = []
        for _ in range(3):
            spark.catalog.clearCache()
            base.append(run(fn(spark, sf_dir)))
        # patched (module-level `load` symbol + any helper modules that
        # the query calls through are NOT patched — this measures the
        # direct-load portion only)
        had = hasattr(mod, "load")
        if had:
            saved = mod.load
            mod.load = spread_load
        try:
            spread = []
            for _ in range(3):
                spark.catalog.clearCache()
                spread.append(run(fn(spark, sf_dir)))
        finally:
            if had:
                mod.load = saved
        fmt = lambda xs: "/".join(f"{x:.3f}" for x in xs)
        print(
            f"{name:30s} base {fmt(base)}  spread {fmt(spread)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
