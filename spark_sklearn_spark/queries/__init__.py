"""Importing this package registers every declared query (SURVEY.md §2B).

Each module covers one operator family; registration happens at import
time via ``spark_sklearn_spark.registry.query``.
"""

from . import (  # noqa: F401
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sorts,
    setops,
    scalar_fns,
    streaming_batch,
    tpch,
    tpch2,
    udfs,
    ml,
    behavior,
    pipeline,
    pipeline2,
    pipeline3,
    pipeline4,
    pipeline5,
    pipeline6,
    layout,
    profiling,
    reshape,
    sketches,
    features,
    pipeline7,
    pipeline8,
    curation,
    canary,
    pipeline9,
    pipeline10,
    pca_power,
    pipeline11,
    multimodal_hash,
    abtest,
    kcore,
)
