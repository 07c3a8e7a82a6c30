"""Shared fixtures (SURVEY.md §5.1: the reference reused one local
SparkSession across its test modules — fixtureReuseSparkSession)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from spark_sklearn_spark.session import createLocalSparkSession

    s = createLocalSparkSession("pytest", cpus=8)
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
    # _IVF_CACHE holds persisted DataFrames for the app lifetime;
    # release them when the suite's session winds down.
    from spark_sklearn_spark.operators.ivf import clear_ivf_cache

    clear_ivf_cache()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
