"""API-parity tests: the reference's public class surface
(GridSearchCV / RandomizedSearchCV / KeyedEstimator / KeyedModel /
Converter) driven the way a spark_sklearn user would."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from spark_sklearn_spark.ml_api import (
    Converter,
    GridSearchCV,
    KeyedEstimator,
    RandomizedSearchCV,
)


@pytest.fixture(scope="module")
def features_df(spark):
    from pyspark.ml.functions import array_to_vector

    rng = np.random.RandomState(23)
    X = rng.rand(300, 4)
    # separable-ish: label from a fixed linear rule
    y = (X @ np.array([2.0, -1.0, 0.5, 0.0]) > 0.7).astype(float)
    pdf = pd.DataFrame({"emb": X.tolist(), "label": y})
    return spark.createDataFrame(pdf).select(
        array_to_vector(F.col("emb").cast("array<double>")).alias("features"),
        F.col("label"),
    )


def test_grid_search_cv(spark, features_df):
    from pyspark.ml.classification import LogisticRegression

    gs = GridSearchCV(
        LogisticRegression(maxIter=10),
        {"regParam": [0.01, 0.5], "elasticNetParam": [0.0]},
        cv=2,
    ).fit(features_df)
    assert len(gs.cv_results_) == 2
    assert set(gs.best_params_) == {"regParam", "elasticNetParam"}
    # the weakly-regularized candidate must win on separable data
    assert gs.best_params_["regParam"] == 0.01
    assert 0.5 <= gs.best_score_ <= 1.0
    assert gs.best_model_ is not None


def test_randomized_search_cv(spark, features_df):
    from pyspark.ml.classification import LogisticRegression

    rs = RandomizedSearchCV(
        LogisticRegression(maxIter=10),
        {"regParam": [0.01, 0.1, 1.0]},
        n_iter=2,
        cv=2,
    ).fit(features_df)
    assert len(rs.cv_results_) == 2


def test_keyed_estimator_roundtrip(spark):
    """Per-key OLS through the full fit→models-DF→transform path must
    reproduce each group's closed-form fit."""
    rng = np.random.RandomState(29)
    frames = []
    for key, slope, icept in [("a", 2.0, 1.0), ("b", -3.0, 5.0)]:
        x = rng.rand(100)
        frames.append(
            pd.DataFrame(
                {"k": key, "x": x, "y": slope * x + icept + rng.randn(100) * 0.01}
            )
        )
    df = spark.createDataFrame(pd.concat(frames))
    model = KeyedEstimator(["k"], ["x"], "y", output_col="pred").fit(df)
    assert model.model_df.count() == 2
    out = model.transform(df).withColumn(
        "err", F.abs(F.col("pred") - F.col("y"))
    )
    assert out.agg(F.max("err")).first()[0] < 0.1


def test_converter_to_pandas_expands_vectors(spark, features_df):
    pdf = Converter().toPandas(features_df.limit(5))
    assert len(pdf) == 5
    assert len(pdf["features"].iloc[0]) == 4  # vector -> array


def test_converter_to_spark_linear_predictor(spark):
    class FakeSklearnModel:
        coef_ = np.array([1.0, 2.0, -1.0])
        intercept_ = np.array([0.5])

    pred = Converter().toSpark(FakeSklearnModel())
    df = spark.createDataFrame(
        pd.DataFrame({"f": [[1.0, 1.0, 1.0], [2.0, 0.0, 0.0]]})
    )
    got = [r["prediction"] for r in pred.transform(df, "f").collect()]
    assert got == [2.5, 2.5]


def test_converter_to_sklearn_raises_without_sklearn(spark):
    """The documented A8 raise is preserved when sklearn is absent."""
    try:
        import sklearn  # noqa: F401
    except ImportError:
        pass
    else:
        pytest.skip("sklearn installed — raise path not reachable")
    with pytest.raises(NotImplementedError, match="sklearn"):
        Converter().toSKLearn(object())


def test_converter_to_sklearn_materializes_linear_model(spark):
    """Optional-import A8 path: an MLlib LinearRegressionModel maps to
    a fitted sklearn LinearRegression with identical predictions."""
    pytest.importorskip("sklearn")
    from pyspark.ml.linalg import Vectors
    from pyspark.ml.regression import LinearRegression

    df = spark.createDataFrame(
        [(float(2 * a + 3 * b + 1), Vectors.dense([a, b]))
         for a, b in [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3)]],
        ["label", "features"],
    )
    model = LinearRegression(regParam=0.0).fit(df)
    sk = Converter().toSKLearn(model)
    got = sk.predict(np.array([[1.0, 2.0]]))[0]
    assert abs(got - (2 * 1 + 3 * 2 + 1)) < 1e-6


def test_grid_search_respects_metric_direction(spark):
    """With a smaller-is-better evaluator (rmse), best_params_ must be
    the argmin candidate — matching CrossValidator's own bestModel."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.regression import LinearRegression

    rng = np.random.RandomState(31)
    X = rng.rand(200, 3)
    y = X @ np.array([1.0, 2.0, 3.0]) + rng.randn(200) * 0.01
    pdf = pd.DataFrame({"emb": X.tolist(), "label": y})
    train = spark.createDataFrame(pdf).select(
        array_to_vector(F.col("emb").cast("array<double>")).alias("features"),
        F.col("label"),
    )
    gs = GridSearchCV(
        LinearRegression(maxIter=20),
        {"regParam": [0.0, 100.0]},
        evaluator=RegressionEvaluator(metricName="rmse"),
        cv=2,
    ).fit(train)
    # crushing regularization must NOT be reported as best
    assert gs.best_params_["regParam"] == 0.0
    scores = [r["mean_test_score"] for r in gs.cv_results_]
    assert gs.best_score_ == min(scores)


def test_random_search_draw_is_pinned():
    """q_ml_random_search's declared oracle hardcodes the seed-42
    candidate draw (data-independent constant). Re-derive it from the
    live sampler semantics so a sampler change fails HERE, not as a
    driver hash-mismatch."""
    import itertools
    import random

    from spark_sklearn_spark.queries.ml import RANDOM_DRAW_SEED42

    combos = list(
        itertools.product(
            [0.001, 0.005, 0.01, 0.05, 0.1, 0.5, 1.0],
            [0.0, 0.25, 0.5, 0.75, 1.0],
        )
    )
    assert random.Random(42).sample(combos, 3) == RANDOM_DRAW_SEED42


def test_keyed_cluster_invariants(spark, sf_dir):
    """Clusterer-role KeyedEstimator: per-user 2-means must satisfy
    c0 ≤ c1, n0+n1 = the user's event count, and the floor-micro
    centroids must EQUAL a driver-side replay of the exact
    3-iteration decimal-policy Lloyd fit (_fit2means_dec) — the
    q_emb_pca int64-replay precedent. A fixed-point "means within
    tolerance" assertion is wrong here: the 3-step cap can stop one
    step short of convergence by an unbounded margin on small
    per-user samples (r11 verdict: user_id=0 gap 1.207 at sf0.001)."""
    import math

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from spark_sklearn_spark.queries.ml import _fit2means_dec
    from spark_sklearn_spark.sources.io import load

    rows = entry.queries()["q_ml_keyed_cluster"](spark, sf_dir).collect()
    assert rows
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_list("value").alias("xs"))
        .collect()
    )
    by_user = {r["user_id"]: r for r in ev}
    assert len(rows) == len(by_user)
    for r in rows:
        assert r["c0_micro"] <= r["c1_micro"], r
        u = by_user[r["user_id"]]
        assert r["n0"] + r["n1"] == u["n"], r
        c0, c1, n0, n1 = _fit2means_dec([float(t) for t in u["xs"]])
        assert r["c0_micro"] == math.floor(c0 * 1000000), r
        assert r["c1_micro"] == math.floor(c1 * 1000000), r
        assert (r["n0"], r["n1"]) == (n0, n1), r


def test_keyed_estimator_clusterer_role_mechanism(spark, sf_dir):
    """A5 role parity: KeyedEstimator accepts a clusterer fit_fn, the
    per-key models survive the pickle round-trip as a
    models-as-DataFrame, and each unpickled model predicts in {0,1}."""
    import pickle

    from pyspark.sql import functions as F

    from spark_sklearn_spark.ml_api import KeyedEstimator
    from spark_sklearn_spark.queries.ml import _kmeans_fit
    from spark_sklearn_spark.sources.io import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("value").alias("x")
    )
    km = KeyedEstimator(
        key_cols=["user_id"], x_cols=["x"], fit_fn=_kmeans_fit
    ).fit(ev)
    rows = km.model_df.collect()
    assert rows and set(km.model_df.columns) == {"user_id", "__model"}
    m = pickle.loads(rows[0]["__model"])
    assert m.c0 <= m.c1
    assert m.predict(m.c0) == 0 and m.predict(m.c1) in (0, 1)


def test_csr_vector_udt_roundtrip(spark):
    """A10: CSRVectorUDT round-trips a sparse row through a DataFrame
    column. Without scipy, deserialize yields a SparseVector with the
    same (size, indices, values)."""
    from pyspark.sql.types import StructField, StructType

    from spark_sklearn_spark.udt import CSRVector, CSRVectorUDT

    udt = CSRVectorUDT()
    vec = CSRVector(5, [1, 3], [2.0, -4.5])
    schema = StructType([StructField("v", udt)])
    df = spark.createDataFrame([(vec,)], schema)
    got = df.collect()[0]["v"]
    try:
        import scipy.sparse as sp

        assert sp.issparse(got)
        assert got.shape == (1, 5)
        assert list(got.indices) == [1, 3]
        assert list(got.data) == [2.0, -4.5]
    except ImportError:
        from pyspark.ml.linalg import SparseVector

        assert got == SparseVector(5, [1, 3], [2.0, -4.5])


def test_csr_vector_udt_accepts_sparse_vector(spark):
    from pyspark.ml.linalg import SparseVector

    from spark_sklearn_spark.udt import CSRVectorUDT

    udt = CSRVectorUDT()
    assert udt.serialize(SparseVector(4, [0, 2], [1.0, 3.0])) == (
        4, [0, 2], [1.0, 3.0],
    )


def test_keyed_model_transform_keeps_unseen_keys(spark):
    """transform() must not silently drop rows whose key was unseen at
    fit time — they stay, with a NULL prediction."""
    train = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 10, "x": np.linspace(0, 1, 10),
                      "y": np.linspace(0, 2, 10)})
    )
    model = KeyedEstimator(["k"], ["x"], "y", output_col="pred").fit(train)
    score = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "zz"], "x": [0.5, 0.5]})
    )
    rows = {r["k"]: r["pred"] for r in model.transform(score).collect()}
    assert set(rows) == {"a", "zz"}
    assert rows["a"] is not None and abs(rows["a"] - 1.0) < 1e-6
    assert rows["zz"] is None
