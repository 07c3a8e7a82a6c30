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


def test_converter_to_sklearn_raises(spark):
    with pytest.raises(NotImplementedError, match="sklearn"):
        Converter().toSKLearn(object())


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
