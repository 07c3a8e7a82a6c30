"""spark_sklearn_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the public
``databricks/spark-sklearn`` library (reference mirror at
``/root/reference/`` — empty at build time, see SURVEY.md §0; public
paths cited as ``python/spark_sklearn/<file>.py``), extended with the
relational / streaming / LLM-data-pipeline operator surface declared
in SURVEY.md §2B.

Design stance (SURVEY.md §1.3): DataFrame/SQL first so Catalyst +
Tungsten own optimization and physical execution; Arrow-batched
pandas UDFs only where built-in operators cannot express semantics;
zero RDD code outside MLlib internals.
"""

__version__ = "0.2.0"

from .session import createLocalSparkSession  # noqa: F401

# The reference's public class surface (SURVEY.md §2A), MLlib-native.
from .ml_api import (  # noqa: F401
    Converter,
    GridSearchCV,
    KeyedEstimator,
    KeyedModel,
    RandomizedSearchCV,
)
from .operators.gapply import gapply  # noqa: F401
