"""CSRVectorUDT — the reference's one custom SQL type, re-expressed
on Spark's UserDefinedType API (public path python/spark_sklearn/
udt.py ≈L1-90: a UDT wrapping scipy.sparse.csr_matrix rows).

Storage layout is the same struct MLlib's VectorUDT uses for sparse
vectors — ``struct<size:int, indices:array<int>, values:array<double>>``
— so data written by this UDT is column-compatible with vector_to_array
pipelines. scipy is optional in this environment (SURVEY §0):

- ``serialize`` accepts a 1×n ``scipy.sparse.csr_matrix`` row, a
  ``pyspark.ml.linalg.SparseVector``, or a plain ``(size, indices,
  values)`` triple;
- ``deserialize`` returns a csr_matrix when scipy is importable and a
  ``SparseVector`` otherwise — same numbers, engine-native container.

A user porting reference code that constructs CSRVectorUDT directly
gets the class and the round-trip; nothing else in this repo depends
on it (VectorUDT + q_ml_vector_roundtrip cover the vector boundary).
"""

from __future__ import annotations

from pyspark.ml.linalg import SparseVector
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    UserDefinedType,
)


def _scipy_sparse():
    try:
        import scipy.sparse as sp

        return sp
    except ImportError:
        return None


class CSRVector:
    """Plain-Python CSR row value for DataFrame construction.

    PySpark's schema verifier accepts a UDT column value only if the
    object carries ``__UDT__`` — scipy matrices and raw tuples don't,
    so this thin value class is the construction-side container
    (``deserialize`` hands back scipy / SparseVector, which need no
    marker because collect() bypasses the verifier)."""

    def __init__(self, size, indices, values):
        self.size = int(size)
        self.indices = [int(i) for i in indices]
        self.values = [float(v) for v in values]

    def __eq__(self, other):
        return (
            isinstance(other, CSRVector)
            and self.size == other.size
            and self.indices == other.indices
            and self.values == other.values
        )

    def __repr__(self):
        return f"CSRVector({self.size}, {self.indices}, {self.values})"


CSRVector.__UDT__ = None  # assigned below, after CSRVectorUDT exists


class CSRVectorUDT(UserDefinedType):
    """SQL type for one CSR row (a sparse feature vector)."""

    @classmethod
    def sqlType(cls) -> StructType:
        return StructType(
            [
                StructField("size", IntegerType(), False),
                StructField("indices", ArrayType(IntegerType(), False), False),
                StructField("values", ArrayType(DoubleType(), False), False),
            ]
        )

    @classmethod
    def module(cls) -> str:
        return "spark_sklearn_spark.udt"

    def serialize(self, obj):
        if isinstance(obj, CSRVector):
            return (obj.size, obj.indices, obj.values)
        sp = _scipy_sparse()
        if sp is not None and sp.issparse(obj):
            csr = obj.tocsr()
            if csr.shape[0] != 1:
                raise ValueError(
                    f"CSRVectorUDT serializes one row at a time; got shape "
                    f"{csr.shape}"
                )
            return (
                int(csr.shape[1]),
                [int(i) for i in csr.indices],
                [float(v) for v in csr.data],
            )
        if isinstance(obj, SparseVector):
            return (
                int(obj.size),
                [int(i) for i in obj.indices],
                [float(v) for v in obj.values],
            )
        if isinstance(obj, (tuple, list)) and len(obj) == 3:
            size, indices, values = obj
            return (
                int(size),
                [int(i) for i in indices],
                [float(v) for v in values],
            )
        raise TypeError(
            f"cannot serialize {type(obj).__name__} as CSRVectorUDT"
        )

    def deserialize(self, datum):
        size, indices, values = datum
        sp = _scipy_sparse()
        if sp is not None:
            return sp.csr_matrix((values, indices, [0, len(indices)]), shape=(1, size))
        return SparseVector(size, list(indices), list(values))

    def simpleString(self) -> str:
        return "csrvector"


CSRVector.__UDT__ = CSRVectorUDT()
