"""Vector math over ``array<float>`` embedding columns — pure Spark SQL
expressions (zip_with + aggregate), no UDFs, so they run JVM-side.

Determinism: elements are cast to double *before* any arithmetic, and both
``aggregate`` (Spark) and DuckDB's list functions fold left-to-right, so
dot products / norms / cosine are bit-identical across engines — thresholds
and rankings in oracle-checked queries are stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
