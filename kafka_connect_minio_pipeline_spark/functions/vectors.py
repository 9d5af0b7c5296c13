"""Vector expression helpers for embedding columns (array<float>).

All JVM-side higher-order functions — no Python boundary in the hot path.
The fold in :func:`dot` is sequential in index order, which makes it
bit-identical to DuckDB's ``list_dot_product`` over ``DOUBLE[]`` (verified
empirically over every pair at sf0.001): cosine scores are therefore
hash-comparable across engines as long as BOTH sides use the same final
formula ``dot / (sqrt(norm_a) * sqrt(norm_b))``.

Float32 inputs are cast to double per element first — DuckDB's native
FLOAT[] kernels accumulate in float32 which can never match JVM double
accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_from_parts(dot_ab: Column, norm_sq_a: Column, norm_sq_b: Column) -> Column:
    """cosine = dot / (sqrt(|a|²) * sqrt(|b|²)) — keep this exact expression
    shape on the oracle side too (sqrt-of-product rounds differently)."""
    return dot_ab / (F.sqrt(norm_sq_a) * F.sqrt(norm_sq_b))


# DuckDB fragments with matching evaluation shape
SQL_DOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
SQL_NORM_SQ = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))"
