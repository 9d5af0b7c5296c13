"""Exactness helpers for oracle-comparable aggregates.

The driver's correctness gate hashes cell values with no tolerance, but
double-precision SUMs are order-dependent and Spark's partial (map-side)
aggregation will never add values in the same order as DuckDB. Two rules
make aggregates bit-comparable without giving up distributed execution:

1. Money/quantity columns in the test data are cent-exact, so casting to
   DECIMAL(18,2) per row loses nothing and decimal SUM is exact integer
   arithmetic — associative, order-independent, and identical across
   engines. (This is also the TPC-H-canonical treatment.)
2. Where a float expression is unavoidable (avg, sqrt, ln), keep the
   expression tree identical on both sides so IEEE-754 evaluation is
   bit-identical, and round only at the end.

At 100 TB nothing changes: decimal sums use Spark's built-in partial
aggregation (map-side combine), so the shuffle carries one row per group
per partition, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(c: Column) -> Column:
    """Per-row cast to DECIMAL(18,2) — exact for cent-denominated data."""
    return c.cast("decimal(18,2)")


def cents(c: Column) -> Column:
    """Exact integer cents of a cent-denominated double (the quantization
    every Python-kernel exactness argument in functions/udafs.py rests
    on): ROUND(value·100) as long. Values are cent-exact by fixture
    contract, so the double product sits within 0.5 ulp of an integer
    and the round can never tie."""
    return F.round(c * 100).cast("long")


def dec9(c: Column, precision: int = 28) -> Column:
    """Pre-round a FLOAT expression to 9 decimals and quantize to
    DECIMAL(precision,9), making a subsequent SUM order-free and
    cross-engine exact — the portability idiom for log/ratio terms
    (entropy, Zipf log-log co-moments, 1/ln(degree) weights, per-cell
    variance terms) whose raw double sums would accumulate in engine
    partition order. Mirror in DuckDB as
    ``CAST(ROUND(expr, 9) AS DECIMAL(precision,9))``.

    Keep ``precision`` ≤ 18 when the quantized values are MULTIPLIED
    before the sum: (18,9)×(18,9) → (37,18) still fits a decimal128,
    while wider operands would push the product past precision 38 and
    Spark silently reduces its scale (a correctness trap, not an
    error).
    """
    return F.round(c, 9).cast(f"decimal({precision},9)")


def dec12(c: Column) -> Column:
    """Quantize a double term to DECIMAL(28,12) so the following SUM is
    order-free and cross-engine exact (the dec9 idiom, two digits wider
    because gradient terms are products of two z-scored features).

    DIRECT cast, never ROUND(x, 12) first: at scale 12 DuckDB's ROUND
    (float multiply-round-divide) and Spark's (exact decimal HALF_UP)
    disagree often enough that ten unrolled gradient steps accumulated a
    visible ~3e-12 weight drift (r11 finding, caught by the
    text_classifier_weights oracle); the double→decimal cast is the
    exact-conversion path both engines implement identically — the
    ``similarity_kmeans`` decimal(16,6) precedent."""
    return c.cast("decimal(28,12)")


def sum_dec2(c: Column) -> Column:
    """Order-independent exact sum of a cent-exact column, emitted as double.

    The sum itself is exact decimal arithmetic; the final cast to double is
    deterministic (IEEE nearest of the exact value), giving a result that is
    bit-identical across engines AND survives every client fetch path —
    DuckDB's pandas conversion turns DECIMAL into float64, so decimal output
    types would compare differently depending on how results are collected.
    """
    return F.sum(dec2(c)).cast("double")


def revenue(extendedprice: Column, discount: Column) -> Column:
    """TPC-H style discounted revenue term, exact decimal arithmetic.

    (18,2) * (1 - (18,2)) → scale-4 decimal; summed exactly.
    """
    return dec2(extendedprice) * (F.lit(1) - dec2(discount))


def sum_revenue(extendedprice: Column, discount: Column) -> Column:
    return F.sum(revenue(extendedprice, discount)).cast("double")


# SQL fragments mirroring the helpers above (DuckDB oracle side).
SQL_SUM_DEC2 = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"
SQL_SUM_REVENUE = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)
SQL_COUNT = "CAST(COUNT(*) AS BIGINT)"
