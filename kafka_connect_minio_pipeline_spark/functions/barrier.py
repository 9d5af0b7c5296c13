"""Optimizer barrier: keep a threshold filter ABOVE the projection that
computes its (expensive) input column.

The problem (spark_optimization_guide §4.4's duplicated-evaluation
mechanism, hitting built-ins instead of UDFs): Catalyst's predicate
pushdown substitutes a filter's column references with the defining
expressions and pushes the predicate through projections into the join
below. For the near-dup verify joins the predicate is
``jaccard >= t`` where ``jaccard`` is derived from
``size(array_intersect(arr1, arr2))`` over the two sides' shingle
arrays — after pushdown the physical join CONDITION evaluates the
array intersection per candidate row (twice: the Jaccard ratio
references ``n_common`` in both numerator and denominator) and the
projection above evaluates it a third time for the output column.
There is no common-subexpression elimination across a join condition
and its parent project, so every verified pair pays the O(|arr1| +
|arr2|) hash-set intersection 3x (measured on dedup_ngram_jaccard at
sf0.1: see OPTIMIZATION_r14.md).

The fix: materialize the expensive value as a column in one projection
and keep the filter from being pushed through it. A deterministic
filter over a fully deterministic projection is always pushed, so the
projection gains a nondeterministic no-op column and the predicate
gains a nondeterministic no-op disjunct referencing it:

    Filter (cond OR _plan_barrier < 0)
    +- Project [..., expensive AS x, monotonically_increasing_id() AS _plan_barrier]

- the projection is nondeterministic -> the filter cannot be pushed
  through it (PushPredicateThroughNonJoin requires a deterministic
  child projection);
- the predicate references the nondeterministic column -> column
  pruning cannot drop the barrier column and re-open the pushdown;
- the disjunct is value-neutral: ``monotonically_increasing_id()`` is
  ``(partition_id << 33) | row_index`` — non-negative for any
  partition id < 2^30 (Spark caps task partitions far below that), so
  ``< 0`` is always false and rows pass exactly when ``cond`` holds.

The result is exactness-preserving by construction (same rows, same
columns) and every consumer re-proves it against the DuckDB oracles
each run. Cost: one extra long per row inside one stage, dropped by
the parent projection; in exchange the intersection runs once per
candidate instead of three times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BARRIER = "_plan_barrier"


def filter_above(df: DataFrame, cond: Column) -> DataFrame:
    """Apply ``cond`` as a Filter that stays ABOVE ``df``'s projections.

    Semantically identical to ``df.filter(cond)`` (the extra disjunct is
    always false, the barrier column is dropped); physically it pins the
    filter above the projection that computes ``cond``'s inputs, so an
    expensive derived column (array intersection, lattice score) is
    evaluated once instead of being duplicated into the join condition
    below. See the module docstring for the mechanism.
    """
    if _BARRIER in df.columns:
        # withColumn would silently REPLACE a caller's column of the
        # same name and the closing drop would remove it from the output.
        raise ValueError(
            f"filter_above: input already has a {_BARRIER!r} column"
        )
    return (
        df.withColumn(_BARRIER, F.monotonically_increasing_id())
        .filter(cond | (F.col(_BARRIER) < 0))
        .drop(_BARRIER)
    )
