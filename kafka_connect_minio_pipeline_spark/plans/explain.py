"""Physical-plan introspection helpers.

The efficiency contract of this engine is that operators compile to the
*right* plan, not just a correct one: filters reach the parquet scan,
dimension joins broadcast, aggregations combine map-side, global top-k
never global-sorts. These helpers make those properties assertable in
tests (tests/test_plans.py) so a regression in plan shape fails CI like a
wrong answer would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan is missing {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def global_window_lines(df: DataFrame) -> list[str]:
    """Physical-plan Window nodes with an EMPTY partition spec — each one
    is a single-task bottleneck (every row through one executor thread).

    A partitioned Window prints as ``Window [fns], [partition], [order]``
    (three bracket groups); a global one as ``Window [fns], [order]``.
    Scale-conscious plans should have none, or only ones over
    bounded-cardinality relations (which callers must allowlist
    explicitly by inspecting the returned lines).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in plan.splitlines():
        stripped = line.lstrip(" +-:*()0-9")
        if stripped.startswith("Window ") and stripped.count("], [") == 1:
            out.append(stripped)
    return out
