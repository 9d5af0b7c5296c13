"""Set operators (SURVEY.md §2.4 set ops row).

The reference's only set-flavored operation is the verifier's key-space
union inside the reconciliation (A18). These generalize it: UNION ALL /
INTERSECT / EXCEPT over customer key sets derived from order status.

Scale: INTERSECT/EXCEPT compile to aggregate + join on the compare keys —
a single co-partitioned shuffle; UNION ALL is shuffle-free concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Query
from ..tables import load


def _status_keys(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select("o_custkey")
        .distinct()
    )


def q_setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset union of open-order and finished-order customer key sets,
    tagged per side (unionByName keeps column resolution by name)."""
    open_ = _status_keys(spark, sf_dir, "O").withColumn("side", F.lit("open"))
    finished = _status_keys(spark, sf_dir, "F").withColumn("side", F.lit("finished"))
    return open_.unionByName(finished)


SQL_SETOP_UNION_ALL = """
    SELECT o_custkey, 'open' AS side
    FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT o_custkey, 'finished' AS side
    FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with BOTH open and finished orders (set semantics)."""
    return _status_keys(spark, sf_dir, "O").intersect(
        _status_keys(spark, sf_dir, "F")
    )


SQL_SETOP_INTERSECT = """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open orders but no finished ones."""
    return _status_keys(spark, sf_dir, "O").exceptAll(
        _status_keys(spark, sf_dir, "F")
    )


SQL_SETOP_EXCEPT = """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def _status_multiset(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    """Per-order custkey rows (NOT distinct) — duplicates preserved so the
    ALL-variants have observable multiset semantics."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select("o_custkey")
    )


def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection: each custkey kept min(#open, #finished) times."""
    return _status_multiset(spark, sf_dir, "O").intersectAll(
        _status_multiset(spark, sf_dir, "F")
    )


SQL_SETOP_INTERSECT_ALL = """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: each custkey kept max(#open − #finished, 0) times."""
    return _status_multiset(spark, sf_dir, "O").exceptAll(
        _status_multiset(spark, sf_dir, "F")
    )


SQL_SETOP_EXCEPT_ALL = """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


QUERIES = {
    "setop_union_all": Query(q_setop_union_all, SQL_SETOP_UNION_ALL),
    "setop_intersect": Query(q_setop_intersect, SQL_SETOP_INTERSECT),
    "setop_except": Query(q_setop_except, SQL_SETOP_EXCEPT),
    "setop_intersect_all": Query(q_setop_intersect_all, SQL_SETOP_INTERSECT_ALL),
    "setop_except_all": Query(q_setop_except_all, SQL_SETOP_EXCEPT_ALL),
}
