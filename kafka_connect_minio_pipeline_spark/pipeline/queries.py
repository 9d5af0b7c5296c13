"""Registered queries for the reference pipeline surface (SURVEY §2.2-2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import Query
from ..tables import load
from .profile import (
    RECONCILE_SQL,
    TRANSFORM_SQL,
    profile_transform,
    reconcile,
    users_from_customer,
)


def _users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return users_from_customer(load(spark, sf_dir, "customer"))


def q_profile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full SMT dataflow A8-A16 (minus nondeterministic
    processed_ts, excluded from hashing per SURVEY A14)."""
    return profile_transform(_users(spark, sf_dir))


def q_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verifier analytics A17-A23: source-vs-sink classification."""
    users = _users(spark, sf_dir)
    return reconcile(users, profile_transform(users))


QUERIES = {
    "profile_transform": Query(q_profile_transform, TRANSFORM_SQL, headline=True),
    "profile_reconciliation": Query(q_reconciliation, RECONCILE_SQL),
}
