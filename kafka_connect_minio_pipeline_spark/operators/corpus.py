"""Corpus-layout operators: deterministic global shuffle, shard
assignment, and train/val/test splitting for training-data export
(SURVEY.md §2.4 LLM-curation surface; tail registry position — verified
by the local DuckDB parity net like the other tail families).

A training run needs the corpus in a pseudo-random but REPRODUCIBLE
order, cut into shards a loader can consume in parallel, with held-out
validation/test splits that stay stable when the corpus is regenerated.
All three come from one portable md5-derived hash of the stable document
id (the same hash primitive as ``llm_sample_stratified`` /
``llm_target_mix``): no RNG state, no driver-side pass, rerun-identical
on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import Query
from ..tables import load
from .llmdata import _HASH_SPACE, _portable_hash

N_SHARDS = 8
# hash-space fractions: [0, .90) train / [.90, .95) val / [.95, 1) test
SPLIT_BOUNDS = (0.90, 0.95)


def shuffle_split(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS,
    bounds: tuple[float, float] = SPLIT_BOUNDS,
) -> DataFrame:
    """Deterministic shuffle + shard + split assignment per document.

    Two INDEPENDENT hashes (salted differently) drive split membership
    and shuffle order, so the validation set is itself shuffled rather
    than being the tail of the training order. Shard = pmod(order_hash,
    n_shards) spreads documents evenly; position = row_number within
    shard by (order_hash, id) is the loader's read order. The only
    shuffle is the per-shard window, whose partition count is
    ``n_shards`` — at 100 TB raise ``n_shards`` to O(output files)
    (it is the write parallelism anyway), or drop the position column
    and let shard files stay unordered (loaders that shuffle in-memory
    don't need it) for a fully narrow plan.
    """
    split_hash = _portable_hash(F.concat(F.lit("split:"), F.col(id_col)))
    order_hash = _portable_hash(F.concat(F.lit("order:"), F.col(id_col)))
    lo = F.floor(F.lit(bounds[0]) * _HASH_SPACE)
    hi = F.floor(F.lit(bounds[1]) * _HASH_SPACE)
    split = (
        F.when(split_hash < lo, "train")
        .when(split_hash < hi, "val")
        .otherwise("test")
    )
    assigned = df.select(
        id_col,
        split.alias("split"),
        F.pmod(order_hash, F.lit(n_shards)).cast("int").alias("shard"),
        order_hash.alias("order_hash"),
    )
    w = Window.partitionBy("shard").orderBy("order_hash", id_col)
    return assigned.select(
        id_col,
        "split",
        "shard",
        F.row_number().over(w).cast("int").alias("position"),
    )


def q_corpus_shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: shuffle/shard/split layout of ``documents``."""
    return shuffle_split(load(spark, sf_dir, "documents"))


_MD5 = "('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"

SQL_CORPUS_SHUFFLE_SPLIT = f"""
    WITH assigned AS (
        SELECT doc_id,
               CASE WHEN {_MD5.format(salt='split:')}
                         < CAST(FLOOR({SPLIT_BOUNDS[0]} * {_HASH_SPACE}) AS BIGINT)
                    THEN 'train'
                    WHEN {_MD5.format(salt='split:')}
                         < CAST(FLOOR({SPLIT_BOUNDS[1]} * {_HASH_SPACE}) AS BIGINT)
                    THEN 'val'
                    ELSE 'test' END AS split,
               CAST({_MD5.format(salt='order:')} % {N_SHARDS} AS INTEGER) AS shard,
               {_MD5.format(salt='order:')} AS order_hash
        FROM documents)
    SELECT doc_id, split, shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY order_hash, doc_id) AS INTEGER)
               AS position
    FROM assigned
"""


QUERIES = {
    "corpus_shuffle_split": Query(q_corpus_shuffle_split, SQL_CORPUS_SHUFFLE_SPLIT),
}
