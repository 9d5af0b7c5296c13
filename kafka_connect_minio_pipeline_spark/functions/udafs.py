"""User-defined aggregate surface (SURVEY.md §2.4 UDF/UDAF row).

The reference has zero UDFs — its one SMT decomposes into built-ins
(SURVEY A8-A16) — so this module exists to prove the escape hatch: a
GROUPED_AGG pandas UDF (Arrow-batched, whole group per call, no partial
aggregation) for aggregation logic Spark's built-ins can't express.

Exactness design: float sums are order-dependent and group row order is
not deterministic across shuffles, so the kernel does its arithmetic on
exact integers (cents × weight) and divides once at the end — the same
value DuckDB computes, bit-for-bit, regardless of row order. This is the
pattern for ANY oracle-comparable custom aggregate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import Query
from ..tables import load, spread


def weighted_value_cents_udaf():
    """Weight-averaged value from exact integer cents (order-independent).

    Built lazily: @pandas_udf parses its return type through the active
    SparkSession, so decorating at module import would require a session
    before the registry can even be listed.
    """

    @pandas_udf("double")
    def weighted_value_cents(cents: pd.Series, weight: pd.Series) -> float:
        w = weight.astype("int64")
        num = int((cents.astype("int64") * w).sum())
        den = int(w.sum())
        return float("nan") if den == 0 else num / den / 100.0

    return weighted_value_cents


def q_udaf_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: value-weighted mean (weight = props.k) via a
    GROUPED_AGG pandas UDF. The cents conversion happens JVM-side so the
    Python kernel only sees exact integers."""
    weighted_value_cents = weighted_value_cents_udaf()
    events = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.select("event_type", cents.alias("cents"), k.alias("k"))
        .groupBy("event_type")
        # NB: a GROUPED_AGG pandas UDF cannot share agg() with built-in
        # aggregate functions (INVALID_PANDAS_UDF_PLACEMENT) — one UDAF
        # per aggregation, or join two aggregations.
        .agg(weighted_value_cents(F.col("cents"), F.col("k")).alias("weighted_value"))
    )


SQL_UDAF_WEIGHTED = """
    SELECT event_type,
           SUM(CAST(ROUND(value * 100) AS BIGINT)
               * CAST(json_extract_string(props, '$.k') AS BIGINT)) * 1.0
           / SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) / 100.0
               AS weighted_value
    FROM events GROUP BY event_type
"""


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input doc → N sentence rows via
    a LATERAL call. The split logic itself is trivially expressible in
    SQL (the oracle proves it); the point is the UDTF plumbing — arrow
    batches in, iterator of rows out, composable in the FROM clause.
    Built lazily for the same session-dependency reason as the UDAF.

    NOT the recommended path: this is the escape-hatch demo. The built-in
    twin :func:`q_sentences_builtin` computes the identical result with
    ``posexplode(split(...))`` — pure JVM, whole-stage codegen, no Python
    boundary — and is what production code should use."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, sentence string")
    class SentenceSplitter:
        def eval(self, doc_id, text):
            for i, s in enumerate(text.split(". ")):
                if s != "":
                    yield doc_id, i, s

    spark.udtf.register("kcm_split_sentences", SentenceSplitter)
    spread(load(spark, sf_dir, "documents"), "doc_id").createOrReplaceTempView(
        "kcm_docs_udtf"
    )
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence
        FROM kcm_docs_udtf d,
             LATERAL kcm_split_sentences(d.doc_id, d.text) s
        """
    )


SQL_UDTF_SENTENCES = """
    WITH t AS (SELECT doc_id, string_split(text, '. ') AS parts FROM documents)
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS sent_idx,
           parts[i] AS sentence
    FROM t, UNNEST(RANGE(1, GREATEST(LEN(parts) + 1, 1))) r(i)
    WHERE parts[i] <> ''
"""


def q_sentences_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommended built-in twin of :func:`q_udtf_sentences`: the same
    doc → sentence-rows expansion as ``posexplode(split(text, '\\. '))`` —
    stays in whole-stage codegen, no Python row boundary. Registered next
    to the UDTF demo (same oracle) so the registry shows the built-in path
    and the escape hatch side-by-side."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"\. ")).alias("sent_idx", "sentence"),
        )
        .filter(F.col("sentence") != "")
        .select("doc_id", "sent_idx", "sentence")
    )


QUERIES = {
    "udaf_weighted_value": Query(q_udaf_weighted_value, SQL_UDAF_WEIGHTED),
    "udtf_sentences": Query(q_udtf_sentences, SQL_UDTF_SENTENCES),
    "udtf_sentences_builtin": Query(q_sentences_builtin, SQL_UDTF_SENTENCES),
}
