"""User-defined aggregate surface (SURVEY.md §2.4 UDF/UDAF row).

The reference has zero UDFs — its one SMT decomposes into built-ins
(SURVEY A8-A16) — so this module exists to prove the escape hatches:
a GROUPED_AGG pandas UDF (Arrow-batched custom aggregate), a Python
UDTF (row-generating table function), and an applyInPandas GROUPED MAP
(whole group in, transformed rows out) — each registered beside a
built-in twin or SQL oracle so the Python boundary's cost and
exactness story is measured, not assumed.

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

from ..functions.exact import cents
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
        # rows with an undefined weight or value (e.g. malformed props
        # JSON -> NULL k) are excluded from BOTH numerator and
        # denominator — the SQL oracle's NULL-skipping SUM semantics;
        # an unguarded astype("int64") would throw on the first NaN
        mask = weight.notna() & cents.notna()
        w = weight[mask].astype("int64")
        num = int((cents[mask].astype("int64") * w).sum())
        den = int(w.sum())
        return float("nan") if den == 0 else num / den / 100.0

    return weighted_value_cents


def q_udaf_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: value-weighted mean (weight = props.k) via a
    GROUPED_AGG pandas UDF. The cents conversion happens JVM-side so the
    Python kernel only sees exact integers."""
    weighted_value_cents = weighted_value_cents_udaf()
    events = load(spark, sf_dir, "events")
    # rlike pre-guard = the SHARED integer-acceptance grammar with the
    # oracle's regex (see scalar.py q_scalar_json): try_cast alone would
    # trim ' 12 ' where the oracle regex rejects it; \z anchor because
    # java regex '$' would accept a trailing-newline value the oracle's
    # RE2 '$' rejects (ADVICE r6).
    s = F.get_json_object(F.col("props"), "$.k")
    k = F.when(s.rlike(r"^[+-]?[0-9]+\z"), s).try_cast("long")
    cents_col = cents(F.col("value"))
    return (
        events.select("event_type", cents_col.alias("cents"), k.alias("k"))
        .groupBy("event_type")
        # NB: a GROUPED_AGG pandas UDF cannot share agg() with built-in
        # aggregate functions (INVALID_PANDAS_UDF_PLACEMENT) — one UDAF
        # per aggregation, or join two aggregations.
        .agg(weighted_value_cents(F.col("cents"), F.col("k")).alias("weighted_value"))
    )


SQL_UDAF_WEIGHTED = """
    SELECT event_type,
           SUM(CAST(ROUND(value * 100) AS BIGINT)
               * TRY_CAST(CASE WHEN regexp_matches((CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END), '^[+-]?[0-9]+$') THEN (CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) END AS BIGINT)) * 1.0
           / SUM(TRY_CAST(CASE WHEN regexp_matches((CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END), '^[+-]?[0-9]+$') THEN (CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) END AS BIGINT)) / 100.0
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


ZNORM_OUT = "user_id bigint, event_id bigint, znorm double"


def q_udf_grouped_znorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-normalization of ``value`` via applyInPandas GROUPED
    MAP — the third pandas escape hatch alongside the GROUPED_AGG UDAF
    and the UDTF: the whole group arrives as one Arrow batch and the
    kernel returns transformed ROWS (the shape per-entity normalizers,
    detrenders, and model-scoring passes take).

    Exactness inside the kernel follows the module rule: moments come
    from exact int64 CENT sums (order-free — group row order is not
    deterministic across shuffles), and the per-row z closes in one
    double tree identical to the oracle's. Single-row groups emit NULL
    (sample std undefined). Scale: one hash shuffle on the group key,
    Arrow both ways; state is one group per call — the built-in twin
    below does the same in pure window algebra with no Python boundary
    and is the production recommendation.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        cents(F.col("value")).alias("cents"),
    )

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf["cents"].astype("int64")
        n = len(c)
        s1 = int(c.sum())
        s2 = int((c * c).sum())
        out = pdf[["user_id", "event_id"]].copy()
        if n < 2:
            out["znorm"] = None
            return out
        # mirror the ORACLE's double tree exactly: the oracle squares s1
        # AFTER casting to double, so an exact-integer s1*s1 here would
        # diverge once s1² exceeds 2^53 (measured: the 1-ulp difference
        # is amplified by cancellation in s2 − s1²/n and flips the
        # rounded z in low-variance giant groups)
        import math

        s1d, s2d, nd = float(s1), float(s2), float(n)
        mean = s1d / nd
        var = (s2d - s1d * s1d / nd) / (nd - 1.0)
        if var > 0:
            # math.sqrt, not **0.5 (pow is not guaranteed bit-equal);
            # rounding via floor(|x|·1e6 + 0.5) = C std::round = the
            # binary-domain half-away DuckDB ROUND applies — pandas'
            # default .round is half-EVEN and splits at exact ties
            z = (c - mean) / math.sqrt(var)
            import numpy as np

            out["znorm"] = np.copysign(
                np.floor(np.abs(z) * 1e6 + 0.5) / 1e6, z
            )
        else:
            out["znorm"] = None
        return out

    return ev.groupBy("user_id").applyInPandas(znorm, ZNORM_OUT)


def q_udf_grouped_znorm_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in twin of :func:`q_udf_grouped_znorm`: identical moments
    from the same exact integer-cent sums, computed as one grouped
    aggregation + join-back — whole-stage codegen, no Python boundary,
    same oracle."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        cents(F.col("value")).alias("cents"),
    )
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / n
    ) / (n - F.lit(1.0))
    z = (F.col("cents").cast("double") - mean) / F.sqrt(var)
    return (
        ev.join(stats, "user_id")
        .select(
            "user_id",
            "event_id",
            F.when((F.col("n") > 1) & (var > 0), F.round(z, 6)).alias("znorm"),
        )
    )


SQL_UDF_GROUPED_ZNORM = """
    WITH ev AS (
        SELECT user_id, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events),
    stats AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(cents) AS s1, SUM(cents * cents) AS s2
        FROM ev GROUP BY user_id)
    SELECT e.user_id, e.event_id,
           CASE WHEN n > 1
                     AND (CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) > 0
                THEN ROUND((CAST(e.cents AS DOUBLE)
                            - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                           / SQRT((CAST(s2 AS DOUBLE)
                                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                  / (CAST(n AS DOUBLE) - 1.0)), 6)
           END AS znorm
    FROM ev e JOIN stats USING (user_id)
"""


QUERIES = {
    "udf_grouped_znorm": Query(q_udf_grouped_znorm, SQL_UDF_GROUPED_ZNORM),
    "udf_grouped_znorm_builtin": Query(
        q_udf_grouped_znorm_builtin, SQL_UDF_GROUPED_ZNORM
    ),
    "udaf_weighted_value": Query(q_udaf_weighted_value, SQL_UDAF_WEIGHTED),
    "udtf_sentences": Query(q_udtf_sentences, SQL_UDTF_SENTENCES),
    "udtf_sentences_builtin": Query(q_sentences_builtin, SQL_UDTF_SENTENCES),
}
