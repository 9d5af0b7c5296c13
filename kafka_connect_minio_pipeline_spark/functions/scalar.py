"""Scalar function surface (SURVEY.md §2.4 scalar fns row).

Generalizes the reference's per-record expressions (trim/concat from the
SMT filter+derive, A9/A12) into the full string/date/math/JSON built-in
surface. All JVM-side `pyspark.sql.functions` — these stay inside
whole-stage codegen, so per-row cost is a fused loop, no Python boundary.

Cross-engine gotchas encoded below (found the hard way, kept as law):
- DuckDB regexp_replace is first-match unless the 'g' flag is passed;
  Spark's is always global.
- DuckDB DAYOFWEEK is 0-based Sunday, Spark's 1-based — avoided entirely.
- math fns (sqrt/ln/exp) are per-row IEEE-identical, but their SUM is not
  order-stable → emit per-row values, round at the end, never sum doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import sum_dec2
from ..registry import Query
from ..tables import load


def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernel: case, trim/pad, substring, regex mask, split/size.

    The regex digit-mask is the generalization of the reference's constant
    email mask (UserProfileTransform.java:61-62) to pattern-based PII
    masking.
    """
    customer = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return customer.select(
        "c_custkey",
        F.lower(name).alias("lower_name"),
        F.upper(name).alias("upper_name"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 8).alias("name_prefix"),
        F.regexp_replace(name, "[0-9]", "#").alias("masked_name"),
        F.concat_ws("|", name, F.col("c_mktsegment")).alias("tagged"),
        F.size(F.split(name, "#")).alias("n_parts"),
        F.reverse(name).alias("rev_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
    )


SQL_SCALAR_STRING = """
    SELECT c_custkey,
           LOWER(c_name) AS lower_name,
           UPPER(c_name) AS upper_name,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS masked_name,
           c_name || '|' || c_mktsegment AS tagged,
           CAST(LEN(STRING_SPLIT(c_name, '#')) AS INTEGER) AS n_parts,
           REVERSE(c_name) AS rev_name,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key
    FROM customer
"""


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kernel: truncation to month, field extraction, monthly aggs."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            F.year(F.col("o_orderdate")).alias("order_year"),
            F.month(F.col("o_orderdate")).alias("order_m"),
            F.dayofmonth(F.col("o_orderdate")).alias("order_d"),
            F.quarter(F.col("o_orderdate")).alias("order_q"),
            F.col("o_totalprice"),
        )
        .groupBy("order_month", "order_year", "order_m", "order_q")
        .agg(
            F.count("*").alias("n_orders"),
            sum_dec2(F.col("o_totalprice")).alias("sum_price"),
            F.min("order_d").alias("first_day"),
            F.max("order_d").alias("last_day"),
        )
    )


SQL_SCALAR_DATE = """
    SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_m,
           CAST(QUARTER(o_orderdate) AS INTEGER) AS order_q,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(MIN(DAY(o_orderdate)) AS INTEGER) AS first_day,
           CAST(MAX(DAY(o_orderdate)) AS INTEGER) AS last_day
    FROM orders
    GROUP BY 1, 2, 3, 4
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kernel, per-row (sums of float fns are order-unstable — see
    module docstring). round(…,6) absorbs any last-ulp libm difference."""
    part = load(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.round(F.sqrt(price), 6).alias("sqrt_price"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.log10(price), 6).alias("log10_price"),
        F.round(F.pow(F.col("p_size").cast("double"), F.lit(2.0)), 6).alias("size_sq"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.ceil(price).alias("ceil_price"),
        F.floor(price).alias("floor_price"),
        (F.col("p_partkey") % 7).alias("key_mod"),
    )


SQL_SCALAR_MATH = """
    SELECT p_partkey,
           ROUND(SQRT(p_retailprice), 6) AS sqrt_price,
           ROUND(LN(p_retailprice), 6) AS ln_price,
           ROUND(LOG10(p_retailprice), 6) AS log10_price,
           ROUND(POW(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
           CAST(ABS(p_size - 25) AS INTEGER) AS size_dev,
           CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
           CAST(p_partkey % 7 AS BIGINT) AS key_mod
    FROM part
"""


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured kernel: get_json_object over events.props (the A22
    existence-test generalized), grouped stats per extracted bucket."""
    events = load(spark, sf_dir, "events")
    # try_cast: a VALID-JSON document with a non-numeric k ('{"k":"abc"}')
    # must extract as NULL, not throw CAST_INVALID_INPUT under ANSI mode.
    # The rlike pre-guard is the SHARED acceptance grammar with the
    # oracle: Spark's try_cast trims ≤U+0020 padding (' 12 ' → 12) while
    # the oracle's regex rejects it — guarding BOTH engines on the same
    # integer grammar makes the accepted language identical by
    # construction instead of by matching two trim semantics. The Spark
    # side anchors with \z, not $: java.util.regex '$' also matches
    # before a final trailing newline ('12\n' would pass and trim to 12)
    # where the oracle's RE2 '$' is end-of-string (ADVICE r6).
    s = F.get_json_object(F.col("props"), "$.k")
    k = F.when(s.rlike(r"^[+-]?[0-9]+\z"), s).try_cast("int")
    return (
        events.select(
            (k % 10).alias("k_bucket"),
            F.col("event_type"),
            F.col("value"),
        )
        .groupBy("k_bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            sum_dec2(F.col("value")).alias("sum_value"),
        )
    )


SQL_SCALAR_JSON = """
    -- json_valid guard: DuckDB json functions CRASH on malformed JSON
    -- where Spark get_json_object/from_json yield NULL; the guard makes
    -- both engines treat a bad document as NULL-extracted
    SELECT TRY_CAST(CASE WHEN regexp_matches((CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END), '^[+-]?[0-9]+$') THEN (CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) END AS INTEGER) % 10 AS k_bucket,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


def q_scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional kernel: CASE tiers, coalesce/nullif, greatest/least —
    the 5-way CASE of the verifier (A20) generalized to expressions."""
    customer = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return customer.select(
        "c_custkey",
        F.when(bal < 0, "debt")
        .when(bal < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER"))
        .alias("segment_or_other"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1000"),
    )


SQL_SCALAR_CONDITIONAL = """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           GREATEST(c_acctbal, 0.0) AS bal_floor0,
           LEAST(c_acctbal, 1000.0) AS bal_cap1000
    FROM customer
"""


def q_scalar_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read: from_json parses props into a TYPED struct once
    (vs. scalar_json's per-path string extraction) — the pattern for
    wide semi-structured columns where N path extractions would re-parse
    the document N times. Malformed/missing fields become nulls, counted
    explicitly."""
    events = load(spark, sf_dir, "events")
    p = F.from_json(F.col("props"), "k int")
    return (
        events.select(p.alias("p"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("p.k").cast("long")).alias("sum_k"),
            F.min("p.k").alias("min_k"),
            F.max("p.k").alias("max_k"),
            F.sum(F.col("p.k").isNull().cast("long")).alias("n_null_k"),
        )
    )


SQL_SCALAR_JSON_TYPED = """
    -- Spark's typed from_json(props, 'k int') accepts ONLY plain JSON
    -- integer number tokens: a string-wrapped '"12"', a float 7.0, or a
    -- padded value all parse to NULL. The oracle mirrors that grammar
    -- with json_type ∈ (UBIGINT, BIGINT) — not a regex over the
    -- stringified value, which would wrongly accept '"12"'. Int32
    -- overflow nulls out on both sides via TRY_CAST.
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(TRY_CAST(CASE WHEN (CASE WHEN json_valid(props) THEN json_type(props, '$.k') END) IN ('UBIGINT', 'BIGINT') THEN json_extract_string(props, '$.k') END AS INTEGER)) AS BIGINT)
               AS sum_k,
           MIN(TRY_CAST(CASE WHEN (CASE WHEN json_valid(props) THEN json_type(props, '$.k') END) IN ('UBIGINT', 'BIGINT') THEN json_extract_string(props, '$.k') END AS INTEGER)) AS min_k,
           MAX(TRY_CAST(CASE WHEN (CASE WHEN json_valid(props) THEN json_type(props, '$.k') END) IN ('UBIGINT', 'BIGINT') THEN json_extract_string(props, '$.k') END AS INTEGER)) AS max_k,
           -- null check runs on the TRY_CAST result so a non-integer k
           -- counts as null exactly like Spark's typed from_json field
           CAST(SUM(CASE WHEN TRY_CAST(CASE WHEN (CASE WHEN json_valid(props) THEN json_type(props, '$.k') END) IN ('UBIGINT', 'BIGINT') THEN json_extract_string(props, '$.k') END AS INTEGER) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
    FROM events GROUP BY event_type
"""


def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over the embedding column: slice, sort,
    reverse-extremum position, distinct count, flatten-free per-row
    algebra — the named demo of the collection functions every other
    operator uses internally (all JVM-side, narrow, codegen-fused).

    argmax position via a fold carrying (best_idx, best_val, cur_idx)
    rather than array_position(array_max) — one pass, no float
    re-comparison ambiguity.
    """
    em = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    staged = em.select("vec_id", v.alias("v"))
    argmax = F.aggregate(
        F.col("v"),
        F.struct(
            F.lit(0).alias("best_i"),
            F.lit(float("-inf")).alias("best_v"),
            F.lit(0).alias("i"),
        ),
        lambda acc, x: F.struct(
            F.when(x > acc["best_v"], acc["i"] + 1).otherwise(acc["best_i"]).alias("best_i"),
            F.greatest(acc["best_v"], x).alias("best_v"),
            (acc["i"] + 1).alias("i"),
        ),
        lambda acc: acc["best_i"],
    )
    return staged.select(
        "vec_id",
        F.size("v").cast("int").alias("n_dims"),
        F.round(F.element_at(F.array_sort("v"), 1), 6).alias("v_min"),
        F.round(F.element_at(F.array_sort("v"), -1), 6).alias("v_max"),
        argmax.cast("int").alias("argmax_pos"),
        F.size(F.array_distinct(F.transform(F.col("v"), lambda x: (x > 0).cast("int"))))
        .cast("int")
        .alias("n_sign_kinds"),
        F.round(
            F.aggregate(F.slice("v", 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
    )


SQL_SCALAR_ARRAY = """
    WITH t AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
    SELECT vec_id,
           CAST(len(v) AS INTEGER) AS n_dims,
           ROUND(list_sort(v)[1], 6) AS v_min,
           ROUND(list_sort(v)[-1], 6) AS v_max,
           CAST(list_reduce(
               list_zip(v, range(1, len(v) + 1)),
               (acc, p) -> CASE WHEN p[1] > acc[1] THEN p ELSE acc END
           )[2] AS INTEGER) AS argmax_pos,
           CAST(len(list_distinct(list_transform(v,
               x -> CASE WHEN x > 0 THEN 1 ELSE 0 END))) AS INTEGER)
               AS n_sign_kinds,
           ROUND(list_reduce(v[1:8], (a, x) -> a + x), 6) AS head8_sum
    FROM t
"""


def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL synthesis + regexp decomposition round-trip: build a
    deterministic URL per document (host from source, path from doc_id,
    query param from lang) and parse it back into scheme / host / path /
    query with anchored ``regexp_extract`` — the log-analytics URL-column
    kernel. Pure narrow projections both ways; the pattern is a simple
    grouped regex (no lookaround) so Java regex and DuckDB's RE2 agree.
    Spark's builtin ``parse_url`` would work single-engine, but DuckDB
    has no counterpart — the regex form is what both engines can run
    verbatim, which is the point of the oracle contract.
    """
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
    )
    pat = r"^([a-z]+)://([^/?]+)(/[^?]*)\?lang=(.*)$"
    staged = docs.select("doc_id", url.alias("url"))
    return staged.select(
        "doc_id",
        "url",
        F.regexp_extract("url", pat, 1).alias("scheme"),
        F.regexp_extract("url", pat, 2).alias("host"),
        F.regexp_extract("url", pat, 3).alias("path"),
        F.regexp_extract("url", pat, 4).alias("lang_param"),
    )


SQL_SCALAR_URL = r"""
    WITH staged AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://([^/?]+)(/[^?]*)\?lang=(.*)$', 1)
               AS scheme,
           regexp_extract(url, '^([a-z]+)://([^/?]+)(/[^?]*)\?lang=(.*)$', 2)
               AS host,
           regexp_extract(url, '^([a-z]+)://([^/?]+)(/[^?]*)\?lang=(.*)$', 3)
               AS path,
           regexp_extract(url, '^([a-z]+)://([^/?]+)(/[^?]*)\?lang=(.*)$', 4)
               AS lang_param
    FROM staged
"""


def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation kernel family: masks, shifts, population count,
    XOR mixing, and — the aggregation-side payoff — BIT_XOR as an
    order-free integrity checksum per bucket (the classic "did both
    sides see exactly the same id set?" reconciliation primitive, used
    at scale precisely because XOR is associative/commutative and needs
    no sort). Everything is JVM-side integer ALU work inside one
    partial-aggregated groupBy; the 16-bucket output is nibble-indexed.
    """
    ev = load(spark, sf_dir, "events")
    staged = ev.select(
        (F.col("event_id").bitwiseAND(F.lit(15))).cast("int").alias("nibble"),
        F.bit_count(F.col("event_id")).alias("bits"),
        (F.bit_count(F.col("event_id")) % 2).alias("parity"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("mix"),
        F.shiftright(F.col("event_id"), 4).alias("shifted"),
    )
    return staged.groupBy("nibble").agg(
        F.count("*").alias("n_events"),
        F.sum("bits").alias("sum_bits"),
        F.sum("parity").alias("n_odd_parity"),
        F.expr("bit_xor(mix)").alias("xor_checksum"),
        F.min("shifted").alias("min_shifted"),
        F.max("shifted").alias("max_shifted"),
    )


SQL_SCALAR_BITWISE = """
    WITH staged AS (
        SELECT CAST(event_id & 15 AS INTEGER) AS nibble,
               CAST(bit_count(event_id) AS INTEGER) AS bits,
               CAST(bit_count(event_id) % 2 AS INTEGER) AS parity,
               xor(event_id, user_id) AS mix,
               event_id >> 4 AS shifted
        FROM events)
    SELECT nibble,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(bits) AS BIGINT) AS sum_bits,
           CAST(SUM(parity) AS BIGINT) AS n_odd_parity,
           BIT_XOR(mix) AS xor_checksum,
           MIN(shifted) AS min_shifted,
           MAX(shifted) AS max_shifted
    FROM staged GROUP BY nibble
"""


MAP_BUSY_MIN = 10  # busy-hour threshold for the map_filter demo


def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type kernel — the last Spark type surface: build each
    series' hour-of-day→count MAP with map_from_entries over a
    SORTED entry array (deterministic construction), then drive the
    higher-order map functions — aggregate over map_values for the
    total, map_filter for busy hours, transform_values for shares —
    and explode back to rows so the result is relationally
    oracle-comparable (DuckDB's MAP surface differs; the EXPLODED
    contract is the portable one, and it's also how a map column
    lands in parquet-adjacent systems).

    One partial-agg shuffle to ≤24 cells/series, one per-series map
    build; everything after is narrow map algebra on 24-entry maps.
    """
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour(F.col("ts")).alias("hod")
    ).agg(F.count("*").alias("n"))
    maps = cells.groupBy("event_type").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("hod", "n")))
        ).alias("m")
    )
    total = F.aggregate(
        F.map_values(F.col("m")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    busy = F.map_filter(F.col("m"), lambda k, v: v >= MAP_BUSY_MIN)
    staged = maps.select(
        "event_type",
        F.size(F.col("m")).alias("n_hours_present"),
        total.alias("n_events"),
        F.explode(busy).alias("hod", "n"),
    )
    return staged.select(
        "event_type",
        "n_hours_present",
        "n_events",
        "hod",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("n_events").cast("double"), 6
        ).alias("share"),
    )


SQL_SCALAR_MAP = f"""
    WITH cells AS (
        SELECT event_type, HOUR(ts) AS hod, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    series AS (
        SELECT event_type,
               CAST(COUNT(*) AS INTEGER) AS n_hours_present,
               CAST(SUM(n) AS BIGINT) AS n_events
        FROM cells GROUP BY event_type)
    SELECT c.event_type, s.n_hours_present, s.n_events, c.hod, c.n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(s.n_events AS DOUBLE), 6) AS share
    FROM cells c JOIN series s USING (event_type)
    WHERE c.n >= {MAP_BUSY_MIN}
"""


QUERIES = {
    "scalar_map": Query(q_scalar_map, SQL_SCALAR_MAP),
    "scalar_bitwise": Query(q_scalar_bitwise, SQL_SCALAR_BITWISE),
    "scalar_url": Query(q_scalar_url, SQL_SCALAR_URL),
    "scalar_array": Query(q_scalar_array, SQL_SCALAR_ARRAY),
    "scalar_string": Query(q_scalar_string, SQL_SCALAR_STRING),
    "scalar_date": Query(q_scalar_date, SQL_SCALAR_DATE),
    "scalar_math": Query(q_scalar_math, SQL_SCALAR_MATH),
    "scalar_json": Query(q_scalar_json, SQL_SCALAR_JSON, headline=True),
    "scalar_conditional": Query(q_scalar_conditional, SQL_SCALAR_CONDITIONAL),
    "scalar_json_typed": Query(q_scalar_json_typed, SQL_SCALAR_JSON_TYPED),
}
