"""Data-layout operators: Z-order (Morton) interleaved sort keys and a
file-skipping evaluation (SURVEY.md §2.4 extension surface; VERDICT r9
item 7 — the scan-pruning complement to the bucketed-join /
partitioned-write story).

The 100 TB problem these address: min/max zone maps (parquet row-group
stats, Delta/Iceberg file stats) prune a scan only if the file layout
clusters the predicate columns. A linear sort key (user_id, ts) prunes
user predicates perfectly and time predicates not at all; a Z-order
interleave of the two prunes BOTH dimensions to ~sqrt density — the
Databricks OPTIMIZE ZORDER recipe, built here from public integer
algebra (Morton 1966 bit interleaving) so DuckDB reproduces every key
bit-exactly.

Layout model for the eval: files are VALUE-range buckets of the sort
key (what ``repartitionByRange(key).sortWithinPartitions(key)`` +
per-file writes produce), so file assignment is pure integer algebra —
``key DIV 2^k`` — with no global rank, no single-partition window, no
sort anywhere in the eval itself. Per-(layout, file) min/max stats are
one partial-aggregated shuffle to ≤ 2·FILES rows; everything after is
model-sized. At 100 TB the same plan holds: the only data-sized stage
is the narrow key projection fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Query
from ..tables import load

ZBITS = 8  # bits per dimension → 16-bit Morton key, 256×256 grid
ZFILES_SHIFT = 10  # 16-bit key DIV 2^10 → 64 value-range "files"
_N = 1 << ZBITS  # grid side
_XOR3 = "(3 * {rx} + {ry} - 2 * {rx} * {ry})"  # (3·rx)^ry for bits — no XOR op
# (DuckDB's ^ is POWER and its xor() is a function; Spark's is ^ — one
# arithmetic identity sidesteps the operator divergence entirely)


def _interleave_spark(u: str, t: str) -> str:
    """Spark SQL expression: Morton-interleave two ZBITS-bit ints —
    ``u`` takes the odd (high) bit positions, ``t`` the even ones."""
    return " + ".join(
        f"shiftleft(shiftright({u}, {i}) & 1, {2 * i + 1})"
        f" + shiftleft(shiftright({t}, {i}) & 1, {2 * i})"
        for i in range(ZBITS)
    )


def _interleave_duck(u: str, t: str) -> str:
    """DuckDB twin of :func:`_interleave_spark` — same bit algebra."""
    return " + ".join(
        f"((({u} >> {i}) & 1) << {2 * i + 1})"
        f" + ((({t} >> {i}) & 1) << {2 * i})"
        for i in range(ZBITS)
    )


def _hilbert_round_exprs(b: int) -> dict[str, str]:
    """One unrolled round of the standard Hilbert xy2d walk (the
    Wikipedia/Warren loop, bit ``b`` from high to low): accumulate the
    quadrant's area onto ``hd``, then reflect-and-swap the frame. The
    three updates are simultaneous (computed from the PREVIOUS round's
    hx/hy/hd), which is exactly ``withColumns`` semantics."""
    s = 1 << b
    rx = f"(shiftright(hx, {b}) & 1)"
    ry = f"(shiftright(hy, {b}) & 1)"
    xor3 = _XOR3.format(rx=rx, ry=ry)
    return {
        "hd": f"hd + {s * s} * {xor3}",
        "hx": (
            f"CASE WHEN {ry} = 0 THEN"
            f" CASE WHEN {rx} = 1 THEN {_N - 1} - hy ELSE hy END"
            f" ELSE hx END"
        ),
        "hy": (
            f"CASE WHEN {ry} = 0 THEN"
            f" CASE WHEN {rx} = 1 THEN {_N - 1} - hx ELSE hx END"
            f" ELSE hy END"
        ),
    }


def _hilbert_rounds_duck(src: str, carry: str) -> str:
    """DuckDB twin: ZBITS chained CTEs ``hr1..hr{ZBITS}`` rolling the
    same reflect-swap-accumulate state from CTE ``src`` (which must
    expose hx, hy, hd plus the ``carry`` columns)."""
    ctes = [f"hr0 AS (SELECT {carry}, hx, hy, hd FROM {src})"]
    for i in range(ZBITS):
        b = ZBITS - 1 - i
        s = 1 << b
        rx = f"((hx >> {b}) & 1)"
        ry = f"((hy >> {b}) & 1)"
        xor3 = _XOR3.format(rx=rx, ry=ry)
        ctes.append(
            f"""hr{i + 1} AS (
        SELECT {carry},
               CASE WHEN {ry} = 0 THEN
                    CASE WHEN {rx} = 1 THEN {_N - 1} - hy ELSE hy END
                    ELSE hx END AS hx,
               CASE WHEN {ry} = 0 THEN
                    CASE WHEN {rx} = 1 THEN {_N - 1} - hx ELSE hx END
                    ELSE hy END AS hy,
               hd + {s * s} * {xor3} AS hd
        FROM hr{i})"""
        )
    return ",\n    ".join(ctes)


def _encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with both layout keys: per row the Z-order key ``zkey``
    (Morton interleave of min-max-bucketed user_id × epoch-micros) and
    the linear user-major key ``lkey``, plus each key's value-range
    file id. Narrow map fused into the scan — the only other input is
    the broadcast 1-row min/max consts relation."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tm"),
    )
    consts = ev.agg(
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.min("tm").alias("min_t"),
        F.max("tm").alias("max_t"),
    )
    lv = 1 << ZBITS
    enc = (
        ev.crossJoin(F.broadcast(consts))
        .withColumn(
            "u8",
            F.expr(f"((user_id - min_u) * {lv}) div (max_u - min_u + 1)"),
        )
        .withColumn(
            "t8", F.expr(f"((tm - min_t) * {lv}) div (max_t - min_t + 1)")
        )
        .withColumn("hx", F.col("u8"))
        .withColumn("hy", F.col("t8"))
        .withColumn("hd", F.lit(0).cast("long"))
    )
    # ZBITS unrolled Hilbert rounds — simultaneous narrow projections;
    # Catalyst collapses the chain into one codegen stage
    for i in range(ZBITS):
        b = ZBITS - 1 - i
        enc = enc.withColumns(
            {k: F.expr(v) for k, v in _hilbert_round_exprs(b).items()}
        )
    return (
        enc.select(
            "event_id",
            "user_id",
            "tm",
            "min_u",
            "max_u",
            "min_t",
            "max_t",
            F.expr(_interleave_spark("u8", "t8")).alias("zkey"),
            F.expr(f"u8 * {lv} + t8").alias("lkey"),
            F.col("hd").alias("hkey"),
        )
        .withColumn("file_z", F.expr(f"zkey div {1 << ZFILES_SHIFT}"))
        .withColumn("file_lin", F.expr(f"lkey div {1 << ZFILES_SHIFT}"))
        .withColumn("file_h", F.expr(f"hkey div {1 << ZFILES_SHIFT}"))
    )


_ENC_CARRY = "event_id, user_id, tm, min_u, max_u, min_t, max_t, u8, t8"

_SQL_ENC = f"""
    ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS tm FROM events),
    consts AS MATERIALIZED (
        SELECT MIN(user_id) AS min_u, MAX(user_id) AS max_u,
               MIN(tm) AS min_t, MAX(tm) AS max_t
        FROM ev),
    bucketed AS (
        SELECT event_id, user_id, tm, min_u, max_u, min_t, max_t,
               ((user_id - min_u) * {1 << ZBITS}) // (max_u - min_u + 1) AS u8,
               ((tm - min_t) * {1 << ZBITS}) // (max_t - min_t + 1) AS t8
        FROM ev CROSS JOIN consts),
    hseed AS (
        SELECT {_ENC_CARRY}, u8 AS hx, t8 AS hy, CAST(0 AS BIGINT) AS hd
        FROM bucketed),
    {_hilbert_rounds_duck("hseed", _ENC_CARRY)},
    enc AS MATERIALIZED (
        SELECT {_ENC_CARRY},
               {_interleave_duck("u8", "t8")} AS zkey,
               u8 * {1 << ZBITS} + t8 AS lkey,
               hd AS hkey
        FROM hr{ZBITS})
"""


def q_layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order layout key relation: per event, the 2·ZBITS-bit
    Morton key over (user_id, ts), the linear user-major key, and each
    key's value-range file id — the sort key you hand to
    ``repartitionByRange('zkey').sortWithinPartitions('zkey')`` before
    a partitioned write, so downstream scans prune on BOTH columns.

    Scale shape: a pure narrow map fused into the events scan; the only
    wide input is the broadcast 1-row min/max consts (at 100 TB those
    come from table statistics instead of an extra pass). Exactness:
    bucketing is floor division of non-negative integers (the M4 bucket
    idiom), the interleave is plain shift/mask/add — every bit
    reproduced by DuckDB's identical expression."""
    return _encoded(spark, sf_dir).select(
        "event_id",
        F.col("zkey").cast("int").alias("zkey"),
        F.col("lkey").cast("int").alias("lkey"),
        F.col("file_z").cast("int").alias("file_z"),
        F.col("file_lin").cast("int").alias("file_lin"),
    )


SQL_LAYOUT_ZORDER_KEY = f"""
    WITH {_SQL_ENC}
    SELECT event_id,
           CAST(zkey AS INTEGER) AS zkey,
           CAST(lkey AS INTEGER) AS lkey,
           CAST(zkey // {1 << ZFILES_SHIFT} AS INTEGER) AS file_z,
           CAST(lkey // {1 << ZFILES_SHIFT} AS INTEGER) AS file_lin
    FROM enc
"""


def q_layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hilbert layout key relation: per event, position ``hkey`` on
    the order-ZBITS Hilbert curve over the same bucketed
    (user_id, ts) grid as :func:`q_layout_zorder_key`, plus its
    value-range file id. Hilbert dominates Morton on locality — every
    unit step of the curve moves exactly one grid cell (no Z-shaped
    jumps across half the space), so equal-size key ranges cover
    tighter rectangles; the unit-step bijection is pinned exhaustively
    in tests/test_layout.py.

    Implementation: the standard xy2d walk (reflect-swap-accumulate
    per bit, Morton's era algebra as popularized in Warren, Hacker's
    Delight §16) unrolled into ZBITS simultaneous narrow projections —
    Catalyst collapses the chain into the same single codegen stage as
    the Morton interleave, and DuckDB replays it as chained CTEs with
    identical integer arithmetic (the (3rx)^ry quadrant index is
    computed as 3rx + ry − 2·rx·ry so no engine-specific XOR operator
    is involved). Same scale shape as the Z-order key: narrow map plus
    the broadcast 1-row consts.

    In the pruning eval both curves score IDENTICALLY — at power-of-4
    file granularity (2^ZFILES_SHIFT = 4^5 cells/file) every file of
    either curve is an exact 32×32 sub-square, so the zone maps
    coincide. The curves differ in file ADJACENCY (consecutive Hilbert
    files are edge-adjacent squares; consecutive Morton files can jump
    across half the grid), which matters for multi-file range scans
    and is what the unit-step test demonstrates."""
    return _encoded(spark, sf_dir).select(
        "event_id",
        F.col("hkey").cast("int").alias("hkey"),
        F.col("file_h").cast("int").alias("file_h"),
    )


SQL_LAYOUT_HILBERT_KEY = f"""
    WITH {_SQL_ENC}
    SELECT event_id,
           CAST(hkey AS INTEGER) AS hkey,
           CAST(hkey // {1 << ZFILES_SHIFT} AS INTEGER) AS file_h
    FROM enc
"""


def q_layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping eval: fraction of value-range files a min/max zone
    map prunes under the Z-order and Hilbert layouts vs the linear
    (user-major) layout, for three predicate shapes — a user point
    lookup, a time range, and their conjunction. One row per
    (layout, predicate) with files_total / files_hit / frac_pruned: the
    measure-before-you-sort artifact justifying a space-filling-curve
    rewrite of a 100 TB table.

    Predicate literals derive from the same min/max consts (midpoint
    user; the middle 1/8 of the time span) so the eval is deterministic
    and engine-exact. A file is HIT when its [min,max] interval
    intersects the predicate — exactly the zone-map test, conservative
    by construction. Expected shape (pinned as a property test): the
    linear layout prunes the user point near-perfectly and the time
    range not at all; Z-order prunes both to ~sqrt density — strictly
    better on the time range, worse on the pure point — quantifying the
    classic multi-dimensional clustering trade.

    Scale shape: the stacked (layout, file) stats are ONE
    partial-aggregated shuffle to ≤ 2·FILES rows; flags and the final
    per-layout rollup are model-sized; frac_pruned is one shared IEEE
    division of exact integer counts."""
    enc = _encoded(spark, sf_dir)
    stacked = enc.select(
        F.expr(
            "stack(3, 'zorder', file_z, 'hilbert', file_h,"
            " 'linear', file_lin)"
        ).alias("layout", "file"),
        "user_id",
        "tm",
        "min_u",
        "max_u",
        "min_t",
        "max_t",
    )
    stats = stacked.groupBy("layout", "file").agg(
        F.min("user_id").alias("mnu"),
        F.max("user_id").alias("mxu"),
        F.min("tm").alias("mnt"),
        F.max("tm").alias("mxt"),
        F.first("min_u").alias("min_u"),
        F.first("max_u").alias("max_u"),
        F.first("min_t").alias("min_t"),
        F.first("max_t").alias("max_t"),
    )
    flags = stats.select(
        "layout",
        F.expr("(min_u + max_u) div 2").alias("mid_u"),
        F.expr("min_t + ((max_t - min_t) * 7) div 16").alias("t_lo"),
        F.expr("min_t + ((max_t - min_t) * 9) div 16").alias("t_hi"),
        "mnu",
        "mxu",
        "mnt",
        "mxt",
    ).select(
        "layout",
        ((F.col("mnu") <= F.col("mid_u")) & (F.col("mxu") >= F.col("mid_u")))
        .cast("long")
        .alias("hp"),
        ((F.col("mnt") <= F.col("t_hi")) & (F.col("mxt") >= F.col("t_lo")))
        .cast("long")
        .alias("hr"),
        (
            (F.col("mnu") <= F.col("mid_u"))
            & (F.col("mxu") >= F.col("mid_u"))
            & (F.col("mnt") <= F.col("t_hi"))
            & (F.col("mxt") >= F.col("t_lo"))
        )
        .cast("long")
        .alias("hb"),
    )
    per_layout = flags.groupBy("layout").agg(
        F.count("*").alias("files_total"),
        F.sum("hp").alias("hit_point"),
        F.sum("hr").alias("hit_range"),
        F.sum("hb").alias("hit_both"),
    )
    out = per_layout.select(
        "layout",
        F.expr(
            "stack(3, 'user_point', hit_point, 'ts_range', hit_range,"
            " 'point_and_range', hit_both)"
        ).alias("predicate", "files_hit"),
        "files_total",
    )
    return out.select(
        "layout",
        "predicate",
        "files_total",
        "files_hit",
        F.round(
            (F.col("files_total") - F.col("files_hit")) / F.col("files_total"),
            6,
        ).alias("frac_pruned"),
    )


SQL_LAYOUT_ZORDER_PRUNING = f"""
    WITH {_SQL_ENC},
    stacked AS (
        SELECT 'zorder' AS layout, zkey // {1 << ZFILES_SHIFT} AS file,
               user_id, tm, min_u, max_u, min_t, max_t
        FROM enc
        UNION ALL
        SELECT 'hilbert', hkey // {1 << ZFILES_SHIFT},
               user_id, tm, min_u, max_u, min_t, max_t
        FROM enc
        UNION ALL
        SELECT 'linear', lkey // {1 << ZFILES_SHIFT},
               user_id, tm, min_u, max_u, min_t, max_t
        FROM enc),
    stats AS (
        SELECT layout, file,
               MIN(user_id) AS mnu, MAX(user_id) AS mxu,
               MIN(tm) AS mnt, MAX(tm) AS mxt,
               MIN(min_u) AS min_u, MIN(max_u) AS max_u,
               MIN(min_t) AS min_t, MIN(max_t) AS max_t
        FROM stacked GROUP BY 1, 2),
    flags AS (
        SELECT layout,
               CASE WHEN mnu <= (min_u + max_u) // 2
                     AND mxu >= (min_u + max_u) // 2
                    THEN 1 ELSE 0 END AS hp,
               CASE WHEN mnt <= min_t + ((max_t - min_t) * 9) // 16
                     AND mxt >= min_t + ((max_t - min_t) * 7) // 16
                    THEN 1 ELSE 0 END AS hr,
               CASE WHEN mnu <= (min_u + max_u) // 2
                     AND mxu >= (min_u + max_u) // 2
                     AND mnt <= min_t + ((max_t - min_t) * 9) // 16
                     AND mxt >= min_t + ((max_t - min_t) * 7) // 16
                    THEN 1 ELSE 0 END AS hb
        FROM stats),
    per_layout AS (
        SELECT layout,
               CAST(COUNT(*) AS BIGINT) AS files_total,
               CAST(SUM(hp) AS BIGINT) AS hit_point,
               CAST(SUM(hr) AS BIGINT) AS hit_range,
               CAST(SUM(hb) AS BIGINT) AS hit_both
        FROM flags GROUP BY 1)
    SELECT layout, predicate, files_total, files_hit,
           ROUND((files_total - files_hit) / files_total, 6) AS frac_pruned
    FROM (
        SELECT layout, 'user_point' AS predicate, files_hit, files_total
        FROM (SELECT layout, hit_point AS files_hit, files_total
              FROM per_layout)
        UNION ALL
        SELECT layout, 'ts_range', hit_range, files_total FROM per_layout
        UNION ALL
        SELECT layout, 'point_and_range', hit_both, files_total
        FROM per_layout)
"""


QUERIES = {
    "layout_zorder_key": Query(q_layout_zorder_key, SQL_LAYOUT_ZORDER_KEY),
    "layout_hilbert_key": Query(
        q_layout_hilbert_key, SQL_LAYOUT_HILBERT_KEY
    ),
    "layout_zorder_pruning": Query(
        q_layout_zorder_pruning, SQL_LAYOUT_ZORDER_PRUNING
    ),
}
