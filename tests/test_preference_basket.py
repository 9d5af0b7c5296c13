"""Independent pure-Python references for the r10 late additions
(skyline / market-basket / column profile).

The DuckDB oracle proves cross-engine agreement, but both engines can
agree on wrong semantics (the ts_rsi lesson) — these rebuild each spec
from first principles on collected rows, plus hand-built fixtures for
the arms the synthetic corpus exercises thinly (skyline duplicates,
profile NULL accounting).
"""

from __future__ import annotations

from pyspark.sql import Row

from kafka_connect_minio_pipeline_spark.operators.aggregates import (
        _PROFILE_COLS,
        q_agg_column_profile,
        q_agg_skyline,
    )
from kafka_connect_minio_pipeline_spark.operators.joins import (
    MIN_PAIR_SUPPORT,
    q_join_copurchase_lift,
)
from kafka_connect_minio_pipeline_spark.tables import load

SF = "/root/testdata/sf0.001"


def _write_like(spark, real_name, rows, out_dir):
    schema = spark.read.parquet(f"{SF}/{real_name}.parquet").schema
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/{real_name}.parquet")


def test_skyline_matches_bruteforce(spark, sf_dir):
    pts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load(spark, sf_dir, "part").collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )

    expect = {p for p in pts if not dominated(p)}
    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in q_agg_skyline(spark, sf_dir).collect()
    }
    assert got == expect and got


def test_skyline_duplicates_and_price_ties(spark, tmp_path):
    """Same-price-same-size duplicates BOTH survive (no strict edge
    between them); a same-price larger-size row dominates its smaller
    peer; a cheaper point with equal size dominates the pricier one."""
    rows = [
        # two identical frontier points — both must survive
        Row(p_partkey=1, p_name="a", p_brand="B", p_type="T", p_size=50,
            p_retailprice=10.0),
        Row(p_partkey=2, p_name="b", p_brand="B", p_type="T", p_size=50,
            p_retailprice=10.0),
        # same price, smaller size — dominated by 1/2
        Row(p_partkey=3, p_name="c", p_brand="B", p_type="T", p_size=40,
            p_retailprice=10.0),
        # pricier, same size as 1/2 — dominated (strictly worse price)
        Row(p_partkey=4, p_name="d", p_brand="B", p_type="T", p_size=50,
            p_retailprice=11.0),
        # pricier but strictly bigger — frontier
        Row(p_partkey=5, p_name="e", p_brand="B", p_type="T", p_size=60,
            p_retailprice=12.0),
        # cheapest overall — frontier regardless of size
        Row(p_partkey=6, p_name="f", p_brand="B", p_type="T", p_size=1,
            p_retailprice=5.0),
    ]
    # Row fields are alphabetical; rebuild in the real column order
    part_schema = spark.read.parquet(f"{SF}/part.parquet").schema
    ordered = [
        tuple(getattr(r, f.name) for f in part_schema.fields) for r in rows
    ]
    _write_like(spark, "part", ordered, tmp_path)
    got = {r["p_partkey"] for r in q_agg_skyline(spark, str(tmp_path)).collect()}
    assert got == {1, 2, 5, 6}


def test_copurchase_matches_pure_python(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in load(spark, sf_dir, "part").collect()
    }
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(part[r["l_partkey"]])
    n = len(baskets)
    brand_cnt: dict[str, int] = {}
    pair_cnt: dict[tuple, int] = {}
    for bs in baskets.values():
        for b in bs:
            brand_cnt[b] = brand_cnt.get(b, 0) + 1
        s = sorted(bs)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_cnt[(s[i], s[j])] = pair_cnt.get((s[i], s[j]), 0) + 1
    expect = {}
    for (a, b), c in pair_cnt.items():
        if c >= MIN_PAIR_SUPPORT:
            expect[(a, b)] = (
                c,
                round(c / n, 6),
                round(c / brand_cnt[a], 6),
                round(c / brand_cnt[b], 6),
                round((c * n) / (brand_cnt[a] * brand_cnt[b]), 6),
            )
    got = {
        (r["brand_a"], r["brand_b"]): (
            r["pair_cnt"],
            round(r["support"], 6),
            round(r["conf_a_to_b"], 6),
            round(r["conf_b_to_a"], 6),
            round(r["lift"], 6),
        )
        for r in q_join_copurchase_lift(spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and got
    for k in expect:
        assert got[k][0] == expect[k][0], k
        for gi, ei in zip(got[k][1:], expect[k][1:]):
            assert abs(gi - ei) < 1e-9, (k, got[k], expect[k])


def test_column_profile_matches_pure_python(spark, sf_dir):
    rows = load(spark, sf_dir, "orders").collect()
    got = {
        r["column_name"]: r
        for r in q_agg_column_profile(spark, sf_dir).collect()
    }
    assert set(got) == {c for c, _ in _PROFILE_COLS}
    for name, is_num in _PROFILE_COLS:
        vals = [r[name] for r in rows]
        nn = [v for v in vals if v is not None]
        g = got[name]
        assert g["non_nulls"] == len(nn)
        assert g["nulls"] == len(vals) - len(nn)
        assert g["distinct_cnt"] == len(set(nn))
        if is_num:
            assert g["min_val"] == float(min(nn))
            assert g["max_val"] == float(max(nn))
        else:
            assert g["min_val"] is None and g["max_val"] is None


def test_column_profile_counts_nulls(spark, tmp_path):
    """The synthetic orders table has no NULLs, so the null-accounting
    arm only exercises here: NULLs excluded from non_nulls, distinct,
    and min/max, counted in nulls."""
    import datetime

    d = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 10, "O", 5.0, d, "1-URGENT"),
        (2, None, "F", None, d, "2-HIGH"),
        (3, 10, None, 7.5, None, None),
    ]
    _write_like(spark, "orders", rows, tmp_path)
    got = {
        r["column_name"]: r
        for r in q_agg_column_profile(spark, str(tmp_path)).collect()
    }
    assert got["o_custkey"]["non_nulls"] == 2
    assert got["o_custkey"]["nulls"] == 1
    assert got["o_custkey"]["distinct_cnt"] == 1
    assert got["o_custkey"]["min_val"] == 10.0
    assert got["o_totalprice"]["min_val"] == 5.0
    assert got["o_totalprice"]["max_val"] == 7.5
    assert got["o_orderstatus"]["nulls"] == 1
    assert got["o_orderstatus"]["distinct_cnt"] == 2
    assert got["o_orderdate"]["non_nulls"] == 2
