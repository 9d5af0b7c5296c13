"""Same-session interleaved A/B for the r15 dedup_incremental change:
is_new computed in place on the staged relation (repo HEAD) vs the old
derive-then-join-back-on-doc_id shape (two extra joins + scans).
Asserts exact row equality first."""

import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.session import get_spark
from kafka_connect_minio_pipeline_spark.operators import dedup
from kafka_connect_minio_pipeline_spark.operators.dedup import (
    INCR_NEW_FRAC,
    JACCARD_THRESHOLD,
    N_BANDS,
    N_PERM,
    _staged_shingle_sets,
    filter_above,
    minhash_signatures,
)

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 8

spark = get_spark(app_name="ab_incr", cores=32, driver_memory="96g")
spark.range(1).count()


def mat(df):
    df.write.mode("overwrite").format("noop").save()


def old_incremental(spark, sf_dir):
    """The pre-r15 body: flags derived then joined back on doc_id."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        _HASH_SPACE,
        _portable_hash,
    )

    sets_ = _staged_shingle_sets(spark, sf_dir).filter(F.col("n_sh") > 0)
    flags = sets_.select(
        "doc_id",
        (
            _portable_hash(F.concat(F.lit("incr:"), F.col("doc_id")))
            < int(INCR_NEW_FRAC * _HASH_SPACE)
        ).alias("is_new"),
    )
    fp = sets_.join(flags, "doc_id").select(
        "doc_id", "is_new", F.md5(F.concat_ws(" ", F.col("arr"))).alias("fp")
    )
    exact = (
        fp.filter("is_new")
        .select("doc_id", "fp")
        .join(
            fp.filter(~F.col("is_new")).select(F.col("doc_id").alias("base_id"), "fp"),
            "fp",
        )
        .groupBy("doc_id")
        .agg(F.min("base_id").alias("match_id"))
        .select(
            "doc_id", "match_id", F.lit(1).alias("prio"), F.lit(1.0).alias("jaccard")
        )
    )
    sigs = minhash_signatures(sets_).join(flags, "doc_id")
    r = N_PERM // N_BANDS
    bands = F.array(
        *[
            F.concat_ws(",", *[F.col(f"sig{b * r + i}") for i in range(r)])
            for b in range(N_BANDS)
        ]
    )
    banded = sigs.select(
        "doc_id", "is_new", F.posexplode(bands).alias("band_idx", "band_val")
    )
    new_b = banded.filter("is_new").alias("a").hint("shuffle_hash")
    base_b = banded.filter(~F.col("is_new")).alias("b")
    cand = (
        new_b.join(
            base_b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("base_id"))
        .distinct()
    )
    near = (
        cand.join(
            sets_.select(
                F.col("doc_id"), F.col("arr").alias("arr1"), F.col("n_sh").alias("n1")
            ),
            "doc_id",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("base_id"),
                F.col("arr").alias("arr2"),
                F.col("n_sh").alias("n2"),
            ),
            "base_id",
        )
        .withColumn("n_common", F.size(F.array_intersect("arr1", "arr2")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6
            ),
        )
    )
    near = filter_above(near, F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_id", F.col("base_id").alias("match_id"), F.lit(0).alias("prio"), "jaccard"
    )
    best = (
        exact.unionByName(near)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("prio"), F.col("jaccard"), (-F.col("match_id")).alias("nm"))
            ).alias("k")
        )
        .select(
            "doc_id",
            (-F.col("k.nm")).cast("long").alias("match_id"),
            F.when(F.col("k.prio") == 1, "exact").otherwise("near").alias("method"),
            F.col("k.jaccard").alias("jaccard"),
        )
    )
    return best


a = sorted(tuple(r) for r in dedup.q_dedup_incremental(spark, SF_DIR).collect())
b = sorted(tuple(r) for r in old_incremental(spark, SF_DIR).collect())
assert a == b, "fused vs join-back rows differ"
print(f"# exactness: {len(a)} rows identical", flush=True)

ARMS = {
    "incr_fused": lambda: mat(dedup.q_dedup_incremental(spark, SF_DIR)),
    "incr_joinback": lambda: mat(old_incremental(spark, SF_DIR)),
}

from kafka_connect_minio_pipeline_spark.registry import all_queries

control_fn = all_queries()["agg_pricing_summary"].fn

for name, arm in ARMS.items():
    spark.sparkContext.setJobDescription(f"warm {name}")
    arm()

best, series, ctrl = {}, {n: [] for n in ARMS}, []
for p in range(PASSES):
    for name, arm in ARMS.items():
        spark.sparkContext.setJobDescription(f"pass{p} {name}")
        t0 = time.perf_counter()
        arm()
        dt = round(time.perf_counter() - t0, 3)
        series[name].append(dt)
        best[name] = min(best.get(name, dt), dt)
    t0 = time.perf_counter()
    mat(control_fn(spark, SF_DIR))
    ctrl.append(round(time.perf_counter() - t0, 3))
    print(f"# pass{p} done, control={ctrl[-1]:.3f}", flush=True)

print(f"RESULTS (min over {PASSES} passes):")
for name in ARMS:
    print(f"  {name}: min={best[name]:.3f}  series={series[name]}")
print(f"  control: min={min(ctrl):.3f}  series={ctrl}")
spark.stop()
