"""A/B (session 2): dedup_containment's candidate join probes FULL
posting lists with the inner prefixes (guide §3.2 — reduce the big side
before shuffling it). Arms:

  A. current — shuffle_hash join of prefix (build) vs full postings
     (probe), both exchanged on the shingle hash.
  B. semi — localCheckpoint the prefix relation (it is consumed twice),
     broadcast its DISTINCT hashes as a left-semi filter on the posting
     side BEFORE the exchange, then the same shuffle_hash join. False
     drops impossible (equal hashes always survive), so candidates and
     the exact verify are unchanged.

Scale note for B: the distinct-prefix-hash set is corpus-shaped, so at
100 TB the broadcast semi-join is replaced by the runtime bloom filter
(guide §3.2) — this A/B decides whether the pre-filter mechanism pays
at all before that engineering is considered.

Usage: python plans/r15/ab_containment_semi.py [sf_dir] [passes]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F, Window

from kafka_connect_minio_pipeline_spark.session import get_spark
from kafka_connect_minio_pipeline_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    _staged_shingle_sets,
    q_dedup_containment,
)
from kafka_connect_minio_pipeline_spark.functions.barrier import filter_above

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 8

spark = get_spark(app_name="ab_containment_semi", cores=32, driver_memory="96g")
spark.range(1).count()


def containment_semi(spark, sf_dir):
    sets_ = _staged_shingle_sets(spark, sf_dir)
    sh = sets_.select("doc_id", "n_sh", F.explode("arr").alias("s"))
    prefix_len = (
        F.col("n_sh")
        - F.ceil(F.lit(CONTAINMENT_THRESHOLD) * F.col("n_sh"))
        + 1
    ).cast("int")
    prefix = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("s")))
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")),
        )
        .filter(F.col("rnk") <= prefix_len)
        .select("doc_id", "n_sh", F.xxhash64("s").alias("h"))
    ).localCheckpoint(eager=True)
    b = (
        sh.select("doc_id", "n_sh", F.xxhash64("s").alias("h"))
        .join(F.broadcast(prefix.select("h").distinct()), "h", "left_semi")
        .alias("b")
    )
    a = prefix.alias("a").hint("shuffle_hash")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (
                (F.col("a.n_sh") < F.col("b.n_sh"))
                | (
                    (F.col("a.n_sh") == F.col("b.n_sh"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            ),
        )
        .select(
            F.col("a.doc_id").alias("inner_id"), F.col("b.doc_id").alias("outer_id")
        )
        .distinct()
    )
    scored = (
        cand.join(
            sets_.select(
                F.col("doc_id").alias("inner_id"),
                F.col("arr").alias("arr_i"),
                F.col("n_sh").alias("n_inner"),
            ),
            "inner_id",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("outer_id"),
                F.col("arr").alias("arr_o"),
                F.col("n_sh").alias("n_outer"),
            ),
            "outer_id",
        )
        .withColumn("n_common", F.size(F.array_intersect("arr_i", "arr_o")))
        .withColumn(
            "containment", F.round(F.col("n_common") / F.col("n_inner"), 6)
        )
    )
    return filter_above(
        scored, F.col("containment") >= CONTAINMENT_THRESHOLD
    ).select(
        "inner_id",
        "outer_id",
        F.col("n_inner").cast("long").alias("n_inner"),
        F.col("n_outer").cast("long").alias("n_outer"),
        "containment",
    )


ARMS = {
    "current": lambda: q_dedup_containment(spark, SF_DIR),
    "semi": lambda: containment_semi(spark, SF_DIR),
}

ref = None
for name, build in ARMS.items():
    rows = {tuple(r) for r in build().collect()}
    if ref is None:
        ref = rows
        print(f"# {name}: {len(rows)} rows (reference)", flush=True)
    else:
        assert rows == ref, f"{name} differs: {len(rows)} vs {len(ref)}"
        print(f"# {name}: rows identical", flush=True)


def mat(df):
    df.write.mode("overwrite").format("noop").save()


best = {}
for p in range(PASSES):
    for name, build in ARMS.items():
        spark.sparkContext.setJobDescription(f"pass{p} {name}")
        t0 = time.perf_counter()
        mat(build())
        dt = time.perf_counter() - t0
        best[name] = min(best.get(name, 9e9), dt)
        print(f"# pass{p} {name}: {dt:.2f}s", flush=True)

print("RESULT " + " ".join(f"{k}={v:.2f}" for k, v in best.items()))
spark.stop()
