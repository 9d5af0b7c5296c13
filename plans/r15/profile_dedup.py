"""Phase profile of the prefix-filter dedup family at sf0.1 (guide §1.1
empirical loop): time each pipeline stage through the noop sink to see
where dedup_containment / dedup_ngram_jaccard actually spend."""

import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.session import get_spark
from kafka_connect_minio_pipeline_spark.operators import dedup
from kafka_connect_minio_pipeline_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    _doc_shingle_sets,
    _staged_shingle_sets,
)

SF_DIR = "/root/testdata/sf0.1"
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark(app_name="profile_dedup", cores=32, driver_memory="96g")
spark.range(1).count()


def mat(df):
    df.write.mode("overwrite").format("noop").save()


def t(label, fn):
    best = None
    for _ in range(PASSES):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s (min of {PASSES})", flush=True)


def staged():
    return _staged_shingle_sets(spark, SF_DIR)


def phase_narrow_sets():
    mat(_doc_shingle_sets(spark, SF_DIR))


def phase_staging_write():
    staged()


def phase_explode(sets_):
    mat(sets_.select("doc_id", "n_sh", F.explode("arr").alias("s")))


def phase_df_window(sets_):
    sh = sets_.select("doc_id", "n_sh", F.explode("arr").alias("s"))
    mat(sh.withColumn("df", F.count("*").over(Window.partitionBy("s"))))


def phase_prefix(sets_):
    sh = sets_.select("doc_id", "n_sh", F.explode("arr").alias("s"))
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(CONTAINMENT_THRESHOLD) * F.col("n_sh")) + 1
    ).cast("int")
    prefix = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("s")))
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")),
        )
        .filter(F.col("rnk") <= prefix_len)
        .select("doc_id", "n_sh", F.xxhash64("s").alias("h"))
    )
    mat(prefix)


def phase_cand(sets_):
    sh = sets_.select("doc_id", "n_sh", F.explode("arr").alias("s"))
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(CONTAINMENT_THRESHOLD) * F.col("n_sh")) + 1
    ).cast("int")
    prefix = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("s")))
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")),
        )
        .filter(F.col("rnk") <= prefix_len)
        .select("doc_id", "n_sh", F.xxhash64("s").alias("h"))
    )
    a = prefix.alias("a").hint("shuffle_hash")
    b = sh.select("doc_id", "n_sh", F.xxhash64("s").alias("h")).alias("b")
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
        .select(F.col("a.doc_id").alias("inner_id"), F.col("b.doc_id").alias("outer_id"))
        .distinct()
    )
    mat(cand)


# full queries for reference
t("full dedup_containment", lambda: mat(dedup.q_dedup_containment(spark, SF_DIR)))
t("full dedup_ngram_jaccard", lambda: mat(dedup.q_dedup_ngram_jaccard(spark, SF_DIR)))
t("narrow sets (no staging)", phase_narrow_sets)
t("staging write+readback handle", phase_staging_write)
s = staged()
t("explode (from staged)", lambda: phase_explode(s))
t("df window", lambda: phase_df_window(s))
t("prefix (df+rank windows)", lambda: phase_prefix(s))
t("containment cand (prefix join postings + distinct)", lambda: phase_cand(s))
spark.stop()
