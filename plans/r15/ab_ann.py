"""Same-session interleaved A/B for VERDICT r14 item 5: the numpy
mapInArrow ANN kernels (repo HEAD) vs the r7-r14 relational spelling
(crossJoin-broadcast -> min-struct groupBy), monkeypatched in. Also
asserts EXACT row equality of both arms' full query outputs at the bench
SF before timing. Arms interleaved per pass; estimator = per-arm min."""

import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.session import get_spark
from kafka_connect_minio_pipeline_spark.operators import similarity, similarity_pq
from kafka_connect_minio_pipeline_spark.operators.similarity import (
    _cell_score,
    _with_cc,
)
from kafka_connect_minio_pipeline_spark.operators.similarity_pq import (
    _code_score,
    _pq_subs,
    _sub_slices,
    _with_dcc,
    residuals,
)

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 8

spark = get_spark(app_name="ab_ann", cores=32, driver_memory="96g")
spark.range(1).count()


def mat(df):
    df.write.mode("overwrite").format("noop").save()


# --- the r7-r14 relational implementations (reference arms) ---

def rel_ivf_assign(e, cents):
    best = (
        e.crossJoin(F.broadcast(_with_cc(cents)))
        .withColumn("score", _cell_score())
        .groupBy("vec_id")
        .agg(F.min(F.struct("score", "k")).alias("b"))
    )
    return best.select("vec_id", F.col("b.k").cast("int").alias("cell"))


def rel_pq_encode(e, books):
    best = (
        _pq_subs(e)
        .join(F.broadcast(_with_dcc(books)), "sub")
        .withColumn("score", _code_score())
        .groupBy("vec_id", "sub")
        .agg(F.min(F.struct("score", "code")).alias("b"))
    )
    return best.select("vec_id", "sub", F.col("b.code").cast("int").alias("code"))


def rel_ivfpq_index(e, cents, books):
    assigned = (
        e.crossJoin(F.broadcast(_with_cc(cents)))
        .withColumn("score", _cell_score())
        .groupBy("vec_id")
        .agg(F.min(F.struct("score", "k")).alias("b"), F.first("v").alias("v"))
        .select("vec_id", F.col("b.k").cast("int").alias("cell"), "v")
    )
    subs = assigned.select(
        "vec_id", "cell", F.posexplode(_sub_slices("v")).alias("sub", "sv")
    )
    best = (
        subs.join(F.broadcast(_with_dcc(books)), "sub")
        .withColumn("score", _code_score())
        .groupBy("vec_id", "sub")
        .agg(F.min(F.struct("score", "code")).alias("b"), F.first("cell").alias("cell"))
    )
    return best.select(
        "vec_id", "cell", "sub", F.col("b.code").cast("int").alias("code")
    )


def rel_ivfpq_residual_index(e, cents, books):
    res = residuals(e, cents)
    subs = res.select(
        "vec_id", "cell", F.posexplode(_sub_slices("v")).alias("sub", "sv")
    )
    best = (
        subs.join(F.broadcast(_with_dcc(books)), "sub")
        .withColumn("score", _code_score())
        .groupBy("vec_id", "sub")
        .agg(F.min(F.struct("score", "code")).alias("b"), F.first("cell").alias("cell"))
    )
    return best.select(
        "vec_id", "cell", "sub", F.col("b.code").cast("int").alias("code")
    )


KERNELS = (
    similarity.ivf_assign,
    similarity_pq.pq_encode,
    similarity_pq.ivfpq_index,
    similarity_pq.ivfpq_residual_index,
)
RELATIONAL = (
    rel_ivf_assign,
    rel_pq_encode,
    rel_ivfpq_index,
    rel_ivfpq_residual_index,
)


def patch(impls):
    similarity.ivf_assign = impls[0]
    similarity_pq.pq_encode = impls[1]
    similarity_pq.ivfpq_index = impls[2]
    similarity_pq.ivfpq_residual_index = impls[3]


QUERIES = {
    "ivf": similarity.q_similarity_ann_ivf,
    "adc": similarity_pq.q_similarity_ann_adc,
    "ivfpq": similarity_pq.q_similarity_ann_ivfpq,
    "residual": similarity_pq.q_similarity_ann_ivfpq_residual,
    "sweep": similarity.q_similarity_ivf_probe_sweep,
}

# --- exactness gate: both arms identical rows on the bench SF ---
for qn, fn in QUERIES.items():
    patch(KERNELS)
    a = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    patch(RELATIONAL)
    b = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    patch(KERNELS)
    assert a == b, f"{qn}: kernel vs relational rows differ"
    print(f"# exactness {qn}: {len(a)} rows identical", flush=True)

ARMS = {}
for qn, fn in QUERIES.items():
    def mk(fn=fn, impls=KERNELS):
        def run():
            patch(impls)
            try:
                mat(fn(spark, SF_DIR))
            finally:
                patch(KERNELS)
        return run
    ARMS[f"{qn}_kernel"] = mk(fn, KERNELS)
    ARMS[f"{qn}_rel"] = mk(fn, RELATIONAL)

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
