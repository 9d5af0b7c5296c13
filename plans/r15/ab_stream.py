"""Same-session interleaved A/B for VERDICT r14 item 6: data-volume-
derived streaming state partitions (repo HEAD rule: one partition per
32 MB of trigger input, floor 4 -> 4 at sf0.1) vs the old
machine-derived count (defaultParallelism = 32), toggled via the
SPARK_GRAFT_STATE_PARTITIONS override the rule exposes. Also asserts
EXACT row equality of both arms before timing."""

import os, sys, time

sys.path.insert(0, "/root/repo")

from kafka_connect_minio_pipeline_spark.session import get_spark
from kafka_connect_minio_pipeline_spark.streaming import queries as SQ

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 8

spark = get_spark(app_name="ab_stream", cores=32, driver_memory="96g")
spark.range(1).count()


def mat(df):
    df.write.mode("overwrite").format("noop").save()


QUERIES = {
    "tumbling": SQ.q_stream_tumbling,
    "stateful": SQ.q_stream_stateful,
    "ohlc": SQ.q_stream_ohlc,
    "countmin": SQ.q_stream_countmin,
}


def with_parts(n, fn):
    if n is None:
        os.environ.pop("SPARK_GRAFT_STATE_PARTITIONS", None)
    else:
        os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = str(n)
    try:
        return fn()
    finally:
        os.environ.pop("SPARK_GRAFT_STATE_PARTITIONS", None)


# exactness gate
for qn, fn in QUERIES.items():
    a = with_parts(None, lambda: sorted(tuple(r) for r in fn(spark, SF_DIR).collect()))
    b = with_parts(32, lambda: sorted(tuple(r) for r in fn(spark, SF_DIR).collect()))
    assert a == b, f"{qn}: rows differ between partition counts"
    print(f"# exactness {qn}: {len(a)} rows identical", flush=True)

ARMS = {}
for qn, fn in QUERIES.items():
    ARMS[f"{qn}_scaled"] = (lambda fn=fn: with_parts(None, lambda: mat(fn(spark, SF_DIR))))
    ARMS[f"{qn}_32"] = (lambda fn=fn: with_parts(32, lambda: mat(fn(spark, SF_DIR))))

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
