"""A/B (session 2): connected_components_ls probe batching — probe the
star-forest fixpoint every K rounds instead of every round. The CC loop
is sequential-job-launch-bound at bench scale (profile: 5 probe jobs of
0.4-0.8 s for 4 actual rounds on the sf0.1 phash graph); the probe
costs about half a round at any scale, so K=2 saves ~rounds/2 probes
for at most one no-op round (a converged forest passes the round
unchanged — labels provably identical).

Usage: python plans/r15/ab_cc_probe_batch.py [passes]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from kafka_connect_minio_pipeline_spark.session import get_spark
from kafka_connect_minio_pipeline_spark.operators.dedup import (
    connected_components_ls,
)
from kafka_connect_minio_pipeline_spark.operators.multimodal import (
    binary_table,
    compute_phash,
    phash_near_dup_pairs,
)
from kafka_connect_minio_pipeline_spark.operators.graph import (
    part_cooccurrence_edges,
)

SF = "/root/testdata/sf0.1"
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 8

spark = get_spark(app_name="ab_cc_probe_batch", cores=32, driver_memory="96g")
spark.range(1).count()


def phash_cc(k: int):
    pairs = phash_near_dup_pairs(
        compute_phash(binary_table(spark, SF)), ordered=False
    ).select("a_id", "b_id")
    return connected_components_ls(
        pairs, src="a_id", dst="b_id", canonical=True, rounds_per_probe=k
    )


def wcc(k: int):
    return connected_components_ls(
        part_cooccurrence_edges(spark, SF), src="a", dst="b",
        canonical=True, rounds_per_probe=k,
    )


for build in (phash_cc, wcc):
    r1 = sorted(tuple(r) for r in build(1).collect())
    r2 = sorted(tuple(r) for r in build(2).collect())
    assert r1 == r2, f"{build.__name__}: labels differ between K=1 and K=2"
    print(f"# {build.__name__}: labels identical ({len(r1)} rows)", flush=True)


def mat(df):
    df.write.mode("overwrite").format("noop").save()


ARMS = {
    "phash_k1": lambda: phash_cc(1),
    "phash_k2": lambda: phash_cc(2),
    "wcc_k1": lambda: wcc(1),
    "wcc_k2": lambda: wcc(2),
}
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
