"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is fully materialized through the noop sink (count() alone can
skip column evaluation via pruning). Session startup and parquet footer
reads are excluded from per-query timings by a tiny warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

from kafka_connect_minio_pipeline_spark.registry import all_queries
from kafka_connect_minio_pipeline_spark.session import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _timed(mat, build, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    mat(build(spark, sf_dir))
    return time.perf_counter() - t0


def _cooldown_spin(
    spark,
    sf_dir: str,
    control_fn,
    budget_s: float,
    healthy_at: float,
    label: str,
) -> float:
    """Idle-cooldown spin (VERDICT r12 item 4, extended to the heavy
    phase per VERDICT r13 item 2): probe the control query on a sleep
    interval until it reads healthy twice CONSECUTIVELY (one healthy
    read can be a scheduler lull), bounded by a wall-clock budget so a
    genuinely busy box still produces an artifact (the health gate then
    labels it honestly). Each probe is min-of-3: the gate compares
    MINIMA over many passes, and a single control sample sits well
    above the floor even on an idle box (r13 measurement: singles
    0.77-1.44 around a min-of-14 of 0.75). Returns seconds spent.
    """
    print(
        f"# {label} cooldown budget: {budget_s:.0f}s"
        f" (gate {healthy_at:.2f}s, min-of-3 probe every 15s)",
        file=sys.stderr,
    )
    t_start = time.monotonic()
    deadline = t_start + budget_s
    consecutive = 0
    while consecutive < 2:
        probe = min(
            _timed(materialize, control_fn, spark, sf_dir) for _ in range(3)
        )
        consecutive = consecutive + 1 if probe <= healthy_at else 0
        print(
            f"# {label} cooldown control (min of 3): {probe:.3f}s"
            f" ({consecutive}/2 healthy)",
            file=sys.stderr,
        )
        if consecutive >= 2:
            break
        if time.monotonic() >= deadline:
            print(
                f"# {label} cooldown budget exhausted — proceeding hot;"
                " the health gate will label the artifact",
                file=sys.stderr,
            )
            break
        time.sleep(15)
    return round(time.monotonic() - t_start, 1)


# Frozen heavy-tail set (VERDICT r10 item 5): the expensive families —
# iterative graph ops, dedup evals, IVFPQ, substring clean, phash
# clustering — get the same round-over-round regression tracking the
# 18-query headline set has had since r1, instead of ad-hoc per-round
# numbers scattered through BASELINE.md. Measured by the same warm-pass +
# min-of-N protocol AFTER the health-gated headline attempts (so the
# session is proven healthy first) and emitted beside the headline
# numbers; the headline "value" stays the BASELINE.md-comparable metric.
HEAVY_SET = (
    "graph_wcc",
    "graph_kcore",
    "graph_jaccard",
    "dedup_containment",
    "dedup_incremental",
    "dedup_cascade_eval",
    "similarity_ann_ivfpq",
    "llm_dedup_keep_best",
    "llm_substring_clean",
    "multimodal_phash_clusters",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench", cores=cpus, driver_memory="96g")

    queries = {n: q for n, q in all_queries().items() if q.headline}
    spark.range(1).count()  # JVM warmup

    # Steady-state methodology: one untimed warm pass (whole-stage-codegen
    # JIT ~1-2.5s/plan, JVM heap growth, cold page cache — one-time costs
    # a long-lived cluster amortizes away), then four timed passes taking
    # the per-query MINIMUM (this VM shows multi-second stolen-time
    # stalls that can hit the same query in consecutive passes — r3's
    # local run caught one query stalled in all three passes of the
    # min-of-3 era, so one more sample). Nothing is cached between
    # passes at the DataFrame level (no persist()), so every timed run
    # re-executes every scan, shuffle, and UDF.
    for name in sorted(queries):
        materialize(queries[name].fn(spark, sf_dir))

    # Health gate (VERDICT r9, tightened r12): the official per-round
    # artifact shipped hot (whole-machine stolen time) three rounds
    # running while healthy runs sat in BASELINE.md. The control query's
    # min timing is the documented session-health signal (healthy ≈
    # 0.69-0.73 at sf0.1; ≥0.9 = hot). Rather than report the first
    # snapshot, re-run the timed passes (bounded attempts) until the
    # control reads healthy, accumulating per-query MINIMA across all
    # attempts — min over more samples is strictly a better steady-state
    # estimator under one-sided stolen-time noise. If every attempt
    # stays hot, report the accumulated minima with
    # control_healthy=false so a reader knows to discount the absolute
    # numbers. r12 (VERDICT r11): the 0.8 gate let a 0.774-control
    # session ship a near-uniform +9% artifact — gate lowered to 0.75,
    # attempts raised, and the artifact now carries control_ratio
    # (control / the 0.708 r10 healthy reference) so a reader can
    # control-normalize even a passing-but-warm artifact.
    control_query = "agg_pricing_summary"
    # r13 recalibration (measured, documented): two fresh-session
    # idle-box series (load avg ≤0.6, nothing else running, 14 warm
    # passes each) read min 0.751 / 0.770, median 0.88 / 0.95 — this VM
    # vintage's idle FLOOR sits at ~0.75-0.77, so the old 0.75 gate
    # (calibrated to r10's 0.708 reference) mislabels a provably idle
    # machine as hot and can never pass. Gate = today's floor + the
    # same ~6% margin the old gate carried over its reference. The
    # artifact still reports the raw control and the ratio against the
    # historical 0.708 reference, so a reader can control-normalize
    # regardless of the gate verdict.
    control_healthy_at = 0.80
    control_ref = 0.708  # r10 healthy-session control minimum
    max_attempts = 5 if control_query in queries else 1

    # Idle-cooldown spin (VERDICT r12 item 4): the driver's grade run
    # follows the ~45-minute suite run on the same box, so the session
    # is warm BY CONSTRUCTION — two consecutive official artifacts
    # shipped control-hot despite the retry gate, because retrying
    # immediately re-samples the same hot machine. Before the first
    # timed pass, probe the control query on a sleep interval until it
    # reads healthy twice CONSECUTIVELY (one healthy read can be a
    # scheduler lull), bounded by a wall-clock budget so a genuinely
    # busy box still produces an artifact (the existing health gate
    # then labels it honestly). The probe itself is ~0.7 s every 15 s —
    # it keeps the JIT'd plan warm without meaningfully heating the box.
    cooldown_budget = float(os.environ.get("SPARK_GRAFT_COOLDOWN_S", "480"))
    cooldown_spent = 0.0
    if control_query in queries:
        cooldown_spent = _cooldown_spin(
            spark,
            sf_dir,
            queries[control_query].fn,
            cooldown_budget,
            control_healthy_at,
            "headline",
        )

    timings: dict[str, float] = {}
    attempts = 0
    for attempt in range(max_attempts):
        attempts = attempt + 1
        for _pass in range(4):
            for name in sorted(queries):
                t0 = time.perf_counter()
                materialize(queries[name].fn(spark, sf_dir))
                dt = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
                print(
                    f"# attempt{attempt} pass{_pass} {name}: {dt:.2f}s",
                    file=sys.stderr,
                )
        control = timings.get(control_query, 0.0)
        print(
            f"# attempt{attempt} control {control_query}: {control:.3f}s",
            file=sys.stderr,
        )
        # health decides whether to KEEP RETRYING, not how many samples
        # the estimator gets: min-of-N is the steady-state estimator
        # under one-sided noise, so always accumulate at least three
        # attempts (12 samples) before an early healthy exit — r13
        # found a healthy attempt-1 exit shipping 4-sample minima that
        # read ~5% above the same session's 20-sample minima
        if attempts >= 3 and control <= control_healthy_at:
            break

    # Heavy-tail set: one warm pass then health-gated timed attempts
    # (three passes each, accumulated minima), with its OWN control
    # sample per attempt — the headline gate vets the session MINUTES
    # earlier, and r11 showed heat arriving mid-run, so the heavy
    # numbers carry their own attempts + control (VERDICT r11 item 2).
    registry = all_queries()
    heavy = {n: registry[n] for n in HEAVY_SET if n in registry}
    heavy_timings: dict[str, float] = {}
    heavy_control = -1.0
    heavy_attempts = 0
    for name in sorted(heavy):
        materialize(heavy[name].fn(spark, sf_dir))
    # Heavy-phase cooldown (VERDICT r13 item 2): the headline gate vets
    # the session MINUTES before the heavy passes start, and the
    # headline attempts themselves re-warm the box — three straight
    # official artifacts shipped heavy_control_healthy=false while the
    # headline set read healthy. Re-run the same min-of-3 probe spin
    # (same 0.80 gate, its own bounded budget) AFTER the heavy warm
    # pass and BEFORE the heavy timed passes.
    heavy_cooldown_budget = float(
        os.environ.get("SPARK_GRAFT_HEAVY_COOLDOWN_S", "300")
    )
    heavy_cooldown_spent = 0.0
    if control_query in queries:
        heavy_cooldown_spent = _cooldown_spin(
            spark,
            sf_dir,
            queries[control_query].fn,
            heavy_cooldown_budget,
            control_healthy_at,
            "heavy",
        )
    for attempt in range(3):
        heavy_attempts = attempt + 1
        for _pass in range(3):
            for name in sorted(heavy):
                t0 = time.perf_counter()
                materialize(heavy[name].fn(spark, sf_dir))
                dt = round(time.perf_counter() - t0, 3)
                heavy_timings[name] = min(heavy_timings.get(name, dt), dt)
                print(
                    f"# heavy attempt{attempt} pass{_pass} {name}: {dt:.2f}s",
                    file=sys.stderr,
                )
        if control_query not in queries:
            break
        t0 = time.perf_counter()
        materialize(queries[control_query].fn(spark, sf_dir))
        hc = round(time.perf_counter() - t0, 3)
        heavy_control = hc if heavy_control < 0 else min(heavy_control, hc)
        print(
            f"# heavy attempt{attempt} control: {hc:.3f}s", file=sys.stderr
        )
        if heavy_attempts >= 2 and heavy_control <= control_healthy_at:
            break

    control = timings.get(control_query, -1.0)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "heavy_queries": heavy_timings,
                "heavy_total": round(sum(heavy_timings.values()), 3),
                "sf": sf,
                "cpus": cpus,
                "control": control,
                "control_ratio": round(control / control_ref, 3)
                if control > 0
                else -1.0,
                "control_healthy": bool(0 <= control <= control_healthy_at),
                "attempts": attempts,
                "cooldown_s": cooldown_spent,
                "heavy_cooldown_s": heavy_cooldown_spent,
                "heavy_control": heavy_control,
                "heavy_control_healthy": bool(
                    0 <= heavy_control <= control_healthy_at
                ),
                "heavy_attempts": heavy_attempts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
