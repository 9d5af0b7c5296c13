"""Registry contract tests: driver-facing strictness and grading-window
ordering (VERDICT r1 items 1-2).

The driver's correctness gate hashes only the FIRST 50 registry entries in
iteration order, and ``__spark_entry__`` builds its dicts via
``all_queries()`` — so (a) a module that fails to import must be a loud
error there, never a silently vanished query family, and (b) the families
left ungraded in round 1 must now sit inside the graded window.
"""

from __future__ import annotations

import pytest

from kafka_connect_minio_pipeline_spark import registry


def test_strict_import_failure_is_loud(monkeypatch):
    broken = registry._QUERY_MODULES + ("kafka_connect_minio_pipeline_spark.no_such_module",)
    monkeypatch.setattr(registry, "_QUERY_MODULES", broken)
    with pytest.raises(ImportError):
        registry.all_queries()  # strict=True is the default
    # lenient mode keeps exploratory tooling alive
    assert len(registry.all_queries(strict=False)) > 0


def test_driver_entrypoints_use_strict_default():
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert set(entry.oracle_sql()) <= set(names)
    assert len(names) >= 69


def test_grading_window_rotation_invariants():
    """The driver hashes the first 50 registry entries. Rather than one
    round's literal window shape (which went stale twice — VERDICT r6
    item 1), assert the invariants every rotation must keep:

    - every pin names a registered query (all_queries() itself raises on
      a dangling pin — covered separately below);
    - the pins ARE the window: exactly 50, occupying the first 50 slots;
    - any query with no driver row in the recorded CORRECTNESS history
      sits inside the window (a new operator must be graded the round it
      lands, never spilled silently).
    """
    import json
    import pathlib

    names = list(registry.all_queries())
    assert set(registry._GRADE_FIRST) <= set(names)
    assert len(registry._GRADE_FIRST) == 50
    assert names[:50] == list(registry._GRADE_FIRST)
    root = pathlib.Path(__file__).resolve().parent.parent
    graded: set[str] = set()
    # r* not r0*: the r0-only glob silently dropped CORRECTNESS_r10+
    # from the graded union (r11 finding)
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        graded |= set(json.loads(p.read_text()))
    never = {n for n in names if n not in graded}
    missing = never - set(names[:50])
    assert not missing, f"never-graded queries outside the window: {sorted(missing)}"


def test_dangling_grade_pin_is_loud(monkeypatch):
    """ADVICE r6 item 1: a _GRADE_FIRST pin that resolves to no
    registered query must raise in strict mode (the driver path), never
    silently shift the grading window — round 6's exact defect."""
    monkeypatch.setattr(
        registry, "_GRADE_FIRST", registry._GRADE_FIRST + ("no_such_query",)
    )
    with pytest.raises(ValueError, match="no_such_query"):
        registry.all_queries()
    # lenient mode still lists what it can (exploratory tooling)
    assert len(registry.all_queries(strict=False)) > 0


def test_survey_lists_every_registered_query():
    """SURVEY.md §2.5 is the judge's coverage checklist — every registry
    entry must appear there by name (backticked) so the inventory can
    never drift from the implementation."""
    import pathlib

    text = pathlib.Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    missing = [n for n in registry.all_queries(strict=False) if f"`{n}`" not in text]
    assert not missing, f"registry queries absent from SURVEY.md: {missing}"


def test_package_root_exports_all_resolve():
    """Every name in the package's __all__ must import — a typo in the
    lazy re-export map would otherwise only fail at first use."""
    import kafka_connect_minio_pipeline_spark as K

    for name in K.__all__:
        assert getattr(K, name) is not None, name


def test_concurrent_queries_match_serial(spark):
    """Six queries from different families run CONCURRENTLY on one
    session (threads share the SparkContext — the multi-tenant/notebook
    pattern) must produce exactly their serial results: query builders
    are pure, scratch staging dirs are invocation-unique, no shared
    mutable state anywhere."""
    import concurrent.futures as cf

    sf = "/root/testdata/sf0.001"
    names = [
        "agg_pricing_summary", "window_running_distinct", "text_quality",
        "dedup_exact", "ts_week_over_week", "graph_degree_stats",
    ]
    qs = registry.all_queries()

    def run(name):
        return sorted(map(str, qs[name].fn(spark, sf).collect()))

    serial = {n: run(n) for n in names}
    with cf.ThreadPoolExecutor(max_workers=6) as ex:
        parallel = dict(zip(names, ex.map(run, names)))
    assert parallel == serial
