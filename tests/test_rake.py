"""Hand-computed RAKE example: pins the phrase-split and degree/freq
scoring semantics independently of the DuckDB oracle (both engines could
agree on a wrong spec — the ts_rsi lesson)."""

from __future__ import annotations

import os
import shutil

import pytest

from kafka_connect_minio_pipeline_spark.operators.text import q_text_rake_keywords

SF_SRC = "/root/testdata/sf0.001"

DOC = "the quick brown fox jumps of lazy dog, and quick fox"
# tokens:   the* quick brown fox jumps of* lazy dog,(punct) and* quick fox
# phrases:  [quick brown fox jumps] [lazy] [quick fox]
# deg/freq: quick 6/2=3, brown 4/1=4, fox 6/2=3, jumps 4/1=4, lazy 1/1=1
# scores:   14.0, 6.0, 1.0


@pytest.fixture(scope="module")
def rake_dir(tmp_path_factory, spark) -> str:
    d = str(tmp_path_factory.mktemp("rake"))
    for f in os.listdir(SF_SRC):
        if f != "documents.parquet":
            shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
    spark.createDataFrame(
        [(1, DOC, "en", "hand", len(DOC))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_rake_hand_example(spark, rake_dir):
    rows = sorted(
        q_text_rake_keywords(spark, rake_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [
        (r["rank"], r["phrase"], r["n_words"], r["n_occurrences"], r["score"])
        for r in rows
    ] == [
        (1, "quick brown fox jumps", 4, 1, 14.0),
        (2, "quick fox", 2, 1, 6.0),
        (3, "lazy", 1, 1, 1.0),
    ]
