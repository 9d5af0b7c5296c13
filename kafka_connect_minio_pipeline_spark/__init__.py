"""kafka_connect_minio_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference Kafka-Connect → MinIO pipeline (see SURVEY.md), expressed
Spark-first: DataFrame / Spark SQL for the relational surface, Structured
Streaming for the streaming spine, Pandas UDFs only where built-ins cannot
express the semantics.

Layout:
    session     — SparkSession factory tuned for local[N] and cluster runs
    tables      — canonical loaders for the test star schema (nanos-ts safe)
    pipeline    — the reference's per-record dataflow (profile transform,
                  reconciliation) as composable DataFrame → DataFrame fns
    operators   — relational + large-scale data-pipeline operators
                  (joins, aggregates, windows, setops, dedup, similarity,
                  text analysis, multimodal plumbing)
    functions   — scalar/vector expression helpers
    sources     — Kafka + Confluent-registry Avro decode, file sources
    streaming   — Structured Streaming windows / watermarks / stateful ops
    plans       — plan introspection helpers (pushdown / broadcast asserts)
"""

__version__ = "0.1.0"

from .registry import all_queries  # noqa: E402
from .session import get_spark  # noqa: E402
from .sinks import write_compacted  # noqa: E402
from .tables import load, load_all, register_views, sql  # noqa: E402

__all__ = [
    "all_queries",
    "get_spark",
    "load",
    "load_all",
    "register_views",
    "sql",
    "write_compacted",
]
