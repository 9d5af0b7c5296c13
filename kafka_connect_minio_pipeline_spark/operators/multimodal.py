"""Multimodal column plumbing (SURVEY.md §2.4; BASELINE.json north star).

Design: image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside (the lakehouse-standard layout — the engine shuffles and
prunes bytes without interpreting them). Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so the Python boundary is paid once per batch,
not per row, and the operator parallelizes like any other map.

The decode kernels themselves are STUBS in this environment (no
image/audio libraries in the container): ``decode_image``/``decode_audio``
raise NotImplementedError, and the tested pipeline injects
``fake_decode_features`` — a deterministic byte-statistics kernel with the
exact signature a real (PIL/torchaudio) decoder would have. The Spark-side
plumbing — binary column construction, schema, batch iteration,
partition-parallel execution — is real and oracle-/test-covered.

There is no binary test table, so ``documents.text`` is encoded to UTF-8
bytes as the stand-in payload.

ORACLE CAVEAT (ASCII-only): the DuckDB oracles for features/resize/
frame_sample slice CHARACTERS (``ORD(SUBSTRING(text, i, 1))``) while the
Spark side operates on the UTF-8 BYTES of ``encode(text,'utf-8')``; the
two agree iff every document is pure ASCII (1 char == 1 byte). The
synthetic corpus is ASCII by construction and
``tests/test_oracle_parity.py::test_documents_are_ascii`` asserts it, so
a future non-ASCII regeneration fails loudly instead of hash-mismatching.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Query
from ..tables import load, spread

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, mean_byte double, max_byte int, head_byte int"
)


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, typed metadata)."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.col("source").alias("origin"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — not available in this container.

    Reference deployments plug PIL/torchvision here; the pipeline contract
    (bytes in → feature row out) is exercised via fake_decode_features.
    """
    raise NotImplementedError("image decoding requires an image library (PIL)")


def decode_audio(payload: bytes) -> "object":
    raise NotImplementedError("audio decoding requires an audio library")


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic stand-in decoder: byte statistics as 'features'."""
    n = len(payload)
    return {
        "n_bytes": n,
        "mean_byte": (sum(payload) / n) if n else 0.0,
        "max_byte": max(payload) if n else 0,
        "head_byte": payload[0] if n else 0,
    }


def extract_features(binary_df: DataFrame, decoder=fake_decode_features) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: one Python invocation per Arrow batch (not per row); the
    decoder is applied to the raw bytes of each payload. Swap ``decoder``
    for a real image/audio kernel in a full deployment — schema and batch
    shape stay identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decoder)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def q_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata over opaque binary payloads, entirely JVM-side: byte
    length, content hash, head bytes as hex — the operations a catalog
    runs without decoding (oracle-checked)."""
    b = binary_table(spark, sf_dir)
    return b.select(
        "doc_id",
        "mime",
        "origin",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("payload")).alias("content_md5"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("head_hex"),
    )


SQL_MULTIMODAL_META = """
    SELECT doc_id,
           'text/plain' AS mime,
           source AS origin,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
           MD5(text) AS content_md5,
           LOWER(HEX(ENCODE(SUBSTRING(text, 1, 4)))) AS head_hex
    FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode pipeline with the deterministic fake kernel.

    The byte statistics are integer-exact (mean emitted as an exact
    ratio-of-ints double), so even this Python-side path is oracle-checked
    against DuckDB computing the same statistics SQL-side.
    """
    return extract_features(binary_table(spark, sf_dir))


SQL_MULTIMODAL_FEATURES = """
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
           LIST_SUM(LIST_TRANSFORM(
               RANGE(1, OCTET_LENGTH(ENCODE(text)) + 1),
               i -> ORD(SUBSTRING(text, i, 1)))) * 1.0
               / OCTET_LENGTH(ENCODE(text)) AS mean_byte,
           CAST(LIST_MAX(LIST_TRANSFORM(
               RANGE(1, OCTET_LENGTH(ENCODE(text)) + 1),
               i -> ORD(SUBSTRING(text, i, 1)))) AS INTEGER) AS max_byte,
           CAST(ORD(SUBSTRING(text, 1, 1)) AS INTEGER) AS head_byte
    FROM documents
"""


RESIZE_STRIDE = 4  # stand-in for an image resize's downsample factor
RESIZE_SCHEMA = "doc_id long, n_bytes_in int, n_bytes_out int, out_md5 string"


def resize_payload(binary_df: DataFrame, stride: int = RESIZE_STRIDE) -> DataFrame:
    """'Resize' stub with real mapInPandas plumbing: keep every stride-th
    byte of the payload (a real deployment swaps in PIL's Image.resize —
    bytes in, smaller bytes out, same batch shape and schema contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda p: bytes(p)[::stride])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes_in": pdf["payload"].map(len).astype("int32"),
                    "n_bytes_out": out.map(len).astype("int32"),
                    "out_md5": out.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return binary_df.mapInPandas(run, schema=RESIZE_SCHEMA)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_payload(binary_table(spark, sf_dir))


SQL_MULTIMODAL_RESIZE = f"""
    WITH t AS (SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n FROM documents)
    SELECT doc_id,
           CAST(n AS INTEGER) AS n_bytes_in,
           CAST((n + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE} AS INTEGER) AS n_bytes_out,
           MD5(array_to_string(
               [SUBSTRING(text, i, 1) FOR i IN RANGE(1, n + 1)
                IF (i - 1) % {RESIZE_STRIDE} = 0], '')) AS out_md5
    FROM t
"""


FRAME_BYTES = 16  # stand-in frame size (a real video frame is ~MBs)
FRAME_STRIDE = 4  # keep every 4th frame
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_len int, frame_md5 string"


def sample_frames(
    binary_df: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Frame-sampling stub with real plumbing: chunk the payload into
    fixed-size 'frames' and keep every stride-th one — the shape of video
    keyframe extraction (1 input row → N output rows, Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, stride):
                    fb = p[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows.append(
                        (doc_id, idx, len(fb), hashlib.md5(fb).hexdigest())
                    )
            out = pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len", "frame_md5"]
            )
            yield out.astype(
                {"doc_id": "int64", "frame_idx": "int32", "frame_len": "int32"}
            )

    return binary_df.mapInPandas(run, schema=FRAME_SCHEMA)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(binary_table(spark, sf_dir))


SQL_MULTIMODAL_FRAMES = f"""
    WITH t AS (SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n FROM documents)
    SELECT doc_id,
           CAST(idx AS INTEGER) AS frame_idx,
           CAST(LEAST({FRAME_BYTES}, n - idx * {FRAME_BYTES}) AS INTEGER) AS frame_len,
           MD5(SUBSTRING(text, idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM t, UNNEST([i FOR i IN RANGE(0, (n + {FRAME_BYTES - 1}) // {FRAME_BYTES})
                    IF i % {FRAME_STRIDE} = 0]) r(idx)
"""


PHASH_SEGMENTS = 60  # bits in the perceptual hash (bit 59 max: stays
# positive in signed 64-bit on every engine — DuckDB errors on 1<<63)
PHASH_BANDS = 4  # LSH bands over the hash (15 bits each)
PHASH_BAND_BITS = PHASH_SEGMENTS // PHASH_BANDS
PHASH_HAM_T = 14  # max hamming for a pair: unrelated docs average 30±4
# bits apart on a 60-bit hash, so ≤14 is >4σ of genuine similarity
PHASH_SCHEMA = "doc_id long, phash long"


def phash64(payload: bytes) -> int:
    """Average-hash (aHash) of a payload: 60 contiguous segments, bit k
    set iff segment k's mean byte exceeds the global mean — compared in
    EXACT integer arithmetic (seg_sum·n > total·seg_len), so the hash is
    reproducible anywhere. On decoded images this is the classic 8×8
    aHash; on opaque bytes it is a locality-sensitive content signature
    with the same bit layout."""
    n = len(payload)
    if n == 0:
        return 0
    total = sum(payload)
    bits = 0
    for k in range(PHASH_SEGMENTS):
        lo = k * n // PHASH_SEGMENTS
        hi = (k + 1) * n // PHASH_SEGMENTS
        if hi == lo:
            continue
        if sum(payload[lo:hi]) * n > total * (hi - lo):
            bits |= 1 << k
    return bits


def compute_phash(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing (numpy segment sums per batch)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                p = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(p)
                if n == 0:
                    hashes.append(0)
                    continue
                bounds = [k * n // PHASH_SEGMENTS for k in range(PHASH_SEGMENTS + 1)]
                total = int(p.sum())
                bits = 0
                for k in range(PHASH_SEGMENTS):
                    lo, hi = bounds[k], bounds[k + 1]
                    if hi > lo and int(p[lo:hi].sum()) * n > total * (hi - lo):
                        bits |= 1 << k
                hashes.append(bits)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "phash": pd.Series(hashes, dtype="int64")}
            )

    return binary_df.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dup_pairs(ph: DataFrame) -> DataFrame:
    """Near-dup pairs from banded perceptual hashes.

    Standard LSH shape: two hashes within hamming distance t must agree
    on at least one of the 4 15-bit bands whenever t < 4·(bits-per-band
    gap) — candidates come from an equi-join on (band, value), never an
    all-pairs scan, then an exact bit_count(xor) verify. Band value
    space is 2^15 per band, so bucket sizes stay tiny and the join is
    sub-quadratic at any corpus size (same scale argument as the
    MinHash/SimHash band joins)."""
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), j * PHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << PHASH_BAND_BITS) - 1))
                        .alias("val"),
                    )
                    for j in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= PHASH_HAM_T)
    )
    return pairs.orderBy("a_id", "b_id")


def q_multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: perceptual-hash near-dup pairs over payloads."""
    return phash_near_dup_pairs(compute_phash(binary_table(spark, sf_dir)))


SQL_MULTIMODAL_PHASH = f"""
    WITH t AS (
        SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n,
               LIST_TRANSFORM(RANGE(1, OCTET_LENGTH(ENCODE(text)) + 1),
                              i -> ORD(SUBSTRING(text, i, 1))) AS bytes
        FROM documents),
    h AS (
        SELECT doc_id,
               COALESCE(LIST_SUM(LIST_TRANSFORM(RANGE(0, {PHASH_SEGMENTS}), k ->
                   CASE WHEN (k + 1) * n // {PHASH_SEGMENTS} > k * n // {PHASH_SEGMENTS}
                             AND LIST_SUM(bytes[k * n // {PHASH_SEGMENTS} + 1
                                                : (k + 1) * n // {PHASH_SEGMENTS}]) * n
                                 > LIST_SUM(bytes)
                                   * ((k + 1) * n // {PHASH_SEGMENTS}
                                      - k * n // {PHASH_SEGMENTS})
                        THEN (1::BIGINT << k) ELSE 0 END)), 0) AS phash
        FROM t),
    bands AS (
        SELECT doc_id, phash, j AS band,
               (phash >> (j * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1} AS val
        FROM h, UNNEST(RANGE(0, {PHASH_BANDS})) r(j))
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAM_T}
    ORDER BY a_id, b_id
"""


def q_multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup media CLUSTERS: connected components over the perceptual-
    hash pair graph. Hamming-ball pair graphs CHAIN (a→b→c each within
    the threshold), so the component diameter is unbounded — this uses
    the log-rounds large-star/small-star variant: round count stays
    O(log n) however deep the chains get (and it measured faster than
    propagate on this graph at sf0.1: 2.6 s vs 3.0 s same-session).
    Downstream: keep one representative per cluster, exactly like
    ``llm_dedup_keep_best`` does for text."""
    from .dedup import connected_components_ls

    pairs = q_multimodal_phash_pairs(spark, sf_dir).select("a_id", "b_id")
    return connected_components_ls(pairs, src="a_id", dst="b_id")


SQL_MULTIMODAL_PHASH_CLUSTERS = f"""
    WITH RECURSIVE pairs AS ({SQL_MULTIMODAL_PHASH}),
    edges AS (
        SELECT a_id AS a, b_id AS b FROM pairs
        UNION
        SELECT b_id, a_id FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
"""


QUERIES = {
    "multimodal_phash_pairs": Query(q_multimodal_phash_pairs, SQL_MULTIMODAL_PHASH),
    "multimodal_phash_clusters": Query(
        q_multimodal_phash_clusters, SQL_MULTIMODAL_PHASH_CLUSTERS
    ),
    "multimodal_binary_meta": Query(q_multimodal_binary_meta, SQL_MULTIMODAL_META),
    "multimodal_features": Query(q_multimodal_features, SQL_MULTIMODAL_FEATURES, headline=True),
    "multimodal_resize": Query(q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "multimodal_frame_sample": Query(q_multimodal_frame_sample, SQL_MULTIMODAL_FRAMES),
}
