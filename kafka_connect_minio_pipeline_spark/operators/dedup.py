"""Deduplication operators over the ``documents`` / ``embeddings`` tables
(SURVEY.md §2.4 dedup row; BASELINE.json north star).

Four families, each with the scale story a 100 TB training-data pipeline
needs:

- exact (normalized-fingerprint): one md5 per doc + groupBy — linear, one
  shuffle on the fingerprint; the canonical first pass of any dedup stack.
- n-gram Jaccard: candidate pairs ONLY via shared-shingle inverted index
  (docs sharing zero shingles can't have J > 0), then exact verification.
  Never materializes the quadratic pair space.
- MinHash-LSH: fixed-size signatures (16 perms) + banded candidate join +
  exact verify. Sub-quadratic; the standard web-scale near-dup design
  (candidate recall measured in tests against the exact Jaccard operator).
- SimHash: 32-bit signature via per-bit majority vote, neighbor counting
  with hd ≤ 1. The Spark plan uses pigeonhole banding (4 × 8-bit bands;
  hd ≤ 1 pairs must agree on ≥ 3 bands), the oracle brute-forces — same
  result set, so the scalable plan is verified against the quadratic spec.
- embedding cosine near-dup: exact threshold pairs (double math shared
  bit-for-bit with the oracle); the ANN/LSH scale path lives in
  operators/similarity.py.

Tokenization is canonical across every operator AND the oracle: lowercase,
split on whitespace, drop empties.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.barrier import filter_above
from ..functions.vectors import cosine_from_parts, dot, to_double
from ..registry import Query
from ..scratch import scratch_dir
from ..tables import load, spread

# ---------------------------------------------------------------------------
# canonical tokenization / shingling (Spark + mirrored SQL)
# ---------------------------------------------------------------------------


# Java's \s is [ \t\n\x0B\f\r] but RE2's (DuckDB) omits vertical tab
# \x0B, so a shared-grammar regex spelled \s diverges on documents
# containing \x0B (ADVICE r7). Every regex shared with an oracle spells
# the class out; WS_CHARS composes it into other classes (BPE_ISH) and
# WS_EXPR is the doubled-backslash form for Spark SQL string literals
# (which process escapes — the text.py:~115 trap).
WS_CHARS = " \\t\\n\\x0B\\f\\r"
WS_CLASS = f"[{WS_CHARS}]"
WS_EXPR = WS_CLASS.replace("\\", "\\\\")


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), WS_CLASS + "+"), lambda x: x != "")


SQL_TOKENS = (
    "list_filter(string_split_regex(lower({col}), '"
    + WS_CLASS
    + "+'), x -> x <> '')"
)


def word_ngrams(toks: Column, n: int) -> Column:
    """Sliding word n-grams as zip_with over n shifted slices of the token
    array. The obvious transform(sequence(...), i -> element_at(...)) form
    is ~10x slower (one interpreted array index per gram element); zipping
    whole slices stays vectorized. Short docs short-circuit to an empty
    array (the slices would otherwise be ragged and zip_with null-pads)."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    acc = F.slice(toks, 1, m)
    for k in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(toks) >= n, acc).otherwise(F.array().cast("array<string>"))


def shingles3(toks: Column) -> Column:
    """Word 3-gram shingles (canonical near-dup unit across operators)."""
    return word_ngrams(toks, 3)


SQL_SHINGLES_CTE = f"""
    shingle AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id, {SQL_TOKENS.format(col='text')} AS w FROM documents),
             UNNEST([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                     FOR i IN RANGE(1, GREATEST(LEN(w) - 1, 1))]) t(s)
    )
"""


def _doc_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, arr: sorted distinct shingles, n_sh) — entirely NARROW.

    The shingle set is deduplicated per row with array_distinct instead of
    a global .distinct() shuffle (shingles never cross documents, so the
    semantics are identical). Every near-dup operator consumes this
    relation several times, and plan-level ReuseExchange cannot unify
    subtrees under different join shapes — keeping the recompute
    shuffle-free (scan → project) is what makes that affordable, and it
    beats persist(): a cache boundary here measured 3× slower cold because
    materialization blocks and AQE loses runtime stats through it."""
    # spread first: the single-row-group documents file is ONE scan
    # partition, which would run the whole tokenize+shingle stage on one
    # core (see tables.spread); the staged files inherit the fan-out so
    # every downstream consumer reads in parallel too.
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    return shingle_sets_of(docs)


def shingle_sets_of(docs: DataFrame) -> DataFrame:
    """The narrow (doc_id, arr, n_sh) projection of any documents-shaped
    relation — batch scan or streaming micro-batch alike (it is pure
    per-row expression work, which is what lets stream_dedup_minhash
    reuse the exact batch shingling)."""
    # tokenization staged behind a projection boundary — word_ngrams
    # slices its input n times and there is no CSE across higher-order-
    # function lambdas (same finding as text_fingerprint's hash array)
    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    arr = F.array_sort(F.array_distinct(shingles3(F.col("toks"))))
    return staged.select("doc_id", arr.alias("arr")).withColumn(
        "n_sh", F.size("arr")
    )


# Staging-write file sizing (r15, guide §6 "small files hurt twice"):
# one staged file per ~32 MB of source input, floored at 8. The staging
# write used to inherit spread()'s defaultParallelism partitioning — a
# MACHINE property — and on local[32] wrote 32 ~50 KB files whose
# per-file/task overhead was the single biggest phase of every near-dup
# query (r15 profile: 1.75 s of a 3.9 s containment run). The floor
# keeps the narrow shingle compute (which runs inside the coalesced
# stage) multi-way; the byte-derived term keeps files near the
# 32 MB-input (~100 MB output) range at any scale.
STAGE_TARGET_INPUT_BYTES = 32 * 1024 * 1024
STAGE_FILES_MIN = 8


def _stage_files(sf_dir: str, name: str) -> int:
    import os

    p = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(p):
        bytes_ = sum(
            os.path.getsize(f"{p}/{f}")
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
    else:
        bytes_ = os.path.getsize(p)
    return max(STAGE_FILES_MIN, -(-bytes_ // STAGE_TARGET_INPUT_BYTES))


def _staged_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize :func:`_doc_shingle_sets` ONCE per query invocation as
    a temp parquet relation and hand back the read-back DataFrame.

    The sets relation is consumed 3× per near-dup query (prefix/signature
    derivation + both verify sides). Round 1 measured ``persist()`` 3×
    slower cold (the cache boundary blocks and hides stats from AQE);
    the r15 three-arm A/B (plans/r15/ab_staging.py, min-of-6, healthy
    control 0.77) re-confirmed staging over the 3× narrow recompute AND
    found the write's file count was the real cost: staged-32-files vs
    coalesced-8 vs no-staging read (jaccard 2.47 / 2.08 / 2.95,
    containment 2.84 / 2.50 / 3.13, minhash 1.35 / 1.27 / 1.77,
    incremental 2.01 / 1.66 / 2.47 s). The file count is now derived
    from the source volume (:func:`_stage_files`), not the core count.
    Every consumer gets real file stats + column pruning (the candidate
    derivation never reads ``arr``). At cluster scale this is a
    job-scoped staging table. A fresh temp dir per invocation keeps
    bench timings honest (no state reuse across the driver's double
    runs)."""
    d = scratch_dir("kcm_shingle_sets_")
    # zstd staging (guide §6): measured write+readback of this relation
    # at sf0.1 — snappy 0.73 s / uncompressed 0.61 / zstd 0.52 / lz4 0.51,
    # with zstd also the smallest file (1.5 MB vs 2.2 snappy). Every
    # near-dup query pays this write per invocation, so the codec is on
    # the timed path; zstd is also the right default on real object
    # storage (smaller at similar read speed).
    _doc_shingle_sets(spark, sf_dir).coalesce(
        _stage_files(sf_dir, "documents")
    ).write.mode("overwrite").option("compression", "zstd").parquet(d)
    return spark.read.parquet(d)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded (doc_id, s) distinct-shingle rows (inverted-index form)."""
    return _doc_shingle_sets(spark, sf_dir).select(
        "doc_id", F.explode("arr").alias("s")
    )


# ---------------------------------------------------------------------------
# 1. exact dedup via normalized fingerprint
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection on the normalized token-set fingerprint
    (md5 of sorted distinct tokens): doc → canonical representative.

    One shuffle total: min/count as window functions over the fingerprint
    partition (no groupBy + join back — the reduced form and the original
    rows share a single hash exchange). Fingerprint is 16 bytes/doc, so
    this generalizes to any scale.
    """
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
    )
    w = Window.partitionBy("fingerprint")
    return docs.select("doc_id", fp.alias("fingerprint")).select(
        "doc_id",
        "fingerprint",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
        F.count("*").over(w).alias("group_size"),
    )


SQL_DEDUP_EXACT = f"""
    WITH fp AS (
        SELECT doc_id,
               md5(COALESCE(array_to_string(list_sort(list_distinct(
                   {SQL_TOKENS.format(col='text')})), ' '), '')) AS fingerprint
        FROM documents),
    canon AS (
        SELECT fingerprint, MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM fp GROUP BY fingerprint)
    SELECT doc_id, fp.fingerprint, canonical_id,
           doc_id <> canonical_id AS is_dup, group_size
    FROM fp JOIN canon USING (fingerprint)
"""


# ---------------------------------------------------------------------------
# 2. exact n-gram Jaccard near-dup pairs (inverted-index candidates)
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.8


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with 3-gram-shingle Jaccard ≥ 0.8.

    Exactness-preserving candidate pruning (AllPairs/PPJoin prefix filter):
    under a global shingle order (document frequency ascending, rarest
    first), any pair with J ≥ t must share a shingle within each doc's
    first ``|d| - ceil(t*|d|) + 1`` shingles — because J ≥ t forces an
    overlap of at least ``ceil(t*|d|)`` on BOTH sides (size filter
    ``|small| ≥ t*|large|`` is implied). So the inverted index holds only
    that ~(1-t) prefix — and, decisively, the rarest shingles — which
    collapses the hot-posting-list blowup that a full self-join suffers on
    a low-vocabulary corpus. Candidates are then verified exactly via one
    array-intersect join per side. At 100 TB this is the standard
    distributed set-similarity-join design; the oracle remains the
    quadratic inverted-index spec, so pruning is proven lossless at sf0.01.
    """
    sets_ = _staged_shingle_sets(spark, sf_dir)
    sh = sets_.select("doc_id", "n_sh", F.explode("arr").alias("s"))
    # Document frequency as a window over s (not groupBy+join back: that
    # computes the exploded relation twice — once for the agg, once for
    # the probe side — and a broadcast of dfreq would kill the exchange
    # reuse). Two windows, two shuffles, one derivation.
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("n_sh")) + 1
    ).cast("int")
    prefix = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("s")))
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")),
        )
        .filter(F.col("rnk") <= prefix_len)
        # the self-join only needs EQUALITY of prefix shingles, so it
        # joins on the 8-byte xxhash64 of the shingle instead of the
        # string (r14, guide §2.3 narrower types): the shuffled rows
        # shrink by the string width and the probe compares longs. A
        # hash collision can only ADD a candidate pair (equal strings
        # always hash equal), and every candidate is verified against
        # the exact shingle arrays below — losslessness is unchanged
        # and re-proven by the quadratic oracle each grade. The PREFIX
        # itself is still chosen under the exact (df, s) string order,
        # which stays a total order on the shingle universe.
        .select("doc_id", "n_sh", F.xxhash64("s").alias("h"))
    )
    # shuffle_hash: at scale neither side of the inverted-index self-join
    # is broadcastable, and both sides being the same subtree means the
    # shuffle is built once and reused (ReusedExchange) — a broadcast
    # plan would compute the prefix twice instead.
    a = prefix.alias("a").hint("shuffle_hash")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter: J >= t is impossible unless t*|larger| <= |smaller|
            & (F.col("a.n_sh") >= JACCARD_THRESHOLD * F.col("b.n_sh"))
            & (F.col("b.n_sh") >= JACCARD_THRESHOLD * F.col("a.n_sh")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # verify against the NARROW set relation (scan+project, no shuffle to
    # rebuild — the rarity order matters only for the prefix, not here).
    # filter_above keeps the threshold out of the join condition: pushed
    # down, the Jaccard predicate re-evaluates array_intersect 2x in the
    # condition plus 1x in the projection (r14; measured numbers in
    # OPTIMIZATION_r14.md; see functions/barrier.py).
    scored = (
        cand.join(
            sets_.select(
                F.col("doc_id").alias("d1"), F.col("arr").alias("arr1"), F.col("n_sh").alias("n1")
            ),
            "d1",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("d2"), F.col("arr").alias("arr2"), F.col("n_sh").alias("n2")
            ),
            "d2",
        )
        .withColumn("n_common", F.size(F.array_intersect("arr1", "arr2")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6
            ),
        )
    )
    return filter_above(scored, F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "d1", "d2", "jaccard"
    )


SQL_DEDUP_NGRAM = f"""
    WITH {SQL_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingle GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        FROM shingle a JOIN shingle b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT d1, d2, ROUND(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
    FROM common
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 6) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# 3. MinHash + LSH (sub-quadratic candidates, exact verify)
# ---------------------------------------------------------------------------

N_PERM = 16
N_BANDS = 4  # 4 rows per band; P(candidate) = 1-(1-j^4)^4 → ~0.96 at j=0.8


# portable universal-hash family over a prime field: base hash is the
# md5-prefix integer (identical in Spark and DuckDB), permutations are
# affine maps (a*h + b) mod P with fixed constants — a*h < P² < 2^62
# stays inside BIGINT on both engines, so the WHOLE MinHash pipeline is
# cross-engine exact and the LSH query gets a real value-hash oracle.
MH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
MH_A = [(1_103_515_245 + 12_345 * p) % MH_P for p in range(N_PERM)]
MH_B = [(12_345 + 1_103 * p) % MH_P for p in range(N_PERM)]


def minhash_signatures(sets_: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """16 min-hash values per doc, computed NARROW: array_min over affine
    permutations of the per-doc hashed-shingle array — no explode, no
    groupBy, no shuffle. Empty docs are dropped (they have no signature).

    The base hash is computed ONCE per shingle behind a projection
    boundary (no CSE across higher-order-function lambdas — the 16
    permutation transforms each reference it), then each permutation is
    two integer ops per element. Portable: the oracle recomputes the
    identical signatures in DuckDB. ``carry`` columns ride along
    untouched (the whole derivation is per-row, so a caller-side
    join-back on doc_id would be a pure waste — r15, guide §2.4)."""
    # NB: the lambda must take exactly one parameter — PySpark binds a
    # second parameter to the array INDEX. transform() evaluates the
    # lambda eagerly, so closing over the loop variable is safe.
    hashed = sets_.filter(F.col("n_sh") > 0).select(
        "doc_id",
        *carry,
        F.transform(
            "arr",
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
            % F.lit(MH_P),
        ).alias("hs"),
    )
    sigs = [
        F.array_min(
            F.transform(
                "hs", (lambda a, b: lambda h: (a * h + b) % F.lit(MH_P))(a, b)
            )
        ).alias(f"sig{p}")
        for p, (a, b) in enumerate(zip(MH_A, MH_B))
    ]
    return hashed.select("doc_id", *carry, *sigs)


def minhash_band_rows(sets_: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_val) — one row per LSH band bucket claim.

    Band key = the band's r signature values joined as a string —
    portable across engines, unlike hashing the tuple. Shared by the
    batch candidate join and the streaming near-dup gate (the bucket
    relation IS the streaming state key)."""
    sigs = minhash_signatures(sets_)
    r = N_PERM // N_BANDS
    bands = F.array(
        *[
            F.concat_ws(",", *[F.col(f"sig{b * r + i}") for i in range(r)])
            for b in range(N_BANDS)
        ]
    )
    return sigs.select("doc_id", F.posexplode(bands).alias("band_idx", "band_val"))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup: banded signature join → candidates → exact
    Jaccard verify at the same 0.8 threshold.

    Output columns match q_dedup_ngram_jaccard so tests can measure LSH
    candidate recall directly against the exact operator. Oracle-checked
    (r2): the portable hash family means DuckDB reproduces the identical
    signatures, bands, candidate set, and verified pairs — the oracle
    simulates the same LSH rather than comparing against the exact
    operator (whose output LSH only approaches at recall < 1).
    """
    sets_ = _staged_shingle_sets(spark, sf_dir)
    banded = minhash_band_rows(sets_)
    # same rationale as the Jaccard prefix self-join: neither side of a
    # banded signature join broadcasts at scale, and shuffle-hash lets the
    # two identical subtrees share one exchange
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # exact verification of candidates only: join each side's shingle-set
    # array (one row per doc, not per shingle) and intersect in-place —
    # two hash joins on the small candidate set instead of re-exploding
    # the full posting lists and re-aggregating.
    verified = (
        cand.join(
            sets_.select(
                F.col("doc_id").alias("d1"),
                F.col("arr").alias("arr1"),
                F.col("n_sh").alias("n1"),
            ),
            "d1",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("d2"),
                F.col("arr").alias("arr2"),
                F.col("n_sh").alias("n2"),
            ),
            "d2",
        )
        .withColumn("n_common", F.size(F.array_intersect("arr1", "arr2")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6
            ),
        )
    )
    # threshold above the projection, not in the join condition — the
    # pushed-down predicate re-evaluates the intersection 2x per
    # candidate (see functions/barrier.py)
    verified = filter_above(verified, F.col("jaccard") >= JACCARD_THRESHOLD)
    return verified.select("d1", "d2", "jaccard")


def _minhash_oracle_sql() -> str:
    """DuckDB twin of the full LSH pipeline: identical base hash, affine
    permutations, band keys, candidate OR-join (quadratic is fine at
    oracle scale), and exact verify."""
    r = N_PERM // N_BANDS
    sig_exprs = ",\n               ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MH_P})) AS sig{p}"
        for p, (a, b) in enumerate(zip(MH_A, MH_B))
    )
    band_exprs = ",\n               ".join(
        "("
        + " || ',' || ".join(
            f"CAST(sig{band * r + i} AS VARCHAR)" for i in range(r)
        )
        + f") AS b{band}"
        for band in range(N_BANDS)
    )
    band_match = " OR ".join(f"a.b{k} = b.b{k}" for k in range(N_BANDS))
    return f"""
    WITH {SQL_SHINGLES_CTE},
    sets AS (
        SELECT doc_id, LIST(s) AS arr, COUNT(*) AS n
        FROM shingle GROUP BY doc_id),
    hashed AS (
        SELECT doc_id, arr, n,
               list_transform(arr,
                   s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {MH_P}) AS hs
        FROM sets WHERE n > 0),
    sigs AS (
        SELECT doc_id, arr, n,
               {sig_exprs}
        FROM hashed),
    banded AS (
        SELECT doc_id, arr, n,
               {band_exprs}
        FROM sigs),
    cand AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               a.arr AS arr1, a.n AS n1, b.arr AS arr2, b.n AS n2
        FROM banded a JOIN banded b
          ON a.doc_id < b.doc_id AND ({band_match}))
    SELECT d1, d2,
           ROUND(LEN(list_intersect(arr1, arr2)) * 1.0
                 / (n1 + n2 - LEN(list_intersect(arr1, arr2))), 6) AS jaccard
    FROM cand
    WHERE LEN(list_intersect(arr1, arr2)) * 1.0
          / (n1 + n2 - LEN(list_intersect(arr1, arr2))) >= {JACCARD_THRESHOLD}
"""


SQL_DEDUP_MINHASH = _minhash_oracle_sql()


def minhash_band_rows_sql() -> str:
    """CTE chain ending in ``brows (doc_id, band_idx, band_val)`` — the
    DuckDB twin of :func:`minhash_band_rows`, shared by the streaming
    near-dup gate's oracle."""
    r = N_PERM // N_BANDS
    sig_exprs = ",\n               ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MH_P})) AS sig{p}"
        for p, (a, b) in enumerate(zip(MH_A, MH_B))
    )
    band_exprs = ",\n               ".join(
        "("
        + " || ',' || ".join(
            f"CAST(sig{band * r + i} AS VARCHAR)" for i in range(r)
        )
        + f") AS b{band}"
        for band in range(N_BANDS)
    )
    union = "\n        UNION ALL ".join(
        f"SELECT doc_id, {k} AS band_idx, b{k} AS band_val FROM banded"
        for k in range(N_BANDS)
    )
    return f"""{SQL_SHINGLES_CTE},
    sets AS (
        SELECT doc_id, LIST(s) AS arr, COUNT(*) AS n
        FROM shingle GROUP BY doc_id),
    hashed AS (
        SELECT doc_id,
               list_transform(arr,
                   s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {MH_P}) AS hs
        FROM sets WHERE n > 0),
    sigs AS (
        SELECT doc_id,
               {sig_exprs}
        FROM hashed),
    banded AS MATERIALIZED (
        SELECT doc_id,
               {band_exprs}
        FROM sigs),
    brows AS MATERIALIZED (
        {union})"""


# ---------------------------------------------------------------------------
# 3b. near-dup clusters (connected components over the pair graph)
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame, src: str = "d1", dst: str = "d2", max_iter: int = 50
) -> DataFrame:
    """Connected components by min-label propagation: every node ends up
    labeled with the smallest doc_id reachable from it.

    Pair generation (Jaccard/LSH/phash) gives near-dup EDGES;
    deduplication needs CLUSTERS (pick one canonical doc per component),
    and transitivity means components can chain beyond direct pairs.
    This is the alternating-join algorithm GraphX/GraphFrames use for
    CC: each round every node takes the min label in its closed
    neighborhood; the driver loop only checks a converged COUNT per
    round (no data through the driver). Rounds ≈ graph diameter —
    Jaccard near-dup components are shallow cliques (1-3 rounds) but a
    loose pair graph (e.g. hamming-14 phash chains) can run tens deep.

    Each round's result is ``localCheckpoint``-ed, not cache()d:
    caching bounds EXECUTION per round but the logical plan still
    doubles every iteration (labels appears in both the propagate join
    and the convergence check), so analysis/optimization time grows
    exponentially with depth — measured 1.2 s → 73 s per round by
    iteration 9 on the phash graph. Checkpointing truncates lineage, so
    every round plans and runs in O(round cost). On a multi-node
    cluster prefer ``checkpoint()`` to a reliable dir (localCheckpoint
    state dies with an executor); for extreme-diameter graphs the
    log-rounds pointer-doubling variant (large-star/small-star) is the
    published scale-out answer.

    Raises if the cap is hit without convergence — truncated labels are
    WRONG answers, never returned silently.
    """
    # Materialize the edge relation ONCE before fanning out: the pair
    # generation upstream (a full set-similarity join) is expensive, and
    # both union branches plus every loop round would otherwise re-derive
    # it (measured 8.6 s → 4.1 s at sf0.1 for the Jaccard pair graph).
    edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).cache()
    edges.count()
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # closed neighborhood: each node is its own neighbor
    nodes = sym.select(F.col("a")).distinct()
    sym = sym.union(nodes.select("a", F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    labels = nodes.select("a", F.col("a").alias("label"))
    converged = False
    for _ in range(max_iter):
        new_labels = (
            sym.join(labels.withColumnRenamed("a", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "a")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        # free the PRIOR round's checkpointed blocks (no-op on the round-0
        # plain projection) — block-manager memory stays O(1) rounds, not
        # O(rounds), in long-lived sessions
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds"
            " — graph diameter exceeds the cap; raise max_iter or switch to"
            " pointer-doubling"
        )
    return labels.select(F.col("a").alias("doc_id"), F.col("label").alias("cluster_id"))


def connected_components_ls(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
    canonical: bool = False,
    rounds_per_probe: int = 2,
) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): converges in O(log n) rounds regardless of graph
    DIAMETER, where min-label propagation (:func:`connected_components`)
    needs diameter-many rounds — a 10^6-node path graph finishes in ~20
    rounds here vs 10^6 there. This is the production path for loose
    pair graphs (phash hamming chains run tens of hops deep already at
    sf0.1); propagate stays registered as its cross-check oracle.

    Each round: large-star hangs every neighbor v > u onto u's minimum
    neighborhood label; small-star then flattens the ≤-neighborhood the
    same way. The edge relation stays canonical (child > parent), is
    ``localCheckpoint``-ed per round (lineage truncation — same measured
    blowup as propagate without it), and the prior round's blocks are
    freed. Convergence = edge-set fixpoint, checked with an exact
    left-anti diff (never a hash signature: a spurious match would
    silently return WRONG labels); at the fixpoint the forest is a star
    per component, so the parent column IS the component min. Raises on
    round-cap exhaustion — truncated labels are never returned.
    """
    # ONE materialization of the canonical edge set (r14): nodes and the
    # parent relation both used to checkpoint independently, which ran
    # the upstream pair GENERATION twice — for the phash cluster query
    # that upstream is the whole banded-LSH candidate/verify pipeline.
    # Checkpoint e once; nodes and b are narrow projections of its
    # blocks (nodes is only consumed by the closing label join, so it
    # stays lazy). ``canonical=True`` is the caller's contract that the
    # input already satisfies src < dst with distinct rows (true for
    # every registered producer: the co-occurrence edge staging, the
    # phash pair relation, the verified n-gram pairs) — the
    # least/greatest normalization and its full dedup exchange are then
    # skipped (r14; the checkpoint stays, the loop reads e many times).
    e = edges.select(F.col(src).alias("lo"), F.col(dst).alias("hi"))
    if not canonical:
        e = (
            e.select(
                F.least("lo", "hi").alias("lo"),
                F.greatest("lo", "hi").alias("hi"),
            )
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("lo").alias("n"))
        .union(e.select(F.col("hi").alias("n")))
        .distinct()
    )
    # parent relation, canonical direction: u (child) -> v (parent), v < u
    b = e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    converged = False
    pending: list[DataFrame] = []
    rounds = 0
    while True:
        # Convergence = the parent relation is a FUNCTIONAL star forest:
        # (a) no parent is itself a child AND (b) every child has exactly
        # one parent. Both conditions are required (r15 fix, ADVICE r14):
        # {(3,1),(3,2)} has no parent-as-child yet is NOT a fixpoint —
        # the labels join would emit node 3 twice with conflicting
        # cluster ids, splitting one component in two. A functional star
        # forest IS the exact one-round fixpoint: it passes through
        # large-star and small-star unchanged (each child's neighborhood
        # is its unique parent, each root's min is itself), while any
        # 2-chain w -> u -> v is rewired by large-star (w re-attaches to
        # min(N(u) ∪ {u}) ≤ v < u) and any multi-parent child u is
        # collapsed onto a single min-parent by small-star's m_sm
        # aggregate — so a state violating either condition always
        # changes, and the probe never fires early. Testing the CURRENT
        # relation before the round (instead of diffing the round's
        # output against its input after) skips the final confirmation
        # round's entire computation; the probe is still an exact
        # structural test, never a hash signature. With the lazy
        # per-round checkpoint this probe is also the job that
        # materializes every not-yet-probed round — one scheduled job
        # per PROBE where the old loop ran three per round (eager
        # checkpoint, count, anti-diff). Both legs run under one
        # CollectLimit job.
        #
        # ``rounds_per_probe`` (r15, session 2): probe every K rounds,
        # not every round — Kiveris-style batched convergence checking.
        # Running large-star/small-star on an already-converged
        # functional star forest returns it UNCHANGED (the fixpoint
        # argument above), so batching can never corrupt the labels;
        # the only cost is up to K−1 no-op rounds when convergence
        # lands inside a block. The probe's own cost is about half a
        # round (a groupBy min/max plus a semi-join over the parent
        # relation), so K=2 saves ~rounds/2 probe executions for at
        # most one cheap no-op round — positive at bench scale (the
        # loop is sequential-job-launch-bound: measured 0.4-0.8 s per
        # probe on sf0.1's 1.2k-edge phash graph, 5 probes for 4
        # rounds) and at cluster scale (probe work saved grows with
        # the edge relation exactly like the wasted round does).
        star_viol = (
            b.alias("c")
            .join(b.alias("p"), F.col("c.v") == F.col("p.u"), "left_semi")
            .select(F.lit(1).alias("viol"))
        )
        multi_parent_viol = (
            b.groupBy("u")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
            .filter(F.col("mn") != F.col("mx"))
            .select(F.lit(1).alias("viol"))
        )
        if star_viol.union(multi_parent_viol).limit(1).count() == 0:
            converged = True
            break
        if rounds >= max_iter:
            break
        # the probe job above materialized every round in b's lineage —
        # the older rounds' checkpointed blocks are now droppable
        for old in pending:
            old.unpersist()
        pending = []
        for _ in range(max(1, min(rounds_per_probe, max_iter - rounds))):
            # large-star: over the SYMMETRIC relation, every neighbor
            # v > u re-attaches to min(N(u) ∪ {u}); output is already
            # canonical because the new parent m ≤ u < v. No dedup
            # here: duplicate (u, m) rows cannot change the next
            # min-aggregate and small's closing distinct removes them —
            # dropping the intermediate .distinct() removes one full
            # exchange per round (r14; duplicates bounded by |sym|).
            sym = b.union(b.select(F.col("v").alias("u"), F.col("u").alias("v")))
            m_lg = sym.groupBy("u").agg(F.min("v").alias("mn"))
            m_lg = m_lg.select("u", F.least("mn", F.col("u")).alias("m"))
            large = (
                sym.join(m_lg, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            # small-star: parents and children of each u collapse onto
            # the minimum parent; roots emit their own (u, m) link
            m_sm = large.groupBy("u").agg(F.min("v").alias("m"))
            small = (
                large.join(m_sm, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(m_sm.select(F.col("u"), F.col("m").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct()
                # lazy: the next probe (or the closing label join) is
                # the materializing action for the whole round block
                .localCheckpoint(eager=False)
            )
            pending.append(b)
            b = small
            rounds += 1
    if not converged:
        raise RuntimeError(
            f"connected_components_ls did not converge within {max_iter}"
            " rounds — pathological for a log-rounds algorithm; check the"
            " edge relation for non-determinism"
        )
    labels = nodes.join(
        b.withColumnRenamed("u", "n"), "n", "left"
    ).select(
        F.col("n").alias("doc_id"),
        F.coalesce(F.col("v"), F.col("n")).alias("cluster_id"),
    )
    b.unpersist()
    return labels


# ---------------------------------------------------------------------------
# session-cached verified pair / cluster relations (VERDICT r11 item 3)
# ---------------------------------------------------------------------------
#
# Five+ registered queries (llm_dedup_keep_best, dedup_cascade_eval,
# corpus_split_leakage, dedup_source_overlap, dedup_transitivity_eval,
# dedup_minhash_eval) CONSUME the verified near-dup pair relation; each
# used to recompute the whole candidate/verify pipeline per call. The
# pair set is deterministic pure dataflow (portable hashes, exact
# verify), so a cached relation is bit-identical to a recomputed one —
# the `_trained` pattern the ANN models and the quality classifier
# already run (the DuckDB oracles recompute per statement and still
# hash-match, which PROVES exactness-neutrality every run). The
# producing queries themselves (dedup_minhash_lsh, dedup_ngram_jaccard)
# stay uncached: bench times the operator, consumers reuse its output —
# exactly a production pipeline's staged pair table, keyed on the
# documents fingerprint + the LSH/Jaccard hyperparameters.


def verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached verified MinHash-LSH pair relation (d1, d2,
    jaccard) — see the block comment above for why reuse is exact."""
    from .similarity import _trained

    return _trained(
        spark,
        (sf_dir, "lsh_verified_pairs", N_PERM, N_BANDS, JACCARD_THRESHOLD),
        lambda: q_dedup_minhash_lsh(spark, sf_dir).localCheckpoint(eager=True),
        table="documents.parquet",
    )


def verified_pairs_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached exact n-gram Jaccard pair relation (d1, d2,
    jaccard) — the prefix-filtered inverted-index operator's output."""
    from .similarity import _trained

    return _trained(
        spark,
        (sf_dir, "ngram_verified_pairs", JACCARD_THRESHOLD),
        lambda: q_dedup_ngram_jaccard(spark, sf_dir).localCheckpoint(
            eager=True
        ),
        table="documents.parquet",
    )


def cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached near-dup component labels (doc_id, cluster_id):
    large-star/small-star connected components over the exact-Jaccard
    pair graph. Cached one level ABOVE the pair relation because the CC
    loop itself is ~10 sequential tiny jobs a consumer like
    llm_dedup_keep_best would otherwise replay per call."""
    from .similarity import _trained

    return _trained(
        spark,
        (sf_dir, "ngram_cluster_labels", JACCARD_THRESHOLD),
        # the verified pair relation is canonical by construction
        # (d1 < d2 from the candidate join, one row per pair)
        lambda: connected_components_ls(
            verified_pairs_ngram(spark, sf_dir).select("d1", "d2"),
            canonical=True,
        ).localCheckpoint(eager=True),
        table="documents.parquet",
    )


def exact_dup_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached exact-fingerprint dedup relation (doc_id,
    fingerprint, canonical_id, is_dup, group_size) — the
    :func:`q_dedup_exact` output. Cached for the cascade and snapshot
    consumers (VERDICT r12 item 2); the producing registered query stays
    uncached so bench still times the operator itself. Deterministic
    pure dataflow (md5 of the sorted token set), so the cached relation
    is bit-identical to a recomputed one — the DuckDB oracles recompute
    per statement, proving exactness-neutrality on every grade."""
    from .similarity import _trained

    return _trained(
        spark,
        (sf_dir, "exact_dup_table"),
        lambda: q_dedup_exact(spark, sf_dir).localCheckpoint(eager=True),
        table="documents.parquet",
    )


def simhash_near_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached SimHash near-neighbor relation (doc_id, simhash,
    n_near) — the :func:`q_dedup_simhash` output (4×8-bit pigeonhole
    bands, Hamming ≤ 1 verify). Same cache rationale as
    :func:`exact_dup_table`; keyed on the signature hyperparameters so a
    monkeypatched band-width study never reuses stale signatures."""
    from .similarity import _trained

    return _trained(
        spark,
        (sf_dir, "simhash_near_table", SIMHASH_BITS, HAMMING_MAX),
        lambda: q_dedup_simhash(spark, sf_dir).localCheckpoint(eager=True),
        table="documents.parquet",
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster membership: connected components over the exact
    Jaccard pair graph, cluster id = min doc_id in the component. The
    oracle computes the same fixpoint with a recursive CTE (reachability
    + MIN), proving the iterative Spark loop converged to the true
    components. Serves the session-cached label relation (the oracle
    recomputes per statement, so the cache is proven exactness-neutral
    on every grade)."""
    return cluster_labels(spark, sf_dir)


SQL_DEDUP_CLUSTERS = f"""
    WITH RECURSIVE pairs AS ({SQL_DEDUP_NGRAM}),
    edges AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION
        SELECT d2, d1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
"""


# ---------------------------------------------------------------------------
# 4. SimHash near-dup neighborhood
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
HAMMING_MAX = 1


def _simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash: per-bit majority vote over md5-derived token hashes.

    Computed as 32 parallel SUM expressions over exploded distinct tokens —
    vectorized, single shuffle, no per-bit row explosion. md5 (not xxhash)
    so the oracle can reproduce the identical signature in SQL.
    """
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    )
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
    tok = tok.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_sums)
    sig = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(0),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return sums.select("doc_id", sig.alias("simhash"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc SimHash + count of near-neighbors within Hamming ≤ 1.

    Scalable plan: 4 × 8-bit pigeonhole bands — any pair with hd ≤ 1 agrees
    on at least 3 bands, so the banded join finds exactly the brute-force
    pair set (the oracle computes that quadratic spec directly). Candidate
    pairs are deduped before the bit_count verify.
    """
    docs = load(spark, sf_dir, "documents")
    sig = _simhash(docs)
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * k).bitwiseAND(F.lit(255)).cast("long")
            for k in range(4)
        ]
    )
    banded = sig.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band_idx", "band_val")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.simhash").alias("sh1"),
            F.col("b.doc_id").alias("nbr"),
            F.col("b.simhash").alias("sh2"),
        )
        .distinct()
        .filter(F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))) <= HAMMING_MAX)
    )
    near = pairs.groupBy("doc_id").agg(F.count("*").alias("n_near"))
    return (
        sig.join(near, "doc_id", "left")
        .select(
            "doc_id",
            "simhash",
            F.coalesce(F.col("n_near"), F.lit(0)).alias("n_near"),
        )
    )


def q_dedup_transitivity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the near-dup relation: of all wedges a–b–c
    in the verified LSH pair graph, what fraction close into a triangle
    (a–c also a pair)? High transitivity says near-dup groups are tight
    cliques and cluster-then-keep-best is safe; low transitivity warns
    that connected components CHAIN dissimilar documents together (the
    classic over-merging failure of transitive-closure dedup).

    One wedge self-join of the (small) verified pair relation plus a
    left join back for closure — everything is pair-set-sized, the
    corpus-scale cost stays in the LSH layer itself. Single-row report
    with exact integer counts and one rounded ratio.
    """
    pairs = verified_pairs(spark, sf_dir).select("d1", "d2")
    sym = pairs.unionByName(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    )
    wedges = (
        sym.alias("l")
        .join(
            sym.alias("r"),
            (F.col("l.d1") == F.col("r.d1")) & (F.col("l.d2") < F.col("r.d2")),
        )
        .select(
            F.col("l.d2").alias("a"),
            F.col("l.d1").alias("center"),
            F.col("r.d2").alias("c"),
        )
    )
    closed = wedges.join(
        pairs.select(
            F.col("d1").alias("a"), F.col("d2").alias("c"), F.lit(1).alias("hit")
        ),
        ["a", "c"],
        "left",
    )
    return closed.agg(
        F.lit(pairs.count()).cast("bigint").alias("n_pairs"),
        F.count("*").alias("n_wedges"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_closed"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.when(F.count("*") > 0, F.count("*")).cast("double"),
            6,
        ).alias("transitivity"),
    )


def _transitivity_eval_sql() -> str:
    return f"""
    WITH pairs AS MATERIALIZED (SELECT d1, d2 FROM ({SQL_DEDUP_MINHASH})),
    sym AS (
        SELECT d1, d2 FROM pairs
        UNION ALL SELECT d2 AS d1, d1 AS d2 FROM pairs),
    wedges AS (
        SELECT l.d2 AS a, l.d1 AS center, r.d2 AS c
        FROM sym l JOIN sym r ON l.d1 = r.d1 AND l.d2 < r.d2),
    closed AS (
        SELECT w.a, w.c,
               CASE WHEN p.d1 IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM wedges w LEFT JOIN pairs p ON w.a = p.d1 AND w.c = p.d2)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_wedges,
           CAST(SUM(hit) AS BIGINT) AS n_closed,
           ROUND(CAST(SUM(hit) AS DOUBLE)
                 / CAST(CASE WHEN COUNT(*) > 0 THEN COUNT(*) END AS DOUBLE), 6)
               AS transitivity
    FROM closed
"""


SQL_DEDUP_SIMHASH = f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, t
        FROM documents, UNNEST({SQL_TOKENS.format(col='text')}) x(t)),
    bits AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (('0x' || substr(md5(t), 1, 8))::BIGINT >> j) & 1 = 1
                        THEN 1 ELSE -1 END) AS s
        FROM tok, UNNEST(RANGE(0, {SIMHASH_BITS})) r(j)
        GROUP BY 1, 2),
    sig AS (
        -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas renders as
        -- float64 — cast back so the type matches Spark's long
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM bits GROUP BY doc_id),
    near AS (
        SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_near
        FROM sig a JOIN sig b
          ON a.doc_id <> b.doc_id
         AND bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
        GROUP BY 1)
    SELECT sig.doc_id, simhash, COALESCE(n_near, 0) AS n_near
    FROM sig LEFT JOIN near ON sig.doc_id = near.doc_id
"""


def q_dedup_cascade_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-yield report for the stacked dedup cascade: per layer
    (1 = exact fingerprint, 2 = MinHash-LSH Jaccard ≥ 0.8, 3 = SimHash
    Hamming ≤ 1), how many documents the layer flags at all and how
    many it flags that NO EARLIER layer caught — the number that says
    whether running the next-more-expensive layer still pays. Layers
    that flag nothing report explicit zero rows.

    Pure composition of the three registered operators (each already
    scale-safe and oracle-checked); the cascade close is a union of
    flagged-id sets, a per-doc MIN(layer), and two bounded counts. At
    100 TB the cascade cost IS the layers themselves — this report adds
    one id-sized rollup. All three layers ride the session-cached
    verified relations (:func:`exact_dup_table`, :func:`verified_pairs`,
    :func:`simhash_near_table`); the producing registered queries stay
    uncached, and the DuckDB oracle recomputes all three layers per
    statement, re-proving cache exactness on every grade.
    """
    l1 = (
        exact_dup_table(spark, sf_dir)
        .filter(F.col("group_size") > 1)
        .select("doc_id")
    )
    lsh = verified_pairs(spark, sf_dir)
    l2 = (
        lsh.select(F.col("d1").alias("doc_id"))
        .union(lsh.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    l3 = (
        simhash_near_table(spark, sf_dir)
        .filter(F.col("n_near") > 0)
        .select("doc_id")
    )
    tagged = (
        l1.select(F.lit(1).alias("layer"), "doc_id")
        .union(l2.select(F.lit(2).alias("layer"), "doc_id"))
        .union(l3.select(F.lit(3).alias("layer"), "doc_id"))
    )
    flagged = tagged.groupBy("layer").agg(F.count("*").alias("n_flagged"))
    news = (
        tagged.groupBy("doc_id")
        .agg(F.min("layer").alias("layer"))
        .groupBy("layer")
        .agg(F.count("*").alias("n_new"))
    )
    layers = spark.createDataFrame([(1,), (2,), (3,)], "layer int")
    return (
        layers.join(flagged, "layer", "left")
        .join(news, "layer", "left")
        .select(
            "layer",
            F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )


def _cascade_eval_sql() -> str:
    return f"""
    WITH l1 AS (
        SELECT doc_id FROM ({SQL_DEDUP_EXACT}) WHERE group_size > 1),
    lsh AS ({SQL_DEDUP_MINHASH}),
    l2 AS (
        SELECT DISTINCT doc_id FROM (
            SELECT d1 AS doc_id FROM lsh
            UNION ALL SELECT d2 AS doc_id FROM lsh)),
    l3 AS (
        SELECT doc_id FROM ({SQL_DEDUP_SIMHASH}) WHERE n_near > 0),
    tagged AS (
        SELECT 1 AS layer, doc_id FROM l1
        UNION ALL SELECT 2, doc_id FROM l2
        UNION ALL SELECT 3, doc_id FROM l3),
    flagged AS (
        SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_flagged
        FROM tagged GROUP BY layer),
    news AS (
        SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
            SELECT doc_id, MIN(layer) AS layer FROM tagged GROUP BY doc_id)
        GROUP BY layer),
    layers AS (SELECT UNNEST([1, 2, 3]) AS layer)
    SELECT layers.layer,
           COALESCE(n_flagged, 0) AS n_flagged,
           COALESCE(n_new, 0) AS n_new
    FROM layers
    LEFT JOIN flagged USING (layer)
    LEFT JOIN news USING (layer)
"""


# ---------------------------------------------------------------------------
# 5. embedding cosine near-dup pairs
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.45


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs over the embedding column.

    SPEC/ORACLE-ONLY OPERATOR — deliberately quadratic. The ``vec_id <
    vec_id`` join is a BroadcastNestedLoopJoin over all vector pairs: the
    right correctness spec to differential-test against, and fine at
    oracle scale (sf0.01), but NOT a plan to run on a large corpus. The
    production path at scale is the bucketed ANN pair in
    operators/similarity.py (``similarity_ann_lsh`` — hyperplane-banded
    candidates — and ``similarity_ann_ivf`` — cell-probed quantizer),
    whose recall is tested against this exact spec. Norms are precomputed
    once per vector; the double-precision fold matches DuckDB's
    list_dot_product bit-for-bit.
    """
    em = load(spark, sf_dir, "embeddings")
    d = to_double(F.col("embedding"))
    # norm_sq > 0: zero vectors are unscorable (ANSI DIVIDE_BY_ZERO
    # otherwise) — same exclusion as similarity._with_norms, mirrored
    # in the oracle
    base = em.select("vec_id", F.col("embedding"), dot(d, d).alias("norm_sq")).filter(
        F.col("norm_sq") > 0
    )
    a = base.alias("a")
    b = base.alias("b")
    da = to_double(F.col("a.embedding"))
    db = to_double(F.col("b.embedding"))
    cos = cosine_from_parts(dot(da, db), F.col("a.norm_sq"), F.col("b.norm_sq"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COSINE_DUP_THRESHOLD)
    )


SQL_DEDUP_EMBEDDING = f"""
    WITH base AS (
        SELECT vec_id, embedding,
               list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS norm_sq
        FROM embeddings
        WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])) > 0)
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
                 / (SQRT(a.norm_sq) * SQRT(b.norm_sq)), 6) AS cos_sim
    FROM base a JOIN base b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[]))
                / (SQRT(a.norm_sq) * SQRT(b.norm_sq)), 6) >= {COSINE_DUP_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# 5b. embedding near-dup pairs, bucketed (the scale path for #5)
# ---------------------------------------------------------------------------

# Wider-recall plane family than the ANN search tables: FEWER bits per
# table (coarser buckets → higher per-table collision probability) and
# MORE tables. At the 0.45 cosine threshold (angle ≈ 63°) a single bit
# agrees with p = 1 - θ/π ≈ 0.65, so a 4-bit band matches with ~0.18 and
# 16 tables give ~1-(1-0.18)^16 ≈ 0.96 expected candidate recall — the
# classic bits/tables trade: recall is bought with tables (union of
# buckets), precision with bits (bucket size), and the exact verify step
# makes precision a pure cost knob, never a correctness one.
EMB_LSH_TABLES = 16
EMB_LSH_BITS = 4


def _emb_dedup_planes() -> list[list[float]]:
    from .similarity import _hyperplanes

    return _hyperplanes(seed=7, tables=EMB_LSH_TABLES, bits=EMB_LSH_BITS)


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed embedding near-dup pairs — the 100 TB path for #5.

    Candidates = vector pairs sharing a hyperplane-LSH bucket in ANY of
    16 tables (sub-quadratic: the banded self-join touches only same-
    bucket pairs, never the full pair space), then exact cosine verify at
    the same 0.45 threshold as the quadratic spec operator. Output shape
    matches q_dedup_embedding_cosine so tests measure pair recall
    directly against the exact spec. Oracle-checked: the planes are fixed
    literals and DuckDB's list_dot_product matches Spark's fold
    bit-for-bit, so buckets — hence candidates, hence verified pairs —
    are engine-identical.
    """
    from .similarity import lsh_signatures

    em = load(spark, sf_dir, "embeddings")
    d = to_double(F.col("embedding"))
    base = (
        spread(em, "vec_id")
        .select("vec_id", "embedding", dot(d, d).alias("norm_sq"))
        .filter(F.col("norm_sq") > 0)  # zero vectors unscorable; see 5a
    )
    sigs = lsh_signatures(
        spread(em, "vec_id"),
        planes=_emb_dedup_planes(),
        tables=EMB_LSH_TABLES,
        bits=EMB_LSH_BITS,
    )
    # same shuffle-hash/self-join rationale as the MinHash banded join:
    # neither side broadcasts at scale, identical subtrees share one
    # exchange
    a = sigs.select("vec_id", "table_id", "bucket").alias("a").hint("shuffle_hash")
    b = sigs.select("vec_id", "table_id", "bucket").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"))
        .distinct()
    )
    cos = cosine_from_parts(
        dot(to_double(F.col("e1")), to_double(F.col("e2"))),
        F.col("n1"),
        F.col("n2"),
    )
    return (
        cand.join(
            base.select(
                F.col("vec_id").alias("v1"),
                F.col("embedding").alias("e1"),
                F.col("norm_sq").alias("n1"),
            ),
            "v1",
        )
        .join(
            base.select(
                F.col("vec_id").alias("v2"),
                F.col("embedding").alias("e2"),
                F.col("norm_sq").alias("n2"),
            ),
            "v2",
        )
        .select("v1", "v2", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= COSINE_DUP_THRESHOLD)
    )


def _emb_lsh_oracle_sql() -> str:
    from .similarity import lsh_sigs_sql_cte

    cte = lsh_sigs_sql_cte(_emb_dedup_planes(), EMB_LSH_TABLES, EMB_LSH_BITS)
    return f"""
    WITH {cte},
    cand AS (
        SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
        FROM sigs a JOIN sigs b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id),
    norms AS (SELECT vec_id, e, list_dot_product(e, e) AS norm_sq FROM emb)
    SELECT v1, v2,
           ROUND(list_dot_product(x.e, y.e)
                 / (SQRT(x.norm_sq) * SQRT(y.norm_sq)), 6) AS cos_sim
    FROM cand
    JOIN norms x ON v1 = x.vec_id
    JOIN norms y ON v2 = y.vec_id
    WHERE ROUND(list_dot_product(x.e, y.e)
                / (SQRT(x.norm_sq) * SQRT(y.norm_sq)), 6)
          >= {COSINE_DUP_THRESHOLD}
"""


SQL_DEDUP_EMBEDDING_LSH = _emb_lsh_oracle_sql()


def q_dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline quality report: the MinHash-LSH pair set measured
    against the exact Jaccard operator — pair counts, true positives,
    misses, precision and recall, as ONE row. This is the recurring
    measurement a curation pipeline reruns when the corpus or the LSH
    knobs (bands, permutations) change; the pytest recall checks pin the
    floor once, this query makes the number observable in production.

    Both inputs are the registered operators (exact pairs: prefix-filter
    join; LSH pairs: banded signatures + exact verify). The comparison
    is a full-outer join on the pair key + one aggregation over pair
    rows — negligible next to either input. Precision is 1.0 by
    construction (LSH verifies candidates exactly at the same
    threshold); the query PROVES that rather than assuming it.
    """
    exact = verified_pairs_ngram(spark, sf_dir).select(
        "d1", "d2", F.lit(1).alias("in_exact")
    )
    lsh = verified_pairs(spark, sf_dir).select(
        "d1", "d2", F.lit(1).alias("in_lsh")
    )
    j = exact.join(lsh, ["d1", "d2"], "full")
    return j.agg(
        F.sum(F.coalesce(F.col("in_exact"), F.lit(0))).alias("n_exact"),
        F.sum(F.coalesce(F.col("in_lsh"), F.lit(0))).alias("n_lsh"),
        F.sum(
            F.when(
                F.col("in_exact").isNotNull() & F.col("in_lsh").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_both"),
    ).select(
        "n_exact",
        "n_lsh",
        "n_both",
        F.round(F.col("n_both") / F.col("n_exact"), 6).alias("recall"),
        F.round(F.col("n_both") / F.col("n_lsh"), 6).alias("precision"),
    )


def _minhash_eval_sql() -> str:
    return f"""
    WITH ex AS (SELECT d1, d2, 1 AS in_exact FROM ({SQL_DEDUP_NGRAM})),
    ls AS (SELECT d1, d2, 1 AS in_lsh FROM ({SQL_DEDUP_MINHASH})),
    j AS (SELECT COALESCE(ex.in_exact, 0) AS in_exact,
                 COALESCE(ls.in_lsh, 0) AS in_lsh
          FROM ex FULL JOIN ls USING (d1, d2)),
    agg AS (
        SELECT CAST(SUM(in_exact) AS BIGINT) AS n_exact,
               CAST(SUM(in_lsh) AS BIGINT) AS n_lsh,
               CAST(SUM(CASE WHEN in_exact = 1 AND in_lsh = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_both
        FROM j)
    SELECT n_exact, n_lsh, n_both,
           ROUND(n_both * 1.0 / n_exact, 6) AS recall,
           ROUND(n_both * 1.0 / n_lsh, 6) AS precision
    FROM agg
"""


SQL_DEDUP_MINHASH_EVAL = _minhash_eval_sql()


# ---------------------------------------------------------------------------
# 8. asymmetric containment (doc-in-doc / quote / boilerplate inclusion)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.9


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-in-doc containment pairs: the smaller document's shingle set is
    ≥ 90% covered by the larger's (C = |A∩B| / |A|, A the smaller set;
    ties canonicalize to the lower doc_id as inner). This is the
    asymmetric complement of :func:`q_dedup_ngram_jaccard`: a short doc
    quoted or embedded inside a much longer one has high containment but
    arbitrarily LOW Jaccard, so a symmetric threshold never finds it —
    the quote/boilerplate-inclusion detector of a curation pipeline.

    Candidates use the one-sided prefix filter: C(A→B) ≥ t forces an
    overlap of ⌈t·|A|⌉, so A must share one of its first
    ``|A| − ⌈t·|A|⌉ + 1`` shingles (under the fixed rare-first order)
    with B's FULL set — containment grants no size bound on B, hence no
    prefix on the outer side. The join therefore probes full posting
    lists, but only through the INNER prefixes' shingles — and rare-first
    ordering keeps hot shingles out of those prefixes, so the touched
    postings stay short (same skew defense as the Jaccard prefix filter,
    applied one-sided). Exact verify against the narrow set relation;
    pruning is proven lossless against the quadratic oracle at sf0.01.
    """
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
        # join on the 8-byte shingle hash, not the string (r14): a
        # collision only ADDS a candidate, the exact verify below
        # removes it — see q_dedup_ngram_jaccard's prefix for the full
        # argument; here the win is larger because the probe side is
        # the FULL posting relation
        .select("doc_id", "n_sh", F.xxhash64("s").alias("h"))
    )
    # inner prefix is the small side → build it in a shuffled hash join
    # against the full posting relation (neither is broadcastable at scale)
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
    # threshold above the projection — pushed into the join condition it
    # re-evaluates the intersection per candidate (functions/barrier.py)
    return filter_above(
        scored, F.col("containment") >= CONTAINMENT_THRESHOLD
    ).select(
        "inner_id",
        "outer_id",
        F.col("n_inner").cast("long").alias("n_inner"),
        F.col("n_outer").cast("long").alias("n_outer"),
        "containment",
    )


SQL_DEDUP_CONTAINMENT = f"""
    WITH {SQL_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingle GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        FROM shingle a JOIN shingle b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    oriented AS (
        -- inner = the smaller shingle set; size tie → lower doc_id
        SELECT CASE WHEN s2.n < s1.n THEN d2 ELSE d1 END AS inner_id,
               CASE WHEN s2.n < s1.n THEN d1 ELSE d2 END AS outer_id,
               CASE WHEN s2.n < s1.n THEN s2.n ELSE s1.n END AS n_inner,
               CASE WHEN s2.n < s1.n THEN s1.n ELSE s2.n END AS n_outer,
               c
        FROM common
        JOIN sizes s1 ON s1.doc_id = d1
        JOIN sizes s2 ON s2.doc_id = d2)
    SELECT inner_id, outer_id, n_inner, n_outer,
           ROUND(c * 1.0 / n_inner, 6) AS containment
    FROM oriented
    WHERE ROUND(c * 1.0 / n_inner, 6) >= {CONTAINMENT_THRESHOLD}
"""


INCR_NEW_FRAC = 0.2  # deterministic snapshot split: ~20% "incoming" docs


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: match an INCOMING snapshot against the
    EXISTING corpus — the op every recurring crawl/refresh pipeline runs
    (dedup the delta against the base, never re-pair the whole corpus).

    The corpus splits deterministically (portable salted hash on doc_id)
    into base (~80%) and new (~20%). Two asymmetric layers:
    exact — canonical shingle-set fingerprint equi-join (new ⨝ base on
    md5 of the sorted set); near — the same banded MinHash machinery as
    ``dedup_minhash_lsh`` but joining NEW bands against BASE bands only
    (candidate volume scales with |delta| · collision-rate, not
    |corpus|²), then exact-Jaccard verify at the 0.8 threshold. Each new
    doc reports its best match: exact beats near, then highest Jaccard,
    then smallest base id — one deterministic max_by(struct). At 100 TB
    the base side's fingerprints/signatures are a maintained index
    (written once at ingest, ~100 bytes/doc), so each refresh pays only
    the delta's signatures plus one co-partitioned join per layer; docs
    with no 3-gram shingle (< 3 tokens) carry no signature and are
    excluded by contract, same as every near-dup operator here.
    """
    from .llmdata import _HASH_SPACE, _portable_hash

    # is_new is a pure per-row expression on doc_id — computed IN PLACE on
    # the staged relation instead of the old derive-then-join-back-on-
    # doc_id shape, which re-scanned the staged parquet and paid a
    # broadcast join per consumer (r15, guide §2.4 remove shuffles
    # outright; two joins + two scans dropped, rows identical)
    sets_ = (
        _staged_shingle_sets(spark, sf_dir)
        .filter(F.col("n_sh") > 0)
        .withColumn(
            "is_new",
            _portable_hash(F.concat(F.lit("incr:"), F.col("doc_id")))
            < int(INCR_NEW_FRAC * _HASH_SPACE),
        )
    )
    fp = sets_.select(
        "doc_id",
        "is_new",
        F.md5(F.concat_ws(" ", F.col("arr"))).alias("fp"),
    )
    exact = (
        fp.filter("is_new")
        .select("doc_id", "fp")
        .join(
            fp.filter(~F.col("is_new")).select(F.col("doc_id").alias("base_id"), "fp"),
            "fp",
        )
        .groupBy("doc_id")
        .agg(F.min("base_id").alias("match_id"))
        .select(
            "doc_id",
            "match_id",
            F.lit(1).alias("prio"),
            F.lit(1.0).alias("jaccard"),
        )
    )

    sigs = minhash_signatures(sets_, carry=("is_new",))
    r = N_PERM // N_BANDS
    bands = F.array(
        *[
            F.concat_ws(",", *[F.col(f"sig{b * r + i}") for i in range(r)])
            for b in range(N_BANDS)
        ]
    )
    banded = sigs.select(
        "doc_id", "is_new", F.posexplode(bands).alias("band_idx", "band_val")
    )
    new_b = banded.filter("is_new").alias("a").hint("shuffle_hash")
    base_b = banded.filter(~F.col("is_new")).alias("b")
    cand = (
        new_b.join(
            base_b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("base_id"))
        .distinct()
    )
    near = (
        cand.join(
            sets_.select(
                F.col("doc_id"), F.col("arr").alias("arr1"), F.col("n_sh").alias("n1")
            ),
            "doc_id",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("base_id"),
                F.col("arr").alias("arr2"),
                F.col("n_sh").alias("n2"),
            ),
            "base_id",
        )
        .withColumn("n_common", F.size(F.array_intersect("arr1", "arr2")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6
            ),
        )
    )
    # threshold above the projection, not in the join condition
    # (functions/barrier.py — the near layer's verify is the same shape
    # as dedup_minhash_lsh's)
    near = filter_above(near, F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_id",
        F.col("base_id").alias("match_id"),
        F.lit(0).alias("prio"),
        "jaccard",
    )
    best = (
        exact.unionByName(near)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.col("prio"), F.col("jaccard"), (-F.col("match_id")).alias("nm")
                )
            ).alias("k")
        )
        .select(
            "doc_id",
            (-F.col("k.nm")).cast("long").alias("match_id"),
            F.when(F.col("k.prio") == 1, "exact").otherwise("near").alias("method"),
            F.col("k.jaccard").alias("jaccard"),
        )
    )
    return best


def _incremental_oracle_sql() -> str:
    """DuckDB twin: identical split hash, fingerprints, signatures, bands,
    asymmetric candidate join, verify, and best-match fold."""
    r = N_PERM // N_BANDS
    sig_exprs = ",\n               ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MH_P})) AS sig{p}"
        for p, (a, b) in enumerate(zip(MH_A, MH_B))
    )
    band_exprs = ",\n               ".join(
        "("
        + " || ',' || ".join(
            f"CAST(sig{band * r + i} AS VARCHAR)" for i in range(r)
        )
        + f") AS b{band}"
        for band in range(N_BANDS)
    )
    band_match = " OR ".join(f"a.b{k} = b.b{k}" for k in range(N_BANDS))
    new_cut = int(INCR_NEW_FRAC * (1 << 60))
    return f"""
    WITH {SQL_SHINGLES_CTE},
    sets AS (
        SELECT doc_id, LIST(s ORDER BY s) AS arr, COUNT(*) AS n
        FROM shingle GROUP BY doc_id),
    flags AS (
        SELECT doc_id,
               ('0x' || substr(md5('incr:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   < {new_cut} AS is_new
        FROM sets WHERE n > 0),
    fp AS (
        SELECT s.doc_id, f.is_new, md5(array_to_string(s.arr, ' ')) AS fp
        FROM sets s JOIN flags f USING (doc_id) WHERE s.n > 0),
    exact AS (
        SELECT a.doc_id, MIN(b.doc_id) AS match_id, 1 AS prio, 1.0 AS jaccard
        FROM fp a JOIN fp b ON a.fp = b.fp AND a.is_new AND NOT b.is_new
        GROUP BY a.doc_id),
    hashed AS (
        SELECT doc_id, arr, n,
               list_transform(arr,
                   s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {MH_P}) AS hs
        FROM sets WHERE n > 0),
    sigs AS (
        SELECT doc_id, arr, n,
               {sig_exprs}
        FROM hashed),
    banded AS (
        SELECT g.doc_id, f.is_new, g.arr, g.n,
               {band_exprs}
        FROM sigs g JOIN flags f USING (doc_id)),
    cand AS (
        SELECT a.doc_id, b.doc_id AS base_id,
               a.arr AS arr1, a.n AS n1, b.arr AS arr2, b.n AS n2
        FROM banded a JOIN banded b
          ON a.is_new AND NOT b.is_new AND ({band_match})),
    near AS (
        SELECT doc_id, base_id AS match_id, 0 AS prio,
               ROUND(LEN(list_intersect(arr1, arr2)) * 1.0
                     / (n1 + n2 - LEN(list_intersect(arr1, arr2))), 6) AS jaccard
        FROM cand
        WHERE LEN(list_intersect(arr1, arr2)) * 1.0
              / (n1 + n2 - LEN(list_intersect(arr1, arr2))) >= {JACCARD_THRESHOLD}),
    unioned AS (SELECT * FROM exact UNION ALL SELECT * FROM near),
    best AS (
        SELECT doc_id, match_id, prio, jaccard,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY prio DESC, jaccard DESC, match_id ASC)
                   AS rn
        FROM unioned)
    SELECT doc_id, CAST(match_id AS BIGINT) AS match_id,
           CASE WHEN prio = 1 THEN 'exact' ELSE 'near' END AS method,
           CAST(jaccard AS DOUBLE) AS jaccard
    FROM best WHERE rn = 1
"""


SQL_DEDUP_INCREMENTAL = _incremental_oracle_sql()


SWEEP_THRESHOLDS = (0.8, 0.95, 0.97, 0.985)  # spans the observed pair mass


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning report: how many near-dup pairs (and docs
    touched) the LSH index yields at each candidate verify threshold —
    the artifact a curation team inspects before committing to a cut.

    One pass: the banded MinHash candidate set is generated ONCE
    (identical machinery to ``dedup_minhash_lsh``), every candidate's
    exact Jaccard is computed once, and the sweep is a conditional
    aggregation over the scored pairs — thresholds never re-run the
    pipeline. Caveat by construction: the banding is tuned for J ≥ 0.8,
    so lower thresholds report the pairs THIS index surfaces (candidate
    recall decays below the tuning point — that decay is exactly what
    the report shows the operator of the index). Output is
    |thresholds| rows.
    """
    sets_ = _staged_shingle_sets(spark, sf_dir)
    sigs = minhash_signatures(sets_)
    r = N_PERM // N_BANDS
    bands = F.array(
        *[
            F.concat_ws(",", *[F.col(f"sig{b * r + i}") for i in range(r)])
            for b in range(N_BANDS)
        ]
    )
    banded = sigs.select("doc_id", F.posexplode(bands).alias("band_idx", "band_val"))
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    scored = (
        cand.join(
            sets_.select(
                F.col("doc_id").alias("d1"),
                F.col("arr").alias("arr1"),
                F.col("n_sh").alias("n1"),
            ),
            "d1",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("d2"),
                F.col("arr").alias("arr2"),
                F.col("n_sh").alias("n2"),
            ),
            "d2",
        )
        .withColumn("n_common", F.size(F.array_intersect("arr1", "arr2")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6
            ),
        )
        .select("d1", "d2", "jaccard")
    )
    t = F.explode(
        F.array(*[F.lit(x) for x in SWEEP_THRESHOLDS])
    ).alias("threshold")
    return (
        scored.select("d1", "d2", "jaccard")
        .crossJoin(F.broadcast(spark.range(1).select(t)))
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count_distinct(F.col("d1")).alias("n_left_docs"),
        )
    )


def _threshold_sweep_sql() -> str:
    pair_sql = _minhash_oracle_sql().replace(
        f">= {JACCARD_THRESHOLD}", ">= 0"
    )
    ts = ", ".join(f"({t})" for t in SWEEP_THRESHOLDS)
    return f"""
    WITH scored AS ({pair_sql}),
    thresholds (threshold) AS (VALUES {ts})
    SELECT CAST(t.threshold AS DOUBLE) AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT s.d1) AS BIGINT) AS n_left_docs
    FROM scored s JOIN thresholds t ON s.jaccard >= t.threshold
    GROUP BY t.threshold
"""


SQL_DEDUP_THRESHOLD_SWEEP = _threshold_sweep_sql()


EDIT_DISTANCE_MAX = 4


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching by edit distance: near-identical ``part``
    names (typo/variant detection — the catalog-reconciliation and
    record-linkage primitive, complementing the token-set dedups above
    which can't see sub-token edits).

    Pairwise Levenshtein over a corpus is O(n²·len²) — never viable raw.
    The standard entity-resolution shape used here: (1) collapse to
    DISTINCT names first (cardinality of the *name space*, not the row
    count — 64 vs 2000 here, typically 1e5-1e7 names under 1e10 rows);
    (2) BLOCK candidates on a cheap deterministic key (the trailing
    token — product noun; real deployments use phonetic keys or q-gram
    prefixes) so the self-join is per-block, not global; (3) verify
    survivors with exact ``levenshtein`` (JVM built-in, identical unit-
    cost definition in DuckDB). Recall is blocking-dependent by design
    (an edit inside the block key escapes — disclosed, as in any
    blocking ER system); precision is exact. A hot block (every name
    sharing one noun) is the skew risk: bound it by salting the block or
    tightening the key — AQE skew-join handles moderate cases.
    """
    parts = load(spark, sf_dir, "part")
    names = (
        parts.groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").alias("n_parts"))
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .withColumn(
            # bounded form: the banded DP early-exits once the distance
            # provably exceeds the threshold (returns -1), ~30% faster
            # at sf0.1 and the win grows with string length; identical
            # surviving rows vs the oracle's unbounded <= MAX filter
            "dist",
            F.levenshtein(
                F.col("a.name"), F.col("b.name"), EDIT_DISTANCE_MAX
            ).cast("bigint"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= EDIT_DISTANCE_MAX))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            "dist",
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


SQL_DEDUP_EDIT_DISTANCE = f"""
    WITH names AS (
        SELECT p_name AS name,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               list_extract(string_split(p_name, ' '), -1) AS block
        FROM part GROUP BY p_name)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {EDIT_DISTANCE_MAX}
"""


def q_dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: how many near-dup pairs link
    each pair of sources — "who is mirroring whom", the view that decides
    which feed to drop when two crawls overlap.

    Reuses the full verified MinHash-LSH pair set (same signatures,
    bands, candidate join and exact-Jaccard verify as
    ``dedup_minhash_lsh``) and rolls it up by the UNORDERED source pair
    (least/greatest normalization so A↔B and B↔A collapse). The doc→
    source attribution joins are dimension-narrow (doc_id, source); the
    matrix output is |sources|² at most. Adds one broadcast-scale rollup
    on top of the already-scale-safe pair generation.
    """
    pairs = verified_pairs(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    attributed = (
        pairs.join(
            src.select(F.col("doc_id").alias("d1"), F.col("source").alias("s1")),
            "d1",
        )
        .join(
            src.select(F.col("doc_id").alias("d2"), F.col("source").alias("s2")),
            "d2",
        )
    )
    return (
        attributed.select(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            # order-free mean: round-6 jaccards quantize exactly to
            # DECIMAL(12,6), decimal SUM is associative, one double div
            F.round(
                F.sum(F.col("jaccard").cast("decimal(12,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_jaccard"),
        )
    )


def _source_overlap_sql() -> str:
    pair_sql = _minhash_oracle_sql()
    return f"""
    WITH pair_set AS ({pair_sql}),
    src AS (SELECT doc_id, source FROM documents)
    SELECT LEAST(a.source, b.source) AS source_a,
           GREATEST(a.source, b.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(12,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_jaccard
    FROM pair_set p
    JOIN src a ON p.d1 = a.doc_id
    JOIN src b ON p.d2 = b.doc_id
    GROUP BY 1, 2
"""


SQL_DEDUP_SOURCE_OVERLAP = _source_overlap_sql()


# ---------------------------------------------------------------------------
# exact substring dedup (cross-doc duplicated character k-grams)
# ---------------------------------------------------------------------------

SUBSTR_K = 24


def substring_gram_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, p, g) — every character k-gram position (1-based,
    stride 1) with the gram collapsed to its 60-bit portable md5 hash
    BEFORE any shuffle (8-byte keys instead of 24-byte strings). The
    shared base relation of the ExactSubstr score (`dedup_substring`)
    and transform (`llm_substring_clean`). Docs shorter than k emit no
    rows via the explicit sequence guard (Spark's sequence(1,0) is a
    BACKWARD range, not empty — the guard is load-bearing)."""
    from .llmdata import _portable_hash

    k = SUBSTR_K
    positions = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.length("text") >= k,
                F.sequence(F.lit(1), F.length("text") - (k - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
        "text",
    )
    return positions.select(
        "doc_id",
        "p",
        _portable_hash(F.expr(f"substring(text, p, {k})")).alias("g"),
    )


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, the fraction of its character k-gram positions
    (k=24, stride 1) whose k-gram also occurs in at least one OTHER
    document — the per-doc contamination score the ExactSubstr pass
    thresholds before cutting spans.

    Plan: explode each doc into (doc_id, position-gram-hash) rows — the
    gram itself is immediately collapsed to the 60-bit portable md5 hash
    so the shuffle carries 8-byte keys, not 24-byte strings (the same
    width trick the fingerprint family uses; both engines hash
    identically so equality survives the compression, and a 60-bit space
    holds billions of grams before a birthday collision matters — and an
    engine-pair collision is IDENTICAL on both sides, so the oracle
    still matches). One groupBy gram-hash with countDistinct(doc_id)
    (partial-aggregated), one vocabulary-side join back, one groupBy
    doc_id. Docs shorter than k keep n_grams=0 via the explicit
    sequence guard (Spark's sequence(1,0) is a BACKWARD range, not
    empty — the guard is load-bearing). At 100 TB the reference design
    is a distributed suffix array; the k-gram-hash grouping here is the
    shuffle-native equivalent with identical cross-doc semantics for
    fixed k, at cost O(total_chars) shuffle rows of 8 bytes each.
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    grams = substring_gram_rows(docs).select("doc_id", "g")
    gram_docs = grams.groupBy("g").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per_doc = (
        grams.join(gram_docs, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_dup_grams"),
        )
    )
    all_docs = docs.select("doc_id")
    out = all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 6),
        ).alias("dup_ratio"),
    )
    return out


SQL_DEDUP_SUBSTRING = f"""
    WITH g AS (
        SELECT doc_id,
               ('0x' || substr(md5(substring(text, i, {SUBSTR_K})), 1, 15))::BIGINT AS g
        FROM documents,
             LATERAL UNNEST(generate_series(1, GREATEST(LENGTH(text) - {SUBSTR_K - 1}, 0))) t(i)),
    gd AS (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY g),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
        FROM g JOIN gd USING (g) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(n_grams, 0) AS n_grams,
           COALESCE(n_dup_grams, 0) AS n_dup_grams,
           CASE WHEN COALESCE(n_grams, 0) > 0 THEN
               ROUND(n_dup_grams * 1.0 / n_grams, 6) END AS dup_ratio
    FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: k-means cluster, then within-cluster cosine)
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.45


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    k-means, then within each cluster flag any vector whose cosine to a
    SMALLER-id cluster-mate reaches tau — the keep-one-representative
    rule, with clusters bounding the candidate set so no global
    all-pairs ever forms. Composes the decimal-exact dataflow k-means
    (``similarity.kmeans_assign`` — the same relation the oracle CTE
    reproduces) with the engine-standard exact cosine
    (sequential double fold == DuckDB list_dot_product).

    Emits per vector: cluster, max cosine to any smaller-id cluster-mate
    (NULL when none / when either side is a zero vector — the engine's
    zero-vector-exclusion rule), and the dup verdict. Cost: O(sum of
    cluster_size²) pairs; the SemDeDup scale story is k proportional to
    corpus size so cluster sizes stay constant — at 100 TB you raise K
    (the centroid relation stays tiny and broadcast), the pair stage
    stays linear per cluster, and the plan shape is unchanged. Max over
    pairs is order-free, so the rounded score is cross-engine exact.
    """
    from .similarity import kmeans_assign

    emb = spread(load(spark, sf_dir, "embeddings"), "vec_id")
    assign = kmeans_assign(emb).select("vec_id", "cluster")
    e = emb.select("vec_id", to_double(F.col("embedding")).alias("v"))
    e = e.select("vec_id", "v", dot(F.col("v"), F.col("v")).alias("nsq"))
    clustered = assign.join(e, "vec_id").filter(F.col("nsq") > 0)
    a = clustered.select(
        F.col("vec_id").alias("a_id"),
        "cluster",
        F.col("v").alias("a_v"),
        F.col("nsq").alias("a_nsq"),
    )
    b = clustered.select(
        F.col("vec_id").alias("b_id"),
        "cluster",
        F.col("v").alias("b_v"),
        F.col("nsq").alias("b_nsq"),
    )
    pairs = a.join(b, "cluster").filter(F.col("b_id") < F.col("a_id"))
    cos = cosine_from_parts(
        dot(F.col("a_v"), F.col("b_v")), F.col("a_nsq"), F.col("b_nsq")
    )
    best = (
        pairs.select(F.col("a_id").alias("vec_id"), cos.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_cos"))
    )
    return (
        assign.join(best, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.round("max_cos", 6).alias("max_prior_cos"),
            F.coalesce(
                F.col("max_cos") >= SEMDEDUP_TAU, F.lit(False)
            ).alias("is_semantic_dup"),
        )
    )


def _semdedup_sql() -> str:
    from .similarity import SQL_SIMILARITY_KMEANS

    cos = (
        "list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
    WITH assign AS ({SQL_SIMILARITY_KMEANS}),
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (
        SELECT vec_id, cluster, v FROM assign JOIN e USING (vec_id)
        WHERE list_dot_product(v, v) > 0),
    best AS (
        SELECT a.vec_id AS vec_id, MAX({cos}) AS max_cos
        FROM c a JOIN c b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
        GROUP BY a.vec_id)
    SELECT assign.vec_id, cluster,
           ROUND(max_cos, 6) AS max_prior_cos,
           COALESCE(max_cos >= {SEMDEDUP_TAU}, FALSE) AS is_semantic_dup
    FROM assign LEFT JOIN best ON assign.vec_id = best.vec_id
"""


QUERIES = {
    "dedup_exact": Query(q_dedup_exact, SQL_DEDUP_EXACT, headline=True),
    "dedup_substring": Query(q_dedup_substring, SQL_DEDUP_SUBSTRING),
    "dedup_semantic": Query(q_dedup_semantic, _semdedup_sql()),
    "dedup_cascade_eval": Query(q_dedup_cascade_eval, _cascade_eval_sql()),
    "dedup_transitivity_eval": Query(
        q_dedup_transitivity_eval, _transitivity_eval_sql()
    ),
    "dedup_ngram_jaccard": Query(q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM, headline=True),
    "dedup_clusters": Query(q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_minhash_lsh": Query(q_dedup_minhash_lsh, SQL_DEDUP_MINHASH, headline=True),
    "dedup_simhash": Query(q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_embedding_cosine": Query(q_dedup_embedding_cosine, SQL_DEDUP_EMBEDDING),
    "dedup_embedding_lsh": Query(q_dedup_embedding_lsh, SQL_DEDUP_EMBEDDING_LSH),
    "dedup_containment": Query(q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "dedup_minhash_eval": Query(q_dedup_minhash_eval, SQL_DEDUP_MINHASH_EVAL),
    "dedup_edit_distance": Query(q_dedup_edit_distance, SQL_DEDUP_EDIT_DISTANCE),
    "dedup_incremental": Query(q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "dedup_source_overlap": Query(q_dedup_source_overlap, SQL_DEDUP_SOURCE_OVERLAP),
    "dedup_threshold_sweep": Query(q_dedup_threshold_sweep, SQL_DEDUP_THRESHOLD_SWEEP),
}
