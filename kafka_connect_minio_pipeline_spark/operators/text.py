"""Text-analysis operators over ``documents`` (SURVEY.md §2.4 text row;
BASELINE.json north star).

Everything stays JVM-side (split / regexp / higher-order array functions)
— token counting and quality scoring at 100 TB is a pure map, so the only
thing that matters is staying inside whole-stage codegen and letting the
parquet scan prune to (doc_id, text[, lang]).

- quality scoring: length / punctuation / stopword-ratio features and a
  deterministic composite score (oracle-checked).
- token counting: whitespace tokens AND a BPE-ish regex pre-tokenization
  (letters | digits | single non-space symbol), aggregated per language.
- n-gram profile: global top-20 word bigrams — explode + count + top-k.
- language-ID: corpus-trained character-bigram Naive-Bayes-ish scorer
  (oracle-checked since r7 via dec9 order-free log sums; determinism and
  self-consistency additionally asserted in tests).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec9
from ..registry import Query
from ..tables import load, load_meta, spread
from .dedup import SQL_TOKENS, WS_CHARS, WS_CLASS, WS_EXPR, tokens, word_ngrams

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
BPE_ISH = f"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9{WS_CHARS}]"


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + composite score (all deterministic).

    Stateless narrow projection — the same expression tree applies to a
    batch scan or a streaming source unchanged (see
    ``streaming.queries.q_stream_quality``)."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_in = ",".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(
        f"filter(filter(split(lower(text), '{WS_EXPR}+'), x -> x != ''), t -> t IN ({stop_in}))"
    ))
    n_chars = F.length(F.col("text"))
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    # Zero-token / zero-char guards (r5): under Spark's default ANSI mode
    # an unguarded ratio is a runtime DIVIDE_BY_ZERO — ONE empty or
    # whitespace-only document would kill a corpus-wide quality job. The
    # ratios are undefined there, so both engines emit NULL.
    has_toks = n_tokens > 0
    has_chars = n_chars > 0
    stop_ratio = F.when(has_toks, F.round(n_stop / n_tokens, 6))
    alpha_ratio = F.when(has_chars, F.round(alpha_chars / n_chars, 6))
    avg_tok_len = F.when(has_toks, F.round(alpha_chars / n_tokens, 6))
    score = F.when(
        has_toks & has_chars,
        F.round(
            (alpha_chars / n_chars) * 0.5
            + (n_stop / n_tokens) * 0.3
            + F.least(n_tokens / F.lit(32.0), F.lit(1.0)) * 0.2,
            6,
        ),
    )
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        avg_tok_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: quality features over ``documents``."""
    return quality_features(spread(load(spark, sf_dir, "documents"), "doc_id"))


_STOP_SQL = ",".join(f"'{s}'" for s in STOPWORDS)

SQL_TEXT_QUALITY = f"""
    WITH t AS (
        SELECT doc_id, lang, text,
               {SQL_TOKENS.format(col='text')} AS toks,
               LENGTH(text) AS n_chars,
               LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars
        FROM documents)
    SELECT doc_id, lang,
           CAST(LEN(toks) AS INTEGER) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CASE WHEN LEN(toks) > 0 THEN
               ROUND(LEN(LIST_FILTER(toks, t -> t IN ({_STOP_SQL}))) * 1.0
                     / LEN(toks), 6) END AS stopword_ratio,
           CASE WHEN n_chars > 0 THEN
               ROUND(alpha_chars * 1.0 / n_chars, 6) END AS alpha_ratio,
           CASE WHEN LEN(toks) > 0 THEN
               ROUND(alpha_chars * 1.0 / LEN(toks), 6) END AS avg_token_len,
           CASE WHEN LEN(toks) > 0 AND n_chars > 0 THEN
               ROUND((alpha_chars * 1.0 / n_chars) * 0.5
                     + (LEN(LIST_FILTER(toks, t -> t IN ({_STOP_SQL}))) * 1.0 / LEN(toks)) * 0.3
                     + LEAST(LEN(toks) / 32.0, 1.0) * 0.2, 6) END AS quality_score
    FROM t
"""


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language: docs, whitespace tokens,
    BPE-ish regex tokens, distinct vocabulary, chars."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = tokens(F.col("text"))
    # NB: not F.expr — Spark SQL string literals process backslash escapes,
    # which silently turns \s into s inside an embedded regex.
    bpe_count = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), F.lit(0)))
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_ws"),
        bpe_count.alias("n_bpe"),
        F.length(F.col("text")).cast("long").alias("n_chars"),
        toks.alias("toks"),
    )
    vocab = (
        per_doc.select("lang", F.explode("toks").alias("t"))
        .groupBy("lang")
        .agg(F.countDistinct("t").alias("vocab_size"))
    )
    stats = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws").alias("total_ws_tokens"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_ws") / F.count("*"), 6).alias("avg_tokens_per_doc"),
    )
    return stats.join(vocab, "lang")


SQL_TEXT_TOKEN_STATS = f"""
    WITH t AS (
        SELECT doc_id, lang,
               {SQL_TOKENS.format(col='text')} AS toks,
               LEN(regexp_extract_all(text, '{BPE_ISH}')) AS n_bpe,
               LENGTH(text) AS n_chars
        FROM documents),
    vocab AS (
        SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
        FROM t, UNNEST(toks) x(tok) GROUP BY lang),
    stats AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEN(toks)) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(SUM(LEN(toks)) * 1.0 / COUNT(*), 6) AS avg_tokens_per_doc
        FROM t GROUP BY lang)
    SELECT stats.*, vocab_size FROM stats JOIN vocab USING (lang)
"""


def q_text_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 word bigrams (tiebreak on the bigram string)."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    staged = docs.select(tokens(F.col("text")).alias("toks"))
    bigrams = word_ngrams(F.col("toks"), 2)
    return (
        staged.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


SQL_TEXT_NGRAM_TOP = f"""
    WITH bg AS (
        SELECT w[i] || ' ' || w[i+1] AS bigram
        FROM (SELECT {SQL_TOKENS.format(col='text')} AS w FROM documents),
             UNNEST(RANGE(1, GREATEST(LEN(w), 1))) r(i))
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
"""


FP_BASE = 131  # polynomial rolling-hash base
FP_MOD = 1 << 20  # per-token hash domain; keeps 3-term polynomial < 2^35
FP_WINDOW = 4  # fingerprints kept: min hash per window of 4 positions


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via rolling polynomial hash + winnowing-style
    selection (the MOSS/shingle-fingerprint design for plagiarism / near-dup
    detection at corpus scale).

    Per doc: token stream → per-token hash (md5-derived, engine-portable) →
    degree-2 polynomial rolling hash over each 3-token window (the classic
    Rabin-Karp form; in a columnar engine the "roll" is three shifted array
    slices zipped, not an incremental update — same values, vectorized) →
    keep the minimum hash per window of 4 consecutive positions. Output is
    the fingerprint set (doc_id, bucket, fp): ~|doc|/4 values per doc, the
    compact sketch two corpora are joined on to find overlapping passages.

    Everything is exact integer math shared with the oracle: token hash
    < 2^20, so v1*131^2 + v2*131 + v3 < 2^35 — no overflow in either engine.
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = tokens(F.col("text"))
    hv = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % FP_MOD,
    )
    # Materialize the token-hash array behind a projection boundary: the
    # three slices below would otherwise each re-evaluate the md5 map
    # (no CSE across higher-order-function lambdas; measured 3× slower).
    staged = docs.select("doc_id", hv.alias("hv"))
    c = F.col("hv")
    m = F.greatest(F.size(c) - 2, F.lit(1))
    rolled = F.zip_with(
        F.zip_with(
            F.slice(c, 1, m), F.slice(c, 2, m), lambda a, b: a * FP_BASE + b
        ),
        F.slice(c, 3, m),
        lambda ab, x: ab * FP_BASE + x,
    )
    guarded = F.when(F.size(c) >= 3, rolled).otherwise(
        F.array().cast("array<bigint>")
    )
    return (
        staged.select("doc_id", F.posexplode(guarded).alias("pos", "h"))
        .groupBy("doc_id", F.expr(f"CAST(pos DIV {FP_WINDOW} AS BIGINT)").alias("bucket"))
        .agg(F.min("h").alias("fp"))
    )


SQL_TEXT_FINGERPRINT = f"""
    WITH t AS (
        SELECT doc_id,
               list_transform({SQL_TOKENS.format(col='text')},
                   tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % {FP_MOD}) AS v
        FROM documents),
    g AS (
        SELECT doc_id, i - 1 AS pos,
               v[i] * {FP_BASE * FP_BASE} + v[i + 1] * {FP_BASE} + v[i + 2] AS h
        FROM t, UNNEST(RANGE(1, GREATEST(LEN(v) - 1, 1))) r(i))
    SELECT doc_id, CAST(pos // {FP_WINDOW} AS BIGINT) AS bucket, MIN(h) AS fp
    FROM g GROUP BY 1, 2
"""


def q_text_common_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated passages from the winnowing fingerprints —
    the corpus-scale boilerplate/exact-substring-dup detector (the
    aggregation step of suffix-array-style dedup, on the compact sketch
    instead of raw text).

    One partially-aggregated groupBy over the fingerprint relation
    (~|doc|/4 rows per doc): shuffle volume is bounded by distinct
    fingerprints, and the ≥2-docs filter drops the unique tail early.
    Feeding removal is a semi-join of documents against these fps."""
    fp = q_text_fingerprint(spark, sf_dir)
    return (
        fp.groupBy("fp")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


SQL_TEXT_COMMON_PASSAGES = f"""
    WITH fps AS ({SQL_TEXT_FINGERPRINT})
    SELECT fp,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pre-tokenization cleanup pass of
    a corpus pipeline): lowercase → non-alphanumerics to spaces →
    whitespace collapse → trim. Emitted as md5 + length so the oracle
    compares compact digests instead of full documents."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("norm_len"),
    )


SQL_TEXT_NORMALIZE = """
    SELECT doc_id,
           MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
               '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5,
           CAST(LENGTH(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
               '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS norm_len
    FROM documents
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language scorer, trained on the corpus itself.

    Profiles: P(char-bigram | lang) with add-one smoothing, computed from
    the labeled corpus; each doc is scored per language by summed log
    frequencies and assigned the argmax. This is the classic n-gram-profile
    language-ID shape (Cavnar-Trenkle style) as joins + aggregations —
    train and apply are both distributed; nothing driver-side.

    Oracle-checked since r7 (previously rows-only): each per-(doc, lang,
    bigram) log contribution is rounded to 9 decimals and summed as
    exact DECIMAL(28,9) — the order-free dec9 portability rule
    ``text_unigram_logprob`` proved for the identical n·ln(p) shape —
    so scores, and therefore the argmax (ties → smaller lang), are
    engine-identical. The r7 rewrite also fixed a latent short-doc bug:
    ``sequence(1, length-1)`` steps BACKWARD in Spark for length < 2
    (the guard ``text_bpe_pairs`` documents), minting junk bigrams from
    0-and-1-char documents where the oracle's generate_series is empty.
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    chars2 = F.when(
        F.length("text") >= 2,
        F.expr(
            "transform(sequence(1, length(text) - 1),"
            " i -> substring(text, i, 2))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_bg = docs.select("doc_id", "lang", F.explode(chars2).alias("bg"))
    # per-language bigram log-probabilities (add-one smoothed)
    lang_counts = doc_bg.groupBy("lang", "bg").agg(F.count("*").alias("c"))
    lang_totals = lang_counts.groupBy("lang").agg(F.sum("c").alias("total"))
    profile = lang_counts.join(lang_totals, "lang").select(
        F.col("lang").alias("p_lang"),
        "bg",
        F.log((F.col("c") + 1) / (F.col("total") + 1)).alias("logp"),
    )
    scored = (
        doc_bg.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(profile), "bg")
        .groupBy("doc_id", "p_lang")
        .agg(F.sum(dec9(F.col("n") * F.col("logp"))).alias("score"))
    )
    # tie-break must be NULL-safe on BOTH engines: Spark's bare ASC puts
    # NULLs FIRST, DuckDB's puts them LAST — a NULL-lang profile (NULL
    # lang is a real bucket, see text_bpe_fertility) tying with a named
    # language would otherwise diverge (ADVICE r7)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("p_lang").asc_nulls_last()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("p_lang").alias("predicted_lang"))
    )
    return docs.select("doc_id", "lang").join(pred, "doc_id")


SQL_TEXT_LANGID = """
    WITH bg AS (
        SELECT doc_id, lang, substring(text, i, 2) AS bg
        FROM documents,
             LATERAL UNNEST(generate_series(1, length(text) - 1)) t(i)),
    lang_counts AS (
        SELECT lang, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    lang_totals AS (
        SELECT lang, SUM(c) AS total FROM lang_counts GROUP BY 1),
    profile AS (
        SELECT lc.lang AS p_lang, bg,
               LN((c + 1) / (total + 1.0)) AS logp
        FROM lang_counts lc JOIN lang_totals USING (lang)),
    docbg AS (
        SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    scored AS (
        SELECT doc_id, p_lang,
               SUM(CAST(ROUND(n * logp, 9) AS DECIMAL(28,9))) AS score
        FROM docbg JOIN profile USING (bg)
        GROUP BY 1, 2),
    pred AS (
        SELECT doc_id, p_lang AS predicted_lang FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score DESC, p_lang NULLS LAST) AS rn
            FROM scored)
        WHERE rn = 1)
    SELECT d.doc_id, d.lang, predicted_lang
    FROM documents d JOIN pred USING (doc_id)
"""


TFIDF_TOP_K = 3


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF.

    Plan shape (the one that survives 100 TB): explode + groupBy(doc,
    term) is the only big shuffle; document frequency is an aggregation
    of that SAME relation down to |vocab| rows (identical subtree →
    ReusedExchange feeds both sides of the join, and AQE broadcasts the
    df side when the vocabulary fits — at web scale it degrades to a
    co-partitioned shuffle join on term, never a recompute of the
    corpus scan). The final top-k is a row_number window per doc —
    bounded partitions (a doc's distinct terms), no skew risk. idf uses
    the classic smoothed form ln((N+1)/(df+1)) + 1; the score is rounded
    through one IEEE double tree so both engines agree (ln is not
    required correctly-rounded, but a 1-ulp wobble dies in round(…, 6)).
    """
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    scored = (
        tf.join(df_rel, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: top-3 TF-IDF terms per document."""
    return tfidf_top_terms(spread(load(spark, sf_dir, "documents"), "doc_id"))


SQL_TEXT_TFIDF = f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, UNNEST({SQL_TOKENS.format(col='text')}) AS term
              FROM documents)
        GROUP BY doc_id, term),
    dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               ROUND(tf.tf * (LN((n.n_docs + 1) * 1.0 / (dfreq.df + 1)) + 1), 6)
                   AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rank
        FROM scored)
    WHERE rank <= {TFIDF_TOP_K}
"""


# GPT-2-style pretokenizer classes: space-prefixed letter runs, digit
# runs, punctuation runs. Kept to constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): literal classes, no lookaround.
PRETOKEN_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def pretokenize_stats(docs: DataFrame) -> DataFrame:
    """Per-document BPE-pretokenization statistics — the unit a tokenizer
    trainer consumes (pretoken counts feed BPE merges; per-class counts
    feed corpus-mix dashboards; the distinct ratio is a cheap boilerplate
    flag).

    Narrow per-row regex + array algebra after a compute-spread: no
    shuffle, no Python. At 100 TB the same projection runs ahead of the
    tokenizer-training aggregation (see ``corpus_vocab_top``) so the
    expensive regex pass happens exactly once.
    """
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(PRETOKEN_RE), 0)
    n_class = {
        "n_word": " ?[a-z]+",
        "n_num": " ?[0-9]+",
        "n_punct": " ?[^a-z0-9 ]+",
    }
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_pretok"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        *[
            F.size(
                F.filter(toks, lambda t: t.rlike(f"^({pat})$"))
            ).cast("int").alias(name)
            for name, pat in n_class.items()
        ],
    )


def q_text_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: pretokenizer stats over ``documents``."""
    return pretokenize_stats(spread(load(spark, sf_dir, "documents"), "doc_id"))


SQL_TEXT_PRETOKENIZE = f"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{PRETOKEN_RE}') AS toks
        FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_pretok,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           CAST(len(list_filter(toks,
               x -> regexp_full_match(x, ' ?[a-z]+'))) AS INTEGER) AS n_word,
           CAST(len(list_filter(toks,
               x -> regexp_full_match(x, ' ?[0-9]+'))) AS INTEGER) AS n_num,
           CAST(len(list_filter(toks,
               x -> regexp_full_match(x, ' ?[^a-z0-9 ]+'))) AS INTEGER) AS n_punct
    FROM t
"""


BM25_TERMS = ("spark", "query", "join")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(docs: DataFrame, terms: tuple[str, ...] = BM25_TERMS) -> DataFrame:
    """BM25 relevance of every document against a fixed keyword query —
    the retrieval scorer of a RAG / search-index pipeline, with a
    rational IDF surrogate ``(N - df + 0.5) / (df + 0.5)`` (the classic
    formula minus the log: monotone-identical ranking, and no libm ``ln``
    whose last ulp differs across engines).

    Plan shape is the 100 TB one: per-doc term frequencies are NARROW
    array expressions fused into the scan (no explode, no shuffle);
    corpus stats (N, avgdl, per-term df) are ONE partial-aggregated
    scalar pass broadcast back; the score is a fixed-order sum of
    per-term columns, so float addition order is engine-identical by
    construction. Total cost: one scan + one broadcast, ever.
    """
    toks = tokens(F.col("text"))

    def term_count(term: str):
        # nested def, not a default-arg lambda: F.filter reads a 2-arg
        # lambda as (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    staged = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[term_count(t).alias(f"tf_{t}") for t in terms],
    )
    stats = staged.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = staged.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        idf = (
            F.col("n_docs").cast("double") - F.col(f"df_{t}") + F.lit(0.5)
        ) / (F.col(f"df_{t}").cast("double") + F.lit(0.5))
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        score = score + idf * tf * F.lit(BM25_K1 + 1.0) / denom
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: BM25 keyword relevance over ``documents``."""
    return bm25_scores(spread(load(spark, sf_dir, "documents"), "doc_id"))


def _sql_text_bm25() -> str:
    toks = SQL_TOKENS.format(col="text")
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in BM25_TERMS
    )
    score = " + ".join(
        f"((CAST(n_docs AS DOUBLE) - df_{t} + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5))"
        f" * CAST(tf_{t} AS DOUBLE) * {BM25_K1 + 1.0}"
        f" / (CAST(tf_{t} AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B}"
        f" + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))"
        for t in BM25_TERMS
    )
    return f"""
    WITH staged AS (
        SELECT doc_id, len(toks) AS dl, {tf_cols}
        FROM (SELECT doc_id, {toks} AS toks FROM documents)),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {df_cols}
        FROM staged)
    SELECT doc_id, ROUND(CAST(0.0 AS DOUBLE) + {score}, 6) AS bm25
    FROM staged CROSS JOIN stats
    WHERE ROUND(CAST(0.0 AS DOUBLE) + {score}, 6) > 0
"""


SQL_TEXT_BM25 = _sql_text_bm25()


BPE_TOP_PAIRS = 30


def q_text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-merge statistics — the inner loop of BPE tokenizer
    training, run as two aggregations: (1) the corpus collapses to a
    word-frequency relation (vocabulary-sized, tiny next to the corpus —
    this is exactly why real BPE trainers pre-aggregate words first);
    (2) each distinct word fans out to its adjacent character pairs with
    multiplicity, weighted by word count, and the top merge candidates
    come back via TakeOrdered. At 100 TB stage 1 is the only pass over
    the data (partial-aggregated count); stage 2 is sized by |vocab|,
    not corpus size. Subsequent merge iterations rewrite the word→symbol
    split and repeat stage 2 only — the loop never rescans the corpus.
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    # sequence(1, 0) would step BACKWARD in Spark — guard 1-char words
    pair_arr = F.when(
        F.length("word") >= 2,
        F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select("cnt", F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(BPE_TOP_PAIRS)
    )


SQL_TEXT_BPE_PAIRS = f"""
    WITH words AS (
        SELECT t.w AS word, COUNT(*) AS cnt
        FROM (SELECT {SQL_TOKENS.format(col='text')} AS toks FROM documents),
             UNNEST(toks) t(w)
        GROUP BY 1),
    pairs AS (
        SELECT cnt, p.pair
        FROM words,
             UNNEST([substr(word, i, 2) FOR i IN RANGE(1, LENGTH(word))]) p(pair))
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n_occ
    FROM pairs GROUP BY pair
    ORDER BY n_occ DESC, pair
    LIMIT {BPE_TOP_PAIRS}
"""


BPE_MERGES = 8  # learned merge rounds (fixed constant, unrolled identically
#                 in the Spark plan and the DuckDB oracle)
# BPE runs over alphanumeric words only: whitespace tokens may carry
# punctuation (tokens() is a pure \s+ split), and restricting the merge
# alphabet to [a-z0-9] makes the '<'/'>' symbol wrappers collision-free.
BPE_WORD_RE = "\\A[a-z0-9]+\\z"


def _bpe_rounds(
    words: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[DataFrame, list[DataFrame]]:
    """Learn ``n_merges`` BPE merges over a (word, cnt) relation; return
    (final segmentations, per-round 1-row winner relations (pr, w) — pr
    NULL when the pair supply was exhausted) — the train half of a
    byte-pair tokenizer as pure dataflow (the inference half is
    :func:`q_text_bpe_apply`; the winner list is the merge TABLE
    ``q_text_bpe_vocab`` emits).

    Representation: a word's symbol sequence is ONE string with every
    symbol wrapped, ``hello → "<h><e><l><l><o>"``. Merging the winning
    pair (a,b) is then ``replace(seq, '<a><b>', '<ab>')`` — both engines'
    ``replace`` scans left-to-right non-overlapping, which IS the BPE
    merge order (``lll`` under an (l,l) merge → ``[ll, l]``), and the
    wrappers make the pattern an exact symbol-boundary match (``<a><b>``
    can never match inside ``<xa><bc>``).

    Each round is two vocabulary-sized steps: (1) pair statistics —
    split every seq back to symbols, fan out adjacent pairs weighted by
    word count, one groupBy; the winner is max weight with the smaller
    pair string on ties (deterministic, and pure ASCII so Spark's UTF8
    ordering agrees with DuckDB's binary collation); (2) collapse — the
    1-row winner relation is broadcast onto the vocabulary and folded
    into seq via ``replace``. An exhausted pair supply yields a NULL
    winner, coalesced to an unmatchable ``\\x01`` sentinel so later
    rounds are no-ops instead of NULL-poisoning every seq. Rounds are
    ``localCheckpoint``-ed (vocabulary-sized, like the MMR pool) so the
    unrolled plan stays linear instead of re-deriving round k-1 for both
    of round k's consumers. At 100 TB the corpus is never rescanned:
    the caller collapses it to (word, cnt) once, and every round here is
    sized by |vocab|, exactly like a real BPE trainer's pre-aggregated
    inner loop.
    """
    cur = words.select(
        "word", "cnt", F.regexp_replace(F.col("word"), "(.)", "<$1>").alias("seq")
    )
    pair_arr = (
        "CASE WHEN size(syms) >= 2 THEN"
        " transform(sequence(1, size(syms) - 1),"
        " i -> concat('<', element_at(syms, i), '><', element_at(syms, i + 1), '>'))"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    winners: list[DataFrame] = []
    for _ in range(n_merges):
        staged = cur.withColumn(
            "syms", F.split(F.expr("substring(seq, 2, length(seq) - 2)"), "><")
        )
        best = (
            staged.select("cnt", F.explode(F.expr(pair_arr)).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("cnt").alias("w"))
            .orderBy(F.col("w").desc(), "pr")
            .limit(1)
            # exactly 1 row; NULLs when no pairs (min of the 1-row limit
            # is that row, min of zero rows is NULL)
            .agg(F.min("pr").alias("pr"), F.min("w").alias("w"))
        )
        winners.append(best)
        tgt = F.coalesce(F.col("pr"), F.lit("\x01"))
        cur = (
            staged.crossJoin(F.broadcast(best))
            .select(
                "word",
                "cnt",
                F.replace(
                    F.col("seq"), tgt, F.replace(tgt, F.lit("><"), F.lit(""))
                ).alias("seq"),
            )
            .localCheckpoint()  # bounded: |vocab| rows
        )
    return cur, winners


def bpe_learn_segment(words: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Final per-word segmentations only (see :func:`_bpe_rounds`)."""
    cur, _ = _bpe_rounds(words, n_merges)
    return cur


def _corpus_words(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(doc-word rows, checkpointed (word, cnt) vocabulary) — pass 1 of
    the tokenizer pipeline, shared by the vocab/apply/fertility queries."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    dw = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word").rlike(BPE_WORD_RE))
    words = dw.groupBy("word").agg(F.count("*").alias("cnt")).localCheckpoint()
    return dw, words


def q_text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned MERGE TABLE itself as a first-class relation —
    (merge_rank, pair, n_occ): the ordered list of byte-pair merges a
    trained tokenizer ships as its vocabulary artifact, with each
    winner's corpus weight at the time it won. Rounds out the tokenizer
    triple: ``text_bpe_pairs`` (pre-merge statistics), this (the train
    artifact), ``text_bpe_apply`` (encode). One corpus pass (the word
    collapse); everything after is vocabulary-sized; the per-round
    winner relations come straight from the already-checkpointed merge
    loop, so emitting the table re-runs nothing corpus-shaped. The
    DuckDB oracle reads the same winners off its unrolled round CTEs."""
    _, words = _corpus_words(spark, sf_dir)
    _, winners = _bpe_rounds(words)
    out = None
    for m, best in enumerate(winners, start=1):
        row = best.select(
            F.lit(m).cast("int").alias("merge_rank"),
            F.col("pr").alias("pair"),
            F.col("w").cast("bigint").alias("n_occ"),
        )
        out = row if out is None else out.unionByName(row)
    return out.filter(F.col("pair").isNotNull())


def q_text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE (the inference half of the tokenizer pipeline): train
    the :data:`BPE_MERGES`-merge table on the corpus's own word-frequency
    relation (:func:`bpe_learn_segment` — the same statistics
    ``text_bpe_pairs`` reports), then encode every document by joining
    its words to their learned segmentations. Output per document: word
    count, character mass, and the post-BPE token count — the number a
    token-budget/packing pipeline actually needs from an encoder.

    Two corpus passes total, the canonical tokenizer shape: pass 1
    collapses the corpus to (word, cnt) for training (partial-aggregated
    groupBy, vocabulary-sized output); pass 2 re-tokenizes and joins on
    word against the vocabulary-sized segmentation table (AQE broadcasts
    it when small) with one per-doc groupBy. The merge loop in between
    never touches the corpus. The DuckDB oracle unrolls the identical
    rounds, so the whole encode — merge table included — hash-matches.
    """
    dw, words = _corpus_words(spark, sf_dir)
    vocab = bpe_learn_segment(words).select(
        "word",
        F.size(
            F.split(F.expr("substring(seq, 2, length(seq) - 2)"), "><")
        ).alias("n_syms"),
    )
    return (
        dw.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars_alnum"),
            F.sum("n_syms").cast("bigint").alias("n_bpe"),
        )
    )


def q_text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY report per language — tokens-per-word and
    chars-per-token of the corpus-trained BPE encoder, the standard
    numbers a tokenizer eval publishes before a vocab ships (high
    fertility on a language = that language pays more sequence length
    per word — the multilingual-cost metric). Built on the encode pass:
    per-doc BPE counts grouped by ``documents.lang`` via a
    metadata-pruned join (load_meta — the lang lookup never re-reads
    the text column). NULL lang groups as its own bucket, identically
    in both engines."""
    dw, words = _corpus_words(spark, sf_dir)
    vocab = bpe_learn_segment(words).select(
        "word",
        F.size(
            F.split(F.expr("substring(seq, 2, length(seq) - 2)"), "><")
        ).alias("n_syms"),
    )
    perdoc = (
        dw.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_syms").alias("n_bpe"),
        )
    )
    lang = load_meta(spark, sf_dir, "documents", "lang")
    return (
        perdoc.join(lang, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe"),
            F.round(
                F.sum("n_bpe").cast("double") / F.sum("n_words"), 6
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6
            ).alias("chars_per_token"),
        )
    )


def _bpe_cte_chain(n_merges: int = BPE_MERGES) -> tuple[str, str]:
    """(CTE body, final-segmentation CTE name) shared by the
    vocab/apply/fertility oracles — the DuckDB twin of
    :func:`_corpus_words` + :func:`_bpe_rounds`. Each round's winner CTE
    b{m} always holds exactly one row: the wrapped winning pair (sentinel
    chr(1) when the pair supply is exhausted — matches the Spark
    coalesce) and its weight."""
    rounds = []
    prev = "s0"
    for m in range(1, n_merges + 1):
        rounds.append(f"""
    p{m} AS (
        SELECT '<' || syms[i] || '><' || syms[i + 1] || '>' AS pr,
               SUM(cnt) AS w
        FROM (SELECT cnt,
                     string_split(substr(seq, 2, length(seq) - 2), '><') AS syms
              FROM {prev}),
             LATERAL UNNEST(generate_series(1, len(syms) - 1)) t(i)
        GROUP BY 1),
    b{m} AS (
        -- exactly ONE reference to p{m}: a second scalar subquery here
        -- doubles the reference count per round, and DuckDB's CTE
        -- inlining then re-evaluates the whole prefix 2^rounds times
        -- (measured: >60 s at sf0.001 vs milliseconds); the 1-row
        -- left join keeps b{m} total when p{m} is empty
        SELECT COALESCE(t.pr, chr(1)) AS pr, t.w
        FROM (VALUES (1)) d(x)
        LEFT JOIN (SELECT pr, w FROM p{m}
                   ORDER BY w DESC, pr LIMIT 1) t ON TRUE),
    s{m} AS (
        SELECT word, cnt, replace(seq, b.pr, replace(b.pr, '><', '')) AS seq
        FROM {prev}, b{m} b)""")
        prev = f"s{m}"
    toks = SQL_TOKENS.format(col="text")
    chain = f"""dw AS (
        SELECT doc_id, t.w AS word
        FROM (SELECT doc_id, {toks} AS toks FROM documents),
             UNNEST(toks) t(w)
        WHERE regexp_full_match(t.w, '[a-z0-9]+')),
    w0 AS (SELECT word, COUNT(*) AS cnt FROM dw GROUP BY 1),
    s0 AS (SELECT word, cnt,
                  regexp_replace(word, '(.)', '<\\1>', 'g') AS seq
           FROM w0),{",".join(rounds)}"""
    return chain, prev


def _bpe_apply_sql(n_merges: int = BPE_MERGES) -> str:
    chain, prev = _bpe_cte_chain(n_merges)
    return f"""
    WITH {chain}
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(LENGTH(d.word)) AS BIGINT) AS n_chars_alnum,
           CAST(SUM(len(string_split(substr(v.seq, 2, length(v.seq) - 2),
                                     '><'))) AS BIGINT) AS n_bpe
    FROM dw d JOIN {prev} v USING (word)
    GROUP BY d.doc_id
"""


def _bpe_vocab_sql(n_merges: int = BPE_MERGES) -> str:
    chain, _ = _bpe_cte_chain(n_merges)
    arms = "\n    UNION ALL ".join(
        f"SELECT CAST({m} AS INTEGER) AS merge_rank, pr AS pair,"
        f" CAST(w AS BIGINT) AS n_occ FROM b{m} WHERE pr <> chr(1)"
        for m in range(1, n_merges + 1)
    )
    return f"""
    WITH {chain}
    {arms}
"""


def _bpe_fertility_sql(n_merges: int = BPE_MERGES) -> str:
    chain, prev = _bpe_cte_chain(n_merges)
    return f"""
    WITH {chain},
    perdoc AS (
        SELECT d.doc_id,
               COUNT(*) AS n_words,
               SUM(LENGTH(d.word)) AS n_chars,
               SUM(len(string_split(substr(v.seq, 2, length(v.seq) - 2),
                                    '><'))) AS n_bpe
        FROM dw d JOIN {prev} v USING (word)
        GROUP BY d.doc_id)
    SELECT doc.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_words) AS BIGINT) AS total_words,
           CAST(SUM(p.n_bpe) AS BIGINT) AS total_bpe,
           ROUND(CAST(SUM(p.n_bpe) AS DOUBLE) / SUM(p.n_words), 6)
               AS fertility,
           ROUND(CAST(SUM(p.n_chars) AS DOUBLE) / SUM(p.n_bpe), 6)
               AS chars_per_token
    FROM perdoc p JOIN documents doc USING (doc_id)
    GROUP BY doc.lang
"""


SQL_TEXT_BPE_APPLY = _bpe_apply_sql()
SQL_TEXT_BPE_VOCAB = _bpe_vocab_sql()
SQL_TEXT_BPE_FERTILITY = _bpe_fertility_sql()


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability profile: word/sentence/syllable counts
    and the Flesch reading-ease score — the grade-level signal curation
    stacks use beside stopword/length heuristics (quality filtering by
    audience level).

    Syllables are the standard vowel-group approximation
    (non-overlapping ``[aeiouy]+`` runs — ``regexp_count`` here,
    ``regexp_extract_all`` length in DuckDB, identical left-to-right
    match semantics); sentence count is clamped to ≥ 1 so the ratio is
    total on punctuation-free text. The score is fixed literals and one
    IEEE double tree over integer counts — portable, rounded once.
    Entirely narrow (scan → project after compute-spread): linear at any
    scale.
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    staged = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_words"),
        F.greatest(F.regexp_count(F.col("text"), F.lit(r"[.!?]")), F.lit(1))
        .cast("bigint")
        .alias("n_sentences"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
        .cast("bigint")
        .alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
        - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words"))
    )
    return staged.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(flesch, 6).alias("flesch"),
    )


SQL_TEXT_READABILITY = f"""
    WITH staged AS (
        SELECT doc_id,
               CAST(LEN({SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_words,
               CAST(GREATEST(LEN(regexp_extract_all(text, '[.!?]')), 1) AS BIGINT)
                   AS n_sentences,
               CAST(LEN(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
                   AS n_syllables
        FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           ROUND(206.835
                 - 1.015 * (n_words * 1.0 / n_sentences)
                 - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch
    FROM staged WHERE n_words > 0
"""


COLLOC_MIN_COUNT = 5
COLLOC_TOP_K = 50


def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: bigrams whose words co-occur far more than
    chance — ranked by PMI-style lift, the phrase-mining primitive
    (multi-word-expression detection, phrase vocabulary for tokenizers).

    Lift is the PMI argument WITHOUT the log — an exact rational
    p(ab)/(p(a)p(b)) built from integer counts with one double division,
    so the ranking is engine-portable (cross-engine libm log is not; the
    log is monotone so the ranking is PMI's). Corpus-sized work is the
    unigram + bigram count aggregations (both partial-aggregated,
    vocabulary-sized outputs); the unigram joins hit vocabulary-sized
    relations, corpus totals broadcast as scalar rows, and the top-k is
    TakeOrdered on the ROUNDED score (never a global sort; rounding
    first makes the sort key itself cross-engine exact). Min-support
    filter kills the degenerate rare-pair tail before ranking.
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    uni = (
        toked.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    bi = (
        toked.select(F.explode(word_ngrams(F.col("toks"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= COLLOC_MIN_COUNT)
        .withColumn("w1", F.split("bg", " ")[0])
        .withColumn("w2", F.split("bg", " ")[1])
    )
    n_uni = uni.agg(F.sum("n_w").alias("n_uni_total"))
    n_bi_total = (
        toked.select(
            F.greatest(F.size("toks") - 1, F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("n_bi_total"))
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi_total))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_ab").cast("double") * F.col("n_uni_total") * F.col("n_uni_total"))
                / (F.col("n_bi_total").cast("double") * F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("w1"), F.col("w2")
    ).limit(COLLOC_TOP_K)


SQL_TEXT_COLLOCATIONS = f"""
    WITH toked AS (
        SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks FROM documents),
    uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
        FROM (SELECT UNNEST(toks) AS w FROM toked) GROUP BY w),
    bi AS (
        SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_ab,
               string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2
        FROM (SELECT UNNEST([toks[i] || ' ' || toks[i+1]
                             FOR i IN RANGE(1, GREATEST(LEN(toks), 1))]) AS bg
              FROM toked)
        GROUP BY bg HAVING COUNT(*) >= {COLLOC_MIN_COUNT}),
    tot AS (
        SELECT (SELECT SUM(n_w) FROM uni) AS n_uni_total,
               (SELECT SUM(GREATEST(LEN(toks) - 1, 0)) FROM toked) AS n_bi_total)
    SELECT w1, w2, n_ab, a.n_w AS n_a, b.n_w AS n_b,
           ROUND((CAST(n_ab AS DOUBLE) * n_uni_total * n_uni_total)
                 / (CAST(n_bi_total AS DOUBLE) * a.n_w * b.n_w), 6) AS lift
    FROM bi
    JOIN uni a ON bi.w1 = a.w
    JOIN uni b ON bi.w2 = b.w
    CROSS JOIN tot
    ORDER BY lift DESC, w1, w2
    LIMIT {COLLOC_TOP_K}
"""


ZIPF_TOP_N = 500


def zipf_fit(docs: DataFrame, top_n: int = ZIPF_TOP_N) -> DataFrame:
    """Per-source Zipf's-law fit: OLS slope of ln(frequency) ~ ln(rank)
    over each source's top-N terms — natural text sits near −1, so the
    slope (with its R²) is a cheap distribution-level quality/anomaly
    probe per corpus slice (template spam flattens the head, boilerplate
    steepens it).

    Token counting is explode + one partial-aggregated groupBy (shuffle
    O(|vocab per source|)); ranking is a window PARTITIONED BY SOURCE —
    never global — and the frequency filter prunes to ≤N rows per source
    before the fit. The log-log co-moments would be engine-ordered float
    sums, so each ln is PRE-ROUNDED to 9 decimals and quantized to
    DECIMAL(18,9) (exact, order-free addition — the same portability
    trick as entropy_per_group), closing slope/R² in one rounded double
    tree per the agg_linreg pattern. At 100 TB every relation after the
    token groupBy is vocabulary-sized.
    """
    counts = (
        spread(docs, "doc_id")
        .select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "token")
    ranked = counts.select(
        "source", "n", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= top_n)
    # precision 18: x and y are multiplied before the sum (see dec9)
    x = dec9(F.log(F.col("rank").cast("double")), precision=18)
    y = dec9(F.log(F.col("n").cast("double")), precision=18)
    base = ranked.groupBy("source").agg(
        F.count("*").alias("n_terms"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n = F.col("n_terms").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return base.select(
        "source",
        "n_terms",
        F.when(vx != 0, F.round(cov / vx, 6)).alias("zipf_slope"),
        F.when(vx * vy != 0, F.round((cov * cov) / (vx * vy), 6)).alias("r2"),
    )


def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: Zipf slope per source over ``documents``."""
    return zipf_fit(load(spark, sf_dir, "documents"))


SQL_TEXT_ZIPF = f"""
    WITH counts AS (
        SELECT source, token, COUNT(*) AS n
        FROM (SELECT source, UNNEST({SQL_TOKENS.format(col='text')}) AS token
              FROM documents)
        GROUP BY source, token),
    ranked AS (
        SELECT source, n,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n DESC, token) AS rank
        FROM counts
        QUALIFY rank <= {ZIPF_TOP_N}),
    quant AS (
        SELECT source,
               CAST(ROUND(LN(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
               CAST(ROUND(LN(CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
        FROM ranked),
    base AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM quant GROUP BY source)
    SELECT source, n_terms,
           CASE WHEN CAST(n_terms AS DOUBLE) * sxx - sx * sx <> 0
                THEN ROUND((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                           / (CAST(n_terms AS DOUBLE) * sxx - sx * sx), 6)
           END AS zipf_slope,
           CASE WHEN (CAST(n_terms AS DOUBLE) * sxx - sx * sx)
                     * (CAST(n_terms AS DOUBLE) * syy - sy * sy) <> 0
                THEN ROUND((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                           * (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                           / ((CAST(n_terms AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n_terms AS DOUBLE) * syy - sy * sy)), 6)
           END AS r2
    FROM base
"""


HASHING_DIM = 16  # small vs the ~31-term synthetic vocab so collisions exist


def q_text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) collision audit: project the
    corpus vocabulary onto a fixed ``HASHING_DIM``-bucket feature space (deliberately small
    against the synthetic vocabulary so the collision arms are real)
    via the portable md5 hash and report, per occupied bucket, how many
    DISTINCT terms collide there and how much occurrence mass it
    carries — the number that decides whether the chosen dim suffices or the
    vectorizer needs orders more (collisions silently merge unrelated features
    into one weight).

    Token counting is the usual explode + vocabulary-sized groupBy; the
    bucket rollup is a second bounded aggregation (≤ HASHING_DIM rows).
    The hash is the engine-portable md5 prefix, so bucket assignment —
    and therefore the whole audit — is bit-identical in DuckDB. A real
    vectorizer keeps (doc_id, bucket, count) as its output; this audit
    is that relation's corpus-level profile.
    """
    from .llmdata import _portable_hash

    counts = (
        spread(load(spark, sf_dir, "documents"), "doc_id")
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occur"))
    )
    bucket = F.pmod(_portable_hash(F.col("token")), F.lit(HASHING_DIM)).cast("int")
    return (
        counts.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("n_occur").alias("n_occurrences"),
            F.min("token").alias("first_term"),
        )
    )


_TOK_MD5 = "('0x' || substr(md5(token), 1, 15))::BIGINT"

SQL_TEXT_FEATURE_HASHING = f"""
    WITH counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occur
        FROM (SELECT UNNEST({SQL_TOKENS.format(col='text')}) AS token
              FROM documents)
        GROUP BY token)
    SELECT CAST({_TOK_MD5} % {HASHING_DIM} AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(n_occur) AS BIGINT) AS n_occurrences,
           MIN(token) AS first_term
    FROM counts
    GROUP BY 1
"""


EDGE_TOKENS = 4  # header/footer window: first/last k tokens


def q_text_boilerplate_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated document HEADERS and FOOTERS — the scraped-data
    boilerplate mode (same banner / same signature across many pages)
    that whole-document dedup misses and passage mining only catches if
    the window happens to align. Fingerprint = md5 of the first/last
    ``EDGE_TOKENS`` tokens; report every edge shared by ≥2 documents
    with its span count and an example doc.

    Narrow slice + hash per doc, one vocabulary-of-edges-sized groupBy;
    the per-doc work is two array slices. Output is the boilerplate
    removal worklist (strip these prefixes/suffixes before training).
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = tokens(F.col("text"))
    # Footer start is clamped to 1: Spark's slice(toks, -k, k) returns []
    # when |toks| < k (md5('') — every short doc would falsely cluster as
    # one shared footer), while the oracle's toks[-k:] returns the whole
    # list. greatest(1, |toks|-k+1) makes both engines take the full
    # token list for short docs — the cross-engine exactness contract.
    footer_start = F.greatest(F.lit(1), F.size(toks) - F.lit(EDGE_TOKENS - 1))
    staged = docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(toks, 1, EDGE_TOKENS))).alias("header_fp"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(toks, footer_start, EDGE_TOKENS),
            )
        ).alias("footer_fp"),
    )
    edges = staged.select(
        "doc_id", F.lit("header").alias("edge"), F.col("header_fp").alias("fp")
    ).unionByName(
        staged.select(
            "doc_id", F.lit("footer").alias("edge"), F.col("footer_fp").alias("fp")
        )
    )
    return (
        edges.groupBy("edge", "fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("example_doc"))
        .filter(F.col("n_docs") >= 2)
    )


SQL_TEXT_BOILERPLATE = f"""
    WITH staged AS (
        SELECT doc_id,
               -- COALESCE: DuckDB's array_to_string([]) is NULL where
               -- Spark's concat_ws is '' — zero-token docs must hash to
               -- md5('') in both engines
               md5(COALESCE(array_to_string(toks[1:{EDGE_TOKENS}], ' '), ''))
                   AS header_fp,
               md5(COALESCE(array_to_string(toks[-{EDGE_TOKENS}:], ' '), ''))
                   AS footer_fp
        FROM (SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks
              FROM documents)),
    edges AS (
        SELECT doc_id, 'header' AS edge, header_fp AS fp FROM staged
        UNION ALL
        SELECT doc_id, 'footer' AS edge, footer_fp AS fp FROM staged)
    SELECT edge, fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS example_doc
    FROM edges GROUP BY edge, fp
    HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# unigram LM quality score (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram language-model score — the CCNet-style
    quality filter: train a unigram LM on the corpus itself (add-one
    smoothed), score every document by mean negative log-likelihood per
    token, and surface perplexity. Documents full of rare/garbled tokens
    score high (surprising under the corpus distribution) and get cut;
    this is the standard first statistical quality gate of a
    web-scale curation pipeline, one notch above heuristic ratios
    (`text_quality`) and far cheaper than a neural scorer.

    Two corpus passes, both collapsing early: (1) the unigram table —
    one partial-aggregated groupBy token (vocabulary-sized output);
    (2) per-doc (doc, token, tf) counts joined against the unigram
    table on token (vocabulary-sized build side, shuffle join — AQE
    broadcasts it when small) and one groupBy doc_id. The corpus-sized
    relations never meet each other, only the vocab relation. Exactness:
    each tf·ln p term is rounded to 9 decimals and summed as exact
    decimal (order-free — the dec9 portability rule), one double close.
    """
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    unigram = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    stats = unigram.agg(
        F.sum("cnt").alias("n_total"), F.count("*").alias("vocab")
    )
    ln_p = F.log(
        (F.col("cnt").cast("double") + F.lit(1.0))
        / (F.col("n_total").cast("double") + F.col("vocab").cast("double"))
    )
    term = dec9(F.col("tf").cast("double") * ln_p)
    per_doc = (
        tf.join(unigram, "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"), F.sum(term).alias("s"))
    )
    nll = -(F.col("s").cast("double")) / F.col("n_tokens").cast("double")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(nll, 6).alias("nll_per_token"),
        F.round(F.exp(nll), 4).alias("ppl"),
    )


SQL_TEXT_UNIGRAM_LOGPROB = f"""
    WITH tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, UNNEST({{toks}}) AS token FROM documents)
        GROUP BY doc_id, token),
    unigram AS (
        SELECT token, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY token),
    stats AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM unigram),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               SUM(CAST(ROUND(CAST(tf AS DOUBLE)
                              * LN((CAST(cnt AS DOUBLE) + 1.0)
                                   / (CAST(n_total AS DOUBLE)
                                      + CAST(vocab AS DOUBLE))), 9)
                        AS DECIMAL(28,9))) AS s
        FROM tf JOIN unigram USING (token) CROSS JOIN stats
        GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           ROUND(-(CAST(s AS DOUBLE)) / CAST(n_tokens AS DOUBLE), 6)
               AS nll_per_token,
           ROUND(EXP(-(CAST(s AS DOUBLE)) / CAST(n_tokens AS DOUBLE)), 4)
               AS ppl
    FROM per_doc
"""


def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, table A1) —
    the heuristic gate every web-scale curation pipeline runs before any
    statistical or neural scorer: word-count bounds, mean-word-length
    bounds, symbol-to-word ratio ('#' and '...' artifacts), fraction of
    words containing an alphabetic character, and the required-stopword
    rule (>= 2 distinct hits from the 8-word list). Emits the per-doc
    feature values plus the composite ``keep`` verdict so downstream
    mixes can re-threshold without recomputing.

    Pure narrow map over (doc_id, text) — one scan partition-parallel
    pass, everything inside whole-stage codegen (split / filter /
    array_intersect / replace are all JVM higher-order functions), no
    shuffle at all: the 100 TB cost is exactly one read of the text
    column. Ratio guards follow the engine-wide rule: an empty/
    whitespace-only doc yields NULL ratios and keep=false on both
    engines (false AND NULL = false in 3-valued logic, so ``keep``
    itself is never NULL)."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks"), "text")
    n_words = F.size("toks")
    word_chars = F.length(F.regexp_replace(F.col("text"), WS_CLASS, ""))
    n_hash = F.length("text") - F.length(F.regexp_replace(F.col("text"), "#", ""))
    n_ellipsis = F.expr("(length(text) - length(replace(text, '...', ''))) div 3")
    alpha_words = F.size(F.filter(F.col("toks"), lambda t: t.rlike("[a-zA-Z]")))
    stop_hits = F.size(
        F.array_intersect(F.col("toks"), F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    has_words = n_words > 0
    mean_word_len = F.when(has_words, F.round(word_chars / n_words, 6))
    symbol_ratio = F.when(has_words, F.round((n_hash + n_ellipsis) / n_words, 6))
    alpha_ratio = F.when(has_words, F.round(alpha_words / n_words, 6))
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (symbol_ratio < 0.1)
        & (alpha_ratio > 0.8)
        & (stop_hits >= 2)
    )
    return base.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000

SQL_TEXT_GOPHER_RULES = f"""
    WITH t AS (
        SELECT doc_id,
               {SQL_TOKENS.format(col='text')} AS toks,
               LENGTH(REGEXP_REPLACE(text, '{WS_CLASS}', '', 'g')) AS word_chars,
               LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '#', '', 'g')) AS n_hash,
               (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3 AS n_ell
        FROM documents),
    feat AS (
        SELECT doc_id,
               CAST(LEN(toks) AS INTEGER) AS n_words,
               CASE WHEN LEN(toks) > 0 THEN
                   ROUND(word_chars * 1.0 / LEN(toks), 6) END AS mean_word_len,
               CASE WHEN LEN(toks) > 0 THEN
                   ROUND((n_hash + n_ell) * 1.0 / LEN(toks), 6) END AS symbol_ratio,
               CASE WHEN LEN(toks) > 0 THEN
                   ROUND(LEN(LIST_FILTER(toks, x -> regexp_matches(x, '[a-zA-Z]')))
                         * 1.0 / LEN(toks), 6) END AS alpha_word_ratio,
               CAST(LEN(LIST_INTERSECT(toks, [{_STOP_SQL}])) AS INTEGER) AS stop_hits
        FROM t)
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
           stop_hits,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
            AND mean_word_len >= 3 AND mean_word_len <= 10
            AND symbol_ratio < 0.1 AND alpha_word_ratio > 0.8
            AND stop_hits >= 2) AS keep
    FROM feat
"""


# ---------------------------------------------------------------------------
# cross-document line dedup (RefinedWeb-style line-wise correction)
# ---------------------------------------------------------------------------

LINE_DUP_MIN_DOCS = 2


def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level cross-document deduplication — the RefinedWeb /
    MassiveText "line-wise correction" (Penedo et al. 2023; Rae et al.
    2021): a non-blank line occurring in ≥ LINE_DUP_MIN_DOCS distinct
    documents is boilerplate (nav bars, cookie banners, signatures) and
    is cut from EVERY document; blank lines never participate. The
    transform sibling of the detection ops (`text_common_passages` finds
    repeated passages, `text_boilerplate_edges` repeated headers/
    footers) — this one emits the cleaned text. Production deployments
    raise the threshold / use an occurrence fraction; the knob is the
    module constant.

    Plan: one newline posexplode; duplicated lines found by one
    groupBy over the 60-bit portable line hash (8-byte shuffle keys,
    the dedup-family width trick; countDistinct partial-aggregates);
    one hash join back; one groupBy(doc_id) whose collect_list gathers
    only survivors — the same ordered-stitch machinery as
    `llm_substring_clean`/`text_c4_rules`, single consumer chain.
    Every doc reaches the output through the stitch groupBy itself
    (split() yields ≥1 line even for empty text), so there is no
    join-back to documents at all."""
    from .llmdata import _portable_hash

    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", "\n", -1)).alias("pos", "line"),
    ).withColumn("lh", _portable_hash(F.col("line")))
    dup = (
        lines.filter(F.trim("line") != "")
        .groupBy("lh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= LINE_DUP_MIN_DOCS)
        .select("lh")
    )
    marked = lines.join(
        dup.withColumn("hit", F.lit(True)), "lh", "left"
    ).select(
        "doc_id",
        "pos",
        "line",
        ((F.trim("line") != "") & F.col("hit").isNotNull()).alias("removed"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("removed").cast("long")).alias("n_removed_lines"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("removed"), F.struct("pos", "line"))
                    )
                ),
                lambda st: st["line"],
            ),
            "\n",
        ).alias("cleaned_text"),
    )


SQL_TEXT_LINE_DEDUP = f"""
    WITH ls AS (
        SELECT doc_id, string_split(text, chr(10)) AS arr FROM documents),
    lines AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos, arr[i] AS line,
               ('0x' || substr(md5(arr[i]), 1, 15))::BIGINT AS lh
        FROM ls, LATERAL UNNEST(generate_series(1, LEN(arr))) t(i)),
    dup AS (
        SELECT lh FROM lines WHERE TRIM(line) <> ''
        GROUP BY lh HAVING COUNT(DISTINCT doc_id) >= {LINE_DUP_MIN_DOCS}),
    marked AS (
        SELECT l.doc_id, l.pos, l.line,
               (TRIM(l.line) <> '' AND d.lh IS NOT NULL) AS removed
        FROM lines l LEFT JOIN dup d ON l.lh = d.lh)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed_lines,
           COALESCE(STRING_AGG(CASE WHEN NOT removed THEN line END,
                               chr(10) ORDER BY pos), '') AS cleaned_text
    FROM marked GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# CCNet head/middle/tail quality buckets (Wenzek et al. 2020)
# ---------------------------------------------------------------------------


def q_text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's quality bucketing (Wenzek et al. 2020, "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data"): per
    language, rank documents by LM score (best = lowest perplexity
    first) and split them into head / middle / tail buckets of roughly
    equal TOKEN mass — the partition CCNet publishes and downstream
    pipelines sample from (head for quality, middle for volume, tail
    usually dropped).

    Composes the already-oracle-checked unigram LM
    (:func:`q_text_unigram_logprob` — CCNet's KenLM stand-in) with a
    metadata-only lang join (`load_meta` — the text column is read only
    by the LM pass) and one window pass per language: inclusive
    running token sum vs. the language total, thresholds evaluated in
    INTEGER arithmetic (3·cum ≤ tot, 3·cum ≤ 2·tot) so bucket edges are
    exact on both engines — no float division anywhere. Per-language
    windows parallelize across languages; within one language the
    running sum is a single sort-merge pass (same caveat + shard story
    as `pack_sequences`). Zero-token docs carry no LM score and are
    absent, mirroring CCNet (nothing to rank)."""
    scored = q_text_unigram_logprob(spark, sf_dir)
    d = scored.join(load_meta(spark, sf_dir, "documents", "lang"), "doc_id")
    wl = Window.partitionBy("lang")
    cum = F.sum("n_tokens").over(
        wl.orderBy("nll_per_token", "doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    tot = F.sum("n_tokens").over(wl)
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        "nll_per_token",
        F.when(F.lit(3) * cum <= tot, "head")
        .when(F.lit(3) * cum <= F.lit(2) * tot, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def _ccnet_buckets_sql() -> str:
    base = SQL_TEXT_UNIGRAM_LOGPROB.format(toks=SQL_TOKENS.format(col="text"))
    return f"""
    SELECT doc_id, lang, n_tokens, nll_per_token,
           CASE WHEN 3 * cum <= tot THEN 'head'
                WHEN 3 * cum <= 2 * tot THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM (
        SELECT b.doc_id, doc.lang, b.n_tokens, b.nll_per_token,
               SUM(b.n_tokens) OVER (
                   PARTITION BY doc.lang
                   ORDER BY b.nll_per_token, b.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(b.n_tokens) OVER (PARTITION BY doc.lang) AS tot
        FROM ({base}) b
        JOIN documents doc ON b.doc_id = doc.doc_id)
"""


# ---------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 — line-level web-text cleaning)
# ---------------------------------------------------------------------------

C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def q_text_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning pipeline (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning…", §2.2) — the line-level complement to
    `text_gopher_rules`' doc-level gate, and the other most-cited public
    web-curation recipe. Line rules: keep a line only if it ends in a
    terminal punctuation mark (period/!/?/closing quote), has ≥ 5 words,
    and does not mention "javascript". Page rules: keep the page only
    if the cleaned text still has ≥ 3 sentences (terminal-punct count)
    and the ORIGINAL page contains neither "lorem ipsum" nor "{" (the
    paper's code-page heuristic). Emits the per-doc accounting plus the
    cleaned text (kept lines rejoined with newlines, original order).

    Plan: one posexplode of the newline split (doc-level lorem/brace
    flags ride along and come back via first() — functionally dependent
    on doc_id, no join back to documents), per-line predicates all JVM
    string ops inside codegen, one groupBy(doc_id) whose collect_list
    gathers ONLY kept lines (when() nulls drop out), ordered stitch via
    array_sort — the same reassembly machinery as llm_substring_clean.
    One shuffle total, carrying only kept lines; scales as a pure
    per-doc map. Word counts use the shared explicit-whitespace grammar
    (WS_CLASS); sentence counting is the length-difference idiom, exact
    on both engines."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    lines = docs.select(
        "doc_id",
        F.lower(F.col("text")).contains("lorem ipsum").alias("has_lorem"),
        F.col("text").contains("{").alias("has_brace"),
        F.posexplode(F.split("text", "\n", -1)).alias("pos", "line"),
    )
    n_words = F.size(
        F.filter(
            F.split(F.lower(F.col("line")), WS_CLASS + "+"), lambda x: x != ""
        )
    )
    kept = (
        F.expr("right(rtrim(line), 1)").isin(".", "!", "?", '"')
        & (n_words >= C4_MIN_LINE_WORDS)
        & ~F.lower(F.col("line")).contains("javascript")
    )
    per_doc = (
        lines.withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("kept").cast("long")).alias("n_kept_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("pos", "line"))
                        )
                    ),
                    lambda st: st["line"],
                ),
                "\n",
            ).alias("cleaned_text"),
            F.first("has_lorem").alias("has_lorem"),
            F.first("has_brace").alias("has_brace"),
        )
    )
    n_sent = (
        F.length("cleaned_text")
        - F.length(F.regexp_replace("cleaned_text", "[.!?]", ""))
    ).cast("int")
    return per_doc.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        n_sent.alias("n_sentences"),
        (
            (n_sent >= C4_MIN_SENTENCES)
            & ~F.col("has_lorem")
            & ~F.col("has_brace")
        ).alias("keep"),
        "cleaned_text",
    )


SQL_TEXT_C4_RULES = f"""
    WITH ls AS (
        SELECT doc_id, text, string_split(text, chr(10)) AS arr
        FROM documents),
    lines AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos, arr[i] AS line,
               contains(lower(text), 'lorem ipsum') AS has_lorem,
               contains(text, '{{') AS has_brace
        FROM ls, LATERAL UNNEST(generate_series(1, LEN(arr))) t(i)),
    flags AS (
        SELECT doc_id, pos, line, has_lorem, has_brace,
               (right(rtrim(line), 1) IN ('.', '!', '?', '"')
                AND LEN(list_filter(string_split_regex(lower(line),
                        '{WS_CLASS}+'), x -> x <> ''))
                    >= {C4_MIN_LINE_WORDS}
                AND NOT contains(lower(line), 'javascript')) AS kept
        FROM lines),
    perdoc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept_lines,
               COALESCE(STRING_AGG(CASE WHEN kept THEN line END,
                                   chr(10) ORDER BY pos), '')
                   AS cleaned_text,
               BOOL_OR(has_lorem) AS has_lorem,
               BOOL_OR(has_brace) AS has_brace
        FROM flags GROUP BY doc_id)
    SELECT doc_id, n_lines, n_kept_lines,
           CAST(LENGTH(cleaned_text)
                - LENGTH(REGEXP_REPLACE(cleaned_text, '[.!?]', '', 'g'))
                AS INTEGER) AS n_sentences,
           (LENGTH(cleaned_text)
                - LENGTH(REGEXP_REPLACE(cleaned_text, '[.!?]', '', 'g'))
                >= {C4_MIN_SENTENCES}
            AND NOT has_lorem AND NOT has_brace) AS keep,
           cleaned_text
    FROM perdoc
"""


RAKE_TOP_K = 3  # phrases kept per document


def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): per document, the
    top-{RAKE_TOP_K} candidate phrases by the degree/frequency word
    score — the unsupervised keyword miner curation stacks run beside
    TF-IDF (which needs the corpus; RAKE scores within one document).

    Spec (shared verbatim with the oracle): whitespace tokens via the
    repo token grammar; a token BREAKS phrases iff it is a stopword or
    contains any non-[a-z0-9] character (RAKE's punctuation split);
    maximal runs of non-break tokens are candidate phrases (islands
    trick: pos − row_number, no self-join); within a document
    deg(w) = Σ phrase_len over w's phrase occurrences, freq(w) = its
    occurrence count, score(phrase) = Σ deg(w)/freq(w) over members
    with multiplicity. Ranking: score desc, phrase asc; duplicate
    phrase texts in one doc collapse to one row with n_occurrences.

    Scale shape: every exchange is doc-keyed — the posexplode feeds one
    (doc | pos) window for islands, word stats are a (doc, word)
    partial-agg groupBy joined back co-partitioned, phrase assembly is a
    (doc, island) groupBy, and the top-k is a WindowGroupLimit-pushed
    rank. Nothing corpus-global exists, so 100 TB partitions embarrass-
    ingly by document. Exactness: deg/freq are exact integers; each
    word score is ONE IEEE division dec9-quantized before the exact
    decimal phrase sum; final score rounded once."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    stop = F.col("tok").isin(*STOPWORDS) | F.col("tok").rlike("[^a-z0-9]")
    members = toks.filter(~stop)
    wisl = Window.partitionBy("doc_id").orderBy("pos")
    ph = members.withColumn(
        "island", F.col("pos") - F.row_number().over(wisl)
    )
    # phrase length rides the island window so the word-stat rows carry
    # it without re-aggregating phrases first
    wph = Window.partitionBy("doc_id", "island")
    ph = ph.withColumn("phrase_len", F.count("*").over(wph))
    wstats = (
        ph.groupBy("doc_id", "tok")
        .agg(
            F.sum("phrase_len").alias("deg"),
            F.count("*").alias("freq"),
        )
        .select(
            "doc_id",
            "tok",
            dec9(F.col("deg") / F.col("freq"), 18).alias("wscore"),
        )
    )
    scored = (
        ph.join(wstats, ["doc_id", "tok"])
        .groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda st: st["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.first("phrase_len").alias("n_words"),
            F.sum("wscore").cast("double").alias("score"),
        )
        .groupBy("doc_id", "phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.first("n_words").alias("n_words"),
            F.first("score").alias("score"),
        )
    )
    wtop = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("phrase")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= RAKE_TOP_K)
        .select(
            "doc_id",
            "rank",
            "phrase",
            F.col("n_words").cast("int").alias("n_words"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.round("score", 6).alias("score"),
        )
    )


SQL_TEXT_RAKE = f"""
    WITH toks AS (
        SELECT doc_id, i AS pos, arr[i] AS tok
        FROM (SELECT doc_id, {SQL_TOKENS.format(col="text")} AS arr
              FROM documents) ls,
             LATERAL UNNEST(generate_series(1, LEN(arr))) t(i)),
    members AS (
        SELECT doc_id, pos, tok FROM toks
        WHERE NOT (tok IN ({_STOP_SQL}) OR regexp_matches(tok, '[^a-z0-9]'))),
    ph AS (
        SELECT doc_id, pos, tok,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM members),
    ph2 AS (
        SELECT doc_id, pos, tok, island,
               COUNT(*) OVER (PARTITION BY doc_id, island) AS phrase_len
        FROM ph),
    wstats AS (
        SELECT doc_id, tok,
               CAST(ROUND(CAST(SUM(phrase_len) AS DOUBLE) / COUNT(*), 9)
                    AS DECIMAL(18,9)) AS wscore
        FROM ph2 GROUP BY doc_id, tok),
    phrases AS (
        SELECT p.doc_id, p.island,
               STRING_AGG(p.tok, ' ' ORDER BY p.pos) AS phrase,
               CAST(MAX(p.phrase_len) AS BIGINT) AS n_words,
               CAST(SUM(w.wscore) AS DOUBLE) AS score
        FROM ph2 p JOIN wstats w
          ON p.doc_id = w.doc_id AND p.tok = w.tok
        GROUP BY p.doc_id, p.island),
    collapsed AS (
        SELECT doc_id, phrase,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MAX(n_words) AS INTEGER) AS n_words,
               MAX(score) AS score
        FROM phrases GROUP BY doc_id, phrase)
    SELECT doc_id, rank, phrase, n_words, n_occurrences,
           ROUND(score, 6) AS score
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, phrase) AS INTEGER) AS rank
        FROM collapsed)
    WHERE rank <= {RAKE_TOP_K}
"""


KN_DISCOUNT = 0.75  # the standard absolute-discount value (Chen & Goodman)


def q_text_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interpolated Kneser–Ney bigram perplexity (Kneser &
    Ney 1995; Chen & Goodman 1998) — the proper smoothed-LM quality
    score, one notch above the add-one unigram gate
    (:func:`q_text_unigram_logprob`); CCNet's actual filter is a KenLM
    n-gram LM, and the bigram KN here is its exact low-order form:

        P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁) + λ(w₁)·P_cont(w₂)
        λ(w₁)    = D·N₁₊(w₁·)/c(w₁)
        P_cont(w₂) = N₁₊(·w₂)/N₁₊(··)

    The LM trains on the corpus itself and scores the same corpus, so
    every scored bigram is seen and P > 0 totally (the first term is
    ≥ (1−D)/c(w₁) for seen pairs) — no <unk> machinery needed.

    CAVEAT (semantics, not correctness): self-training makes this a
    TYPICALITY score — low perplexity flags corpus-typical
    (boilerplate-like) text, not high-quality text. CCNet's actual
    filter trains on a target-domain corpus (Wikipedia) and scores the
    crawl; that semantics is :func:`q_text_kn_quality`, which trains
    the same model on the ``lang='{KN_TARGET_LANG}'`` slice and scores
    everything against it with <unk> backoff.

    Scale shape: one doc-keyed lead() window builds bigram instances;
    instance counts collapse per (doc, w₁, w₂) BEFORE the model join;
    the model is three partial-agg rollups over the bigram-TYPE
    relation (vocabulary-bounded): context totals + forward-distinct
    per w₁, continuation-distinct per w₂, and the 1-row type total as a
    broadcast. The per-doc scoring join keys on (w₁, w₂) against the
    type-sized probability relation — corpus-sized relations never meet
    each other. Exactness: every arithmetic term is forced to DOUBLE on
    both engines (DuckDB would otherwise do bigint−DECIMAL in decimal
    arithmetic), each tf·ln P term is dec9-pre-rounded, and the per-doc
    sum is an exact decimal. Docs with <2 tokens have no bigrams and
    drop from the output on both engines."""
    D = KN_DISCOUNT
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w")
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    inst = (
        toks.withColumn("w2", F.lead("w").over(wl))
        .filter(F.col("w2").isNotNull())
        .groupBy("doc_id", F.col("w").alias("w1"), "w2")
        .agg(F.count("*").alias("tf"))
    )
    # checkpoint the vocabulary-bounded TYPE relation: ctx/cont/tot/p
    # all consume it under different shapes, and without the cut the
    # corpus tokenization re-evaluates FIVE times (ReuseExchange cannot
    # unify the differing consumers — the r8 llm_substring_clean
    # lesson). With it: two corpus passes total (model build + scoring
    # join), everything else vocabulary-sized.
    types = (
        inst.groupBy("w1", "w2")
        .agg(F.sum("tf").alias("c12"))
        .localCheckpoint()
    )
    ctx = types.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_fwd")
    )
    cont = types.groupBy("w2").agg(F.count("*").alias("n_bwd"))
    tot = types.agg(F.count("*").alias("n_types"))
    p = (
        types.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            (
                F.greatest(
                    F.col("c12").cast("double") - F.lit(D), F.lit(0.0)
                )
                / F.col("c1").cast("double")
                + (
                    F.lit(D)
                    * F.col("n_fwd").cast("double")
                    / F.col("c1").cast("double")
                )
                * (
                    F.col("n_bwd").cast("double")
                    / F.col("n_types").cast("double")
                )
            ).alias("p"),
        )
    )
    term = dec9(F.col("tf").cast("double") * F.log(F.col("p")))
    per_doc = (
        inst.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_bigrams"), F.sum(term).alias("s"))
    )
    # + 0.0 normalizes IEEE negative zero: an all-seen-bigram doc has
    # s = 0 and -(0.0)/n is -0.0 in DuckDB but +0.0 through Spark's
    # round — the one value repr-hashing distinguishes (r10 fuzz sweep)
    nll = -(F.col("s").cast("double")) / F.col("n_bigrams").cast("double") + F.lit(0.0)
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round(nll, 6).alias("nll_per_bigram"),
        F.round(F.exp(nll), 4).alias("ppl"),
    )


SQL_TEXT_KN_PERPLEXITY = f"""
    WITH ls AS (
        SELECT doc_id, {SQL_TOKENS.format(col="text")} AS arr
        FROM documents),
    inst AS (
        SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM ls, LATERAL UNNEST(generate_series(1, LEN(arr) - 1)) t(i)
        GROUP BY 1, 2, 3),
    types AS (
        SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12
        FROM inst GROUP BY w1, w2),
    ctx AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n_fwd
        FROM types GROUP BY w1),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_bwd
        FROM types GROUP BY w2),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM types),
    p AS (
        SELECT w1, w2,
               GREATEST(CAST(c12 AS DOUBLE) - {KN_DISCOUNT}, 0.0)
                   / CAST(c1 AS DOUBLE)
               + ({KN_DISCOUNT} * CAST(n_fwd AS DOUBLE)
                  / CAST(c1 AS DOUBLE))
                 * (CAST(n_bwd AS DOUBLE) / CAST(n_types AS DOUBLE)) AS p
        FROM types JOIN ctx USING (w1) JOIN cont USING (w2)
        CROSS JOIN tot),
    per_doc AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               SUM(CAST(ROUND(CAST(tf AS DOUBLE) * LN(p), 9)
                        AS DECIMAL(28,9))) AS s
        FROM inst JOIN p USING (w1, w2)
        GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           ROUND(-CAST(s AS DOUBLE) / CAST(n_bigrams AS DOUBLE) + 0.0, 6)
               AS nll_per_bigram,
           ROUND(EXP(-CAST(s AS DOUBLE) / CAST(n_bigrams AS DOUBLE) + 0.0), 4)
               AS ppl
    FROM per_doc
"""


KN_TARGET_LANG = "en"  # the CCNet target-domain slice (corpus_dsir's too)


def q_text_kn_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-semantics quality filter (Wenzek et al. 2020): train the
    interpolated Kneser–Ney bigram LM of :func:`q_text_kn_perplexity`
    on a TARGET-domain slice (the ``lang='{KN_TARGET_LANG}'`` stratum —
    the same target :func:`corpus_dsir` uses) and score EVERY document
    against it. High perplexity = out-of-domain; this is quality
    filtering proper, where the self-trained variant measures only
    corpus-typicality. CCNet trains KenLM on Wikipedia and scores the
    crawl; the bigram KN here is the exact low-order form.

    Scoring a corpus the model was not trained on needs <unk>/backoff
    handling, done so Σ P(·|w₁) stays EXACTLY 1 (pinned in
    tests/test_kn_lm.py): the continuation distribution is add-one
    smoothed over V+1 outcomes (V = distinct target continuations, +1
    = the reserved <unk> type every target-OOV word maps to):

        P'_cont(w₂) = (N₁₊(·w₂) + 1) / (N₁₊(··) + V + 1)   [OOV: N₁₊=0]
        P(w₂|w₁)    = max(c(w₁w₂)−D, 0)/c(w₁) + λ(w₁)·P'_cont(w₂)
                      if c(w₁) > 0, else P'_cont(w₂)

    The discounted mass telescopes exactly as in standard KN (the seen
    terms sum to 1−λ, the smoothed continuation sums to 1), and the
    unseen-context arm is itself a proper distribution, so every
    conditional normalizes — and P > 0 totally, since the smoothed
    continuation floor is ≥ 1/(N₁₊(··)+V+1).

    Scale shape: identical cost contract to the self-trained operator —
    the target's bigram-TYPE relation is localCheckpointed (its three
    vocabulary-bounded rollups and the scoring join all consume it; the
    cut holds corpus passes at two: model build + scoring), scoring
    joins key on w₁ / (w₁,w₂) / w₂ against type-sized relations, and
    corpus-sized relations never meet. An empty target slice degrades
    totally: every score falls to the uniform floor (P = 1, ppl = 1),
    no crash. Exactness: all terms forced DOUBLE on both engines, one
    shared IEEE tree per arm, dec9 log terms, exact-decimal per-doc
    sums. n_unseen counts bigram instances whose PAIR is outside the
    target model — the OOV-rate column a curation pass thresholds
    alongside ppl."""
    D = KN_DISCOUNT
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(tokens(F.col("text"))).alias("pos", "w"),
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    inst = (
        toks.withColumn("w2", F.lead("w").over(wl))
        .filter(F.col("w2").isNotNull())
        .groupBy("doc_id", "lang", F.col("w").alias("w1"), "w2")
        .agg(F.count("*").alias("tf"))
    )
    ttypes = (
        inst.filter(F.col("lang") == KN_TARGET_LANG)
        .groupBy("w1", "w2")
        .agg(F.sum("tf").alias("c12"))
        .localCheckpoint()
    )
    tctx = ttypes.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_fwd")
    )
    tcont = ttypes.groupBy("w2").agg(F.count("*").alias("n_bwd"))
    ttot = ttypes.agg(
        F.count("*").alias("n_types"), F.count_distinct("w2").alias("v")
    )
    scored = (
        inst.join(tctx, ["w1"], "left")
        .join(ttypes, ["w1", "w2"], "left")
        .join(tcont, ["w2"], "left")
        .crossJoin(F.broadcast(ttot))
    )
    pcont = (F.coalesce(F.col("n_bwd"), F.lit(0)).cast("double") + F.lit(1.0)) / (
        F.col("n_types").cast("double") + F.col("v").cast("double") + F.lit(1.0)
    )
    seen_p = (
        F.greatest(
            F.coalesce(F.col("c12"), F.lit(0)).cast("double") - F.lit(D),
            F.lit(0.0),
        )
        / F.col("c1").cast("double")
        + (F.lit(D) * F.col("n_fwd").cast("double") / F.col("c1").cast("double"))
        * pcont
    )
    p = F.when(F.col("c1").isNotNull(), seen_p).otherwise(pcont)
    term = dec9(F.col("tf").cast("double") * F.log(p))
    unseen = F.when(F.col("c12").isNull(), F.col("tf")).otherwise(F.lit(0))
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.sum("tf").alias("n_bigrams"),
        F.sum(unseen).cast("long").alias("n_unseen"),
        F.sum(term).alias("s"),
    )
    # + 0.0 normalizes IEEE negative zero: an all-seen-bigram doc has
    # s = 0 and -(0.0)/n is -0.0 in DuckDB but +0.0 through Spark's
    # round — the one value repr-hashing distinguishes (r10 fuzz sweep)
    nll = -(F.col("s").cast("double")) / F.col("n_bigrams").cast("double") + F.lit(0.0)
    return per_doc.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "n_unseen",
        F.round(nll, 6).alias("nll_per_bigram"),
        F.round(F.exp(nll), 4).alias("ppl"),
    )


_SQL_KN_PCONT = (
    "(CAST(COALESCE(n_bwd, 0) AS DOUBLE) + 1.0)"
    " / (CAST(n_types AS DOUBLE) + CAST(v AS DOUBLE) + 1.0)"
)

SQL_TEXT_KN_QUALITY = f"""
    WITH ls AS (
        SELECT doc_id, lang, {SQL_TOKENS.format(col="text")} AS arr
        FROM documents),
    inst AS MATERIALIZED (
        SELECT doc_id, lang, arr[i] AS w1, arr[i + 1] AS w2,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM ls, LATERAL UNNEST(generate_series(1, LEN(arr) - 1)) t(i)
        GROUP BY 1, 2, 3, 4),
    ttypes AS MATERIALIZED (
        SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12
        FROM inst WHERE lang = '{KN_TARGET_LANG}' GROUP BY w1, w2),
    tctx AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n_fwd
        FROM ttypes GROUP BY w1),
    tcont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_bwd
        FROM ttypes GROUP BY w2),
    ttot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
                    CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM ttypes),
    scored AS (
        SELECT i.doc_id, i.lang, i.tf, t.c12, c.c1, c.n_fwd, n.n_bwd,
               tt.n_types, tt.v
        FROM inst i
        LEFT JOIN tctx c ON i.w1 = c.w1
        LEFT JOIN ttypes t ON i.w1 = t.w1 AND i.w2 = t.w2
        LEFT JOIN tcont n ON i.w2 = n.w2
        CROSS JOIN ttot tt),
    per_doc AS (
        SELECT doc_id, lang, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN c12 IS NULL THEN tf ELSE 0 END)
                    AS BIGINT) AS n_unseen,
               SUM(CAST(ROUND(CAST(tf AS DOUBLE) * LN(
                   CASE WHEN c1 IS NOT NULL THEN
                       GREATEST(CAST(COALESCE(c12, 0) AS DOUBLE)
                                - {KN_DISCOUNT}, 0.0)
                           / CAST(c1 AS DOUBLE)
                       + ({KN_DISCOUNT} * CAST(n_fwd AS DOUBLE)
                          / CAST(c1 AS DOUBLE))
                         * {_SQL_KN_PCONT}
                   ELSE {_SQL_KN_PCONT}
                   END), 9) AS DECIMAL(28,9))) AS s
        FROM scored GROUP BY 1, 2)
    SELECT doc_id, lang, n_bigrams, n_unseen,
           ROUND(-CAST(s AS DOUBLE) / CAST(n_bigrams AS DOUBLE) + 0.0, 6)
               AS nll_per_bigram,
           ROUND(EXP(-CAST(s AS DOUBLE) / CAST(n_bigrams AS DOUBLE) + 0.0), 4)
               AS ppl
    FROM per_doc
"""


# ---------------------------------------------------------------------------
# unigram-LM tokenizer trainer (SentencePiece-unigram, Kudo 2018)
# ---------------------------------------------------------------------------

UNI_PIECE_MAX = 4  # max candidate-piece length (chars)
UNI_WORD_MAX = 8  # words truncate to this many chars for the lattice
UNI_EM_ROUNDS = 2  # unrolled full EM rounds (fixed — no convergence loop)
UNI_VOCAB_K = 48  # emitted vocabulary size (top-K by expected count)
# Kudo 2018 §3.2 vocabulary-pruning schedule (VERDICT r12 item 3): after
# the seed EM rounds, alternate PRUNE (keep the top-k multi-char pieces
# by expected count — the lowest-contribution pieces drop; single-char
# pieces are never pruned, SentencePiece's required-character rule, so
# every word stays coverable) with one re-EM round that redistributes
# the dropped pieces' mass. Budgets are the multi-char keep counts per
# round (the shrink schedule toward the target vocabulary).
UNI_PRUNE_TARGETS = (256, 96)


def _uni_compositions() -> list[list[int]]:
    """Every ordered composition of n ∈ [1, UNI_WORD_MAX] into parts of
    size ≤ UNI_PIECE_MAX — the complete segmentation lattice of a
    (truncated) word, enumerated ONCE driver-side as a constant. 223
    compositions for (8, 4); the count is a function of two small fixed
    hyperparameters, never of the data."""
    out: list[list[int]] = []

    def rec(rem: int, acc: list[int]) -> None:
        if rem == 0:
            out.append(list(acc))
            return
        for piece in range(1, min(UNI_PIECE_MAX, rem) + 1):
            rec(rem - piece, acc + [piece])

    for n in range(1, UNI_WORD_MAX + 1):
        rec(n, [])
    return out


def _uni_comp_rows() -> list[tuple[int, str, int, int, int]]:
    """(n, seg, part_idx, j, l) rows of the composition lattice; ``seg``
    is the comma-joined part-length string — the same key the oracle
    derives by splitting the identical literal list, so the two engines
    group segmentations identically by construction."""
    rows = []
    for parts in _uni_compositions():
        seg = ",".join(map(str, parts))
        j = 0
        for k, piece_len in enumerate(parts):
            rows.append((sum(parts), seg, k + 1, j, piece_len))
            j += piece_len
    return rows


def _uni_prod(cols: list[F.Column]) -> F.Column:
    """Fixed left-to-right product of per-part probabilities (missing
    parts contribute the multiplicative identity) — one IEEE tree, the
    same associativity the oracle's literal a*b*...*h parse yields, so
    the segmentation probability is bit-identical without any decimal
    quantization inside the product."""
    out = F.coalesce(cols[0], F.lit(1.0))
    for c in cols[1:]:
        out = out * F.coalesce(c, F.lit(1.0))
    return out


def _uni_words(docs: DataFrame) -> DataFrame:
    """(w, cw, n): distinct UNI_WORD_MAX-truncated words with corpus
    counts — the ONE corpus-sized pass the unigram family makes."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .select(F.substring("t", 1, UNI_WORD_MAX).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
        .withColumn("n", F.length("w").cast("int"))
    )


def _uni_seg_probs(segp: DataFrame, p: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., sp): per-segmentation probability — pivot the ≤8 part
    probabilities (MAX of one value per part, order-free) and multiply
    in fixed left-to-right IEEE order (identical to the oracle's
    literal a*b*...*h parse)."""
    terms = segp.join(F.broadcast(p), "piece")
    return terms.groupBy(*keys).agg(
        *[
            F.max(F.when(F.col("part_idx") == k, F.col("p"))).alias(f"p{k}")
            for k in range(1, UNI_WORD_MAX + 1)
        ]
    ).select(
        *keys,
        _uni_prod(
            [F.col(f"p{k}") for k in range(1, UNI_WORD_MAX + 1)]
        ).alias("sp"),
    )


def _unigram_tokenizer_build(
    spark: SparkSession, docs: DataFrame, prune: bool = True
) -> DataFrame:
    """The training dataflow behind :func:`q_text_unigram_tokenizer`
    (uncached): seed from substring counts, run UNI_EM_ROUNDS unrolled
    full-EM rounds over the composition lattice, emit the top-K report.

    Unigram-LM training (Kudo 2018) needs, per word, the total
    likelihood over ALL segmentations and each piece's expected count —
    normally a forward-backward DP over character positions. Words here
    are TRUNCATED to UNI_WORD_MAX chars (SentencePiece's own trainer
    caps piece/sentence lengths the same way), which makes the full
    segmentation lattice a 223-row driver-side CONSTANT — so the E-step
    becomes pure relational algebra: words ⨝ lattice ⨝ broadcast piece
    probabilities, one ≤8-column pivot per segmentation (MAX of a
    single value per part — order-free), a fixed-order IEEE product,
    and decimal(28,12) sums for the order-free totals. No per-position
    iteration, no UDF, no driver loop over data.

    Scale shape: the corpus contributes ONE token-count pass (the
    ``words`` rollup); everything after is vocabulary-bounded — |V|
    distinct truncated words × ~25 lattice part-rows. At 100 TB the
    vocab relation is millions of rows against a corpus of trillions of
    tokens; the EM rounds never touch the corpus again. Exactness: the
    within-segmentation product is one fixed IEEE tree; cross-
    segmentation and cross-word sums quantize terms to decimal(28,12)
    (the _dec12 idiom — sub-grid segmentations contribute exactly zero
    on BOTH engines, a documented part of the spec, not drift); each
    round's probabilities are ROUND(·, 9) at the exposure (the
    classifier's per-step sigmoid precedent); zero-likelihood words are
    guarded out of the E-step identically. Degenerate corpora: empty →
    empty report; the rich-get-richer EM dynamics (whole-word pieces
    absorbing mass from their single-char covers) are hand-pinned on a
    tiny fixture in tests/test_ngram_properties.py."""
    p, e, seeds, keep, _ = _unigram_model_build(spark, docs, prune=prune)
    return _unigram_report(p, e, seeds, keep)


def _unigram_model_build(
    spark: SparkSession, docs: DataFrame, prune: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """The uncached trainer: returns (p, e, seeds, keep, prune_stats) —
    the FULL trained piece-probability relation over the seed domain
    (pruned pieces carry p = 0.0 exactly, so any segmentation touching
    one contributes zero likelihood downstream — the model
    ``text_unigram_segment`` applies), the final expected counts, the
    seed counts, the surviving vocabulary, and the per-prune-round
    diagnostics relation ``q_text_unigram_prune`` serves.

    Pruning (Kudo 2018 §3.2, ``prune=True`` is the production path;
    ``prune=False`` keeps the seed-EM-only model for the hand-pinned EM
    arithmetic tests): after the seed EM rounds, each UNI_PRUNE_TARGETS
    round (a) ranks multi-char pieces by expected count (exact decimal,
    piece-ASC tiebreak — cross-engine total order), keeps the top
    budget plus ALL single-char pieces (required characters never
    prune, so every word keeps its all-singles segmentation and the
    E-step's pw > 0 guard never fires on a live word), (b) renormalizes
    the kept mass (ROUND(·, 9) at the exposure, the existing idiom),
    zeroing pruned pieces IN PLACE — the relation keeps the seed
    domain, so the inner piece-join in the E-step still matches every
    lattice part and a pruned part multiplies a hard 0.0 into the
    segmentation product — then (c) runs ONE re-EM round to
    redistribute the dropped mass (pruned pieces' expected counts come
    back exactly 0, so pruning is absorbing). Everything stays
    vocabulary-bounded; the corpus is still touched exactly once."""
    comps = F.broadcast(
        spark.createDataFrame(
            _uni_comp_rows(), "n int, seg string, part_idx int, j int, l int"
        )
    )
    words = _uni_words(docs).localCheckpoint(eager=True)
    # span enumeration (end i, length l): substring(w, i-l+1, l)
    spans = (
        words.select(
            "w", "cw", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
        )
        .select(
            "w",
            "cw",
            "i",
            F.explode(
                F.sequence(
                    F.lit(1), F.least(F.lit(UNI_PIECE_MAX), F.col("i"))
                )
            ).alias("l"),
        )
        .select("cw", F.expr("substring(w, i - l + 1, l)").alias("piece"))
    )
    seeds = (
        spans.groupBy("piece")
        .agg(F.sum("cw").alias("seed_cnt"))
        .localCheckpoint(eager=True)
    )
    seed_tot = seeds.agg(F.sum("seed_cnt").alias("tot"))
    p = (
        seeds.crossJoin(F.broadcast(seed_tot))
        .select(
            "piece",
            F.round(
                F.col("seed_cnt").cast("double") / F.col("tot").cast("double"),
                9,
            ).alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    # the lattice-with-pieces relation is identical every round — stage it
    segp = (
        words.join(comps, "n")
        .select(
            "w",
            "cw",
            "seg",
            "part_idx",
            F.expr("substring(w, j + 1, l)").alias("piece"),
        )
        .localCheckpoint(eager=True)
    )
    def em_round(p_in: DataFrame) -> tuple[DataFrame, DataFrame]:
        """One full EM round under ``p_in``: returns (e, p) — expected
        counts and the renormalized next-round probabilities."""
        sp = _uni_seg_probs(segp, p_in, ["w", "cw", "seg"])
        pw = sp.groupBy("w").agg(
            F.sum(_dec12(F.col("sp"))).cast("double").alias("pw")
        )
        contrib = (
            segp.select("w", "seg", "piece")
            .join(sp.select("w", "seg", "cw", "sp"), ["w", "seg"])
            .join(pw, "w")
            .filter(F.col("pw") > 0)
            .select(
                "piece",
                _dec12(
                    F.col("cw").cast("double")
                    * F.col("sp")
                    / F.col("pw")
                ).alias("t"),
            )
        )
        e_out = contrib.groupBy("piece").agg(
            F.sum("t").alias("ed")
        ).localCheckpoint(eager=True)
        e_tot = e_out.agg(F.sum("ed").alias("etot"))
        p_out = (
            e_out.crossJoin(F.broadcast(e_tot))
            .select(
                "piece",
                F.round(
                    F.col("ed").cast("double") / F.col("etot").cast("double"),
                    9,
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        return e_out, p_out

    e = None
    for _ in range(UNI_EM_ROUNDS):
        e, p = em_round(p)

    # keep defaults to the whole seed domain (prune=False path and the
    # pre-prune model); stats defaults to the empty trajectory
    keep = e.select("piece").localCheckpoint(eager=True)
    stats_schema = (
        "prune_round int, keep_budget int, n_kept_multi bigint,"
        " n_single bigint, n_pieces bigint, mass_kept double"
    )
    stats_rounds: list[DataFrame] = []
    if prune:
        for ti, keep_k in enumerate(UNI_PRUNE_TARGETS, start=1):
            ranked = (
                e.filter(F.length("piece") > 1)
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.orderBy(F.col("ed").desc(), "piece")
                    ),
                )
            )
            keep = (
                ranked.filter(F.col("rn") <= keep_k)
                .select("piece")
                .unionByName(
                    e.filter(F.length("piece") == 1).select("piece")
                )
                .localCheckpoint(eager=True)
            )
            marked = e.join(
                keep.withColumn("kept", F.lit(1)), "piece", "left"
            )
            stats_rounds.append(
                marked.agg(
                    F.lit(ti).cast("int").alias("prune_round"),
                    F.lit(keep_k).cast("int").alias("keep_budget"),
                    F.count(
                        F.when(
                            (F.length("piece") > 1)
                            & F.col("kept").isNotNull(),
                            1,
                        )
                    ).alias("n_kept_multi"),
                    F.count(
                        F.when(F.length("piece") == 1, 1)
                    ).alias("n_single"),
                    F.count("*").alias("n_pieces"),
                    F.round(
                        F.sum(
                            F.when(F.col("kept").isNotNull(), F.col("ed"))
                        ).cast("double")
                        / F.sum("ed").cast("double"),
                        6,
                    ).alias("mass_kept"),
                )
            )
            kept_tot = marked.filter(F.col("kept").isNotNull()).agg(
                F.sum("ed").alias("ktot")
            )
            p = (
                marked.crossJoin(F.broadcast(kept_tot))
                .select(
                    "piece",
                    F.when(
                        F.col("kept").isNotNull(),
                        F.round(
                            F.col("ed").cast("double")
                            / F.col("ktot").cast("double"),
                            9,
                        ),
                    )
                    .otherwise(F.lit(0.0))
                    .alias("p"),
                )
                .localCheckpoint(eager=True)
            )
            e, p = em_round(p)
    if stats_rounds:
        prune_stats = reduce(DataFrame.unionByName, stats_rounds)
    else:
        prune_stats = spark.createDataFrame([], stats_schema)
    return p, e, seeds, keep, prune_stats.localCheckpoint(eager=True)


def _unigram_report(
    p: DataFrame, e: DataFrame, seeds: DataFrame, keep: DataFrame
) -> DataFrame:
    """Top-K vocabulary report over the trained model relations,
    restricted to the SURVIVING vocabulary (pruned pieces carry p = 0
    and expected count 0 but stay in the model domain; the report is
    the deliverable vocab, so it ranks survivors only) —
    vocabulary-sized window, derived per call (the model tuple is the
    cached artifact)."""
    ranked = (
        e.join(keep.select("piece"), "piece")
        .join(p, "piece")
        .join(seeds, "piece")
        .select(
            "piece",
            "seed_cnt",
            F.col("ed").cast("double").alias("ex"),
            "p",
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("ex").desc(), F.col("piece"))
            ),
        )
        .filter(F.col("rank") <= UNI_VOCAB_K)
    )
    return ranked.select(
        F.col("rank").cast("int").alias("rank"),
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        "seed_cnt",
        F.round("ex", 6).alias("expected_cnt"),
        F.col("p").alias("prob"),
    )


def unigram_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """The trained unigram-LM model tuple (p, e, seeds, keep,
    prune_stats) for (session, sf) — trained once via the
    ``similarity._trained`` cache (deterministic dataflow ⇒ the cached
    vocabulary-sized relations are bit-identical to a retrain; the
    oracles retrain per statement and keep proving it)."""
    from .similarity import _trained

    return _trained(
        spark,
        (sf_dir, "unigram_model", UNI_PIECE_MAX, UNI_WORD_MAX,
         UNI_EM_ROUNDS, UNI_PRUNE_TARGETS),
        lambda: _unigram_model_build(
            spark, spread(load(spark, sf_dir, "documents"), "doc_id")
        ),
        table="documents.parquet",
    )


def q_text_unigram_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: unigram-LM tokenizer vocabulary trained on
    ``documents`` — the OTHER production tokenizer family beside the
    merge-based BPE quartet (``text_bpe_*``); the top-K report over the
    session-cached PRUNED model (:func:`unigram_model`, Kudo 2018 with
    the full prune/re-EM schedule as of r13)."""
    p, e, seeds, keep, _ = unigram_model(spark, sf_dir)
    return _unigram_report(p, e, seeds, keep)


def q_text_unigram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prune-trajectory diagnostics for the unigram-LM trainer: one row
    per Kudo prune round — multi-char keep budget, how many multi-char
    pieces actually survived, the never-pruned single-char count, the
    candidate-domain size, and the fraction of expected-count mass the
    kept vocabulary retains (the number that says the prune was safe:
    high mass_kept = the dropped tail was genuinely redundant).

    All inputs are the trainer's own vocabulary-bounded relations (the
    stats ride the session-cached model tuple); the oracle re-derives
    the identical trajectory from the unrolled CTE chain per statement,
    re-proving the cache and the prune ranking (exact-decimal expected
    counts, piece-ASC tiebreak) cross-engine on every grade."""
    _, _, _, _, prune_stats = unigram_model(spark, sf_dir)
    return prune_stats


def q_text_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained unigram LM (the ``text_bpe_apply`` sibling):
    Viterbi-segment every (truncated) corpus word under the final piece
    probabilities and roll up per document — word count, piece count,
    fertility (pieces/word, THE tokenizer-quality number), and mean
    piece length.

    Viterbi over the same composition lattice the trainer uses: one
    more segmentation-probability pass under the FINAL model (the
    pivot/fixed-order-product machinery), then argmax per word =
    row_number over (sp DESC, seg ASC) — sp values are bit-identical
    doubles on both engines and the seg-string tiebreak is total, so
    the chosen segmentation is deterministic and cross-engine exact.
    Per-doc sums are pure integers; the two ratios are single IEEE
    divisions rounded at the end. Scale: the corpus contributes the
    (doc_id, word) rollup; the Viterbi side is vocabulary-bounded, and
    the rollup join keys on the word relation — corpus-sized relations
    never meet each other (the KN-LM shape). Docs with zero tokens
    have no words and drop from the output on both engines."""
    p, *_ = unigram_model(spark, sf_dir)
    comps = F.broadcast(
        spark.createDataFrame(
            _uni_comp_rows(), "n int, seg string, part_idx int, j int, l int"
        )
    )
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    docw = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .select("doc_id", F.substring("t", 1, UNI_WORD_MAX).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("k"))
    )
    words = (
        docw.select("w").distinct().withColumn("n", F.length("w").cast("int"))
    )
    segp = words.join(comps, "n").select(
        "w", "seg", "part_idx", F.expr("substring(w, j + 1, l)").alias("piece")
    )
    sp = _uni_seg_probs(segp, p, ["w", "seg"])
    best = (
        sp.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("w").orderBy(F.col("sp").desc(), "seg")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "w",
            F.size(F.split(F.col("seg"), ",")).cast("long").alias("np"),
        )
    )
    return (
        docw.join(best, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_words"),
            F.sum(F.col("k") * F.col("np")).alias("n_pieces"),
            F.sum(F.col("k") * F.length("w").cast("long")).alias("nch"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_pieces",
            F.round(
                F.col("n_pieces").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.col("nch").cast("double") / F.col("n_pieces").cast("double"),
                6,
            ).alias("mean_piece_len"),
        )
    )


def _uni_last_round() -> int:
    """Index of the FINAL EM round in the unrolled CTE chain: the seed
    rounds plus one re-EM round per prune round."""
    return UNI_EM_ROUNDS + len(UNI_PRUNE_TARGETS)


def _unigram_cte() -> str:
    """Unrolled-CTE mirror of the EM trainer through
    p{last}/e{last}/keep{lastT}: the identical composition lattice
    ships as a literal list of part-length strings (split + window
    prefix-sum recover (part_idx, j, l)); every reused CTE is AS
    MATERIALIZED (DuckDB re-inlines per reference otherwise). After the
    seed EM rounds, each prune round adds rank{t}/keep{t} (expected-
    count ranking of multi-char pieces, singles always kept), the
    renormalized-with-zeros pp{t}, and one re-EM round — the exact
    Spark schedule. Shared by the report, segment, and prune oracles."""
    seg_lits = ", ".join(
        "'" + ",".join(map(str, parts)) + "'" for parts in _uni_compositions()
    )
    prod = " * ".join(
        f"COALESCE(MAX(CASE WHEN part_idx = {k} THEN p END), 1.0)"
        for k in range(1, UNI_WORD_MAX + 1)
    )

    def em_round_sql(r: int, prev: str) -> str:
        return f"""
    terms{r} AS MATERIALIZED (
        SELECT s.w, s.cw, s.seg, s.part_idx, s.piece, p.p
        FROM segp s JOIN {prev} p USING (piece)),
    sp{r} AS MATERIALIZED (
        SELECT w, cw, seg, {prod} AS sp
        FROM terms{r} GROUP BY w, cw, seg),
    pw{r} AS MATERIALIZED (
        SELECT w, CAST(SUM(CAST(sp AS DECIMAL(28,12))) AS DOUBLE) AS pw
        FROM sp{r} GROUP BY w),
    e{r} AS MATERIALIZED (
        SELECT t.piece,
               SUM(CAST(CAST(s.cw AS DOUBLE) * s.sp / pw.pw
                        AS DECIMAL(28,12))) AS ed
        FROM terms{r} t
        JOIN sp{r} s ON t.w = s.w AND t.seg = s.seg
        JOIN pw{r} pw ON t.w = pw.w
        WHERE pw.pw > 0
        GROUP BY t.piece),
    p{r} AS MATERIALIZED (
        SELECT piece,
               ROUND(CAST(ed AS DOUBLE)
                     / CAST((SELECT SUM(ed) FROM e{r}) AS DOUBLE), 9) AS p
        FROM e{r})"""

    rounds = []
    prev = "p0"
    for r in range(1, UNI_EM_ROUNDS + 1):
        rounds.append(em_round_sql(r, prev))
        prev = f"p{r}"
    for t, keep_k in enumerate(UNI_PRUNE_TARGETS, start=1):
        r = UNI_EM_ROUNDS + t
        e_prev = f"e{r - 1}"
        rounds.append(f"""
    rank{t} AS MATERIALIZED (
        SELECT piece, ROW_NUMBER() OVER (ORDER BY ed DESC, piece) AS rn
        FROM {e_prev} WHERE LEN(piece) > 1),
    keep{t} AS MATERIALIZED (
        SELECT piece FROM rank{t} WHERE rn <= {keep_k}
        UNION ALL
        SELECT piece FROM {e_prev} WHERE LEN(piece) = 1),
    pp{t} AS MATERIALIZED (
        SELECT e.piece,
               CASE WHEN k.piece IS NOT NULL THEN
                   ROUND(CAST(e.ed AS DOUBLE)
                         / CAST((SELECT SUM(e2.ed) FROM {e_prev} e2
                                 JOIN keep{t} k2 ON e2.piece = k2.piece)
                                AS DOUBLE), 9)
               ELSE 0.0 END AS p
        FROM {e_prev} e LEFT JOIN keep{t} k ON e.piece = k.piece)""")
        rounds.append(em_round_sql(r, f"pp{t}"))
        prev = f"p{r}"
    return f"""toks AS (
        SELECT unnest({SQL_TOKENS.format(col='text')}) AS t FROM documents),
    words AS MATERIALIZED (
        SELECT substr(t, 1, {UNI_WORD_MAX}) AS w,
               CAST(COUNT(*) AS BIGINT) AS cw,
               CAST(LEN(substr(t, 1, {UNI_WORD_MAX})) AS INTEGER) AS n
        FROM toks GROUP BY 1, 3),
    seglist AS (
        SELECT seg, string_split(seg, ',') AS parts
        FROM (SELECT UNNEST([{seg_lits}]) AS seg)),
    comps AS MATERIALIZED (
        SELECT CAST(list_aggregate(list_transform(parts, x -> CAST(x AS INTEGER)),
                    'sum') AS INTEGER) AS n,
               seg,
               CAST(i AS INTEGER) AS part_idx,
               CAST(SUM(CAST(parts[i] AS INTEGER))
                        OVER (PARTITION BY seg ORDER BY i)
                    - CAST(parts[i] AS INTEGER) AS INTEGER) AS j,
               CAST(parts[i] AS INTEGER) AS l
        FROM seglist, LATERAL UNNEST(generate_series(1, LEN(parts))) u(i)),
    spans AS (
        SELECT substr(w, i - l + 1, l) AS piece, cw
        FROM words,
             LATERAL UNNEST(generate_series(1, n)) e_(i),
             LATERAL UNNEST(generate_series(1, LEAST({UNI_PIECE_MAX}, i))) l_(l)),
    seeds AS MATERIALIZED (
        SELECT piece, CAST(SUM(cw) AS BIGINT) AS seed_cnt
        FROM spans GROUP BY piece),
    p0 AS MATERIALIZED (
        SELECT piece,
               ROUND(CAST(seed_cnt AS DOUBLE)
                     / CAST((SELECT SUM(seed_cnt) FROM seeds) AS DOUBLE), 9)
                   AS p
        FROM seeds),
    segp AS MATERIALIZED (
        SELECT w, cw, seg, part_idx, substr(w, j + 1, l) AS piece
        FROM words JOIN comps USING (n)),{",".join(rounds)}"""


def _unigram_sql() -> str:
    """Top-K report oracle: the trainer CTE chain (seed EM + prune/re-EM
    rounds) + the rank window over the SURVIVING vocabulary."""
    last = _uni_last_round()
    last_t = len(UNI_PRUNE_TARGETS)
    return f"""
    WITH {_unigram_cte()},
    ranked AS (
        SELECT piece, seed_cnt, CAST(ed AS DOUBLE) AS ex, p,
               CAST(ROW_NUMBER() OVER (ORDER BY CAST(ed AS DOUBLE) DESC,
                                       piece) AS INTEGER) AS rank
        FROM e{last} JOIN keep{last_t} USING (piece)
        JOIN p{last} USING (piece) JOIN seeds USING (piece))
    SELECT rank, piece, CAST(LEN(piece) AS INTEGER) AS piece_len, seed_cnt,
           ROUND(ex, 6) AS expected_cnt, p AS prob
    FROM ranked WHERE rank <= {UNI_VOCAB_K}
"""


def _unigram_prune_sql() -> str:
    """Prune-trajectory oracle: re-derives each round's keep counts and
    kept-mass ratio from the unrolled CTE chain."""
    stats = []
    for t, keep_k in enumerate(UNI_PRUNE_TARGETS, start=1):
        e_prev = f"e{UNI_EM_ROUNDS + t - 1}"
        stats.append(f"""
    SELECT CAST({t} AS INTEGER) AS prune_round,
           CAST({keep_k} AS INTEGER) AS keep_budget,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rank{t}
            WHERE rn <= {keep_k}) AS n_kept_multi,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {e_prev}
            WHERE LEN(piece) = 1) AS n_single,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {e_prev}) AS n_pieces,
           ROUND(CAST((SELECT SUM(e2.ed) FROM {e_prev} e2
                       JOIN keep{t} k2 ON e2.piece = k2.piece) AS DOUBLE)
                 / CAST((SELECT SUM(ed) FROM {e_prev}) AS DOUBLE), 6)
               AS mass_kept""")
    return f"""
    WITH {_unigram_cte()}
    {" UNION ALL ".join(stats)}
"""


def _unigram_segment_sql() -> str:
    """Segment-application oracle: the trainer CTE chain, one more
    segmentation-probability pass under the FINAL (pruned) model,
    Viterbi argmax per word (max sp, seg-string ascending tiebreak),
    per-doc rollup."""
    last = _uni_last_round()
    prod = " * ".join(
        f"COALESCE(MAX(CASE WHEN part_idx = {k} THEN p END), 1.0)"
        for k in range(1, UNI_WORD_MAX + 1)
    )
    return f"""
    WITH {_unigram_cte()},
    termsF AS MATERIALIZED (
        SELECT s.w, s.seg, s.part_idx, p.p
        FROM segp s JOIN p{last} p USING (piece)),
    spF AS MATERIALIZED (
        SELECT w, seg, {prod} AS sp
        FROM termsF GROUP BY w, seg),
    best AS MATERIALIZED (
        SELECT w, CAST(LEN(string_split(seg, ',')) AS BIGINT) AS np
        FROM (SELECT w, seg,
                     ROW_NUMBER() OVER (PARTITION BY w
                                        ORDER BY sp DESC, seg) AS rn
              FROM spF)
        WHERE rn = 1),
    docw AS (
        SELECT doc_id, substr(t, 1, {UNI_WORD_MAX}) AS w,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM (SELECT doc_id, unnest({SQL_TOKENS.format(col='text')}) AS t
              FROM documents)
        GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_words,
           CAST(SUM(k * np) AS BIGINT) AS n_pieces,
           ROUND(CAST(SUM(k * np) AS DOUBLE)
                 / CAST(SUM(k) AS DOUBLE), 6) AS fertility,
           ROUND(CAST(SUM(k * LEN(w)) AS DOUBLE)
                 / CAST(SUM(k * np) AS DOUBLE), 6) AS mean_piece_len
    FROM docw JOIN best USING (w)
    GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# trained quality classifier (fastText-style hashed linear gate)
# ---------------------------------------------------------------------------

CLF_DIM = 32  # hashed feature buckets (the vocab-independence knob)
CLF_STEPS = 10  # unrolled full-batch gradient steps
CLF_ETA = 1.0  # learning rate
CLF_GATE = 0.625  # teacher threshold on the heuristic quality_score
CLF_HOLDOUT_MOD = 5  # doc_id % 5 == 0 → held-out eval split


def _dec12(c: F.Column) -> F.Column:
    """Quantize a double term to DECIMAL(28,12) so the following SUM is
    order-free and cross-engine exact (the dec9 idiom, two digits wider
    because gradient terms are products of two z-scored features).

    DIRECT cast, never ROUND(x, 12) first: at scale 12 DuckDB's ROUND
    (float multiply-round-divide) and Spark's (exact decimal HALF_UP)
    disagree often enough that ten unrolled gradient steps accumulated a
    visible ~3e-12 weight drift (r11 finding, caught by the
    text_classifier_weights oracle); the double→decimal cast is the
    exact-conversion path both engines implement identically — the
    ``similarity_kmeans`` decimal(16,6) precedent."""
    return c.cast("decimal(28,12)")


def classifier_scores(
    spark: SparkSession, sf_dir: str, bigrams: bool = False
) -> DataFrame:
    """Trained text-quality classifier: the fastText-style supervised
    gate CCNet/LLaMA-class pipelines run beside the LM perplexity filter
    (Joulin et al. 2016; DCLM's fastText gate), distilled here from the
    engine's own heuristic teacher. Labels: ``quality_score >=
    {CLF_GATE}`` from :func:`quality_features` (the Gopher-ish
    composite the corpus already computes — the classifier learns to
    reproduce the expensive gate from cheap hashed features, which is
    exactly the production distillation story: train on a labeled
    slice, serve a linear scorer). Features: hashed bag-of-tokens
    (portable md5 hash → ``CLF_DIM`` buckets, the
    :func:`q_text_feature_hashing` trick — Weinberger et al. 2009),
    per-doc term frequencies, plus a capped length feature and a bias;
    all z-scored against TRAIN-split statistics. Model: logistic
    regression trained by ``CLF_STEPS`` unrolled full-batch gradient
    steps in the decimal-exact dataflow algebra ``similarity_kmeans``
    proved — every order-sensitive float sum is quantized to
    decimal(28,12) first, the sigmoid (the one transcendental) is
    rounded to 9 decimals on both engines, so the trained weights and
    every score hash-match the unrolled-CTE oracle bit-for-bit.

    Split: ``doc_id % {CLF_HOLDOUT_MOD} == 0`` is held out of training
    and standardization; scores are emitted for ALL docs with the
    split flag, and ``q_text_classifier_eval`` grades the held-out
    slice (AUC ≈ 0.86-0.90 at sf0.001-0.01; the separation test in
    tests/test_vector_text_ops.py pins teacher-positive docs scoring
    above teacher-negative on held-out data).

    100 TB shape: the dense feature grid is |docs|·(CLF_DIM+2) narrow
    rows; each gradient step is one broadcast join against the
    (CLF_DIM+2)-row weight relation plus two hash aggregations over the
    grid (map-side partials), K a fixed constant — the classic
    distributed-LR shape (MLlib's LogisticRegression aggregator)
    expressed in pure DataFrame algebra. Serving is a narrow
    scan + broadcast join. The feature grid is localCheckpointed
    because 2K+1 plan references would otherwise re-derive it; the
    per-step weight relation is (CLF_DIM+2) rows, checkpointed to keep
    the unrolled lineage linear instead of 2^K. Raising corpus size
    changes nothing; raising vocabulary only argues for a larger
    CLF_DIM (the hashing trick's whole point). An empty train split
    degrades totally: weights stay zero, every score is 0.5.
    """
    feats, w, _ = classifier_model(spark, sf_dir, bigrams=bigrams)
    scored = (
        feats.join(F.broadcast(w), "j")
        .groupBy("doc_id", "y", "held_out")
        .agg(F.sum(_dec12(F.col("wt") * F.col("z"))).cast("double").alias("zs"))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("zs"))), 6)
    return scored.select(
        "doc_id",
        F.col("y").cast("int").alias("teacher_label"),
        "held_out",
        score.alias("score"),
        (score >= 0.5).alias("predicted_quality"),
    )


def classifier_model(
    spark: SparkSession, sf_dir: str, bigrams: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The trained model for (session, sf): returns (feats, weights,
    stats) — the z-scored dense feature grid (checkpointed), the
    trained (CLF_DIM+2)-row weight relation after CLF_STEPS unrolled
    gradient steps, and the (j, mu, sd) standardization stats (part of
    the deployment artifact: a served model is weights ⊕ stats).

    Trained ONCE per (session, sf, hyperparams) via the
    ``similarity._trained`` cache — the FAISS train/add/search
    separation the IVF/PQ family already applies: the training
    dataflow is deterministic and decimal-exact, so a cached relation
    is bit-identical to a retrained one (the DuckDB oracles, which
    retrain per statement, still hash-match), while retraining per
    query call would put ~20 sequential tiny-job constants in front of
    EVERY classifier query (measured ~9.6 s at sf0.1 — scheduling
    floor, not data). The cache key carries the documents fingerprint
    and every hyperparameter; the bench's fresh-process runs still pay
    one full training per session (honesty note in BASELINE.md)."""
    from .similarity import _trained

    return _trained(
        spark,
        (sf_dir, "clf_model", CLF_DIM, CLF_STEPS, CLF_ETA, CLF_GATE,
         CLF_HOLDOUT_MOD, bigrams),
        lambda: _classifier_model_build(
            spark,
            spread(load(spark, sf_dir, "documents"), "doc_id"),
            bigrams=bigrams,
        ),
        table="documents.parquet",
    )


def _classifier_model_build(
    spark: SparkSession, docs: DataFrame, bigrams: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The training dataflow behind :func:`classifier_model` (uncached).

    ``bigrams=True`` (the r12 A/B arm — fastText's accuracy story is
    word n-grams, Joulin et al. 2016) adds CLF_DIM hashed-BIGRAM share
    buckets beside the CLF_DIM unigram ones: the feature grid grows by
    a constant (j ∈ [CLF_DIM, 2·CLF_DIM) = bigram buckets, each
    family's counts normalized by ITS family total), and everything
    downstream — z-scoring, the unrolled GD steps, serving — is already
    dimension-generic. Measured held-out AUC at sf0.001/0.01 decides
    which variant serves (recorded in BASELINE.md r12)."""
    from .dedup import word_ngrams
    from .llmdata import _portable_hash

    dim = 2 * CLF_DIM if bigrams else CLF_DIM
    lab = quality_features(docs).select(
        "doc_id",
        F.coalesce(F.col("quality_score") >= CLF_GATE, F.lit(False))
        .cast("double")
        .alias("y"),
        (F.col("doc_id") % CLF_HOLDOUT_MOD == 0).alias("held_out"),
    )
    cnt = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy(
            "doc_id",
            F.pmod(_portable_hash(F.col("t")), F.lit(CLF_DIM))
            .cast("int")
            .alias("j"),
        )
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    if bigrams:
        cnt_bi = (
            docs.select(
                "doc_id",
                F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("t"),
            )
            .groupBy(
                "doc_id",
                (
                    F.pmod(_portable_hash(F.col("t")), F.lit(CLF_DIM))
                    + F.lit(CLF_DIM)
                )
                .cast("int")
                .alias("j"),
            )
            .agg(F.count("*").alias("c"))
        )
        tot_bi = cnt_bi.groupBy("doc_id").agg(F.sum("c").alias("n2"))
        cnt = cnt.unionByName(cnt_bi)
    idx = spark.range(dim + 2).select(F.col("id").cast("int").alias("j"))
    base = lab.join(tot, "doc_id", "left").select(
        "doc_id", "y", "held_out", F.coalesce("n", F.lit(0)).alias("n")
    )
    if bigrams:
        base = base.join(tot_bi, "doc_id", "left").select(
            "doc_id", "y", "held_out", "n",
            F.coalesce("n2", F.lit(0)).alias("n2"),
        )
    if bigrams:
        x = (
            F.when(F.col("j") == dim + 1, F.lit(1.0))
            .when(
                F.col("j") == dim,
                F.least(F.col("n").cast("double") / F.lit(32.0), F.lit(1.0)),
            )
            .when(
                (F.col("j") >= CLF_DIM) & (F.col("n2") > 0),
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n2").cast("double"),
            )
            .when(
                (F.col("j") < CLF_DIM) & (F.col("n") > 0),
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n").cast("double"),
            )
            .otherwise(F.lit(0.0))
        )
    else:
        # the served unigram grid — expression kept byte-identical to
        # the r11 form (and to the oracle CTE) on purpose
        x = (
            F.when(F.col("j") == dim + 1, F.lit(1.0))
            .when(
                F.col("j") == dim,
                F.least(F.col("n").cast("double") / F.lit(32.0), F.lit(1.0)),
            )
            .when(
                F.col("n") > 0,
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n").cast("double"),
            )
            .otherwise(F.lit(0.0))
        )
    grid = (
        base.crossJoin(F.broadcast(idx))
        .join(cnt, ["doc_id", "j"], "left")
        .select("doc_id", "y", "held_out", "j", x.alias("x"))
    )
    stats = (
        grid.filter(~F.col("held_out"))
        .groupBy("j")
        .agg(
            (F.sum(_dec12(F.col("x"))).cast("double") / F.count("*")).alias("mu"),
            (
                F.sum(_dec12(F.col("x") * F.col("x"))).cast("double")
                / F.count("*")
            ).alias("msq"),
        )
        .select(
            "j",
            "mu",
            F.sqrt(
                F.greatest(F.col("msq") - F.col("mu") * F.col("mu"), F.lit(0.0))
            ).alias("sd"),
        )
        .localCheckpoint(eager=True)
    )
    feats = (
        grid.join(F.broadcast(stats), "j", "left")
        .select(
            "doc_id",
            "y",
            "held_out",
            "j",
            # z needs NO quantization: x/mu/sd are identical doubles on
            # both engines (exact decimal sums + one IEEE tree + exact
            # sqrt), and subtraction/division are correctly rounded — so
            # z is bit-identical by construction
            F.when(F.col("j") == dim + 1, F.lit(1.0))
            .when(F.coalesce(F.col("sd"), F.lit(0.0)) == 0.0, F.lit(0.0))
            .otherwise((F.col("x") - F.col("mu")) / F.col("sd"))
            .alias("z"),
        )
        .localCheckpoint(eager=True)
    )
    ntr = base.filter(~F.col("held_out")).agg(F.count("*").alias("n_tr"))
    ftr = feats.filter(~F.col("held_out"))
    w = idx.select("j", F.lit(0.0).alias("wt")).localCheckpoint(eager=True)
    for _ in range(CLF_STEPS):
        zdoc = (
            ftr.join(F.broadcast(w), "j")
            .groupBy("doc_id", "y")
            .agg(F.sum(_dec12(F.col("wt") * F.col("z"))).cast("double").alias("zs"))
            .select(
                "doc_id",
                F.round(
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("zs"))), 9
                ).alias("s"),
            )
        )
        grad = (
            ftr.join(zdoc, "doc_id")
            .groupBy("j")
            .agg(
                F.sum(_dec12((F.col("s") - F.col("y")) * F.col("z")))
                .cast("double")
                .alias("g")
            )
        )
        w = (
            w.join(grad, "j", "left")
            .crossJoin(F.broadcast(ntr))
            .select(
                "j",
                # NO quantization on the weight itself: every input
                # (prev weight, decimal-exact gradient sum, n_tr) is an
                # identical double on both engines and -,*,/ are
                # correctly rounded, so the update is bit-identical by
                # construction. Quantizing here is what BROKE parity:
                # gradients are exact 1e-12 multiples over n_tr=400, so
                # weights land exactly ON half-ties of any decimal grid,
                # and Spark (shortest-repr HALF_UP) vs DuckDB (exact
                # binary expansion) resolve such ties differently (r11
                # finding via the text_classifier_weights oracle).
                (
                    F.col("wt")
                    - F.lit(CLF_ETA)
                    * F.when(
                        F.col("n_tr") > 0,
                        F.coalesce(F.col("g"), F.lit(0.0))
                        / F.col("n_tr").cast("double"),
                    ).otherwise(F.lit(0.0))
                ).alias("wt"),
            )
            .localCheckpoint(eager=True)
        )
    return feats, w, stats


def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding: trained hashed-linear quality gate over
    ``documents``."""
    return classifier_scores(spark, sf_dir)


def q_text_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the trained gate (the calibration half of
    an ML-ops eval — AUC says the RANKING is right, calibration says
    the PROBABILITIES are): held-out scores bucketed into deciles, per
    bucket the count, observed positive rate, and mean predicted score
    — the two columns a reliability diagram plots against each other.
    A well-calibrated gate has frac_pos ≈ mean_score per bin; a
    miscalibrated one needs Platt/temperature scaling before its
    scores can be thresholded as probabilities.

    Exactness: bin = floor(score·10) clamped to 9 (score is a 6-decimal
    double, the ·10 product exact-ish and both engines compute the
    identical tree); counts integer; mean score a decimal(28,6) sum.
    One pass over the held-out slice, ≤10 output rows — model-sized.
    """
    sc = classifier_scores(spark, sf_dir).filter(F.col("held_out"))
    bin_ = F.least(F.floor(F.col("score") * 10), F.lit(9)).cast("int")
    return (
        sc.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("teacher_label").cast("long").alias("n_pos"),
            (
                F.sum(F.col("score").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("ms"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.round(
                F.col("n_pos").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("frac_pos"),
            F.round(F.col("ms"), 6).alias("mean_score"),
        )
    )


SQL_TEXT_CLASSIFIER_CALIBRATION = f"""
    WITH {{cte}},
    sc AS (
        SELECT doc_id, CAST(y AS INTEGER) AS teacher_label,
               ROUND(1.0 / (1.0 + EXP(-zs)), 6) AS score
        FROM scored WHERE held_out)
    SELECT CAST(LEAST(FLOOR(score * 10), 9) AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(teacher_label) AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(teacher_label) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS frac_pos,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score
    FROM sc
    GROUP BY 1
"""


def q_corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language curation dashboard: how the TRAINED gate and the
    HEURISTIC gate each judge every stratum, and how often they agree —
    the relation a curation run reviews before committing a filter
    change (a stratum where the two gates disagree wholesale is where
    the distillation broke or the heuristic is wrong). Per lang:
    doc count, mean trained score, trained pass rate, heuristic pass
    rate (the same teacher rule the classifier distilled), and the
    agreement rate between the two verdicts.

    One broadcast join of the scored relation back onto the narrow
    (doc_id, lang) projection, one stratum-sized rollup; all counts
    integer, the mean a decimal(28,6) sum, ratios one IEEE tree
    rounded at the end. NULL langs group as their own bucket
    identically on both engines (the nullable-lang contract).
    """
    sc = classifier_scores(spark, sf_dir)
    langs = load_meta(spark, sf_dir, "documents", "doc_id", "lang")
    joined = sc.join(langs, "doc_id")
    agree = F.col("predicted_quality") == (F.col("teacher_label") == 1)
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (
                F.sum(F.col("score").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("ms"),
            F.sum(F.col("predicted_quality").cast("int"))
            .cast("long")
            .alias("n_pass_trained"),
            F.sum("teacher_label").cast("long").alias("n_pass_teacher"),
            F.sum(agree.cast("int")).cast("long").alias("n_agree"),
        )
        .select(
            "lang",
            "n_docs",
            F.round(F.col("ms"), 6).alias("mean_score"),
            F.round(
                F.col("n_pass_trained").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("pass_rate_trained"),
            F.round(
                F.col("n_pass_teacher").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("pass_rate_teacher"),
            F.round(
                F.col("n_agree").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("agreement"),
        )
    )


SQL_CORPUS_QUALITY_REPORT = f"""
    WITH {{cte}},
    sc AS (
        SELECT doc_id, CAST(y AS INTEGER) AS teacher_label,
               ROUND(1.0 / (1.0 + EXP(-zs)), 6) AS score,
               ROUND(1.0 / (1.0 + EXP(-zs)), 6) >= 0.5 AS predicted_quality
        FROM scored)
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           ROUND(CAST(SUM(CASE WHEN predicted_quality THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS pass_rate_trained,
           ROUND(CAST(SUM(teacher_label) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS pass_rate_teacher,
           ROUND(CAST(SUM(CASE WHEN predicted_quality = (teacher_label = 1)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS agreement
    FROM sc JOIN (SELECT doc_id, lang FROM documents) d USING (doc_id)
    GROUP BY d.lang
"""


def q_text_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation card for the trained quality classifier: one
    row with split sizes, tie-averaged-rank AUC (Mann–Whitney U — exact
    integer/rank arithmetic, so fully hash-checkable), class mean
    scores, and thresholded accuracy — all on the held-out slice only
    (the train numbers would flatter any classifier).

    The rank window is a single global sort over the HELD-OUT slice —
    a bounded eval relation by construction (1/{CLF_HOLDOUT_MOD} of the
    audit sample; at 100 TB the eval slice is itself a sample, never
    the corpus), the same bounded-relation argument every *_eval query
    in the registry makes. Means are decimal-quantized sums; the AUC
    closing expression is one IEEE tree rounded at the end.
    """
    return _classifier_eval_card(
        classifier_scores(spark, sf_dir).localCheckpoint(eager=True)
    )


def q_text_classifier_bigram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out eval card for the hashed-BIGRAM feature variant (r12
    A/B, VERDICT r11 item 7): fastText's accuracy story is word
    n-grams, so the variant trains the same 10-step gate over
    2·CLF_DIM buckets (unigram + bigram families, each normalized by
    its own total) and this card grades it on the identical held-out
    slice — same schema as ``text_classifier_eval`` so the two rows
    diff directly. MEASURED RESULT (recorded in BASELINE.md r12): the
    bigram variant LOSES on this corpus — AUC 0.867 vs 0.900 at
    sf0.001, 0.821 vs 0.860 at sf0.01 (word-soup text gives bigrams no
    signal beyond their unigrams, and the fixed 10 steps spread over
    2× dimensions) — so the UNIGRAM gate stays the served model and
    this query is the standing evidence for that choice, re-graded
    every round."""
    return _classifier_eval_card(
        classifier_scores(spark, sf_dir, bigrams=True).localCheckpoint(
            eager=True
        )
    )


def _classifier_eval_card(sc: DataFrame) -> DataFrame:
    """The shared held-out eval-card dataflow over a scored relation."""
    totals = sc.agg(
        F.sum(F.when(~F.col("held_out"), 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("held_out"), 1).otherwise(0))
        .cast("long")
        .alias("n_holdout"),
    )
    ho = sc.filter(F.col("held_out"))
    r = F.rank().over(Window.orderBy("score")) + (
        F.count("*").over(Window.partitionBy("score")) - 1
    ) / F.lit(2.0)
    ranked = ho.select(
        "teacher_label", "score", "predicted_quality", r.alias("r")
    )
    pos = F.col("teacher_label") == 1
    agg = ranked.agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(~pos, 1).otherwise(0)).cast("long").alias("n_neg"),
        F.sum(F.when(pos, F.col("r"))).alias("sum_r_pos"),
        F.sum(F.when(pos, F.col("score").cast("decimal(28,6)")))
        .cast("double")
        .alias("sum_s_pos"),
        F.sum(F.when(~pos, F.col("score").cast("decimal(28,6)")))
        .cast("double")
        .alias("sum_s_neg"),
        F.sum(
            F.when(pos == F.col("predicted_quality"), 1).otherwise(0)
        ).cast("long").alias("n_correct"),
    )
    out = totals.crossJoin(F.broadcast(agg))
    npos = F.col("n_pos").cast("double")
    nneg = F.col("n_neg").cast("double")
    return out.select(
        "n_train",
        "n_holdout",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                (F.col("sum_r_pos") - npos * (npos + 1) / 2) / (npos * nneg), 6
            ),
        ).alias("auc"),
        F.when(F.col("n_pos") > 0, F.round(F.col("sum_s_pos") / npos, 6)).alias(
            "mean_score_pos"
        ),
        F.when(F.col("n_neg") > 0, F.round(F.col("sum_s_neg") / nneg, 6)).alias(
            "mean_score_neg"
        ),
        F.when(
            F.col("n_holdout") > 0,
            F.round(
                F.col("n_correct").cast("double")
                / F.col("n_holdout").cast("double"),
                6,
            ),
        ).alias("accuracy"),
    )


def q_text_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model card for the trained quality gate: every learned weight
    beside the hashing-trick collision profile behind it (how many
    distinct terms share the bucket, their occurrence mass, an example
    term) — the interpretability artifact a curation pipeline ships
    with the gate, and the number that tells you whether a heavy weight
    means one dominant term or an unlucky collision (the
    ``text_feature_hashing`` audit, now joined to consequences).

    The weight relation is CLF_DIM+2 rows; the profile is one
    vocabulary-sized rollup folded to ≤CLF_DIM rows — both model-sized,
    so the whole query costs one corpus token pass beyond training.
    Weights are emitted ROUND(·, 9): the interior weights stay raw
    doubles (quantizing them breaks parity — gradients are exact 1e-12
    multiples over n_tr, so any decimal grid lands exactly on half-ties
    that Spark's shortest-repr HALF_UP and DuckDB's exact-binary
    rounding resolve differently), and DuckDB's decimal→double cast is
    not correctly rounded, so raw weights carry a few-ulp engine drift —
    the standard house answer is to quantize at the EXPOSURE, where the
    drift is far below the rounding grain (both r11 findings, caught by
    this query's oracle).
    """
    from .llmdata import _portable_hash

    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    _, w, _ = classifier_model(spark, sf_dir)
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occur"))
    )
    prof = counts.groupBy(
        F.pmod(_portable_hash(F.col("token")), F.lit(CLF_DIM))
        .cast("int")
        .alias("j")
    ).agg(
        F.count("*").alias("n_terms"),
        F.sum("n_occur").alias("n_occurrences"),
        F.min("token").alias("first_term"),
    )
    kind = (
        F.when(F.col("j") == CLF_DIM + 1, F.lit("bias"))
        .when(F.col("j") == CLF_DIM, F.lit("length"))
        .otherwise(F.lit("bucket"))
    )
    return w.join(F.broadcast(prof), "j", "left").select(
        "j",
        kind.alias("kind"),
        # + 0.0 normalizes IEEE negative zero: a tiny negative weight
        # rounds to -0.0 through DuckDB's float ROUND but +0.0 through
        # Spark's decimal round — the KN-LM r10 pathology, resurfaced
        # here by the fuzz net's degenerate corpora
        (F.round(F.col("wt"), 9) + F.lit(0.0)).alias("weight"),
        "n_terms",
        "n_occurrences",
        "first_term",
    )


def _clf_grid_cte(bigrams: bool) -> str:
    """The cnt/tot/base/grid CTE block of :func:`_clf_cte` — the only
    part the bigram A/B arm changes (a second hashed count family over
    word bigrams at j ∈ [CLF_DIM, 2·CLF_DIM), each family normalized
    by its OWN total; the unigram text is byte-identical to r11)."""
    toks = SQL_TOKENS.format(col="text")
    dim = 2 * CLF_DIM if bigrams else CLF_DIM
    D, B = dim, dim + 1
    if not bigrams:
        return f"""cnt AS MATERIALIZED (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15))::BIGINT % {D}
                    AS INTEGER) AS j,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, UNNEST({toks}) AS tok FROM documents)
        GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id),
    idx AS (SELECT CAST(UNNEST(RANGE({D + 2})) AS INTEGER) AS j),
    base AS (
        SELECT lab.doc_id, y, held_out, COALESCE(n, 0) AS n
        FROM lab LEFT JOIN tot ON lab.doc_id = tot.doc_id),
    grid AS MATERIALIZED (
        SELECT base.doc_id, y, held_out, idx.j,
               CASE WHEN idx.j = {B} THEN 1.0
                    WHEN idx.j = {D}
                        THEN LEAST(CAST(n AS DOUBLE) / 32.0, 1.0)
                    WHEN n > 0
                        THEN CAST(COALESCE(c, 0) AS DOUBLE)
                             / CAST(n AS DOUBLE)
                    ELSE 0.0 END AS x
        FROM base CROSS JOIN idx
        LEFT JOIN cnt ON cnt.doc_id = base.doc_id AND cnt.j = idx.j),"""
    return f"""cnt AS MATERIALIZED (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15))::BIGINT % {CLF_DIM}
                    AS INTEGER) AS j,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, UNNEST({toks}) AS tok FROM documents)
        GROUP BY 1, 2),
    cntb AS MATERIALIZED (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15))::BIGINT % {CLF_DIM}
                    + {CLF_DIM} AS INTEGER) AS j,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id,
                     UNNEST([w[i] || ' ' || w[i + 1]
                             FOR i IN RANGE(1, GREATEST(LEN(w), 1))]) AS tok
              FROM (SELECT doc_id, {toks} AS w FROM documents))
        GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id),
    totb AS (SELECT doc_id, SUM(c) AS n2 FROM cntb GROUP BY doc_id),
    cnta AS MATERIALIZED (
        SELECT * FROM cnt UNION ALL SELECT * FROM cntb),
    idx AS (SELECT CAST(UNNEST(RANGE({D + 2})) AS INTEGER) AS j),
    base AS (
        SELECT lab.doc_id, y, held_out, COALESCE(n, 0) AS n,
               COALESCE(n2, 0) AS n2
        FROM lab LEFT JOIN tot ON lab.doc_id = tot.doc_id
                 LEFT JOIN totb ON lab.doc_id = totb.doc_id),
    grid AS MATERIALIZED (
        SELECT base.doc_id, y, held_out, idx.j,
               CASE WHEN idx.j = {B} THEN 1.0
                    WHEN idx.j = {D}
                        THEN LEAST(CAST(n AS DOUBLE) / 32.0, 1.0)
                    WHEN idx.j >= {CLF_DIM} AND n2 > 0
                        THEN CAST(COALESCE(c, 0) AS DOUBLE)
                             / CAST(n2 AS DOUBLE)
                    WHEN idx.j < {CLF_DIM} AND n > 0
                        THEN CAST(COALESCE(c, 0) AS DOUBLE)
                             / CAST(n AS DOUBLE)
                    ELSE 0.0 END AS x
        FROM base CROSS JOIN idx
        LEFT JOIN cnta ON cnta.doc_id = base.doc_id AND cnta.j = idx.j),"""


def _clf_cte(bigrams: bool = False) -> str:
    """Unrolled-CTE mirror of :func:`classifier_scores` through the
    ``scored`` relation — every reused CTE AS MATERIALIZED (DuckDB
    re-inlines per reference otherwise; the probe-sweep precedent).
    ``bigrams=True`` mirrors the r12 A/B arm: a second hashed count
    family over word bigrams at j ∈ [CLF_DIM, 2·CLF_DIM), each family
    share-normalized by its own total, grid width 2·CLF_DIM+2."""
    dim = 2 * CLF_DIM if bigrams else CLF_DIM
    D, B = dim, dim + 1
    toks = SQL_TOKENS.format(col="text")
    rounds = []
    prev = "w0"
    for i in range(1, CLF_STEPS + 1):
        rounds.append(f"""
    z{i} AS MATERIALIZED (
        SELECT doc_id,
               ROUND(1.0 / (1.0 + EXP(-zs)), 9) AS s
        FROM (SELECT f.doc_id,
                     CAST(SUM(CAST(w.wt * f.z AS DECIMAL(28,12)))
                          AS DOUBLE) AS zs
              FROM ftr f JOIN {prev} w USING (j) GROUP BY f.doc_id)),
    g{i} AS MATERIALIZED (
        SELECT f.j,
               CAST(SUM(CAST((z.s - f.y) * f.z AS DECIMAL(28,12)))
                    AS DOUBLE) AS g
        FROM ftr f JOIN z{i} z USING (doc_id) GROUP BY f.j),
    w{i} AS MATERIALIZED (
        SELECT w.j,
               w.wt - {CLF_ETA} * (CASE WHEN ntr.n_tr > 0
                   THEN COALESCE(g.g, 0.0) / CAST(ntr.n_tr AS DOUBLE)
                   ELSE 0.0 END) AS wt
        FROM {prev} w LEFT JOIN g{i} g USING (j) CROSS JOIN ntr)""")
        prev = f"w{i}"
    return f"""
    lab AS (
        SELECT doc_id,
               CASE WHEN qs IS NOT NULL AND qs >= {CLF_GATE}
                    THEN 1.0 ELSE 0.0 END AS y,
               doc_id % {CLF_HOLDOUT_MOD} = 0 AS held_out
        FROM (SELECT doc_id,
                     CASE WHEN LEN(toks) > 0 AND n_chars > 0 THEN
                         ROUND((alpha_chars * 1.0 / n_chars) * 0.5
                               + (LEN(LIST_FILTER(toks,
                                      t -> t IN ({_STOP_SQL}))) * 1.0
                                  / LEN(toks)) * 0.3
                               + LEAST(LEN(toks) / 32.0, 1.0) * 0.2, 6)
                     END AS qs
              FROM (SELECT doc_id, {toks} AS toks,
                           LENGTH(text) AS n_chars,
                           LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g'))
                               AS alpha_chars
                    FROM documents))),
    {_clf_grid_cte(bigrams)}
    stats AS (
        SELECT j, mu, SQRT(GREATEST(msq - mu * mu, 0.0)) AS sd
        FROM (SELECT j,
                     CAST(SUM(CAST(x AS DECIMAL(28,12)))
                          AS DOUBLE) / COUNT(*) AS mu,
                     CAST(SUM(CAST(x * x AS DECIMAL(28,12)))
                          AS DOUBLE) / COUNT(*) AS msq
              FROM grid WHERE NOT held_out GROUP BY j)),
    feats AS MATERIALIZED (
        SELECT doc_id, y, held_out, grid.j,
               CASE WHEN grid.j = {B} THEN 1.0
                    WHEN COALESCE(sd, 0.0) = 0.0 THEN 0.0
                    ELSE (x - mu) / sd END AS z
        FROM grid LEFT JOIN stats ON grid.j = stats.j),
    ftr AS MATERIALIZED (SELECT * FROM feats WHERE NOT held_out),
    ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tr
            FROM base WHERE NOT held_out),
    w0 AS (SELECT j, 0.0 AS wt FROM idx),{",".join(rounds)},
    scored AS MATERIALIZED (
        SELECT f.doc_id, f.y, f.held_out,
               CAST(SUM(CAST(w.wt * f.z AS DECIMAL(28,12)))
                    AS DOUBLE) AS zs
        FROM feats f JOIN {prev} w USING (j)
        GROUP BY f.doc_id, f.y, f.held_out)"""


SQL_TEXT_QUALITY_CLASSIFIER = f"""
    WITH {_clf_cte()}
    SELECT doc_id, CAST(y AS INTEGER) AS teacher_label, held_out,
           ROUND(1.0 / (1.0 + EXP(-zs)), 6) AS score,
           ROUND(1.0 / (1.0 + EXP(-zs)), 6) >= 0.5 AS predicted_quality
    FROM scored
"""

def _clf_eval_sql(bigrams: bool = False) -> str:
    return f"""
    WITH {_clf_cte(bigrams)},
    sc AS MATERIALIZED (
        SELECT doc_id, CAST(y AS INTEGER) AS teacher_label, held_out,
               ROUND(1.0 / (1.0 + EXP(-zs)), 6) AS score,
               ROUND(1.0 / (1.0 + EXP(-zs)), 6) >= 0.5 AS predicted_quality
        FROM scored),
    totals AS (
        SELECT CAST(SUM(CASE WHEN NOT held_out THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(SUM(CASE WHEN held_out THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_holdout
        FROM sc),
    ranked AS (
        SELECT teacher_label, score, predicted_quality,
               RANK() OVER (ORDER BY score)
               + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS r
        FROM sc WHERE held_out),
    agg AS (
        SELECT CAST(SUM(CASE WHEN teacher_label = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pos,
               CAST(SUM(CASE WHEN teacher_label <> 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_neg,
               SUM(CASE WHEN teacher_label = 1 THEN r END) AS sum_r_pos,
               CAST(SUM(CASE WHEN teacher_label = 1
                        THEN CAST(score AS DECIMAL(28,6)) END) AS DOUBLE)
                   AS sum_s_pos,
               CAST(SUM(CASE WHEN teacher_label <> 1
                        THEN CAST(score AS DECIMAL(28,6)) END) AS DOUBLE)
                   AS sum_s_neg,
               CAST(SUM(CASE WHEN (teacher_label = 1) = predicted_quality
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM ranked)
    SELECT n_train, n_holdout, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               ROUND((sum_r_pos - CAST(n_pos AS DOUBLE)
                      * (CAST(n_pos AS DOUBLE) + 1) / 2)
                     / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
           END AS auc,
           CASE WHEN n_pos > 0
                THEN ROUND(sum_s_pos / CAST(n_pos AS DOUBLE), 6) END
               AS mean_score_pos,
           CASE WHEN n_neg > 0
                THEN ROUND(sum_s_neg / CAST(n_neg AS DOUBLE), 6) END
               AS mean_score_neg,
           CASE WHEN n_holdout > 0
                THEN ROUND(CAST(n_correct AS DOUBLE)
                           / CAST(n_holdout AS DOUBLE), 6) END
               AS accuracy
    FROM totals CROSS JOIN agg
"""


SQL_TEXT_CLASSIFIER_EVAL = _clf_eval_sql()


SQL_TEXT_CLASSIFIER_WEIGHTS = f"""
    WITH {_clf_cte()},
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occur
        FROM (SELECT UNNEST({SQL_TOKENS.format(col="text")}) AS token
              FROM documents)
        GROUP BY token),
    prof AS (
        SELECT CAST(('0x' || substr(md5(token), 1, 15))::BIGINT % {CLF_DIM}
                    AS INTEGER) AS j,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(n_occur) AS BIGINT) AS n_occurrences,
               MIN(token) AS first_term
        FROM counts GROUP BY 1)
    SELECT w.j,
           CASE WHEN w.j = {CLF_DIM + 1} THEN 'bias'
                WHEN w.j = {CLF_DIM} THEN 'length'
                ELSE 'bucket' END AS kind,
           ROUND(w.wt, 9) + 0.0 AS weight, n_terms, n_occurrences, first_term
    FROM w{CLF_STEPS} w LEFT JOIN prof ON w.j = prof.j
"""


QUERIES = {
    "text_quality_classifier": Query(
        q_text_quality_classifier, SQL_TEXT_QUALITY_CLASSIFIER
    ),
    "text_classifier_eval": Query(q_text_classifier_eval, SQL_TEXT_CLASSIFIER_EVAL),
    "text_classifier_bigram_eval": Query(
        q_text_classifier_bigram_eval, _clf_eval_sql(bigrams=True)
    ),
    "text_classifier_weights": Query(
        q_text_classifier_weights, SQL_TEXT_CLASSIFIER_WEIGHTS
    ),
    "text_classifier_calibration": Query(
        q_text_classifier_calibration,
        SQL_TEXT_CLASSIFIER_CALIBRATION.format(cte=_clf_cte()),
    ),
    "corpus_quality_report": Query(
        q_corpus_quality_report,
        SQL_CORPUS_QUALITY_REPORT.format(cte=_clf_cte()),
    ),
    "text_kn_quality": Query(q_text_kn_quality, SQL_TEXT_KN_QUALITY),
    "text_kn_perplexity": Query(q_text_kn_perplexity, SQL_TEXT_KN_PERPLEXITY),
    "text_rake_keywords": Query(q_text_rake_keywords, SQL_TEXT_RAKE),
    "text_c4_rules": Query(q_text_c4_rules, SQL_TEXT_C4_RULES),
    "text_ccnet_buckets": Query(q_text_ccnet_buckets, _ccnet_buckets_sql()),
    "text_line_dedup": Query(q_text_line_dedup, SQL_TEXT_LINE_DEDUP),
    "text_unigram_logprob": Query(
        q_text_unigram_logprob,
        SQL_TEXT_UNIGRAM_LOGPROB.format(toks=SQL_TOKENS.format(col="text")),
    ),
    "text_unigram_tokenizer": Query(q_text_unigram_tokenizer, _unigram_sql()),
    "text_unigram_prune": Query(q_text_unigram_prune, _unigram_prune_sql()),
    "text_unigram_segment": Query(
        q_text_unigram_segment, _unigram_segment_sql()
    ),
    "text_boilerplate_edges": Query(
        q_text_boilerplate_edges, SQL_TEXT_BOILERPLATE
    ),
    "text_feature_hashing": Query(q_text_feature_hashing, SQL_TEXT_FEATURE_HASHING),
    "text_zipf": Query(q_text_zipf, SQL_TEXT_ZIPF),
    "text_bpe_pairs": Query(q_text_bpe_pairs, SQL_TEXT_BPE_PAIRS),
    "text_bpe_apply": Query(q_text_bpe_apply, SQL_TEXT_BPE_APPLY),
    "text_bpe_vocab": Query(q_text_bpe_vocab, SQL_TEXT_BPE_VOCAB),
    "text_bpe_fertility": Query(q_text_bpe_fertility, SQL_TEXT_BPE_FERTILITY),
    "text_collocations": Query(q_text_collocations, SQL_TEXT_COLLOCATIONS),
    "text_readability": Query(q_text_readability, SQL_TEXT_READABILITY),
    "text_bm25": Query(q_text_bm25, SQL_TEXT_BM25),
    "text_pretokenize": Query(q_text_pretokenize, SQL_TEXT_PRETOKENIZE),
    "text_common_passages": Query(q_text_common_passages, SQL_TEXT_COMMON_PASSAGES),
    "text_quality": Query(q_text_quality, SQL_TEXT_QUALITY, headline=True),
    "text_token_stats": Query(q_text_token_stats, SQL_TEXT_TOKEN_STATS),
    "text_ngram_top": Query(q_text_ngram_top, SQL_TEXT_NGRAM_TOP),
    "text_fingerprint": Query(q_text_fingerprint, SQL_TEXT_FINGERPRINT, headline=True),
    "text_normalize": Query(q_text_normalize, SQL_TEXT_NORMALIZE),
    "text_tfidf": Query(q_text_tfidf, SQL_TEXT_TFIDF),
    "text_langid": Query(q_text_langid, SQL_TEXT_LANGID),
    "text_gopher_rules": Query(q_text_gopher_rules, SQL_TEXT_GOPHER_RULES),
}
