"""Text-analysis queries over the documents corpus (training-data ops).

Exercises operators.text: token counting, quality scoring, language ID,
and MD5-min fingerprinting — each with an exact DuckDB oracle twin (the
operator module ships matched sql_* builders). These are per-row
projections: at 100 TB they are embarrassingly parallel scans inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.operators import text as T
from flink_release_1_16_0_spark.queries import register
from flink_release_1_16_0_spark.queries._util import davg, sql_davg

# --------------------------------------------------------------------------
# token counting + length stats
# --------------------------------------------------------------------------

_TOKENS_ORACLE = f"""
SELECT
  doc_id,
  {T.sql_token_count('text')}     AS n_tokens,
  LENGTH(text)                    AS n_chars_computed,
  n_chars                         AS n_chars_given,
  {T.sql_mean_token_len('text')}  AS mean_token_len
FROM documents
"""


@register("text_token_count", _TOKENS_ORACLE, tags=("llm", "text"))
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_given"),
        T.mean_token_len(F.col("text")).alias("mean_token_len"),
    )


# --------------------------------------------------------------------------
# quality scoring + corpus-level aggregation by source
# --------------------------------------------------------------------------

_QUALITY_ORACLE = f"""
SELECT
  source,
  COUNT(*) AS n_docs,
  {sql_davg(T.sql_quality_score('text'), 6, 6)} AS avg_quality,
  {sql_davg(T.sql_stopword_ratio('text'), 6, 6)} AS avg_stopword_ratio,
  {sql_davg(T.sql_punct_ratio('text'), 6, 6)} AS avg_punct_ratio
FROM documents
GROUP BY source
"""


@register("text_quality_by_source", _QUALITY_ORACLE, tags=("llm", "text"))
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")

    # shared davg, full 6-decimal output grid (out_scale=6: these are
    # ratio averages, not money — sums stay far below the 2^53 guard)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(F.round(T.quality_score(t), 6), 6, 6).alias("avg_quality"),
        davg(F.round(T.stopword_ratio(t), 6), 6, 6).alias("avg_stopword_ratio"),
        davg(F.round(T.punct_ratio(t), 6), 6, 6).alias("avg_punct_ratio"),
    )


# --------------------------------------------------------------------------
# language ID heuristic vs the labeled lang column
# --------------------------------------------------------------------------

_LANG_ORACLE = f"""
SELECT
  lang AS labeled_lang,
  {T.sql_lang_id('text')} AS detected,
  COUNT(*) AS n
FROM documents
GROUP BY 1, 2
"""


@register("text_lang_id", _LANG_ORACLE, tags=("llm", "text"))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            T.lang_id(F.col("text")).alias("detected"),
        )
        .groupBy("labeled_lang", "detected")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# repetition-based quality filters (the Gopher/MassiveText rules):
# top-token fraction + duplicate-2-gram fraction per document, with the
# repetitive flag a pretraining pipeline filters on. Word frequencies go
# through explode -> groupBy(doc_id, token) rather than an in-row
# nested-loop lambda: the relational shape is linear per token (a
# quadratic in-row count would melt on a 1M-token document) and its one
# shuffle is on (doc_id, token) — uniformly distributed, skew-free at
# any corpus size. The 2-gram distinct ratio stays in-row
# (array_distinct is O(n log n) per document, no shuffle at all).
# --------------------------------------------------------------------------

_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({T.sql_tokens('text')}) AS tok FROM documents
), freq AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
), word_stats AS (
  SELECT doc_id,
         CAST(MAX(c) AS BIGINT) AS top_freq,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM freq GROUP BY doc_id
), gram_stats AS (
  SELECT doc_id,
         CAST(len(list_distinct(__g)) AS BIGINT) AS n_distinct_2grams,
         CAST(len(__g) AS BIGINT) AS n_2grams
  FROM (SELECT doc_id, {T.sql_shingles('text', 2)} AS __g FROM documents)
)
SELECT w.doc_id,
       CAST(w.top_freq AS DOUBLE) / w.n_tokens AS top_token_frac,
       1.0 - CAST(g.n_distinct_2grams AS DOUBLE)
           / greatest(g.n_2grams, 1) AS dup_2gram_frac,
       (CAST(w.top_freq AS DOUBLE) / w.n_tokens > 0.20
        OR 1.0 - CAST(g.n_distinct_2grams AS DOUBLE)
               / greatest(g.n_2grams, 1) > 0.40) AS repetitive
FROM word_stats w JOIN gram_stats g USING (doc_id)
WHERE w.n_tokens > 0
"""


@register("text_repetition_metrics", _REPETITION_ORACLE, tags=("llm", "text"))
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    word_stats = freq.groupBy("doc_id").agg(
        F.max("c").alias("top_freq"),
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    grams = T.shingles(F.col("text"), 2)
    gram_stats = docs.select(
        "doc_id",
        F.size(F.array_distinct(grams)).cast("bigint").alias("n_distinct_2grams"),
        F.size(grams).cast("bigint").alias("n_2grams"),
    )
    top_frac = F.col("top_freq").cast("double") / F.col("n_tokens")
    dup_frac = F.lit(1.0) - F.col("n_distinct_2grams").cast("double") / F.greatest(
        F.col("n_2grams"), F.lit(1)
    )
    return (
        word_stats.filter(F.col("n_tokens") > 0)
        .join(gram_stats, "doc_id")
        .select(
            "doc_id",
            top_frac.alias("top_token_frac"),
            dup_frac.alias("dup_2gram_frac"),
            ((top_frac > 0.20) | (dup_frac > 0.40)).alias("repetitive"),
        )
    )


# --------------------------------------------------------------------------
# document fingerprinting (min-MD5 shingle hash)
# --------------------------------------------------------------------------

_FP_ORACLE = f"""
SELECT doc_id, {T.sql_fingerprint('text')} AS fp
FROM documents
WHERE doc_id % 7 = 0
"""


@register("text_fingerprint", _FP_ORACLE, tags=("llm", "text"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


# --------------------------------------------------------------------------
# tf-idf characteristic terms per document (corpus-statistic scoring)
# --------------------------------------------------------------------------


@register("text_tfidf_top_terms", T.sql_tf_idf_top_terms(3), tags=("llm", "text"))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf terms per doc (operators.text.tf_idf_top_terms).

    Two partial-combinable shuffles (doc-term tf, term df) + a
    vocabulary join AQE can broadcast — no corpus-sized state anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    return T.tf_idf_top_terms(docs, k=3)


# --------------------------------------------------------------------------
# unigram-LM negative log-prob ("perplexity-lite" curation signal)
# --------------------------------------------------------------------------


@register("text_unigram_logprob", T.sql_unigram_logprob(), tags=("llm", "text"))
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average -ln p(token) per doc under the corpus unigram model."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_logprob(docs)


# --------------------------------------------------------------------------
# BPE-ish token counting: a GPT-2-style pre-tokenizer regex (ASCII
# simplification — contractions, letter runs, digit runs, punctuation
# runs, space runs) counted next to the whitespace tokenizer. The
# pattern is RE2/Java-regex portable, so both engines segment
# identically; one regexp pass per row, zero shuffle.
# --------------------------------------------------------------------------

_BPE_PAT = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+| +"

_BPE_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}'))
            AS BIGINT) AS n_bpe_tokens,
       {T.sql_token_count('text')} AS n_ws_tokens
FROM documents
"""


@register("text_bpe_token_count", _BPE_ORACLE, tags=("llm", "text"))
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        T.token_count(F.col("text")).alias("n_ws_tokens"),
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS local fingerprinting): guaranteed-overlap
# dedup signatures — any shared token run of >= w+k-1 tokens shares a
# selected hash. Per-doc stats here; the pair-generation path reuses the
# LSH bucket machinery (explode fingerprint -> groupBy -> pairs).
# --------------------------------------------------------------------------

_WINNOW_ORACLE = f"""
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fps,
       fps[1] AS min_fp,
       fps[len(fps)] AS max_fp
FROM (
  SELECT doc_id, {T.sql_winnow_fingerprints('text')} AS fps FROM documents
)
WHERE len(fps) > 0
"""


@register("text_winnowing", _WINNOW_ORACLE, tags=("llm", "text", "dedup"))
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # two-stage with an exchange barrier: hash once, then window-min
    # over the bound column (winnow_from_hashes docstring — projection
    # collapse would otherwise re-hash the doc per window)
    par = spark.sparkContext.defaultParallelism
    # the empty-fps filter as a cheap scan-side predicate (fps is empty
    # iff the doc has < k tokens) — filtering on fps itself would push
    # the whole winnow expression below the exchange and re-run it per
    # row in the scan stage (measured 5s vs 1s at sf0.01)
    hashed = (
        docs.filter(T.token_count(F.col("text")) >= 3)
        .select("doc_id", T.shingle_hashes(F.col("text")).alias("__h"))
        .repartition(par, F.col("doc_id"))
    )
    # second barrier: fps is referenced 3x in the stats projection
    out = hashed.select(
        "doc_id", T.winnow_from_hashes(F.col("__h")).alias("fps")
    ).repartition(par, F.col("doc_id"))
    return out.select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fps"),
        F.element_at("fps", 1).alias("min_fp"),
        F.element_at("fps", -1).alias("max_fp"),
    )


# --------------------------------------------------------------------------
# Winnowing near-dup pairs: docs sharing >= 2 selected fingerprints
# (guaranteed to catch any shared run of >= w+k-1 tokens). Same bucket
# shape as the MinHash LSH path: explode fingerprint -> groupBy ->
# in-array pair generation -> pair-level support count. One signature
# pass, shuffle is O(docs x fingerprints) — the 100 TB shape.
# --------------------------------------------------------------------------

_WINNOW_PAIRS_ORACLE = f"""
WITH fps AS (
  SELECT doc_id, unnest({T.sql_winnow_fingerprints('text')}) AS fp
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM pairs GROUP BY id_a, id_b
HAVING COUNT(*) >= 2
"""


@register("dedup_winnowing_pairs", _WINNOW_PAIRS_ORACLE, tags=("llm", "dedup"))
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    hashed = (
        docs.filter(T.token_count(F.col("text")) >= 3)
        .select("doc_id", T.shingle_hashes(F.col("text")).alias("__h"))
        .repartition(par, F.col("doc_id"))
    )
    fps = hashed.select(
        "doc_id", F.explode(T.winnow_from_hashes(F.col("__h"))).alias("fp")
    )
    buckets = (
        fps.groupBy("fp")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_arr = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x: F.transform(
                    F.col("ids"),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )


# --------------------------------------------------------------------------
# Bigram collocation mining by PMI: pointwise mutual information of
# adjacent token pairs vs their unigram frequencies — the classic
# corpus-statistics pass for tokenizer/vocab construction. Three
# partial-combinable aggs (bigram, unigram, totals) + two joins the
# optimizer can broadcast; ln ratios rounded to the 9-grid with
# (count, bigram) tie-breaks so the top-k is engine-stable.
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 25
_PMI_TOP_K = 50

_PMI_ORACLE = f"""
WITH grams AS (
  SELECT unnest({T.sql_shingles('text', 2)}) AS bigram FROM documents
), toks AS (
  SELECT unnest({T.sql_tokens('text')}) AS tok FROM documents
), bg AS (
  SELECT bigram, COUNT(*) AS c_xy FROM grams GROUP BY bigram
), ug AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), n AS (
  SELECT COUNT(*) AS total FROM toks
), scored AS (
  SELECT b.bigram, b.c_xy,
         ROUND(LN(CAST(b.c_xy AS DOUBLE) * n.total
                  / (x.c * CAST(y.c AS DOUBLE))), 9) AS pmi
  FROM bg b
  JOIN ug x ON x.tok = string_split(b.bigram, ' ')[1]
  JOIN ug y ON y.tok = string_split(b.bigram, ' ')[2]
  CROSS JOIN n
  WHERE b.c_xy >= {_PMI_MIN_COUNT}
)
SELECT bigram, CAST(c_xy AS BIGINT) AS c_xy, pmi, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, c_xy DESC, bigram)
                 AS BIGINT) AS rk
  FROM scored
) WHERE rk <= {_PMI_TOP_K}
"""


@register("text_bigram_pmi", _PMI_ORACLE, tags=("llm", "text"))
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(T.shingles(F.col("text"), 2)).alias("bigram")
    )
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    bg = (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    ug = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n = toks.select(F.count(F.lit(1)).alias("total"))
    words = F.split(F.col("bigram"), " ")
    scored = (
        bg.withColumn("w1", words.getItem(0))
        .withColumn("w2", words.getItem(1))
        .join(ug.select(F.col("tok").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(ug.select(F.col("tok").alias("w2"), F.col("c").alias("c_y")), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "bigram",
            "c_xy",
            F.round(
                F.log(
                    F.col("c_xy").cast("double")
                    * F.col("total")
                    / (F.col("c_x") * F.col("c_y").cast("double"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("c_xy").desc(), F.col("bigram"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _PMI_TOP_K)
    )


@register("text_bpe_train_merges", T.sql_bpe_train_merges(3), tags=("llm", "text"))
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 learned BPE merges over the documents corpus — the
    tokenizer-training primitive (one corpus scan, per-round work is
    O(vocab)); see operators/text.bpe_train_merges."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bpe_train_merges(docs, "text", rounds=3)
