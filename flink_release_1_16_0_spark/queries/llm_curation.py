"""Training-data curation pipeline queries.

The end-to-end shapes a pretraining-data pipeline runs at 100 TB, each
hash-gated: deterministic stratified sampling (per-stratum quotas with
an md5 order — the distributed stand-in for a seeded shuffle),
hash-based train/validation split assignment, greedy token-budget
shard packing (cumulative-sum bucketing, the "pack documents into
fixed-size shards" step before tokenizer sharding), and the flagship
composition langid -> quality filter -> exact-dedup keeper -> token
stats. All stages stay in Catalyst expressions (no Python), so the
plans are scans + one shuffle per groupBy/window on the stratum key —
the shapes that survive a 1000-executor corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_release_1_16_0_spark.catalog import load_table
from flink_release_1_16_0_spark.operators.text import (
    lang_id,
    quality_score,
    shingles,
    sql_lang_id,
    sql_quality_score,
    sql_shingles,
    sql_token_count,
    sql_tokens,
    token_count,
    tokens,
)
from flink_release_1_16_0_spark.queries import register

# --------------------------------------------------------------------------
# Deterministic stratified sampling: k docs per language, ordered by an
# md5 of the doc id (uniform, seedable via the prefix, reproducible on
# both engines). The distributed equivalent of "shuffle with a fixed
# seed and take k per stratum" — one shuffle on the stratum key.
# --------------------------------------------------------------------------

_SAMPLE_K = 40

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY md5('seed42_' || CAST(doc_id AS VARCHAR)), doc_id) AS INT)
           AS sample_rank
  FROM documents
) WHERE sample_rank <= {_SAMPLE_K}
"""


@register("curation_stratified_sample", _SAMPLE_ORACLE, tags=("llm", "curation"))
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("seed42_"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= _SAMPLE_K)
    )


# --------------------------------------------------------------------------
# Hash-based split assignment: md5 of the doc id buckets every document
# into train/val/test with fixed proportions — stable under corpus
# growth (a doc's split never changes when new docs arrive), which is
# why production pipelines hash rather than sample. Pure projection: no
# shuffle at all until the per-split count.
# --------------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
           AS bucket
  FROM documents
), labeled AS (
  SELECT doc_id, lang,
         CASE WHEN bucket < 52429 THEN 'train'
              WHEN bucket < 58982 THEN 'val'
              ELSE 'test' END AS split
  FROM assigned
)
SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM labeled GROUP BY lang, split
"""


@register("curation_hash_split", _SPLIT_ORACLE, tags=("llm", "curation"))
def curation_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    labeled = docs.select(
        "doc_id",
        "lang",
        F.when(bucket < 52429, "train")
        .when(bucket < 58982, "val")
        .otherwise("test")
        .alias("split"),
    )
    return labeled.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


# --------------------------------------------------------------------------
# Token-budget shard packing: documents ordered deterministically
# within each (lang) stream are packed into shards of <= _BUDGET
# tokens via cumulative-sum bucketing — the distributed approximation
# of greedy sequence packing (exact greedy is sequential; the cumsum
# floor is the standard scalable relaxation and is what the window
# computes in one pass).
# --------------------------------------------------------------------------

_BUDGET = 4000

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, {sql_token_count('text')} AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / {_BUDGET}) AS BIGINT) AS shard_id
  FROM toks
)
SELECT lang, shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM packed GROUP BY lang, shard_id
"""


@register("curation_shard_packing", _PACK_ORACLE, tags=("llm", "curation"))
def curation_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _BUDGET),
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# Flagship curation composition: language-ID -> quality filter ->
# exact-dedup keeper -> per-language token statistics. Each stage is a
# Catalyst expression over one scan; the only shuffles are the dedup
# groupBy and the final stats groupBy.
# --------------------------------------------------------------------------

_PIPELINE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, text, {sql_lang_id('text')} AS detected_lang,
         {sql_quality_score('text')} AS quality,
         {sql_token_count('text')} AS n_tokens,
         md5(lower(trim(text))) AS text_hash
  FROM documents
), kept AS (
  SELECT * FROM scored
  WHERE quality >= 0.3
    AND doc_id = (SELECT MIN(s2.doc_id) FROM scored s2
                  WHERE s2.text_hash = scored.text_hash)
)
SELECT detected_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM kept GROUP BY detected_lang
"""


@register("curation_pipeline", _PIPELINE_ORACLE, tags=("llm", "curation"))
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("detected_lang"),
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tokens"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash"),
    )
    keeper = Window.partitionBy("text_hash")
    kept = (
        scored.withColumn("__min_id", F.min("doc_id").over(keeper))
        .filter((F.col("quality") >= 0.3) & (F.col("doc_id") == F.col("__min_id")))
    )
    return kept.groupBy("detected_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: flag training documents that share any
# k-token shingle with a held-out evaluation set (the standard n-gram
# contamination check run before pretraining). The eval set is tiny
# relative to the corpus, so its distinct-shingle table is BROADCAST:
# the 100 TB corpus side never shuffles for the probe — its only
# exchange is the per-doc groupBy that counts distinct shared shingles.
# Eval-set membership here is the deterministic doc_id % 97 slice.
# --------------------------------------------------------------------------

# Real pipelines use 8-13-gram overlap on natural text; the fixture's
# short synthetic docs need 4 to produce a non-degenerate overlap set.
_DECONTAM_K = 4

_DECONTAM_ORACLE = f"""
WITH bench_sh AS (
  SELECT DISTINCT unnest({sql_shingles('text', _DECONTAM_K)}) AS sh
  FROM documents WHERE doc_id % 97 = 0
), corpus_sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest({sql_shingles('text', _DECONTAM_K)}) AS sh
    FROM documents WHERE doc_id % 97 <> 0
  )
)
SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
FROM corpus_sh c JOIN bench_sh b ON c.sh = b.sh
GROUP BY c.doc_id
"""


@register("curation_decontaminate", _DECONTAM_ORACLE, tags=("llm", "curation"))
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(F.col("text"), _DECONTAM_K)
    bench_sh = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(sh).alias("sh"))
        .distinct()
    )
    corpus_sh = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.explode(sh).alias("sh"))
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


# --------------------------------------------------------------------------
# PII redaction: scrub email addresses and phone numbers from free text
# and report per-row redaction counts. The fixture corpus carries no
# contact strings, so the input is constructed deterministically from
# customer columns (IDENTICALLY on both engines — the redaction rules
# are what is under test, and they do real work on every row). Pure
# per-row regex projection: embarrassingly parallel, no shuffle.
# --------------------------------------------------------------------------

_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"

_PII_ORACLE = f"""
WITH raw AS (
  SELECT c_custkey,
         'contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
         || '@example.com or +1-555-'
         || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         || ' segment ' || c_mktsegment AS txt
  FROM customer
)
SELECT c_custkey,
       regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
       CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(txt, '{_PHONE_RE}')) AS BIGINT) AS n_phones
FROM raw
"""


@register("curation_pii_redact", _PII_ORACLE, tags=("llm", "curation"))
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    txt = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    raw = cust.select("c_custkey", txt.alias("txt"))
    return raw.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        F.size(F.regexp_extract_all(F.col("txt"), F.lit(_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("txt"), F.lit(_PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phones"),
    )


# --------------------------------------------------------------------------
# URL canonicalization + dedup: normalize crawl URLs (case-fold the
# host, strip scheme / www. / query string / fragment / trailing slash)
# and keep the first document per canonical URL — the crawl-side dedup
# that runs before any content hashing. URL variants are derived
# deterministically from fixture columns on both engines; the
# normalization chain is the operator under test. One shuffle, on the
# canonical-URL key.
# --------------------------------------------------------------------------

_URL_NORM_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "lower({u}), '^https?://', ''), '^www\\.', ''), '[?#].*$', ''), '/$', '')"
)

_URL_ORACLE = f"""
WITH raw AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'https://' || source || '.example.com/page/' || CAST(doc_id % 50 AS VARCHAR)
           WHEN 1 THEN 'HTTP://WWW.' || source || '.EXAMPLE.COM/page/' || CAST(doc_id % 50 AS VARCHAR) || '/'
           WHEN 2 THEN 'http://' || source || '.example.com/page/' || CAST(doc_id % 50 AS VARCHAR) || '?utm=x'
           ELSE 'https://www.' || source || '.example.com/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
         END AS url
  FROM documents
), canon AS (
  SELECT doc_id, url, {_URL_NORM_SQL.format(u='url')} AS canonical_url
  FROM raw
)
SELECT canonical_url,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_variants
FROM canon GROUP BY canonical_url
"""


@register("curation_url_dedup", _URL_ORACLE, tags=("llm", "curation"))
def curation_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = (F.col("doc_id") % 50).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/page/"), key),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("HTTP://WWW."),
                F.col("source"),
                F.lit(".EXAMPLE.COM/page/"),
                key,
                F.lit("/"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("http://"), F.col("source"), F.lit(".example.com/page/"), key, F.lit("?utm=x")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www."),
                F.col("source"),
                F.lit(".example.com/page/"),
                key,
                F.lit("#frag"),
            )
        )
    )
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(url), "^https?://", ""),
                "^www\\.",
                "",
            ),
            "[?#].*$",
            "",
        ),
        "/$",
        "",
    )
    return (
        docs.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


# --------------------------------------------------------------------------
# Source/language mixing: epochs-per-stratum reweighting toward a
# uniform token budget (the "data mixing" step of training-data
# pipelines: under-represented strata are repeated up to a cap,
# over-represented ones are downsampled). Fractional epochs
# materialize deterministically: every doc gets floor(epochs) copies
# plus one more iff its md5 fraction falls below the fractional part —
# exact importance resampling without RNG, stable under corpus growth.
# Plan shape: per-row token counts, one tiny per-lang agg, broadcast
# join back — the corpus-side scan never shuffles.
# --------------------------------------------------------------------------

_MIX_CAP = 4.0

_MIX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, {sql_token_count('text')} AS n_tokens FROM documents
), stats AS (
  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens FROM toks GROUP BY lang
), tot AS (
  SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_langs
  FROM stats
), epochs AS (
  SELECT lang, lang_tokens,
         LEAST({_MIX_CAP},
               (CAST(total_tokens AS DOUBLE) / n_langs) / lang_tokens)
           AS epochs
  FROM stats CROSS JOIN tot
), copies AS (
  SELECT t.doc_id, t.lang, t.n_tokens,
         CAST(FLOOR(e.epochs) AS BIGINT)
         + CASE WHEN CAST(('0x' || substring(
                   md5('mix_' || CAST(t.doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                   / 65536.0 < e.epochs - FLOOR(e.epochs)
                THEN 1 ELSE 0 END AS n_copies
  FROM toks t JOIN epochs e USING (lang)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_copies) AS BIGINT) AS docs_out,
       CAST(SUM(n_copies * n_tokens) AS BIGINT) AS tokens_out
FROM copies GROUP BY lang
"""


@register("curation_source_mixing", _MIX_ORACLE, tags=("llm", "curation"))
def curation_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    stats = toks.groupBy("lang").agg(F.sum("n_tokens").alias("lang_tokens"))
    tot = stats.agg(
        F.sum("lang_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    epochs = stats.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(_MIX_CAP),
            (F.col("total_tokens").cast("double") / F.col("n_langs"))
            / F.col("lang_tokens"),
        ).alias("epochs"),
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("bigint")
        / 65536.0
    )
    copies = toks.join(F.broadcast(epochs), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        (
            F.floor("epochs").cast("bigint")
            + F.when(frac < F.col("epochs") - F.floor("epochs"), 1).otherwise(0)
        ).alias("n_copies"),
    )
    return copies.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_copies").alias("docs_out"),
        F.sum(F.col("n_copies") * F.col("n_tokens")).alias("tokens_out"),
    )


# --------------------------------------------------------------------------
# Context-window chunking: split every document into fixed-size token
# chunks with overlap (size 50, stride 40) — the standard preprocessing
# for sequence training and retrieval indexing. Pure per-row
# array arithmetic (tokenize once, slice per chunk start) exploded to
# one row per chunk: no shuffle, embarrassingly parallel, the 1->N row
# shape Spark's generators pipeline inside whole-stage codegen.
# --------------------------------------------------------------------------

_CHUNK_SIZE = 50
_CHUNK_STRIDE = 40

_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {{t}} AS toks FROM documents
), nonempty AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) > 0
), chunks AS (
  SELECT doc_id, n, unnest(range(0, n, {_CHUNK_STRIDE})) AS start
  FROM nonempty
)
SELECT c.doc_id,
       CAST(c.start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(t.toks, c.start + 1, c.start + {_CHUNK_SIZE}))
            AS BIGINT) AS chunk_tokens,
       array_to_string(
         list_slice(t.toks, c.start + 1, c.start + {_CHUNK_SIZE}), ' ')
         AS chunk_text
FROM chunks c JOIN nonempty t USING (doc_id)
"""


@register(
    "curation_chunking",
    _CHUNK_ORACLE.format(t=sql_tokens("text")),
    tags=("llm", "curation"),
)
def curation_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    chunked = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, _CHUNK_SIZE)
    return chunked.select(
        "doc_id",
        (F.col("start") / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# Soft quality sampling (CCNet/Gopher-style): keep each document with
# probability proportional to its quality score instead of a hard
# cutoff — deterministic via the md5-fraction device (a doc's fate
# never changes as the corpus grows). Pure projection + filter.
# --------------------------------------------------------------------------

_SOFT_SAMPLE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         ROUND({sql_quality_score('text')}, 6) AS q,
         CAST(('0x' || substring(md5('soft_' || CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) / 65536.0 AS u
  FROM documents
)
SELECT doc_id, source, q
FROM scored
WHERE u < least(q * 1.25, 1.0)
"""


@register("curation_soft_quality_sample", _SOFT_SAMPLE_ORACLE, tags=("llm", "curation"))
def curation_soft_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = F.round(quality_score(F.col("text")), 6)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("soft_"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("bigint")
        / 65536.0
    )
    return (
        docs.select("doc_id", "source", q.alias("q"), u.alias("u"))
        .filter(F.col("u") < F.least(F.col("q") * 1.25, F.lit(1.0)))
        .drop("u")
    )


# --------------------------------------------------------------------------
# DSIR-style importance sampling (Xie et al. 2023, "Data Selection via
# Importance Resampling"): score each document by the log-ratio of a
# target-domain hashed-unigram model to the raw-corpus model, then keep
# the top slice. Target domain here = lang='en' documents; features =
# md5-hashed token buckets (B=64) with Laplace smoothing. Per-bucket
# log-ratios are 9-grid rounded and per-doc sums are DECIMAL-exact, so
# the scores (and the top-100 selection, tie-broken by doc_id) are
# engine-portable. Plan shape: one token explode, two bucket-count
# shuffles (bucket cardinality 64 -> tiny), scalar totals broadcast,
# one doc-level agg — the corpus is scanned once and never re-shuffled
# on anything wider than doc_id.
# --------------------------------------------------------------------------

_B = 64  # hashed feature buckets

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT d.doc_id, d.lang,
         CAST(('0x' || substring(md5(t.token), 1, 8)) AS BIGINT) % {_B} AS b
  FROM documents d, unnest({sql_tokens('d.text')}) AS t(token)
),
ct AS (SELECT b, COUNT(*) AS n FROM tok WHERE lang = 'en' GROUP BY b),
cr AS (SELECT b, COUNT(*) AS n FROM tok GROUP BY b),
tots AS (
  SELECT (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS tt,
         (SELECT COUNT(*) FROM tok) AS tr
),
w AS (
  SELECT cr.b,
         ROUND(LN(CAST((COALESCE(ct.n, 0) + 1) * (tots.tr + {_B}) AS DOUBLE)
                  / CAST((cr.n + 1) * (tots.tt + {_B}) AS DOUBLE)), 9) AS wb
  FROM cr LEFT JOIN ct USING (b) CROSS JOIN tots
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CAST(wb AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS dsir_score
FROM tok JOIN w USING (b)
GROUP BY doc_id
ORDER BY dsir_score DESC, doc_id
LIMIT 100
"""


@register("curation_dsir_sample", _DSIR_ORACLE, tags=("llm", "curation"))
def curation_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens(F.col("text"))).alias("token"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint") % _B
        ).alias("b"),
    )
    # ONE corpus pass builds both bucket models (target = conditional
    # count), and the totals derive from the 64-row bucket table — so
    # the token table is scanned twice overall (model + scoring), not
    # four times; the only wide shuffle is the cardinality-64 bucket agg
    stats = tok.groupBy("b").agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
    ).persist()  # 64 rows consumed twice (totals + weights): one model pass
    tots = stats.agg(F.sum("nt").alias("tt"), F.sum("nr").alias("tr"))
    w = (
        stats.crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.coalesce(F.col("nt"), F.lit(0)) + 1) * (F.col("tr") + _B)).cast(
                        "double"
                    )
                    / ((F.col("nr") + 1) * (F.col("tt") + _B)).cast("double")
                ),
                9,
            ).alias("wb"),
        )
    )
    return (
        tok.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.col("wb").cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("dsir_score"),
        )
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Paragraph-level exact dedup with document reconstruction (the
# CCNet/RefinedWeb "dedup at paragraph granularity" pass): explode each
# document into position-tagged sentence units, keep the corpus-wide
# FIRST occurrence of each normalized unit (md5 key, winner =
# lexicographic (doc_id, pos) — deterministic), then rebuild every
# document from its surviving units in original order. Plan shape: one
# explode (no shuffle), one window shuffle on the unit hash, one
# groupBy shuffle on doc_id — both keys are high-cardinality and
# skew-free, so the shape holds at corpus scale.
# --------------------------------------------------------------------------

_PARA_DEDUP_ORACLE = """
WITH units AS (
  SELECT d.doc_id, u.i AS pos,
         string_split_regex(d.text, '\\. ')[u.i] AS para
  FROM documents d,
       unnest(range(1, len(string_split_regex(d.text, '\\. ')) + 1)) AS u(i)
), clean AS (
  SELECT doc_id, pos, para, md5(lower(trim(para))) AS k
  FROM units WHERE trim(para) <> ''
), flagged AS (
  SELECT doc_id, pos, para,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id, pos) = 1
              THEN 1 ELSE 0 END AS kept
  FROM clean
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_units,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       COALESCE(string_agg(para, '. ' ORDER BY pos) FILTER (WHERE kept = 1),
                '') AS kept_text
FROM flagged
GROUP BY doc_id
"""


@register("curation_paragraph_dedup", _PARA_DEDUP_ORACLE, tags=("llm", "curation", "dedup"))
def curation_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    units = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("pos0", "para"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "para")
    clean = units.filter(F.trim("para") != "").withColumn(
        "k", F.md5(F.lower(F.trim("para")))
    )
    w = Window.partitionBy("k").orderBy("doc_id", "pos")
    flagged = clean.withColumn(
        "kept", F.when(F.row_number().over(w) == 1, 1).otherwise(0)
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept") == 1, F.struct("pos", "para")
                            )
                        )
                    ),
                    lambda x: x["para"],
                ),
                ". ",
            ),
            F.lit(""),
        ).alias("kept_text"),
    )
