"""Training-dataset assembly ops, part 2: repetition filtering, domain
mixing, incremental dedup, deterministic global shuffle, and a composed
quality-gate pipeline.

These extend the assembly surface in plans/llm.py (stratified sampling,
split assignment, sequence packing, chunking, PII scrub, contamination)
with the remaining staples a large-scale pretraining-data pipeline runs
per batch. Every query here is full-SQL-oracled — all metrics are exact
integer/string arithmetic, and all sampling is salted-md5 deterministic
(identical across engines, runs, and cluster layouts).

Scale notes are per-query; the common theme: no global sorts, no
driver-side state, one shuffle per aggregation keyed on the natural
partition key (doc_id / source / shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators import text
from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import bounded_sort, load_table

# --------------------------------------------------------------------------
# Repetition detection (Gopher-style duplicate-text heuristics)
# --------------------------------------------------------------------------

# Shared CTE chain: per-document word and bigram duplication stats.
_REPETITION_CTES = """
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
    wc AS (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY doc_id, tk),
    ws AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_c
      FROM wc GROUP BY doc_id
    ),
    postok AS (
      SELECT doc_id, unnest(w) AS w1, generate_subscripts(w, 1) AS pos FROM t
    ),
    nbr AS (
      SELECT doc_id, w1,
             lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM postok
    ),
    bi AS (
      SELECT doc_id, w1 || ' ' || w2 AS bg FROM nbr WHERE w2 IS NOT NULL
    ),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY doc_id, bg),
    bs AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
      FROM bc GROUP BY doc_id
    )
"""


def _repetition_frame(d: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_word_frac, top_word_frac, dup_bigram_frac)
    — the duplicate-line/-ngram heuristics of training-data repetition
    filters, exact arithmetic.

    Shape (round 11, guide §2.4): every statistic here is a function of
    ONE document, so nothing needs to leave the row — counts come from
    size/array_distinct over the token and bigram arrays and the top
    multiplicity from a row-local sorted fold (text.max_multiplicity).
    The previous explode → per-(doc, gram) count → per-doc agg form
    paid four shuffles and two corpus scans for the same integers; this
    is one scan, zero shuffles, embarrassingly parallel at any scale.
    The bigram-count filter reproduces the old ws⋈bs inner join: docs
    with <2 tokens have no bigram row on either engine."""
    w = F.col("w")
    bg = F.col("bg")
    return (
        d.select(
            "doc_id",
            text.tokens("text").alias("w"),
            text.word_ngrams("text", 2).alias("bg"),
        )
        .filter(F.size(bg) >= 1)
        .select(
            "doc_id",
            F.size(w).cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct"),
            text.max_multiplicity(w).alias("top_c"),
            F.size(bg).cast("bigint").alias("n_bigrams"),
            F.size(F.array_distinct(bg)).cast("bigint").alias(
                "n_distinct_bigrams"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(1 - F.col("n_distinct") / F.col("n_tokens"), 4).alias(
                "dup_word_frac"
            ),
            F.round(F.col("top_c") / F.col("n_tokens"), 4).alias(
                "top_word_frac"
            ),
            F.round(
                1 - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 4
            ).alias("dup_bigram_frac"),
        )
    )


@query(
    "docs_repetition_scores",
    oracle=f"""
    WITH {_REPETITION_CTES}
    SELECT ws.doc_id, n_tokens,
           ROUND(1 - n_distinct * 1.0 / n_tokens, 4) AS dup_word_frac,
           ROUND(top_c * 1.0 / n_tokens, 4) AS top_word_frac,
           ROUND(1 - n_distinct_bigrams * 1.0 / n_bigrams, 4) AS dup_bigram_frac
    FROM ws JOIN bs ON ws.doc_id = bs.doc_id
    """,
)
def docs_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (Gopher-rule family): per-document duplicate
    word fraction, top-word fraction, and duplicate bigram fraction —
    the heuristics repetition filters gate on before training. Docs
    with fewer than 2 tokens have no bigrams and drop out on both
    engines (inner join)."""
    return _repetition_frame(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Domain mixing (weighted per-source sampling)
# --------------------------------------------------------------------------

# Per-source target sampling rates; sources not named get the default.
# Thresholds are 8-hex-digit md5-prefix cutoffs so selection is a pure
# string comparison on both engines (same construction as
# dataset_split_assign in plans/llm.py).
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.75}
_MIX_DEFAULT_RATE = 0.25


def _hex_threshold(rate: float) -> str:
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


@query(
    "docs_domain_mixture",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hk
      FROM documents
    )
    SELECT doc_id, source FROM h
    WHERE hk <= CASE
      WHEN source = 'src0' THEN '{_hex_threshold(_MIX_RATES["src0"])}'
      WHEN source = 'src1' THEN '{_hex_threshold(_MIX_RATES["src1"])}'
      WHEN source = 'src2' THEN '{_hex_threshold(_MIX_RATES["src2"])}'
      ELSE '{_hex_threshold(_MIX_DEFAULT_RATE)}' END
    """,
)
def docs_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing (the per-source reweighting step of pretraining
    mixes): keep each document iff its salted-md5 prefix falls under
    its source's target rate threshold. A pure per-row projection +
    filter — no shuffle at any scale, and the SAME documents are kept
    whatever the partitioning (unlike rand()-based sampleBy). Upsampling
    (rate > 1) composes as this filter plus an explode of a repeat
    array; not exercised here to keep the row set a subset."""
    d = load_table(spark, sf_dir, "documents")
    hk = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8
    )
    thr = (
        F.when(F.col("source") == "src0", F.lit(_hex_threshold(_MIX_RATES["src0"])))
        .when(F.col("source") == "src1", F.lit(_hex_threshold(_MIX_RATES["src1"])))
        .when(F.col("source") == "src2", F.lit(_hex_threshold(_MIX_RATES["src2"])))
        .otherwise(F.lit(_hex_threshold(_MIX_DEFAULT_RATE)))
    )
    return (
        d.select("doc_id", "source", hk.alias("hk"), thr.alias("thr"))
        .filter(F.col("hk") <= F.col("thr"))
        .select("doc_id", "source")
    )


# --------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus
# --------------------------------------------------------------------------


@query(
    "dedup_incremental_batch",
    oracle="""
    SELECT d.doc_id, md5(d.text) AS content_md5
    FROM documents d
    WHERE d.source = 'src0'
      AND NOT EXISTS (
        SELECT 1 FROM documents o
        WHERE o.source <> 'src0' AND md5(o.text) = md5(d.text)
      )
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (the per-batch ingest step): documents
    of the NEW batch (source = src0 stands in for today's crawl) whose
    content hash does not already exist in the corpus (all other
    sources). An anti join on the digest: shuffles both sides on a
    uniformly distributed key — skew-free by construction; when the
    daily batch is small relative to the corpus, production runs keep
    a bloom filter of corpus digests to skip the corpus-side shuffle
    (same plan shape AQE picks when the batch side broadcasts)."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", "source", F.md5("text").alias("content_md5"))
    new = hashed.filter(F.col("source") == "src0")
    corpus = hashed.filter(F.col("source") != "src0").select("content_md5")
    return new.join(corpus, on="content_md5", how="left_anti").select(
        "doc_id", "content_md5"
    )


# --------------------------------------------------------------------------
# Deterministic global shuffle (training-order assignment)
# --------------------------------------------------------------------------


@query(
    "docs_global_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    ),
    s AS (
      SELECT doc_id, hk,
             CAST(instr('0123456789abcdef', substr(hk, 1, 1)) - 1 AS INTEGER)
               AS shard
      FROM h
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY hk, doc_id
           ) AS BIGINT) AS shard_pos
    FROM s
    """,
)
def docs_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle (training-order assignment): every
    document gets a (shard, shard_pos) — shard from the first hex digit
    of a salted md5 (16 shards), position by ranking the full digest
    within the shard. Reading shards in order then rows by position
    yields a reproducible corpus-wide pseudo-random order WITHOUT a
    global sort: shard assignment is a projection, and the per-shard
    rank is a window over the shard partitioning — one bounded shuffle,
    each shard sorting independently. This is how epoch shuffles are
    done at 100 TB (a true ORDER BY rand() is a full-corpus range
    exchange)."""
    d = load_table(spark, sf_dir, "documents")
    hk = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    shard = (
        F.instr(F.lit("0123456789abcdef"), F.substring(F.col("hk"), 1, 1)) - 1
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("hk", "doc_id")
    return (
        d.select("doc_id", hk.alias("hk"))
        .withColumn("shard", shard)
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "shard_pos")
    )


# --------------------------------------------------------------------------
# Composed quality-gate pipeline (first-failing-reason verdict)
# --------------------------------------------------------------------------

MIN_TOKENS = 10
MIN_ALPHA_RATIO = 0.6
MAX_TOP_WORD_FRAC = 0.15


@query(
    "docs_quality_filter_pipeline",
    oracle=f"""
    WITH {_REPETITION_CTES},
    q AS (
      SELECT doc_id,
             ROUND(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
                   / length(text), 4) AS alpha_ratio
      FROM documents
    ),
    m AS (
      SELECT ws.doc_id, ws.n_tokens, q.alpha_ratio,
             ROUND(ws.top_c * 1.0 / ws.n_tokens, 4) AS top_word_frac
      FROM ws JOIN q ON ws.doc_id = q.doc_id
    )
    SELECT doc_id,
           CASE WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
                WHEN alpha_ratio < {MIN_ALPHA_RATIO} THEN 'low_alpha'
                WHEN top_word_frac > {MAX_TOP_WORD_FRAC} THEN 'repetitive'
                ELSE 'keep' END AS verdict
    FROM m
    """,
)
def docs_quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed quality-gate pipeline: the cascade a pretraining
    pipeline applies per document — length gate, then alphabetic-ratio
    gate, then repetition gate — with the FIRST failing gate as the
    verdict (so downstream dashboards see why volume was dropped).
    All gates are per-row projections (round 11, guide §2.4: the token
    stats come from the row-local size/sorted-fold forms instead of an
    explode → two aggregations → join — one scan, zero shuffles); the
    gates short-circuit in a single CASE, no per-gate passes over the
    data. The text-not-null filter reproduces the old explode's
    implicit drop of null-text documents."""
    d = load_table(spark, sf_dir, "documents")
    w = F.col("w")
    m = (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "text",
            text.tokens("text").alias("w"),
        )
        .select(
            "doc_id",
            F.size(w).cast("bigint").alias("n_tokens"),
            F.round(
                F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
                / F.length("text"),
                4,
            ).alias("alpha_ratio"),
            F.round(
                text.max_multiplicity(w) / F.size(w).cast("bigint"), 4
            ).alias("top_word_frac"),
        )
    )
    verdict = (
        F.when(F.col("n_tokens") < MIN_TOKENS, F.lit("too_short"))
        .when(F.col("alpha_ratio") < MIN_ALPHA_RATIO, F.lit("low_alpha"))
        .when(F.col("top_word_frac") > MAX_TOP_WORD_FRAC, F.lit("repetitive"))
        .otherwise(F.lit("keep"))
    )
    return m.select("doc_id", verdict.alias("verdict"))


@query(
    "assembly_training_manifest",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, lang, text, md5(text) AS h FROM documents
    ),
    deduped AS (
      SELECT doc_id, lang, text FROM hashed
      WHERE doc_id = (SELECT MIN(doc_id) FROM hashed h2 WHERE h2.h = hashed.h)
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM deduped
    ),
    wc AS (SELECT doc_id, tk, COUNT(*) AS c FROM toks WHERE tk <> ''
           GROUP BY doc_id, tk),
    ws AS (SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_c FROM wc
           GROUP BY doc_id),
    kept AS (
      SELECT d.doc_id, d.lang, ws.n_tokens
      FROM deduped d JOIN ws ON d.doc_id = ws.doc_id
      WHERE ws.n_tokens >= {MIN_TOKENS}
        AND ROUND(length(regexp_replace(d.text, '[^a-z]', '', 'g')) * 1.0
                  / length(d.text), 4) >= {MIN_ALPHA_RATIO}
        AND ROUND(ws.top_c * 1.0 / ws.n_tokens, 4) <= {MAX_TOP_WORD_FRAC}
    )
    SELECT CASE WHEN substr(md5('split2:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < 'cccccccc' THEN 'train'
                WHEN substr(md5('split2:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < 'e6666666' THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM kept
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def assembly_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end corpus-assembly pipeline as one plan: exact
    dedup (min-doc_id representative per content hash) → the quality
    cascade (length / alpha-ratio / repetition gates) → deterministic
    hash split → per-(split, lang) manifest of surviving documents and
    token volume. Every stage is a component proven separately
    (dedup_exact_docs, docs_quality_filter_pipeline,
    dataset_split_assign); this query pins that they COMPOSE into one
    Catalyst plan — one pass for dedup + token stats, per-row split
    projection, one final aggregation — which is how a production run
    would actually execute them, not as separate jobs writing
    intermediate tables."""
    from rdf_mapreduce_joins_spark.plans.llm import _SPLIT_T80, _SPLIT_T90

    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", "lang", "text", F.md5("text").alias("h"))
    w = Window.partitionBy("h")
    deduped = (
        hashed.withColumn("min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("min_id"))
        .select("doc_id", "lang", "text")
    )
    # Token stats row-locally (round 11, guide §2.4): n_tokens and the
    # top multiplicity are per-document functions of the token array
    # (non-empty tokens only, as before), so the explode → two
    # aggregations → join back collapses into projections on the
    # deduped frame. The old deduped⋈ws inner join dropped docs with
    # zero non-empty tokens; the n_tokens >= MIN_TOKENS gate (10 > 0)
    # subsumes that drop exactly.
    wnz = F.filter(text.tokens("text"), lambda t: t != "")
    alpha = F.round(
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
        / F.length("text"),
        4,
    )
    kept = (
        deduped.select(
            "doc_id",
            "lang",
            "text",
            F.size(wnz).cast("bigint").alias("n_tokens"),
            text.max_multiplicity(wnz).alias("top_c"),
        )
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (alpha >= MIN_ALPHA_RATIO)
            & (F.round(F.col("top_c") / F.col("n_tokens"), 4) <= MAX_TOP_WORD_FRAC)
        )
        .select("doc_id", "lang", "n_tokens")
    )
    hk = F.substring(
        F.md5(F.concat(F.lit("split2:"), F.col("doc_id").cast("string"))), 1, 8
    )
    split = (
        F.when(hk < _SPLIT_T80, F.lit("train"))
        .when(hk < _SPLIT_T90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        kept.groupBy(split.alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .transform(bounded_sort, "split", "lang")
    )
