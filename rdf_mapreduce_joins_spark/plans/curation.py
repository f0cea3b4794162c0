"""Training-data curation queries (SURVEY.md §2.10 table 3 extension):
deterministic weighted sampling, temperature-scaled domain mixing, and
n-gram language-model statistics over the ``documents`` table.

These are the selection/mixing primitives a pretraining-data pipeline
runs AFTER dedup and quality scoring: choose WHICH surviving documents
to train on and in WHAT proportions. All three are engine-portable by
construction (hash-derived pseudo-randomness, no RNG), so each carries
a full DuckDB oracle and hash-matches cross-engine.

Scale posture: every query here is one or two shuffles on bounded
keys — weighted sampling is a global top-k (TakeOrdered, no full
sort materialization), mixture selection is one per-language window,
bigram counting is explode + two same-key aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import load_table, spread

WEIGHTED_SAMPLE_K = 100
MIXTURE_BUDGET = 250
BIGRAM_TOPK = 25


def _hash_uniform(prefix: str, key_col: str):
    """Deterministic uniform(0,1) from the first 8 md5 hex chars of a
    salted key — the engine-portable substitute for rand(): identical
    in Spark (conv base-16) and DuckDB ('0x..'::BIGINT), stable across
    runs, partitionings, and cluster layouts. +0.5 keeps u strictly
    inside (0,1) so ln(u) is finite."""
    h = F.substring(
        F.md5(F.concat(F.lit(prefix), F.col(key_col).cast("string"))), 1, 8
    )
    return (F.conv(h, 16, 10).cast("double") + F.lit(0.5)) / F.lit(4294967296.0)


@query(
    "sample_weighted_docs",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             (('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              + 0.5) / 4294967296.0 AS u
      FROM documents
    )
    SELECT doc_id, lang, n_chars
    FROM u
    ORDER BY ln(u) / n_chars DESC, doc_id
    LIMIT {WEIGHTED_SAMPLE_K}
    """,
)
def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006): inclusion probability proportional to
    document length, reproducible across engines because the uniform
    draw is hash-derived, not an RNG. Each doc gets key ln(u)/w
    (monotone in u^(1/w)); the global top-k by key IS an exact
    w-weighted sample without replacement — the one-pass, shuffle-free
    formulation (TakeOrdered: per-partition top-k then a k-row driver
    merge, no global sort) that scales to any corpus size. The
    standard curation move of oversampling long/high-quality documents
    without a materialized multinomial draw."""
    d = load_table(spark, sf_dir, "documents")
    key = F.ln(_hash_uniform("wsamp:", "doc_id")) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", "n_chars", key.alias("__k"))
        .orderBy(F.col("__k").desc(), "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
        .drop("__k")
    )


@query(
    "docs_temperature_mixture",
    oracle=f"""
    WITH c AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    tgt AS (
      SELECT lang, n,
             LEAST(n, CAST(FLOOR(ROUND(
               {MIXTURE_BUDGET} * sqrt(n) / (SELECT SUM(sqrt(n)) FROM c), 6
             )) AS BIGINT)) AS target
      FROM c
    ),
    r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.lang
    FROM r JOIN tgt ON r.lang = tgt.lang
    WHERE r.rn <= tgt.target
    """,
)
def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-pretraining
    rebalance, alpha = 0.5): per-language quotas proportional to
    sqrt(count) — upweights tail languages, downweights the head —
    then a deterministic hash-ordered draw fills each quota. sqrt is
    IEEE-correctly-rounded (unlike pow), and the quota rounds to 6 dp
    before FLOOR so the two engines' float sums cannot straddle the
    integer boundary. One tiny aggregate (n_langs rows, broadcast
    join) + one per-language window — a single shuffle on lang; the
    window never sees more than one language per partition, so skew is
    bounded by the largest language, same as any per-domain pass."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    total = c.agg(F.sum(F.sqrt("n")).alias("s"))
    tgt = (
        c.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n",
            F.least(
                F.col("n"),
                F.floor(
                    F.round(F.lit(MIXTURE_BUDGET) * F.sqrt("n") / F.col("s"), 6)
                ),
            ).alias("target"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    ranked = d.select("doc_id", "lang", rn.alias("rn"))
    return (
        ranked.join(F.broadcast(tgt), on="lang")
        .filter(F.col("rn") <= F.col("target"))
        .select("doc_id", "lang")
    )


@query(
    "text_bigram_lm",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    postok AS (
      SELECT doc_id, unnest(w) AS w1, generate_subscripts(w, 1) AS pos FROM t
    ),
    bg AS (
      SELECT w1, lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM postok QUALIFY w2 IS NOT NULL
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
    tot AS (SELECT w1, SUM(n) AS n1 FROM cnt GROUP BY w1)
    SELECT cnt.w1, cnt.w2, CAST(cnt.n AS BIGINT) AS n,
           ROUND(cnt.n * 1.0 / tot.n1, 6) AS p
    FROM cnt JOIN tot ON cnt.w1 = tot.w1
    ORDER BY cnt.n DESC, cnt.w1, cnt.w2
    LIMIT {BIGRAM_TOPK}
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model statistics: count every adjacent
    token pair, estimate the conditional P(w2 | w1) = c(w1,w2)/c(w1),
    and return the top-k bigrams — the counting backbone of n-gram LM
    training, data-quality probes (stock-phrase detection), and
    contamination fingerprints. Plan (round 11, guide §2.4): adjacent
    pairs are a ROW-LOCAL zip of the token array with its shifted self
    — the old posexplode + per-document lead() window paid a full
    exchange+sort of the exploded token stream just to look one row
    ahead inside data that never left its document. One scan, then two
    aggregations that share the w1 key — the unigram totals reuse the
    bigram counts (SUM over the grouped frame, no second corpus pass)
    and the join back is on the low-cardinality w1 key. Top-k is
    TakeOrdered, not a global sort."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.split(F.lower("text"), " ")
    m = F.size(w) - 1
    pairs = F.zip_with(
        F.slice(w, 1, m),
        F.slice(w, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = d.select(
        F.explode(
            F.when(F.size(w) >= 2, pairs).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("w1").agg(F.sum("n").alias("n1"))
    return (
        cnt.join(tot, on="w1")
        .select(
            "w1",
            "w2",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("n1"), 6).alias("p"),
        )
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(BIGRAM_TOPK)
    )


PHRASE = ("table", "hash")


@query(
    "text_search_phrase",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    postok AS (
      SELECT doc_id, unnest(w) AS w1, generate_subscripts(w, 1) AS pos FROM t
    ),
    bg AS (
      SELECT doc_id, w1,
             lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM postok
    ),
    hits AS (
      SELECT doc_id FROM bg
      WHERE w1 = '{PHRASE[0]}' AND w2 = '{PHRASE[1]}'
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM hits GROUP BY doc_id
    """,
)
def text_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("{p0} {p1}" as an exact adjacent-token
    match, not a substring LIKE). Round 11 (guide §2.4): an adjacent-
    pair match is a function of ONE document, so the whole query is a
    row-local zip of the token array with its shifted self — count the
    positions where (w[i], w[i+1]) equals the phrase, keep docs with a
    hit. Zero shuffles, zero joins (the old posexplode + positional
    self-join on (doc_id, pos+1) shuffled the two terms' postings to
    rediscover adjacency the array already encodes). Adding a third
    term extends the zip, not the plan. LIKE '%...%' can't do this
    correctly (it matches across token boundaries and can't rank by
    occurrence count without re-scanning)."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.split(F.lower("text"), " ")
    m = F.size(w) - 1
    hits = F.zip_with(
        F.slice(w, 1, m),
        F.slice(w, 2, m),
        lambda a, b: (a == PHRASE[0]) & (b == PHRASE[1]),
    )
    n_occ = F.when(
        F.size(w) >= 2, F.size(F.filter(hits, lambda x: x))
    ).otherwise(F.lit(0))
    return (
        d.select("doc_id", n_occ.cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 1)
    )


text_search_phrase.__doc__ = text_search_phrase.__doc__.format(
    p0=PHRASE[0], p1=PHRASE[1]
)


@query(
    "docs_novelty_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
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
      SELECT DISTINCT doc_id, w1 || ' ' || w2 AS bg
      FROM nbr WHERE w2 IS NOT NULL
    ),
    first_seen AS (
      SELECT bg, MIN(doc_id) AS first_doc FROM bi GROUP BY bg
    )
    SELECT bi.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN f.first_doc = bi.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(FLOOR(SUM(CASE WHEN f.first_doc = bi.doc_id
                               THEN 1 ELSE 0 END) * 1000000.0
                      / COUNT(*) + 0.5) AS BIGINT) AS novelty_e6
    FROM bi JOIN first_seen f ON bi.bg = f.bg
    GROUP BY bi.doc_id
    """,
)
def docs_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's DISTINCT bigrams
    that no lower-id document contains — the contribution score used
    for curriculum ordering and diminishing-returns curation (a doc
    whose n-grams are all already covered adds little; dedup catches
    copies, novelty catches recombinations). First-occurrence is a
    MIN(doc_id) per bigram — one aggregation, no doc×doc comparison,
    so cost is corpus-bigram-bounded, never pairwise (the naive
    formulation self-joins every doc against all earlier ones). The
    join back rides the same bigram key; score ships as integer
    millionths via floor(x+.5) (engine-identical halfway rule).

    Round 11 (guide §2.4): the per-document DISTINCT bigram set is
    row-local — a zip of the token array with its shifted self, then
    array_distinct BEFORE the explode. The old posexplode + lead()
    window + distinct paid two full exchanges of the bigram stream
    (window sort on doc_id, distinct hash) for a dedup whose key
    includes doc_id and so never crosses rows."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.split(F.lower("text"), " ")
    m = F.size(w) - 1
    grams = F.zip_with(
        F.slice(w, 1, m),
        F.slice(w, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bi = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.when(F.size(w) >= 2, grams).otherwise(
                    F.array().cast("array<string>")
                )
            )
        ).alias("bg"),
    )
    first_seen = bi.groupBy("bg").agg(F.min("doc_id").alias("first_doc"))
    j = bi.join(first_seen, on="bg")
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        novel.cast("bigint").alias("n_novel"),
        F.floor(novel * 1000000.0 / F.count(F.lit(1)) + 0.5)
        .cast("bigint")
        .alias("novelty_e6"),
    )


_CARD_T80 = format(int(0.8 * 16**8), "08x")
_CARD_T90 = format(int(0.9 * 16**8), "08x")


@query(
    "docs_dataset_card",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             md5(text) AS content_md5,
             substr(md5('split2:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hk
      FROM documents
    )
    SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM base
    UNION ALL
    SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT) FROM base
    UNION ALL
    SELECT 'n_sources', CAST(COUNT(DISTINCT source) AS BIGINT) FROM base
    UNION ALL
    SELECT 'total_tokens', CAST(SUM(n_tokens) AS BIGINT) FROM base
    UNION ALL
    SELECT 'total_chars', CAST(SUM(n_chars) AS BIGINT) FROM base
    UNION ALL
    SELECT 'exact_dup_docs',
           CAST(COUNT(*) - COUNT(DISTINCT content_md5) AS BIGINT) FROM base
    UNION ALL
    SELECT 'n_train',
           CAST(SUM(CASE WHEN hk < '{_CARD_T80}' THEN 1 ELSE 0 END) AS BIGINT)
    FROM base
    UNION ALL
    SELECT 'n_val',
           CAST(SUM(CASE WHEN hk >= '{_CARD_T80}' AND hk < '{_CARD_T90}'
                         THEN 1 ELSE 0 END) AS BIGINT) FROM base
    UNION ALL
    SELECT 'n_test',
           CAST(SUM(CASE WHEN hk >= '{_CARD_T90}' THEN 1 ELSE 0 END) AS BIGINT)
    FROM base
    """,
)
def docs_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card (release-manifest statistics a corpus ships
    with): corpus size, language/source diversity, token and char
    totals, exact-duplicate count, and train/val/test split sizes
    (same salted-md5 rule as dataset_split_assign, so the card's
    split sizes are exactly what that query materializes) — emitted
    as one long-format (metric, value) frame from ONE base
    projection. All nine metrics partial-combine (counts, sums,
    distinct-counts), so the whole card is a couple of aggregates
    over a single corpus scan at any scale; the distinct-counts are
    the only shuffled keys and both are content-bounded (langs,
    sources, text digests)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5("text").alias("content_md5"),
        F.substring(
            F.md5(F.concat(F.lit("split2:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ).alias("hk"),
    )
    # ONE aggregation computing all nine metrics, then stack() to the
    # long format — the first cut unioned nine base.agg() branches,
    # which Spark plans as nine independent corpus scans (no common
    # subplan dedup); caught by the round-4 self-review.
    wide = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.count(F.lit(1)) - F.countDistinct("content_md5"))
        .cast("bigint")
        .alias("exact_dup_docs"),
        F.sum(F.when(F.col("hk") < _CARD_T80, 1).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.sum(
            F.when(
                (F.col("hk") >= _CARD_T80) & (F.col("hk") < _CARD_T90), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_val"),
        F.sum(F.when(F.col("hk") >= _CARD_T90, 1).otherwise(0))
        .cast("bigint")
        .alias("n_test"),
    )
    metrics = [
        "n_docs", "n_langs", "n_sources", "total_tokens", "total_chars",
        "exact_dup_docs", "n_train", "n_val", "n_test",
    ]
    stack_expr = "stack({}, {}) as (metric, value)".format(
        len(metrics), ", ".join(f"'{m}', {m}" for m in metrics)
    )
    return wide.selectExpr(stack_expr)
