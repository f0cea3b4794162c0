"""Text analysis operators (SURVEY.md §2.9 X4): tokenization, n-gram
generation, quality scoring, fingerprinting, and a corpus-trained
naive-Bayes language identifier. All pure DataFrame ops — the hot path
stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.sources.tables import spread


# BPE-ish pre-tokenization split: letter runs, digit runs, single
# punctuation marks — the coarse segmentation every byte-pair tokenizer
# applies before merges. Restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB oracle): no \s, no
# unicode classes.
BPE_SPLIT_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_tokens(text_col: str = "text") -> F.Column:
    """Array of BPE-style pre-tokens (see BPE_SPLIT_RE). A real BPE
    vocab would merge within these; counting them is the standard
    cheap token-budget estimate for LLM training data."""
    return F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0))


def tokens(text_col: str = "text") -> F.Column:
    """Whitespace tokens (the corpus is space-separated word soup; a
    BPE-ish regex split would be F.split(col, r'\\s+|(?=[^\\w])') — not
    needed for this corpus)."""
    return F.split(F.col(text_col), " ")


def word_ngrams(text_col: str, n: int) -> F.Column:
    """Word n-grams as an array column — no explode until the caller
    wants rows. Built by zip_with over n shifted slices of the token
    array, NOT transform over indices: expressions referenced inside a
    higher-order-function lambda are re-evaluated on every lambda
    invocation, so the old `element_at(w, i + j)` form re-split the
    text per gram — O(len²) per document. zip_with's lambda touches
    only its lambda variables, and each slice evaluates the array
    once, so this form is O(len·n) (measured round 11: the quadratic
    form dominated every bigram query's per-task time)."""
    w = tokens(text_col)
    m = F.size(w) - (n - 1)
    grams = F.slice(w, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(w, 1 + j, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(w) >= n, grams).otherwise(F.array())


def max_multiplicity(arr: F.Column) -> F.Column:
    """Highest multiplicity of any element of a string-array column,
    computed ROW-LOCALLY: sort the array, then fold for the longest
    equal-run — O(n log n) per row inside whole-stage codegen. This is
    the shuffle-free form of "explode → count per (row, element) →
    max per row" (guide §2.4: per-document statistics never need to
    leave the row); exact integer result, BIGINT like the grouped
    count it replaces. Empty array → 0; null elements (not produced
    by split()) each count as a run of 1."""
    srt = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def _step(acc: F.Column, t: F.Column) -> F.Column:
        run = F.when(
            acc["prev"].isNotNull() & (acc["prev"] == t), acc["run"] + 1
        ).otherwise(F.lit(1).cast("bigint"))
        return F.struct(
            t.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(srt, init, _step, lambda acc: acc["best"])


def quality_metrics(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality scores: token count, mean token length,
    short-token ratio, non-alpha character ratio, and a combined score.
    Mirrors the length/punctuation/stopword-ratio heuristics of
    training-data quality filters; every metric is exact integer/double
    arithmetic so it is oracle-checkable."""
    w = tokens(text_col)
    n_tok = F.size(w)
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    short_toks = F.size(F.filter(w, lambda t: F.length(t) <= 3))
    # nullif denominators: an empty document must score 0 on every
    # ratio, not kill the whole job with ANSI DIVIDE_BY_ZERO (round-4
    # operator review, reproduced empirically on text='').
    safe_tok = F.nullif(n_tok, F.lit(0))
    safe_chars = F.nullif(n_chars, F.lit(0))
    mean_tok_len = (n_chars - (n_tok - 1)) / safe_tok  # single-space separated
    return docs.select(
        F.col(id_col),
        n_tok.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars_text"),
        F.coalesce(F.round(mean_tok_len, 4), F.lit(0.0)).alias("mean_token_len"),
        F.coalesce(F.round(short_toks / safe_tok, 4), F.lit(0.0)).alias(
            "short_token_ratio"
        ),
        F.coalesce(F.round(alpha_chars / safe_chars, 4), F.lit(0.0)).alias(
            "alpha_ratio"
        ),
        F.coalesce(
            F.round((alpha_chars / safe_chars) * (1 - short_toks / safe_tok), 4),
            F.lit(0.0),
        ).alias("quality_score"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over the unit-separator-joined token
    stream (whitespace-normalized, so it is stable under re-spacing)."""
    fp = F.md5(F.concat_ws("\x1f", tokens(text_col)))
    return docs.select(F.col(id_col), fp.alias("fingerprint"))


ROLLING_HASH_MOD = (1 << 54) - 33  # largest prime < 2^54


def rolling_hash(
    text_col: str, mod: int = ROLLING_HASH_MOD, base: int = 257
) -> F.Column:
    """Polynomial rolling hash over tokens (deterministic integer
    fold). Used as a cheap shift-resistant document fingerprint.

    The modulus must satisfy mod * base + 2^31 < 2^63 or the fold
    overflows BIGINT and ANSI mode kills the job — the original
    2^61-1 Mersenne modulus did exactly that on any document past a
    handful of tokens (acc*257 ≈ 2^69; round-4 operator review,
    reproduced empirically). The largest prime below 2^54 keeps the
    worst intermediate at ~2^62.01."""
    if mod * base + (1 << 31) >= (1 << 63):
        raise ValueError(
            f"mod*base={mod*base:#x} would overflow BIGINT in the fold; "
            "need mod * base + 2^31 < 2^63"
        )
    h0 = lambda t: F.pmod(F.xxhash64(t), F.lit(1 << 31))  # noqa: E731
    return F.aggregate(
        tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(base) + h0(t), F.lit(mod)),
    )


LANGID_BROADCAST_MAX_PROFILE_ROWS = 2_000_000


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    broadcast_max_profile_rows: int = LANGID_BROADCAST_MAX_PROFILE_ROWS,
) -> DataFrame:
    """Corpus-trained naive-Bayes language identifier over word
    unigrams.

    Trains per-language token log-likelihoods from the corpus' own
    labels, then classifies every document:

        score(d, L) = Σ_tok ln((count(tok, L) + 1) / (count(L) + V))

    with add-one smoothing: a token UNSEEN in language L contributes
    ln(1 / (count(L) + V)). The earlier inner-join version silently
    dropped unseen tokens, which inverted the ranking whenever a
    wrong language shared fewer tokens (fewer penalty terms beat more
    true matches — round-4 operator review). The smoothed score
    decomposes as

        Σ_seen ln(count+1)  −  n_d · ln(count(L) + V)

    (ln(0+1) = 0 for unseen tokens), so the seen part stays a sparse
    join against the profile and the penalty rides the per-(doc, lang)
    frame — no dense doc×vocab join. The candidate frame is
    doc × languages (label-domain-bounded broadcast).
    Output: (id, lang, lang_pred, score). Deterministic: ties break on
    lang ascending.

    Scale posture (VERDICT r6 #3): the (lang, tok) profile is
    corpus-trained, so on an open-web corpus its vocabulary is NOT
    broadcast-sized. The profile joins via broadcast only when it fits
    under ``broadcast_max_profile_rows``, else the same join runs as
    an ordinary shuffle equi-join on ``tok`` — identical results
    either way (gate = physical strategy only, mirroring the Jaccard
    hub-cap skew probe pattern in plans/llm.py).

    Round 11 (guide §2.4/§2.5): the corpus token stream is exploded
    exactly ONCE — into the persisted (lang, tok, count) profile. The
    probe (profile rows + vocab), the per-language totals
    (Σ count ≡ the old per-token count), and the smoothed
    log-likelihoods are all tiny jobs over that profile; the old form
    re-exploded the corpus for each (probe with two distinct aggs,
    lang totals, profile, per-doc counts — 4 extra full passes). The
    per-document token count is ROW-LOCAL (size of the filtered token
    array — per-document stats never leave the row); only ``seen``
    still walks the token stream, because it must join tokens against
    the profile."""
    tok_arr = F.filter(tokens(text_col), lambda t: t != "")
    profile_cnt = (
        spread(docs)
        .select(
            F.col(label_col), F.explode(tokens(text_col)).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy(label_col, "tok")
        .agg(F.count(F.lit(1)).alias("tok_n"))
        .persist()
    )
    stats = profile_cnt.agg(
        F.count(F.lit(1)).alias("profile_rows"),
        F.count_distinct(F.col("tok")).alias("vocab"),
    ).collect()[0]
    vocab_size = stats["vocab"]
    profile_fits = stats["profile_rows"] <= broadcast_max_profile_rows
    lang_totals = profile_cnt.groupBy(label_col).agg(
        F.sum("tok_n").alias("lang_n")
    )
    profile = profile_cnt.select(
        F.col(label_col).alias("cand_lang"),
        "tok",
        F.log(F.col("tok_n") + 1).alias("lnum"),
    )
    toks = spread(docs).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    doc_n = docs.select(
        F.col(id_col),
        F.col(label_col).alias("true_lang"),
        F.size(tok_arr).cast("bigint").alias("n_d"),
    ).filter(F.col("n_d") >= 1)
    seen = (
        toks.select(id_col, "tok")
        .join(F.broadcast(profile) if profile_fits else profile, on="tok")
        .groupBy(id_col, "cand_lang")
        .agg(F.sum("lnum").alias("seen_ll"))
    )
    cand = doc_n.crossJoin(
        F.broadcast(
            lang_totals.select(F.col(label_col).alias("cand_lang"), "lang_n")
        )
    )
    scored = cand.join(seen, on=[id_col, "cand_lang"], how="left").select(
        id_col,
        "true_lang",
        "cand_lang",
        F.round(
            F.coalesce(F.col("seen_ll"), F.lit(0.0))
            - F.col("n_d") * F.log(F.col("lang_n") + vocab_size),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("cand_lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("true_lang").alias("lang"),
            F.col("cand_lang").alias("lang_pred"),
            F.col("score"),
        )
    )
