"""Persisted inverted text index: build-once / probe-many keyword
search over the documents table (X4 family; the text sibling of
operators/similarity.py's IVF/LSH persisted indexes).

Layout: one ROW per (token, doc_id) posting — never an array-valued
posting list, which would concentrate a stopword's millions of
postings into one unsplittable cell — hive-partitioned by
``bucket = pmod(xxhash64(token), n_buckets)``. A probe for k terms
lists only the ≤k bucket directories (partition pruning at file
listing, before any IO) and pushes ``token IN (...)`` into the
parquet scan for row-group skipping inside them.

At 100 TB: the index build is one explode + aggregate over the corpus
(linear, shuffle on (token, doc_id)); buckets hash-balance the vocab
so no partition degenerates; df rides on every posting row
(denormalized) so scoring probes never re-aggregate the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators import text

DEFAULT_BUCKETS = 64


def build_inverted_index(
    documents: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Write the posting table: (token, doc_id, tf, df) partitioned by
    token-hash bucket. ``df`` is denormalized onto every row so a
    probe can score without a second corpus pass."""
    tf = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(text.tokens(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w_df = (
        tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    (
        tf.join(w_df, "token")
        .withColumn(
            "bucket", F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int")
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def _term_buckets(terms: list[str], n_buckets: int) -> list[int]:
    """Bucket ids for the probe terms, computed engine-side so they
    match the writer's xxhash64 exactly (one tiny local job)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    assert spark is not None
    rows = (
        spark.createDataFrame([(t,) for t in terms], "token string")
        .select(F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int").alias("b"))
        .collect()
    )
    return sorted({r.b for r in rows})


def search_indexed(
    spark: SparkSession,
    path: str,
    terms: list[str],
    mode: str = "and",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Probe the persisted index: documents containing ALL (``and``)
    or ANY (``or``) of the terms, with per-doc total tf for ranking.

    The bucket IN-list prunes partitions at file listing; the token
    IN-list pushes into the scan. AND-semantics is a count-of-distinct-
    matched-terms equality — no self-join per term."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not terms:
        raise ValueError("need at least one probe term")
    buckets = _term_buckets(terms, n_buckets)
    postings = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("token").isin(terms))
    )
    hits = postings.groupBy("doc_id").agg(
        F.count_distinct("token").alias("n_terms"),
        F.sum("tf").alias("total_tf"),
    )
    if mode == "and":
        hits = hits.filter(F.col("n_terms") == len(set(terms)))
    return hits.select("doc_id", "total_tf", "n_terms")
