"""Continuous RDF ingestion: streaming N-Triples → the persisted
query-optimized triples store (plans/generic_rdf.py
build_triples_store layout), via foreachBatch.

The batch builder writes the store once; a production feed keeps
arriving. Each micro-batch here appends:

* ``{path}/triples`` — the batch's triples with their xxhash64 ids,
  appended into the predicate-partitioned parquet (new predicates
  create new partition directories; existing ones gain files —
  partition pruning semantics identical to the batch layout),
* ``{path}/dictionary`` — the batch's NEW (id, term) pairs only,
  found by a left-anti join against the current dictionary (terms are
  append-only; xxhash64 ids are stable across batches, so dedup by
  anti join is exact). Readers are unaffected mid-append: parquet
  readers list files at query start.

Delivery contract: foreachBatch is at-least-once on retry — a batch
that fails mid-append can leave its triples written once its retry
writes them again. Duplicate triples are invisible to SPARQL set
semantics (DISTINCT/ASK/paths dedupe) but inflate bag counts; feeds
that can replay should route through a deduplicating sink
(sources/sinks.py::upsert_parquet keyed on the full triple) instead.
Dictionary appends are idempotent regardless (the anti join drops
already-present ids on retry). Compact small files periodically with
sources/sinks.py::compact_parquet.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans.generic_rdf import term_dictionary
from rdf_mapreduce_joins_spark.sources.ntriples import read_ntriples_stream


def _read_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet dir, returning None when the path does not exist
    yet OR exists but holds no parquet files (a just-created empty
    directory is "no store yet", same as absent — Spark raises
    UNABLE_TO_INFER_SCHEMA for it, which must not crash the first
    batch). Uses Spark's reader (not os.path) so hdfs:// / s3a://
    stores are handled; any OTHER failure re-raises — genuine schema
    problems must surface, not read as 'empty'."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        klass = getattr(exc, "getErrorClass", lambda: None)() or ""
        msg = str(exc)
        if (
            "PATH_NOT_FOUND" in klass
            or "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in klass
            or "Unable to infer schema" in msg
        ):
            return None
        raise


# Store paths whose layout has already been verified non-legacy by
# _check_not_legacy — the guard reads both store subdirs with a full
# file listing, so running it on EVERY micro-batch would add a
# partition-discovery pass that grows with store size per batch.
# Layout can only go legacy->modern (we write the modern layout), so
# one successful check per driver process is sound.
_LEGACY_CHECKED: set[str] = set()


def _check_not_legacy(spark: SparkSession, store_path: str) -> None:
    """Refuse legacy stores up front: a store written by the pre-
    ingest_batch append-only format is partitioned by predicate only;
    appending (predicate, ingest_batch) paths under it creates mixed
    partition depths that fail Spark partition discovery at read time
    — and would do so AFTER corrupting the layout. Detect and error
    with a migration hint instead. Memoized per store_path (ADVICE
    r3): the check costs a file listing over the whole store, which
    must not be paid per micro-batch."""
    if store_path in _LEGACY_CHECKED:
        return
    for sub in ("triples", "dictionary"):
        legacy = _read_if_exists(spark, f"{store_path}/{sub}")
        if legacy is not None and "ingest_batch" not in legacy.columns:
            raise ValueError(
                f"{store_path}/{sub} was written by the legacy append-only "
                "ingest layout (no ingest_batch partition column). "
                "Migrate before streaming into it: read the store, add "
                "ingest_batch=0, and rewrite partitioned by "
                "(predicate, ingest_batch) / (ingest_batch) — e.g. "
                "spark.read.parquet(path).withColumn('ingest_batch', "
                "F.lit(0)).write.partitionBy(...).parquet(new_path)."
            )
    _LEGACY_CHECKED.add(store_path)


def _append_batch(batch: DataFrame, store_path: str, batch_id: int = 0) -> None:
    """Write one micro-batch into the store, EXACTLY-ONCE under
    foreachBatch's at-least-once retry contract: rows land in
    ``ingest_batch=<id>`` partitions via dynamic partition overwrite,
    so a retried batch REPLACES its own partitions instead of
    appending duplicates (a blind parquet append would double every
    triple the retry re-delivers). Predicate stays the leading
    partition column — probe-side pruning is unchanged; readers drop
    the extra ``ingest_batch`` column on load."""
    spark = batch.sparkSession
    _check_not_legacy(spark, store_path)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        enc = batch.select(
            "predicate",
            "subject",
            "object",
            F.xxhash64("subject").alias("subject_id"),
            F.xxhash64("object").alias("object_id"),
            F.lit(int(batch_id)).alias("ingest_batch"),
        )
        enc.write.mode("overwrite").partitionBy(
            "predicate", "ingest_batch"
        ).parquet(f"{store_path}/triples")
        new_terms = term_dictionary(batch).withColumn(
            "ingest_batch", F.lit(int(batch_id))
        )
        dict_path = f"{store_path}/dictionary"
        # Detect the existing dictionary through Spark, not os.path —
        # the store may live on any filesystem (hdfs://, s3a://,
        # file:), where a local-path check silently skips the dedup and
        # duplicate (id, term) rows would fan out every decode join.
        # The anti-join EXCLUDES the current batch's own partition: on
        # a retry that partition holds the failed attempt's terms, and
        # anti-joining against them would drop the terms and then
        # overwrite the partition empty — losing dictionary entries.
        # Only the path-not-found case means "first batch"; any other
        # read failure must surface (a swallowed error here silently
        # skips dedup and duplicate ids fan out every decode join).
        current = _read_if_exists(spark, dict_path)
        if current is not None:
            existing = current.filter(
                F.col("ingest_batch") != int(batch_id)
            ).select("id")
            new_terms = new_terms.join(existing, ["id"], "left_anti")
        new_terms.write.mode("overwrite").partitionBy("ingest_batch").parquet(
            dict_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def ingest_ntriples_stream(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Run the ingest: N-Triples files landing in ``source_dir``
    stream into the store at ``store_path``. Returns the
    StreamingQuery (caller awaits/stops). ``available_now=True``
    drains the current directory and stops — the test/backfill mode."""
    stream = read_ntriples_stream(spark, source_dir)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: _append_batch(df, store_path, bid)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
