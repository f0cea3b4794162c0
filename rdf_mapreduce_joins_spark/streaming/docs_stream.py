"""Streaming near-duplicate detection over a document stream (X2 as a
STREAM — the ingestion-time form of the batch SimHash dedup).

A batch dedup pass over N documents costs O(N) every time it runs; an
ingestion pipeline wants the incremental question "is THIS document a
near-dup of anything seen so far?" answered as documents arrive. The
construction:

1. per-row SimHash bands (``operators/dedup.py::with_simhash_bands`` —
   a stateless JVM projection, proven bit-identical to the batch
   explode+aggregate form, so stream and batch agree on signatures),
2. explode to one row per (band, band-value) bucket,
3. a custom stateful operator (``applyInPandasWithState``) keyed on the
   bucket holding the FIRST document id that hit the bucket — every
   later arrival emits a candidate pair (new doc, first doc).

State is ONE long per occupied bucket — O(distinct buckets), not
O(documents); the classic streaming-dedup trade (candidates reference
the bucket's first member, not every member). Candidate semantics
mirror the batch ``simhash_pairs`` blocking guarantee: any pair within
Hamming distance 3 of a 64-bit signature shares at least one 16-bit
band, so true near-dups of an already-seen doc always surface (against
the bucket representative). Exact Hamming verification happens
downstream exactly as in batch.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from rdf_mapreduce_joins_spark.operators.dedup import with_simhash_bands
from rdf_mapreduce_joins_spark.session import ensure_runtime_confs

_N_BANDS = 4


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of documents rows; schema sniffed from the
    live parquet footers (metadata-only batch read) — same discipline
    as the events stream source."""
    ensure_runtime_confs(spark)
    if not (os.path.isdir(path) or path.endswith(".parquet")):
        raise ValueError(f"unsupported stream path: {path}")
    file_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(file_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", os.path.basename(path)).parquet(
        os.path.dirname(path)
    )


_CAND_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("first_doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("bv", IntegerType()),
    ]
)
_BUCKET_STATE_SCHEMA = StructType([StructField("first_doc_id", LongType())])


def simhash_candidates_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming near-dup candidates: one output row per (arriving doc,
    occupied band bucket) pair — ``first_doc_id`` is the bucket's
    earliest member (stream order; ties inside a micro-batch break on
    ascending id for determinism). A doc colliding in k bands emits k
    candidate rows; dedupe/verify downstream as in batch.

    No timeout/watermark: bucket state is O(1) each and must live for
    the stream's whole horizon (a dup of something seen yesterday is
    still a dup) — eviction is a retention-policy choice at 100 TB
    (e.g. restart the query per corpus epoch), not a correctness
    need."""
    banded = with_simhash_bands(docs.select(F.col(id_col), F.col(text_col)), text_col)
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.element_at("bands", b + 1).alias("bv"),
            )
            for b in range(_N_BANDS)
        ]
    )
    buckets = banded.select(F.col(id_col), F.explode(entries).alias("e")).select(
        id_col, F.col("e.band").alias("band"), F.col("e.bv").alias("bv")
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, bv = key
        first = state.get[0] if state.exists else None
        out: list[tuple[int, int, int, int]] = []
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        for did in sorted(ids):
            if first is None:
                first = did
            elif did != first:
                out.append((did, first, band, bv))
        if first is not None:
            state.update((first,))
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "first_doc_id", "band", "bv"])

    return buckets.groupBy("band", "bv").applyInPandasWithState(
        fn,
        outputStructType=_CAND_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Incremental near-dup CLUSTERING (the ingestion twin of
# plans/llm.py::dedup_incremental_components)
# --------------------------------------------------------------------------

_ASG_SCHEMA = "node bigint, component bigint"


def merge_components_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_jaccard: float = 0.5,
    bands: int = 16,
    rows_per_band: int = 4,
) -> None:
    """Merge ONE batch of documents into the persisted clustering state
    under ``state_dir`` (two parquet tables):

    * ``signatures/`` — minhash signatures of every document seen; the
      band index the next batch probes,
    * ``assignments/`` — (node, component), component = min doc_id
      reachable in the near-dup pair graph over everything seen.

    Batch signatures probe the accumulated ∪ batch band index
    (operators/dedup.py::minhash_lsh_pairs(probe=…) — candidate cost
    scales with the batch, not the corpus), then
    ``merge_pairs_into_labels`` contracts old endpoints to their
    persisted labels and closes over the contracted delta graph only.
    merged == from-scratch is the merge algebra's invariant
    (hypothesis-tested, and hash-proven differentially by the batch
    query's from-scratch-closure oracle).

    Idempotent under micro-batch REPLAY: a re-appended batch's
    signature rows are deduped by id on read, and the assignments
    overwrite is a deterministic function of (accumulated signatures,
    batch) — so foreachBatch's at-least-once delivery yields
    exactly-once state."""
    from rdf_mapreduce_joins_spark.operators.dedup import (
        merge_pairs_into_labels,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sig_path = os.path.join(state_dir, "signatures")
    asg_path = os.path.join(state_dir, "assignments")
    sigs_b = minhash_signatures(
        batch.select(F.col(id_col), F.col(text_col)),
        id_col=id_col,
        num_perm=bands * rows_per_band,
    ).localCheckpoint()
    if os.path.isdir(sig_path):
        prev_sigs = spark.read.parquet(sig_path).dropDuplicates([id_col])
        # re-sent ids (replay) must not self-pair against their own
        # earlier signature row
        prev_sigs = prev_sigs.join(sigs_b.select(id_col), on=id_col, how="left_anti")
        all_sigs = prev_sigs.unionByName(sigs_b)
    else:
        all_sigs = sigs_b
    if os.path.isdir(asg_path):
        prev = spark.read.parquet(asg_path)
    else:
        prev = spark.createDataFrame([], _ASG_SCHEMA)
    delta_pairs = minhash_lsh_pairs(
        all_sigs,
        id_col=id_col,
        bands=bands,
        rows_per_band=rows_per_band,
        min_est_jaccard=min_est_jaccard,
        probe=sigs_b,
    )
    universe = prev.select(F.col("node").alias(id_col)).unionByName(
        sigs_b.select(id_col)
    ).distinct()
    updated = merge_pairs_into_labels(
        prev, universe, delta_pairs, id_col=id_col
    ).select(F.col(id_col).alias("node"), "component")
    # materialize BEFORE the overwrite truncates the table being read
    updated = updated.localCheckpoint()
    updated.write.mode("overwrite").parquet(asg_path)
    sigs_b.write.mode("append").parquet(sig_path)


def incremental_components_sink(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_jaccard: float = 0.5,
    bands: int = 16,
    rows_per_band: int = 4,
):
    """Start the streaming incremental-clustering sink: every
    micro-batch folds into the persisted state via
    :func:`merge_components_batch` (availableNow trigger — replay-run
    like the repo's other streaming twins; a production deployment
    swaps the trigger).

    State here is TABLE-shaped, so it lives in parquet behind
    foreachBatch rather than the keyed state store: the band index must
    be probe-JOINABLE (a per-key state store cannot run a distributed
    join against its own state), and mid-stream consumers read the
    assignments table directly."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        merge_components_batch(
            batch.sparkSession,
            batch,
            state_dir,
            id_col=id_col,
            text_col=text_col,
            min_est_jaccard=min_est_jaccard,
            bands=bands,
            rows_per_band=rows_per_band,
        )

    return (
        docs.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
