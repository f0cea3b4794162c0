"""Write-side layout (SURVEY.md §2.1 S2/S3, §4.2).

The reference's storage step is an HBase bulk load keyed by subject so
point lookups and subject-stars are cheap (provenance [K], SURVEY.md
§1.1). The Spark-native equivalents are layout decisions made at WRITE
time, which is where 100 TB performance is won or lost:

* ``write_partitioned`` — hive-style directory partitioning: partition
  pruning turns a predicate on the partition column into "don't open
  the files at all".
* ``write_sorted`` — range-repartition + in-partition sort on the key:
  parquet min/max row-group statistics become effective, so a key
  predicate skips row groups inside each file (the subject-index
  replacement), and downstream sort-merge joins on the key skip their
  sort.
* ``write_bucketed`` — hash-bucketed managed table: two tables
  bucketed on the same key join with NO shuffle exchange on either
  side (verified by plan test) — the Spark answer to the reference's
  pre-partitioned HBase regions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet. Keep partition columns LOW
    cardinality (date, region, lang): each distinct value is a
    directory, and a million tiny directories is its own scale bug."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition by key then sort within partitions before
    writing: globally range-clustered files whose parquet row-group
    min/max stats actually discriminate on the key. One shuffle at
    write time buys row-group skipping on every subsequent read."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally per-bucket sorted) managed parquet
    table. Joins/aggregations between tables bucketed on the same key
    with the same bucket count plan with no Exchange on either side.

    Bucket count is a write-time commitment — pick it for the TARGET
    scale (buckets ≈ data size / healthy partition size), not the
    current one."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def _bucket_index(col_name: str, breaks: list[float]) -> "F.Column":
    """Bucket id of a value against sorted breakpoints, as a pure JVM
    expression: count of breakpoints <= value (no UDF, codegen-able)."""
    lit_breaks = F.array(*[F.lit(float(b)) for b in breaks])
    return F.size(F.filter(lit_breaks, lambda b: b <= F.col(col_name).cast("double")))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> "F.Column":
    """Z-order (Morton) key over two or three numeric columns.

    Each column's domain is quantile-bucketed into 2^bits ranges
    (breakpoints from approxQuantile — one cheap driver-side pass),
    then the bucket bits are interleaved. Rows close in the key are
    close in EVERY dimension, so range-partitioning by this key gives
    each output file a tight bounding box in all clustered columns at
    once — multi-dimensional min/max skipping, where a plain sort only
    clusters the leading column."""
    if not 2 <= len(cols) <= 3:
        raise ValueError("zorder_key takes 2 or 3 columns")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    idxs = []
    for c in cols:
        breaks = sorted(set(df.stat.approxQuantile(c, probs, 0.001)))
        # Rescale the bucket index to use the FULL bit range: duplicate
        # quantiles collapse on low-cardinality columns, and an index
        # that never reaches the high bits would make the interleave
        # lopsided (measured: file skipping degraded ~2x without this).
        m = max(1, len(breaks))
        idxs.append(
            (
                (_bucket_index(c, breaks).cast("long") * F.lit(n_buckets - 1))
                / F.lit(m)
            ).cast("long")
        )
    # The bit interleave itself is the shared primitive
    # (operators/layout.py — also provides the SQL twin for oracles).
    from rdf_mapreduce_joins_spark.operators.layout import zorder_value

    return zorder_value(idxs, bits=bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Z-order of ``cols``: range-
    partition + sort on the interleaved key, so min/max stats
    discriminate on ALL clustered columns, not just the first.
    The key column is dropped before writing (derivable, not data)."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def upsert_parquet(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    out_path: str | None = None,
) -> str:
    """MERGE/upsert for plain parquet (no table format required):
    rows of ``updates`` replace target rows with the same key; new
    keys are inserted. The merged snapshot is written to ``out_path``
    (default: ``<target>__merged``) and the path returned — the
    write-new-then-repoint pattern, because overwriting a directory
    that is also the read source is lost-data-on-failure. A real
    deployment repoints a view/symlink at the returned path; table
    formats (Delta/Iceberg) do this atomically and are the 100 TB
    answer when available — this operator is the dependency-free form.

    Plan shape: one left-anti join on the key (broadcastable when the
    update batch is small — the common CDC case; AQE decides) + a
    union. The target is scanned once; nothing collects."""
    import os

    target = spark.read.parquet(target_path)
    missing = [c for c in updates.columns if c not in target.columns]
    if missing or set(updates.columns) != set(target.columns):
        raise ValueError(
            f"updates schema {sorted(updates.columns)} must match "
            f"target {sorted(target.columns)}"
        )
    kept = target.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    merged = kept.unionByName(updates)
    out = out_path or os.path.join(
        os.path.dirname(target_path.rstrip("/")),
        os.path.basename(target_path.rstrip("/")) + "__merged",
    )
    merged.write.mode("overwrite").parquet(out)
    return out


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
    out_path: str | None = None,
) -> str:
    """Small-file compaction (pipeline hygiene at scale): rewrite a
    parquet directory into files of roughly ``target_file_mb`` each.
    A streaming sink or over-parallel writer leaves thousands of tiny
    files; every later scan then pays per-file open/footer cost and
    the driver pays listing cost — compaction amortizes that once.

    File count = ceil(on-disk bytes / target); round-robin repartition
    (no keys — compaction must not imply a semantic shuffle order).
    Output goes to a fresh sibling directory (write-new-then-repoint,
    as in :func:`upsert_parquet`); returns the path."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    out = out_path or os.path.join(
        os.path.dirname(path.rstrip("/")),
        os.path.basename(path.rstrip("/")) + "__compacted",
    )
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(out)
    return out


def write_with_metrics(
    df: "DataFrame",
    path: str,
    metrics: dict[str, "F.Column"] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Observed write (pipeline observability, SURVEY §3.2): attach an
    ``Observation`` to the frame, write it, and return the metric
    values the WRITE ITSELF computed — row counts, null counts, sums —
    with zero extra passes over the data. The production alternative
    to the count-after-write anti-pattern, which re-reads the whole
    output (2x IO at any scale) and can silently diverge from what was
    written if the input is non-deterministic. Default metrics: row
    count. Metric columns must be aggregates over the written frame."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F  # noqa: F811

    metrics = metrics or {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)
