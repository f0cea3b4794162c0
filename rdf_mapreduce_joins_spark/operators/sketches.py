"""Count-min sketch: bounded-state frequency estimation (the
frequency member of the engine's sketch family — HLL cardinality via
approx_count_distinct, MinHash/SimHash similarity, KLL quantiles via
approx_percentile).

At 100 TB an exact token-frequency table is itself corpus-sized; a CMS
is ``depth x width`` counters regardless of corpus size, built in one
pass with map-side partial aggregation, mergeable across shards by
cell-wise addition (counters are linear). Estimates only OVERCOUNT
(collisions add, never subtract): estimate >= true count always, and
``P[err > 2N/width] <= (1/2)^depth`` for stream mass N — the caller
sizes width against the acceptable absolute error.

Everything is built-ins (xxhash64 + pmod + groupBy); the sketch and
the probe are both DataFrames, so estimation is a join, not a UDF.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators import hashing


def _cell(
    col: F.Column, row: F.Column | int, width: int, hash_family: str = "xxhash64"
) -> F.Column:
    """Hash row i: the base hash seeded by the row index, folded to
    width.  xxhash64 (default) seeds via its multi-arg form; the md5
    family (cross-engine — the oracle's choice) hashes
    ``"<row>:<item>"``, reproducible in DuckDB/Python byte for byte."""
    row_col = F.lit(str(row)) if isinstance(row, int) else row.cast("string")
    if hash_family == "md5":
        h = hashing.base_hash60(F.concat_ws(":", row_col, col), "md5")
    else:
        h = F.xxhash64(row_col, col)
    return F.pmod(h, F.lit(width)).cast("int")


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One-pass CMS over a column of items: returns the sparse counter
    table (row, cell, cnt) — at most depth*width rows, zero cells
    omitted. Genuinely one pass: the depth hash rows come from ONE
    scan via an inline explode of the row indices (a union of depth
    projections would plan depth scans of the source). Mergeable with
    another sketch of the same shape by :func:`cms_merge`."""
    rows = df.select(
        F.col(col).alias("item"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    )
    cells = rows.select(
        "row",
        _cell(F.col("item"), F.col("row"), width, hash_family).alias("cell"),
    )
    return cells.groupBy("row", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition of two same-shape sketches (counter
    linearity — the property that makes CMS shard-parallel)."""
    return (
        a.unionByName(b)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Estimated count per distinct item: min over the depth rows of
    the item's counter cells. depth small-int joins against the
    (broadcastable, <= depth*width rows) sketch; missing cells read
    as 0 (an item never inserted estimates 0 only if some row's cell
    is empty)."""
    probes = [
        items.select(
            F.col(col).alias("item"),
            F.lit(i).alias("row"),
            _cell(F.col(col), i, width, hash_family).alias("cell"),
        )
        for i in range(depth)
    ]
    probe = reduce(lambda a, b: a.unionByName(b), probes)
    joined = probe.join(F.broadcast(cms), ["row", "cell"], "left").select(
        "item", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("item").agg(F.min("cnt").alias("est"))
