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


HLL_PORTABLE_M = 256  # 2^8 buckets -> ~6.5% relative standard error
HLL_PORTABLE_WBITS = 52  # 60-bit base hash minus 8 bucket bits
_RHO_CAP = HLL_PORTABLE_WBITS + 1  # register value when w == 0
_POW53 = 1 << 53  # scale factor making the register sum an exact BIGINT


def hll_portable_alpha(m: int = HLL_PORTABLE_M) -> float:
    """Flajolet et al.'s bias-correction constant for m >= 128."""
    return 0.7213 / (1 + 1.079 / m)


def hll_portable_cols(col: str, hash_family: str = "md5") -> list[F.Column]:
    """``(bucket, rho)`` register coordinates of one item — the
    PORTABLE HyperLogLog, built only from arithmetic every engine
    reproduces bit for bit (no engine-internal sketch state): bucket =
    low 8 bits of the 60-bit base hash, rho = trailing-zero count of
    the remaining 52 bits + 1 (trailing zeros are Geometric(1/2) on a
    uniform hash exactly like the classical leading-zero rank, and —
    unlike leading zeros — they reduce to two portable integer ops:
    ``bit_count((w & -w) - 1) + 1``). The md5 family makes the SAME
    register table come out of Spark, DuckDB
    (:func:`hll_portable_rho_sql`) and Python
    (:func:`hll_portable_rho_py`); xxhash64 stays available for
    throughput, folded into the same non-negative 60-bit domain."""
    h = hashing.base_hash60(F.col(col).cast("string"), hash_family)
    if hash_family != "md5":
        h = F.pmod(h, F.lit(1 << 60))
    w = F.shiftright(h, 8)
    rho = (
        F.when(w == F.lit(0), F.lit(_RHO_CAP))
        .otherwise(F.bit_count(w.bitwiseAND(-w) - F.lit(1)) + F.lit(1))
        .cast("int")
    )
    return [
        F.pmod(h, F.lit(HLL_PORTABLE_M)).cast("int").alias("bucket"),
        rho.alias("rho"),
    ]


def hll_portable_rho_sql(h: str) -> str:
    """DuckDB twin of the rho expression in :func:`hll_portable_cols`
    (``h``: a non-negative 60-bit BIGINT column reference)."""
    w = f"({h} // {HLL_PORTABLE_M})"
    return (
        f"CASE WHEN {w} = 0 THEN {_RHO_CAP} "
        f"ELSE bit_count(({w} & (-{w})) - 1) + 1 END"
    )


def hll_portable_rho_py(h: int) -> int:
    """Pure-Python twin (value references recompute whole register
    tables with zero borrowed engine primitives)."""
    w = h >> 8
    if w == 0:
        return _RHO_CAP
    return (w & -w).bit_length()  # trailing zeros + 1


def hll_portable_stats_cols() -> list[F.Column]:
    """Aggregates turning a per-group register frame (column ``reg``)
    into the exact-integer estimator inputs: ``sreg`` = sum over ALL m
    buckets of ``2^(53 - reg)`` (empty buckets read reg=0, i.e. 2^53
    each — max total m*2^53 = 2^61, always an exact BIGINT, never a
    float harmonic sum whose addition order could diverge between
    engines) and ``v`` = empty-bucket count."""
    m, p = HLL_PORTABLE_M, _POW53
    return [
        (
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_RHO_CAP} - reg)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(p)
        )
        .cast("bigint")
        .alias("sreg"),
        (F.lit(m) - F.count(F.lit(1))).cast("bigint").alias("v"),
    ]


def hll_portable_stats_sql() -> str:
    """DuckDB twin of :func:`hll_portable_stats_cols` (aggregate SELECT
    items over a register column ``reg``; DuckDB SUM(BIGINT) is HUGEINT,
    hence the inner cast)."""
    m, p = HLL_PORTABLE_M, _POW53
    return (
        f"CAST(CAST(SUM(CAST(1 AS BIGINT) << ({_RHO_CAP} - reg)) AS BIGINT) "
        f"+ ({m} - COUNT(*)) * {p} AS BIGINT) AS sreg, "
        f"CAST({m} - COUNT(*) AS BIGINT) AS v"
    )


def hll_portable_estimate_sql(sreg: str, v: str) -> str:
    """The estimator CASE, one string fed VERBATIM to both engines
    (Spark via ``F.expr``, DuckDB in the oracle) so the float
    arithmetic is mirrored operation for operation: raw HLL estimate
    ``alpha*m^2*2^53 / sreg`` (one double division of exact integers),
    switching to linear counting ``m*ln(m/V)`` in the small range
    (raw <= 2.5m with empty buckets) exactly as published."""
    m = HLL_PORTABLE_M
    num = hll_portable_alpha(m) * m * m * float(_POW53)
    return (
        f"CASE WHEN {num!r} / CAST({sreg} AS DOUBLE) <= {2.5 * m!r} "
        f"AND {v} > 0 THEN {float(m)!r} * ln({float(m)!r} / {v}) "
        f"ELSE {num!r} / CAST({sreg} AS DOUBLE) END"
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
