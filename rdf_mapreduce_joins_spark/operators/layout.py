"""Multi-dimensional data-layout clustering (Z-order / Morton curve).

Sorting a table by the bit-interleaved Z-value of several columns
before writing clusters rows so that EVERY interleaved dimension has
locality within a file — min/max parquet footer stats then prune
multi-dimensional range predicates, not just the leading sort key.
This is the lakehouse OPTIMIZE ZORDER BY primitive, expressed as a
pure Column so it runs JVM-side inside whole-stage codegen (bits x
dims shift/mask/or ops, no UDF).

Usage for the write path::

    z = zorder_value([F.col("a"), F.col("b")], bits=16)
    df.repartitionByRange(n, z).sortWithinPartitions(z).write...

``repartitionByRange`` on the Z-value gives contiguous curve segments
per file; the footer min/max of ``a`` and ``b`` in each file are then
tight boxes along the curve.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 8) -> Column:
    """Morton Z-value of ``cols``: interleave the low ``bits`` bits of
    each column round-robin (bit b of column i lands at position
    b*len(cols)+i). Inputs must be non-negative integers already
    scaled into [0, 2^bits); callers bucketize floats first
    (e.g. ``F.least(F.floor(x / width), F.lit(2**bits - 1))``).
    Disjoint target bits, so OR composes them losslessly.

    bits * len(cols) must stay <= 63: position 63 is the BIGINT sign
    bit (rows landing there sort NEGATIVE, breaking the curve) and
    shifts >= 64 wrap under the JVM's shift masking, colliding
    dimensions silently (round-4 review)."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} > 63 overflows the "
            "BIGINT z-value — lower bits or interleave fewer columns"
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def zorder_sql(cols: list[str], bits: int = 8) -> str:
    """The identical Z-value as an ANSI SQL expression (DuckDB-ready),
    for oracle parity: ``((c >> b) & 1) << k`` terms OR-ed together.
    Kept textually parallel to :func:`zorder_value` so the two stay
    provably the same function."""
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(f"((({c} >> {b}) & 1) << {b * len(cols) + i})")
    return "(" + " | ".join(terms) + ")"
