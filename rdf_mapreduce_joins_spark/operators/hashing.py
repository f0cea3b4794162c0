"""Pluggable base-hash family for the sketch/near-dup operators.

The MinHash / SimHash / count-min pipelines are engine-independent
integer arithmetic end to end — universal-hash permutations over a
prime field, bit votes, band packing, counter minima — EXCEPT for the
one primitive at the bottom: the base hash of a string. Two families
are supported:

* ``"xxhash64"`` (default, the 100 TB production path): Spark's
  codegen'd XXH64 — the cheapest 64-bit string hash the JVM offers,
  the right choice when the hash runs once per shingle per corpus.
  Engine-internal (seed + byte layout are Spark's), so pipelines on
  this family are verified by Python value references that borrow
  exactly this primitive (tests/test_rowsonly_references.py).
* ``"md5"`` (the cross-engine differential-testing family): the first
  15 hex chars of md5 decoded as a 60-bit non-negative BIGINT.  md5
  over UTF-8 bytes is identical in Spark, DuckDB, and hashlib, so a
  pipeline on this family is expressible in ANSI-ish SQL and the
  WHOLE pipeline (shingling, permutation minima, banding, bucket
  collisions, estimation) gets a DuckDB hash-match oracle — a
  strictly stronger check than rows-only.  ~5-10x more cycles per
  hash than XXH64 but still JVM codegen (no Python), so it is a
  legitimate production fallback where reproducibility across
  engines matters more than hash throughput.

Both families feed the same downstream arithmetic; switching family
changes WHICH deterministic result is computed, never the shape of
the plan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX60_DIGITS = 15  # 60 bits < 2^63: always fits a signed BIGINT

FAMILIES = ("xxhash64", "md5")


def base_hash60(col: Column | str, family: str = "xxhash64") -> Column:
    """64-bit (xxhash64, signed) or 60-bit (md5, non-negative) base
    hash of a string column.  Callers fold it into their own domain
    (``pmod(..., P31)``, ``% width``) — both families behave under
    pmod identically."""
    c = F.col(col) if isinstance(col, str) else col
    if family == "xxhash64":
        return F.xxhash64(c)
    if family == "md5":
        return F.conv(F.substring(F.md5(c), 1, HEX60_DIGITS), 16, 10).cast("long")
    raise ValueError(f"unknown hash family {family!r} (want one of {FAMILIES})")


def md5_hex60_py(s: str) -> int:
    """Pure-Python twin of the md5 family (hashlib) — lets the value
    references recompute md5-mode pipelines with ZERO borrowed engine
    primitives."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:HEX60_DIGITS], 16)


def hex60_sql(hex_col: str) -> str:
    """DuckDB SQL decoding the first 15 hex chars of ``hex_col`` (a
    lowercase md5 hex VARCHAR column reference) to the same BIGINT as
    :func:`base_hash60`'s md5 family.  DuckDB 1.0 has no hex→int cast,
    so this is nibble-by-nibble strpos decoding with exact BIGINT
    multipliers (the multimodal_features pattern)."""
    terms = [
        f"CAST(strpos('0123456789abcdef', substring({hex_col}, {p + 1}, 1)) - 1 "
        f"AS BIGINT) * {16 ** (HEX60_DIGITS - 1 - p)}"
        for p in range(HEX60_DIGITS)
    ]
    return "(" + " + ".join(terms) + ")"
