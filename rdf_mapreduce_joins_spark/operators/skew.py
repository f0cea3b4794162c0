"""Skew-mitigation join (SURVEY.md §4.2).

AQE's skew-join splitting (default-on) handles most skew at runtime by
splitting oversized shuffle partitions — evidenced mechanically in
``tests/test_plans.py::test_aqe_skew_split_fires_on_hot_partition``
(a synthetic hot-key fixture re-plans to ``SortMergeJoin(skew=true)``)
— but it cannot help when a SINGLE KEY is hot — all rows for one key
land in one task no matter how partitions split. The classic fix is salting: replicate the small
side R times and scatter the big side's hot keys across R sub-keys,
turning one straggler task into R even ones.

``salted_join`` applies the textbook layout: big side gets a random
salt in [0, R); small side is exploded Rx (one row per salt). The join
key becomes (key, salt). Correctness is unchanged — every big-side row
still meets every matching small-side row exactly once. Cost: the
small side shuffles Rx (it's the SMALL side by contract — if both
sides are big and skewed, range-partition on a composite key instead).

The salt uses a deterministic hash of the big side's whole row id
rather than rand(): same result every run (the oracle/test contract
here), and no rand() re-evaluation hazard under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key pressure
    spread over ``salt_buckets`` sub-partitions.

    ``salt_from``: a big-side column whose hash drives the salt
    (defaults to the first non-key column, falling back to the key
    itself — still correct, but keyless-uniform only if such a column
    exists; pass an id-like column for best spread)."""
    if salt_from is None:
        non_key = [c for c in big.columns if c not in on]
        salt_from = non_key[0] if non_key else on[0]
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_from), F.lit(salt_buckets)).cast("int")
    )
    s = small.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(salt_buckets - 1).cast("int"))
        ).alias("__salt"),
    )
    out = b.join(s, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
