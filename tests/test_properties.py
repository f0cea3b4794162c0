"""Property-based tests (hypothesis) for join-shape invariants and
deterministic-constant helpers (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from rdf_mapreduce_joins_spark.operators import dedup, similarity

keys = st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=12)


@settings(max_examples=10, deadline=None)
@given(left=keys, right=keys)
def test_join_shape_invariants(spark, left, right):
    """semi ⊆ distinct(left); anti = left − semi (multiset, by key);
    left-outer count = inner count + anti count."""
    ldf = spark.createDataFrame([(k,) for k in left] or [(None,)], "k int").filter(
        "k is not null"
    )
    rdf_ = spark.createDataFrame([(k,) for k in right] or [(None,)], "k int").filter(
        "k is not null"
    )
    semi = ldf.join(rdf_, on="k", how="left_semi")
    anti = ldf.join(rdf_, on="k", how="left_anti")
    inner = ldf.join(rdf_.distinct(), on="k", how="inner")
    outer = ldf.join(rdf_.distinct(), on="k", how="left")
    assert semi.count() + anti.count() == ldf.count()
    assert outer.count() == inner.count() + anti.count()
    semi_keys = {r.k for r in semi.collect()}
    assert semi_keys <= set(left) and semi_keys <= set(right)


@settings(max_examples=10, deadline=None)
@given(vals=keys)
def test_union_distinct_idempotent(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals] or [(None,)], "k int").filter(
        "k is not null"
    )
    once = df.unionByName(df).distinct()
    assert once.count() == df.distinct().count()


@settings(max_examples=20, deadline=None)
@given(n=st.integers(min_value=1, max_value=256))
def test_perm_constants_bounds(n):
    consts = dedup._perm_constants(n)
    assert len(consts) == len(set(consts)) == n
    for a, b in consts:
        assert 1 <= a < (1 << 30) and a % 2 == 1
        assert 0 <= b < (1 << 30)
        # product bound: a * h0 + b stays far inside int64 for h0 < 2^31
        assert a * (dedup.P31 - 1) + b < (1 << 62)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    dim=st.integers(min_value=1, max_value=64),
    n=st.integers(min_value=1, max_value=16),
)
def test_hyperplanes_shape_and_range(seed, dim, n):
    planes = similarity.hyperplanes(dim, n, seed=seed)
    assert len(planes) == n and all(len(p) == dim for p in planes)
    assert all(-1.0 <= x <= 1.0 for p in planes for x in p)
