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


@settings(max_examples=8, deadline=None)
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=12
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 9)),
        min_size=0,
        max_size=12,
    ),
)
def test_asof_join_matches_reference(spark, lrows, rrows):
    """asof_join == per-row 'latest right at-or-before' computed in
    Python; result cardinality always equals the left side's."""
    from rdf_mapreduce_joins_spark.operators.asof import asof_join

    lrows = [(k, ts, i) for i, (k, ts) in enumerate(lrows)]
    # right must be unique per (key, ts): dedupe keeping max payload
    rbest: dict[tuple[int, int], int] = {}
    for k, ts, v in rrows:
        rbest[(k, ts)] = max(rbest.get((k, ts), -1), v)
    rrows_u = [(k, ts, v) for (k, ts), v in rbest.items()]
    ldf = spark.createDataFrame(lrows or [(None, None, None)], "k int, ts int, lid int").filter(
        "k is not null"
    )
    rdf_ = spark.createDataFrame(rrows_u or [(None, None, None)], "k int, ts int, v int").filter(
        "k is not null"
    )
    got = {
        r.lid: r.v
        for r in asof_join(ldf, rdf_, on=["k"], left_ts="ts", right_ts="ts").collect()
    }
    assert len(got) == len(lrows)
    for k, ts, lid in lrows:
        cand = [(rts, v) for (rk, rts), v in rbest.items() if rk == k and rts <= ts]
        want = max(cand)[1] if cand else None
        assert got[lid] == want, (k, ts, lid, cand)


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=15
    )
)
def test_connected_components_properties(spark, edges):
    """Every edge's endpoints share a component; each component's label
    is its minimum member (so labels are canonical representatives)."""
    from rdf_mapreduce_joins_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    labels = {r.node: r.component for r in connected_components(pairs).collect()}
    for a, b in edges:
        assert labels[a] == labels[b]
    comps: dict[int, list[int]] = {}
    for node, comp in labels.items():
        comps.setdefault(comp, []).append(node)
    for comp, members in comps.items():
        assert comp == min(members)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(1, 5)),
        min_size=1,
        max_size=15,
    )
)
def test_rollup_cube_rowcount_identities(spark, rows):
    """|rollup(a,b)| = |g(a,b)| + |g(a)| + 1; |cube(a,b)| adds |g(b)|."""
    df = spark.createDataFrame(rows, "a int, b int, x int")
    g_ab = df.groupBy("a", "b").count().count()
    g_a = df.groupBy("a").count().count()
    g_b = df.groupBy("b").count().count()
    n_rollup = df.rollup("a", "b").count().count()
    n_cube = df.cube("a", "b").count().count()
    assert n_rollup == g_ab + g_a + 1
    assert n_cube == g_ab + g_a + g_b + 1


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@settings(max_examples=8, deadline=None)
@given(
    rkey=st.integers(min_value=0, max_value=4),
    seg=st.sampled_from(_SEGMENTS),
)
def test_sparql_oracle_parity_random_constants(spark, rkey, seg):
    """The benchmark-corpus check generalized: for RANDOM constants,
    SPARQL text through the full parser+compiler must match a DuckDB
    oracle computed independently from the base tables — parity is a
    property of the compiler, not of the handful of constants the
    fixed corpus happens to pin."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in __import__("rdf_mapreduce_joins_spark.plans.sparql", fromlist=["sparql"])
        .sparql(
            spark,
            sf,
            f"""SELECT ?c ?nname WHERE {{
                  ?c <mktsegment> "{seg}" ; <nation> ?n .
                  ?n <name> ?nname ; <region> <region/{rkey}> .
                }}""",
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'")
    con.execute(f"CREATE VIEW nation AS SELECT * FROM '{sf}/nation.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""SELECT 'customer/' || c_custkey, n_name
                FROM customer JOIN nation ON n_nationkey = c_nationkey
                WHERE c_mktsegment = '{seg}' AND n_regionkey = {rkey}"""
        ).fetchall()
    )
    con.close()
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=14
    )
)
def test_generic_closure_matches_python_reachability(spark, edges):
    """<p>+ over arbitrary random graphs (cycles, self-loops, islands)
    must equal plain Python transitive reachability."""
    from rdf_mapreduce_joins_spark.plans.generic_rdf import sparql_triples

    data = [(f"n{a}", "p", f"n{b}") for a, b in edges]
    t = spark.createDataFrame(data, "subject string, predicate string, object string")
    got = {
        (r.s, r.o)
        for r in sparql_triples(t, "SELECT ?s ?o WHERE { ?s <p>+ ?o . }").collect()
    }
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
    want = set()
    for start in adj:
        seen: set[str] = set()
        stack = list(adj[start])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        want |= {(start, n) for n in seen}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    triples_=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.sampled_from(["p", "q", "r"]),
            st.integers(0, 5),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_variable_predicate_matches_python_reference(spark, triples_):
    """`?s ?p ?o` and `!<p>` over arbitrary random graphs: the bound
    predicate survey and the negated-set complement must equal plain
    Python set comprehension over the same triples."""
    from rdf_mapreduce_joins_spark.plans.generic_rdf import sparql_triples

    data = sorted({(f"n{a}", p, f"n{b}") for a, p, b in triples_})
    t = spark.createDataFrame(
        data, "subject string, predicate string, object string"
    )
    got = sorted(
        (r.s, r.p, r.o)
        for r in sparql_triples(
            t, "SELECT ?s ?p ?o WHERE { ?s ?p ?o . }"
        ).collect()
    )
    assert got == data
    neg = sorted(
        (r.s, r.o)
        for r in sparql_triples(t, "SELECT ?s ?o WHERE { ?s !<p> ?o . }").collect()
    )
    want_neg = sorted((s, o) for s, p, o in data if p != "p")
    assert neg == want_neg


# ------------------------------------------------------- md5-60bit family

_texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
    unique=True,
)


@settings(max_examples=10, deadline=None)
@given(vals=_texts)
def test_md5_hex60_three_engine_parity(spark, vals):
    """The cross-engine hash family's load-bearing property: Spark's
    conv(substr(md5)), DuckDB's strpos nibble decode (hex60_sql), and
    hashlib agree on arbitrary unicode — this is what every md5-family
    oracle (MinHash/SimHash/CMS) rests on."""
    import duckdb

    from rdf_mapreduce_joins_spark.operators import hashing

    py = [hashing.md5_hex60_py(v) for v in vals]
    con = duckdb.connect()
    duck = [
        con.execute(
            f"SELECT {hashing.hex60_sql('hx')} FROM (SELECT md5(?) AS hx)", [v]
        ).fetchone()[0]
        for v in vals
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r.s: r.h
        for r in df.select(
            "s", hashing.base_hash60("s", "md5").alias("h")
        ).collect()
    }
    sp = [got[v] for v in vals]
    assert py == duck == sp
    for h in py:
        assert 0 <= h < (1 << 60)


@settings(max_examples=20, deadline=None)
@given(vals=_texts)
def test_md5_hex60_pure_python_bounds(vals):
    from rdf_mapreduce_joins_spark.operators import hashing

    for v in vals:
        h = hashing.md5_hex60_py(v)
        assert 0 <= h < (1 << 60)
        # stability: same input, same hash
        assert h == hashing.md5_hex60_py(v)


def test_unknown_hash_family_raises():
    import pytest as _pytest

    from pyspark.sql import functions as F

    from rdf_mapreduce_joins_spark.operators import hashing

    with _pytest.raises(ValueError, match="unknown hash family"):
        hashing.base_hash60(F.lit("x"), "sha1")


def test_lazy_oracle_registry_contract():
    """LAZY_ORACLES entries resolve at oracle_sql() call time, and the
    registry rejects a query registering both a static oracle and a
    builder."""
    import pytest as _pytest

    import __spark_entry__ as entrymod
    from rdf_mapreduce_joins_spark.plans import LAZY_ORACLES
    from rdf_mapreduce_joins_spark.plans.registry import query as q_register

    assert "embedding_pca_project" in LAZY_ORACLES
    sql = entrymod.oracle_sql()["embedding_pca_project"]
    assert "list_inner_product" in sql and "error(" in sql
    with _pytest.raises(ValueError, match="not both"):

        @q_register("_both_oracles_test", oracle="SELECT 1", oracle_builder=lambda: "SELECT 1")
        def _fn(spark, sf_dir):  # pragma: no cover
            raise NotImplementedError


key_sets = st.lists(st.integers(min_value=0, max_value=10_000), min_size=0, max_size=60)


@settings(max_examples=50, deadline=None)
@given(a=key_sets, b=key_sets)
def test_portable_hll_merge_law(a, b):
    """registers(A ∪ B) == bucket-wise max(registers(A), registers(B))
    — the lossless-union law the nation→region rollup and the rolling
    7-day merge both rely on (pure Python, md5 family)."""
    from tests.test_sketches import _py_hll_estimate, _py_registers

    ra, rb = _py_registers(set(a)), _py_registers(set(b))
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    direct = _py_registers(set(a) | set(b))
    assert merged == direct
    # and therefore the estimates agree exactly
    assert _py_hll_estimate(merged) == _py_hll_estimate(direct)


@settings(max_examples=50, deadline=None)
@given(a=key_sets, b=key_sets)
def test_kmv_bottom_k_merge_law(a, b):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    property that makes KMV sketches shard-mergeable without rescans."""
    from rdf_mapreduce_joins_spark.operators.hashing import md5_hex60_py
    from rdf_mapreduce_joins_spark.plans.sketches import KMV_K

    ha = sorted(md5_hex60_py(str(k)) for k in set(a))
    hb = sorted(md5_hex60_py(str(k)) for k in set(b))
    direct = sorted(set(ha) | set(hb))[:KMV_K]
    merged = sorted(set(ha[:KMV_K]) | set(hb[:KMV_K]))[:KMV_K]
    assert merged == direct


@settings(max_examples=50, deadline=None)
@given(dim=key_sets, fact=key_sets)
def test_bloom_bitpack_no_false_negatives(dim, fact):
    """The bloom BIT-PACKING arithmetic (join_bloom_prefilter's
    position -> 60-bit-word/bit encode + shift/mask test, pure
    Python): every inserted key must pass the membership test — the
    packing, not the hash, is what could break this."""
    from rdf_mapreduce_joins_spark.operators.hashing import md5_hex60_py
    from rdf_mapreduce_joins_spark.plans.relational import (
        BLOOM_K,
        BLOOM_M,
        BLOOM_WORD_BITS,
    )

    words: dict[int, int] = {}
    for key in set(dim):
        for i in range(BLOOM_K):
            p = md5_hex60_py(f"{i}:{key}") % BLOOM_M
            w, b = p // BLOOM_WORD_BITS, p % BLOOM_WORD_BITS
            words[w] = words.get(w, 0) | (1 << b)
    assert all(bits < (1 << 63) for bits in words.values())  # sign-safe

    def member(key):
        for i in range(BLOOM_K):
            p = md5_hex60_py(f"{i}:{key}") % BLOOM_M
            if not (words.get(p // BLOOM_WORD_BITS, 0) >> (p % BLOOM_WORD_BITS)) & 1:
                return False
        return True

    for key in set(dim):
        assert member(key)  # the no-false-negative law
    for key in set(fact) - set(dim):
        # false positives allowed; a rejected key must genuinely miss
        # at least one bit (re-derive to guard the test itself)
        if not member(key):
            missing = [
                i
                for i in range(BLOOM_K)
                if not (
                    words.get(
                        (md5_hex60_py(f"{i}:{key}") % BLOOM_M) // BLOOM_WORD_BITS, 0
                    )
                    >> ((md5_hex60_py(f"{i}:{key}") % BLOOM_M) % BLOOM_WORD_BITS)
                )
                & 1
            ]
            assert missing


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    width=st.integers(min_value=1, max_value=7),
    n=st.integers(min_value=2, max_value=7),
)
def test_bucketed_rank_and_ntile_match_window(spark, vals, width, n):
    """operators/ranking.py (VERDICT r6 #2): the two-level bucketed
    rank + integer ntile reconstruction must be bit-identical to the
    global row_number()/ntile() windows for ANY values, bucket width,
    and tile count — including duplicate values straddling buckets and
    N not divisible by n."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rdf_mapreduce_joins_spark.operators.ranking import (
        bucketed_global_rank,
        ntile_from_rank,
    )

    df = spark.createDataFrame(list(enumerate(vals)), "id long, v long")
    got_df = bucketed_global_rank(
        df, F.expr(f"v DIV {width}"), [F.asc("v"), F.asc("id")], "rk"
    ).withColumn("_n", F.lit(len(vals)))
    got = {
        r.id: (r.rk, r.tile)
        for r in got_df.withColumn(
            "tile", ntile_from_rank("rk", "_n", n)
        ).collect()
    }
    w = Window.orderBy("v", "id")
    exp = {
        r.id: (r.rk, r.tile)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("bigint").alias("rk"),
            F.ntile(n).over(w).cast("bigint").alias("tile"),
        ).collect()
    }
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=-5, max_value=20)),
        min_size=1,
        max_size=30,
    ),
    width=st.integers(min_value=1, max_value=5),
)
def test_bucketed_running_sum_matches_window(spark, vals, width):
    """bucketed_running_sum == the global ROWS UNBOUNDED PRECEDING
    running SUM under the same total order, for any sort values
    (duplicates included) and any bucket width."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rdf_mapreduce_joins_spark.operators.ranking import bucketed_running_sum

    rows = [(i, k, x) for i, (k, x) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, k long, x long")
    got = {
        r.id: r.cum
        for r in bucketed_running_sum(
            df, F.expr(f"k DIV {width}"), [F.asc("k"), F.asc("id")], "x", "cum"
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exp = {
        r.id: r.cum
        for r in df.select(
            "id", F.sum("x").over(w).cast("bigint").alias("cum")
        ).collect()
    }
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)),
        min_size=1,
        max_size=25,
    ),
    mod=st.integers(min_value=2, max_value=4),
)
def test_incremental_merge_equals_from_scratch_closure(spark, edges, mod):
    """The contracted-graph merge algebra behind
    dedup_incremental_components: for ANY edge set and ANY old/new node
    split, (old-only components) + (delta edges contracted to old
    labels) + (closure over the contracted graph) == from-scratch
    min-label components. Holds because persisted labels are min member
    ids, so min-of-mins is the global min."""
    from rdf_mapreduce_joins_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return

    def comps(es):
        if not es:
            return {}
        df = spark.createDataFrame(es, "d1 long, d2 long")
        return {r.node: r.component for r in connected_components(df).collect()}

    nodes = sorted({x for e in edges for x in e})
    is_new = lambda x: x % mod == 0  # noqa: E731
    old_edges = [(a, b) for a, b in edges if not is_new(a) and not is_new(b)]
    delta_edges = [(a, b) for a, b in edges if is_new(a) or is_new(b)]
    full = comps(edges)
    expected = {x: full.get(x, x) for x in nodes}
    comp_old = comps(old_edges)
    lab = lambda x: comp_old.get(x, x)  # noqa: E731
    contracted = [
        (lab(a), lab(b)) for a, b in delta_edges if lab(a) != lab(b)
    ]
    comp_delta = comps(contracted)
    merged = {x: comp_delta.get(lab(x), lab(x)) for x in nodes}
    assert merged == expected


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.sets(st.integers(0, 12), min_size=1, max_size=8),
        min_size=2,
        max_size=10,
    ),
    t=st.sampled_from([(1, 5), (1, 2), (3, 4), (9, 10)]),
)
def test_prefix_filter_equals_bruteforce(spark, docs, t):
    """Losslessness of the prefix filter (operators/dedup.py::
    prefix_filter_jaccard_pairs): on arbitrary token-set corpora and
    thresholds, the prefix-filtered pairs equal the brute-force
    all-pairs exact Jaccard — no false negatives (the theorem the
    candidate join relies on) and no false positives (verification is
    exact)."""
    t_num, t_den = t
    rows = [
        (i, "en", f"tok{tok}") for i, s in enumerate(docs) for tok in s
    ]
    bi = spark.createDataFrame(rows, "doc_id long, lang string, bigram string")
    got = {
        (r.d1, r.d2): r.jaccard
        for r in dedup.prefix_filter_jaccard_pairs(bi, t_num, t_den).collect()
    }
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(docs[i] & docs[j])
            if inter == 0:
                continue
            jac = round(inter / len(docs[i] | docs[j]), 4)
            if jac >= t_num / t_den:
                want[(i, j)] = jac
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=14
    ),
    mod=st.sampled_from([2, 3]),
)
def test_merge_pairs_into_labels_matches_from_scratch(spark, edges, mod):
    """The FACTORED merge operator (operators/dedup.py::
    merge_pairs_into_labels — shared by the batch query and the
    streaming sink) reproduces from-scratch min-label components for
    any edge set and old/new split, including singletons supplied only
    via the universe frame."""
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e})
    is_new = lambda x: x % mod == 0  # noqa: E731
    old_edges = [(a, b) for a, b in edges if not is_new(a) and not is_new(b)]
    delta_edges = [(a, b) for a, b in edges if is_new(a) or is_new(b)]
    universe_ids = list(range(12))  # includes ids not in any edge

    if old_edges:
        prev = dedup.connected_components(
            spark.createDataFrame(old_edges, "d1 long, d2 long")
        )
    else:
        prev = spark.createDataFrame([], "node bigint, component bigint")
    delta = spark.createDataFrame(
        delta_edges or [], "d1 long, d2 long"
    ) if delta_edges else spark.createDataFrame([], "d1 long, d2 long")
    universe = spark.createDataFrame(
        [(i,) for i in universe_ids], "doc_id long"
    )
    got = {
        r.doc_id: r.component
        for r in dedup.merge_pairs_into_labels(prev, universe, delta).collect()
    }
    full = (
        {
            r.node: r.component
            for r in dedup.connected_components(
                spark.createDataFrame(edges, "d1 long, d2 long")
            ).collect()
        }
        if edges
        else {}
    )
    want = {i: full.get(i, i) for i in universe_ids}
    assert got == want
