"""Semantic tests for the assembly-layer ops (plans/assembly.py) and
the new TPC-H shapes — properties the DuckDB hash-match can't express
(subset relations, determinism across partitionings, value ranges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans import assembly, relational
from rdf_mapreduce_joins_spark.sources.tables import load_table


def test_repetition_scores_ranges(spark, sf_dir):
    df = assembly.docs_repetition_scores(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_word_frac <= 1
        assert 0 < r.top_word_frac <= 1
        assert 0 <= r.dup_bigram_frac <= 1
        # a doc whose every word is distinct has dup_word_frac 0 and
        # top_word_frac 1/n
        if r.dup_word_frac == 0:
            assert abs(r.top_word_frac - round(1 / r.n_tokens, 4)) < 1e-9


def test_repetition_catches_constructed_dup(spark):
    d = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in assembly._repetition_frame(d).collect()}
    assert got[1].dup_word_frac == 0.75 and got[1].top_word_frac == 1.0
    assert got[2].dup_word_frac == 0.0 and got[2].top_word_frac == 0.25
    assert got[1].dup_bigram_frac == round(1 - 1 / 3, 4)
    assert got[2].dup_bigram_frac == 0.0


def test_domain_mixture_is_subset_with_expected_rates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    mixed = assembly.docs_domain_mixture(spark, sf_dir)
    tot = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.source: r.n
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # src0 rate 1.0 → everything kept; others strictly subsampled
    assert kept.get("src0") == tot.get("src0")
    for s, n in kept.items():
        assert n <= tot[s]
    # repartitioning must not change the selected set (hash determinism)
    again = set(
        (r.doc_id, r.source)
        for r in assembly.docs_domain_mixture(spark, sf_dir)
        .repartition(3)
        .collect()
    )
    assert again == {(r.doc_id, r.source) for r in mixed.collect()}


def test_incremental_batch_subset_and_self_clean(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = assembly.dedup_incremental_batch(spark, sf_dir)
    new_ids = {r.doc_id for r in d.filter(F.col("source") == "src0").collect()}
    kept = {r.doc_id for r in out.collect()}
    assert kept <= new_ids
    # every kept hash is genuinely absent from the corpus side
    corpus_hashes = {
        r.h
        for r in d.filter(F.col("source") != "src0")
        .select(F.md5("text").alias("h"))
        .collect()
    }
    for r in out.collect():
        assert r.content_md5 not in corpus_hashes


def test_global_shuffle_partitions_and_positions(spark, sf_dir):
    out = assembly.docs_global_shuffle(spark, sf_dir)
    rows = out.collect()
    d = load_table(spark, sf_dir, "documents")
    assert len(rows) == d.count()
    shards = {r.shard for r in rows}
    assert shards <= set(range(16))
    # positions are 1..n_shard dense within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_quality_pipeline_verdict_values(spark, sf_dir):
    out = assembly.docs_quality_filter_pipeline(spark, sf_dir)
    rows = out.collect()
    assert rows
    assert {r.verdict for r in rows} <= {
        "keep",
        "too_short",
        "low_alpha",
        "repetitive",
    }


def test_tpch_q1_totals_add_up(spark, sf_dir):
    out = relational.tpch_q1_pricing_summary(spark, sf_dir)
    rows = out.collect()
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    assert sum(r.count_order for r in rows) == li.count()
    for r in rows:
        assert abs(r.avg_qty - round(r.sum_qty / r.count_order, 4)) < 1e-9


def test_tpch_q4_counts_bounded_by_quarter_orders(spark, sf_dir):
    out = relational.tpch_q4_order_priority(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    assert sum(r.order_count for r in out.collect()) <= o.count()


def test_tpch_q7_symmetric_pair_only(spark, sf_dir):
    rows = relational.tpch_q7_volume_shipping(spark, sf_dir).collect()
    for r in rows:
        assert {r.supp_nation, r.cust_nation} == {"NATION_1", "NATION_2"}


def test_tpch_q10_ordered_top20(spark, sf_dir):
    rows = relational.tpch_q10_returned_items(spark, sf_dir).collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_sparql_sum_avg_matches_relational(spark, sf_dir):
    from rdf_mapreduce_joins_spark.plans.sparql import rdf_sparql_sum_avg

    got = {
        r.nname: (r.total_bal, r.avg_bal)
        for r in rdf_sparql_sum_avg(spark, sf_dir).collect()
    }
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dec = F.expr("printf('%.2f', c_acctbal)").cast("decimal(18,2)")
    want = {
        r.n_name: (r.total, r.avg)
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec).cast("double").alias("total"),
            F.round(F.sum(dec).cast("double") / F.count("c_acctbal"), 4).alias("avg"),
        )
        .collect()
    }
    assert got == want


def test_sparql_sum_rejects_iri_variable(spark, sf_dir):
    import pytest

    from rdf_mapreduce_joins_spark.plans.sparql import (
        SparqlUnsupportedError,
        sparql,
    )

    with pytest.raises(SparqlUnsupportedError):
        sparql(
            spark,
            sf_dir,
            "SELECT (SUM(?n) AS ?s) WHERE { ?c a <customer> ; <nation> ?n . }",
        ).collect()


def test_semantic_prune_invariants(spark, sf_dir):
    from rdf_mapreduce_joins_spark.operators import similarity

    e = load_table(spark, sf_dir, "embeddings")
    kept = similarity.semantic_prune(e, threshold=0.3)
    rows = kept.collect()
    n_corpus = e.count()
    assert 0 < len(rows) <= n_corpus
    # deterministic across partitionings
    again = similarity.semantic_prune(e.repartition(5), threshold=0.3)
    assert {(r.vec_id, r.cid) for r in again.collect()} == {
        (r.vec_id, r.cid) for r in rows
    }
    # every kept vector has NO kept smaller near-neighbor in its
    # cluster (greedy keep rule), verified brute-force in python
    import math

    data = {
        r.vec_id: (list(r.embedding), None) for r in e.collect()
    }
    cid_of = {}
    for r in rows:
        cid_of[r.vec_id] = r.cid

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 4)

    kept_ids = sorted(cid_of)
    by_cid: dict[int, list[int]] = {}
    for v in kept_ids:
        by_cid.setdefault(cid_of[v], []).append(v)
    for cid, ids in by_cid.items():
        for i, v in enumerate(ids):
            for u in ids[:i]:
                assert cos(data[u][0], data[v][0]) < 0.3, (u, v, cid)


def test_kmeans_clusters_partition_corpus(spark, sf_dir):
    from rdf_mapreduce_joins_spark.plans.llm import embedding_kmeans_clusters

    out = embedding_kmeans_clusters(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings")
    assert sum(r.n_vectors for r in out) == e.count()
    assert {r.cid for r in out} <= set(range(8))
