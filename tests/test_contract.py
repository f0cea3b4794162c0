"""Driver-contract smoke tests: entry() works, every declared query
runs at sf0.001 with a stable schema, oracle keys are consistent."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["c", "n", "r", "rname"]


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the rows-only set is intentional and closed
    assert set(qs) - set(oracles) == {
        "dedup_near_minhash",
        "dedup_simhash",
        "similarity_topk_lsh",
        "text_lang_id",
        "embedding_pca_project",
        "multimodal_features",
        "multimodal_frame_sample",
        "multimodal_resize",
        "agg_approx_distinct",
        "similarity_topk_ivf",
        "similarity_knn_join_ivf",
        "dedup_retain_set_minhash",
        "rdf_pagerank",
        "agg_approx_percentiles",
        "text_heavy_hitters_cms",
        "events_ewma",
        "dedup_semantic_prune",
        "embedding_kmeans_clusters",
    }


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_events_loader_matches_live_testdata(spark, sf):
    """Environment-drift guard (VERDICT r1 #4): whatever physical type
    the driver's current fixtures store events.ts as, the loader must
    resolve the canonical ts_ns/ts_s/ts trio — loudly, in tests, not in
    the driver run."""
    from rdf_mapreduce_joins_spark.sources.tables import load_table

    e = load_table(spark, f"/root/testdata/{sf}", "events")
    dtypes = dict(e.dtypes)
    assert dtypes["ts_ns"] == "bigint"
    assert dtypes["ts_s"] == "bigint"
    assert dtypes["ts"] == "timestamp"
    row = e.select("ts_ns", "ts_s", "ts").first()
    assert row.ts_ns // 1_000_000_000 == row.ts_s
    # ts renders the same instant (UTC session): epoch-seconds agree
    assert int(row.ts.timestamp()) == row.ts_s


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    # schema is resolvable and the plan executes
    assert df.columns
    assert df.count() >= 0
