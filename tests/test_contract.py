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
        "multimodal_features",
        "multimodal_frame_sample",
        "multimodal_resize",
        "agg_approx_distinct",
        "similarity_topk_ivf",
        "similarity_knn_join_ivf",
    }


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    # schema is resolvable and the plan executes
    assert df.columns
    assert df.count() >= 0
