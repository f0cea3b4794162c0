"""Streaming near-dup detection tests: per-row SimHash parity with the
batch form, and cross-micro-batch candidate detection with bounded
bucket state."""

from __future__ import annotations

import glob
import os
import re
import shutil
import time

import pytest
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators import dedup
from rdf_mapreduce_joins_spark.sources.tables import load_table
from rdf_mapreduce_joins_spark.streaming import docs_stream as ds
from rdf_mapreduce_joins_spark.streaming.events_stream import run_to_memory

DOCS_SCHEMA = "doc_id bigint, text string"


def test_simhash_per_row_equals_batch(spark, sf_dir):
    """with_simhash_bands (stateless per-row fold — the streaming form)
    must be bit-identical to simhash_signatures (explode + groupBy
    aggregation — the batch form) on the real corpus."""
    d = load_table(spark, sf_dir, "documents")
    batch = {r.doc_id: list(r.bands) for r in dedup.simhash_signatures(d).collect()}
    perrow = {
        r.doc_id: list(r.bands)
        for r in dedup.with_simhash_bands(d).select("doc_id", "bands").collect()
    }
    assert perrow == batch and batch


@pytest.fixture(scope="module")
def doc_batches_dir(spark, tmp_path_factory):
    """Two micro-batches: batch 1 has two near-identical docs (1, 2)
    and one unrelated (3); batch 2 re-sends doc 1's text as doc 4 —
    detecting it requires state SURVIVING across batches."""
    base = "spark shuffle join partition filter sort aggregate window broadcast"
    near = base + " extra"
    other = "completely different words about nothing in particular here yes"
    flat = tmp_path_factory.mktemp("docs_flat")
    raw = tmp_path_factory.mktemp("docs_raw")

    def write(name, rows, mtime_off):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.parquet(
            str(raw / name)
        )
        src = glob.glob(str(raw / name / "*.parquet"))[0]
        dst = str(flat / f"{name}.parquet")
        shutil.copy(src, dst)
        t = time.time() + mtime_off
        os.utime(dst, (t, t))

    write("b1", [(1, base), (2, near), (3, other)], 0)
    write("b2", [(4, base)], 10)
    return str(flat)


def test_candidates_detected_across_batches(spark, doc_batches_dir):
    stream = ds.read_docs_stream(spark, doc_batches_dir, max_files_per_trigger=1)
    out = run_to_memory(
        ds.simhash_candidates_stream(stream), "t_docdedup", "append"
    ).collect()
    pairs = {(r.doc_id, r.first_doc_id) for r in out}
    # doc 2 collides with doc 1 within batch 1 (near-identical text)
    assert (2, 1) in pairs
    # doc 4 (batch 2) collides with doc 1 (batch 1): cross-batch state
    assert (4, 1) in pairs
    # the unrelated doc never appears as a candidate
    assert all(d != 3 and f != 3 for d, f in pairs)
    # identical docs collide on ALL 4 bands
    assert sum(1 for d, f in [(r.doc_id, r.first_doc_id) for r in out] if (d, f) == (4, 1)) == 4


def test_stream_candidates_agree_with_batch_pairs(spark, doc_batches_dir):
    """Candidate coverage parity: every batch simhash_pairs pair over
    the same corpus must be witnessed by at least one streaming
    candidate row linking the two docs through a shared bucket (possibly
    transitively via the bucket's first member)."""
    corpus = spark.read.parquet(doc_batches_dir)
    sigs = dedup.simhash_signatures(corpus)
    batch_pairs = {
        (r.d1, r.d2) for r in dedup.simhash_pairs(sigs, max_hamming=8).collect()
    }
    stream = ds.read_docs_stream(spark, doc_batches_dir, max_files_per_trigger=1)
    out = run_to_memory(
        ds.simhash_candidates_stream(stream), "t_docdedup2", "append"
    ).collect()
    # union-find over (doc -> bucket-first) links
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in out:
        union(r.doc_id, r.first_doc_id)
    for d1, d2 in batch_pairs:
        assert find(d1) == find(d2), f"batch pair ({d1},{d2}) not linked in stream"


@pytest.fixture(scope="module")
def cluster_batches_dir(spark, tmp_path_factory):
    """Three micro-batches engineered so clusters MERGE across batches:
    batch1 docs 10/11 are near-dups; batch2 doc 20 matches neither;
    batch3 doc 30 is a near-dup of BOTH 11 and 20's families, bridging
    an old cluster and an old singleton — the case where incremental
    merge must relabel previously-persisted assignments."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a2 = a + " lambda"
    b = "one two three four five six seven eight nine ten eleven"
    bridge = a + " one two three four five six seven eight nine ten"
    flat = tmp_path_factory.mktemp("docs_clusters_flat")
    raw = tmp_path_factory.mktemp("docs_clusters_raw")

    def write(name, rows, mtime_off):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.parquet(
            str(raw / name)
        )
        src = glob.glob(str(raw / name / "*.parquet"))[0]
        dst = str(flat / f"{name}.parquet")
        shutil.copy(src, dst)
        t = time.time() + mtime_off
        os.utime(dst, (t, t))

    write("b1", [(10, a), (11, a2)], 0)
    write("b2", [(20, b)], 10)
    write("b3", [(30, bridge)], 20)
    return str(flat)


def test_incremental_components_stream_equals_from_scratch(
    spark, cluster_batches_dir, tmp_path
):
    """The streaming incremental-clustering sink's FINAL persisted
    assignments equal a from-scratch batch run over everything that
    arrived (the merge algebra's invariant, exercised through the real
    foreachBatch replay path, one file per micro-batch)."""
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = ds.read_docs_stream(spark, cluster_batches_dir, max_files_per_trigger=1)
    q = ds.incremental_components_sink(
        stream, state, ckpt, min_est_jaccard=0.2, bands=32, rows_per_band=2
    )
    q.awaitTermination(300)
    got = {
        r.node: r.component
        for r in ds.read_assignments(spark, state).collect()
    }
    corpus = spark.read.parquet(cluster_batches_dir)
    sigs = dedup.minhash_signatures(corpus, num_perm=64)
    pairs = dedup.minhash_lsh_pairs(
        sigs, bands=32, rows_per_band=2, min_est_jaccard=0.2
    )
    labels = {
        r.node: r.component
        for r in dedup.connected_components(pairs, "d1", "d2").collect()
    }
    want = {
        r.doc_id: labels.get(r.doc_id, r.doc_id) for r in corpus.collect()
    }
    assert got == want
    # the bridge doc must actually have merged previously-separate state
    assert got[30] == got[10] == got[11] == got[20]


def test_merge_components_batch_replay_idempotent(spark, tmp_path):
    """Re-delivering the SAME batch (foreachBatch's at-least-once case)
    leaves assignments unchanged and does not self-pair a doc against
    its own earlier signature row."""
    state = str(tmp_path / "state")
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch = spark.createDataFrame([(1, a), (2, a + " extra")], DOCS_SCHEMA)
    ds.merge_components_batch(spark, batch, state, min_est_jaccard=0.2)
    first = {
        r.node: r.component for r in ds.read_assignments(spark, state).collect()
    }
    ds.merge_components_batch(spark, batch, state, min_est_jaccard=0.2)
    second = {
        r.node: r.component for r in ds.read_assignments(spark, state).collect()
    }
    assert first == second == {1: 1, 2: 1}


def test_band_index_probe_prunes_partitions(spark, tmp_path):
    """The persisted band index must prune at FILE LISTING on a probe
    (VERDICT r7 #3): after several merged batches, the pruned read for
    a small batch's (band, pfx) key set touches strictly fewer files
    than the full index, and every listed file lives in a probed
    partition directory."""
    state = str(tmp_path / "state")
    texts = [
        " ".join(f"w{i}x{j}" for j in range(12)) for i in range(12)
    ]
    for i in range(0, 12, 4):
        batch = spark.createDataFrame(
            [(100 + i + k, texts[i + k]) for k in range(4)], DOCS_SCHEMA
        )
        ds.merge_components_batch(spark, batch, state, min_est_jaccard=0.2)
    idx_path = os.path.join(state, "band_index")
    full = spark.read.parquet(idx_path)
    all_leaves = {
        re.search(r"band=(\d+)/pfx=(\d+)/", f).groups()
        for f in full.inputFiles()
    }
    # a 1-doc probe occupies at most `bands` (band, pfx) leaves
    probe = spark.createDataFrame([(999, texts[0])], DOCS_SCHEMA)
    from rdf_mapreduce_joins_spark.operators.dedup import (
        band_index_entries,
        minhash_signatures,
    )

    entries = band_index_entries(
        minhash_signatures(probe, num_perm=64), extra_cols=("sig",)
    ).withColumn("pfx", ds._pfx_col())
    keys = [
        r.band * ds._N_PFX + r.pfx
        for r in entries.select("band", "pfx").distinct().collect()
    ]
    pruned = full.filter(
        (F.col("band") * ds._N_PFX + F.col("pfx")).isin(keys)
    )
    # the predicate must reach the scan as a PARTITION filter (pruned
    # at file listing, the inverted_index/IVF idiom) …
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters", 1)
    assert len(seg) == 2 and "band" in seg[1][:160] and "pfx" in seg[1][:160]
    # … and the probed leaf set is a strict subset of the index's
    probed_dirs = {
        (str(k // ds._N_PFX), str(k % ds._N_PFX)) for k in keys
    }
    assert probed_dirs < all_leaves
    # every surviving row lives in a probed leaf (pruning is correct,
    # not just present)
    bad = pruned.filter(
        ~(F.col("band") * ds._N_PFX + F.col("pfx")).isin(keys)
    ).count()
    assert bad == 0 and pruned.count() > 0


def test_assignments_pointer_flip_is_atomic_commit_point(spark, tmp_path):
    """Versioned-snapshot publishing (ADVICE r7): each merge writes a
    NEW assignments-v* directory and flips ASSIGNMENTS_CURRENT last —
    the previous snapshot survives the flip (n-1 GC), so a crash
    mid-write can never lose the persisted labels, and read_assignments
    resolves only the committed snapshot."""
    state = str(tmp_path / "state")
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = spark.createDataFrame([(1, a), (2, a + " x")], DOCS_SCHEMA)
    b2 = spark.createDataFrame([(3, a + " y")], DOCS_SCHEMA)
    ds.merge_components_batch(spark, b1, state, min_est_jaccard=0.2)
    v0 = open(os.path.join(state, "ASSIGNMENTS_CURRENT")).read().strip()
    ds.merge_components_batch(spark, b2, state, min_est_jaccard=0.2)
    v1 = open(os.path.join(state, "ASSIGNMENTS_CURRENT")).read().strip()
    assert v0 != v1
    # both the committed and the predecessor snapshot exist on disk
    assert os.path.isdir(os.path.join(state, v1))
    assert os.path.isdir(os.path.join(state, v0))
    got = {r.node: r.component for r in ds.read_assignments(spark, state).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_compaction_then_merge_equals_from_scratch(spark, tmp_path):
    """Epoch compaction at the stream-state level (the twin of the
    oracled batch query dedup_epoch_compaction): after merging epochs
    0-2, compacting at min_epoch=1 must (a) DELETE epoch-0 index
    directories outright (eviction is a partition delete), (b) publish
    assignments equal to from-scratch clustering over the retained
    docs only — clusters glued solely through evicted docs split —
    and (c) leave the state mergeable: a later batch folds in and the
    result still equals from-scratch over retained ∪ new."""
    state = str(tmp_path / "state")
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "one two three four five six seven eight nine ten eleven"
    bridge = a + " one two three four five six seven eight nine ten"
    batches = {
        0: [(10, a), (11, bridge)],   # 11 bridges a-family and b-family
        1: [(20, a + " x")],
        2: [(30, b)],
    }
    for ep, rows in batches.items():
        ds.merge_components_batch(
            spark,
            spark.createDataFrame(rows, DOCS_SCHEMA),
            state,
            min_est_jaccard=0.2,
            bands=32,
            rows_per_band=2,
            epoch=ep,
        )
    before = {r.node: r.component for r in ds.read_assignments(spark, state).collect()}
    # pre-compaction, the bridge doc links 20 and 30's families via 10/11
    assert before[20] == before[30] == before[10] == before[11] == 10

    ds.compact_components_state(
        spark, state, min_epoch=1, min_est_jaccard=0.2, bands=32, rows_per_band=2
    )
    idx = os.path.join(state, "band_index")
    assert not os.path.isdir(os.path.join(idx, "epoch=0"))
    assert os.path.isdir(os.path.join(idx, "epoch=1"))
    got = {r.node: r.component for r in ds.read_assignments(spark, state).collect()}
    # from-scratch over retained docs {20, 30}: unrelated texts → two
    # singletons, the evicted bridge no longer glues them
    assert got == {20: 20, 30: 30}

    # (c) post-compaction merge: doc 40 is a near-dup of 20's text
    ds.merge_components_batch(
        spark,
        spark.createDataFrame([(40, a + " y")], DOCS_SCHEMA),
        state,
        min_est_jaccard=0.2,
        bands=32,
        rows_per_band=2,
        epoch=3,
    )
    final = {r.node: r.component for r in ds.read_assignments(spark, state).collect()}
    # from-scratch over {20, 30, 40}: 20-40 cluster, 30 singleton
    corpus = spark.createDataFrame(
        [(20, a + " x"), (30, b), (40, a + " y")], DOCS_SCHEMA
    )
    sigs = dedup.minhash_signatures(corpus, num_perm=64)
    pairs = dedup.minhash_lsh_pairs(
        sigs, bands=32, rows_per_band=2, min_est_jaccard=0.2
    )
    labels = {
        r.node: r.component
        for r in dedup.connected_components(pairs, "d1", "d2").collect()
    }
    want = {i: labels.get(i, i) for i in (20, 30, 40)}
    assert final == want and final[40] == final[20] != final[30]


def test_publish_gc_survives_crashed_orphan_snapshot(spark, tmp_path):
    """ADVICE r8: GC must retain by IDENTITY (the pointer-named dir),
    not position. Simulate a publish that crashed after creating its
    assignments-v* directory but before the pointer flip: the next
    successful publish must keep the genuinely-current predecessor
    (the pointer-named one), collect the orphan, and read_assignments
    must keep resolving correctly throughout."""
    state = str(tmp_path / "state")
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds.merge_components_batch(
        spark, spark.createDataFrame([(1, a)], DOCS_SCHEMA), state,
        min_est_jaccard=0.2,
    )
    committed = open(os.path.join(state, "ASSIGNMENTS_CURRENT")).read().strip()
    # crashed publish: a half-written v-dir that sorts AFTER `committed`
    orphan = "assignments-v999999998"
    os.makedirs(os.path.join(state, orphan))
    ds.merge_components_batch(
        spark, spark.createDataFrame([(2, a + " x")], DOCS_SCHEMA), state,
        min_est_jaccard=0.2,
    )
    new = open(os.path.join(state, "ASSIGNMENTS_CURRENT")).read().strip()
    # the real predecessor survives; the orphan is collected
    assert os.path.isdir(os.path.join(state, committed))
    assert not os.path.isdir(os.path.join(state, orphan))
    assert os.path.isdir(os.path.join(state, new)) and new != committed
    got = {r.node: r.component for r in ds.read_assignments(spark, state).collect()}
    assert got == {1: 1, 2: 1}


def test_compaction_universe_keeps_capped_out_docs(spark, tmp_path):
    """ADVICE r8 (medium): docs whose EVERY band bucket exceeds the
    bucket cap must survive compaction as singletons — the assignments
    universe is the full retained-doc set (pre-cap), matching the
    batch twin dedup_epoch_compaction's full-universe semantics."""
    state = str(tmp_path / "state")
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # 5 identical docs: every (band, bh) bucket they occupy has 5
    # members, so a cap of 4 drops ALL their index rows.
    rows = [(i, a) for i in range(1, 6)] + [(9, "unrelated words here only")]
    ds.merge_components_batch(
        spark, spark.createDataFrame(rows, DOCS_SCHEMA), state,
        min_est_jaccard=0.2, bands=32, rows_per_band=2, epoch=0,
    )
    ds.compact_components_state(
        spark, state, min_epoch=0, min_est_jaccard=0.2,
        bands=32, rows_per_band=2, bucket_cap=4,
    )
    got = {r.node: r.component for r in ds.read_assignments(spark, state).collect()}
    # capped-out docs 1-5 surface as singletons (no pairs → own label);
    # doc 9's buckets are under the cap and it is a singleton anyway
    assert got == {i: i for i in (1, 2, 3, 4, 5, 9)}


def test_compaction_publishes_before_evicting(spark, tmp_path, monkeypatch):
    """ADVICE r8: eviction must happen AFTER the snapshot publish — a
    crash during publish leaves every epoch directory intact (and the
    old snapshot current), so a rerun sees the full index."""
    state = str(tmp_path / "state")
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for ep, did in ((0, 10), (1, 20)):
        ds.merge_components_batch(
            spark, spark.createDataFrame([(did, a + f" {ep}")], DOCS_SCHEMA),
            state, min_est_jaccard=0.2, bands=32, rows_per_band=2, epoch=ep,
        )
    before = open(os.path.join(state, "ASSIGNMENTS_CURRENT")).read().strip()

    def boom(updated, state_dir):
        raise RuntimeError("simulated crash during publish")

    monkeypatch.setattr(ds, "_publish_assignments", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ds.compact_components_state(
            spark, state, min_epoch=1, min_est_jaccard=0.2,
            bands=32, rows_per_band=2,
        )
    idx = os.path.join(state, "band_index")
    # nothing evicted, old snapshot still current → compaction reruns
    assert os.path.isdir(os.path.join(idx, "epoch=0"))
    assert os.path.isdir(os.path.join(idx, "epoch=1"))
    assert open(os.path.join(state, "ASSIGNMENTS_CURRENT")).read().strip() == before
    monkeypatch.undo()
    ds.compact_components_state(
        spark, state, min_epoch=1, min_est_jaccard=0.2,
        bands=32, rows_per_band=2,
    )
    assert not os.path.isdir(os.path.join(idx, "epoch=0"))
    got = {r.node: r.component for r in ds.read_assignments(spark, state).collect()}
    assert got == {20: 20}
