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
        # engine-internal sketch algorithms (Spark HLL++/KLL,
        # DataSketches HLL/KLL/Theta) whose estimates no ANSI SQL can
        # reproduce; error-bound + merge-law tested in
        # tests/test_sketches.py.
        "agg_approx_distinct",
        "agg_approx_percentiles",
        "agg_hll_mergeable",
        "agg_kll_quantiles",
        "agg_theta_distinct",
        "events_rolling_distinct_hll",
        # (r6 promotions to full oracles: rdf_pagerank — 1e-9 per-round
        # fixed-point; text_lang_id — 1e-6-rounded naive-Bayes scores;
        # multimodal_frame_sample/resize — ASCII-guarded char slicing;
        # multimodal_features — exact uint16/65536 checksum arithmetic;
        # embedding_kmeans_clusters + dedup_semantic_prune +
        # similarity_topk_ivf + similarity_knn_join_ivf — 1e-9
        # fixed-point centroid grid, unrolled Lloyd rounds;
        # similarity_topk_lsh — LCG hyperplanes as SQL literals;
        # dedup_near_minhash + dedup_simhash + dedup_retain_set_minhash
        # + text_heavy_hitters_cms — the md5-60bit cross-engine hash
        # family, operators/hashing.py. The xxhash64 production family
        # keeps Python value references in
        # tests/test_rowsonly_references.py;
        # embedding_pca_project — independently-derived literal oracle
        # resolved at oracle_sql() call time, registry LAZY_ORACLES.)
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


class TestDriverPriorityOrder:
    """_driver_priority_order spends the driver's first-50 sample well
    (VERDICT r3 #1 + ADVICE r3): hash-fails first, then never-checked,
    then a deterministic regression-rotation slice of passing queries;
    no_oracle rows go last and stop consuming slots."""

    def _order(self, monkeypatch, history, nfiles):
        monkeypatch.setattr(
            entrymod, "_driver_history", lambda: (history, nfiles)
        )
        return entrymod._driver_priority_order

    def test_tiers(self, monkeypatch):
        names = [f"q{i}" for i in range(20)]
        hist = {
            "q0": {"hash_match": True, "err": None},
            "q1": {"hash_match": False, "err": None},
            "q2": {"err": "no_oracle"},
            "q3": {"hash_match": True, "err": None},
        }
        order = self._order(monkeypatch, hist, 1)(names)
        assert order[0] == "q1"  # recorded hash-fail re-proven first
        never = [n for n in names if n not in hist]
        assert order[1 : 1 + len(never)] == never
        assert order[-1] == "q2"  # no_oracle can never hash-match
        assert set(order) == set(names)

    def test_rotation_advances_with_rounds(self, monkeypatch):
        names = [f"q{i}" for i in range(30)]
        hist = {n: {"hash_match": True, "err": None} for n in names}
        o1 = self._order(monkeypatch, hist, 1)(names)
        o2 = self._order(monkeypatch, hist, 2)(names)
        # all checked → first 8 is the rotation slice, and it moves
        assert o1[:8] != o2[:8]
        assert set(o1) == set(o2) == set(names)

    def test_new_queries_queue_behind_backlog(self, monkeypatch):
        """A query first registered THIS round must not displace a
        long-unproven backlog query (e.g. TPC-H) from the never-checked
        tier's front (round-4 roster rule)."""
        names = ["old_checked", "brand_new", "old_never"]
        hist = {"old_checked": {"hash_match": True, "err": None}}
        monkeypatch.setattr(
            entrymod,
            "_backlog_roster",
            lambda _n: {"old_checked", "old_never"},
        )
        order = self._order(monkeypatch, hist, 1)(names)
        assert order.index("old_never") < order.index("brand_new")

    def test_later_failure_unmasks_earlier_pass(self, monkeypatch):
        """A hash-FAIL recorded AFTER an earlier hash-match must put the
        query in tier 1 (classification uses the LATEST row — the
        keep-first-True version masked regressions forever; round-4
        self-review finding)."""
        import glob as _glob
        import json as _json
        import os as _os
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            for i, verdict in enumerate([True, False], start=1):
                with open(_os.path.join(td, f"CORRECTNESS_r0{i}.json"), "w") as fh:
                    _json.dump({"qx": {"hash_match": verdict, "err": None}}, fh)
            real_glob = _glob.glob
            monkeypatch.setattr(
                entrymod.glob,
                "glob",
                lambda pat: real_glob(_os.path.join(td, "CORRECTNESS_r*.json")),
            )
            latest, nfiles = entrymod._driver_history()
        assert nfiles == 2
        assert latest["qx"]["hash_match"] is False
        # and the failed classification flows through the ordering path
        hist = {"qx": {"hash_match": False, "err": None}}
        order = self._order(monkeypatch, hist, 2)(["qa", "qx"])
        assert order[0] == "qx"

    def test_errored_rows_requeue_as_unverified(self, monkeypatch):
        """A row whose oracle run CRASHED (err set, hash null, not
        no_oracle) is not a verification — it must requeue in tier 2,
        not hide in the passed pool (round-4 self-review finding)."""
        names = ["crashed", "ok"]
        hist = {
            "crashed": {"hash_match": None, "err": "AnalysisException: boom"},
            "ok": {"hash_match": True, "err": None},
        }
        order = self._order(monkeypatch, hist, 1)(names)
        assert order.index("crashed") < order.index("ok")

    def test_order_is_permutation_with_promotions(self, monkeypatch):
        """Promoted (no_oracle row + oracle now registered) names must
        appear exactly once — the set-algebra version emitted them
        twice (round-4 self-review finding)."""
        names = ["events_ewma", "plain"]  # events_ewma HAS an oracle now
        hist = {
            "events_ewma": {"hash_match": None, "err": "no_oracle"},
            "plain": {"hash_match": True, "err": None},
        }
        order = self._order(monkeypatch, hist, 1)(names)
        assert sorted(order) == sorted(names)
        assert order.count("events_ewma") == 1

    def test_deterministic_without_history(self, monkeypatch):
        names = [f"q{i}" for i in range(10)]
        order = self._order(monkeypatch, {}, 0)(names)
        assert order == names  # registry order, nothing to reshuffle

    def test_source_changed_query_outranks_passed_pool(self, monkeypatch):
        """VERDICT r5 #3: a query whose source fingerprint changed since
        its last driver verification must requeue in the unverified tier
        (ahead of rotation/tier-4), not hide behind its old hash row."""
        names = [f"q{i}" for i in range(30)]
        hist = {n: {"hash_match": True, "err": None} for n in names}
        monkeypatch.setattr(
            entrymod, "_changed_fingerprints", lambda: {"q25"}
        )
        order = self._order(monkeypatch, hist, 1)(names)
        assert order[0] == "q25"  # only unverified name → front
        # and a recorded hash-fail still outranks a source change
        hist["q7"] = {"hash_match": False, "err": None}
        order = self._order(monkeypatch, hist, 1)(names)
        assert order[:2] == ["q7", "q25"]

    def test_live_fingerprints_cover_registry(self):
        """The committed fingerprint file must equal the live registry
        (VERDICT r6 #1 design fix): every registered query is stamped at
        registration (``tools/refresh_fingerprints.py`` default mode),
        so an incoming CORRECTNESS file can never orphan a name and open
        a round red. Coverage no longer keys on driver history at all —
        the gap this test guards can only appear at COMMIT time (a new
        ``@query`` without a refresh run), where this very test catches
        it locally."""
        import json as _json
        import os as _os

        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(entrymod.__file__)),
            "tools",
            "query_fingerprints.json",
        )
        recorded = _json.load(open(path))
        qs = entrymod.queries()
        stale = set(recorded) - set(qs)
        assert not stale, f"fingerprinted-but-unregistered: {sorted(stale)}"
        missing = [n for n in qs if n not in recorded]
        assert not missing, (
            f"registered-but-unfingerprinted: {missing} — run "
            "python tools/refresh_fingerprints.py before committing"
        )

    def test_first_50_covers_fails_and_unchecked_now(self):
        """With the REAL committed CORRECTNESS files: every recorded
        hash-fail and every never-checked query must land in the
        first-50 driver sample window."""
        order = list(entrymod.queries())
        best, _ = entrymod._driver_history()
        fails = [n for n in order if best.get(n, {}).get("hash_match") is False]
        never = [n for n in order if n not in best]
        window = set(order[:50])
        assert all(n in window for n in fails + never) or len(fails + never) > 50
