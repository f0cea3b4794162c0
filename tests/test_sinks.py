"""Write-side layout tests: each writer produces the layout it
promises, and the layout has the plan effect it exists for (pruning /
no-shuffle joins) — asserted on the plan, not just the files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.sources import sinks
from rdf_mapreduce_joins_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    sinks.write_partitioned(orders, path, ["o_orderstatus"])
    # hive-style dirs exist
    dirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert len(dirs) >= 2
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = _plan(back)
    # partition filter, not a data filter: pruning happened at file listing
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan.replace("#", "")[:100000]
    rows = back.select("o_orderkey").count()
    truth = orders.filter(F.col("o_orderstatus") == "F").count()
    assert rows == truth


def test_sorted_write_is_range_clustered(spark, sf_dir, tmp_path):
    path = str(tmp_path / "lineitem_sorted")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    sinks.write_sorted(li, path, ["l_orderkey"], num_files=4)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 2
    # range clustering: per-file key ranges are disjoint (allowing the
    # boundary key to repeat across adjacent files)
    ranges = []
    for f in files:
        stats = (
            spark.read.parquet(os.path.join(path, f))
            .agg(F.min("l_orderkey"), F.max("l_orderkey"))
            .collect()[0]
        )
        ranges.append((stats[0], stats[1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert lo >= hi
    assert spark.read.parquet(path).count() == li.count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """The whole point of bucketing: an equi-join between two tables
    bucketed on the join key plans with zero Exchange nodes.

    Uses the default warehouse dir (repo-local, gitignored) —
    warehouse.dir is a static conf that can't move on a live session."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    sinks.write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=4)
    sinks.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        num_buckets=4,
    )
    # disable broadcast so the join must pick a shuffle-or-bucket path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"), on="o_orderkey"
        )
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_zorder_skips_files_on_second_dimension(spark, sf_dir, tmp_path):
    """The z-order win, measured as the thing it buys: a narrow
    predicate on the SECOND clustered column must touch only a
    fraction of z-ordered files (their partkey min/max ranges are
    tight), while under a plain l_orderkey sort essentially every file
    spans the full partkey domain and none can be skipped."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    z_path = str(tmp_path / "z")
    s_path = str(tmp_path / "s")
    sinks.write_zordered(li, z_path, ["l_orderkey", "l_partkey"], num_files=16)
    sinks.write_sorted(li, s_path, ["l_orderkey"], num_files=16)

    lo, hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    width = (hi - lo) // 16 or 1
    q_lo, q_hi = lo + 5 * width, lo + 6 * width  # narrow mid-domain range

    def files_touched(path):
        touched, total = 0, 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            total += 1
            st = (
                spark.read.parquet(os.path.join(path, f))
                .agg(F.min("l_partkey"), F.max("l_partkey"))
                .collect()[0]
            )
            if st[0] <= q_hi and st[1] >= q_lo:
                touched += 1
        return touched, total

    z_touched, z_total = files_touched(z_path)
    s_touched, s_total = files_touched(s_path)
    assert s_touched == s_total  # plain sort cannot skip on partkey
    assert z_touched <= z_total // 2, (z_touched, z_total, s_touched, s_total)
    assert spark.read.parquet(z_path).count() == li.count()


def test_upsert_parquet_merges_and_inserts(spark, sf_dir, tmp_path):
    """upsert_parquet: updated keys replaced, new keys inserted,
    untouched rows preserved; output goes to a NEW path (write-new-
    then-repoint — never overwrite the directory being read)."""
    from pyspark.sql import functions as F

    from rdf_mapreduce_joins_spark.sources import sinks
    from rdf_mapreduce_joins_spark.sources.tables import load_table

    target_path = str(tmp_path / "nation")
    load_table(spark, sf_dir, "nation").write.parquet(target_path)
    updates = spark.createDataFrame(
        [(3, "RENAMED", 0), (999, "NEW_NATION", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    out = sinks.upsert_parquet(spark, target_path, updates, ["n_nationkey"])
    assert out != target_path
    merged = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in spark.read.parquet(out).collect()}
    assert merged[3] == ("RENAMED", 0)
    assert merged[999] == ("NEW_NATION", 1)
    assert merged[0][0] == "NATION_0"  # untouched row intact
    assert len(merged) == 26  # 25 original + 1 insert

    # schema drift is refused loudly
    bad = updates.withColumn("extra", F.lit(1))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sinks.upsert_parquet(spark, target_path, bad, ["n_nationkey"])


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    """compact_parquet: a many-tiny-file directory rewrites into the
    computed file count with identical rows."""
    import glob

    from rdf_mapreduce_joins_spark.sources import sinks
    from rdf_mapreduce_joins_spark.sources.tables import load_table

    frag = str(tmp_path / "fragmented")
    load_table(spark, sf_dir, "orders").repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 64
    out = sinks.compact_parquet(spark, frag, target_file_mb=128)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == 1  # tiny table -> one target-size file
    assert spark.read.parquet(out).count() == spark.read.parquet(frag).count()
    got = sorted(r.o_orderkey for r in spark.read.parquet(out).collect())
    want = sorted(r.o_orderkey for r in spark.read.parquet(frag).collect())
    assert got == want


def test_write_with_metrics_single_pass(spark, sf_dir, tmp_path):
    """The observed write returns the metrics the write itself
    computed — equal to a recount, without the second read."""
    import pyspark.sql.functions as F

    from rdf_mapreduce_joins_spark.sources import sinks

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "observed")
    got = sinks.write_with_metrics(
        df,
        out,
        metrics={
            "n_rows": F.count(F.lit(1)),
            "n_null_cust": F.sum(
                F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
            ),
            "revenue_cents": F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ),
        },
    )
    back = spark.read.parquet(out)
    assert got["n_rows"] == back.count() == df.count()
    assert got["n_null_cust"] == 0
    expect_rev = df.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
    ).first()[0]
    assert got["revenue_cents"] == expect_rev
