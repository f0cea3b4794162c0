"""SQL-string entry path (SURVEY.md §3.2 #3): the same engine surface
is reachable through spark.sql over registered temp views, and agrees
with the DataFrame-API plans — both land in the same Catalyst pipeline
after analysis, so any disagreement is a view-registration or
type-mapping bug, not an optimizer one."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.sources.tables import load_table, register_views


def test_sql_agrees_with_dataframe_join(spark, sf_dir):
    register_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT r_name, COUNT(*) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    ).collect()
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    want = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(x.r_name, x.n) for x in got} == {(x.r_name, x.n) for x in want}


def test_sql_window_and_limit(spark, sf_dir):
    register_views(spark, sf_dir)
    rows = spark.sql(
        """
        SELECT o_custkey, o_orderkey, rn FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders
        ) WHERE rn <= 2
        ORDER BY o_custkey, rn LIMIT 10
        """
    ).collect()
    assert len(rows) == 10
    assert all(r.rn <= 2 for r in rows)


def test_sql_triples_view(spark, sf_dir):
    """The triples view is also exposed to SQL users: rendering the
    unpivot as a TEMP VIEW makes every rdf_* shape writable as plain
    SQL against `triples`."""
    from rdf_mapreduce_joins_spark.plans.rdf import triples

    triples(spark, sf_dir, ["nation", "name"]).createOrReplaceTempView("triples")
    got = spark.sql(
        """
        SELECT t1.object AS nation, COUNT(*) AS n
        FROM triples t1
        WHERE t1.predicate = 'nation' AND t1.subject LIKE 'customer/%'
        GROUP BY t1.object
        """
    )
    assert got.count() == 25  # customers span all nations at sf0.001
