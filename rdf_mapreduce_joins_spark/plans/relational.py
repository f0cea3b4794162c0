"""Relational layer: declared queries over the star schema directly
(SURVEY.md §2.10 table 2).

Same operator families as the RDF layer (the reference's join shapes and
strategies, SURVEY.md §2.3) exercised on the TPC-H-ish tables, plus the
aggregation / window / set-op / scalar surface the reference lacks but
the driver's relational contract requires.

Determinism discipline (SURVEY.md §2.10): every float aggregate is
ROUND()ed identically on both sides; every LIMIT/OFFSET/top-k carries a
unique-key tiebreaker; int-typed derivations (year, length, row_number)
are cast to the same width on both sides (Spark and DuckDB defaults
differ: DuckDB length()/year() return BIGINT, SUM(int) returns HUGEINT).

Scale notes: all aggregations here are partial+final hash aggregates
(map-side combine for free); the fact-to-fact joins shuffle on the join
key while dimension joins broadcast (explicit `F.broadcast` on known
dims, AQE otherwise). Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators.ranking import (
    RANK_GLOBAL_WINDOW_MAX_INPUT_BYTES,
    bucketed_running_sum,
    plan_size_bytes,
)
from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import bounded_sort, load_table


# --------------------------------------------------------------------------
# Scan / filter / aggregate
# --------------------------------------------------------------------------


@query(
    "scan_project_filter",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped scan+filter+project (P1-P3). The three filters and
    the 4-column projection reach the parquet scan (PushedFilters /
    ReadSchema — the Catalyst equivalent of the reference's in-mapper
    selection, SURVEY.md §4.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_group_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           ROUND(AVG(l_quantity), 2)                                   AS avg_qty,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-31'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (A3): partial+final hash agg,
    the built-in equivalent of the reference's combiner jobs. Money
    sums accumulate in DECIMAL (exact, order-independent — see
    join_sortmerge); quantity is integer-valued so its double sum is
    already exact, and the averages divide exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "join_sortmerge",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name
    """,
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact chain join (J2, JS1): lineitem ⋈ orders ⋈ customer,
    revenue per customer. The big sides shuffle on the join keys
    (Spark's Exchange = the reference's MapReduce repartition join,
    minus the per-job HDFS materialization, SURVEY.md §3).

    Revenue accumulates in DECIMAL, not DOUBLE: money sums over
    thousands of items per group hit float-association noise at the
    cent boundary (observed at sf0.1 — one group off by $0.01 vs the
    oracle under a different summation order). Decimal aggregation is
    exact and order-independent; TPC-H defines these columns as
    decimal for the same reason."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(price * (1 - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                 / 100.0, 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension joins (J9, JS2): nation and region are broadcast
    explicitly — the Spark analog of the reference's map-side
    distributed-cache join. No shuffle for the joins; only the final
    aggregation exchanges."""
    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # cents-BIGINT accumulation (the sf10 money-sum class)
            F.round(
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                / 100.0,
                2,
            ).alias("total_acctbal"),
        )
    )


@query(
    "semi_anti_orders",
    oracle="""
    WITH flags AS (
      SELECT c_mktsegment AS seg,
             EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_order
      FROM customer
    )
    SELECT seg,
           COUNT(*) FILTER (WHERE has_order)     AS with_orders,
           COUNT(*) FILTER (WHERE NOT has_order) AS without_orders
    FROM flags GROUP BY seg
    """,
)
def semi_anti_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join (J6, J7): per market segment, customers with vs
    without orders, via explicit left_semi / left_anti joins."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("with_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("without_orders"))
    )
    zero = F.lit(0).cast("long")
    return (
        semi.join(anti, on="seg", how="full_outer")
        .select(
            "seg",
            F.coalesce("with_orders", zero).alias("with_orders"),
            F.coalesce("without_orders", zero).alias("without_orders"),
        )
    )


@query(
    "subquery_correlated_acctbal",
    oracle="""
    WITH s AS (
      SELECT c_nationkey,
             SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS tot,
             COUNT(*) AS n
      FROM customer GROUP BY c_nationkey
    )
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer JOIN s USING (c_nationkey)
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n > tot
    """,
)
def subquery_correlated_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (Catalyst decorrelation surface):
    customers whose balance is above their nation's average, written as
    TWO correlated scalar subqueries in the SQL entry path. Catalyst
    decorrelates both into aggregate-plus-join — no per-row re-execution
    (the plan is gated in tests: no nested-loop, subqueries collapsed).
    The oracle uses the already-decorrelated join formulation, so the
    rewrite itself is differential-tested.

    Determinism: the avg comparison is division-free (balance·n > sum)
    in exact DECIMAL on both engines — no float summation-order or
    ulp-at-the-boundary risk."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    return spark.sql("""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM sq_customer c1
        WHERE CAST(c_acctbal AS DECIMAL(12,2))
              * (SELECT COUNT(*) FROM sq_customer c2
                 WHERE c2.c_nationkey = c1.c_nationkey)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM sq_customer c3
                 WHERE c3.c_nationkey = c1.c_nationkey)
    """)


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------


@query(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment AS seg,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers,
           ROUND(AVG(c_acctbal), 2) AS avg_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (A4). At 100 TB the approximate form
    (approx_count_distinct / HLL++) is one token away; exact is kept
    here because the oracle must hash-match."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(r_name, '(all)') AS region_name,
           COALESCE(n_name, '(all)') AS nation_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                 / 100.0, 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (A5): region → nation → grand total in one
    pass (Spark expands grouping sets without rescanning the input)."""
    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # cents-BIGINT accumulation (the sf10 money-sum class)
            F.round(
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                / 100.0,
                2,
            ).alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


# --------------------------------------------------------------------------
# Windows / sorts / limits / set ops
# --------------------------------------------------------------------------


@query(
    "window_rank_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS INTEGER) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (W1, O3): rank window + filter. One
    shuffle on the partition key; no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (W3): frame aggregate with a fully
    deterministic accumulation order (orderdate, orderkey) so the float
    sum is reproducible across engines."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "orderby_limit_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS LAST
    LIMIT 10
    """,
)
def orderby_limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 (O1, O2): Spark plans this as TakeOrderedAndProject
    (per-partition top-k + merge), never a full sort — the scalable
    top-k physical form."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .limit(10)
    )


@query(
    "setops_segments",
    oracle="""
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         b AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'both' AS which, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t
    UNION ALL
    SELECT 'only_building' AS which, c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b) u
    """,
)
def setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (O5): BUILDING-segment customers that do /
    don't appear among order placers, tagged and unioned."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    both = a.intersect(b).select(F.lit("both").alias("which"), "c_custkey")
    only_a = a.subtract(b).select(F.lit("only_building").alias("which"), "c_custkey")
    return both.unionByName(only_a)


# --------------------------------------------------------------------------
# Scalar function surface (SURVEY.md §2.7)
# --------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                    AS uname,
           SUBSTRING(p_name, 1, 4)                          AS prefix4,
           CAST(LENGTH(p_name) AS INTEGER)                  AS name_len,
           CONCAT_WS('-', p_brand, p_type)                  AS brand_type,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1)           AS brand_num,
           TRIM(LOWER(p_type))                              AS ltype
    FROM part
    WHERE p_name LIKE '%e%'
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (§2.7): upper/substring/length/concat_ws/
    regexp_extract/trim/lower + LIKE pushdown. All JVM-side built-ins
    inside whole-stage codegen — no Python in the loop."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%e%")).select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 4).alias("prefix4"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.trim(F.lower(F.col("p_type"))).alias("ltype"),
    )


@query(
    "scalar_date_math",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INTEGER)  AS yr,
           CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
           COUNT(*)                            AS n_orders,
           ROUND(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 / 100.0, 2)                AS total,
           ROUND(AVG(o_totalprice / 7.0), 2)   AS avg_weekly,
           CAST(FLOOR(MAX(o_totalprice)) AS BIGINT) AS max_floor,
           ROUND(SQRT(AVG(o_totalprice)), 4)   AS sqrt_avg
    FROM orders
    GROUP BY yr, mo
    """,
)
def scalar_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date + math function family (§2.7): year/month extraction
    (UTC session — matches DuckDB's naive timestamps) with arithmetic,
    floor, sqrt."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
                / 100.0,
                2,
            ).alias("total"),
            F.round(F.avg(F.col("o_totalprice") / 7.0), 2).alias("avg_weekly"),
            F.floor(F.max("o_totalprice")).cast("bigint").alias("max_floor"),
            F.round(F.sqrt(F.avg("o_totalprice")), 4).alias("sqrt_avg"),
        )
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS avg_k,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column extraction (S4): schema-full from_json over the
    events props column (≈4× faster than per-path get_json_object —
    one parse, vectorized), aggregated per event type."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k").cast("double")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k), 2).alias("avg_k"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(LENGTH(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
           ROUND(SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 4) AS l2_norm,
           ROUND(list_sum(CAST(embedding[1:4] AS DOUBLE[])), 4) AS head4_sum
    FROM embeddings
    """,
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family (§2.7): size/element_at/slice plus
    higher-order transform+aggregate (the JVM-side lambda path — no UDF)
    over the 64-dim embedding column."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)
    head4 = F.aggregate(
        F.slice(dbl, 1, 4), F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(head4, 4).alias("head4_sum"),
    )


# --------------------------------------------------------------------------
# A4 approx / A5 cube / W2 lag-lead / U2 UDAF / U3 UDTF surface
# --------------------------------------------------------------------------


@query(
    "agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 / 100.0, 2) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube (A5): all 2^k grouping-set combinations in one pass —
    Spark expands the sets with a single Expand node over one scan, so
    the input is read once regardless of k."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # cents-BIGINT accumulation: the raw double SUM splits the
            # 2-digit rounding across engines at sf10 volume (tpch_q1
            # r8 lesson)
            F.round(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
                )
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS delta_prev,
           ROUND(LEAD(o_totalprice) OVER w - o_totalprice, 2) AS delta_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (W2): per-customer order-to-order
    price deltas. lag and lead share one window spec, so both evaluate
    in a single sort within one shuffle on the partition key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "delta_prev"
        ),
        F.round(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2).alias(
            "delta_next"
        ),
    )


@query("agg_approx_distinct")  # rows-only: HLL estimates are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (A4, HLL++): the 100 TB form of
    agg_count_distinct — fixed-size sketch per group, mergeable across
    partitions, no exact-distinct shuffle explosion. Rows-only check:
    DuckDB's approx sketch produces different estimates by design, so
    the exact-match oracle cannot apply; the exact twin query is the
    semantic anchor."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "udaf_grouped_stats",
    oracle="""
    SELECT c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(c_acctbal), 4) AS mean_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS std_bal,
           ROUND(MEDIAN(c_acctbal), 4) AS median_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def udaf_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF surface (U2) via grouped-map applyInPandas: per-
    nation account-balance stats computed in pandas (ddof=1 std and
    interpolated median match DuckDB's STDDEV_SAMP/MEDIAN exactly).
    The point is the mechanism — one Arrow batch per group, group key
    carried through — for aggregates Spark lacks built-ins for;
    mean/std/median are used here so the DuckDB oracle can verify the
    path end-to-end. Scale note: grouped-map materializes each group
    in one worker's memory, so the grouping key must be bounded
    (25 nations), never a high-cardinality key."""
    import pandas as pd

    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        return pd.DataFrame(
            {
                "nationkey": [int(pdf["c_nationkey"].iloc[0])],
                "n": [len(bal)],
                "mean_bal": [round(bal.mean(), 4)],
                "std_bal": [round(bal.std(ddof=1), 4)],
                "median_bal": [round(bal.median(), 4)],
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        stats, schema="nationkey int, n bigint, mean_bal double, std_bal double, median_bal double"
    )


@query(
    "udtf_json_props",
    oracle="""
    SELECT event_id, u.k AS prop_key,
           json_extract_string(props, '$.' || u.k) AS prop_value
    FROM events, unnest(json_keys(props)) AS u(k)
    WHERE event_id < 1000
    """,
)
def udtf_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined table function surface (U3, PySpark 4 ``udtf``):
    flatten each event's JSON props object into (key, value) rows
    without a fixed schema — ``from_json`` needs the schema up front,
    a UDTF discovers it per row. Python UDTFs are row-at-a-time (the
    slow path, SURVEY.md §2.9); bounded here by the event_id filter,
    which Catalyst pushes below the UDTF into the scan."""
    import json as _json

    from pyspark.sql.functions import udtf

    @udtf(returnType="prop_key: string, prop_value: string")
    class ExplodeProps:
        def eval(self, props: str):
            if props:
                for k, v in _json.loads(props).items():
                    yield k, str(v) if not isinstance(v, str) else v

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.lateralJoin(
        ExplodeProps(F.col("props").outer())
    ).select("event_id", "prop_key", "prop_value")


@query(
    "asof_join_events",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             MAX(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT c.user_id, c.event_id, c.ts_s,
           p.purchase_id, p.ts_s AS purchase_ts_s
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts_s >= p.ts_s
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (extension operator, operators/asof.py): each click
    enriched with the same user's most recent purchase at-or-before
    it. One shuffle on user_id, zero row amplification — the oracle is
    DuckDB's native ASOF LEFT JOIN, making this an exact differential
    test of the operator's semantics including the no-prior-match NULL
    case and inclusive equal-timestamp matching. The purchase side is
    deduped per (user, second) with MAX(event_id) because as-of ties
    at identical timestamps are otherwise nondeterministic in any
    implementation."""
    from rdf_mapreduce_joins_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_s"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_s")
        .agg(F.max("event_id").alias("purchase_id"))
        .withColumn("purchase_ts_s", F.col("ts_s"))
    )
    return asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts_s", right_ts="ts_s"
    )


@query(
    "map_funcs_events",
    oracle="""
    WITH m AS (
      SELECT event_id, u.k AS mkey,
             json_extract_string(props, '$.' || u.k) AS mval
      FROM events, unnest(json_keys(props)) AS u(k)
      WHERE event_id < 2000
    )
    SELECT event_id,
           CAST(COUNT(*) AS INTEGER) AS n_keys,
           MIN(mkey) AS first_key,
           MAX(TRY_CAST(mval AS BIGINT)) AS max_numeric_val
    FROM m GROUP BY event_id
    """,
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface (§2.7 map family): props parsed into a
    real MapType via from_json('map<string,string>') — schemaless at
    parse time, unlike get_json_object's fixed paths — then
    map_keys/map_entries drive per-event aggregates. All JVM built-ins
    inside codegen."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = e.select(
        "event_id",
        F.from_json(F.col("props"), "map<string,string>").alias("pm"),
    )
    return m.select(
        "event_id",
        F.size(F.map_keys("pm")).alias("n_keys"),
        F.array_min(F.map_keys("pm")).alias("first_key"),
        F.array_max(
            F.transform(F.map_values("pm"), lambda v: v.cast("bigint"))
        ).alias("max_numeric_val"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT c_mktsegment AS seg,
           ROUND(MEDIAN(c_acctbal), 4) AS median_bal,
           ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
           COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (A-family): Spark's median /
    percentile aggregate == DuckDB's MEDIAN / quantile_cont on doubles
    (both linear-interpolation). The approximate twin at scale is
    approx_percentile (t-digest, mergeable) — same call shape."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.round(F.median("c_acctbal"), 4).alias("median_bal"),
        F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_string_collect",
    oracle="""
    SELECT c_nationkey AS nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_set -> sort_array ->
    array_join gives a DETERMINISTIC csv per group (collect order is
    partition-dependent; the sort is what makes the result stable and
    oracle-matchable)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT c_nationkey AS nationkey, c_mktsegment AS seg, COUNT(*) AS n,
           CAST(GROUPING(c_nationkey) + 2 * GROUPING(c_mktsegment) AS BIGINT) AS gid
    FROM customer
    GROUP BY GROUPING SETS ((c_nationkey), (c_mktsegment), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (A5 beyond rollup/cube): two independent
    one-column groupings plus the grand total in ONE scan (a single
    Expand node), with grouping_id disambiguating the set each output
    row came from."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupingSets(
            [["c_nationkey"], ["c_mktsegment"], []], "c_nationkey", "c_mktsegment"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.grouping("c_nationkey") + F.lit(2) * F.grouping("c_mktsegment")
            ).cast("bigint").alias("gid"),
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("seg"),
            "n",
            "gid",
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_s
    FROM customer
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter on the dimension side, date
    range splitting the two fact tables, 3-way join, grouped revenue,
    top-10. Every filter reaches its own scan before the joins; the
    limit plans TakeOrderedAndProject. Revenue in DECIMAL
    (order-independent), unique-key tiebreak on the sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q5_local_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the customer=supplier nation
    equality closing a cycle (the hardest reference join shape, J3, in
    a realistic query). The region filter reaches nation via two
    broadcast hops, pruning most of the probe side before the fact
    joins; year range prunes orders at the scan."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))
    )


@query(
    "window_rank_variants",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS seg,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-window family (W1 completion): ntile
    quartiles, percent_rank, cume_dist over one shared window — one
    shuffle on the partition key serves all three functions. The
    (c_acctbal, c_custkey) ordering carries a unique tiebreak so
    ranks are engine-stable."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "agg_stats_funcs",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_discount), 6) AS var_disc,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (A3 completion): sample
    stddev/variance, correlation, covariance per group — all partial-
    aggregatable built-ins (each carries O(1) state per group through
    the map-side combine: count/mean/M2 moments). Rounded on both
    engines: float merge order differs between Spark's partial
    aggregation tree and DuckDB's, which perturbs ~1e-12 relative —
    far below the rounded digits."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(val), 2) AS total
    FROM (
      SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY metric
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational reshape (melt/UNPIVOT — the inverse of the property-
    table pivot): wide measure columns to (metric, value) rows, then a
    per-metric aggregate. Spark's native ``unpivot`` generates an
    Expand node — one scan fans out to k rows per input row with no
    join and no shuffle before the aggregation's own exchange. Sums
    rounded on both engines (float merge order)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ids=[],
            values=["l_quantity", "l_discount", "l_tax"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("val"), 2).alias("total"),
        )
    )


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
             AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)
             AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan-heavy pricing summary — one
    pass over lineitem, 6 aggregates over a 6-group key. The shipdate
    filter reaches the parquet scan; sums run in DECIMAL so the merge
    order cannot perturb values; averages divide the exact decimal sum
    by the count (not float avg — order-dependent). The product sums
    (scale 6) are ROUNDed to 2 digits IN DECIMAL before the double
    cast: at sf1 the scale-6 integer numerator exceeds 2^53, where
    DuckDB's int/10^scale cast double-rounds while the JVM's
    BigDecimal cast rounds once — a 1-ulp split the sf1 sweep caught;
    rounding first keeps the cast numerator exactly representable. At 100 TB this is
    pure map-side partial aggregation: 6 groups means the final
    exchange carries ~6 rows per task."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * (1 - disc)), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(price * (1 - disc) * (1 + tax)), 2)
            .cast("double")
            .alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / n, 4).alias("avg_qty"),
            F.round(F.sum(disc).cast("double") / n, 4).alias("avg_disc"),
            n.cast("long").alias("count_order"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: the fixture lineitem has no
    commitdate/receiptdate, so 'late delivery' is l_shipdate >
    o_orderdate): priority histogram of orders in a quarter having at
    least one late lineitem. The EXISTS compiles to a LEFT SEMI join
    with a non-equi residual (equi on orderkey, theta on the dates) —
    the date filter prunes orders at the scan, and the semi join
    short-circuits per order, never materializing the multiplicity."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM supplier
    JOIN lineitem ON l_suppkey  = s_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year between two
    nations — the two-dimension-role join (nation joined TWICE, once
    per side of the trade) with a disjunctive cross-filter. Both
    nation sides broadcast; the disjunction is evaluated after the two
    dimension hops, pruning before the grouped aggregate. Year
    extraction stays JVM-side."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    a quarter. Returnflag and date filters reach their scans; the
    nation decode broadcasts; the limit plans TakeOrderedAndProject
    (per-partition top-20 merged on the driver — no global sort)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew handling under the oracle gate: the lineitem→supplier join
    runs through operators/skew.py::salted_join — the fact side's hot
    supplier keys spread over 8 salt sub-partitions, the dimension
    side exploded once per salt (correctness-neutral by construction,
    which is exactly what this oracle proves). This is the manual
    fallback for single-hot-key joins AQE's skew split can't break up
    (AQE splits partitions, not keys); the aggregation result is
    bit-identical to the plain join's."""
    from rdf_mapreduce_joins_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(
        li,
        s.withColumnRenamed("s_suppkey", "l_suppkey"),
        on=["l_suppkey"],
        salt_buckets=8,
        salt_from="l_quantity",
    )
    return (
        joined.join(F.broadcast(n), joined.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .transform(bounded_sort, "n_name")
    )


BLOOM_M = 1024  # filter bits
BLOOM_K = 3  # hash functions
BLOOM_WORD_BITS = 60  # bits packed per BIGINT word (sign bit never set)
BLOOM_DIM_NATION = 7  # the selective dim predicate


def _bloom_pos_sql(i: int, key: str) -> str:
    """DuckDB: bloom bit position i of an integer key column — the
    md5-60bit family seeded CMS-style by prefixing the hash index."""
    from rdf_mapreduce_joins_spark.operators.hashing import hex60_sql

    inner = "md5('" + str(i) + ":' || CAST(" + key + " AS VARCHAR))"
    return f"{hex60_sql(inner)} % {BLOOM_M}"


def _bloom_pos_col(i: int, key: str) -> F.Column:
    """Spark twin of :func:`_bloom_pos_sql`."""
    from rdf_mapreduce_joins_spark.operators.hashing import base_hash60

    return F.pmod(
        base_hash60(
            F.concat(F.lit(f"{i}:"), F.col(key).cast("string")), "md5"
        ),
        F.lit(BLOOM_M),
    )


@query(
    "join_bloom_prefilter",
    oracle=f"""
    WITH dim AS (
      SELECT DISTINCT s_suppkey FROM supplier
      WHERE s_nationkey = {BLOOM_DIM_NATION}
    ),
    pos AS (
      SELECT unnest([{_bloom_pos_sql(0, "s_suppkey")},
                     {_bloom_pos_sql(1, "s_suppkey")},
                     {_bloom_pos_sql(2, "s_suppkey")}]) AS p
      FROM dim
    ),
    words AS (
      SELECT p // {BLOOM_WORD_BITS} AS word_idx,
             bit_or(CAST(1 AS BIGINT) << (p % {BLOOM_WORD_BITS})) AS bits
      FROM pos GROUP BY p // {BLOOM_WORD_BITS}
    ),
    fact AS (
      SELECT l_suppkey,
             {_bloom_pos_sql(0, "l_suppkey")} AS p0,
             {_bloom_pos_sql(1, "l_suppkey")} AS p1,
             {_bloom_pos_sql(2, "l_suppkey")} AS p2
      FROM lineitem
    ),
    tested AS (
      SELECT f.l_suppkey,
             ((COALESCE(w0.bits, 0) >> (p0 % {BLOOM_WORD_BITS})) & 1) = 1
             AND ((COALESCE(w1.bits, 0) >> (p1 % {BLOOM_WORD_BITS})) & 1) = 1
             AND ((COALESCE(w2.bits, 0) >> (p2 % {BLOOM_WORD_BITS})) & 1) = 1
               AS pass,
             d.s_suppkey IS NOT NULL AS exact
      FROM fact f
      LEFT JOIN words w0 ON f.p0 // {BLOOM_WORD_BITS} = w0.word_idx
      LEFT JOIN words w1 ON f.p1 // {BLOOM_WORD_BITS} = w1.word_idx
      LEFT JOIN words w2 ON f.p2 // {BLOOM_WORD_BITS} = w2.word_idx
      LEFT JOIN dim d ON f.l_suppkey = d.s_suppkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass_bloom,
           CAST(SUM(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_match,
           CAST(SUM(CASE WHEN pass AND exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_positive,
           CAST(SUM(CASE WHEN pass AND NOT exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positive,
           ROUND(CASE WHEN COUNT(*) = SUM(CASE WHEN exact THEN 1 ELSE 0 END)
                      THEN 0.0
                      ELSE CAST(SUM(CASE WHEN pass AND NOT exact
                                         THEN 1 ELSE 0 END) AS DOUBLE)
                           / (COUNT(*) - SUM(CASE WHEN exact
                                                  THEN 1 ELSE 0 END))
                 END, 6) AS fp_rate
    FROM tested
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-filter pattern (JS family): a bloom filter built
    from a selective dimension (suppliers of one nation) pre-filters
    the fact table BEFORE any fact-side shuffle — at 100 TB this is
    the standard semi-join reduction (Spark's own InjectRuntimeFilter
    does the same internally for shuffle joins; this query makes the
    mechanism explicit, portable, and differential-testable). The
    filter is 3 md5-family bit positions packed into 60-bit BIGINT
    words (1024 bits -> 18 words), so membership tests are 3
    broadcast hash equi-joins on word index plus a
    shift-and-mask — no per-row set scans, no nested loop, and the
    bitset stays exact integer arithmetic that DuckDB reproduces bit
    for bit. The output is the filter's confusion matrix: the oracle
    hash-match therefore proves BOTH bloom laws on this corpus — zero
    false negatives (n_true_positive == n_exact_match) and the exact
    deterministic false-positive set."""
    s = load_table(spark, sf_dir, "supplier")
    dim = (
        s.filter(F.col("s_nationkey") == BLOOM_DIM_NATION)
        .select("s_suppkey")
        .distinct()
    )
    pos = dim.select(
        F.explode(
            F.array(*[_bloom_pos_col(i, "s_suppkey") for i in range(BLOOM_K)])
        ).alias("p")
    )
    words = (
        pos.select(
            F.expr(f"p div {BLOOM_WORD_BITS}").alias("word_idx"),
            F.expr(
                f"shiftleft(cast(1 as bigint), pmod(p, {BLOOM_WORD_BITS}))"
            ).alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("bits"))
        # build the (<= 18-row) bitset once: without the cut, each of
        # the three word-joins re-plans the dim scan + aggregation
        # under its own BroadcastExchange (3x the build cost — trivial
        # here, a full dim rescan per hash function at scale)
        .localCheckpoint()
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    fact = li.select(
        "l_suppkey",
        *[_bloom_pos_col(i, "l_suppkey").alias(f"p{i}") for i in range(BLOOM_K)],
    )
    tested = fact
    for i in range(BLOOM_K):
        w_i = words.select(
            F.col("word_idx").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        tested = tested.join(
            F.broadcast(w_i),
            F.expr(f"p{i} div {BLOOM_WORD_BITS}") == F.col(f"w{i}"),
            "left",
        )
    pass_col = F.expr(
        " AND ".join(
            f"(shiftright(coalesce(bits{i}, cast(0 as bigint)),"
            f" pmod(p{i}, {BLOOM_WORD_BITS})) & 1) = 1"
            for i in range(BLOOM_K)
        )
    )
    dmark = dim.select(F.col("s_suppkey").alias("d_key"))
    tested = tested.join(
        F.broadcast(dmark), tested["l_suppkey"] == dmark["d_key"], "left"
    ).select(
        pass_col.alias("pass"), F.col("d_key").isNotNull().alias("exact")
    )
    passes = F.sum(F.when(F.col("pass"), 1).otherwise(0))
    exacts = F.sum(F.when(F.col("exact"), 1).otherwise(0))
    fps = F.sum(F.when(F.col("pass") & ~F.col("exact"), 1).otherwise(0))
    tps = F.sum(F.when(F.col("pass") & F.col("exact"), 1).otherwise(0))
    n = F.count(F.lit(1))
    return tested.agg(
        n.cast("bigint").alias("n_fact"),
        passes.cast("bigint").alias("n_pass_bloom"),
        exacts.cast("bigint").alias("n_exact_match"),
        tps.cast("bigint").alias("n_true_positive"),
        fps.cast("bigint").alias("n_false_positive"),
        F.round(
            F.when(n == exacts, F.lit(0.0)).otherwise(
                fps.cast("double") / (n - exacts)
            ),
            6,
        ).alias("fp_rate"),
    )


@query("agg_approx_percentiles")  # rows-only: sketch-approximate by design
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's built-in KLL-style sketch
    (approx_percentile, accuracy 10000 ≈ 0.01% rank error) — the
    sketch sibling of the exact agg_percentiles: at 100 TB the exact
    form needs a full sort per group, the sketch is one pass with
    O(accuracy) state, partial-merged map-side. Declared rows-only
    (sketch output is implementation-defined); the test pins each
    approximate value within rank-error bounds of the exact
    percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
            ).alias("approx_p")
        )
        .select(
            "l_returnflag",
            F.col("approx_p")[0].alias("p50"),
            F.col("approx_p")[1].alias("p95"),
            F.col("approx_p")[2].alias("p99"),
        )
        .transform(bounded_sort, "l_returnflag")
    )


@query(
    "pivot_status_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT (the inverse reshape of
    unpivot_lineitem_metrics): order counts per nation spread across
    one column per status. Pivot values are passed explicitly so Spark
    skips the values-discovery pass and plans ONE shuffle (groupBy +
    pivot collapse into a single aggregation); the oracle is the
    equivalent CASE-conditional aggregation."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "n_name",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
        .transform(bounded_sort, "n_name")
    )


@query(
    "agg_mode_median",
    oracle="""
    WITH seg AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ), md AS (
      SELECT c_nationkey, c_mktsegment AS mode_segment
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY c_nationkey ORDER BY n DESC, c_mktsegment
        ) AS rn FROM seg
      ) WHERE rn = 1
    ), ranked AS (
      SELECT c_nationkey, c_acctbal,
             row_number() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
             ) AS rn,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n_customers
      FROM customer
    ), med AS (
      SELECT c_nationkey, c_acctbal AS median_lo_acctbal, n_customers
      FROM ranked WHERE rn = (n_customers + 1) // 2
    )
    SELECT med.c_nationkey, med.median_lo_acctbal, med.n_customers,
           md.mode_segment
    FROM med JOIN md USING (c_nationkey)
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode + median per group (A3's order-statistics siblings), both
    pinned to engine-neutral definitions. Mode is computed MANUALLY
    (count -> row_number over (n DESC, value ASC)) instead of the
    built-in ``mode()`` because tie-breaking there is engine-undefined.
    Median is the LOWER median — the element at rank ceil(n/2) under a
    total (value, key) order — because the interpolated midpoint of two
    2-decimal values lands exactly on the .005 boundary where Spark's
    HALF_UP and DuckDB's HALF_EVEN rounding disagree; rank selection
    returns a stored value, no float arithmetic at all. Both branches
    shuffle once on c_nationkey (window + agg share the partitioning);
    the 25-row group spine joins back as a broadcast at any scale. The
    approx KLL variant (agg_approx_percentiles) is the one-pass sketch
    path for 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    wm = Window.partitionBy("c_nationkey").orderBy(F.desc("n"), F.asc("c_mktsegment"))
    mode = (
        seg.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("mode_segment"))
    )
    wr = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_nationkey")
    med = (
        c.select(
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n_customers"),
        )
        .where(F.col("rn") == F.floor((F.col("n_customers") + 1) / 2))
        .select(
            "c_nationkey",
            F.col("c_acctbal").alias("median_lo_acctbal"),
            "n_customers",
        )
    )
    return med.join(mode, "c_nationkey")


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@query(
    "profile_documents_stats",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_s,
               CAST(MAX({c}) AS VARCHAR) AS max_s
        FROM documents
        """
        for c in _PROFILE_COLS
    ),
)
def profile_documents_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass (the `df.describe`/Deequ-style operator a
    pipeline runs before training ingestion): per column — row count,
    null count, exact distinct count, lexicographic/numeric min+max.
    ONE aggregation over one scan computes every column's statistics
    simultaneously (count_distinct expands internally rather than
    re-scanning per column); the wide 1-row result is then unpivoted
    driver-free with ``stack`` into the (column_name, metric...) shape.
    At 100 TB the same plan holds: one pass, partial aggregation
    map-side; swap count_distinct for approx_count_distinct when exact
    cardinality isn't required (agg_approx_distinct is that variant)."""
    d = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_null, n_distinct, min_s, max_s)"
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), sn AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the J-lattice corner left/semi/anti don't
    cover): per-nation customer vs supplier coverage, keeping nations
    present on either side with zero-filled counts. Aggregate-then-join
    — the join runs on two ~25-row group spines, not the fact tables,
    so either side broadcasts at any scale; full-outer forces the plan
    to keep both unmatched sides (Catalyst cannot convert it to a
    one-sided join)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cn.join(sn, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "setops_bag_semantics",
    oracle="""
    WITH a AS (SELECT o_orderpriority AS pri FROM orders
               WHERE o_orderstatus = 'O'),
         b AS (SELECT o_orderpriority AS pri FROM orders
               WHERE o_orderstatus = 'F')
    SELECT 'except_all' AS which, pri, COUNT(*) AS n FROM (
      SELECT pri FROM a EXCEPT ALL SELECT pri FROM b
    ) GROUP BY pri
    UNION ALL
    SELECT 'intersect_all' AS which, pri, COUNT(*) AS n FROM (
      SELECT pri FROM a INTERSECT ALL SELECT pri FROM b
    ) GROUP BY pri
    """,
)
def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL (O5's bag-semantics siblings):
    multiplicity-aware set ops over order priorities split by status —
    EXCEPT ALL keeps max(count_a - count_b, 0) copies, INTERSECT ALL
    min(count_a, count_b). Spark's exceptAll/intersectAll compile to a
    count-tagged aggregate + generate (no row-by-row anti matching);
    counts re-aggregated so the oracle compares multiplicities
    exactly."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("pri")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("pri")
    )
    ex = (
        a.exceptAll(b)
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("which"), "pri", "n")
    )
    ix = (
        a.intersectAll(b)
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("which"), "pri", "n")
    )
    return ex.unionByName(ix)


@query(
    "orders_monthly_trend_yoy",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS ym,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY ym
    )
    SELECT ym, n_orders, revenue_cents,
           n_orders - LAG(n_orders, 12) OVER (ORDER BY ym) AS yoy_orders_delta
    FROM m
    """,
)
def orders_monthly_trend_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order trend with year-over-year delta (the BI
    time-series staple): aggregate to a yyyymm series, then lag-12
    over the SERIES — the window runs on ~80 aggregated rows, not the
    fact table, so the unpartitioned ORDER BY is a non-issue (a
    single-partition sort of the group spine; at 100 TB the spine is
    still tiny). Money is summed as exact integer CENTS
    (round(price*100) per row — 2-decimal doubles convert losslessly)
    so neither the sum nor the YoY subtraction touches float
    arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )
    w = Window.orderBy("ym")
    return m.select(
        "ym",
        "n_orders",
        "revenue_cents",
        (F.col("n_orders") - F.lag("n_orders", 12).over(w)).alias(
            "yoy_orders_delta"
        ),
    )


ABC_REVENUE_BUCKET_CENTS = 100_000  # $1k-wide prefix-sum buckets


@query(
    "lineitem_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, revenue_cents,
             SUM(revenue_cents) OVER (
               ORDER BY revenue_cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_cents,
             SUM(revenue_cents) OVER () AS total_cents
      FROM rev
    )
    SELECT l_partkey, revenue_cents,
           CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def lineitem_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification (inventory analytics): parts ranked
    by revenue, classed A/B/C at the 80%/95% cumulative-share cuts.
    Revenue is exact integer cents and the share test is a pure
    integer cross-multiplication (cum*100 <= total*80) — no division,
    no float, no rounding-mode exposure at the class boundary. The
    running sum orders by (revenue DESC, partkey) — a total order, so
    equal-revenue parts class deterministically.

    Scale shape (VERDICT r6 #2, refined after the r7 bench): the
    cumulative sum is size-gated on a one-row probe. Under
    RANK_GLOBAL_WINDOW_MAX_ROWS parts, a single-task global running
    sum IS the fastest plan (and the threshold itself bounds its
    spine); above it, the two-level bucketed prefix pattern
    (operators/ranking.py) runs instead — per-part revenue is
    SF-invariant in TPC-H (~30 lineitems/part), so $1k-wide cents
    buckets give a value-domain-bounded summary spine no matter how
    many parts exist, and only that summary crosses a single task.
    The probe aggregate also yields total_cents, folded in as a
    literal (no crossJoin). Equality chain: the oracle hash-proves
    the window route on fixtures; tests/test_properties.py pins
    bucketed_running_sum bit-identical to the global running-sum
    window for arbitrary inputs."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents")
    )
    # Route probe: |parts| <= |lineitems| always, so lineitem's scan
    # sizeInBytes (zero jobs) is a safe upper bound; the small route
    # skips the checkpoint and keeps the total as a same-sort window
    # (one pass), the big route materializes the aggregate for the
    # prefix passes and folds its total in as a literal.
    if plan_size_bytes(li) <= RANK_GLOBAL_WINDOW_MAX_INPUT_BYTES:
        # Both window expressions share the (empty) partition AND the
        # order spec, differing only in frame, so Catalyst hosts them
        # in ONE Window node — a single sort pass.
        w = Window.orderBy(F.desc("revenue_cents"), F.asc("l_partkey"))
        w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        w_tot = w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = rev.select(
            "l_partkey",
            "revenue_cents",
            F.sum("revenue_cents").over(w_cum).alias("cum_cents"),
            F.sum("revenue_cents").over(w_tot).alias("total_cents"),
        )
        total = F.col("total_cents")
    else:
        rev = rev.localCheckpoint(eager=False)
        total_cents = rev.groupBy().agg(
            F.sum("revenue_cents").cast("bigint")
        ).first()[0]
        ranked = bucketed_running_sum(
            rev,
            F.expr(f"-(revenue_cents DIV {ABC_REVENUE_BUCKET_CENTS})"),
            [F.desc("revenue_cents"), F.asc("l_partkey")],
            "revenue_cents",
            "cum_cents",
        )
        total = F.lit(total_cents).cast("bigint")
    return ranked.select(
        "l_partkey",
        "revenue_cents",
        F.when(F.col("cum_cents") * 100 <= total * 80, "A")
        .when(F.col("cum_cents") * 100 <= total * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "supplier_cosupply_graph",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), deg AS (
      SELECT l_partkey, COUNT(*) AS d FROM ps GROUP BY l_partkey
    ), tot AS (
      SELECT SUM(d) AS td, COUNT(*) AS np FROM deg
    ), nonhub AS (
      SELECT l_partkey FROM deg, tot WHERE d * np * 20 <= 27 * td
    ), psc AS (
      SELECT ps.l_partkey, ps.l_suppkey FROM ps
      JOIN nonhub ON ps.l_partkey = nonhub.l_partkey
    ), pairs AS (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
             COUNT(*) AS n_shared_parts
      FROM psc a JOIN psc b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
      GROUP BY s1, s2
    )
    SELECT s1, s2, n_shared_parts
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY s1 ORDER BY n_shared_parts DESC, s2
      ) AS rn FROM pairs
    ) WHERE rn <= 5
    """,
)
def supplier_cosupply_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection (the co-occurrence graph construction
    behind co-purchase / co-authorship analytics): each supplier's
    top-5 strongest partners by number of co-shipped parts.

    Scale shape (VERDICT r2 #3: the hub-part cap, mirrored in the
    oracle):

    1. Distinct (part, supplier) incidence first — collapsing
       lineitem multiplicity BEFORE the self-join bounds pair
       fan-out by the part's supplier degree, not its order count.
    2. Hub-part guard as a LEFT ANTI join: a part whose supplier
       degree exceeds 1.35x the mean degree (integer-exact test
       ``d * n_parts * 20 > 27 * total_deg`` — no float boundary
       drift vs the oracle) is excluded from pair generation
       entirely. Like hub shingles in ``dedup_ngram_jaccard_capped``,
       a part carried by an outsized share of all suppliers
       contributes no discriminative co-supply signal while
       dominating the quadratic cost: the join fan-out is
       sum_p(deg(p)^2), so one hub part with deg ~ |S| costs |S|^2
       alone. The cap is corpus-relative (recomputed from the degree
       distribution each run, no per-SF constant) and MIRRORED IN
       THE DUCKDB ORACLE, so the capped semantics are
       differential-tested, not just asserted. The hub frame is NOT
       force-broadcast: its size is distribution-dependent, and the
       anti-join reuses the partkey hash exchange the self-join
       needs anyway.
    3. s1<s2 emits each pair once; one aggregation shuffle on
       (s1, s2); the top-5-per-node window bounds output at |S|*5
       and Spark plans it as a partial WindowGroupLimit below the
       final sort exchange. The totals frame is one row, broadcast.

    Measured at sf0.1 (local[32], min-of-3): 2.74 s, unchanged from
    the uncapped plan — this fixture's degree distribution is
    near-uniform (max 52 vs mean 30 over 1000 suppliers), so the cap
    trims only ~10% of sum(deg^2); profiling shows the floor is the
    quadratic projection itself (distinct 0.65 s + join 0.9 s +
    18M-row pair aggregation 1.2 s), which is the semantics, not a
    plan defect. On skewed real data the cap is the term that keeps
    the job finite. An array-pair-generation variant (collect_set +
    transform/slice, one fewer exchange) was measured SLOWER here
    (4.7 s — nested-array allocation dominates) and rejected."""
    li = load_table(spark, sf_dir, "lineitem")
    # The incidence dedup exchange is KEYED ON THE PART (round 11, the
    # basket_brand_affinity lesson): hash(l_partkey) satisfies the
    # (part, supplier) dedup's ClusteredDistribution AND the
    # distribution of every downstream consumer — the degree
    # aggregation, the hub anti-join, and BOTH self-join sides — so
    # the whole quadratic projection runs off ONE reused exchange of
    # the incidence. The old `.distinct()` partitioned on the pair,
    # which nothing downstream could reuse: deg re-exchanged on
    # partkey, and the self-join re-exchanged both sides.
    ps = (
        li.select("l_partkey", "l_suppkey")
        .repartition("l_partkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    deg = ps.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("d"))
    tot = deg.agg(F.sum("d").alias("td"), F.count(F.lit(1)).alias("np"))
    hub = (
        deg.join(F.broadcast(tot))
        .filter(F.col("d") * F.col("np") * 20 > F.lit(27) * F.col("td"))
        .select("l_partkey")
    )
    psc = ps.join(hub, "l_partkey", "left_anti")
    a = psc.alias("a")
    b = psc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_parts"))
    )
    w = Window.partitionBy("s1").orderBy(F.desc("n_shared_parts"), F.asc("s2"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )
