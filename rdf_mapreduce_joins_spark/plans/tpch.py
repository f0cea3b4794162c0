"""TPC-H query suite completion (SURVEY.md §2.10): the 16 queries not
already covered in plans/relational.py (q1/q3/q4/q5/q7/q10 live there).

The reference implements LUBM/SP2Bench join shapes; TPC-H exercises the
same relational algebra (multi-way joins, semi/anti, correlated and
scalar subqueries, disjunctive predicates, conditional aggregation)
over the star schema — so a full 22-query TPC-H surface demonstrates
every shape a reference user composes, oracle-checked end to end.

Fixture adaptations (the driver's TPC-H-ish tables are reduced):
no ``partsupp`` table (supply facts are derived from distinct
``(l_partkey, l_suppkey)`` lineitem pairs), no ``l_shipmode`` /
``l_commitdate`` / ``l_receiptdate`` (lateness = ``l_shipdate`` vs
``o_orderdate``), no ``c_phone`` (country codes = ``c_nationkey``),
no ``p_container`` / comments (predicates moved to columns that
exist). Each docstring states its adaptation; the join/subquery
SHAPE of the official query is preserved exactly.

Determinism rules (shared with relational.py): money math in
DECIMAL(18,2) with a final cast to double; ratios rounded to 6 digits
on both engines; thresholds on exact decimal cross-products
(``5*qty*cnt < sum`` instead of ``qty < 0.2*avg``) so boundary
membership can't differ between Spark's and DuckDB's float summation
order; every ORDER BY carries a unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import bounded_sort, load_table

DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(DEC)


def _revenue():
    """price * (1 - discount) in exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s.l_partkey, s.l_suppkey, s.cost,
               sp.s_acctbal, sp.s_name, n.n_name
        FROM supply s
        JOIN supplier sp ON sp.s_suppkey = s.l_suppkey
        JOIN nation n ON sp.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS mincost FROM eu
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(cost AS DOUBLE) AS supply_cost
    FROM ranked JOIN part ON p_partkey = l_partkey
    WHERE cost = mincost AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier in a region
    (correlated MIN subquery), adapted — no partsupp table, so the
    supply relation is MIN(l_extendedprice) per distinct
    (l_partkey, l_suppkey) lineitem pair; cost stays exact decimal so
    the min-equality filter is bit-stable.

    Scale: the correlated min is a window over the partkey partition
    (one shuffle, no join-back); supplier/nation/region broadcast.
    The part-side predicate prunes before the final join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    ).select("p_partkey")
    # The selective part predicate pre-filters the FACT stream (round
    # 11, guide §3.2): the per-part window min is computed
    # independently per partkey, so dropping non-qualifying parts
    # BEFORE the supply aggregation — instead of joining p after the
    # window, as before — cannot change any surviving part's min-cost
    # row, and the aggregation/window/exchanges all run on the ~1/25
    # qualifying slice instead of the full pair stream.
    supply = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("cost"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    eu = (
        supply.join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("mincost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("mincost"))
        .withColumn("p_partkey", F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the canonical pushdown
    benchmark. All three predicates reach the parquet scan
    (PushedFilters on shipdate/discount/quantity), the sum is a single
    map-side partial + 1-row merge; zero joins, zero wide shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           ROUND(
             CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN part     ON l_partkey  = p_partkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY year(o_orderdate)
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — an 8-way join with the nation
    dimension used TWICE under different roles (customer's vs
    supplier's), then a conditional-aggregate ratio per year. The two
    nation branches broadcast independently; the part-type filter
    prunes the probe side before the fact join. Exact-decimal volume,
    double division, round(6) on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    ).select("r_regionkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    vol = _revenue()
    brazil_vol = F.when(F.col("sn_name") == "NATION_5", vol).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(brazil_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
        .transform(bounded_sort, "o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(0.05 AS DECIMAL(3,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by nation and year, adapted — no
    ps_supplycost, so cost is modeled as 5% of p_retailprice * qty
    (exact decimal). Shape preserved: LIKE-filtered part dimension,
    5-way join, two-level grouping. The part filter broadcasts; the
    profit expression stays in decimal until the final cast so the
    grouped sums hash identically."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _revenue() - (
        _dec("p_retailprice") * _dec("l_quantity") * F.lit(0.05).cast("decimal(3,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .transform(bounded_sort, "nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH german AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM german, (SELECT SUM(value) AS total FROM german) t
    WHERE CAST(value AS DOUBLE) > CAST(total AS DOUBLE) * 0.001
    ORDER BY value DESC, l_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts representing a significant share of one
    nation's stock value, adapted — value is lineitem revenue instead
    of ps_supplycost*ps_availqty (no partsupp). Shape preserved: a
    grouped aggregate compared against a SCALAR subquery over the same
    relation (HAVING value > total * fraction).

    Scale: the per-part aggregate computes once and feeds both the
    total (1-row re-aggregate, broadcast back) and the filter — a
    self-referencing scalar subquery with no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    ).select("n_nationkey")
    german = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("value"))
    )
    total = german.agg(F.sum("value").alias("total"))
    return (
        german.crossJoin(F.broadcast(total))
        .filter(
            F.col("value").cast("double") > F.col("total").cast("double") * 0.001
        )
        .select("l_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60
                THEN 'ON-TIME' ELSE 'LATE' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY ship_class
    """,
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: shipping-priority split, adapted — no l_shipmode /
    commit/receipt dates, so the two group buckets are shipping-delay
    classes (<=60 days vs late, shipdate minus orderdate). Shape
    preserved: one fact join + dual conditional counts per bucket.
    Both engines compute whole-day diffs on midnight-aligned
    timestamps, so bucket membership is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_class",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 60,
                "ON-TIME",
            ).otherwise("LATE"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .transform(bounded_sort, "ship_class")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join
    with an extra join-side predicate (priority filter replaces the
    missing o_comment NOT LIKE), count of the nullable side preserving
    zero-order customers, then a second aggregation over the counts.
    The double aggregation is two shuffles by design (custkey then
    c_count); the second input is one row per customer — tiny."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one month — conditional
    numerator over a broadcast part join (fixture p_type is a single
    word, so the predicate is equality instead of LIKE 'PROMO%').
    Month filter prunes the lineitem scan; single-row ratio output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — the CREATE VIEW +
    scalar MAX subquery query. The revenue aggregate computes once; the
    1-row max re-aggregate broadcasts back onto it (same
    self-referencing scalar-subquery plan as q11). Revenue stays exact
    decimal so the max-equality keeps every tied supplier, identically
    in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .transform(bounded_sort, "s_suppkey")
    )


@query(
    "tpch_q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier counts per part attribute triple, adapted —
    partsupp is derived as DISTINCT (l_partkey, l_suppkey) and the
    complaint-comment exclusion becomes s_acctbal < 0 (no s_comment).
    Shape preserved: NOT IN subquery (anti join — valid because
    s_suppkey is non-null), negated + IN-list part predicates, COUNT
    DISTINCT per 3-column group. The anti join build side is tiny and
    broadcasts; part is a broadcast dimension."""
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    # Both broadcast filters run BEFORE the pair distinct (round 11,
    # guide §3.2): p_partkey is unique and the anti join only removes
    # rows, so distinct-then-filter == filter-then-distinct — and the
    # distinct's exchange now carries only the qualifying ~1/6 slice.
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_quantity",
    oracle="""
    WITH brand AS (
        SELECT l_partkey, l_quantity, l_extendedprice,
               SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   OVER (PARTITION BY l_partkey) AS sum_qty,
               COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM brand
    WHERE CAST(l_quantity AS DECIMAL(18,2)) * cnt * 5 < sum_qty
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — the correlated scalar
    AVG subquery (l_quantity < 0.2 * avg per part), adapted to p_size
    for the missing p_container. The avg comparison is restated as the
    exact cross-product ``5 * qty * cnt < sum_qty`` in decimal so no
    float-division boundary can differ between engines.

    Scale: the correlated avg is a window over partkey on the
    brand-pruned join output (broadcast part filter first — the window
    runs on ~brand/size-selectivity of lineitem, not the full table)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    return (
        joined.withColumn("sum_qty", F.sum(_dec("l_quantity")).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(_dec("l_quantity") * F.col("cnt") * 5 < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_s,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers — IN over a grouped-HAVING
    subquery on the same fact table (threshold lowered to 250 for the
    fixture's ~4-line orders). The IN becomes a semi join of orders
    against the qualifying keys; the qty threshold compares exact
    decimals. TakeOrderedAndProject caps the output at 100."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_orderkey"), "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-attribute join predicate — three
    OR'd (brand, size, quantity) bands spanning both join sides
    (containers/shipmode absent; size bands substitute). Catalyst
    keeps the equi-join on partkey and evaluates the disjunction as a
    post-join filter, while the derivable per-side bounds (brand IN,
    qty <= 30) are pushed to the scans."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q20_part_promotion",
    oracle="""
    WITH forest AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    shipped AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty,
               SUM(SUM(CAST(l_quantity AS DECIMAL(18,2))))
                   OVER (PARTITION BY l_partkey) AS part_qty
        FROM lineitem JOIN forest ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND s_suppkey IN (
          SELECT l_suppkey FROM shipped WHERE supp_qty * 2 > part_qty
      )
    ORDER BY s_suppkey
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding a dominant share of a part family —
    nested IN subqueries (partkeys from a LIKE filter, then suppliers
    whose yearly shipped qty exceeds half the part's total), adapted:
    no ps_availqty, so the 0.5 * availqty threshold becomes half the
    part's total shipped quantity (a window over the grouped sums —
    still a correlated aggregate). The threshold compares exact
    decimals (``supp_qty * 2 > part_qty``); the supplier filter is a
    final broadcast semi join."""
    forest = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    w = Window.partitionBy("l_partkey")
    # One exchange keyed on l_partkey serves BOTH the per-(supplier,
    # part) aggregation (hash(pk) satisfies its ClusteredDistribution)
    # and the correlated-total window (round 11, the kmv/cosupply
    # treatment) — the old shape exchanged on the pair, then again on
    # l_partkey for the window.
    qualifying = (
        li.join(F.broadcast(forest), li.l_partkey == forest.p_partkey)
        .repartition("l_partkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("supp_qty"))
        .withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    ).select("n_nationkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey  = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_5'
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone delayed multi-supplier orders —
    the EXISTS + NOT EXISTS pair over the same fact table, adapted:
    lateness is shipdate > orderdate + 60 days (no receipt/commit
    dates). EXISTS lowers to a left-semi self-join on orderkey with a
    supplier inequality, NOT EXISTS to a left-anti on the late subset —
    both co-shuffled on orderkey, so the three lineitem passes align on
    one exchange layout."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    ).select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    ).select("n_nationkey")
    l1 = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        l1.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH pos AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
               COUNT(*) AS c
        FROM customer
        WHERE c_acctbal > 0
          AND c_nationkey IN (10, 11, 12, 13, 14, 15, 16)
    )
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE c_nationkey IN (10, 11, 12, 13, 14, 15, 16)
      AND CAST(c_acctbal AS DECIMAL(18,2)) * pos.c > pos.s
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-07-01'
      )
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy customers gone dormant — scalar AVG subquery
    + NOT EXISTS, adapted: country code is c_nationkey (no c_phone),
    and "never ordered" becomes "no order in the trailing year"
    (every fixture customer has some order; the official query's
    7-year dormancy intent maps to the date-bounded anti join). The
    avg threshold is restated as the exact decimal cross-product
    ``acctbal * count > sum`` so the boundary can't drift with float
    summation order; NOT EXISTS lowers to a left-anti join against
    the date-filtered orders, and the 1-row (sum, count) aggregate
    broadcasts."""
    codes = [10, 11, 12, 13, 14, 15, 16]
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(codes)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("c")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    ).select("o_custkey")
    return bounded_sort(
        c.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("c") > F.col("s"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        ),
        "cntrycode",
    )
