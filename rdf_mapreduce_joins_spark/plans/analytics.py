"""Warehouse-analytics completion queries (SURVEY.md §2.10): SCD2
interval building, time-grid resampling with linear interpolation,
null-safe joins, a scalable Pareto skyline, Z-order layout clustering,
and robust (median/MAD) outlier detection.

Each closes a named gap a production user hits: history tables (SCD2),
gap-filled time series for charting/features (resample), dimension
keys with NULL semantics (null-safe join), multi-objective frontier
queries (skyline), multi-dimensional file clustering (Z-order), and
outlier screens that survive heavy tails (median/MAD instead of
mean/stddev). All are pure DataFrame plans with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators.layout import zorder_sql, zorder_value
from rdf_mapreduce_joins_spark.operators.ranking import (
    RANK_GLOBAL_WINDOW_MAX_INPUT_BYTES,
    bucketed_global_rank,
    ntile_from_rank,
    plan_size_bytes,
)
from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import bounded_sort, load_table

SCD2_OPEN_END = "2099-12-31"


@query(
    "orders_scd2_intervals",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(COALESCE(
             LEAD(o_orderdate) OVER w, TIMESTAMP '{SCD2_OPEN_END}'
           ) AS DATE) AS valid_to,
           CAST(date_diff('day',
             CAST(o_orderdate AS DATE),
             CAST(COALESCE(LEAD(o_orderdate) OVER w,
                           TIMESTAMP '{SCD2_OPEN_END}') AS DATE)
           ) AS BIGINT) AS days_valid
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def orders_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension interval builder: turn each
    customer's order history into [valid_from, valid_to) rows where a
    record is superseded by the customer's NEXT order (open intervals
    get the 2099-12-31 sentinel). The standard CDC-to-history
    transform — one lead() window per natural key, no self-join (the
    naive formulation joins the table to itself on "next date", which
    is quadratic under date ties). One shuffle on o_custkey; interval
    rows stream out without materializing history state anywhere."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_from = F.to_date("o_orderdate")
    valid_to = F.to_date(
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit(SCD2_OPEN_END).cast("timestamp"),
        )
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        valid_from.alias("valid_from"),
        valid_to.alias("valid_to"),
        F.datediff(valid_to, valid_from).cast("bigint").alias("days_valid"),
    )


@query(
    "events_resample_interp",
    oracle="""
    WITH obs AS (
      SELECT user_id, CAST(ts AS DATE) AS day, MAX(value) AS v
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    j AS (
      SELECT grid.user_id, grid.day, obs.v,
             last_value(obs.v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN obs.v IS NOT NULL THEN grid.day END
                        IGNORE NULLS) OVER wp AS pd,
             first_value(obs.v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN obs.v IS NOT NULL THEN grid.day END
                         IGNORE NULLS) OVER wn AS nd
      FROM grid LEFT JOIN obs USING (user_id, day)
      WINDOW
        wp AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           CAST(FLOOR(CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) * (date_diff('day', pd, day) * 1.0
                                        / date_diff('day', pd, nd))
                 END * 10000 + 0.5) AS BIGINT) AS value_e4
    FROM j
    """,
)
def events_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resampling with linear interpolation (the gap-filling
    step before charting or windowed feature extraction): collapse
    purchase events to one observation per user-day, explode each
    user's [first, last] day span into a dense daily grid, and fill
    missing days by interpolating between the surrounding
    observations. The neighbor lookup is two IGNORE-NULLS window scans
    (running last / reversed first) over the SAME (user_id, day)
    sort — no as-of join, no per-gap self-join — so the whole query is
    one shuffle on user_id and the grid explode is generated, never
    materialized on the driver. Grid size is span-bounded (days), not
    event-bounded, so the plan survives arbitrarily hot users."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    obs = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.max("value").alias("v"))
    span = obs.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    j = grid.join(obs, on=["user_id", "day"], how="left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    j = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
    )
    frac = F.datediff(F.col("day"), F.col("pd")) / F.datediff(
        F.col("nd"), F.col("pd")
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    )
    # floor(x*1e4 + 0.5) instead of round(): Spark rounds the DECIMAL
    # rendering HALF_UP while DuckDB rounds the raw double, so exact
    # .5-boundary values (observed: 5.21625) diverge at 4 dp. The
    # floor formulation is the same IEEE ops on both engines —
    # bit-identical by construction — and ships integers, which also
    # sidesteps float rendering in the driver hash.
    value_e4 = F.floor(interp * 10000 + 0.5).cast("bigint")
    return j.select("user_id", "day", value_e4.alias("value_e4"))


@query(
    "join_null_safe",
    oracle="""
    SELECT dim.label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                 / 100.0, 2) AS total
    FROM (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                      ELSE o_orderstatus END AS k, o_totalprice
          FROM orders) o
    JOIN (VALUES ('O', 'open'), ('F', 'finished'), (NULL, 'in-progress'))
         dim(k, label)
      ON o.k IS NOT DISTINCT FROM dim.k
    GROUP BY dim.label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (SQL IS NOT DISTINCT FROM, Spark <=>): a
    fact side whose dimension key is legitimately NULL ("no status
    yet") still joins its NULL-keyed dimension row instead of being
    silently dropped — the classic late-arriving-dimension pattern.
    eqNullSafe is a first-class hash-join key in Spark (NULLs hash to
    one bucket), so this plans a BroadcastHashJoin against the 3-row
    dimension, NOT a nested loop; at 100 TB the fact side streams
    exactly as in any other broadcast join. NULL-key skew (every NULL
    in one hash bucket) is bounded here because the build side is the
    tiny dimension — the fact side never shuffles on the key."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("k"),
        "o_totalprice",
    )
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "finished"), (None, "in-progress")],
        "k string, label string",
    )
    # Money sums accumulate in cents-BIGINTs (exact integers), never
    # raw double SUM: at sf10 the ~5M-addend double sum reaches
    # ~1.24e12 where the two engines' summation orders split the
    # 2-digit rounding by 0.01 (the tpch_q1 r8 lesson, re-learned on
    # this query's first sf10 certification).
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    return (
        o.join(F.broadcast(dim), o["k"].eqNullSafe(dim["k"]))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum(cents) / 100.0, 2).alias("total"),
        )
    )


PARETO_PRICE_BUCKET = 200.0


@query(
    "parts_pareto_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def parts_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (minimize price, maximize size): parts no other
    part beats on one dimension without losing the other — the
    multi-objective "best offers" frontier. The textbook formulation
    is a quadratic NOT-EXISTS self-join (the oracle); this plan is the
    scalable three-level prefix-max instead: (1) collapse to one row
    per (bucket, price) with the max size — a keyed aggregation;
    (2) a window PARTITIONED BY price-bucket computes the
    strictly-cheaper running max within each bucket; (3) the
    per-bucket maxima (#buckets rows, bounded by construction) get a
    global running max, broadcast back. A row is dominated iff a
    strictly cheaper price-group reaches its size (either level) or
    its own price-group strictly exceeds it. No self-join, no global
    single-partition window over the data — the only unpartitioned
    window runs over the bucket summary frame."""
    p = load_table(spark, sf_dir, "part")
    bucket = F.floor(F.col("p_retailprice") / F.lit(PARETO_PRICE_BUCKET))
    g = (
        p.select(bucket.alias("bkt"), "p_retailprice", "p_size")
        .groupBy("bkt", "p_retailprice")
        .agg(F.max("p_size").alias("gmax"))
    )
    win_bucket = (
        Window.partitionBy("bkt")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("cheaper_in_bkt", F.max("gmax").over(win_bucket))
    bm = g.groupBy("bkt").agg(F.max("gmax").alias("bmax"))
    win_global = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    bm = bm.withColumn("prior_bkt_max", F.max("bmax").over(win_global))
    j = (
        p.select("p_partkey", "p_retailprice", "p_size", bucket.alias("bkt"))
        .join(g, on=["bkt", "p_retailprice"])
        .join(F.broadcast(bm.select("bkt", "prior_bkt_max")), on="bkt")
    )
    cheaper_max = F.greatest(
        F.coalesce(F.col("cheaper_in_bkt"), F.lit(-1)),
        F.coalesce(F.col("prior_bkt_max"), F.lit(-1)),
    )
    dominated = (cheaper_max >= F.col("p_size")) | (
        F.col("gmax") > F.col("p_size")
    )
    return j.filter(~dominated).select("p_partkey", "p_retailprice", "p_size")


ZORDER_BITS = 8
ZORDER_TOPK = 20


@query(
    "parts_zorder_cluster",
    oracle=f"""
    WITH d AS (
      SELECT p_partkey,
             CAST(p_size AS BIGINT) AS zx,
             CAST(LEAST(FLOOR(p_retailprice / 10), 255) AS BIGINT) AS zy
      FROM part
    )
    SELECT p_partkey, zx, zy,
           {zorder_sql(["zx", "zy"], bits=ZORDER_BITS)} AS z
    FROM d
    ORDER BY z DESC, p_partkey
    LIMIT {ZORDER_TOPK}
    """,
)
def parts_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (size, price-decile) —
    the multi-dimensional file-layout primitive
    (operators/layout.py): sort-before-write on this value gives every
    interleaved dimension footer-stat locality, so BOTH `p_size`
    range predicates AND price predicates prune files, not just the
    leading sort column. Declared as a top-k probe over the curve so
    the driver hash pins the exact bit-interleave; the value itself is
    pure shift/mask/or arithmetic inside whole-stage codegen (no UDF,
    no shuffle beyond the TakeOrdered)."""
    p = load_table(spark, sf_dir, "part")
    d = p.select(
        "p_partkey",
        F.col("p_size").cast("bigint").alias("zx"),
        F.least(F.floor(F.col("p_retailprice") / 10), F.lit(255))
        .cast("bigint")
        .alias("zy"),
    )
    d = d.withColumn(
        "z", zorder_value([F.col("zx"), F.col("zy")], bits=ZORDER_BITS)
    )
    return d.orderBy(F.col("z").desc(), "p_partkey").limit(ZORDER_TOPK)


ROBUST_Z_CUTOFF = 3.0
MAD_SCALE = 1.4826


@query(
    "events_robust_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    j AS (
      SELECT e.event_type, e.value, med.med
      FROM events e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, ANY_VALUE(med) AS med,
             quantile_cont(abs(value - med), 0.5) AS mad
      FROM j GROUP BY event_type
    )
    SELECT j.event_type,
           ROUND(ANY_VALUE(m.med), 6) AS med,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN abs(j.value - m.med)
                              > {ROBUST_Z_CUTOFF} * {MAD_SCALE} * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM j JOIN mad m USING (event_type)
    GROUP BY j.event_type
    """,
)
def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event type: median + MAD (median
    absolute deviation, scaled by 1.4826 to be sigma-consistent under
    normality) instead of mean + stddev, so a single extreme value
    cannot inflate its own threshold — the screen heavy-tailed metric
    streams actually need. Two grouped exact-percentile aggregations
    with the per-group medians riding along as broadcast joins
    (group count is event-type cardinality — tiny); the data shuffles
    on event_type twice, never self-joins. Exact `percentile` (not
    approx) keeps the oracle hash-exact; at corpus scale swap in
    `approx_percentile` with the same plan shape."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    j = e.join(F.broadcast(med), on="event_type")
    mad = j.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
    )
    j2 = j.drop("med").join(F.broadcast(mad), on="event_type")
    is_out = F.abs(F.col("value") - F.col("med")) > (
        F.lit(ROBUST_Z_CUTOFF) * F.lit(MAD_SCALE) * F.col("mad")
    )
    return j2.groupBy("event_type").agg(
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
    )


@query(
    "events_variant_pipeline",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           ROUND(AVG(value), 4) AS avg_v
    FROM events
    GROUP BY event_type
    """,
)
def events_variant_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT round trip (Spark 4's open-schema JSON
    type, the S4 modern path): assemble a nested JSON document from
    typed columns, parse_json it into a VARIANT, then pull typed
    paths back out with variant_get and aggregate. Proves the whole
    encode→VARIANT→typed-extract loop is lossless for ints and
    doubles — the ingestion shape for logs/telemetry whose schema
    drifts too fast to declare. VARIANT parses once into a binary
    encoding (vs per-path get_json_object re-parsing) and
    variant_get stays JVM-side; the oracle checks the same values
    straight from the base columns, which is exactly the lossless
    claim under test."""
    e = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.struct(F.col("value").alias("v")).alias("m"),
            F.from_json("props", "k BIGINT").getField("k").alias("k"),
        )
    )
    v = F.parse_json(doc)
    ex = e.select(
        F.variant_get(v, "$.t", "string").alias("event_type"),
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.m.v", "double").alias("val"),
    )
    return ex.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.round(F.avg("val"), 4).alias("avg_v"),
    )


@query(
    "sql_recursive_closure_depth",
    oracle="""
    WITH RECURSIVE anc(node, anc, d) AS (
      SELECT s_suppkey, s_suppkey // 2, 1 FROM supplier WHERE s_suppkey >= 1
      UNION ALL
      SELECT a.node, a.anc // 2, a.d + 1 FROM anc a WHERE a.anc >= 1
    )
    SELECT d,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT anc) AS BIGINT) AS n_ancestors
    FROM anc
    GROUP BY d
    """,
)
def sql_recursive_closure_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Spark 4 WITH RECURSIVE (the SQL-surface twin of
    operators/graph.py's iterative-doubling closure): ancestor pairs
    of the manager tree per depth, computed by the engine's own
    recursive-CTE execution instead of a hand-rolled driver loop.
    Declared so the contract covers BOTH transitive-closure entry
    points — a SQL user migrating recursive queries runs this path
    verbatim. Spark executes it as an iterated union with the same
    per-level shuffle profile as the explicit loop; depth is bounded
    by the tree height (log2 n), and each level's frame is the
    previous level filtered, so no state ever exceeds the closure
    itself. The DuckDB oracle is the IDENTICAL query modulo integer
    division spelling."""
    s = load_table(spark, sf_dir, "supplier")
    s.createOrReplaceTempView("__sup_rec")
    return spark.sql(
        """
        WITH RECURSIVE anc(node, anc, d) AS (
          SELECT s_suppkey, s_suppkey DIV 2, 1
          FROM __sup_rec WHERE s_suppkey >= 1
          UNION ALL
          SELECT a.node, a.anc DIV 2, a.d + 1 FROM anc a WHERE a.anc >= 1
        )
        SELECT d,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT anc) AS BIGINT) AS n_ancestors
        FROM anc
        GROUP BY d
        """
    )


INCR_CUTOFF = "2000-01-01"


@query(
    "agg_incremental_merge",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (the 100 TB pattern that
    replaces full recomputes): the pre-cutoff history is collapsed
    into a per-group PARTIAL-STATE table (count + integer-cents sum —
    both re-mergeable), the post-cutoff delta is aggregated alone,
    and the published result is the MERGE of state + delta partials.
    Equality with the from-scratch aggregate over the whole table is
    exactly what the oracle hash proves — the algebraic property
    (commutative-monoid partials) that makes per-batch maintenance
    sound. At scale the state table is group-cardinality-sized, the
    per-refresh cost is O(delta), and the final merge shuffles
    #groups x 2 rows, not the corpus. Spark's own partial/final agg
    does this within one job; this operator is the CROSS-JOB version
    a warehouse maintains across days."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cutoff = F.lit(INCR_CUTOFF).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )

    state = partials(o.filter(F.col("o_orderdate") < cutoff))
    delta = partials(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        state.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )


ATTR_LOOKBACK_S = 3 * 86400


@query(
    "events_attribution_last_touch",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id,
             event_type, value,
             CASE WHEN event_type = 'click'
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
             END AS campaign
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    attributed AS (
      SELECT event_type, value,
             last_value(campaign IGNORE NULLS) OVER w AS last_campaign,
             last_value(CASE WHEN event_type = 'click' THEN ts_s END
                        IGNORE NULLS) OVER w AS last_click_s,
             ts_s
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT last_campaign AS campaign,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM attributed
    WHERE event_type = 'purchase'
      AND last_campaign IS NOT NULL
      AND ts_s - last_click_s <= {ATTR_LOOKBACK_S}
    GROUP BY last_campaign
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    user's most recent click within a 3-day lookback (campaign =
    click's k mod 5 — the fixture's stand-in for a campaign id). The
    scalable formulation is the tagged-union window scan — clicks and
    purchases interleave in ONE per-user (ts, event_id) ordering and
    an IGNORE-NULLS running last carries the click forward — instead
    of the purchase-to-clicks as-of self-join, which re-shuffles both
    sides and fans out per purchase. One shuffle on user_id, then a
    tiny campaign-keyed aggregate. Revenue in integer cents (exact
    under any merge order)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    campaign = F.when(
        F.col("event_type") == "click",
        F.from_json("props", "k BIGINT").getField("k") % 5,
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_s"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = e.select(
        "user_id",
        "ts_s",
        "event_id",
        "event_type",
        "value",
        campaign.alias("campaign"),
    ).withColumn("click_s", click_ts)
    attributed = tagged.select(
        "event_type",
        "value",
        "ts_s",
        F.last("campaign", ignorenulls=True).over(w).alias("last_campaign"),
        F.last("click_s", ignorenulls=True).over(w).alias("last_click_s"),
    )
    return (
        attributed.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_campaign").isNotNull()
            & (F.col("ts_s") - F.col("last_click_s") <= ATTR_LOOKBACK_S)
        )
        .groupBy(F.col("last_campaign").alias("campaign"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@query(
    "embedding_label_centroids",
    oracle="""
    SELECT label, CAST(i AS INTEGER) AS dim,
           ROUND(AVG(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6)
             AS centroid
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) r(i)
    GROUP BY label, i
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label embedding centroids in LONG format (label, dim,
    mean) — the oracled exact twin of the rows-only k-means trainer:
    posexplode flattens the vectors so the mean is one hash aggregate
    on (label, dim), never a collect or a VectorAssembler. Long output
    keeps the oracle trivially SQL-expressible and the shuffle key
    fine-grained (labels x dims cells spread evenly — no per-label
    hot partition however skewed the label sizes); the array form is
    one groupBy(sort_array(collect_list)) away when needed. At corpus
    scale this is the centroid-update half of distributed k-means."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    return flat.groupBy(
        "label", (F.col("pos") + 1).cast("int").alias("dim")
    ).agg(F.round(F.avg("v"), 6).alias("centroid"))


@query(
    "nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey, n.n_name,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT n_regionkey, n_name, revenue_cents,
           ROUND(revenue_cents * 100.0 /
                 SUM(revenue_cents) OVER (PARTITION BY n_regionkey), 4)
             AS share_pct
    FROM rev
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total within group (the BI share-of-market staple):
    per-nation order revenue as a share of its region's total. Revenue
    aggregates to exact integer cents FIRST (any merge order), then
    one window SUM over the ~25-row nation spine computes the
    denominators — the window runs on the aggregate frame, never the
    fact table, so the share pass costs nothing at any scale. The
    share division is double math over exact integers, identical in
    both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(cents).cast("bigint").alias("revenue_cents"))
    )
    w = Window.partitionBy("n_regionkey")
    return rev.select(
        "n_regionkey",
        "n_name",
        "revenue_cents",
        F.round(
            F.col("revenue_cents") * 100.0 / F.sum("revenue_cents").over(w), 4
        ).alias("share_pct"),
    )


@query(
    "events_xml_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY event_type
    """,
)
def events_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (Spark 4 built-in from_xml — no spark-xml
    package): serialize each event into an XML element (attributes +
    child text node), parse it back with a declared schema (attribute
    fields use the `_` prefix), and aggregate the typed extractions.
    Pins the attribute/element mapping AND double round-tripping
    through XML text (shortest-repr serialization parses back
    bit-exact, which the integer-cents oracle against the base
    columns proves). Single projection pass, JVM-side parser, no
    UDF."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k")
    xml = F.concat(
        F.lit('<e k="'), k.cast("string"),
        F.lit('" v="'), F.col("value").cast("string"),
        F.lit('"><t>'), F.col("event_type"), F.lit("</t></e>"),
    )
    parsed = e.select(
        F.from_xml(xml, "_k BIGINT, _v DOUBLE, t STRING").alias("x")
    ).select(
        F.col("x.t").alias("event_type"),
        F.col("x._k").alias("k"),
        F.col("x._v").alias("v"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.sum(F.round(F.col("v") * 100).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )


@query(
    "scalar_collation_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                  WHEN event_id % 3 = 1
                    THEN upper(substr(event_type, 1, 1))
                         || substr(event_type, 2)
                  ELSE event_type END AS w
      FROM events
    )
    SELECT lower(w) AS event_type_ci, CAST(COUNT(*) AS BIGINT) AS n
    FROM mixed GROUP BY lower(w)
    """,
)
def scalar_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): event types are
    deliberately case-scrambled, then grouped under UTF8_LCASE — the
    engine-level way to make comparisons/joins/aggregations
    case-insensitive WITHOUT rewriting every expression to lower(x)
    (and without breaking pushdown the way wrapping columns in
    functions does). The emitted key is lowercased only for a
    deterministic display form; the grouping itself runs on the
    collated column. Oracle proves equivalence with the classic
    lower() rewrite."""
    e = load_table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("event_id") % 3 == 0, F.upper("event_type")
    ).when(
        F.col("event_id") % 3 == 1, F.initcap("event_type")
    ).otherwise(F.col("event_type"))
    return (
        e.select(F.collate(mixed, "UTF8_LCASE").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lower("w").alias("event_type_ci"), "n")
    )


RFM_ASOF = "2001-09-01"
RFM_MONETARY_BUCKET_CENTS = 1_000_000  # $10k-wide rank buckets


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                            DATE '{RFM_ASOF}') AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey)
                AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey)
                AS BIGINT) AS m_score
    FROM rfm
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (the CRM workhorse): per customer, days since
    last order (vs a fixed as-of date), order count, and lifetime
    integer-cents revenue, each scored into quintiles. Best quintile =
    1 on every axis (recent / frequent / big spenders). All three
    orderings carry the custkey tiebreak, so quintile assignment is
    deterministic and engine-identical (the oracle keeps the literal
    ntile(5) windows).

    Scale shape (VERDICT r6 #2, refined after the r7 bench): a global
    ntile window sorts the ENTIRE customer aggregate in one task —
    fatal at 10^8 customers but the FASTEST plan on small frames (the
    two-level path pays ~12 small jobs of fixed overhead; measured ~3x
    slower at sf0.1's 15k customers, 1.01x wall at 10x data). So the
    route is size-gated on the base scan's sizeInBytes statistic
    (zero-job metadata, the broadcast-join-threshold pattern): small
    inputs take the window path, big inputs the two-level bucketed
    prefix (operators/ranking.py) whose spines are bounded by VALUE
    DOMAINS, not customer count — recency_days by the order-date range
    (~2.5k days), frequency by orders-per-customer (SF-invariant,
    O(50)), monetary by $10k-wide cents ranges. Equality chain: the
    DuckDB oracle hash-proves the window route on the fixtures;
    tests/test_properties.py pins the bucketed helpers bit-identical
    to row_number()/ntile() for arbitrary inputs; and the forced-route
    plan test re-proves both routes row-identical on the fixture."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"), F.to_date(F.max("o_orderdate"))
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    # Route probe: |customers| <= |orders| always, so the base scan's
    # sizeInBytes statistic (zero jobs — the same metadata Spark's
    # broadcast-join pick reads) upper-bounds the aggregate frame. The
    # small route reads the aggregate once with no checkpoint; the big
    # route materializes it before the three rank passes re-use it.
    if plan_size_bytes(o) <= RANK_GLOBAL_WINDOW_MAX_INPUT_BYTES:
        return _rfm_scores(rfm, 0, bucketed=False)
    rfm = rfm.localCheckpoint(eager=False)
    return _rfm_scores(rfm, rfm.count(), bucketed=True)


def _rfm_scores(rfm: DataFrame, n_rows: int, bucketed: bool) -> DataFrame:
    """Score the per-customer RFM aggregate into quintiles via either
    route (see customer_rfm_segments). Both routes are value-identical
    (oracle + hypothesis proof chain in the caller's docstring)."""
    if not bucketed:
        wr = Window.orderBy("recency_days", "o_custkey")
        wf = Window.orderBy(F.col("frequency").desc(), "o_custkey")
        wm = Window.orderBy(F.col("monetary_cents").desc(), "o_custkey")
        return rfm.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            F.ntile(5).over(wr).cast("bigint").alias("r_score"),
            F.ntile(5).over(wf).cast("bigint").alias("f_score"),
            F.ntile(5).over(wm).cast("bigint").alias("m_score"),
        )
    rfm = bucketed_global_rank(
        rfm,
        F.col("recency_days"),
        [F.asc("recency_days"), F.asc("o_custkey")],
        "_r_rank",
    )
    rfm = bucketed_global_rank(
        rfm,
        (-F.col("frequency")).cast("bigint"),
        [F.desc("frequency"), F.asc("o_custkey")],
        "_f_rank",
    )
    rfm = bucketed_global_rank(
        rfm,
        F.expr(f"-(monetary_cents DIV {RFM_MONETARY_BUCKET_CENTS})"),
        [F.desc("monetary_cents"), F.asc("o_custkey")],
        "_m_rank",
    )
    rfm = rfm.withColumn("_n", F.lit(n_rows).cast("bigint"))
    return rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        ntile_from_rank("_r_rank", "_n", 5).alias("r_score"),
        ntile_from_rank("_f_rank", "_n", 5).alias("f_score"),
        ntile_from_rank("_m_rank", "_n", 5).alias("m_score"),
    )


@query(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-strategy control (§4.2): the same fact-fact equi-join
    as the sort-merge family, forced to a ShuffledHashJoin with the
    SHUFFLE_HASH hint. When one side is much smaller per partition
    but too big to broadcast, hashing the small side beats sorting
    BOTH sides — SMJ pays two sorts, SHJ pays one build. The hint is
    how a user encodes that knowledge without touching configs; the
    plan gate in test_plans pins that the hint is honored (Catalyst
    would otherwise pick SMJ for two large sides). Semantics are
    hint-invariant, which is exactly what the oracle hash proves."""
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )
    )


QUANT_BITS_MAX = 127


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH s AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))) AS scale
      FROM embeddings
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           CAST(list_sum(list_transform(
             v, x -> FLOOR(x / scale * {QUANT_BITS_MAX} + 0.5)
           )) AS BIGINT) AS q_checksum,
           CAST(list_max(list_transform(
             v, x -> FLOOR(x / scale * {QUANT_BITS_MAX} + 0.5)
           )) AS BIGINT) AS q_max
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-training int8 quantization of the embedding column
    (max-abs symmetric scaling — the storage/ANN-memory reduction
    step before serving): per vector, scale = max|x| and
    q_i = floor(x_i/scale*127 + 0.5). Entirely JVM-side higher-order
    functions (transform/aggregate) — no UDF, no Python — so the
    quantization runs inside whole-stage codegen at full scan speed.
    floor(x+0.5) instead of round() on BOTH engines: the halfway rule
    is then identical arithmetic (Spark HALF_UP and DuckDB
    double-round diverge at .5 boundaries), making the integer
    checksum hash-exact. Declared as (scale, checksum, max) per
    vector; the full int8 array column is the same expression minus
    the aggregation."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(
        F.col("v"), lambda x: F.floor(x / F.col("scale") * QUANT_BITS_MAX + 0.5)
    )
    # q must be computed in a select where `scale` is still the RAW
    # column: putting round(scale) and q in one projection makes
    # Spark's lateral column alias resolution bind the lambda's
    # `scale` to the 6dp-rounded OUTPUT alias (observed: one-ulp
    # checksum flip vs the oracle, which quantizes with full
    # precision). Display rounding happens strictly downstream.
    quantized = e.select("vec_id", v.alias("v"), scale.alias("scale")).select(
        "vec_id",
        "scale",
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint")
        ).alias("q_checksum"),
        F.array_max(q).cast("bigint").alias("q_max"),
    )
    return quantized.select(
        "vec_id", F.round("scale", 6).alias("scale"), "q_checksum", "q_max"
    )


@query(
    "dq_constraint_checks",
    oracle="""
    SELECT 'orders_custkey_fk' AS constraint_name,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'orders_orderkey_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 0.6) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'customer_name_not_null',
           CAST((SELECT COUNT(*) FROM customer WHERE c_name IS NULL)
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    """,
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (the deequ/dbt-test shape): five
    declarative checks — two referential-integrity anti-joins, a
    primary-key uniqueness count, a value-range scan, a NOT NULL
    scan — emitted as one (constraint, violations, checked) frame a
    pipeline gates on. Anti-joins are the scalable FK check (never a
    full outer join); uniqueness is count minus distinct-count (one
    aggregation, no self-join); the range/null checks ride single
    scans. Passing checks report 0 violations — the oracle hash pins
    the zeros too, so a silently-vacuous check (wrong column, wrong
    bound) fails the gate rather than greenwashing."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def shape(name, agg):
        return agg.select(
            F.lit(name).alias("constraint_name"),
            F.col("v").cast("bigint").alias("n_violations"),
            F.col("n").cast("bigint").alias("n_checked"),
        )

    # FK checks as LEFT JOIN + conditional count: violations and the
    # checked total come from ONE pass over the join (a separate
    # anti-join + crossJoined COUNT(*) would plan a 1-row BNLJ and
    # scan the fact table twice). The key projections are .distinct()
    # so a duplicate dimension key can't fan fact rows out and inflate
    # both counts — the FK check must stay correct even when the PK
    # uniqueness constraint beside it is the one being violated
    # (round-5 advice).
    # Each fact table is scanned ONCE for all its checks (round 11):
    # the FK left join preserves row multiplicity (the key projection
    # is distinct), so the PK-uniqueness / value-range aggregates ride
    # the same pass as the FK conditional count — their inputs are
    # bit-identical to a separate plain scan. The 1-row multi-column
    # aggregate then explodes into its per-constraint rows (a struct
    # array, no second pass). The old shape re-scanned orders and
    # lineitem once per check.
    def rows(agg, *named):
        return agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("constraint_name"),
                            F.col(v).cast("bigint").alias("n_violations"),
                            F.col("n").cast("bigint").alias("n_checked"),
                        )
                        for name, v in named
                    ]
                )
            ).alias("r")
        ).select("r.*")

    c_keys = c.select(
        F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("__hit")
    ).distinct()
    orders_rows = rows(
        o.join(F.broadcast(c_keys), on="o_custkey", how="left").agg(
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
                "fk_v"
            ),
            (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_v"),
            F.count("*").alias("n"),
        ),
        ("orders_custkey_fk", "fk_v"),
        ("orders_orderkey_unique", "pk_v"),
    )
    o_keys = o.select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("__hit")
    ).distinct()
    lineitem_rows = rows(
        li.join(o_keys, on="l_orderkey", how="left").agg(
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
                "fk_v"
            ),
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.6), 1
                ).otherwise(0)
            ).alias("rng_v"),
            F.count("*").alias("n"),
        ),
        ("lineitem_orderkey_fk", "fk_v"),
        ("lineitem_discount_range", "rng_v"),
    )
    nn = shape(
        "customer_name_not_null",
        c.agg(
            F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0)).alias("v"),
            F.count("*").alias("n"),
        ),
    )
    return orders_rows.unionByName(lineitem_rows).unionByName(nn)


PSI_BINS = 10  # population-stability-index grid (the industry default)
PSI_SPLIT_DAYS = 15  # reference window = first 15 epoch days of the corpus
PSI_EPS = 1e-6  # zero-bin guard (standard PSI practice)
PSI_ALERT = 0.2  # the conventional "significant drift" threshold


@query(
    "dq_drift_psi",
    oracle=f"""
    WITH base AS (
      SELECT event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_n
      FROM events
    ),
    bound AS (SELECT MIN(day_n) + {PSI_SPLIT_DAYS} AS split_day FROM base),
    parts AS (
      SELECT event_type, value,
             CASE WHEN day_n < split_day THEN 0 ELSE 1 END AS part
      FROM base, bound
    ),
    stats AS (
      SELECT event_type,
             MIN(CASE WHEN part = 0 THEN value END) AS vmin,
             MAX(CASE WHEN part = 0 THEN value END) AS vmax,
             CAST(SUM(CASE WHEN part = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN part = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM parts GROUP BY event_type
    ),
    sized AS (
      SELECT event_type, vmin, n_ref, n_cur,
             CASE WHEN vmax > vmin THEN (vmax - vmin) / {float(PSI_BINS)!r}
                  ELSE 1.0 END AS width
      FROM stats
    ),
    cnts AS (
      -- clamp BEFORE the int cast: a current-window outlier far
      -- outside the reference grid (exactly the drift this monitor
      -- exists for) must land in the edge bin, not overflow INT32
      SELECT p.event_type, p.part,
             CAST(LEAST(GREATEST(floor((p.value - s.vmin) / s.width),
                                 0.0), {float(PSI_BINS - 1)!r}) AS INTEGER) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM parts p JOIN sized s ON p.event_type = s.event_type
      GROUP BY 1, 2, 3
    ),
    dense AS (
      SELECT s.event_type, s.n_ref, s.n_cur, b.bin,
             COALESCE(r.cnt, 0) AS ref_cnt,
             COALESCE(c.cnt, 0) AS cur_cnt
      FROM sized s
      CROSS JOIN (SELECT unnest(range(0, {PSI_BINS})) AS bin) b
      LEFT JOIN cnts r ON r.event_type = s.event_type
                      AND r.bin = b.bin AND r.part = 0
      LEFT JOIN cnts c ON c.event_type = s.event_type
                      AND c.bin = b.bin AND c.part = 1
    ),
    terms AS (
      SELECT event_type, n_ref, n_cur,
             GREATEST(CAST(ref_cnt AS DOUBLE) / n_ref, {PSI_EPS!r}) AS pr,
             GREATEST(CAST(cur_cnt AS DOUBLE) / n_cur, {PSI_EPS!r}) AS pc
      FROM dense
    )
    SELECT event_type, n_ref, n_cur,
           -- each term snaps to 1e-12 fixed point BEFORE the sum, so
           -- the 10-term accumulation is exact integer arithmetic —
           -- immune to summation order on both engines (events_ewma
           -- pattern); terms are <= ~14, so <= 1.4e13 per term and
           -- <= 1.4e14 per sum: comfortably BIGINT
           ROUND(SUM(CAST(round((pc - pr) * ln(pc / pr) * 1e12)
                          AS BIGINT)) / 1e12, 6) AS psi,
           SUM(CAST(round((pc - pr) * ln(pc / pr) * 1e12)
                    AS BIGINT)) / 1e12 > {PSI_ALERT!r} AS drifted
    FROM terms GROUP BY event_type, n_ref, n_cur
    ORDER BY event_type
    """,
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring (the dq family's temporal member):
    population stability index of events.value per type between the
    corpus's first 15-day window (reference, PSI_SPLIT_DAYS) and the
    rest (current). Equal-width 10-bin grid fixed from the REFERENCE
    window's min/max (the production shape: the grid is pinned by the
    reference snapshot, current values clamp into its edge bins),
    densified to all bins via a 10-row literal cross join so empty
    bins contribute through the standard epsilon guard, then
    PSI = sum (pc - pr) * ln(pc / pr). At 100 TB this is two
    conditional aggregations and a 10-row-per-group window — one scan
    of each snapshot, no sort; the per-bin count table is itself a
    persistable summary (counts merge by addition, so daily PSI
    against a frozen reference never rescans the reference). All
    arithmetic mirrored expression-for-expression in the oracle."""
    e = load_table(spark, sf_dir, "events")
    base = e.select("event_type", "value", F.expr("ts_s div 86400").alias("day_n"))
    bound = base.agg(
        (F.min("day_n") + PSI_SPLIT_DAYS).alias("split_day")
    )
    parts = base.crossJoin(F.broadcast(bound)).select(
        "event_type",
        "value",
        F.when(F.col("day_n") < F.col("split_day"), 0).otherwise(1).alias("part"),
    )
    stats = parts.groupBy("event_type").agg(
        F.min(F.when(F.col("part") == 0, F.col("value"))).alias("vmin"),
        F.max(F.when(F.col("part") == 0, F.col("value"))).alias("vmax"),
        F.sum(F.when(F.col("part") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("part") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    sized = stats.select(
        "event_type",
        "vmin",
        "n_ref",
        "n_cur",
        F.when(
            F.col("vmax") > F.col("vmin"),
            (F.col("vmax") - F.col("vmin")) / F.lit(float(PSI_BINS)),
        )
        .otherwise(F.lit(1.0))
        .alias("width"),
    )
    cnts = (
        parts.join(F.broadcast(sized.select("event_type", "vmin", "width")), "event_type")
        .select(
            "event_type",
            "part",
            # clamp in LONG (F.floor of a double is LONG, saturating)
            # BEFORE the int cast — a far-out current-window outlier
            # must hit the edge bin, never wrap a 32-bit cast
            F.least(
                F.greatest(
                    F.floor((F.col("value") - F.col("vmin")) / F.col("width")),
                    F.lit(0),
                ),
                F.lit(PSI_BINS - 1),
            )
            .cast("int")
            .alias("bin"),
        )
        # BOTH windows' bin counts in ONE aggregation (round 11): the
        # part flag moves from the GROUP KEY into two conditional sums,
        # so the densify step below is a single left join instead of
        # two (part-filtered copies of this whole subtree re-aggregated
        # per side). A (type, bin) group seen only in one window now
        # reports 0 for the other window's count instead of being
        # absent — exactly what the old coalesce(cnt, 0) produced.
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("part") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("ref_cnt"),
            F.sum(F.when(F.col("part") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("cur_cnt"),
        )
    )
    bins = sized.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.explode(F.array(*[F.lit(i) for i in range(PSI_BINS)])).alias("bin"),
    )
    dense = (
        bins.join(cnts, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            F.greatest(
                F.coalesce(F.col("ref_cnt"), F.lit(0)).cast("double")
                / F.col("n_ref"),
                F.lit(PSI_EPS),
            ).alias("pr"),
            F.greatest(
                F.coalesce(F.col("cur_cnt"), F.lit(0)).cast("double")
                / F.col("n_cur"),
                F.lit(PSI_EPS),
            ).alias("pc"),
        )
    )
    # 1e-12 fixed-point term snap -> exact integer sum (order-immune
    # on both engines; see the oracle's comment)
    term_fp = F.expr("cast(round((pc - pr) * ln(pc / pr) * 1e12) as bigint)")
    psi = F.sum(term_fp) / F.lit(1e12)
    return (
        dense.groupBy("event_type", "n_ref", "n_cur")
        .agg(
            F.round(psi, 6).alias("psi"),
            (psi > PSI_ALERT).alias("drifted"),
        )
        .transform(bounded_sort, "event_type")
    )


@query(
    "events_rolling_median_counts",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type, day, n,
           quantile_cont(n, 0.5) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS med_7d
    FROM daily
    """,
)
def events_rolling_median_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day median of daily event counts per type — the
    robust trend line ops dashboards draw instead of a mean that one
    traffic spike drags. Rolling median is not decomposable (no
    partial-aggregate trick exists), so the scalable formulation
    pre-aggregates to the DAILY grain first and runs the window
    percentile over ≤7-row frames of the tiny daily spine — the
    window cost is days x types, independent of event volume. Median
    of ≤7 integers interpolates to exact .0/.5 doubles, so the hash
    needs no rounding."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.expr("percentile(n, 0.5)").over(w).alias("med_7d"),
    )


@query(
    "agg_regression_funcs",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, CAST(json_extract_string(props, '$.k')
                                       AS DOUBLE)) AS BIGINT) AS n,
           ROUND(regr_slope(value, CAST(json_extract_string(props, '$.k')
                                        AS DOUBLE)), 6) AS slope,
           ROUND(regr_intercept(value, CAST(json_extract_string(props, '$.k')
                                            AS DOUBLE)), 6) AS intercept,
           ROUND(corr(value, CAST(json_extract_string(props, '$.k')
                                  AS DOUBLE)), 6) AS r
    FROM events
    GROUP BY event_type
    """,
)
def agg_regression_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 linear-regression aggregates (the in-database ML
    primitives): per event type, OLS slope/intercept of value on the
    props.k covariate plus Pearson r — one distributed aggregation,
    no feature-matrix collect, no ML library. These are
    sufficient-statistics aggregates (sums of x, y, xy, x², y²), so
    they partial-combine like any sum and scale like COUNT. Both
    engines implement the identical textbook definitions; 6dp
    rounding absorbs summation-order ulps."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k").cast("double")
    d = e.select("event_type", F.col("value").alias("y"), k.alias("x"))
    return d.groupBy("event_type").agg(
        F.regr_count("y", "x").cast("bigint").alias("n"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
        F.round(F.corr("y", "x"), 6).alias("r"),
    )


BASKET_MIN_SUPPORT = 50
BASKET_TOPK = 20


@query(
    "basket_brand_affinity",
    oracle=f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY p_brand),
    total AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
    pairs AS (
      SELECT a.p_brand AS b1, b.p_brand AS b2, COUNT(*) AS n_both
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT b1, b2, CAST(n_both AS BIGINT) AS n_both,
           CAST(FLOOR(n_both * 1000000.0 / n1.n + 0.5) AS BIGINT)
             AS confidence_e6,
           CAST(FLOOR(n_both * 1.0 * t.n_orders * 1000000.0
                      / (n1.n * 1.0 * n2.n) + 0.5) AS BIGINT) AS lift_e6
    FROM pairs
    JOIN nb n1 ON b1 = n1.p_brand
    JOIN nb n2 ON b2 = n2.p_brand
    CROSS JOIN total t
    ORDER BY n_both DESC, b1, b2
    LIMIT {BASKET_TOPK}
    """,
)
def basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity (association-rules primitives): top
    co-occurring brand pairs per order with support, confidence
    P(b2|b1) and lift. The pair join is the classic self-join on the
    basket id over the DISTINCT (order, brand) incidence — fan-out is
    per-order distinct-brand count squared (item-domain-bounded: 25
    brands, never raw line items), and a min-support HAVING prunes
    the tail before the stats joins. Scores ship as integer
    millionths via floor(x+.5); the 1-row order-total frame rides a
    broadcast. At catalog scale the same plan runs on a hashed item
    id with a frequency cap — identical shape."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # The incidence dedup exchange is KEYED ON THE BASKET ID (round
    # 11): hash(l_orderkey) satisfies the (order, brand) dedup's
    # ClusteredDistribution, and it is exactly the distribution the
    # pair self-join needs — both join sides then read the same
    # reused exchange co-partitioned, instead of re-exchanging the
    # incidence twice. The old `.distinct()` partitioned on the pair,
    # which no downstream consumer could reuse.
    ob = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select("l_orderkey", "p_brand")
        .repartition("l_orderkey")
        .dropDuplicates(["l_orderkey", "p_brand"])
    )
    nb = ob.groupBy("p_brand").agg(F.count("*").alias("n"))
    total = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("b1"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("b2"))
    pairs = (
        a.join(b, on="l_orderkey")
        .filter(F.col("b1") < F.col("b2"))
        .groupBy("b1", "b2")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= BASKET_MIN_SUPPORT)
    )
    n1 = nb.select(F.col("p_brand").alias("b1"), F.col("n").alias("n1"))
    n2 = nb.select(F.col("p_brand").alias("b2"), F.col("n").alias("n2"))
    j = (
        pairs.join(F.broadcast(n1), on="b1")
        .join(F.broadcast(n2), on="b2")
        .crossJoin(F.broadcast(total))
    )
    conf = F.floor(F.col("n_both") * 1000000.0 / F.col("n1") + 0.5)
    lift = F.floor(
        F.col("n_both") * 1.0 * F.col("n_orders") * 1000000.0
        / (F.col("n1") * 1.0 * F.col("n2"))
        + 0.5
    )
    return (
        j.select(
            "b1",
            "b2",
            F.col("n_both").cast("bigint").alias("n_both"),
            conf.cast("bigint").alias("confidence_e6"),
            lift.cast("bigint").alias("lift_e6"),
        )
        .orderBy(F.col("n_both").desc(), "b1", "b2")
        .limit(BASKET_TOPK)
    )


@query(
    "events_top_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    )
    SELECT event_type AS e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY event_type, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 15
    """,
)
def events_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining one level past the Markov pair
    matrix (events_transition_counts): the top event-type TRIGRAMS
    per user stream, via two stacked lead() offsets on ONE window
    spec — a single shuffle+sort on user_id produces both lookaheads,
    and the aggregate runs on the tiny type³ key domain. The funnel
    designer's raw material: which 3-step paths actually happen."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(15)
    )
