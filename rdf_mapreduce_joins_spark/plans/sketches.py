"""Mergeable-sketch aggregation (SURVEY.md §2.4 A4 deepened): Apache
DataSketches HLL / KLL / Theta via Spark 4's built-in sketch
functions, plus the PORTABLE sketch family (round 6).

The 100 TB pattern these declare: per-partition/per-day SUMMARY TABLES
of binary sketches that are (a) tiny (KBs per group regardless of
input size), (b) exactly re-mergeable (union of sketches == sketch of
union), so rollups across days / regions / tenants never rescan raw
data — the cross-job analog of Spark's internal partial aggregation,
and what `approx_count_distinct` alone cannot do (its HLL++ state is
not exposed for later merging).

The DataSketches trio is rows-only for the driver (their estimates
are deterministic for fixed input but not ANSI-SQL-reproducible in
DuckDB); tests pin the estimates against exact answers with the
sketch-family error bounds AND pin merge losslessness (HLL union ==
direct sketch at the same lgK).

The PORTABLE trio (agg_hll_portable / agg_kmv_distinct /
events_rolling_distinct_portable) closes the gap the DataSketches
family cannot: sketch summary tables whose registers are plain
integer columns computed from the cross-engine md5-60bit hash
(operators/hashing.py), so ANY engine — Spark, DuckDB, Python — can
build, merge and query the SAME sketch byte for byte. That buys the
full hash-match oracle (approximation error and all is reproduced
exactly in SQL) and, operationally, summary tables that survive an
engine migration. Register extraction, merging and the exact-integer
estimator inputs live in operators/sketches.py (hll_portable_*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.operators import hashing, sketches
from rdf_mapreduce_joins_spark.operators.hashing import hex60_sql
from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import (
    bounded_sort,
    load_table,
    spread,
)

HLL_LGK = 12  # 2^12 registers → ~1.6% relative standard error


@query("agg_hll_mergeable")  # rows-only: sketch estimates not SQL-expressible
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-count rollup entirely in sketch space:
    per-nation HLL sketches of customer keys, then the REGION rollup
    computed by hll_union_agg over the nation sketches — never
    touching the customer table again. The union is lossless at equal
    lgK, so region estimates are identical to direct region sketches
    (pinned in tests). Emits one row per region (estimate + nation
    count); the exact twin is agg_count_distinct."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    per_nation = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey", F.lit(HLL_LGK)).alias("sk"))
    )
    return bounded_sort(
        per_nation.groupBy("n_regionkey").agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("est_customers"),
            F.count("*").cast("bigint").alias("n_nations"),
        ),
        "n_regionkey",
    )


@query("agg_kll_quantiles")  # rows-only: sketch estimates not SQL-expressible
def agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantiles: per-event-type KLL double
    sketches over value, queried at p50/p90/p99. KLL guarantees a
    RANK error (≈1.7% at the default k=200), not a value error — the
    tests therefore assert rank-tolerance against exact percentiles,
    the correct contract for heavy-tailed data. The sketch column is
    what a daily summary table would persist; re-aggregation across
    days is kll_sketch_merge, never a raw rescan."""
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count("*").cast("bigint").alias("n"),
    )
    return bounded_sort(
        sk.select(
            "event_type",
            "n",
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 4).alias("p50"),
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 4).alias("p90"),
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 4).alias("p99"),
        ),
        "event_type",
    )


@query("agg_theta_distinct")  # rows-only: sketch estimates not SQL-expressible
def agg_theta_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch distinct users per event type — the sketch family
    built for downstream SET ALGEBRA (union/intersection/difference
    of audiences) rather than pure counting. Declared at the
    per-type estimate level (deterministic for fixed input); the
    audience-overlap composition is exercised in tests against exact
    intersections."""
    e = load_table(spark, sf_dir, "events")
    return bounded_sort(
        e.groupBy("event_type").agg(
            F.theta_sketch_estimate(F.theta_sketch_agg("user_id"))
            .cast("bigint")
            .alias("est_users")
        ),
        "event_type",
    )


KMV_K = 64  # bottom-k size -> ~1/sqrt(k-2) = 12.7% relative std error
KMV_NUM = float((KMV_K - 1) * (1 << 60))  # (k-1) / (h_k / 2^60), numerator


@query(
    "agg_hll_portable",
    oracle=f"""
    WITH hashed AS (
      SELECT n.n_regionkey, c.c_nationkey,
             {hex60_sql('md5(CAST(c_custkey AS VARCHAR))')} AS h
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    cells AS (
      SELECT n_regionkey, c_nationkey, h % {sketches.HLL_PORTABLE_M} AS bucket,
             {sketches.hll_portable_rho_sql('h')} AS rho
      FROM hashed
    ),
    nat AS (
      SELECT n_regionkey, c_nationkey, bucket, MAX(rho) AS reg
      FROM cells GROUP BY n_regionkey, c_nationkey, bucket
    ),
    merged AS (
      SELECT n_regionkey, bucket, MAX(reg) AS reg
      FROM nat GROUP BY n_regionkey, bucket
    ),
    st AS (
      SELECT n_regionkey, {sketches.hll_portable_stats_sql()}
      FROM merged GROUP BY n_regionkey
    ),
    nats AS (
      SELECT n_regionkey,
             CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nation_sketches
      FROM nat GROUP BY n_regionkey
    )
    SELECT st.n_regionkey,
           ROUND({sketches.hll_portable_estimate_sql('sreg', 'v')}, 4)
             AS est_customers,
           nats.n_nation_sketches
    FROM st JOIN nats ON st.n_regionkey = nats.n_regionkey
    ORDER BY st.n_regionkey
    """,
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_hll_mergeable's portable twin: the same two-level
    nation→region distinct-customer rollup, but on the portable
    integer-register HLL (operators/sketches.py hll_portable_*) and
    therefore FULLY ORACLED — the DuckDB oracle rebuilds the identical
    register table from the md5-60bit hash and reproduces the
    estimate, approximation error and all. The merge step IS the
    lossless-union law in-plan: region registers are the bucket-wise
    MAX of the 25 nation sketches, never a rescan of customers. Scale
    shape: one scan, two bounded aggregations (at most
    groups x 256 register rows), the estimator over 5 rows; the
    register frame is the persistable cross-engine summary table."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cells = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "n_regionkey",
        "c_nationkey",
        *sketches.hll_portable_cols("c_custkey", hash_family="md5"),
    )
    nat = cells.groupBy("n_regionkey", "c_nationkey", "bucket").agg(
        F.max("rho").alias("reg")
    )
    merged = nat.groupBy("n_regionkey", "bucket").agg(F.max("reg").alias("reg"))
    st = merged.groupBy("n_regionkey").agg(*sketches.hll_portable_stats_cols())
    nats = nat.groupBy("n_regionkey").agg(
        F.count_distinct("c_nationkey").alias("n_nation_sketches")
    )
    est = F.round(F.expr(sketches.hll_portable_estimate_sql("sreg", "v")), 4)
    return (
        st.join(nats, "n_regionkey")
        .select("n_regionkey", est.alias("est_customers"), "n_nation_sketches")
        .transform(bounded_sort, "n_regionkey")
    )


@query(
    "agg_kmv_distinct",
    oracle=f"""
    WITH hx AS (
      SELECT DISTINCT event_type,
             {hex60_sql('md5(CAST(user_id AS VARCHAR))')} AS h
      FROM events
    ),
    topk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
        FROM hx) ranked
      WHERE r <= {KMV_K}
    ),
    st AS (
      SELECT event_type, MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS n_minvals
      FROM topk GROUP BY event_type
    )
    SELECT event_type,
           ROUND(CASE WHEN n_minvals < {KMV_K} THEN CAST(n_minvals AS DOUBLE)
                      ELSE {KMV_NUM!r} / CAST(hk AS DOUBLE) END, 4) AS est_users,
           n_minvals
    FROM st ORDER BY event_type
    """,
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_theta_distinct's portable twin: bottom-k (KMV) distinct
    users per event type — the k smallest distinct hash values are the
    sketch, est = (k-1)/U_(k) with U_(k) the k-th minimum normalized
    to [0,1) (exactly the first-generation theta sketch; groups with
    fewer than k distinct hashes report their exact count). Like the
    theta family the KMV set supports downstream set algebra (union =
    bottom-k of the merged sets). Fully oracled on the md5-60bit hash:
    ranks, the k-th minimum, and the one float division reproduce
    identically in DuckDB. Scale shape: the rank filter plans a
    WindowGroupLimit, so each map task retains only its top-k rows per
    key BEFORE the shuffle — per-key state is O(k), never the distinct
    set."""
    e = load_table(spark, sf_dir, "events")
    hx = (
        spread(e)
        .select(
            "event_type",
            hashing.base_hash60(F.col("user_id").cast("string"), "md5").alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    topk = hx.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= KMV_K)
    st = topk.groupBy("event_type").agg(
        F.max("h").alias("hk"),
        F.count(F.lit(1)).cast("bigint").alias("n_minvals"),
    )
    est = F.round(
        F.when(F.col("n_minvals") < KMV_K, F.col("n_minvals").cast("double")).otherwise(
            F.lit(KMV_NUM) / F.col("hk").cast("double")
        ),
        4,
    )
    return bounded_sort(
        st.select("event_type", est.alias("est_users"), "n_minvals"),
        "event_type"
    )


HIST_BUCKETS = 256  # quantile histogram grid resolution


@query(
    "agg_quantile_histogram",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    sized AS (
      SELECT event_type, vmin, n,
             CASE WHEN vmax > vmin THEN (vmax - vmin) / {float(HIST_BUCKETS)!r}
                  ELSE 1.0 END AS width
      FROM stats
    ),
    hist AS (
      SELECT e.event_type,
             LEAST(CAST(floor((e.value - s.vmin) / s.width) AS INTEGER),
                   {HIST_BUCKETS - 1}) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events e JOIN sized s ON e.event_type = s.event_type
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bucket, CAST(SUM(cnt) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM hist
    ),
    picks AS (
      SELECT c.event_type,
             MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.5 * s.n
                      THEN bucket END) AS b50,
             MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.9 * s.n
                      THEN bucket END) AS b90,
             MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.99 * s.n
                      THEN bucket END) AS b99
      FROM cum c JOIN sized s ON c.event_type = s.event_type
      GROUP BY c.event_type
    )
    SELECT p.event_type, s.n,
           ROUND(s.vmin + (p.b50 + 1.0) * s.width, 4) AS p50,
           ROUND(s.vmin + (p.b90 + 1.0) * s.width, 4) AS p90,
           ROUND(s.vmin + (p.b99 + 1.0) * s.width, 4) AS p99
    FROM picks p JOIN sized s ON p.event_type = s.event_type
    ORDER BY p.event_type
    """,
)
def agg_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_kll_quantiles' portable twin — the quantile member of the
    portable summary-table family (distinct: HLL/KMV, frequency: CMS,
    quantiles: THIS). A fixed 256-bucket histogram per group: counts
    are plain integers that MERGE BY ADDITION across shards/days (the
    property KLL needs its compactor machinery for), and the quantile
    read-out is one cumulative window over 256 rows — upper bucket
    edge, so the value error is bounded by one grid step of the
    group's range. The grid here is derived from a first min/max pass
    (deterministic, mirrored in the oracle); a production pipeline
    pins the grid once from domain knowledge so daily histograms stay
    mergeable forever. Fully oracled: grid arithmetic, bucket floors,
    cumulative ranks and the read-out reproduce bit-for-bit in
    DuckDB."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    sized = stats.select(
        "event_type",
        "vmin",
        "n",
        F.when(
            F.col("vmax") > F.col("vmin"),
            (F.col("vmax") - F.col("vmin")) / F.lit(float(HIST_BUCKETS)),
        )
        .otherwise(F.lit(1.0))
        .alias("width"),
    )
    hist = (
        e.join(F.broadcast(sized), "event_type")
        .select(
            "event_type",
            F.least(
                F.floor((F.col("value") - F.col("vmin")) / F.col("width")).cast(
                    "int"
                ),
                F.lit(HIST_BUCKETS - 1),
            ).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type", "bucket", F.sum("cnt").over(w).cast("bigint").alias("cum")
    )
    joined = cum.join(F.broadcast(sized), "event_type")
    picks = joined.groupBy("event_type").agg(
        *[
            F.min(
                F.when(
                    F.col("cum").cast("double") >= F.lit(p) * F.col("n"),
                    F.col("bucket"),
                )
            ).alias(f"b{tag}")
            for p, tag in ((0.5, "50"), (0.9, "90"), (0.99, "99"))
        ]
    )
    out = picks.join(F.broadcast(sized), "event_type")
    return out.select(
        "event_type",
        "n",
        *[
            F.round(
                F.col("vmin") + (F.col(f"b{tag}") + F.lit(1.0)) * F.col("width"), 4
            ).alias(f"p{tag}")
            for tag in ("50", "90", "99")
        ],
    ).transform(bounded_sort, "event_type")


@query(
    "agg_kmv_overlap",
    oracle=f"""
    WITH hx AS (
      SELECT DISTINCT
             CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS INTEGER) AS mon_n,
             {hex60_sql('md5(CAST(o_custkey AS VARCHAR))')} AS h
      FROM orders
    ),
    months AS (SELECT DISTINCT mon_n FROM hx),
    pairs AS (
      SELECT m.mon_n FROM months m
      JOIN months p ON p.mon_n = m.mon_n - 1
    ),
    contrib AS (
      SELECT mon_n AS pair_mon, h, 1 AS is_cur, 0 AS is_prev FROM hx
      UNION ALL
      SELECT mon_n + 1 AS pair_mon, h, 0, 1 FROM hx
    ),
    members AS (
      SELECT c.pair_mon, c.h,
             MAX(c.is_cur) AS in_cur, MAX(c.is_prev) AS in_prev
      FROM contrib c JOIN pairs pr ON c.pair_mon = pr.mon_n
      GROUP BY c.pair_mon, c.h
    ),
    topk AS (
      SELECT pair_mon, h, in_cur, in_prev FROM (
        SELECT pair_mon, h, in_cur, in_prev,
               row_number() OVER (PARTITION BY pair_mon ORDER BY h) AS r
        FROM members) ranked
      WHERE r <= {KMV_K}
    ),
    st AS (
      SELECT pair_mon, MAX(h) AS hk,
             CAST(COUNT(*) AS BIGINT) AS n_minvals,
             CAST(SUM(in_cur * in_prev) AS BIGINT) AS n_both
      FROM topk GROUP BY pair_mon
    )
    SELECT pair_mon AS mon_n, n_minvals,
           ROUND(CASE WHEN n_minvals < {KMV_K} THEN CAST(n_minvals AS DOUBLE)
                      ELSE {KMV_NUM!r} / CAST(hk AS DOUBLE) END, 4)
             AS est_union_customers,
           ROUND(CAST(n_both AS DOUBLE) / n_minvals, 4) AS jaccard_est,
           ROUND((CAST(n_both AS DOUBLE) / n_minvals)
                 * CASE WHEN n_minvals < {KMV_K} THEN CAST(n_minvals AS DOUBLE)
                        ELSE {KMV_NUM!r} / CAST(hk AS DOUBLE) END, 4)
             AS est_repeat_customers
    FROM st ORDER BY mon_n
    """,
)
def agg_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV SET ALGEBRA — the composition agg_theta_distinct's family
    is built for, portable and fully oracled: month-over-month repeat-
    customer overlap on orders. For each consecutive-month pair the
    bottom-k of the UNION of the two months' customer-hash sets is a
    uniform sample of the union, so the fraction of its members
    present in BOTH months estimates the Jaccard similarity, and
    jaccard x union-estimate recovers the intersection size (exact
    when the union fits under k). Membership fan-out is an exact
    two-way UNION (each month contributes itself as 'current' and
    month+1 as 'previous' — equi-join against the valid pair list, no
    range join), and the rank filter plans WindowGroupLimit: map
    tasks keep O(k) rows per pair. The same composition at 100 TB
    answers audience-overlap / retention questions from persisted
    per-period bottom-k summary tables without ever rescanning raw
    data."""
    o = load_table(spark, sf_dir, "orders")
    # No pre-distinct on (mon_n, h) and ONE exchange for the whole
    # membership pipeline (round 11): the members aggregation's MAX
    # flags already dedup per (pair_mon, h), so the distinct was a
    # redundant exchange — and hash(pair_mon) satisfies the
    # ClusteredDistribution of the (pair_mon, h) aggregation, the
    # top-k window AND the final stats aggregation, so one explicit
    # repartition on pair_mon (no fixed count — AQE sizes it) replaces
    # the agg + window exchanges the old chain paid on top.
    hx = spread(o).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("int")
        .alias("mon_n"),
        hashing.base_hash60(F.col("o_custkey").cast("string"), "md5").alias(
            "h"
        ),
    )
    months = hx.select("mon_n").distinct()
    prev = months.select((F.col("mon_n") + 1).alias("mon_n"))
    pairs = months.join(F.broadcast(prev), "mon_n").select(
        F.col("mon_n").alias("pair_mon")
    )
    contrib = hx.select(
        F.col("mon_n").alias("pair_mon"),
        "h",
        F.lit(1).alias("is_cur"),
        F.lit(0).alias("is_prev"),
    ).unionByName(
        hx.select(
            (F.col("mon_n") + 1).alias("pair_mon"),
            "h",
            F.lit(0).alias("is_cur"),
            F.lit(1).alias("is_prev"),
        )
    )
    members = (
        contrib.join(F.broadcast(pairs), "pair_mon")
        .repartition("pair_mon")
        .groupBy("pair_mon", "h")
        .agg(F.max("is_cur").alias("in_cur"), F.max("is_prev").alias("in_prev"))
    )
    w = Window.partitionBy("pair_mon").orderBy("h")
    topk = members.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= KMV_K
    )
    st = topk.groupBy("pair_mon").agg(
        F.max("h").alias("hk"),
        F.count(F.lit(1)).cast("bigint").alias("n_minvals"),
        F.sum(F.col("in_cur") * F.col("in_prev")).cast("bigint").alias("n_both"),
    )
    union_est = F.when(
        F.col("n_minvals") < KMV_K, F.col("n_minvals").cast("double")
    ).otherwise(F.lit(KMV_NUM) / F.col("hk").cast("double"))
    jaccard = F.col("n_both").cast("double") / F.col("n_minvals")
    return st.select(
        F.col("pair_mon").alias("mon_n"),
        "n_minvals",
        F.round(union_est, 4).alias("est_union_customers"),
        F.round(jaccard, 4).alias("jaccard_est"),
        F.round(jaccard * union_est, 4).alias("est_repeat_customers"),
    ).transform(bounded_sort, "mon_n")


ROLLING_DAYS = 7

# The daily user-register summary table — shared by the rolling-window
# and persisted-roundtrip queries; the Spark builder and the oracle CTE
# chain below are line-for-line twins.
_DAILY_REGISTERS_SQL = f"""ev AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_n,
             {hex60_sql('md5(CAST(user_id AS VARCHAR))')} AS h
      FROM events
    ),
    cells AS (
      SELECT day_n, h % {sketches.HLL_PORTABLE_M} AS bucket,
             {sketches.hll_portable_rho_sql('h')} AS rho
      FROM ev
    ),
    daily AS (
      SELECT day_n, bucket, MAX(rho) AS reg FROM cells GROUP BY day_n, bucket
    )"""


def _daily_user_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_DAILY_REGISTERS_SQL``: per-(epoch-day, bucket)
    portable HLL registers of the events user stream — at most
    #days x 256 rows, the persistable cross-engine summary table.
    Register arithmetic comes from the one shared implementation
    (operators/sketches.hll_portable_cols — value parity with the
    oracle's rho SQL pinned by the three-engine probe test)."""
    e = load_table(spark, sf_dir, "events")
    cells = spread(e).select(
        F.expr("ts_s div 86400").alias("day_n"),
        *sketches.hll_portable_cols("user_id", hash_family="md5"),
    )
    return cells.groupBy("day_n", "bucket").agg(F.max("rho").alias("reg"))


@query(
    "events_rolling_distinct_portable",
    oracle=f"""
    WITH {_DAILY_REGISTERS_SQL},
    days AS (SELECT DISTINCT day_n FROM daily),
    contrib AS (
      SELECT unnest(generate_series(day_n, day_n + {ROLLING_DAYS - 1}))
               AS obs_day,
             bucket, reg
      FROM daily
    ),
    merged AS (
      SELECT c.obs_day AS day_n, c.bucket, MAX(c.reg) AS reg
      FROM contrib c JOIN days d ON c.obs_day = d.day_n
      GROUP BY c.obs_day, c.bucket
    ),
    st AS (
      SELECT day_n, {sketches.hll_portable_stats_sql()}
      FROM merged GROUP BY day_n
    ),
    nev AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_n,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    )
    SELECT st.day_n, nev.n_events,
           ROUND({sketches.hll_portable_estimate_sql('sreg', 'v')}, 4)
             AS est_rolling_users
    FROM st JOIN nev ON st.day_n = nev.day_n
    ORDER BY st.day_n
    """,
)
def events_rolling_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_rolling_distinct_hll's portable twin — and the query
    that shows WHY the daily-summary-table pattern wants a portable
    sketch: the trailing-7-day merge is a bucket-wise MAX over integer
    register rows that any engine holding the summary table can run.
    The window merge is expressed as an EQUI-join fan-out (each daily
    register row contributes itself to the 7 observation days it
    covers via an integer sequence explode, then joins the real-day
    list) — no range join, no nested loop; state is #days x 256 rows
    regardless of event volume. Day boundaries use exact integer epoch
    arithmetic (ts_s div 86400, the module's TZ-proof convention).
    Fully oracled on the md5-60bit hash family."""
    e = load_table(spark, sf_dir, "events")
    daily = _daily_user_registers(spark, sf_dir)
    days = daily.select("day_n").distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day_n"), F.col("day_n") + F.lit(ROLLING_DAYS - 1))
        ).alias("obs_day"),
        "bucket",
        "reg",
    )
    merged = (
        contrib.join(F.broadcast(days), contrib["obs_day"] == days["day_n"])
        .groupBy("obs_day", "bucket")
        .agg(F.max("reg").alias("reg"))
        .withColumnRenamed("obs_day", "day_n")
    )
    st = merged.groupBy("day_n").agg(*sketches.hll_portable_stats_cols())
    nev = e.groupBy(F.expr("ts_s div 86400").alias("day_n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    est = F.round(F.expr(sketches.hll_portable_estimate_sql("sreg", "v")), 4)
    return (
        st.join(nev, "day_n")
        .select("day_n", "n_events", est.alias("est_rolling_users"))
        .transform(bounded_sort, "day_n")
    )


@query(
    "events_hll_summary_roundtrip",
    oracle=f"""
    WITH {_DAILY_REGISTERS_SQL},
    weekly AS (
      SELECT day_n // 7 AS week_n, bucket, MAX(reg) AS reg
      FROM daily GROUP BY day_n // 7, bucket
    ),
    st AS (
      SELECT week_n, {sketches.hll_portable_stats_sql()}
      FROM weekly GROUP BY week_n
    ),
    nd AS (
      SELECT day_n // 7 AS week_n, CAST(COUNT(DISTINCT day_n) AS BIGINT) AS n_days
      FROM daily GROUP BY day_n // 7
    )
    SELECT st.week_n, nd.n_days,
           ROUND({sketches.hll_portable_estimate_sql('sreg', 'v')}, 4)
             AS est_weekly_users
    FROM st JOIN nd ON st.week_n = nd.week_n
    ORDER BY st.week_n
    """,
)
def events_hll_summary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED summary-table pattern end to end (S3 x A4): the
    daily register table is written to parquet partitioned by day —
    the layout an incremental pipeline appends one day-partition to
    and a rollup partition-prunes — read back, and rolled up to
    per-epoch-week distinct-user estimates by bucket-wise MAX. The
    oracle recomputes the same weeks straight from events, so the
    hash-match proves the registers survived the disk round trip
    bit-exactly AND that rollup-of-summaries equals
    direct-from-raw (the merge law, this time through a sink/scan).
    Partition-column type inference returns day_n as INT — cast back
    to BIGINT before the week arithmetic so both engines emit the
    same schema."""
    from rdf_mapreduce_joins_spark.plans.formats import _scratch

    daily = _daily_user_registers(spark, sf_dir)
    path = _scratch(sf_dir, "hll_daily_registers")
    daily.write.mode("overwrite").partitionBy("day_n").parquet(path)
    back = spark.read.parquet(path).select(
        F.col("day_n").cast("bigint").alias("day_n"), "bucket", "reg"
    )
    weekly = back.groupBy(
        F.expr("day_n div 7").alias("week_n"), F.col("bucket")
    ).agg(F.max("reg").alias("reg"))
    st = weekly.groupBy("week_n").agg(*sketches.hll_portable_stats_cols())
    nd = back.groupBy(F.expr("day_n div 7").alias("week_n")).agg(
        F.count_distinct("day_n").alias("n_days")
    )
    est = F.round(F.expr(sketches.hll_portable_estimate_sql("sreg", "v")), 4)
    return (
        st.join(nd, "week_n")
        .select("week_n", "n_days", est.alias("est_weekly_users"))
        .transform(bounded_sort, "week_n")
    )


@query("events_rolling_distinct_hll")  # rows-only: sketch estimates
def events_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from PRE-AGGREGATED daily
    sketches: one HLL per day, then a window hll_union_agg over the
    trailing week — the pattern that makes sliding distinct-count
    tractable at 100 TB. Exact rolling COUNT(DISTINCT) must rescan
    every event in every window (7x read amplification, quadratic
    state); this touches each event once at daily-sketch build, and
    the window slides over #days sketch rows of a few KB each.
    Value-tested against the exact rolling distinct in
    tests/test_sketches.py."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(-(ROLLING_DAYS - 1), 0)
    return daily.select(
        "day",
        "n_events",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("bigint")
        .alias("est_rolling_users"),
    ).orderBy("day")
