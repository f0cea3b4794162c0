"""Web-corpus curation queries (SURVEY.md §2.10, round-5 extension —
VERDICT r4 #9): URL canonicalization + URL-level dedup, public-suffix
registered-domain analytics, robots-style path filtering, and template
boilerplate stripping over the ``documents`` table.

These are the web-pipeline stages that run BEFORE text-level dedup in
a crawl-derived training-data pipeline (the CommonCrawl/C4/Gopher
shape): parse WARC segments, collapse URL aliases, group by
registered domain for per-domain quotas, admit documents under a
per-domain token quota, honor robots disallow rules, strip
site-template boilerplate. All six are regex/built-in-only (no UDFs
anywhere) and carry full DuckDB oracles.

The fixture has no URL column, so each query derives a deterministic
messy URL (scheme/WWW case noise, default :443 port, trailing slash,
utm tracking params, fragments) from ``source`` + ``doc_id`` via an
identical expression on both engines — the same adapter pattern as the
supplier tree+ring graph in plans/rdf.py: the thing under test is the
normalization/dedup machinery, not the synthetic column.

Scale posture: every query is one or two aggregations on bounded keys
(canonical URL, registered domain). URL parsing is pure JVM regex in
whole-stage codegen; the robots rule set is a broadcast of a few rows;
boilerplate vocabulary is per-source-bounded and joined on the
(source, bigram) key — never all-pairs, never collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_mapreduce_joins_spark.plans.registry import query
from rdf_mapreduce_joins_spark.sources.tables import load_table, spread

# Tracking parameters stripped by canonicalization (the ad-tech set).
TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid)="

# Mini public-suffix list: multi-label suffixes that are NOT
# registrable domains themselves (the PSL's reason to exist). The
# fixture's TLD mix exercises the longest-suffix-match rule via co.uk.
MULTI_LABEL_SUFFIXES = ("co.uk",)

BOILERPLATE_DF_FRAC = 0.6  # a (source, bigram) in >= 60% of the source's docs

# Deterministic messy-URL recipe (shared Spark/SQL semantics):
#   scheme   https:// (upper-cased for odd ids)
#   host     WWW./www. + source + .example. + tld(doc_id%4: com/org/net/co.uk)
#   port     explicit :443 for ids % 5 == 0 (the https default port)
#   path     /articles/<doc_id%40> (+ trailing slash for ids % 4 == 0)
#   query    utm_source=feed (ids % 2 == 0) & ref=<doc_id%2>
#   fragment #top for ids % 7 == 0
# Canonical form therefore collapses to (source, tld, doc_id%40,
# doc_id%2) — real alias groups at every fixture scale.
_RAW_URL_SQL = """
      CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END ||
      CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END ||
      source || '.example.' ||
      CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                      WHEN 2 THEN 'net' ELSE 'co.uk' END ||
      CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
      '/articles/' || CAST(doc_id % 40 AS VARCHAR) ||
      CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
      '?' ||
      CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed&' ELSE '' END ||
      'ref=' || CAST(doc_id % 2 AS VARCHAR) ||
      CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END
"""


def _raw_url() -> Column:
    """The Spark twin of _RAW_URL_SQL (element-for-element)."""
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("HTTPS://")),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("www.")),
        F.col("source"),
        F.lit(".example."),
        F.when(d % 4 == 0, F.lit("com"))
        .when(d % 4 == 1, F.lit("org"))
        .when(d % 4 == 2, F.lit("net"))
        .otherwise(F.lit("co.uk")),
        F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/articles/"),
        (d % 40).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(d % 2 == 0, F.lit("utm_source=feed&")).otherwise(F.lit("")),
        F.lit("ref="),
        (d % 2).cast("string"),
        F.when(d % 7 == 0, F.lit("#top")).otherwise(F.lit("")),
    )


def _canonical_parts(url: Column) -> dict[str, Column]:
    """URL canonicalization as pure Spark SQL expressions: lowercase
    scheme and host, strip a leading www., strip the https default
    port, strip one trailing slash from a non-root path, drop tracking
    params (keeping the relative order of survivors — RFC 3986 says
    query order is significant), drop the fragment."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host0 = F.lower(F.regexp_extract(url, r"://([^/:?#]+)", 1))
    host = F.regexp_replace(host0, r"^www\.", "")
    port = F.regexp_extract(url, r"^[A-Za-z]+://[^/:?#]+:(\d+)", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "http") & (port == "80"))
    )
    hostport = F.concat(
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1),
        r"(.)/$",
        r"$1",
    )
    q0 = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q0, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    q = F.array_join(kept, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return {"scheme": scheme, "host": host, "path": path, "canonical": canonical}


# The same canonicalization in DuckDB SQL, factored into a parsed-parts
# projection (each regex appears exactly ONCE — ADVICE r5 #4: DuckDB
# does not CSE regex calls across CASE branches, and single-occurrence
# regexes keep the Spark/SQL twin-parity contract auditable) plus an
# assembly expression over the extracted columns.
_URL_PARTS_SQL = """
      lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      regexp_replace(lower(regexp_extract(url, '://([^/:?#]+)', 1)),
                     '^www\\.', '') AS host,
      regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:(\\d+)', 1) AS port,
      regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1),
                     '(.)/$', '\\1') AS path,
      array_to_string(list_filter(
        string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
        p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}')
      ), '&') AS q
""".replace("{TRACKING_RE}", TRACKING_RE)

# Assembly over a CTE carrying the _URL_PARTS_SQL columns.
_CANON_FROM_PARTS_SQL = """
      scheme || '://' || host ||
      CASE WHEN port <> ''
            AND NOT (scheme = 'https' AND port = '443')
            AND NOT (scheme = 'http' AND port = '80')
           THEN ':' || port ELSE '' END ||
      path ||
      CASE WHEN q <> '' THEN '?' || q ELSE '' END
"""

_REGDOM_SQL = """
      CASE WHEN host LIKE '%.co.uk'
           THEN regexp_extract(host, '([^.]+\\.co\\.uk)$', 1)
           ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END
"""


def _registered_domain(host: Column) -> Column:
    """PSL longest-suffix-match registered domain: one more label than
    the matched public suffix. The suffix table is the module constant
    MULTI_LABEL_SUFFIXES + the implicit single-label default."""
    expr = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    for suf in MULTI_LABEL_SUFFIXES:
        esc = suf.replace(".", r"\.")
        expr = F.when(
            host.endswith("." + suf),
            F.regexp_extract(host, rf"([^.]+\.{esc})$", 1),
        ).otherwise(expr)
    return expr


@query(
    "web_url_canonical_dedup",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, ({_RAW_URL_SQL.strip()}) AS url FROM documents
    ),
    parts AS (SELECT doc_id, {_URL_PARTS_SQL.strip()} FROM u),
    c AS (SELECT doc_id, ({_CANON_FROM_PARTS_SQL.strip()}) AS canonical_url
          FROM parts)
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_aliases,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM c GROUP BY canonical_url
    """,
)
def web_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (the first dedup stage of every crawl
    pipeline): canonicalize each document's URL — lowercase scheme and
    host, strip www., drop the https default port, strip the trailing
    slash, drop utm_*/fbclid/gclid tracking params, drop the fragment
    — then collapse alias groups to (canonical, alias count, keeper =
    min doc_id). One groupBy on the canonical key; the parsing is pure
    JVM regex inside whole-stage codegen, so at crawl scale this is a
    single shuffle over (url-hash)-sized rows — text never moves."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = d.select("doc_id", _raw_url().alias("url"))
    c = u.select(
        "doc_id", _canonical_parts(F.col("url"))["canonical"].alias("canonical_url")
    )
    return c.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_aliases"),
        F.min("doc_id").cast("bigint").alias("keep_doc_id"),
    )


@query(
    "web_domain_stats",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, lang, text, ({_RAW_URL_SQL.strip()}) AS url FROM documents
    ),
    h AS (
      SELECT doc_id, lang, text,
             regexp_replace(lower(regexp_extract(url, '://([^/:?#]+)', 1)),
                            '^www\\.', '') AS host
      FROM u
    ),
    r AS (SELECT doc_id, lang, text, host, ({_REGDOM_SQL.strip()}) AS registered_domain FROM h)
    SELECT registered_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM r GROUP BY registered_domain
    """,
)
def web_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain rollup (the per-domain quota/mixture report
    of web-corpus curation): extract the registrable domain with PSL
    longest-suffix-match semantics — 'a.example.co.uk' rolls up to
    'example.co.uk', not 'co.uk' — and aggregate docs, distinct hosts,
    languages, and token volume per domain. The PSL here is a 1-entry
    inline table (co.uk) exercising the same CASE-on-suffix shape a
    full snapshot compiles to; at crawl scale the suffix list is a
    broadcast lookup and this stays one aggregation on the domain key."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "source"
    )
    u = d.withColumn("url", _raw_url())
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("url"), r"://([^/:?#]+)", 1)),
        r"^www\.",
        "",
    )
    r = u.select(
        "doc_id",
        "lang",
        "text",
        host.alias("host"),
    ).withColumn("registered_domain", _registered_domain(F.col("host")))
    return r.groupBy("registered_domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("host").cast("bigint").alias("n_hosts"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias(
            "total_tokens"
        ),
    )


# Robots disallow rules: (registered_domain | '*', path_prefix). Robots
# semantics ARE prefix semantics (RFC 9309 §2.2.2), so startswith is
# the real matcher, not a simplification.
ROBOTS_RULES: tuple[tuple[str, str], ...] = (
    ("example.com", "/articles/1"),
    ("example.org", "/articles/2"),
    ("*", "/articles/39"),
)


@query(
    "web_robots_filter",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, ({_RAW_URL_SQL.strip()}) AS url FROM documents
    ),
    p AS (
      SELECT doc_id,
             regexp_replace(lower(regexp_extract(url, '://([^/:?#]+)', 1)),
                            '^www\\.', '') AS host,
             regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS path
      FROM u
    ),
    r AS (SELECT doc_id, path, ({_REGDOM_SQL.strip()}) AS registered_domain FROM p),
    rules(dom, prefix) AS (VALUES {", ".join(f"('{d}', '{pfx}')" for d, pfx in ROBOTS_RULES)}),
    flagged AS (
      SELECT r.*,
             EXISTS (
               SELECT 1 FROM rules
               WHERE (rules.dom = r.registered_domain OR rules.dom = '*')
                 AND starts_with(r.path, rules.prefix)
             ) AS blocked
      FROM r
    )
    SELECT registered_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           CAST(SUM(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
    FROM flagged GROUP BY registered_domain
    """,
)
def web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-style disallow filtering (RFC 9309 prefix semantics):
    per-domain and wildcard path-prefix rules mark documents blocked;
    report per registered domain how many docs the crawl keeps.

    The rule set is a PLAN-TIME module constant, so rule membership is
    a row-local predicate (round 11, the constant-term DESCRIBE
    lesson): ``blocked = OR over rules of (domain match AND path
    prefix)`` — one scan, one aggregation, zero joins, zero shuffles
    of the document stream before the final per-domain rollup. The
    prior shape treated the constants as data (broadcast equi-joins
    per rule bucket + a doc_id distinct + a left join back onto the
    stream), which cost 3 extra exchanges and a second pass over the
    document scan for the same EXISTS semantics — right when rules
    arrive as a table at runtime, wasted when they are literals. A
    robots set large enough to need the join form again (millions of
    rules) would also need the domain-keyed join the old form
    bucketed by prefix LENGTH; this fixture's handful of module
    literals is the isin/constant-fold regime."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = d.withColumn("url", _raw_url())
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("url"), r"://([^/:?#]+)", 1)),
        r"^www\.",
        "",
    )
    path = F.regexp_extract(F.col("url"), r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    r = u.select(
        "doc_id",
        path.alias("path"),
        _registered_domain(host).alias("registered_domain"),
    )
    rule_conds = [
        (
            F.col("path").startswith(F.lit(p))
            if dom == "*"
            else (F.col("registered_domain") == F.lit(dom))
            & F.col("path").startswith(F.lit(p))
        )
        for dom, p in ROBOTS_RULES
    ]
    # Seed with False (ADVICE r11): an emptied ROBOTS_RULES must mean
    # "nothing blocked", as the old join-based form degraded, not an
    # IndexError.
    blocked_col = F.lit(False)
    for c in rule_conds:
        blocked_col = blocked_col | c
    flagged = r.withColumn("blocked", blocked_col)
    return flagged.groupBy("registered_domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("blocked"), 1).otherwise(0)).cast("bigint").alias(
            "n_blocked"
        ),
        F.sum(F.when(F.col("blocked"), 0).otherwise(1)).cast("bigint").alias(
            "n_kept"
        ),
    )


# The injected per-source site template (the fixture corpus has no
# natural boilerplate — near-uniform bigram df, max ~28% per source —
# so the template provides REAL positives for the detector while the
# fixture text provides real negatives; same adapter rationale as the
# URL column).
_TEMPLATE_SQL = "'subscribe to ' || source || ' newsletter follow ' || source || ' updates'"


@query(
    "web_boilerplate_strip",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             string_split(({_TEMPLATE_SQL}) || ' ' || text, ' ') AS w
      FROM documents
    ),
    postok AS (
      SELECT doc_id, source, unnest(w) AS w1, generate_subscripts(w, 1) AS pos
      FROM t
    ),
    nbr AS (
      SELECT doc_id, source, pos, w1,
             lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM postok
    ),
    bi AS (
      SELECT DISTINCT doc_id, source, w1 || ' ' || w2 AS bg
      FROM nbr WHERE w2 IS NOT NULL
    ),
    sdocs AS (SELECT source, COUNT(DISTINCT doc_id) AS nd FROM t GROUP BY source),
    bp AS (
      SELECT b.source, b.bg
      FROM (SELECT source, bg, COUNT(*) AS df FROM bi GROUP BY source, bg) b
      JOIN sdocs s ON b.source = s.source
      WHERE b.df >= {BOILERPLATE_DF_FRAC} * s.nd
    ),
    endbg AS (
      SELECT doc_id, source, pos + 1 AS pos, w1 || ' ' || w2 AS bg
      FROM nbr WHERE w2 IS NOT NULL
    ),
    marked AS (
      SELECT n.doc_id, n.pos, n.w1,
             (bs.bg IS NOT NULL OR be.bg IS NOT NULL) AS covered
      FROM nbr n
      LEFT JOIN bp bs
        ON bs.source = n.source AND n.w2 IS NOT NULL
       AND bs.bg = n.w1 || ' ' || n.w2
      LEFT JOIN (
        SELECT e.doc_id, e.pos, e.bg FROM endbg e
        JOIN bp ON bp.source = e.source AND bp.bg = e.bg
      ) be ON be.doc_id = n.doc_id AND be.pos = n.pos
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN covered THEN NULL ELSE w1 END,
                               ' ' ORDER BY pos), '') AS clean_text
    FROM marked GROUP BY doc_id
    """,
)
def web_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-template boilerplate stripping (the C4/Gopher 'remove the
    nav/footer' stage, corpus-statistical form): a bigram occurring in
    >= 60% of a SOURCE's documents is template text; every token
    position covered by a template bigram is removed and the document
    is re-assembled from the survivors in position order. Detection is
    per-source df aggregation (bounded by source vocabulary), marking
    is an equi-join on (source, bigram) — no pairwise work, no UDFs;
    reassembly is one ordered aggregation per doc. The fixture corpus
    is near-uniform (no natural bigram reaches the threshold), so the
    query injects a deterministic per-source template prefix as real
    positives — fixture tokens are the negatives that must survive."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    template = F.concat(
        F.lit("subscribe to "),
        F.col("source"),
        F.lit(" newsletter follow "),
        F.col("source"),
        F.lit(" updates"),
    )
    # Round 11 (guide §2.4): keep each document as a token ARRAY end to
    # end. Only the distinct (doc, bigram) stream is exploded (to count
    # per-source document frequency); the boilerplate set comes BACK as
    # one array per source via a broadcast join, and marking/reassembly
    # are row-local zips. The old form exploded every token position
    # and paid a window sort, a distinct, a positional self-join, two
    # marking joins, and a collect_list re-assembly — ~6 exchanges of
    # the full token stream — to compute per-position facts that never
    # needed to leave the document.
    t = spread(d, "doc_id").select(
        "doc_id",
        "source",
        F.split(F.concat(template, F.lit(" "), F.col("text")), " ").alias("w"),
    ).filter(F.col("w").isNotNull())
    w = F.col("w")
    m = F.size(w) - 1
    grams = F.zip_with(
        F.slice(w, 1, m),
        F.slice(w, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bi = t.select(
        "doc_id", "source", F.explode(F.array_distinct(grams)).alias("bg")
    )
    sdocs = bi.groupBy("source").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    bp = (
        bi.groupBy("source", "bg")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(sdocs, on="source")
        .filter(F.col("df") >= BOILERPLATE_DF_FRAC * F.col("nd"))
        .select("source", "bg")
    )
    # One boilerplate-bigram array per source. The set is intrinsically
    # bounded: a bigram in >= 60% of a source's docs implies
    # |bpset| <= avg-doc-distinct-bigrams / 0.6, so both the broadcast
    # and the per-gram linear array_contains probe stay small at any
    # corpus size.
    bp_sets = bp.groupBy("source").agg(F.collect_set("bg").alias("bpset"))
    # scov[i]: the bigram STARTING at position i is boilerplate; a
    # token is covered if the bigram starting OR ending (= starting at
    # i-1) there is boilerplate.
    scov = F.transform(
        grams,
        lambda g: F.coalesce(F.array_contains(F.col("bpset"), g), F.lit(False)),
    )
    cov = F.zip_with(
        F.concat(scov, F.array(F.lit(False))),
        F.concat(F.array(F.lit(False)), scov),
        lambda a, b: a | b,
    )
    return t.join(F.broadcast(bp_sets), on="source", how="left").select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_tokens"),
        F.size(F.filter(cov, lambda x: x)).cast("bigint").alias("n_removed"),
        F.array_join(
            F.zip_with(w, cov, lambda tk, c: F.when(~c, tk)), " "
        ).alias("clean_text"),
    )


# Per-registered-domain token quota (the CommonCrawl "no domain may
# dominate the mixture" admission stage — VERDICT r5 #7a). Sized so
# each of the fixture's 4 registered domains admits some but not all
# of its documents at every sf.
DOMAIN_TOKEN_QUOTA = 3000


@query(
    "web_domain_quota_admission",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, text, ({_RAW_URL_SQL.strip()}) AS url FROM documents
    ),
    h AS (
      SELECT doc_id, text,
             regexp_replace(lower(regexp_extract(url, '://([^/:?#]+)', 1)),
                            '^www\\.', '') AS host
      FROM u
    ),
    r AS (SELECT doc_id, text, ({_REGDOM_SQL.strip()}) AS registered_domain FROM h),
    toks AS (
      SELECT doc_id, registered_domain,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS rk
      FROM r
    ),
    cum AS (
      SELECT doc_id, registered_domain, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY registered_domain ORDER BY rk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT registered_domain, doc_id, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= {DOMAIN_TOKEN_QUOTA}
    """,
)
def web_domain_quota_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota admission (VERDICT r5 #7a: the
    docs_token_budget_sample pattern keyed by the registrable domain):
    per registered domain, admit documents in md5(doc_id)
    pseudo-random order until the cumulative whitespace-token count
    reaches the domain quota — the anti-domination stage of web-corpus
    mixture construction. One window (integer-exact running sum over a
    content-free hash order, so the admitted set is reproducible
    across re-runs and cluster layouts) + one filter; at crawl scale
    this is a single shuffle on the domain key. Greedy boundary
    semantics match docs_token_budget_sample: an overshooting doc is
    dropped but later smaller docs may still fit (cum <= quota, not a
    hard stop)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    u = d.withColumn("url", _raw_url())
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("url"), r"://([^/:?#]+)", 1)),
        r"^www\.",
        "",
    )
    toks = u.select(
        "doc_id",
        _registered_domain(host).alias("registered_domain"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    )
    w = (
        Window.partitionBy("registered_domain")
        .orderBy("rk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= DOMAIN_TOKEN_QUOTA)
        .select("registered_domain", "doc_id", "n_tokens", "cum_tokens")
    )


# WARC-style record parsing (VERDICT r5 #7b: an S-family source twin
# of the N-Triples reader). The fixture has no .warc files, so the
# query SYNTHESIZES bounded WARC segment files from the documents
# table with an identical expression on both engines (the messy-URL
# adapter pattern), then PARSES them back — the thing under test is
# the record splitter + header extractor + length validation, i.e.
# exactly what a WARC reader does to a CommonCrawl segment.
WARC_FILE_BUCKETS = 50


@query(
    "web_warc_records_parse",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source, text, ({_RAW_URL_SQL.strip()}) AS url FROM documents
    ),
    rec AS (
      SELECT doc_id, source, doc_id % {WARC_FILE_BUCKETS} AS bucket,
             'WARC/1.0' || chr(10) ||
             'WARC-Type: response' || chr(10) ||
             'WARC-Record-ID: ' || CAST(doc_id AS VARCHAR) || chr(10) ||
             'WARC-Target-URI: ' || url || chr(10) ||
             'Content-Length: ' ||
               CAST(octet_length(encode(text)) AS VARCHAR) ||
             chr(10) || chr(10) || text || chr(10) AS r
      FROM u
    ),
    files AS (
      SELECT source, bucket, string_agg(r, '' ORDER BY doc_id) AS warc_file
      FROM rec GROUP BY source, bucket
    ),
    pieces AS (
      SELECT unnest(string_split(warc_file, 'WARC/1.0' || chr(10))) AS p
      FROM files
    ),
    parsed AS (
      SELECT CAST(regexp_extract(p, 'WARC-Record-ID: ([0-9]+)', 1) AS BIGINT)
               AS rec_id,
             regexp_extract(p, 'WARC-Target-URI: ([^\n]*)', 1) AS uri,
             CAST(regexp_extract(p, 'Content-Length: ([0-9]+)', 1) AS BIGINT)
               AS content_length,
             regexp_extract(p, '(?s)\n\n(.*)\n$', 1) AS payload
      FROM pieces WHERE p <> ''
    )
    SELECT rec_id, uri, content_length,
           content_length = CAST(octet_length(encode(payload)) AS BIGINT)
             AS length_ok
    FROM parsed
    """,
)
def web_warc_records_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC segment parsing (S family): assemble bounded per-(source,
    bucket) WARC-style segment files (record = version line + headers
    + blank line + payload, RFC-style), then split each segment into
    records, extract the WARC-Record-ID / WARC-Target-URI /
    Content-Length headers, recover the payload, and validate the
    declared length against the actual payload byte count. Both
    halves are pure JVM string/regex built-ins: assembly is one
    ordered per-bucket aggregation (segment size bounded by the
    bucket modulus — the real-world analog of CommonCrawl's ~1 GB
    segment rotation), parsing is split + explode + regexp_extract in
    whole-stage codegen. At crawl scale the parse side reads
    one-segment-per-task exactly like the N-Triples DataSource reads
    its partitioned text."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    u = d.withColumn("url", _raw_url())
    rec = F.concat(
        F.lit("WARC/1.0\n"),
        F.lit("WARC-Type: response\n"),
        F.lit("WARC-Record-ID: "),
        F.col("doc_id").cast("string"),
        F.lit("\nWARC-Target-URI: "),
        F.col("url"),
        F.lit("\nContent-Length: "),
        F.octet_length(F.col("text")).cast("string"),
        F.lit("\n\n"),
        F.col("text"),
        F.lit("\n"),
    )
    files = (
        u.select(
            "source",
            (F.col("doc_id") % WARC_FILE_BUCKETS).alias("bucket"),
            F.struct(F.col("doc_id"), rec.alias("r")).alias("s"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["r"]
                ),
                "",
            ).alias("warc_file")
        )
    )
    pieces = files.select(
        F.explode(F.split(F.col("warc_file"), r"WARC/1\.0\n")).alias("p")
    ).filter(F.col("p") != "")
    payload = F.regexp_extract(F.col("p"), r"(?s)\n\n(.*)\n$", 1)
    return pieces.select(
        F.regexp_extract(F.col("p"), r"WARC-Record-ID: ([0-9]+)", 1)
        .cast("bigint")
        .alias("rec_id"),
        F.regexp_extract(F.col("p"), r"WARC-Target-URI: ([^\n]*)", 1).alias(
            "uri"
        ),
        F.regexp_extract(F.col("p"), r"Content-Length: ([0-9]+)", 1)
        .cast("bigint")
        .alias("content_length"),
        (
            F.regexp_extract(F.col("p"), r"Content-Length: ([0-9]+)", 1)
            .cast("bigint")
            == F.octet_length(payload).cast("bigint")
        ).alias("length_ok"),
    )
