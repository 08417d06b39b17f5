"""Statistical / time-series / graph analytics extensions: exact-moment
correlation and regression, Markov transition mining, equi-width
histograms, calendar gap detection, sweep-line concurrency, rational
TF-IDF salience, and near-dup-graph degree/triangle analytics.

Determinism strategy (see functions/money.py and the oracle recipes):

* every sum is over exact integers (fixed-point scaled) accumulated as
  DECIMAL(38,0), so results are partition-order independent;
* every *float* formula (correlation, slope, shares) is one shared
  expression string evaluated by BOTH engines over identical double
  operands — IEEE ops on identical inputs are bit-identical;
* every ranked selection carries a unique tiebreaker.

Reference analog: the reference's dashboards/DQ layer computes trend
and distribution stats over gold tables (show_gold_tables.py,
data_quality/*_validation.py); these queries generalize that surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.functions.money import sql_sum, dec_sum
from data_lakehouse_platform_spark.operators import dedup as D
from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import register
from data_lakehouse_platform_spark.queries_llm import (
    _JACCARD_MAX_DF,
    _JACCARD_ORACLE,
    _JACCARD_THRESHOLD,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Pearson correlation + OLS slope from exact integer moments
# ----------------------------------------------------------------------------
# The five moment sums are exact (integer inputs, DECIMAL(38,0)
# accumulation), cast once to DOUBLE; the closed-form formulas below are
# the SAME text in Spark and DuckDB, so every IEEE op matches bitwise.

_CORR_EXPR = (
    "(n * sxy - sx * sy) / "
    "(SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))"
)
_SLOPE_EXPR = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
_INTERCEPT_EXPR = f"(sy - ({_SLOPE_EXPR}) * sx) / n"

_MOMENTS = {
    "n": "CAST(COUNT(*) AS DOUBLE)",
    "sx": "CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE)",
    "sy": "CAST(SUM(CAST(yi AS DECIMAL(38,0))) AS DOUBLE)",
    "sxx": "CAST(SUM(CAST(xi * xi AS DECIMAL(38,0))) AS DOUBLE)",
    "syy": "CAST(SUM(CAST(yi * yi AS DECIMAL(38,0))) AS DOUBLE)",
    "sxy": "CAST(SUM(CAST(xi * yi AS DECIMAL(38,0))) AS DOUBLE)",
}

_CORR_ORACLE = f"""
WITH pts AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity) AS BIGINT)            AS xi,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS yi
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         {", ".join(f"{expr} AS {name}" for name, expr in _MOMENTS.items())}
  FROM pts GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT)  AS n_rows,
       {_CORR_EXPR}       AS corr_qty_price,
       {_SLOPE_EXPR}      AS slope_cents_per_unit
FROM m
"""


@register(
    "corr_qty_price",
    _CORR_ORACLE,
    "Pearson correlation + OLS slope of price-cents on quantity per "
    "return flag, from five exact integer moment sums (DECIMAL "
    "accumulation -> one DOUBLE cast -> shared closed-form expression). "
    "One shuffle, map-side partial aggregation, bit-identical across "
    "any partitioning — the scalable way to do corr/regression on "
    "100 TB without a float-sum order dependence.",
)
def corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag",
        "CAST(FLOOR(l_quantity) AS BIGINT) AS xi",
        "CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS yi",
    )
    m = pts.groupBy("l_returnflag").agg(
        *[F.expr(expr).alias(name) for name, expr in _MOMENTS.items()]
    )
    return m.selectExpr(
        "l_returnflag",
        "CAST(n AS BIGINT) AS n_rows",
        f"{_CORR_EXPR} AS corr_qty_price",
        f"{_SLOPE_EXPR} AS slope_cents_per_unit",
    )


# ----------------------------------------------------------------------------
# OLS daily trend per event type (two-level aggregation)
# ----------------------------------------------------------------------------

_TREND_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT event_type,
         CAST(date_diff('day', TIMESTAMP '2024-01-01', day) AS BIGINT) AS xi,
         CAST(y AS BIGINT) AS yi
  FROM daily
),
m AS (
  SELECT event_type,
         {", ".join(f"{expr} AS {name}" for name, expr in _MOMENTS.items())}
  FROM pts GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT)  AS n_days,
       {_SLOPE_EXPR}      AS slope_per_day,
       {_INTERCEPT_EXPR}  AS intercept_count
FROM m
"""


@register(
    "ols_daily_trend",
    _TREND_ORACLE,
    "Per-event-type linear trend of daily volume: first aggregate to "
    "(type, day, count) — tiny — then exact integer moments and the "
    "shared closed-form slope/intercept. Trend detection over row "
    "counts is the reference's volume-DQ check generalized to a "
    "regression (data_quality/*_validation.py); two cheap shuffles.",
)
def ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("y"))
    )
    pts = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("2024-01-01")).cast("bigint").alias("xi"),
        F.col("y").cast("bigint").alias("yi"),
    )
    m = pts.groupBy("event_type").agg(
        *[F.expr(expr).alias(name) for name, expr in _MOMENTS.items()]
    )
    return m.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_days",
        f"{_SLOPE_EXPR} AS slope_per_day",
        f"{_INTERCEPT_EXPR} AS intercept_count",
    )


# ----------------------------------------------------------------------------
# Markov transition mining (event -> next event per user)
# ----------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT event_type AS src_event,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS dst_event
  FROM events
)
SELECT src_event, dst_event, COUNT(*) AS n_transitions
FROM seq WHERE dst_event IS NOT NULL
GROUP BY 1, 2
ORDER BY n_transitions DESC, src_event, dst_event
LIMIT 20
"""


@register(
    "event_transitions",
    _TRANSITIONS_ORACLE,
    "First-order Markov transition counts: LEAD over (user, ts, "
    "event_id-tiebroken) order, then a grouped count and top-20. One "
    "shuffle on user_id for the window (per-user sequences, never a "
    "global sort), one tiny agg — the path-analysis primitive of "
    "product analytics; realtime analog: the reference's consumer "
    "state machine (orders_consumer.py) tracks exactly these steps.",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("src_event"),
            F.lead("event_type").over(w).alias("dst_event"),
        )
        .filter(F.col("dst_event").isNotNull())
    )
    return (
        seq.groupBy("src_event", "dst_event")
        .agg(F.count("*").alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), "src_event", "dst_event")
        .limit(20)
    )


# ----------------------------------------------------------------------------
# Equi-width histogram (distribution profiling)
# ----------------------------------------------------------------------------

_HIST_WIDTH = 25_000
_HIST_MAX_BUCKET = 19
_HIST_BUCKET_EXPR = (
    f"LEAST({_HIST_MAX_BUCKET}, "
    f"CAST(FLOOR(o_totalprice / {_HIST_WIDTH}.0) AS INT))"
)
_HIST_SHARE_EXPR = (
    "CAST(n_orders AS DOUBLE) / CAST(SUM(n_orders) OVER () AS DOUBLE)"
)

_HIST_ORACLE = f"""
WITH b AS (
  SELECT {_HIST_BUCKET_EXPR} AS bucket,
         COUNT(*) AS n_orders,
         {sql_sum('o_totalprice')} AS sum_totalprice
  FROM orders GROUP BY 1
)
SELECT bucket,
       bucket * {_HIST_WIDTH} AS bucket_lo,
       CAST(n_orders AS BIGINT) AS n_orders,
       sum_totalprice,
       {_HIST_SHARE_EXPR} AS share
FROM b
"""


@register(
    "histogram_totalprice",
    _HIST_ORACLE,
    "Equi-width value histogram of order totals (fixed 25k buckets, "
    "top-clamped): one grouped pass with exact decimal sums, then a "
    "share ratio via a window over the ~20 bucket rows. The "
    "distribution profile a DQ/monitoring layer renders; bucketing is "
    "a per-row expression so the scan stays one pass at any scale.",
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.expr(_HIST_BUCKET_EXPR).alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice", "sum_totalprice"),
        )
    )
    return b.selectExpr(
        "bucket",
        f"bucket * {_HIST_WIDTH} AS bucket_lo",
        "CAST(n_orders AS BIGINT) AS n_orders",
        "sum_totalprice",
        f"{_HIST_SHARE_EXPR} AS share",
    )


# ----------------------------------------------------------------------------
# Calendar gap detection per user (grid anti-join)
# ----------------------------------------------------------------------------

_GAPS_ORACLE = """
WITH present AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1, COUNT(*) AS active_days
  FROM present GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM bounds
),
missing AS (
  SELECT g.user_id, g.day
  FROM grid g LEFT JOIN present p ON g.user_id = p.user_id AND g.day = p.day
  WHERE p.day IS NULL
),
agg AS (
  SELECT user_id, COUNT(*) AS missing_days,
         MIN(day) AS first_missing, MAX(day) AS last_missing
  FROM missing GROUP BY user_id
)
SELECT b.user_id,
       CAST(date_diff('day', b.d0, b.d1) + 1 AS BIGINT) AS span_days,
       CAST(b.active_days AS BIGINT) AS active_days,
       CAST(COALESCE(a.missing_days, 0) AS BIGINT) AS missing_days,
       a.first_missing, a.last_missing
FROM bounds b LEFT JOIN agg a USING (user_id)
ORDER BY missing_days DESC, user_id
LIMIT 20
"""


@register(
    "user_activity_gaps",
    _GAPS_ORACLE,
    "Per-user calendar gap detection: daily grid over each user's "
    "observed span (sequence+explode, rows ~ span never stored), "
    "anti-joined against active days -> count + first/last missing "
    "day, top-20 gappiest users. Grid and present co-partition on "
    "user_id so the join is local after one shuffle; the silence-"
    "detection check monitoring pipelines run on feed liveness.",
)
def user_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    present = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    bounds = present.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.count("*").alias("active_days"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    missing = grid.join(present, ["user_id", "day"], "left_anti")
    agg = missing.groupBy("user_id").agg(
        F.count("*").alias("missing_days"),
        F.min("day").alias("first_missing"),
        F.max("day").alias("last_missing"),
    )
    return (
        bounds.join(agg, "user_id", "left")
        .select(
            "user_id",
            (F.datediff(F.col("d1"), F.col("d0")) + 1).cast("bigint").alias("span_days"),
            F.col("active_days").cast("bigint").alias("active_days"),
            F.coalesce(F.col("missing_days"), F.lit(0)).cast("bigint").alias("missing_days"),
            "first_missing",
            "last_missing",
        )
        .orderBy(F.desc("missing_days"), "user_id")
        .limit(20)
    )


# ----------------------------------------------------------------------------
# Sweep-line peak concurrency per day
# ----------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
WITH sess AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         MIN(ts) AS t0, MAX(ts) AS t1
  FROM events GROUP BY 1, 2
),
deltas AS (
  SELECT day, t0 AS t, 1 AS delta, user_id FROM sess
  UNION ALL
  SELECT day, t1 AS t, -1 AS delta, user_id FROM sess
),
swept AS (
  SELECT day,
         SUM(delta) OVER (
           PARTITION BY day
           ORDER BY t, delta DESC, user_id
           ROWS UNBOUNDED PRECEDING
         ) AS live,
         delta
  FROM deltas
)
SELECT day,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(MAX(live) AS BIGINT) AS peak_live
FROM swept GROUP BY day
"""


@register(
    "peak_concurrency",
    _CONCURRENCY_ORACLE,
    "Sweep-line peak concurrency: per user-day sessions become "
    "(+1 at start, -1 at end) deltas; a running sum PARTITIONED BY "
    "day (sessions never cross days, so no global sort — the window "
    "shuffles on day only) gives live counts; MAX per day is the "
    "peak. Ties fully ordered by (t, delta DESC, user) so starts "
    "count before ends at the same instant. The Gantt/occupancy "
    "aggregate (max concurrent users, rooms, connections) done "
    "without an O(n^2) interval self-join.",
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    deltas = sess.select(
        "day", F.col("t0").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        sess.select(
            "day", F.col("t1").alias("t"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t"), F.col("delta").desc(), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = deltas.select("day", "delta", F.sum("delta").over(w).alias("live"))
    return swept.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sessions"),
        F.max("live").cast("bigint").alias("peak_live"),
    )


# ----------------------------------------------------------------------------
# TF-IDF term salience (rational idf — no transcendental log)
# ----------------------------------------------------------------------------
# idf is the exact rational N/df scaled by 1e6 and floored, so ranking
# needs no ln() (libm results are not guaranteed identical across
# engines); tf * 1e6 * N stays under 2^53 so the double math is exact
# until the single floor.

_SALIENCE_EXPR = "CAST(FLOOR(CAST(tf AS DOUBLE) * 1000000 * n_docs / df) AS BIGINT)"

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(
    string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')
  ) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE length(term) >= 3 GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df, {_SALIENCE_EXPR} AS salience
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY salience DESC, term
  ) AS rnk
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       salience, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
"""


@register(
    "tfidf_top_terms",
    _TFIDF_ORACLE,
    "Top-3 salient terms per document by TF-IDF with a rational idf "
    "(tf * 1e6 * N / df, floored): same ranking signal, no ln() so "
    "both engines agree bitwise. Tokenize/count is map-local; df is "
    "one term-keyed shuffle; N joins in as a broadcast scalar. The "
    "keyword-extraction pass of a corpus pipeline — all JVM "
    "expressions, no Python in the hot path.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")),
                " ",
            )
        ).alias("term"),
    )
    tf = (
        toks.filter(F.length("term") >= 3)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .selectExpr("doc_id", "term", "tf", "df", f"{_SALIENCE_EXPR} AS salience")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("salience"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "salience",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ----------------------------------------------------------------------------
# Near-dup graph analytics: degree distribution + triangle census
# ----------------------------------------------------------------------------


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph edges (doc_a < doc_b) = exact-Jaccard pairs, the
    same operator behind dedup_ngram_jaccard."""
    sh = T.explode_shingles(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)
    return D.jaccard_pairs(
        sh, threshold=_JACCARD_THRESHOLD, max_df=_JACCARD_MAX_DF
    ).select("doc_a", "doc_b")


_DEGREE_ORACLE = f"""
WITH pairs AS ({_JACCARD_ORACLE}),
nodes AS (
  SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b FROM pairs
),
deg AS (SELECT node, COUNT(*) AS degree FROM nodes GROUP BY node)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


@register(
    "graph_degree_hist",
    _DEGREE_ORACLE,
    "Degree distribution of the near-dup similarity graph: edges from "
    "the Jaccard pair operator, two tiny grouped counts on top. The "
    "shape diagnostic for dedup health — a fat high-degree tail means "
    "boilerplate crowds the graph (and predicts LSH hot buckets). "
    "Edge generation dominates; the histogram adds no extra scan of "
    "the corpus.",
)
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    # Both endpoint projections consume the edge list; persist it so
    # the shingle+Jaccard pipeline runs once, not twice.
    e = _edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    nodes = e.select(F.col("doc_a").alias("node")).unionAll(
        e.select(F.col("doc_b").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_nodes"))


_TRIANGLES_ORACLE = f"""
WITH pairs AS ({_JACCARD_ORACLE}),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e1.doc_b = e2.doc_a
  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles,
  (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) FROM (
     SELECT a AS x FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  )) AS n_tri_nodes
"""


@register(
    "graph_triangles",
    _TRIANGLES_ORACLE,
    "Triangle census of the near-dup graph (a<b<c canonical order, so "
    "each triangle counts once): two hash joins over the edge list — "
    "never the corpus — plus a distinct over triangle corners. High "
    "triangle density inside components justifies cluster-level "
    "dedup (dedup_cluster) over pairwise. At scale, persist the edge "
    "list first; the joins key on node ids so they co-partition.",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    # The edge list is consumed by all three legs of the triangle join
    # and the triangle set by the count AND the three corner unions —
    # without materializing them, the full shingle+Jaccard pipeline
    # re-runs once per consumer. Edges/triangles are the small derived
    # artifacts here; the corpus is what must be scanned once.
    e = _edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e1.doc_b").alias("b"),
            F.col("e2.doc_b").alias("c"),
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_tri = tri.agg(F.count("*").cast("bigint").alias("n_triangles"))
    corners = (
        tri.select(F.col("a").alias("x"))
        .unionAll(tri.select(F.col("b").alias("x")))
        .unionAll(tri.select(F.col("c").alias("x")))
    )
    n_nodes = corners.agg(F.countDistinct("x").cast("bigint").alias("n_tri_nodes"))
    return n_tri.crossJoin(n_nodes)


# ----------------------------------------------------------------------------
# Containment dedup (subset-duplication gate)
# ----------------------------------------------------------------------------

_CONTAINMENT_THRESHOLD = 0.6

_CONTAINMENT_ORACLE = f"""
WITH {T.sql_shingles_cte(3)},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
filtered AS (
  SELECT s.doc_id, s.shingle FROM shingles s
  JOIN dfreq USING (shingle) WHERE df <= {_JACCARD_MAX_DF}
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM filtered a JOIN filtered b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= {_CONTAINMENT_THRESHOLD}
"""


@register(
    "dedup_containment",
    _CONTAINMENT_ORACLE,
    "Subset-duplication pairs by shingle containment (|A∩B| / "
    "min(|A|,|B|) >= 0.6): same capped shared-shingle candidate join "
    "as Jaccard, different score — catches a short doc quoted whole "
    "inside a longer one, which Jaccard misses because the union is "
    "dominated by the long doc. The excerpt/quote gate of corpus "
    "dedup pipelines.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = T.explode_shingles(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)
    return D.containment_pairs(
        sh, threshold=_CONTAINMENT_THRESHOLD, max_df=_JACCARD_MAX_DF
    )


# ----------------------------------------------------------------------------
# Distribution-position windows: PERCENT_RANK + CUME_DIST
# ----------------------------------------------------------------------------

_PCTRANK_ORACLE = f"""
WITH spend AS (
  SELECT c_custkey, c_nationkey,
         {sql_sum('o_totalprice')} AS total_spend,
         COUNT(*) AS n_orders
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_nationkey
)
SELECT c_custkey, c_nationkey, total_spend,
       CAST(n_orders AS BIGINT) AS n_orders,
       PERCENT_RANK() OVER (
         PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey
       ) AS spend_pct_rank,
       CUME_DIST() OVER (
         PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey
       ) AS spend_cume_dist
FROM spend
"""


@register(
    "percent_rank_spend",
    _PCTRANK_ORACLE,
    "Relative distribution position per nation: exact decimal spend "
    "per customer, then PERCENT_RANK + CUME_DIST windows (unique "
    "custkey tiebreak makes both rational counts — deterministic). "
    "One join shuffle + one window shuffle; the percentile-position "
    "signal behind tiering (the reference's diamond-tier eligibility "
    "check, check_and_recommend_consumer.py:47).",
)
def percent_rank_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            dec_sum("o_totalprice", "total_spend"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("total_spend"), F.col("c_custkey")
    )
    return spend.select(
        "c_custkey",
        "c_nationkey",
        "total_spend",
        "n_orders",
        F.percent_rank().over(w).alias("spend_pct_rank"),
        F.cume_dist().over(w).alias("spend_cume_dist"),
    )


# ----------------------------------------------------------------------------
# Forward as-of join with tolerance (view -> next purchase within 1h)
# ----------------------------------------------------------------------------

_ASOF_FWD_TOL_US = 3_600_000_000  # 1 hour in microseconds

_ASOF_FWD_ORACLE = f"""
WITH purch AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
views AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
)
SELECT v.event_id, v.user_id, v.ts,
  CASE WHEN p.ts IS NOT NULL
            AND epoch_us(p.ts) - epoch_us(v.ts) <= {_ASOF_FWD_TOL_US}
       THEN p.purchase_value END AS next_purchase_value,
  CASE WHEN p.ts IS NOT NULL
            AND epoch_us(p.ts) - epoch_us(v.ts) <= {_ASOF_FWD_TOL_US}
       THEN p.ts END AS next_purchase_ts
FROM views v
ASOF LEFT JOIN purch p
  ON v.user_id = p.user_id AND v.ts <= p.ts
"""


@register(
    "asof_forward_tolerance",
    _ASOF_FWD_ORACLE,
    "Forward as-of join with a 1-hour tolerance: each view gets the "
    "EARLIEST following purchase per user, nulled when it lands more "
    "than an hour later (pandas merge_asof forward semantics). Same "
    "union-sort operator as the backward as-of — one shuffle, no "
    "range blowup — with a reversed sort and an exact integer-micros "
    "tolerance gate (operators/asof.py). Attribution-window joins in "
    "one pass.",
)
def asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        views,
        purch,
        on="ts",
        by="user_id",
        value_cols=["purchase_value"],
        direction="forward",
        tolerance=_ASOF_FWD_TOL_US,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("purchase_value_right").alias("next_purchase_value"),
        F.col("ts_right").alias("next_purchase_ts"),
    )


# ----------------------------------------------------------------------------
# Embedding int8 quantization (vector compression audit)
# ----------------------------------------------------------------------------
# Per-row only — no cross-row float sums — so every value is a chain of
# identical IEEE ops in both engines; the reconstruction error uses the
# same fold as the verified-bit-identical dot product.

_QUANT_ORACLE = """
WITH q AS (
  SELECT vec_id, label,
    CAST(list_aggregate(
      list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'
    ) AS DOUBLE) AS q_scale,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
d AS (
  SELECT vec_id, label, q_scale,
    list_transform(
      v, x -> x - CAST(FLOOR(x * 127 / q_scale) AS BIGINT) * q_scale / 127
    ) AS errv
  FROM q WHERE q_scale > 0
)
SELECT vec_id, label, q_scale,
       list_dot_product(errv, errv) AS sq_err
FROM d
"""


@register(
    "embed_quantize_int8",
    _QUANT_ORACLE,
    "Symmetric int8 vector quantization audit: per-vector max-abs "
    "scale, floor-quantize each component to [-127,127], and report "
    "the exact reconstruction squared error (same fold as the "
    "bit-identical dot product). Entirely per-row map work — scales "
    "embarrassingly — and the 4x-compression/quality trade-off check "
    "run before shipping quantized vectors to an ANN index.",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.vectors import dot

    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    q_scale = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    ).cast("double")
    q = emb.select("vec_id", "label", q_scale.alias("q_scale"), v.alias("v"))
    errv = F.transform(
        F.col("v"),
        lambda x: x
        - F.floor(x * 127 / F.col("q_scale")).cast("bigint")
        * F.col("q_scale")
        / 127,
    )
    d = q.filter(F.col("q_scale") > 0).select(
        "vec_id", "label", "q_scale", errv.alias("errv")
    )
    return d.select(
        "vec_id", "label", "q_scale", dot("errv", "errv").alias("sq_err")
    )


# ----------------------------------------------------------------------------
# Exact embedding covariance matrix (feature-statistics at scale)
# ----------------------------------------------------------------------------

_EMB_DIM = 64
_COV_EXPR = "(sxy - sx * sy / n) / n / 1000000000000.0"

_COV_ORACLE = f"""
WITH pts AS (
  SELECT i.range AS i, j.range AS j,
         CAST(FLOOR(CAST(embedding[i.range + 1] AS DOUBLE) * 1000000) AS BIGINT) AS xi,
         CAST(FLOOR(CAST(embedding[j.range + 1] AS DOUBLE) * 1000000) AS BIGINT) AS yi
  FROM embeddings, range({_EMB_DIM}) i, range({_EMB_DIM}) j
),
m AS (
  SELECT i, j,
         {_MOMENTS['n']} AS n, {_MOMENTS['sx']} AS sx,
         {_MOMENTS['sy']} AS sy, {_MOMENTS['sxy']} AS sxy
  FROM pts GROUP BY i, j
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(n AS BIGINT) AS n_vecs,
       {_COV_EXPR} AS cov
FROM m
"""


@register(
    "embedding_covariance",
    _COV_ORACLE,
    "Exact 64x64 feature covariance of the embedding table: each "
    "vector contributes its outer product via a double posexplode "
    "(d^2 narrow rows per vector, the standard cost of covariance), "
    "fixed-point moment sums make the result partition-order "
    "independent, and one shared closed-form expression rescales. "
    "Map-side partial aggregation collapses to d^2=4096 groups before "
    "the only shuffle — the input to PCA/whitening/feature-pruning "
    "decisions over any corpus size.",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e1 = emb.select(
        "vec_id", "embedding", F.posexplode("embedding").alias("i", "xi")
    )
    e2 = e1.select("vec_id", "i", "xi", F.posexplode("embedding").alias("j", "xj"))
    pts = e2.selectExpr(
        "i",
        "j",
        "CAST(FLOOR(CAST(xi AS DOUBLE) * 1000000) AS BIGINT) AS xi",
        "CAST(FLOOR(CAST(xj AS DOUBLE) * 1000000) AS BIGINT) AS yi",
    )
    m = pts.groupBy("i", "j").agg(
        F.expr(_MOMENTS["n"]).alias("n"),
        F.expr(_MOMENTS["sx"]).alias("sx"),
        F.expr(_MOMENTS["sy"]).alias("sy"),
        F.expr(_MOMENTS["sxy"]).alias("sxy"),
    )
    return m.selectExpr(
        "CAST(i AS INT) AS i",
        "CAST(j AS INT) AS j",
        "CAST(n AS BIGINT) AS n_vecs",
        f"{_COV_EXPR} AS cov",
    )


# ----------------------------------------------------------------------------
# PCA top component by fixed-point power iteration
# ----------------------------------------------------------------------------
# All-integer power iteration on the (unnormalized) covariance
# numerator matrix N = n*Sxy - Sx*Sy: two matvecs with an exact signed
# floor-division downscale between them, final max-abs normalization as
# one double divide. Every intermediate is an exact integer (Spark
# DECIMAL(38,0) / DuckDB HUGEINT), so the result is bit-identical
# across engines AND across any partitioning — the same discipline as
# graph_pagerank / kmeans_cells. The signed floor-div
# (a - ((a % B) + B) % B) / B  is exact in both engines (verified on
# ±1e21 operands); magnitudes stay under 1e31 << the 38-digit ceiling.

_PR_DOWNSCALE = 10**12
# Final downscale before the double divide: beyond-int64 exact integers
# cast to DOUBLE with engine-specific rounding (DuckDB's HUGEINT→DOUBLE
# double-rounds through 64-bit halves; Spark's BigDecimal cast rounds
# once) — so bring values into int64 range FIRST, where both casts are
# single correctly-rounded ops.
_PR_FINAL = 10**13

_NIJ_EXPR_SPARK = (
    "CAST(COUNT(*) AS DECIMAL(38,0)) * SUM(CAST(xi * yi AS DECIMAL(38,0))) "
    "- SUM(CAST(xi AS DECIMAL(38,0))) * SUM(CAST(yi AS DECIMAL(38,0)))"
)
_NIJ_EXPR_DUCK = (
    "CAST(COUNT(*) AS HUGEINT) * SUM(CAST(xi * yi AS HUGEINT)) "
    "- SUM(CAST(xi AS HUGEINT)) * SUM(CAST(yi AS HUGEINT))"
)

_PCA_ORACLE = f"""
WITH pts AS (
  SELECT vec_id, i.range AS i, j.range AS j,
         CAST(FLOOR(CAST(embedding[i.range + 1] AS DOUBLE) * 1000000) AS BIGINT) AS xi,
         CAST(FLOOR(CAST(embedding[j.range + 1] AS DOUBLE) * 1000000) AS BIGINT) AS yi
  FROM embeddings, range({_EMB_DIM}) i, range({_EMB_DIM}) j
),
mom AS (
  SELECT i, j, {_NIJ_EXPR_DUCK} AS nij
  FROM pts GROUP BY i, j
),
v1 AS (SELECT i, SUM(nij) AS v FROM mom GROUP BY i),
w1 AS (
  SELECT i AS j,
         (v - (((v % {_PR_DOWNSCALE}) + {_PR_DOWNSCALE}) % {_PR_DOWNSCALE}))
           // {_PR_DOWNSCALE} AS w
  FROM v1
),
v2 AS (
  SELECT m.i, SUM(m.nij * w1.w) AS v2
  FROM mom m JOIN w1 ON m.j = w1.j
  GROUP BY m.i
),
v2s AS (
  SELECT i,
         CAST((v2 - (((v2 % {_PR_FINAL}) + {_PR_FINAL}) % {_PR_FINAL}))
           // {_PR_FINAL} AS BIGINT) AS vs
  FROM v2
),
mx AS (SELECT MAX(ABS(vs)) AS mx FROM v2s)
SELECT CAST(i AS INT) AS i,
       CAST(vs AS DOUBLE) / CAST(mx AS DOUBLE) AS loading
FROM v2s, mx
"""


@register(
    "pca_power_iteration",
    _PCA_ORACLE,
    "Top principal direction of the embedding covariance by two "
    "power-iteration matvecs, entirely in exact integer arithmetic: "
    "covariance numerator matrix from fixed-point moments, signed "
    "floor-div downscale between rounds, one final double divide by "
    "the max-abs component (order-free MAX). d x d matrix rows — "
    "never the corpus — feed the matvec joins; the corpus is touched "
    "once by the moment pass. Deterministic at any partitioning, so "
    "the 'dominant variance direction' a curation pipeline uses for "
    "whitening/outlier gating is reproducible run to run.",
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e1 = emb.select(
        "vec_id", "embedding", F.posexplode("embedding").alias("i", "xi")
    )
    e2 = e1.select("vec_id", "i", "xi", F.posexplode("embedding").alias("j", "xj"))
    pts = e2.selectExpr(
        "i",
        "j",
        "CAST(FLOOR(CAST(xi AS DOUBLE) * 1000000) AS BIGINT) AS xi",
        "CAST(FLOOR(CAST(xj AS DOUBLE) * 1000000) AS BIGINT) AS yi",
    )
    mom = pts.groupBy("i", "j").agg(F.expr(_NIJ_EXPR_SPARK).alias("nij"))
    v1 = mom.groupBy("i").agg(F.sum("nij").alias("v"))
    B = _PR_DOWNSCALE
    w1 = v1.selectExpr(
        "i AS j",
        f"CAST((v - (((v % {B}) + {B}) % {B})) / {B} AS DECIMAL(38,0)) AS w",
    )
    v2 = (
        mom.join(F.broadcast(w1), "j")
        .groupBy("i")
        .agg(F.sum(F.expr("nij * w")).alias("v2"))
    )
    C = _PR_FINAL
    v2s = v2.selectExpr(
        "i",
        f"CAST(CAST((v2 - (((v2 % {C}) + {C}) % {C})) / {C} AS DECIMAL(38,0)) AS BIGINT) AS vs",
    )
    mx = v2s.agg(F.max(F.abs(F.col("vs"))).alias("mx"))
    return v2s.crossJoin(F.broadcast(mx)).selectExpr(
        "CAST(i AS INT) AS i",
        "CAST(vs AS DOUBLE) / CAST(mx AS DOUBLE) AS loading",
    )


# ----------------------------------------------------------------------------
# Day-of-week seasonality profile
# ----------------------------------------------------------------------------

_SEASONALITY_EXPR = (
    "CAST(sum_events AS DOUBLE) * CAST(n_all AS DOUBLE) "
    "/ (CAST(n_days AS DOUBLE) * CAST(sum_all AS DOUBLE))"
)

_SEASONALITY_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
by_dow AS (
  SELECT event_type, isodow(day) AS dow,
         COUNT(*) AS n_days, SUM(y) AS sum_events
  FROM daily GROUP BY 1, 2
),
tot AS (
  SELECT *,
         SUM(n_days) OVER (PARTITION BY event_type) AS n_all,
         SUM(sum_events) OVER (PARTITION BY event_type) AS sum_all
  FROM by_dow
)
SELECT event_type, CAST(dow AS INT) AS dow,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(sum_events AS BIGINT) AS sum_events,
       {_SEASONALITY_EXPR} AS seasonality
FROM tot
"""


@register(
    "weekday_seasonality",
    _SEASONALITY_ORACLE,
    "Day-of-week seasonality index per event type: mean daily volume "
    "on each ISO weekday divided by the type's overall daily mean, "
    "computed as one exact integer ratio (counts only — no float "
    "sums). Two tiny aggregations over the pre-collapsed daily "
    "table; the seasonal-baseline input for anomaly thresholds "
    "(ratio > 1 = structurally busy weekday, not an incident).",
)
def weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("y"))
    )
    by_dow = daily.groupBy(
        "event_type", (F.weekday("day") + 1).alias("dow")
    ).agg(F.count("*").alias("n_days"), F.sum("y").alias("sum_events"))
    w = Window.partitionBy("event_type")
    tot = by_dow.select(
        "*",
        F.sum("n_days").over(w).alias("n_all"),
        F.sum("sum_events").over(w).alias("sum_all"),
    )
    return tot.selectExpr(
        "event_type",
        "CAST(dow AS INT) AS dow",
        "CAST(n_days AS BIGINT) AS n_days",
        "CAST(sum_events AS BIGINT) AS sum_events",
        f"{_SEASONALITY_EXPR} AS seasonality",
    )


# ----------------------------------------------------------------------------
# Referential-integrity DQ sweep (orphan foreign keys)
# ----------------------------------------------------------------------------

_REFINT_ORACLE = """
SELECT 'lineitem->orders' AS fk,
       (SELECT COUNT(*) FROM lineitem) AS n_rows,
       (SELECT COUNT(*) FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL)
UNION ALL
SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        LEFT JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_partkey IS NULL)
"""


@register(
    "dq_referential",
    _REFINT_ORACLE,
    "Referential-integrity sweep: orphan-count per declared foreign "
    "key (fact -> dim anti joins; dims broadcast so each check is one "
    "scan of the fact, no shuffle). The FK half of the reference's DQ "
    "validation layer (bronze_validation.py checks nulls/uniqueness; "
    "orphans are the missing third check before a star-schema build "
    "silently drops rows on its inner joins).",
)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    def check(
        fk: str,
        fact: DataFrame,
        key_col: str,
        parent: DataFrame,
        parent_key: str,
        broadcast_parent: bool,
    ) -> DataFrame:
        # True dims broadcast; a fact-sized parent (orders) must
        # shuffle-anti-join — broadcasting it would OOM at scale.
        keys = parent.select(parent_key)
        if broadcast_parent:
            keys = F.broadcast(keys)
        n_rows = fact.agg(F.count("*").alias("n_rows"))
        n_orph = fact.join(
            keys, fact[key_col] == F.col(parent_key), "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        return n_rows.crossJoin(n_orph).select(
            F.lit(fk).alias("fk"), "n_rows", "n_orphans"
        )

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    pa = _t(spark, sf_dir, "part")
    return (
        check("lineitem->orders", li, "l_orderkey", od, "o_orderkey", False)
        .unionAll(check("orders->customer", od, "o_custkey", cu, "c_custkey", True))
        .unionAll(check("lineitem->part", li, "l_partkey", pa, "p_partkey", True))
    )


# ----------------------------------------------------------------------------
# Period-over-period growth (LAG ratio on exact revenue)
# ----------------------------------------------------------------------------

_GROWTH_EXPR = "CAST(rev6 AS DOUBLE) / CAST(prev6 AS DOUBLE) - 1"

_POP_ORACLE = f"""
WITH m AS (
  SELECT o_orderpriority AS segment,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT) AS rev6,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
),
l AS (
  SELECT *, LAG(rev6) OVER (PARTITION BY segment ORDER BY month) AS prev6
  FROM m
)
SELECT segment, month,
       CAST(rev6 AS DOUBLE) / 1000000 AS revenue,
       CAST(n_orders AS BIGINT) AS n_orders,
       {_GROWTH_EXPR} AS growth
FROM l
"""


@register(
    "period_over_period_growth",
    _POP_ORACLE,
    "Month-over-month revenue growth per order-priority segment: "
    "exact fixed-point monthly sums (kept as scaled BIGINT through "
    "the LAG so the ratio divides two exactly-representable "
    "integers), one grouped shuffle + one segment-partitioned "
    "window. First month per segment is NULL growth, pandas-style. "
    "The trend KPI every reporting layer ships.",
)
def period_over_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec

    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("segment"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(
            F.sum(dec("o_totalprice")).cast("bigint").alias("rev6"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.partitionBy("segment").orderBy("month")
    return m.withColumn("prev6", F.lag("rev6").over(w)).selectExpr(
        "segment",
        "month",
        "CAST(rev6 AS DOUBLE) / 1000000 AS revenue",
        "CAST(n_orders AS BIGINT) AS n_orders",
        f"{_GROWTH_EXPR} AS growth",
    )


# ----------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles)
# ----------------------------------------------------------------------------

_RFM_ANCHOR = "2001-08-01"

_RFM_ORACLE = f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate), TIMESTAMP '{_RFM_ANCHOR}') AS BIGINT)
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS DOUBLE)
           / 1000000 AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, recency_days,
         CAST(frequency AS BIGINT) AS frequency, monetary,
         NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, o_custkey)  AS f_score,
         NTILE(5) OVER (ORDER BY monetary DESC, o_custkey)   AS m_score
  FROM cust
)
SELECT *, r_score * 100 + f_score * 10 + m_score AS rfm_cell
FROM scored
"""


@register(
    "rfm_segments",
    _RFM_ORACLE,
    "RFM customer segmentation: exact per-customer recency (days to a "
    "fixed anchor), frequency, decimal-exact monetary, then NTILE(5) "
    "quintiles on each axis (custkey tiebreaks -> identical cuts in "
    "both engines) composed into a 111..555 cell id. Each NTILE rides "
    "the distributed two-pass rank (operators/ranking.py): bucketed "
    "partitioned windows + broadcast offsets, so the 10^9-customer "
    "table at 100 TB never crosses one task. The lifecycle-marketing "
    "segmentation behind the reference's tier-based eligibility rules.",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from data_lakehouse_platform_spark.catalog import (
        input_scaled_partitions,
    )
    from data_lakehouse_platform_spark.functions.money import dec, undec
    from data_lakehouse_platform_spark.operators.ranking import (
        with_global_ntile,
    )

    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.lit(_RFM_ANCHOR), F.max("o_orderdate"))
            .cast("bigint")
            .alias("recency_days"),
            F.count("*").cast("bigint").alias("frequency"),
            undec(F.sum(dec("o_totalprice"))).alias("monetary"),
        )
        # r11 (guide §1.2, §5): the three NTILE axes each run a cut
        # pass + stats pass + boundary window over this aggregate —
        # persist it once (strong reduction of orders, input-scaled
        # width) instead of re-aggregating orders ~9x.
        .repartition(input_scaled_partitions(sf_dir, "orders"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # r11 rewrite (r10 verdict Next-round #5): the NTILE(5) cut rows
    # are rank-selections at known positions, so each axis locates its
    # 4 boundary rows via the selection twin and scores every customer
    # with a pure projection — the three full global-rank passes
    # (persist + window every row + broadcast offsets, per axis) are
    # gone.  with_global_ntile's docstring carries the equivalence
    # proof; the DuckDB oracle above stays the NTILE ground truth.
    axes = [
        ("r_score", [("recency_days", False), ("o_custkey", False)]),
        ("f_score", [("frequency", True), ("o_custkey", False)]),
        ("m_score", [("monetary", True), ("o_custkey", False)]),
    ]
    scored = cust
    for out, keys in axes:
        scored = with_global_ntile(scored, keys, 5, out)
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).alias(
            "rfm_cell"
        ),
    )


# ----------------------------------------------------------------------------
# Rolling z-score anomaly on daily revenue (trailing-window moments)
# ----------------------------------------------------------------------------

_RZ_MIN_PRIOR = 3
_RZ_THRESHOLD = 2.0
# Shared closed-form: mean/std from trailing integer moments. All
# operands are exact int64-as-double, so both engines agree bitwise.
_RZ_Z_EXPR = (
    "(CAST(x AS DOUBLE) - CAST(s AS DOUBLE) / n) / "
    "SQRT(CAST(ss AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"
)
_RZ_VAR_EXPR = (
    "CAST(ss AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)"
)

_ROLLING_Z_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0)))
           AS BIGINT) // 1000000 AS x
  FROM orders GROUP BY 1
),
w AS (
  SELECT day, CAST(x AS BIGINT) AS x,
         COUNT(*) OVER tw AS n,
         SUM(CAST(x AS BIGINT)) OVER tw AS s,
         SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) OVER tw AS ss
  FROM daily
  WINDOW tw AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
)
SELECT day, x AS revenue_units,
       CAST(n AS BIGINT) AS n_prior,
       CASE WHEN n >= {_RZ_MIN_PRIOR} AND {_RZ_VAR_EXPR} > 0
            THEN {_RZ_Z_EXPR} END AS zscore,
       CAST(CASE WHEN n >= {_RZ_MIN_PRIOR} AND {_RZ_VAR_EXPR} > 0
                 AND ABS({_RZ_Z_EXPR}) > {_RZ_THRESHOLD}
            THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM w
"""


@register(
    "rolling_zscore_revenue",
    _ROLLING_Z_ORACLE,
    "Self-referential anomaly detection: each day's revenue scored "
    "against the mean/std of the trailing 6 days (window excludes the "
    "current row, so anomalies don't mask themselves). Revenue is "
    "floor-divided to whole units so x and x^2 window sums stay exact "
    "int64 — the z closed-form then divides identical doubles in both "
    "engines. One date-ordered window over the already-tiny daily "
    "aggregate; the dq_volume_anomaly pattern turned rolling.",
)
def rolling_zscore_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.expr(
            "CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) "
            "AS BIGINT) DIV 1000000"
        ).alias("x"))
    )
    tw = Window.orderBy("day").rowsBetween(-6, -1)
    w = daily.select(
        "day",
        "x",
        F.count("*").over(tw).alias("n"),
        F.sum("x").over(tw).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(tw).alias("ss"),
    )
    return w.selectExpr(
        "day",
        "x AS revenue_units",
        "CAST(n AS BIGINT) AS n_prior",
        f"CASE WHEN n >= {_RZ_MIN_PRIOR} AND {_RZ_VAR_EXPR} > 0 "
        f"THEN {_RZ_Z_EXPR} END AS zscore",
        f"CAST(CASE WHEN n >= {_RZ_MIN_PRIOR} AND {_RZ_VAR_EXPR} > 0 "
        f"AND ABS({_RZ_Z_EXPR}) > {_RZ_THRESHOLD} THEN 1 ELSE 0 END AS INT) "
        "AS is_anomaly",
    )


# ----------------------------------------------------------------------------
# Portable PERCENTILE_CONT (interpolated percentiles from order stats)
# ----------------------------------------------------------------------------

_PCONT_PS = (0.25, 0.5, 0.75, 0.9)
_PCONT_VALUE_EXPR = "v_lo + (pos - FLOOR(pos)) * (v_hi - v_lo)"

_PCONT_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority AS priority, o_totalprice AS v,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
         ) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
ps AS (SELECT * FROM (VALUES {", ".join(f"({p})" for p in _PCONT_PS)}) t(p)),
grid AS (
  SELECT DISTINCT priority, n, p,
         CAST(p AS DOUBLE) * (n - 1) AS pos
  FROM ranked, ps
),
lohi AS (
  SELECT g.priority, g.n, g.p, g.pos,
         lo.v AS v_lo, hi.v AS v_hi
  FROM grid g
  JOIN ranked lo ON lo.priority = g.priority
                AND lo.rn = CAST(FLOOR(g.pos) AS BIGINT) + 1
  JOIN ranked hi ON hi.priority = g.priority
                AND hi.rn = CAST(CEIL(g.pos) AS BIGINT) + 1
)
SELECT priority, CAST(p AS DOUBLE) AS p, CAST(n AS BIGINT) AS n,
       {_PCONT_VALUE_EXPR} AS value
FROM lohi
"""


@register(
    "percentile_cont_portable",
    _PCONT_ORACLE,
    "Interpolated PERCENTILE_CONT built from order statistics: "
    "row_number ranks (unique orderkey tiebreak), the two bracketing "
    "ranks join back by position, and one shared linear-interpolation "
    "expression — identical doubles in, identical percentile out, on "
    "any engine. Complements quantile_order_values (discrete): this "
    "is the SQL-standard continuous definition, still portable and "
    "exact. Cost: the SELECTION form of the bucketed rank "
    "(select_group_ranks) — only buckets containing a bracketing rank "
    "are sorted, nothing is persisted — plus one broadcast join; no "
    "native percentile function, so no engine-specific interpolation "
    "quirks at 100 TB either.",
)
def percentile_cont_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from data_lakehouse_platform_spark.operators.ranking import select_group_ranks

    od = _t(spark, sf_dir, "orders")

    # SELECTION form of the bucketed grouped rank: only the 8 bracketing
    # order statistics per priority (floor/ceil of 4 percentile
    # positions) are ranked — just the buckets containing a requested
    # rank flow through a window and nothing is persisted.  The full
    # with_grouped_rank ranks and materializes every order for ranks it
    # then throws away; at fact-table scale the persist IS the cost, so
    # this is the plan that survives 100x (see select_group_ranks's
    # docstring for the local-vs-scale trade).
    def _pcont_ranks(n: int) -> set[int]:
        want: set[int] = set()
        for p in _PCONT_PS:
            pos = p * (n - 1)  # same IEEE double the SQL side computes
            want.add(math.floor(pos) + 1)
            want.add(math.ceil(pos) + 1)
        return want

    sel_rows = select_group_ranks(
        od.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("v"),
            "o_orderkey",
        ),
        ["priority"],
        [F.col("v"), F.col("o_orderkey")],
        bucket_key=F.col("v"),
        ranks_fn=_pcont_ranks,
        n_col="gn",
    ).select("priority", "v", "rn", "gn")
    ranked = sel_rows.select("priority", "v", "rn")
    # Group sizes ride along from the selection's stats pass — no extra
    # scan-and-aggregate job for them.
    counts = sel_rows.select("priority", F.col("gn").alias("n")).distinct()
    ps = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(p)) for p in _PCONT_PS])).alias("p")
    )
    roles = (
        counts.crossJoin(F.broadcast(ps))
        .selectExpr("priority", "n", "p", "CAST(p AS DOUBLE) * (n - 1) AS pos")
        .select(
            F.col("priority").alias("rp"),
            "n",
            "p",
            "pos",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lo").alias("which"),
                        (F.floor("pos").cast("bigint") + 1).alias("rn_need"),
                    ),
                    F.struct(
                        F.lit("hi").alias("which"),
                        (F.ceil("pos").cast("bigint") + 1).alias("rn_need"),
                    ),
                )
            ).alias("r"),
        )
        .select(
            "rp", "n", "p", "pos",
            F.col("r.which").alias("which"),
            F.col("r.rn_need").alias("rn_need"),
        )
    )
    sel = ranked.join(
        F.broadcast(roles),
        (F.col("priority") == F.col("rp")) & (F.col("rn") == F.col("rn_need")),
    )
    lohi = sel.groupBy("priority", "p", "pos", "n").agg(
        F.max(F.when(F.col("which") == "lo", F.col("v"))).alias("v_lo"),
        F.max(F.when(F.col("which") == "hi", F.col("v"))).alias("v_hi"),
    )
    return lohi.selectExpr(
        "priority",
        "CAST(p AS DOUBLE) AS p",
        "CAST(n AS BIGINT) AS n",
        f"{_PCONT_VALUE_EXPR} AS value",
    )


# ----------------------------------------------------------------------------
# Journey pattern mining (ordered event sequences per user-day)
# ----------------------------------------------------------------------------

_JOURNEY_MAX_STEPS = 20

_JOURNEY_ORACLE = f"""
WITH j AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:{_JOURNEY_MAX_STEPS}], '>'
         ) AS journey,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
)
SELECT journey,
       CAST(COUNT(*) AS BIGINT) AS n_user_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted
FROM j GROUP BY journey
ORDER BY n_user_days DESC, journey
LIMIT 20
"""


@register(
    "journey_patterns",
    _JOURNEY_ORACLE,
    "Canonical user-journey mining: each user-day's events collapse "
    "into an ordered event-type path (ts+event_id total order, capped "
    "at 20 steps so pathological days can't make unbounded keys), "
    "then the top-20 most common paths with user reach and purchase "
    "conversion. The sequence collapse is one user-day shuffle; "
    "pattern counting shuffles strings bounded by the step cap — the "
    "trajectory/path-analysis query behind 'most common ways users "
    "reach checkout'.",
)
def journey_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    j = (
        ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("ts", "event_id", "event_type"))
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    _JOURNEY_MAX_STEPS,
                ),
                ">",
            ).alias("journey"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    return (
        j.groupBy("journey")
        .agg(
            F.count("*").cast("bigint").alias("n_user_days"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .orderBy(F.desc("n_user_days"), "journey")
        .limit(20)
    )


# ----------------------------------------------------------------------------
# Portable MODE aggregate (argmax with full tiebreak)
# ----------------------------------------------------------------------------

_MODE_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY n DESC, event_type
  ) AS rnk
  FROM counts
)
SELECT user_id, event_type AS modal_event, CAST(n AS BIGINT) AS n_occurrences
FROM ranked WHERE rnk = 1
"""


@register(
    "mode_event_type",
    _MODE_ORACLE,
    "Portable MODE(): each user's most frequent event type, ties "
    "broken lexicographically so both engines pick the same winner "
    "(native MODE() functions leave ties undefined — ungradable and "
    "irreproducible). Grouped count + per-user rank; both shuffles "
    "key on user_id so AQE coalesces them onto one layout.",
)
def mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_event"),
            F.col("n").cast("bigint").alias("n_occurrences"),
        )
    )


# ----------------------------------------------------------------------------
# Contingency lift matrix (independence diagnostics without a chi sum)
# ----------------------------------------------------------------------------
# Per-cell only — no aggregation over float contributions, so every
# value is one shared expression over exact integer counts.

_LIFT_EXPR = (
    "CAST(n_cell AS DOUBLE) * CAST(n_total AS DOUBLE) "
    "/ (CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE))"
)
_EXPECTED_EXPR = (
    "CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE) / CAST(n_total AS DOUBLE)"
)

_CONTINGENCY_ORACLE = f"""
WITH cells AS (
  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
         COUNT(*) AS n_cell
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT *,
         SUM(n_cell) OVER (PARTITION BY segment)  AS n_row,
         SUM(n_cell) OVER (PARTITION BY priority) AS n_col,
         SUM(n_cell) OVER ()                      AS n_total
  FROM cells
)
SELECT segment, priority,
       CAST(n_cell AS BIGINT) AS n_cell,
       {_EXPECTED_EXPR} AS expected,
       {_LIFT_EXPR} AS lift
FROM tot
"""


@register(
    "contingency_lift",
    _CONTINGENCY_ORACLE,
    "Contingency table with per-cell expected counts and lift "
    "(observed x total / (row x col)): the independence diagnostic "
    "behind segment-affinity dashboards, kept per-cell so no float "
    "summation order exists anywhere — every number is one shared "
    "expression over exact integers. One broadcast join + one "
    "grouped shuffle; the margin windows run over the tiny cell "
    "table.",
)
def contingency_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n_cell"))
    )
    tot = cells.select(
        "*",
        F.sum("n_cell").over(Window.partitionBy("segment")).alias("n_row"),
        F.sum("n_cell").over(Window.partitionBy("priority")).alias("n_col"),
        F.sum("n_cell").over(Window.partitionBy()).alias("n_total"),
    )
    return tot.selectExpr(
        "segment",
        "priority",
        "CAST(n_cell AS BIGINT) AS n_cell",
        f"{_EXPECTED_EXPR} AS expected",
        f"{_LIFT_EXPR} AS lift",
    )


# ----------------------------------------------------------------------------
# 2-D skyline (Pareto front) in one sorted window pass
# ----------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate), TIMESTAMP '2001-08-01') AS BIGINT)
           AS recency_days,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT)
           AS monetary6
  FROM orders GROUP BY o_custkey
),
swept AS (
  SELECT *, MAX(monetary6) OVER (
    ORDER BY recency_days ASC, monetary6 DESC, o_custkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ) AS best_before
  FROM cust
)
SELECT o_custkey, recency_days,
       CAST(monetary6 AS DOUBLE) / 1000000 AS monetary
FROM swept
WHERE best_before IS NULL OR monetary6 > best_before
"""


@register(
    "skyline_customers",
    _SKYLINE_ORACLE,
    "2-D skyline (Pareto front): customers not dominated on "
    "(fresher recency, higher spend). The classic sort-based "
    "algorithm as one window: order by recency, keep rows whose "
    "exact scaled spend strictly beats the running max of everyone "
    "fresher — O(n log n) total and a single shuffle, vs the naive "
    "O(n^2) dominance self-join. Spend stays an exact BIGINT through "
    "every comparison so the front is engine- and partition-stable.",
)
def skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec
    from data_lakehouse_platform_spark.operators.ranking import with_global_rank

    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.lit(_RFM_ANCHOR), F.max("o_orderdate"))
            .cast("bigint")
            .alias("recency_days"),
            F.sum(dec("o_totalprice")).cast("bigint").alias("monetary6"),
        )
    )
    # Distributed sweep: running max over strictly-preceding rows in
    # (recency asc, monetary desc, custkey) order via the bucketed
    # two-pass rank — no unpartitioned window over the customer table.
    swept, _ = with_global_rank(
        cust,
        [F.col("recency_days").asc(), F.col("monetary6").desc(), F.col("o_custkey")],
        bucket_key=F.col("recency_days"),
        prior_max_col="best_before",
        weight=F.col("monetary6"),
        weight_type="bigint",
    )
    return swept.filter(
        F.col("best_before").isNull() | (F.col("monetary6") > F.col("best_before"))
    ).selectExpr(
        "o_custkey",
        "recency_days",
        "CAST(monetary6 AS DOUBLE) / 1000000 AS monetary",
    )


# ----------------------------------------------------------------------------
# Inequality / concentration measures: Gini + Herfindahl (HHI)
# ----------------------------------------------------------------------------
# Gini = (2 * Σ i·x_(i)) / (n * Σ x) - (n + 1) / n over rank-sorted
# exact spends; HHI = Σ x² / (Σ x)². Every Σ is an exact integer; the
# rank-weighted sum exceeds int64, so it floor-div downscales into
# int64 range before its single double cast (the HUGEINT→DOUBLE
# double-rounding recipe).

_GINI_DS = 10**6
_GINI_EXPR = (
    f"2.0 * (CAST(sw AS DOUBLE) * {_GINI_DS}) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) "
    "- (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE)"
)
_HHI_EXPR = (
    f"(CAST(ssq AS DOUBLE) * {_GINI_DS}) / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
)

_GINI_ORACLE = f"""
WITH cust AS (
  SELECT c_mktsegment AS segment, o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT)
           AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY segment ORDER BY x, o_custkey
  ) AS i
  FROM cust
),
m AS (
  SELECT segment,
         COUNT(*) AS n,
         SUM(x) AS s,
         (SUM(CAST(i AS HUGEINT) * CAST(x AS HUGEINT))
            - (((SUM(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) % {_GINI_DS})
                + {_GINI_DS}) % {_GINI_DS})) // {_GINI_DS} AS sw,
         (SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
            - (((SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) % {_GINI_DS})
                + {_GINI_DS}) % {_GINI_DS})) // {_GINI_DS} AS ssq
  FROM ranked GROUP BY segment
)
SELECT segment, CAST(n AS BIGINT) AS n_customers,
       CAST(s AS DOUBLE) / 1000000 AS total_spend,
       {_GINI_EXPR} AS gini,
       {_HHI_EXPR} AS hhi
FROM m
"""


@register(
    "gini_hhi_concentration",
    _GINI_ORACLE,
    "Spend inequality per market segment: exact Gini coefficient "
    "(rank-weighted sum formulation over the sorted exact spends) and "
    "Herfindahl concentration index, both from integer moments with a "
    "floor-div downscale so no beyond-int64 value ever meets a DOUBLE "
    "cast. One join + one grouped shuffle + one segment-partitioned "
    "rank window; the whale-dependence metric ('do 1% of customers "
    "carry the revenue?') that informs curation and sampling choices "
    "as much as sales dashboards.",
)
def gini_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec

    cust = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("o_custkey"))
        .agg(F.sum(dec("o_totalprice")).cast("bigint").alias("x"))
    )
    w = Window.partitionBy("segment").orderBy("x", "o_custkey")
    ranked = cust.withColumn("i", F.row_number().over(w))
    D = _GINI_DS
    fdiv = (
        lambda e: f"CAST((({e}) - ((({e}) % {D}) + {D}) % {D}) / {D} AS DECIMAL(38,0))"
    )
    sw_sum = "SUM(CAST(i AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))"
    sq_sum = "SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))"
    m = ranked.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.expr(fdiv(sw_sum)).alias("sw"),
        F.expr(fdiv(sq_sum)).alias("ssq"),
    )
    return m.selectExpr(
        "segment",
        "CAST(n AS BIGINT) AS n_customers",
        "CAST(s AS DOUBLE) / 1000000 AS total_spend",
        f"{_GINI_EXPR} AS gini",
        f"{_HHI_EXPR} AS hhi",
    )


# ----------------------------------------------------------------------------
# Readability scoring (Flesch-style, vowel-group syllable proxy)
# ----------------------------------------------------------------------------

_FLESCH_EXPR = (
    "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) "
    "- 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)"
)

_READABILITY_ORACLE = f"""
WITH counts AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '[a-z]+'))      AS n_words,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))   AS n_syllables
  FROM documents
)
SELECT doc_id, lang,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       {_FLESCH_EXPR} AS flesch
FROM counts WHERE n_words > 0
"""


@register(
    "text_readability",
    _READABILITY_ORACLE,
    "Flesch-style readability per document from three regexp counts "
    "(words, sentence terminators, vowel-group syllable proxy) — the "
    "standard library-free approximation. Pure single-pass map work "
    "(regexp_count in codegen, no shuffle at all before the driver "
    "collects), and the score is one shared expression over exact "
    "integers. A corpus-quality gate alongside text_quality: filter "
    "training data to a readability band without a tokenizer.",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    counts = d.select(
        "doc_id",
        "lang",
        F.regexp_count(F.lower(F.col("text")), F.lit("[a-z]+")).alias("n_words"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
        ).alias("n_sentences"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).alias(
            "n_syllables"
        ),
    )
    return counts.filter(F.col("n_words") > 0).selectExpr(
        "doc_id",
        "lang",
        "CAST(n_words AS BIGINT) AS n_words",
        "CAST(n_sentences AS BIGINT) AS n_sentences",
        "CAST(n_syllables AS BIGINT) AS n_syllables",
        f"{_FLESCH_EXPR} AS flesch",
    )


# ----------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law, first-occurrence running sums)
# ----------------------------------------------------------------------------

_TTR_EXPR = "CAST(cum_distinct AS DOUBLE) / CAST(cum_tokens AS DOUBLE)"

_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
per_doc AS (SELECT doc_id, COUNT(*) AS n_tokens FROM toks GROUP BY doc_id),
firsts AS (
  SELECT MIN(doc_id) AS doc_id, term FROM toks GROUP BY term
),
new_terms AS (
  SELECT doc_id, COUNT(*) AS n_new FROM firsts GROUP BY doc_id
),
curve AS (
  SELECT p.doc_id, p.n_tokens, COALESCE(n.n_new, 0) AS n_new,
         SUM(p.n_tokens) OVER (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING) AS cum_distinct
  FROM per_doc p LEFT JOIN new_terms n ON p.doc_id = n.doc_id
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_new AS BIGINT) AS n_new_terms,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(cum_distinct AS BIGINT) AS cum_distinct,
       {_TTR_EXPR} AS type_token_ratio
FROM curve
"""


@register(
    "vocab_growth",
    _VOCAB_ORACLE,
    "Vocabulary growth (Heaps' law) curve: running distinct-term "
    "count as the corpus accumulates in doc_id order, WITHOUT a "
    "running COUNT(DISTINCT) — each term charges its first-occurrence "
    "doc (a grouped MIN), so the curve is two tiny running sums over "
    "the per-doc table. Diminishing type-token ratio signals "
    "saturation/duplication in a growing training corpus; the "
    "windowed-distinct rewrite is what makes it computable at all at "
    "scale.",
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("term"),
    )
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    firsts = toks.groupBy("term").agg(F.min("doc_id").alias("doc_id"))
    new_terms = firsts.groupBy("doc_id").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_doc.join(new_terms, "doc_id", "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
        .select(
            "doc_id",
            "n_tokens",
            "n_new",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.sum("n_new").over(w).alias("cum_distinct"),
        )
    )
    return curve.selectExpr(
        "doc_id",
        "CAST(n_tokens AS BIGINT) AS n_tokens",
        "CAST(n_new AS BIGINT) AS n_new_terms",
        "CAST(cum_tokens AS BIGINT) AS cum_tokens",
        "CAST(cum_distinct AS BIGINT) AS cum_distinct",
        f"{_TTR_EXPR} AS type_token_ratio",
    )


# ----------------------------------------------------------------------------
# Segment migration matrix (month-over-month quartile transitions)
# ----------------------------------------------------------------------------

_MIGRATION_ORACLE = """
WITH monthly AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT)
           AS spend6
  FROM orders GROUP BY 1, 2
),
tiered AS (
  SELECT *, NTILE(4) OVER (
    PARTITION BY month ORDER BY spend6 DESC, o_custkey
  ) AS tier
  FROM monthly
),
paired AS (
  SELECT t.o_custkey, t.month, t.tier AS from_tier, nxt.tier AS to_tier
  FROM tiered t
  JOIN tiered nxt
    ON t.o_custkey = nxt.o_custkey
   AND nxt.month = t.month + INTERVAL 1 MONTH
)
SELECT from_tier, to_tier, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM paired GROUP BY 1, 2
"""


@register(
    "segment_migration",
    _MIGRATION_ORACLE,
    "Month-over-month tier migration matrix: customers get a spend "
    "quartile per month (exact scaled spend, custkey-tiebroken "
    "NTILE), consecutive months pair by an equi-join on (custkey, "
    "month+1), and the 4x4 transition counts fall out of one grouped "
    "count. The retention/churn movement view behind 'did our top "
    "quartile stay top'; all shuffles key on custkey or month — "
    "nothing quadratic, no window over the raw fact.",
)
def segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec

    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(F.sum(dec("o_totalprice")).cast("bigint").alias("spend6"))
    )
    w = Window.partitionBy("month").orderBy(F.desc("spend6"), F.col("o_custkey"))
    tiered = monthly.withColumn("tier", F.ntile(4).over(w))
    nxt = tiered.select(
        F.col("o_custkey").alias("n_custkey"),
        F.col("month").alias("n_month"),
        F.col("tier").alias("to_tier"),
    )
    paired = tiered.join(
        nxt,
        (F.col("o_custkey") == F.col("n_custkey"))
        & (F.col("n_month") == F.col("month") + F.expr("INTERVAL 1 MONTH")),
    )
    return (
        paired.groupBy(F.col("tier").alias("from_tier"), "to_tier")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


# ----------------------------------------------------------------------------
# Lag-1 autocorrelation of daily revenue (exact paired moments)
# ----------------------------------------------------------------------------

_AUTOCORR_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0)))
           AS BIGINT) // 1000000 AS x
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CAST(LAG(x) OVER (ORDER BY day) AS BIGINT) AS xi,
         CAST(x AS BIGINT) AS yi
  FROM daily
),
pts AS (SELECT xi, yi FROM pairs WHERE xi IS NOT NULL),
m AS (
  SELECT {", ".join(f"{expr} AS {name}" for name, expr in _MOMENTS.items())}
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       {_CORR_EXPR} AS lag1_autocorr
FROM m
"""


@register(
    "revenue_autocorr",
    _AUTOCORR_ORACLE,
    "Lag-1 autocorrelation of daily revenue: LAG pairs consecutive "
    "days (whole-unit exact integers), then the same shared "
    "closed-form Pearson expression as corr_qty_price over five exact "
    "moments. Positive autocorrelation means yesterday predicts "
    "today — the one-number stationarity check run before trusting "
    "the rolling z-score thresholds. Daily collapse first, so the "
    "window and moments touch ~span-days rows regardless of fact "
    "size.",
)
def revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.expr(
            "CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) "
            "AS BIGINT) DIV 1000000"
        ).alias("x"))
    )
    w = Window.orderBy("day")
    pts = (
        daily.select(
            F.lag("x").over(w).cast("bigint").alias("xi"),
            F.col("x").cast("bigint").alias("yi"),
        )
        .filter(F.col("xi").isNotNull())
    )
    m = pts.agg(*[F.expr(expr).alias(name) for name, expr in _MOMENTS.items()])
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_pairs",
        f"{_CORR_EXPR} AS lag1_autocorr",
    )


# ----------------------------------------------------------------------------
# Cohort LTV curve (cumulative revenue per signup cohort)
# ----------------------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         MIN(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS cohort
  FROM orders GROUP BY o_custkey
),
monthly AS (
  SELECT f.cohort,
         CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT)
           AS rev6,
         COUNT(DISTINCT o.o_custkey) AS n_active
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
),
curve AS (
  SELECT cohort, month, rev6, n_active,
         CAST(date_diff('month', cohort, month) AS INT) AS month_offset,
         SUM(rev6) OVER (
           PARTITION BY cohort ORDER BY month ROWS UNBOUNDED PRECEDING
         ) AS cum_rev6
  FROM monthly
)
SELECT cohort, CAST(month_offset AS INT) AS month_offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(rev6 AS DOUBLE) / 1000000 AS revenue,
       CAST(cum_rev6 AS DOUBLE) / 1000000 AS cum_revenue
FROM curve
"""


@register(
    "cohort_ltv",
    _LTV_ORACLE,
    "Lifetime-value curve per acquisition cohort: customers anchor to "
    "their first-order month, each cohort accumulates exact monthly "
    "revenue (scaled BIGINT through the running sum — cast to DOUBLE "
    "only at the edge), reported by month offset. One extra shuffle "
    "over the plain retention matrix buys the 'how much is a cohort "
    "worth by month 6' curve that payback-period decisions read.",
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec

    od = _t(spark, sf_dir, "orders")
    firsts = od.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("cohort")
    )
    monthly = (
        od.join(firsts, "o_custkey")
        .groupBy(
            "cohort", F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(
            F.sum(dec("o_totalprice")).cast("bigint").alias("rev6"),
            F.countDistinct("o_custkey").alias("n_active"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = monthly.select(
        "cohort",
        (F.months_between(F.col("month"), F.col("cohort")))
        .cast("int")
        .alias("month_offset"),
        "n_active",
        "rev6",
        F.sum("rev6").over(w).alias("cum_rev6"),
    )
    return curve.selectExpr(
        "cohort",
        "CAST(month_offset AS INT) AS month_offset",
        "CAST(n_active AS BIGINT) AS n_active",
        "CAST(rev6 AS DOUBLE) / 1000000 AS revenue",
        "CAST(cum_rev6 AS DOUBLE) / 1000000 AS cum_revenue",
    )


# ----------------------------------------------------------------------------
# New vs returning customers per month
# ----------------------------------------------------------------------------

_NVR_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         MIN(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS first_month
  FROM orders GROUP BY o_custkey
),
tagged AS (
  SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
         CASE WHEN CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
                   = f.first_month
              THEN 1 ELSE 0 END AS is_new,
         o.o_custkey, o.o_totalprice
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
)
SELECT month,
       CAST(SUM(is_new) AS BIGINT) AS n_new_orders,
       CAST(SUM(1 - is_new) AS BIGINT) AS n_returning_orders,
       CAST(COUNT(DISTINCT CASE WHEN is_new = 1 THEN o_custkey END) AS BIGINT)
         AS n_new_customers,
       CAST(SUM(CASE WHEN is_new = 1
                     THEN CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))
                     ELSE 0 END) AS DOUBLE) / 1000000 AS new_revenue,
       CAST(SUM(CASE WHEN is_new = 0
                     THEN CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))
                     ELSE 0 END) AS DOUBLE) / 1000000 AS returning_revenue
FROM tagged GROUP BY month
"""


@register(
    "new_vs_returning",
    _NVR_ORACLE,
    "Monthly new-vs-returning split: an order is 'new' iff its month "
    "equals the customer's first-order month, then conditional exact "
    "sums split order counts, distinct new customers, and revenue. "
    "Two custkey-keyed shuffles (first-month anchor + the join back); "
    "the acquisition-vs-retention revenue mix every growth dashboard "
    "leads with.",
)
def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec

    od = _t(spark, sf_dir, "orders")
    firsts = od.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("first_month")
    )
    tagged = od.join(firsts, "o_custkey").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        (F.date_trunc("month", F.col("o_orderdate")) == F.col("first_month"))
        .cast("int")
        .alias("is_new"),
        "o_custkey",
        "o_totalprice",
    )
    return tagged.groupBy("month").agg(
        F.sum("is_new").cast("bigint").alias("n_new_orders"),
        F.sum(1 - F.col("is_new")).cast("bigint").alias("n_returning_orders"),
        F.countDistinct(
            F.when(F.col("is_new") == 1, F.col("o_custkey"))
        ).cast("bigint").alias("n_new_customers"),
        (
            F.sum(F.when(F.col("is_new") == 1, dec("o_totalprice")).otherwise(F.lit(0)))
            .cast("double") / 1000000
        ).alias("new_revenue"),
        (
            F.sum(F.when(F.col("is_new") == 0, dec("o_totalprice")).otherwise(F.lit(0)))
            .cast("double") / 1000000
        ).alias("returning_revenue"),
    )


# ----------------------------------------------------------------------------
# Conversion latency distribution (view -> first purchase)
# ----------------------------------------------------------------------------

_LATENCY_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
lat AS (
  SELECT p.user_id,
         (epoch_us(p.purchase_ts) - epoch_us(v.view_ts)) // 1000000 AS latency_s
  FROM p JOIN v USING (user_id)
)
SELECT
  CASE WHEN latency_s < 60 THEN 'lt_1m'
       WHEN latency_s < 3600 THEN 'lt_1h'
       WHEN latency_s < 86400 THEN 'lt_1d'
       ELSE 'ge_1d' END AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(MIN(latency_s) AS BIGINT) AS min_s,
  CAST(MAX(latency_s) AS BIGINT) AS max_s
FROM lat GROUP BY 1
"""


@register(
    "conversion_latency",
    _LATENCY_ORACLE,
    "Time-to-convert distribution: first view to first subsequent "
    "purchase per user, in exact integer seconds (micros floor-div — "
    "no float timestamps), bucketed minute/hour/day. Two grouped MINs "
    "and a key join, all on user_id; the latency histogram behind "
    "'how long does conversion take', feeding the attribution-window "
    "choice used by asof_forward_tolerance.",
)
def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    lat = p.join(v, "user_id").select(
        "user_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("us"),
    ).selectExpr("user_id", "us DIV 1000000 AS latency_s")
    bucket = (
        F.when(F.col("latency_s") < 60, "lt_1m")
        .when(F.col("latency_s") < 3600, "lt_1h")
        .when(F.col("latency_s") < 86400, "lt_1d")
        .otherwise("ge_1d")
    )
    return lat.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.min("latency_s").cast("bigint").alias("min_s"),
        F.max("latency_s").cast("bigint").alias("max_s"),
    )


# ----------------------------------------------------------------------------
# DAU / MAU stickiness (sliding-distinct via coverage explode)
# ----------------------------------------------------------------------------

_MAU_WINDOW_DAYS = 30

_DAU_MAU_ORACLE = f"""
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
),
dau AS (SELECT day, COUNT(*) AS dau FROM user_days GROUP BY day),
coverage AS (
  SELECT DISTINCT user_id,
         unnest(generate_series(
           day, day + INTERVAL {_MAU_WINDOW_DAYS - 1} DAY, INTERVAL 1 DAY
         )) AS cover_day
  FROM user_days
),
mau AS (SELECT cover_day AS day, COUNT(DISTINCT user_id) AS mau FROM coverage GROUP BY 1)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(m.mau AS BIGINT) AS mau,
       CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE) AS stickiness
FROM dau d JOIN mau m ON d.day = m.day
"""


@register(
    "dau_mau_stickiness",
    _DAU_MAU_ORACLE,
    "DAU/MAU stickiness per day with an EXACT trailing-30-day "
    "distinct: windows can't COUNT(DISTINCT), so each user-day "
    "explodes into the 30 future days it keeps the user 'monthly "
    "active' for, and MAU is a plain grouped distinct — a bounded "
    "30x row fan-out of the already-collapsed user-day table, not "
    "the raw events. Reported only for observed days. The "
    "engagement-health ratio every consumer product tracks.",
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    user_days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    dau = user_days.groupBy("day").agg(F.count("*").alias("dau"))
    coverage = user_days.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {_MAU_WINDOW_DAYS - 1} DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("cover_day"),
    )
    # no distinct here: countDistinct below already dedupes, and a
    # pre-distinct would add a full extra shuffle of the 30x-exploded
    # coverage table (the largest intermediate in this query).
    mau = coverage.groupBy(F.col("cover_day").alias("day")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return dau.join(mau, "day").selectExpr(
        "day",
        "CAST(dau AS BIGINT) AS dau",
        "CAST(mau AS BIGINT) AS mau",
        "CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness",
    )


# ----------------------------------------------------------------------------
# Lorenz curve by customer decile (80/20 concentration profile)
# ----------------------------------------------------------------------------

_LORENZ_SHARE = "CAST(cum6 AS DOUBLE) / CAST(tot6 AS DOUBLE)"

_LORENZ_ORACLE = f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT)
           AS spend6
  FROM orders GROUP BY o_custkey
),
tiered AS (
  SELECT *, NTILE(10) OVER (ORDER BY spend6, o_custkey) AS decile
  FROM cust
),
per_decile AS (
  SELECT decile, COUNT(*) AS n_customers, SUM(spend6) AS dec6
  FROM tiered GROUP BY decile
),
curve AS (
  SELECT *,
         SUM(dec6) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cum6,
         SUM(dec6) OVER () AS tot6
  FROM per_decile
)
SELECT CAST(decile AS INT) AS decile,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(dec6 AS DOUBLE) / 1000000 AS decile_revenue,
       {_LORENZ_SHARE} AS cum_revenue_share
FROM curve
"""


@register(
    "lorenz_curve_deciles",
    _LORENZ_ORACLE,
    "Lorenz curve at decile resolution: customers sorted by exact "
    "spend into NTILE(10), each decile's exact revenue, and the "
    "cumulative share (ratio of exact scaled BIGINTs — both under "
    "2^53, so the doubles agree bitwise). Reads directly against "
    "gini_hhi_concentration: 'the bottom half of customers carry X% "
    "of revenue'. The ten-row windows run over the already-reduced "
    "decile table; the per-customer NTILE rides the distributed "
    "two-pass rank (operators/ranking.py), so no single-task window "
    "ever sees the customer table.",
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec
    from data_lakehouse_platform_spark.operators.ranking import (
        with_global_ntile,
    )

    from pyspark import StorageLevel

    from data_lakehouse_platform_spark.catalog import (
        input_scaled_partitions,
    )

    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("bigint").alias("spend6"))
        # the decile cut passes re-read this aggregate 3x — persist the
        # reduction at input-scaled width (r11, guide §5)
        .repartition(input_scaled_partitions(sf_dir, "orders"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # r11 (guide §1.2): NTILE-only consumer — 9 cut rows by rank
    # selection + comparison projection instead of ranking every
    # customer (see with_global_ntile's equivalence proof).
    tiered = with_global_ntile(
        cust, [("spend6", False), ("o_custkey", False)], 10, "decile"
    )
    per_decile = tiered.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("spend6").alias("dec6")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    curve = per_decile.select(
        "*",
        F.sum("dec6").over(wc).alias("cum6"),
        F.sum("dec6").over(wt).alias("tot6"),
    )
    return curve.selectExpr(
        "CAST(decile AS INT) AS decile",
        "CAST(n_customers AS BIGINT) AS n_customers",
        "CAST(dec6 AS DOUBLE) / 1000000 AS decile_revenue",
        f"{_LORENZ_SHARE} AS cum_revenue_share",
    )
