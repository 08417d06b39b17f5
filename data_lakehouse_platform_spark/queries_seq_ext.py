"""Sequence / cohort-movement analytics + ML-pipeline utilities:
gaps-and-islands activity streaks, month-over-month rank movement,
inter-purchase gap statistics, deterministic stratified k-fold
assignment, and hot-key skew diagnostics.

Determinism notes (house rules, see functions/money.py):

* every revenue aggregate is an exact fixed-point DECIMAL sum;
* every ranking carries a unique tiebreaker key;
* every float ratio is ONE shared expression over identical integer
  operands, so both engines compute bit-identical doubles;
* fold assignment hashes md5 hex through an explicit hex-digit →
  value map (`strpos`/`instr`), never engine-specific hash().

Reference analog: the reference's dashboards aggregate gold fact
tables by calendar period (show_gold_tables.py); these queries extend
that surface with the sequence/rank analytics a product team would
run on the same star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.functions.money import dec, dec_sum, sql_sum
from data_lakehouse_platform_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Longest consecutive-day activity streak per user (gaps-and-islands)
# ----------------------------------------------------------------------------
# day - row_number() is constant within a run of consecutive days, so
# one window pass + two cheap aggregations find every island without a
# self-join. The per-user window partitions by a high-cardinality key,
# so at 100 TB the sort is many small per-user sorts, not a global one.

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
  FROM days
),
runs AS (
  SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY user_id, grp
),
longest AS (
  SELECT user_id, MAX(len) AS streak_days FROM runs GROUP BY user_id
)
SELECT streak_days, COUNT(*) AS n_users, MIN(user_id) AS example_user
FROM longest GROUP BY streak_days ORDER BY streak_days
"""


@register(
    "activity_streaks",
    _STREAK_ORACLE,
    "Longest consecutive-day activity streak per user via the gaps-and-"
    "islands trick (day minus row_number is run-constant), reduced to a "
    "streak-length histogram. One per-user window pass + two "
    "aggregations, no self-join — scales as a plain per-key sort on a "
    "1000-executor cluster.",
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single per-user pass: instead of grouping by the island key
    # (which would force a second full-data exchange on (user, grp)),
    # track the ROW NUMBER of the current island's start as a running
    # max — position-in-island = rn - start_rn + 1, and the longest
    # streak is its per-user max, computed WITHOUT leaving the user_id
    # partitioning (3 exchanges total, all but the distinct tiny).
    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    # The running max is ordered by rn (same order as day) so the
    # second window works on flagged's projection directly.
    run = Window.partitionBy("user_id").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = days.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.when(
            F.lag("day").over(w).isNull()
            | (F.datediff(F.col("day"), F.lag("day").over(w)) > 1),
            F.row_number().over(w),
        ).alias("start_rn_or_null"),
    )
    pos = flagged.select(
        "user_id",
        (
            F.col("rn")
            - F.max("start_rn_or_null").over(run)
            + 1
        ).alias("pos"),
    )
    longest = pos.groupBy("user_id").agg(F.max("pos").alias("streak_days"))
    return (
        longest.groupBy("streak_days")
        .agg(
            F.count("*").alias("n_users"),
            F.min("user_id").alias("example_user"),
        )
        .orderBy("streak_days")
    )


# ----------------------------------------------------------------------------
# Month-over-month product revenue rank movement (leaderboard churn)
# ----------------------------------------------------------------------------

_RANKMOVE_ORACLE = f"""
WITH rev AS (
  SELECT date_trunc('month', l_shipdate) AS month, l_partkey,
         {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT month, l_partkey, revenue,
         ROW_NUMBER() OVER (PARTITION BY month ORDER BY revenue DESC, l_partkey) AS rnk
  FROM rev
),
moved AS (
  SELECT month, l_partkey, revenue, rnk,
         LAG(rnk) OVER (PARTITION BY l_partkey ORDER BY month) AS prev_rnk
  FROM ranked
)
SELECT month, l_partkey, revenue, rnk, prev_rnk,
       prev_rnk - rnk AS rank_delta
FROM moved WHERE rnk <= 10
ORDER BY month, rnk
"""


@register(
    "rank_change_months",
    _RANKMOVE_ORACLE,
    "Monthly product-revenue leaderboard with rank movement vs the "
    "part's previous active month (LAG over a ROW_NUMBER ranking, "
    "unique part-key tiebreak on exact fixed-point revenue). Two "
    "window passes on different keys — month-partitioned rank, then "
    "part-partitioned lag — each a bounded per-key sort at scale.",
)
def rank_change_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy(
            # F.trunc returns DATE (DuckDB's date_trunc('month') is DATE too).
            F.trunc("l_shipdate", "month").alias("month"),
            "l_partkey",
        ).agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w_rank = Window.partitionBy("month").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    w_lag = Window.partitionBy("l_partkey").orderBy("month")
    return (
        rev.withColumn("rnk", F.row_number().over(w_rank))
        .withColumn("prev_rnk", F.lag("rnk").over(w_lag))
        .where(F.col("rnk") <= 10)
        .select(
            "month",
            "l_partkey",
            "revenue",
            "rnk",
            "prev_rnk",
            (F.col("prev_rnk") - F.col("rnk")).alias("rank_delta"),
        )
        .orderBy("month", "rnk")
    )


# ----------------------------------------------------------------------------
# Inter-purchase gap statistics per nation
# ----------------------------------------------------------------------------
# Gap = days between a customer's consecutive orders (LAG, unique
# (orderdate, orderkey) ordering). Aggregated to nation level with
# exact integer moments; the single avg division is the same IEEE op
# in both engines.

_INTERPURCHASE_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderdate,
         LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
  FROM orders
),
gaps AS (
  SELECT o_custkey, date_diff('day', prev_date, o_orderdate) AS gap_days
  FROM seq WHERE prev_date IS NOT NULL
)
SELECT n.n_name,
       COUNT(*) AS n_gaps,
       MIN(gap_days) AS min_gap_days,
       MAX(gap_days) AS max_gap_days,
       CAST(SUM(CAST(gap_days AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS avg_gap_days
FROM gaps g
JOIN customer c ON g.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register(
    "interpurchase_gaps",
    _INTERPURCHASE_ORACLE,
    "Inter-purchase gap statistics: days between each customer's "
    "consecutive orders (per-customer LAG with unique ordering), "
    "rolled up per nation with exact integer moments and one shared "
    "avg division. The window partitions on the high-cardinality "
    "customer key; the dim joins are broadcast.",
)
def interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .where(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("gap_days"),
        )
    )
    return (
        gaps.join(F.broadcast(cust), gaps.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
            (
                F.sum(F.col("gap_days").cast("decimal(38,0)")).cast("double")
                / F.count("*")
            ).alias("avg_gap_days"),
        )
        .orderBy("n_name")
    )


# ----------------------------------------------------------------------------
# Deterministic stratified k-fold assignment (train/validation splits)
# ----------------------------------------------------------------------------
# fold(doc) = (16*v(h1) + v(h2)) mod K over the first two hex digits of
# md5(doc_id), where v() is an explicit hex-digit lookup via strpos —
# portable across engines, reproducible across runs, no sampling state.

_KFOLD_K = 5

_KFOLD_ORACLE = f"""
WITH folded AS (
  SELECT lang, n_chars,
         ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % {_KFOLD_K} AS fold
  FROM documents
)
SELECT lang, fold, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM folded GROUP BY lang, fold ORDER BY lang, fold
"""


@register(
    "kfold_assign",
    _KFOLD_ORACLE,
    f"Deterministic stratified {_KFOLD_K}-fold assignment: fold = "
    "(first two md5(doc_id) hex digits as an integer) mod K via an "
    "explicit hex-digit strpos map (portable, no engine hash()). "
    "Per-stratum per-fold counts prove near-even splits. Pure map + "
    "one aggregation — embarrassingly parallel at any scale, and the "
    "same row lands in the same fold on every engine and every rerun.",
)
def kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fold = F.expr(
        "((instr('0123456789abcdef', substring(md5(cast(cast(doc_id as string) as binary)), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(md5(cast(cast(doc_id as string) as binary)), 2, 1)) - 1))"
        f" % {_KFOLD_K}"
    )
    return (
        docs.withColumn("fold", fold)
        .groupBy("lang", "fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang", "fold")
    )


# ----------------------------------------------------------------------------
# Hot-key skew diagnostics (the pre-flight check for salted aggs/joins)
# ----------------------------------------------------------------------------
# Surfaces the top heavy keys with exact ppm share plus a global skew
# ratio (max key count / mean key count). This is the profile you run
# BEFORE choosing a salting factor for skew_salted_agg / AQE skew join.

_SKEW_ORACLE = """
WITH counts AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(n_rows) AS BIGINT) AS max_rows
  FROM counts
)
SELECT c.user_id, c.n_rows,
       CAST(FLOOR(CAST(c.n_rows AS DOUBLE) * 1000000 / t.total_rows) AS BIGINT) AS share_ppm,
       CAST(t.max_rows AS DOUBLE) * t.n_keys / t.total_rows AS skew_ratio
FROM counts c CROSS JOIN tot t
ORDER BY c.n_rows DESC, c.user_id
LIMIT 10
"""


@register(
    "key_skew_profile",
    _SKEW_ORACLE,
    "Hot-key skew profile over events.user_id: top-10 heavy keys with "
    "exact integer ppm share, plus the global skew ratio "
    "(max/mean key count) as one shared double expression. The 1-row "
    "global aggregate is cross-joined back (broadcast); this is the "
    "diagnostic that sizes salting factors before a skewed join/agg.",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _t(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("n_rows"))
    )
    tot = counts.agg(
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("n_rows").cast("bigint").alias("max_rows"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_rows",
            F.floor(
                F.col("n_rows").cast("double") * 1000000 / F.col("total_rows")
            )
            .cast("bigint")
            .alias("share_ppm"),
            (
                F.col("max_rows").cast("double")
                * F.col("n_keys")
                / F.col("total_rows")
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), F.asc("user_id"))
        .limit(10)
    )


# ----------------------------------------------------------------------------
# Regular-grid resample + LINEAR interpolation (complements resample_ffill)
# ----------------------------------------------------------------------------
# Knot values are fixed-point units (floor(value*1e6) as int64); the
# interpolated value floor((pv*dn + nv*dp)/(dn+dp)) keeps the numerator
# an exact int64 product (<2^53, so the one double division and floor
# are bit-identical in both engines). Edges (before first / after last
# knot) stay NULL — interpolation, not extrapolation.

_INTERP_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(FLOOR(MAX(value) * 1000000) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM bounds
),
joined AS (
  SELECT g.user_id, g.day, daily.v
  FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day
),
knots AS (
  SELECT user_id, day, v,
    LAST_VALUE(v IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
    FIRST_VALUE(v IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM joined
)
SELECT user_id, day,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
         CAST(FLOOR((pv * date_diff('day', day, nd) + nv * date_diff('day', pd, day))
                    / date_diff('day', pd, nd)) AS BIGINT)
  END AS interp_units,
  CAST(v IS NULL AS INT) AS is_gap
FROM knots
"""


@register(
    "resample_interpolate",
    _INTERP_ORACLE,
    "Daily-grid resample with LINEAR interpolation between knots "
    "(resample_ffill's sibling for continuous measures): per-user grid "
    "via sequence+explode, prev/next knot located with "
    "last/first_value(IGNORE NULLS), and the interpolated value "
    "computed as an exact int64 weighted numerator with one shared "
    "double division + floor. Edges remain NULL (no extrapolation). "
    "One user-partitioned window pass each direction — per-key sorts, "
    "no global ordering, scales like any keyed window at 100 TB.",
)
def resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.expr("CAST(FLOOR(MAX(value) * 1000000) AS BIGINT)").alias("v"))
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_knot = F.when(F.col("v").isNotNull(), F.col("day"))
    knots = joined.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(day_if_knot, ignorenulls=True).over(back).alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(day_if_knot, ignorenulls=True).over(fwd).alias("nd"),
    )
    return knots.selectExpr(
        "user_id",
        "day",
        "CASE WHEN v IS NOT NULL THEN v "
        "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
        "CAST(FLOOR((pv * datediff(nd, day) + nv * datediff(day, pd)) "
        "/ datediff(nd, pd)) AS BIGINT) END AS interp_units",
        "CAST(v IS NULL AS INT) AS is_gap",
    )


# ----------------------------------------------------------------------------
# Time-bounded conversion funnel (ClickHouse windowFunnel semantics)
# ----------------------------------------------------------------------------

_WFUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.view_ts
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts
  GROUP BY e.user_id
),
flat AS (
  SELECT u.user_id, s1.view_ts, s3.purchase_ts,
         CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END AS hit2,
         CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END AS hit3
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN view_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(hit2) AS BIGINT) AS n_click_chain,
       CAST(SUM(hit3) AS BIGINT) AS n_purchase_chain,
       CAST(SUM(CASE WHEN hit3 = 1
                AND purchase_ts <= view_ts + INTERVAL 1 HOUR
           THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_1h
FROM flat
"""


@register(
    "windowfunnel_1h",
    _WFUNNEL_ORACLE,
    "Time-bounded ordered funnel (ClickHouse windowFunnel semantics): "
    "the strictly-increasing view->click->purchase chain of "
    "funnel_steps, plus the conversion-deadline gate purchase within "
    "1 hour of the anchoring view. Three keyed min-aggregations and "
    "co-partitioned user_id joins — no per-user event sort, no "
    "collect_list buffering; the chain prunes at each step so later "
    "joins shrink at scale.",
)
def windowfunnel_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("view_ts")
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    flat = (
        ev.select("user_id")
        .distinct()
        .join(s1, "user_id", "left")
        .join(s2.withColumn("hit2", F.lit(1)), "user_id", "left")
        .join(s3.withColumn("hit3", F.lit(1)), "user_id", "left")
    )
    return flat.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("view_ts").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.coalesce(F.col("hit2"), F.lit(0))).alias("n_click_chain"),
        F.sum(F.coalesce(F.col("hit3"), F.lit(0))).alias("n_purchase_chain"),
        F.sum(
            F.when(
                F.col("hit3").isNotNull()
                & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
                1,
            ).otherwise(0)
        ).alias("n_converted_1h"),
    )


# ----------------------------------------------------------------------------
# Audience overlap matrix across event types (co-engagement Jaccard)
# ----------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
sz AS (SELECT event_type, COUNT(*) AS n FROM ue GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ue a JOIN ue b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both,
       sa.n AS n_a, sb.n AS n_b,
       CAST(p.n_both AS DOUBLE) / (sa.n + sb.n - p.n_both) AS jaccard
FROM pairs p
JOIN sz sa ON p.type_a = sa.event_type
JOIN sz sb ON p.type_b = sb.event_type
ORDER BY p.type_a, p.type_b
"""


@register(
    "event_type_overlap",
    _OVERLAP_ORACLE,
    "Audience overlap matrix: for every event-type pair, how many "
    "users do both, with Jaccard overlap from one shared double "
    "division. The self-join runs on deduplicated (user, type) pairs "
    "co-partitioned by user — per-user width is bounded by the type "
    "vocabulary (a handful), so pair blowup is capped and the shuffle "
    "stays linear in users at 100 TB; type-size lookups broadcast.",
)
def event_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ue = _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    sz = ue.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ue.select(F.col("user_id"), F.col("event_type").alias("type_a"))
    b = ue.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, (a.user_id == b.uid_b) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), pairs.type_a == sa.ta)
        .join(F.broadcast(sb), pairs.type_b == sb.tb)
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ----------------------------------------------------------------------------
# Tukey IQR outlier fences per segment (robust outlier gate)
# ----------------------------------------------------------------------------
# Q1/Q3 come from the same interpolated-order-statistic machinery as
# percentile_cont_portable; the fence arithmetic and the fence
# comparisons are shared double expressions, so both engines flag the
# same rows.

_IQR_VALUE_EXPR = "v_lo + (pos - FLOOR(pos)) * (v_hi - v_lo)"

_IQR_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority AS priority, o_totalprice AS v,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
         ) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
ps AS (SELECT * FROM (VALUES (0.25), (0.75)) t(p)),
grid AS (
  SELECT DISTINCT priority, n, p, CAST(p AS DOUBLE) * (n - 1) AS pos
  FROM ranked, ps
),
lohi AS (
  SELECT g.priority, g.p, g.pos, lo.v AS v_lo, hi.v AS v_hi
  FROM grid g
  JOIN ranked lo ON lo.priority = g.priority
                AND lo.rn = CAST(FLOOR(g.pos) AS BIGINT) + 1
  JOIN ranked hi ON hi.priority = g.priority
                AND hi.rn = CAST(CEIL(g.pos) AS BIGINT) + 1
),
q AS (
  SELECT priority,
         MAX(CASE WHEN p = 0.25 THEN {_IQR_VALUE_EXPR} END) AS q1,
         MAX(CASE WHEN p = 0.75 THEN {_IQR_VALUE_EXPR} END) AS q3
  FROM lohi GROUP BY priority
),
f AS (
  SELECT priority, q1, q3,
         q1 - 1.5 * (q3 - q1) AS lo_fence,
         q3 + 1.5 * (q3 - q1) AS hi_fence
  FROM q
)
SELECT f.priority, f.q1, f.q3, f.lo_fence, f.hi_fence,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o.o_totalprice < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN o.o_totalprice > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM orders o JOIN f ON o.o_orderpriority = f.priority
GROUP BY 1, 2, 3, 4, 5
ORDER BY f.priority
"""


@register(
    "iqr_outlier_fences",
    _IQR_ORACLE,
    "Tukey outlier gate: interpolated Q1/Q3 per order priority (the "
    "percentile_cont_portable machinery), 1.5*IQR fences as one shared "
    "double expression, then a broadcast join back over orders counts "
    "rows outside each fence. Robust-statistics screening with zero "
    "engine-specific percentile quirks; two scans + one tiny broadcast "
    "— the second scan streams, nothing is materialized per group.",
)
def iqr_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from data_lakehouse_platform_spark.operators.ranking import (
        select_group_ranks,
    )

    od = _t(spark, sf_dir, "orders")
    # r10 optimization: the SELECTION twin (select_group_ranks) instead
    # of the full grouped rank — only the buckets containing a Q1/Q3
    # bracketing rank flow through a window (~4 ranks of 64 buckets per
    # group), where the previous form persisted the whole projected
    # table, ranked EVERY row, aggregated a separate `counts` scan of
    # orders and broadcast-joined a roles grid against the full ranked
    # stream (plan audit: orders scanned 3x, 18 jobs).  Group sizes
    # ride out of the operator's driver-side stats pass (n_col), so
    # the counts subtree disappears entirely.
    def _ranks(n: int):
        want = set()
        for p in (0.25, 0.75):
            pos = p * (n - 1)
            want.add(int(math.floor(pos)) + 1)
            want.add(int(math.ceil(pos)) + 1)
        return want

    sel = select_group_ranks(
        od.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("v"),
            "o_orderkey",
        ),
        ["priority"],
        [F.col("v"), F.col("o_orderkey")],
        bucket_key=F.col("v"),
        ranks_fn=_ranks,
        rn_col="rn",
        n_col="n",
    ).select("priority", "v", "rn", "n")

    # Interpolated endpoints exactly as the oracle's _IQR_VALUE_EXPR:
    # pos = CAST(p AS DOUBLE) * (n - 1); v_lo at rank floor(pos)+1,
    # v_hi at rank ceil(pos)+1 — identical double arithmetic, so the
    # quantiles (and the fences derived from them) match bit for bit.
    def _pos(p: float):
        return F.lit(p) * (F.col("n") - 1)

    def _pick(p: float, which: str):
        rk = (
            (F.floor(_pos(p)) + 1)
            if which == "lo"
            else (F.ceil(_pos(p)) + 1)
        )
        return F.max(F.when(F.col("rn") == rk.cast("bigint"), F.col("v")))

    lohi = sel.groupBy("priority").agg(
        F.max("n").alias("n"),
        _pick(0.25, "lo").alias("v_lo_25"),
        _pick(0.25, "hi").alias("v_hi_25"),
        _pick(0.75, "lo").alias("v_lo_75"),
        _pick(0.75, "hi").alias("v_hi_75"),
    )

    def _interp(p: float, lo: str, hi: str):
        pos = _pos(p)
        return F.col(lo) + (pos - F.floor(pos)) * (F.col(hi) - F.col(lo))

    q = lohi.select(
        "priority",
        _interp(0.25, "v_lo_25", "v_hi_25").alias("q1"),
        _interp(0.75, "v_lo_75", "v_hi_75").alias("q3"),
    )
    fences = q.selectExpr(
        "priority",
        "q1",
        "q3",
        "q1 - 1.5 * (q3 - q1) AS lo_fence",
        "q3 + 1.5 * (q3 - q1) AS hi_fence",
    )
    return (
        od.join(F.broadcast(fences), od.o_orderpriority == fences.priority)
        .groupBy("priority", "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("o_totalprice") < F.col("lo_fence"), 1).otherwise(0)
            ).alias("n_low"),
            F.sum(
                F.when(F.col("o_totalprice") > F.col("hi_fence"), 1).otherwise(0)
            ).alias("n_high"),
        )
        .orderBy("priority")
    )


# ----------------------------------------------------------------------------
# Freshness / staleness DQ sweep (pipeline-liveness check)
# ----------------------------------------------------------------------------

_FRESHNESS_ORACLE = """
WITH per_type AS (
  SELECT event_type, COUNT(*) AS n_rows, MAX(ts) AS last_seen
  FROM events GROUP BY event_type
),
g AS (SELECT MAX(ts) AS global_last FROM events)
SELECT p.event_type, p.n_rows, p.last_seen,
       date_diff('day', CAST(p.last_seen AS DATE), CAST(g.global_last AS DATE)) AS days_stale,
       CAST(date_diff('day', CAST(p.last_seen AS DATE), CAST(g.global_last AS DATE)) > 7 AS INT) AS is_stale
FROM per_type p CROSS JOIN g
ORDER BY p.event_type
"""


@register(
    "dq_freshness",
    _FRESHNESS_ORACLE,
    "Freshness DQ sweep: per event stream, last-seen timestamp and "
    "staleness in days against the table's own high-water mark, with "
    "a >7d stale flag. Two cheap aggregations (per-type and global "
    "1-row, cross-joined broadcast) — the liveness check the "
    "reference's validation layer runs before trusting a bronze load "
    "(bronze_validation.py row-count checks generalized to recency).",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"), F.max("ts").alias("last_seen")
    )
    # Global high-water = max over the per-type aggregate (a handful of
    # rows), via an unpartitioned window — one scan of events instead
    # of two; the window input is type-vocabulary sized, never large.
    g = per_type.withColumn(
        "global_last", F.max("last_seen").over(Window.partitionBy())
    )
    stale = F.datediff(F.to_date("global_last"), F.to_date("last_seen"))
    return (
        g
        .select(
            "event_type",
            "n_rows",
            "last_seen",
            stale.alias("days_stale"),
            (stale > 7).cast("int").alias("is_stale"),
        )
        .orderBy("event_type")
    )


# ----------------------------------------------------------------------------
# Weighted Bernoulli sampling with an EXACT integer acceptance test
# ----------------------------------------------------------------------------
# P(doc) = n_chars / (2 * max_chars). The acceptance test
#   hk32 * 2 * max_chars < n_chars * 2^32
# is pure int64 arithmetic (no float probability, no RNG state), so
# the same doc is accepted on every engine, every run, any partitioning
# — reproducible length-weighted corpus downsampling.

_WSAMPLE_ORACLE = """
WITH hashed AS (
  SELECT doc_id, lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hk
  FROM documents
),
g AS (SELECT CAST(MAX(n_chars) AS BIGINT) AS max_chars FROM documents)
SELECT lang,
       COUNT(*) AS n_docs_total,
       CAST(SUM(CASE WHEN h.hk * 2 * g.max_chars < h.n_chars * 4294967296 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN h.hk * 2 * g.max_chars < h.n_chars * 4294967296 THEN h.n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
FROM hashed h CROSS JOIN g
GROUP BY lang ORDER BY lang
"""


@register(
    "sample_weighted",
    _WSAMPLE_ORACLE,
    "Length-weighted Bernoulli sampling (P proportional to n_chars) "
    "decided by an exact int64 comparison of an md5-derived uniform "
    "against the scaled weight — no RNG, no floats, identical keep "
    "set on every engine/run/partitioning. Per-language totals audit "
    "the expected size. One scan + broadcast of the 1-row max; the "
    "reproducible mix-rebalancing primitive for corpus curation.",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hashed = docs.select(
        "lang",
        "n_chars",
        F.expr(
            "cast(conv(substring(md5(cast(cast(doc_id as string) as binary)), 1, 8), 16, 10) as bigint)"
        ).alias("hk"),
    )
    g = docs.agg(F.max("n_chars").cast("bigint").alias("max_chars"))
    keep = (F.col("hk") * 2 * F.col("max_chars")) < (F.col("n_chars") * F.lit(4294967296))
    return (
        hashed.crossJoin(F.broadcast(g))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_total"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("sampled_chars"),
        )
        .orderBy("lang")
    )


# ----------------------------------------------------------------------------
# ABC inventory classification (Pareto revenue classes)
# ----------------------------------------------------------------------------
# Cumulative-share cuts are INTEGER comparisons on exact fixed-point
# revenue (cum*100 <= tot*80), so class boundaries can't drift between
# engines. The ordered cumsum runs over the part-level aggregate
# (|parts| << |lineitem|), same posture as lorenz_curve_deciles.

_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000) AS DECIMAL(28,0))) AS r
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(r) AS DECIMAL(38,0)) AS t FROM rev),
ranked AS (
  SELECT l_partkey, r,
         CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cum
  FROM rev
),
classed AS (
  SELECT l_partkey, r,
         CASE WHEN cum * 100 <= t * 80 THEN 'A'
              WHEN cum * 100 <= t * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked CROSS JOIN tot
)
SELECT abc_class,
       COUNT(*) AS n_parts,
       CAST(SUM(r) AS DOUBLE) / 1000000 AS class_revenue,
       CAST(CAST(SUM(r) AS DECIMAL(38,0)) AS DOUBLE) / (SELECT CAST(t AS DOUBLE) FROM tot) AS revenue_share
FROM classed GROUP BY abc_class ORDER BY abc_class
"""


@register(
    "abc_classification",
    _ABC_ORACLE,
    "ABC (Pareto) classification: parts ranked by exact fixed-point "
    "revenue, classes cut at 80%/95% of cumulative share with integer "
    "comparisons (cum*100 <= tot*80 — no float thresholds to drift). "
    "The ordered cumsum rides the distributed two-pass rank "
    "(operators/ranking.py): bucketed partitioned cumsums + broadcast "
    "bucket offsets, and the grand total falls out of the same "
    "bucket-stats pass — one materialized part-level aggregate, no "
    "unpartitioned window, no re-run of the lineitem scan.",
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.ranking import with_global_rank

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.expr(
            "SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000) "
            "AS DECIMAL(28,0)))"
        ).alias("r")
    )
    ranked, st = with_global_rank(
        rev,
        [F.desc("r"), F.asc("l_partkey")],
        bucket_key=-F.col("r"),
        cum_col="cum",
        weight=F.col("r"),
        weight_type="decimal(38,0)",
    )
    ranked = ranked.withColumn("t", F.lit(st.weight_sum).cast("decimal(38,0)"))
    classed = ranked.selectExpr(
        "l_partkey",
        "r",
        "t",
        "CASE WHEN cum * 100 <= t * 80 THEN 'A' "
        "WHEN cum * 100 <= t * 95 THEN 'B' ELSE 'C' END AS abc_class",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.expr("CAST(SUM(r) AS DOUBLE) / 1000000").alias("class_revenue"),
            F.expr(
                "CAST(CAST(SUM(r) AS DECIMAL(38,0)) AS DOUBLE) / CAST(MIN(t) AS DOUBLE)"
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# ----------------------------------------------------------------------------
# Churn hazard curve (discrete survival analysis on order tenure)
# ----------------------------------------------------------------------------

_HAZARD_ORACLE = """
WITH cm AS (
  SELECT o_custkey,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym
  FROM orders
),
t AS (
  SELECT o_custkey, MAX(ym) - MIN(ym) AS tenure FROM cm GROUP BY o_custkey
),
h AS (SELECT tenure, COUNT(*) AS n_ended FROM t GROUP BY tenure)
SELECT tenure AS tenure_months, n_ended,
       CAST(SUM(n_ended) OVER (ORDER BY tenure DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_risk,
       CAST(n_ended AS DOUBLE) / SUM(n_ended) OVER (ORDER BY tenure DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hazard
FROM h ORDER BY tenure
"""


@register(
    "churn_hazard_curve",
    _HAZARD_ORACLE,
    "Discrete survival analysis: customer tenure in months (first to "
    "last order, integer year*12+month arithmetic — no months_between "
    "float quirks), ended-at-k counts, at-risk counts via a reverse "
    "cumulative sum, hazard = ended/at_risk as one shared division. "
    "Per-customer aggregation shuffles once; the curve itself is "
    "tenure-bucket sized (tiny) so its ordered window is free.",
)
def churn_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cm = od.selectExpr(
        "o_custkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym",
    )
    t = cm.groupBy("o_custkey").agg((F.max("ym") - F.min("ym")).alias("tenure"))
    h = t.groupBy("tenure").agg(F.count("*").alias("n_ended"))
    w = (
        Window.orderBy(F.desc("tenure"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        h.select(
            F.col("tenure").alias("tenure_months"),
            "n_ended",
            F.sum("n_ended").over(w).alias("n_at_risk"),
            (F.col("n_ended").cast("double") / F.sum("n_ended").over(w)).alias(
                "hazard"
            ),
        )
        .orderBy("tenure_months")
    )


# ----------------------------------------------------------------------------
# Bigram collocation lift (PMI's rational twin, oracle-exact)
# ----------------------------------------------------------------------------
# lift(x,y) = P(xy) / (P(x)P(y)) = c_xy * N^2 / (M * c_x * c_y): all
# operands exact integer counts, one shared double expression — the
# collocation salience score without a transcendental log (log-PMI
# would differ in the last ulp across libm implementations).

_LIFT_MINSUP = 5
_LIFT_TOPK = 20
_LIFT_EXPR = (
    "CAST(c_xy AS DOUBLE) * n_uni * n_uni / (CAST(m_bi AS DOUBLE) * c_x * c_y)"
)


def _lift_oracle() -> str:
    from data_lakehouse_platform_spark.operators.text import sql_normalize_ws

    return f"""
WITH norm_docs AS (
  SELECT doc_id, string_split({sql_normalize_ws('text')}, ' ') AS toks
  FROM documents
),
uni AS (
  SELECT unnest(toks) AS tok FROM norm_docs
),
uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
un AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uc),
bi AS (
  SELECT unnest(
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
         ELSE [] END) AS ngram
  FROM norm_docs
),
bc AS (SELECT ngram, COUNT(*) AS c_xy FROM bi GROUP BY ngram HAVING COUNT(*) >= {_LIFT_MINSUP}),
bn AS (SELECT CAST(SUM(CAST(c_xy AS BIGINT)) AS BIGINT) AS m_bi FROM (SELECT COUNT(*) AS c_xy FROM bi GROUP BY ngram) raw),
scored AS (
  SELECT b.ngram, b.c_xy, x.c AS c_x, y.c AS c_y, un.n_uni, bn.m_bi,
         {_LIFT_EXPR} AS lift
  FROM bc b
  JOIN uc x ON string_split(b.ngram, ' ')[1] = x.tok
  JOIN uc y ON string_split(b.ngram, ' ')[2] = y.tok
  CROSS JOIN un CROSS JOIN bn
)
SELECT ngram, c_xy, c_x, c_y, lift FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, ngram) AS rn FROM scored
) t WHERE rn <= {_LIFT_TOPK}
"""


@register(
    "bigram_lift",
    _lift_oracle(),
    "Collocation mining: bigram lift = P(xy)/(P(x)P(y)) from exact "
    "corpus counts via one shared double expression (the rational twin "
    "of PMI — no transcendental log, so both engines rank identically "
    "with a unique ngram tiebreak). Min-support gate bounds the join "
    "fan-in; unigram-count joins key on the vocabulary (bounded), "
    "totals broadcast as 1-row aggregates.",
)
def bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.ws_tokens("text").alias("__toks"))
    uni = toks.select(F.explode("__toks").alias("tok"))
    # Corpus totals ride the vocab-sized aggregates as unpartitioned
    # windows (vocabulary is bounded, so the single-partition window is
    # cheap) — each n-gram order explodes and aggregates exactly ONCE
    # instead of re-running for its 1-row total.
    uc = (
        uni.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .withColumn("n_uni", F.sum("c").over(Window.partitionBy()).cast("bigint"))
    )
    bi = toks.select(F.explode(T.shingle_expr("__toks", 2)).alias("ngram"))
    bc_all = bi.groupBy("ngram").agg(F.count("*").alias("c_xy")).withColumn(
        "m_bi", F.sum("c_xy").over(Window.partitionBy()).cast("bigint")
    )
    bc = bc_all.where(F.col("c_xy") >= _LIFT_MINSUP)
    x = uc.select(
        F.col("tok").alias("xt"), F.col("c").alias("c_x"), F.col("n_uni")
    )
    y = uc.select(F.col("tok").alias("yt"), F.col("c").alias("c_y"))
    scored = (
        bc.withColumn("w1", F.split(F.col("ngram"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("ngram"), " ").getItem(1))
        .join(x, F.col("w1") == F.col("xt"))
        .join(y, F.col("w2") == F.col("yt"))
        .withColumn("lift", F.expr(_LIFT_EXPR))
    )
    return (
        scored.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("lift"), F.asc("ngram")))
        )
        .where(F.col("rn") <= _LIFT_TOPK)
        .select("ngram", "c_xy", "c_x", "c_y", "lift")
    )


# ----------------------------------------------------------------------------
# Supplier scorecard (fulfillment KPIs per supplier, top-20 by revenue)
# ----------------------------------------------------------------------------

_SCORECARD_ORACLE = f"""
WITH lagged AS (
  SELECT l.l_suppkey,
         l.l_extendedprice * (1 - l.l_discount) AS rev,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_supp AS (
  SELECT l_suppkey,
         COUNT(*) AS n_shipments,
         {sql_sum('rev')} AS revenue,
         MIN(lag_days) AS min_lag_days,
         MAX(lag_days) AS max_lag_days,
         CAST(SUM(CAST(lag_days AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS avg_lag_days
  FROM lagged GROUP BY l_suppkey
)
SELECT s.s_name, n.n_name, p.n_shipments, p.revenue,
       p.min_lag_days, p.max_lag_days, p.avg_lag_days
FROM per_supp p
JOIN supplier s ON p.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY p.revenue DESC, s.s_name
LIMIT 20
"""


@register(
    "supplier_scorecard",
    _SCORECARD_ORACLE,
    "Supplier fulfillment scorecard: revenue (exact fixed-point) plus "
    "order-to-ship lag stats (min/max/avg from exact integer day "
    "moments) per supplier, enriched with broadcast supplier/nation "
    "dims, top-20 by revenue with a unique name tiebreak. One "
    "co-partitioned lineitem-orders shuffle join feeds a supplier-"
    "keyed aggregation — the operational-KPI rollup the reference's "
    "gold layer serves to dashboards.",
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    lagged = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag_days"),
    )
    per_supp = lagged.groupBy("l_suppkey").agg(
        F.count("*").alias("n_shipments"),
        dec_sum("rev", "revenue"),
        F.min("lag_days").alias("min_lag_days"),
        F.max("lag_days").alias("max_lag_days"),
        (
            F.sum(F.col("lag_days").cast("decimal(38,0)")).cast("double")
            / F.count("*")
        ).alias("avg_lag_days"),
    )
    return (
        per_supp.join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_name",
            "n_name",
            "n_shipments",
            "revenue",
            "min_lag_days",
            "max_lag_days",
            "avg_lag_days",
        )
        .orderBy(F.desc("revenue"), F.asc("s_name"))
        .limit(20)
    )


# ----------------------------------------------------------------------------
# NTH_VALUE window coverage: a customer's 1st/2nd/3rd order values
# ----------------------------------------------------------------------------

_NTHVAL_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders,
         NTH_VALUE(o_totalprice, 1) OVER w AS first_price,
         NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
         NTH_VALUE(o_totalprice, 3) OVER w AS third_price
  FROM orders
  WINDOW w AS (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  )
)
SELECT o_custkey, n_orders, first_price, second_price, third_price
FROM ranked WHERE rn = 1 AND n_orders >= 2
"""


@register(
    "window_nth_value",
    _NTHVAL_ORACLE,
    "NTH_VALUE over a full frame: each repeat customer's 1st/2nd/3rd "
    "order values in one windowed pass (chronological ordering with a "
    "unique orderkey tiebreak), reduced to one row per customer via "
    "rn=1. Completes the window-function surface next to "
    "first/last/lead/lag/ntile — and shows the full-frame idiom that "
    "an unbounded-following NTH_VALUE needs to be deterministic.",
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = od.select(
        "o_custkey",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders"),
        F.nth_value("o_totalprice", 1).over(w).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    )
    return ranked.where((F.col("rn") == 1) & (F.col("n_orders") >= 2)).select(
        "o_custkey", "n_orders", "first_price", "second_price", "third_price"
    )


# ----------------------------------------------------------------------------
# Hour-of-week activity heatmap (ISO weekday x hour engagement grid)
# ----------------------------------------------------------------------------

_HEATMAP_ORACLE = """
SELECT CAST(EXTRACT(ISODOW FROM ts) AS INT) AS iso_dow,
       CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "hourly_heatmap",
    _HEATMAP_ORACLE,
    "Hour-of-week engagement heatmap: event and distinct-user counts "
    "per (ISO weekday, hour) cell — 168 output rows regardless of "
    "input size. Spark's weekday() (0=Monday) maps to ISO dow with a "
    "+1, matching DuckDB's ISODOW exactly (dayofweek() would not: it "
    "is Sunday-first). One grouped aggregation with map-side partials.",
)
def hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("iso_dow", "hour_of_day")
    )


# ----------------------------------------------------------------------------
# Language-ID confusion matrix (heuristic vs labeled truth)
# ----------------------------------------------------------------------------

def _langid_confusion_oracle() -> str:
    from data_lakehouse_platform_spark.queries_llm import _LANGID_ORACLE

    return f"""
WITH pred AS ({_LANGID_ORACLE}),
joined AS (
  SELECT d.lang AS true_lang, p.predicted_lang
  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
),
tot AS (SELECT true_lang, COUNT(*) AS n_true FROM joined GROUP BY true_lang)
SELECT j.true_lang, j.predicted_lang, COUNT(*) AS n_docs,
       CAST(COUNT(*) AS DOUBLE) / t.n_true AS row_share,
       CAST(j.true_lang = j.predicted_lang AS INT) AS is_correct
FROM joined j JOIN tot t ON j.true_lang = t.true_lang
GROUP BY j.true_lang, j.predicted_lang, t.n_true
ORDER BY j.true_lang, j.predicted_lang
"""


@register(
    "langid_confusion",
    _langid_confusion_oracle(),
    "Classifier audit: confusion matrix of the heuristic language ID "
    "against the labeled lang column, with per-truth-row shares (one "
    "shared division) and a correctness flag. Reuses text_langid's "
    "scoring CTE verbatim so the two queries can never drift apart; "
    "output is vocabulary-squared sized (tiny) regardless of corpus "
    "scale.",
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.queries_llm import text_langid

    docs = _t(spark, sf_dir, "documents").select("doc_id", F.col("lang").alias("true_lang"))
    pred = text_langid(spark, sf_dir).select("doc_id", "predicted_lang")
    joined = docs.join(pred, "doc_id").select("true_lang", "predicted_lang")
    tot = joined.groupBy("true_lang").agg(F.count("*").alias("n_true"))
    return (
        joined.groupBy("true_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .join(F.broadcast(tot), "true_lang")
        .select(
            "true_lang",
            "predicted_lang",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n_true")).alias("row_share"),
            (F.col("true_lang") == F.col("predicted_lang")).cast("int").alias(
                "is_correct"
            ),
        )
        .orderBy("true_lang", "predicted_lang")
    )


# ----------------------------------------------------------------------------
# Out-of-vocabulary rate against the corpus top-K vocabulary
# ----------------------------------------------------------------------------

_OOV_VOCAB_K = 1000


def _oov_oracle() -> str:
    from data_lakehouse_platform_spark.operators.text import sql_normalize_ws

    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split({sql_normalize_ws('text')}, ' ')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
    FROM toks GROUP BY tok
  ) v WHERE rn <= {_OOV_VOCAB_K}
),
marked AS (
  SELECT t.doc_id, t.lang,
         CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS is_oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT lang,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_tokens,
       CAST(SUM(is_oov) AS BIGINT) AS n_oov,
       CAST(SUM(is_oov) AS DOUBLE) / COUNT(*) AS oov_rate
FROM marked GROUP BY lang ORDER BY lang
"""


@register(
    "oov_rate",
    _oov_oracle(),
    f"Tokenizer-coverage audit: the corpus top-{_OOV_VOCAB_K} "
    "vocabulary (deterministic count-then-token ranking) broadcast "
    "against every token occurrence, per-language OOV rates from "
    "exact counts with one shared division. The pre-flight check "
    "before freezing a tokenizer on a corpus; vocabulary is bounded "
    "so the join is a broadcast at any corpus scale.",
)
def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(T.ws_tokens("text")).alias("tok")
    )
    # Top-K vocabulary via sort+limit (TakeOrderedAndProject — parallel
    # per-task K-heaps, driver merge) instead of row_number over an
    # unpartitioned window that would pull every distinct token through
    # one reducer at corpus scale. Tiebreak (count desc, token asc) is
    # unique, so both forms pick the identical vocabulary.
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(_OOV_VOCAB_K)
        .select("tok")
    )
    marked = toks.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left"
    ).select(
        "doc_id",
        "lang",
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("is_oov"),
    )
    return (
        marked.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_tokens"),
            F.sum("is_oov").alias("n_oov"),
            (F.sum("is_oov").cast("double") / F.count("*")).alias("oov_rate"),
        )
        .orderBy("lang")
    )


# ----------------------------------------------------------------------------
# Packing fragmentation audit (documents split across context windows)
# ----------------------------------------------------------------------------

_PACKFRAG_BUDGET = 512


def _pack_frag_oracle() -> str:
    from data_lakehouse_platform_spark.operators.text import sql_normalize_ws

    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split({sql_normalize_ws('text')}, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS okey
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY okey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM t
),
spans AS (
  SELECT doc_id, n_tokens,
         CAST(FLOOR(CAST(start_offset AS DOUBLE) / {_PACKFRAG_BUDGET}) AS BIGINT) AS first_bin,
         CAST(FLOOR(CAST(start_offset + n_tokens - 1 AS DOUBLE) / {_PACKFRAG_BUDGET}) AS BIGINT) AS last_bin
  FROM c WHERE n_tokens > 0
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN last_bin > first_bin THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
       CAST(SUM(CASE WHEN last_bin > first_bin THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS split_share,
       CAST(SUM(last_bin - first_bin + 1) AS BIGINT) AS total_bin_spans,
       CAST(MAX(last_bin - first_bin + 1) AS BIGINT) AS max_bins_spanned,
       CAST(SUM(last_bin - first_bin + 1) AS DOUBLE) / COUNT(*) AS avg_bins_spanned
FROM spans
"""


@register(
    "pack_fragmentation",
    _pack_frag_oracle(),
    f"Packing-quality audit over pack_sequences' layout: how many "
    f"documents straddle a {_PACKFRAG_BUDGET}-token context boundary "
    f"(first vs last bin of each doc's token span from the exact "
    f"distributed prefix sum), split share, and bins-spanned stats — "
    f"the attention-fragmentation cost of concat-and-chunk packing. "
    f"Same two-pass prefix-sum machinery, one extra map + one global "
    f"1-row aggregate.",
)
def pack_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import text as T
    from data_lakehouse_platform_spark.operators.packing import exclusive_prefix_sum

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(T.ws_tokens("text")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
    )
    packed = exclusive_prefix_sum(
        docs, order_col="okey", weight_col="n_tokens", out_col="start_offset"
    )
    spans = packed.where(F.col("n_tokens") > 0).selectExpr(
        "doc_id",
        "n_tokens",
        f"CAST(FLOOR(CAST(start_offset AS DOUBLE) / {_PACKFRAG_BUDGET}) AS BIGINT) AS first_bin",
        f"CAST(FLOOR(CAST(start_offset + n_tokens - 1 AS DOUBLE) / {_PACKFRAG_BUDGET}) AS BIGINT) AS last_bin",
    )
    split = F.when(F.col("last_bin") > F.col("first_bin"), 1).otherwise(0)
    span = F.col("last_bin") - F.col("first_bin") + 1
    return spans.agg(
        F.count("*").alias("n_docs"),
        F.sum(split).alias("n_split_docs"),
        (F.sum(split).cast("double") / F.count("*")).alias("split_share"),
        F.sum(span).cast("bigint").alias("total_bin_spans"),
        F.max(span).cast("bigint").alias("max_bins_spanned"),
        (F.sum(span).cast("double") / F.count("*")).alias("avg_bins_spanned"),
    )


# ----------------------------------------------------------------------------
# Numeric RANGE frame: peer-band density around every order value
# ----------------------------------------------------------------------------

_BAND = 100.0

_RANGEFRAME_ORACLE = f"""
SELECT o_orderkey, o_orderpriority AS priority, o_totalprice,
       COUNT(*) OVER (
         PARTITION BY o_orderpriority ORDER BY o_totalprice
         RANGE BETWEEN {_BAND} PRECEDING AND {_BAND} FOLLOWING
       ) - 1 AS n_peers_within_band
FROM orders
"""


@register(
    "range_frame_price_band",
    _RANGEFRAME_ORACLE,
    f"Value-based RANGE window on a numeric (not time) ordering: for "
    f"every order, how many same-priority orders fall within "
    f"±{_BAND:.0f} of its total price (self excluded) — local price-"
    f"density without a self-join or binning approximation. COUNT "
    f"over a RANGE frame is peer-order independent, so results are "
    f"deterministic despite value ties; one partitioned sort per "
    f"priority at any scale.",
)
def range_frame_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    # PySpark's Window.rangeBetween only accepts integral offsets; a
    # fractional numeric band needs the SQL frame syntax.
    return od.selectExpr(
        "o_orderkey",
        "o_orderpriority AS priority",
        "o_totalprice",
        f"COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice "
        f"RANGE BETWEEN {_BAND} PRECEDING AND {_BAND} FOLLOWING) - 1 "
        "AS n_peers_within_band",
    )


# ----------------------------------------------------------------------------
# Basket-size distribution (lineitems per order histogram)
# ----------------------------------------------------------------------------

_BASKET_ORACLE = f"""
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS basket_size,
         {sql_sum('l_extendedprice * (1 - l_discount)')} AS order_rev
  FROM lineitem GROUP BY l_orderkey
)
SELECT basket_size,
       COUNT(*) AS n_orders,
       {sql_sum('order_rev')} AS revenue
FROM sizes GROUP BY basket_size ORDER BY basket_size
"""


@register(
    "basket_size_hist",
    _BASKET_ORACLE,
    "Basket-size distribution: line-count histogram over orders with "
    "exact revenue per size bucket — two keyed aggregations (order "
    "key, then the tiny size domain), the merchandising twin of "
    "q13's per-customer order-count histogram. Note the re-scaled "
    "outer sum: the inner per-order revenue is already exact, so the "
    "second fixed-point pass stays bit-identical.",
)
def basket_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(
        F.count("*").alias("basket_size"),
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "order_rev"),
    )
    return (
        sizes.groupBy("basket_size")
        .agg(F.count("*").alias("n_orders"), dec_sum("order_rev", "revenue"))
        .orderBy("basket_size")
    )


# ----------------------------------------------------------------------------
# Discount ladder (promo-depth effectiveness table)
# ----------------------------------------------------------------------------

_LADDER_ORACLE = f"""
SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
       COUNT(*) AS n_lines,
       {sql_sum('l_quantity')} AS total_qty,
       {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       {sql_sum('l_extendedprice * l_discount')} AS discount_given
FROM lineitem
GROUP BY 1 ORDER BY 1
"""


@register(
    "discount_ladder",
    _LADDER_ORACLE,
    "Promo-depth ladder: volume, exact revenue, and exact discount "
    "spend per discount percentage point (half-up integer bucketing "
    "shared by both engines). One grouped aggregation over a domain "
    "of ~11 buckets; the pricing-team view of q19's predicates.",
)
def discount_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("discount_pct")
        )
        .agg(
            F.count("*").alias("n_lines"),
            dec_sum("l_quantity", "total_qty"),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "discount_given"),
        )
        .orderBy("discount_pct")
    )


# ----------------------------------------------------------------------------
# Growth accounting: user lifecycle states per month (new/retained/
# resurrected) — the MAU movement table
# ----------------------------------------------------------------------------

_LIFECYCLE_ORACLE = """
WITH um AS (
  SELECT DISTINCT user_id,
         CAST(EXTRACT(YEAR FROM ts) * 12 + EXTRACT(MONTH FROM ts) AS BIGINT) AS ym
  FROM events
),
seq AS (
  SELECT user_id, ym,
         LAG(ym) OVER (PARTITION BY user_id ORDER BY ym) AS prev_ym
  FROM um
),
classed AS (
  SELECT ym,
         CASE WHEN prev_ym IS NULL THEN 'new'
              WHEN ym - prev_ym = 1 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM seq
)
SELECT ym, state, COUNT(*) AS n_users
FROM classed GROUP BY ym, state ORDER BY ym, state
"""


@register(
    "user_lifecycle_states",
    _LIFECYCLE_ORACLE,
    "Growth accounting (MAU movement): each active user-month is "
    "classified new / retained / resurrected from the LAG of their "
    "previous active month (integer year*12+month arithmetic). One "
    "distinct pass + one per-user window + a tiny grouped count — the "
    "monthly growth ledger every product review starts with.",
)
def user_lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    um = ev.selectExpr(
        "user_id",
        "CAST(year(ts) * 12 + month(ts) AS BIGINT) AS ym",
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("ym")
    seq = um.withColumn("prev_ym", F.lag("ym").over(w))
    state = (
        F.when(F.col("prev_ym").isNull(), "new")
        .when(F.col("ym") - F.col("prev_ym") == 1, "retained")
        .otherwise("resurrected")
    )
    return (
        seq.select("ym", state.alias("state"))
        .groupBy("ym", "state")
        .agg(F.count("*").alias("n_users"))
        .orderBy("ym", "state")
    )


# ----------------------------------------------------------------------------
# Revenue bridge (SaaS waterfall): month-over-month revenue change
# decomposed into new / expansion / contraction / churned per customer
# ----------------------------------------------------------------------------
# Per-customer monthly revenue is an exact fixed-point sum surfaced as
# integer-exact cents-of-micro units; the month self-join on
# (customer, month+1) co-partitions, and every bridge bucket is a SUM
# of exact differences — the ledger reconciles to the month's total
# revenue delta by construction (asserted by the oracle comparison).

def _bridge_oracle() -> str:
    # The FULL-JOIN formulation above is awkward in portable SQL; use
    # the symmetric-union formulation instead (same result, simpler):
    return """
WITH cm AS (
  SELECT o_custkey,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
shifted AS (SELECT o_custkey, ym + 1 AS ym, rev AS prev_rev FROM cm),
paired AS (
  SELECT COALESCE(c.ym, s.ym) AS ym,
         COALESCE(c.rev, 0) AS cur_rev,
         COALESCE(s.prev_rev, 0) AS prev_rev
  FROM cm c FULL OUTER JOIN shifted s
    ON c.o_custkey = s.o_custkey AND c.ym = s.ym
),
b AS (
  SELECT ym,
    SUM(CASE WHEN prev_rev = 0 THEN cur_rev ELSE 0 END) AS new_rev,
    SUM(CASE WHEN prev_rev > 0 AND cur_rev > prev_rev THEN cur_rev - prev_rev ELSE 0 END) AS expansion,
    SUM(CASE WHEN prev_rev > 0 AND cur_rev > 0 AND cur_rev < prev_rev THEN prev_rev - cur_rev ELSE 0 END) AS contraction,
    SUM(CASE WHEN cur_rev = 0 THEN prev_rev ELSE 0 END) AS churned,
    SUM(cur_rev) AS ending_rev,
    SUM(prev_rev) AS starting_rev
  FROM paired GROUP BY ym
)
SELECT ym,
       CAST(starting_rev AS BIGINT) AS starting_units,
       CAST(new_rev AS BIGINT) AS new_units,
       CAST(expansion AS BIGINT) AS expansion_units,
       CAST(contraction AS BIGINT) AS contraction_units,
       CAST(churned AS BIGINT) AS churned_units,
       CAST(ending_rev AS BIGINT) AS ending_units,
       CAST(starting_rev + new_rev + expansion - contraction - churned AS BIGINT) AS reconciled_units
FROM b
WHERE ym > (SELECT MIN(ym) FROM cm)
ORDER BY ym
"""


@register(
    "revenue_bridge",
    _bridge_oracle(),
    "SaaS-style revenue bridge: per month, the revenue delta "
    "decomposed into new / expansion / contraction / churned customer "
    "buckets via a co-partitioned full-outer join of customer-month "
    "revenue against itself shifted one month. All buckets are exact "
    "fixed-point integers and the ledger reconciles exactly "
    "(starting + new + expansion - contraction - churned = ending, "
    "emitted as a column so the oracle check proves it). The first "
    "month is excluded (no prior period to bridge from).",
)
def revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cm = od.selectExpr(
        "o_custkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym",
        "o_totalprice",
    ).groupBy("o_custkey", "ym").agg(
        F.sum(dec("o_totalprice")).cast("bigint").alias("rev")
    )
    shifted = cm.select(
        F.col("o_custkey").alias("s_custkey"),
        (F.col("ym") + 1).alias("s_ym"),
        F.col("rev").alias("prev_rev"),
    )
    paired = cm.join(
        shifted,
        (cm.o_custkey == shifted.s_custkey) & (cm.ym == shifted.s_ym),
        "full_outer",
    ).select(
        F.coalesce(F.col("ym"), F.col("s_ym")).alias("ym"),
        F.coalesce(F.col("rev"), F.lit(0)).alias("cur_rev"),
        F.coalesce(F.col("prev_rev"), F.lit(0)).alias("prev_rev"),
    )
    b = paired.groupBy("ym").agg(
        F.sum(F.when(F.col("prev_rev") == 0, F.col("cur_rev")).otherwise(0)).alias("new_rev"),
        F.sum(
            F.when(
                (F.col("prev_rev") > 0) & (F.col("cur_rev") > F.col("prev_rev")),
                F.col("cur_rev") - F.col("prev_rev"),
            ).otherwise(0)
        ).alias("expansion"),
        F.sum(
            F.when(
                (F.col("prev_rev") > 0)
                & (F.col("cur_rev") > 0)
                & (F.col("cur_rev") < F.col("prev_rev")),
                F.col("prev_rev") - F.col("cur_rev"),
            ).otherwise(0)
        ).alias("contraction"),
        F.sum(F.when(F.col("cur_rev") == 0, F.col("prev_rev")).otherwise(0)).alias("churned"),
        F.sum("cur_rev").alias("ending_rev"),
        F.sum("prev_rev").alias("starting_rev"),
    )
    # First bridgeable month = min over the month-level table b (tiny)
    # — avoids re-aggregating orders for a 1-row min.
    return (
        b.withColumn("m0", F.min("ym").over(Window.partitionBy()))
        .where(F.col("ym") > F.col("m0"))
        .selectExpr(
            "ym",
            "CAST(starting_rev AS BIGINT) AS starting_units",
            "CAST(new_rev AS BIGINT) AS new_units",
            "CAST(expansion AS BIGINT) AS expansion_units",
            "CAST(contraction AS BIGINT) AS contraction_units",
            "CAST(churned AS BIGINT) AS churned_units",
            "CAST(ending_rev AS BIGINT) AS ending_units",
            "CAST(starting_rev + new_rev + expansion - contraction - churned AS BIGINT) AS reconciled_units",
        )
        .orderBy("ym")
    )


# ----------------------------------------------------------------------------
# Corpus datacard: the one-row dataset summary (docs, languages,
# volume, dedup rate, dominant language) in a single plan
# ----------------------------------------------------------------------------

_DATACARD_ORACLE = """
WITH base AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT lang) AS n_langs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(MIN(n_chars) AS BIGINT) AS min_chars,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS avg_chars,
         CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
  FROM documents
),
uniq AS (SELECT COUNT(DISTINCT md5(text)) AS n_unique FROM documents),
toplang AS (
  SELECT lang AS top_lang, COUNT(*) AS top_lang_docs
  FROM documents GROUP BY lang
  ORDER BY COUNT(*) DESC, lang LIMIT 1
)
SELECT b.n_docs, b.n_langs, b.total_chars, b.min_chars, b.max_chars,
       b.avg_chars, b.n_empty,
       u.n_unique,
       CAST(b.n_docs - u.n_unique AS DOUBLE) / b.n_docs AS dup_rate,
       t.top_lang, t.top_lang_docs,
       CAST(t.top_lang_docs AS DOUBLE) / b.n_docs AS top_lang_share
FROM base b CROSS JOIN uniq u CROSS JOIN toplang t
"""


@register(
    "corpus_datacard",
    _DATACARD_ORACLE,
    "Dataset datacard in one plan: document/language counts, exact "
    "character volume and averages, empty-doc count, exact-duplicate "
    "rate (distinct content hashes), and the dominant language with "
    "its share — the one-row summary a dataset card or mix ledger "
    "starts from. Three bounded aggregates cross-joined broadcast; "
    "every ratio is one shared division over exact integers.",
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        (
            F.sum(F.col("n_chars").cast("decimal(38,0)")).cast("double")
            / F.count("*")
        ).alias("avg_chars"),
        F.sum(
            F.when(F.length(F.trim("text")) == 0, 1).otherwise(0)
        ).alias("n_empty"),
    )
    uniq = docs.agg(
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique")
    )
    toplang = (
        docs.groupBy(F.col("lang").alias("top_lang"))
        .agg(F.count("*").alias("top_lang_docs"))
        .orderBy(F.desc("top_lang_docs"), F.asc("top_lang"))
        .limit(1)
    )
    return (
        base.crossJoin(F.broadcast(uniq))
        .crossJoin(F.broadcast(toplang))
        .select(
            "n_docs",
            "n_langs",
            "total_chars",
            "min_chars",
            "max_chars",
            "avg_chars",
            "n_empty",
            "n_unique",
            ((F.col("n_docs") - F.col("n_unique")).cast("double") / F.col("n_docs")).alias(
                "dup_rate"
            ),
            "top_lang",
            "top_lang_docs",
            (F.col("top_lang_docs").cast("double") / F.col("n_docs")).alias(
                "top_lang_share"
            ),
        )
    )


# ----------------------------------------------------------------------------
# Near-dup contamination matrix by source (where do duplicates come from?)
# ----------------------------------------------------------------------------


def _neardup_source_oracle() -> str:
    from data_lakehouse_platform_spark.queries_llm import _minhash_ctes

    return f"""
WITH {_minhash_ctes()},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tagged AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b,
         c.doc_a, c.doc_b
  FROM cand c
  JOIN documents da ON c.doc_a = da.doc_id
  JOIN documents db ON c.doc_b = db.doc_id
)
SELECT source_a, source_b,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT doc_a) + COUNT(DISTINCT doc_b) AS n_docs_involved
FROM tagged GROUP BY source_a, source_b ORDER BY source_a, source_b
"""


@register(
    "neardup_by_source",
    _neardup_source_oracle(),
    "Duplication provenance: MinHash-LSH candidate pairs rolled up "
    "into a source x source contamination matrix (canonical pair "
    "order via LEAST/GREATEST) — tells you WHICH feeds duplicate "
    "each other before you spend compute verifying pairs. Reuses the "
    "LSH machinery; the doc->source joins key on doc_id "
    "(co-partitioned), output is source-vocabulary squared (tiny).",
)
def neardup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import dedup as D
    from data_lakehouse_platform_spark.operators import text as T
    from data_lakehouse_platform_spark.queries_llm import (
        _BANDS,
        _LSH_MAX_BUCKET,
        _N_HASHES,
    )

    docs = _t(spark, sf_dir, "documents")
    sh = T.explode_shingles(docs, "doc_id", "text", k=3, distinct=False)
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    cand = D.lsh_candidate_pairs(
        sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET
    ).select(
        "doc_a", "doc_b"
    )
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    tagged = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "doc_a",
            "doc_b",
        )
    )
    return (
        tagged.groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.countDistinct("doc_a") + F.countDistinct("doc_b")).alias(
                "n_docs_involved"
            ),
        )
        .orderBy("source_a", "source_b")
    )


# ----------------------------------------------------------------------------
# Token Simpson diversity (rational lexical-diversity index, no log)
# ----------------------------------------------------------------------------


def _simpson_oracle() -> str:
    from data_lakehouse_platform_spark.operators.text import sql_normalize_ws

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({sql_normalize_ws('text')}, ' ')) AS tok
  FROM documents
),
tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs
  FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens >= 2
            THEN 1.0 - CAST(rep_pairs AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1))
       END AS simpson_diversity
FROM per_doc
"""


@register(
    "token_diversity_simpson",
    _simpson_oracle(),
    "Lexical diversity via the Simpson index: 1 - P(two random tokens "
    "match) = 1 - sum(c*(c-1))/(n*(n-1)), exact integer moments with "
    "one shared double expression — the rational alternative to "
    "Shannon entropy (whose log differs across libm builds). "
    "Complements repetition_stats' fraction gates with a proper "
    "diversity index; one shuffle keyed on (doc, token).",
)
def token_diversity_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    tc = (
        docs.select("doc_id", F.explode(T.ws_tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("rep_pairs"),
    )
    return per_doc.selectExpr(
        "doc_id",
        "n_tokens",
        "CASE WHEN n_tokens >= 2 THEN "
        "1.0 - CAST(rep_pairs AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)) "
        "END AS simpson_diversity",
    )


# ----------------------------------------------------------------------------
# Session KPIs (composition: sessionizer -> session-level funnel stats)
# ----------------------------------------------------------------------------

_SESSION_KPI_ORACLE = """
WITH flagged AS (
  SELECT
    user_id, event_id, ts, event_type,
    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800000000
           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
),
sessions AS (
  SELECT user_id, session_idx,
         COUNT(*) AS n_events,
         CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM numbered GROUP BY user_id, session_idx
)
SELECT COUNT(*) AS n_sessions,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events_per_session,
       CAST(SUM(duration_us) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_duration_s,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS session_conversion_rate,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events
FROM sessions
"""


@register(
    "session_kpis",
    _SESSION_KPI_ORACLE,
    "Session-level KPI rollup on top of the gap sessionizer: session "
    "counts, exact average length (integer micros moments) and "
    "per-session conversion rate (any purchase in session) in one "
    "extra aggregation after the one-shuffle sessionization — the "
    "composition proof that sessionize output is a first-class table. "
    "All ratios are single shared divisions over exact integers.",
)
def session_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    new_s = (
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0)
    )
    numbered = ev.select(
        "user_id", "event_id", "ts", "event_type", new_s.alias("new_session")
    ).withColumn("session_idx", F.sum("new_session").over(run))
    sessions = numbered.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("bigint")
        .alias("duration_us"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
    )
    return sessions.agg(
        F.count("*").alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        (F.sum("n_events").cast("double") / F.count("*")).alias(
            "avg_events_per_session"
        ),
        (F.sum("duration_us").cast("double") / (F.count("*") * 1000000.0)).alias(
            "avg_duration_s"
        ),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count("*")).alias(
            "session_conversion_rate"
        ),
        F.max("n_events").cast("bigint").alias("max_session_events"),
    )


# ----------------------------------------------------------------------------
# Batch sliding (hopping) windows: 30-min windows every 10 min
# ----------------------------------------------------------------------------
# Each event belongs to exactly 3 overlapping windows; the explode is
# a bounded fan-out (window/slide), the aggregation shuffles on the
# window start — the batch twin of the streaming hopping-window test.

_SLIDE_US = 600_000_000  # 10 min
_WIN_FACTOR = 3  # 30-min window / 10-min slide

_SLIDING_ORACLE = f"""
WITH hopped AS (
  SELECT event_type,
         (CAST(FLOOR(CAST(epoch_us(ts) AS DOUBLE) / {_SLIDE_US}) AS BIGINT) - off.o) * {_SLIDE_US} AS win_start_us
  FROM events
  CROSS JOIN (SELECT unnest(range(0, {_WIN_FACTOR})) AS o) off
)
SELECT make_timestamp(win_start_us) AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM hopped
WHERE win_start_us >= 0
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register(
    "sliding_window_counts",
    _SLIDING_ORACLE,
    "Hopping-window counts (30-min windows sliding every 10): each "
    "event expands to exactly window/slide = 3 window memberships "
    "(bounded explode — the same containment rule Spark's native "
    "window(ts, '30 minutes', '10 minutes') uses), then one grouped "
    "count keyed on window start. The batch twin of the streaming "
    "sliding-window pipeline, verified there against this semantics.",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hopped = ev.select(
        "event_type",
        F.explode(
            F.array(*[F.lit(i) for i in range(_WIN_FACTOR)])
        ).alias("o"),
        F.unix_micros("ts").alias("us"),
    ).select(
        "event_type",
        (
            (F.floor(F.col("us").cast("double") / _SLIDE_US).cast("bigint") - F.col("o"))
            * _SLIDE_US
        ).alias("win_start_us"),
    )
    return (
        hopped.where(F.col("win_start_us") >= 0)
        .groupBy(
            F.timestamp_micros(F.col("win_start_us")).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .orderBy("window_start", "event_type")
    )


# ----------------------------------------------------------------------------
# RANK vs DENSE_RANK leaderboard (ties preserved, gaps shown)
# ----------------------------------------------------------------------------

_RANKS_ORACLE = """
WITH spend AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT) AS spend_units
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT n.n_name, s.o_custkey, s.spend_units,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM spend s JOIN nation n ON s.c_nationkey = n.n_nationkey
  WINDOW w AS (PARTITION BY n.n_name ORDER BY s.spend_units DESC)
)
SELECT n_name, o_custkey, spend_units, rnk, drnk
FROM ranked WHERE rnk <= 5
ORDER BY n_name, rnk, o_custkey
"""


@register(
    "rank_ties_leaderboard",
    _RANKS_ORACLE,
    "Per-nation spend leaderboard with RANK (gaps after ties) and "
    "DENSE_RANK side by side, keeping EVERY tied row in the top-5 — "
    "the ranking semantics row_number-based top-N silently drops. "
    "Exact integer spend makes tie groups identical across engines, "
    "so both rank columns agree bit-for-bit. Completes the window-"
    "function surface: row_number/rank/dense_rank/ntile/percent_rank/"
    "cume_dist/lead/lag/first/last/nth_value are all exercised.",
)
def rank_ties_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    spend = (
        od.join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(dec("o_totalprice")).cast("bigint").alias("spend_units")
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("spend_units"))
    return (
        spend.join(F.broadcast(nation), spend.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "o_custkey",
            "spend_units",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rnk") <= 5)
        .orderBy("n_name", "rnk", "o_custkey")
    )


# ----------------------------------------------------------------------------
# Native unpivot (melt): wide measures -> long (measure, value) rows
# ----------------------------------------------------------------------------

_UNPIVOT_ORACLE = f"""
WITH long AS (
  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT measure, COUNT(*) AS n,
       {sql_sum('val')} AS total,
       {sql_sum('val')} / COUNT(*) AS mean
FROM long GROUP BY measure ORDER BY measure
"""


@register(
    "unpivot_measures",
    _UNPIVOT_ORACLE,
    "Wide-to-long reshape with the native unpivot/melt API (Spark "
    "3.4+): four lineitem measures become (measure, value) rows in "
    "one scan — no UNION of four self-reads — then exact per-measure "
    "totals. The reshape every profiling/metrics layer needs before "
    "a generic measures table; the oracle spells it as UNION ALL, "
    "proving the semantics equivalence.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            dec_sum("val", "total"),
            (dec_sum("val", "__t").cast("double") / F.count("*")).alias("mean"),
        )
        .orderBy("measure")
    )


# ----------------------------------------------------------------------------
# VARIANT semi-structured extraction (Spark 4 open variant type)
# ----------------------------------------------------------------------------

_VARIANT_ORACLE = """
WITH x AS (
  SELECT CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) * 10 AS k_bucket,
         user_id
  FROM events
)
SELECT k_bucket, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM x GROUP BY k_bucket ORDER BY k_bucket
"""


@register(
    "variant_extract_buckets",
    _VARIANT_ORACLE,
    "Schemaless payloads through Spark 4's open VARIANT type: "
    "parse_json once into a variant column, variant_get typed paths "
    "out — binary-encoded traversal, substantially faster than "
    "re-parsing JSON strings per path (get_json_object, the "
    "json_props_extract query) when payloads are wide. Bucketed "
    "histogram over the extracted value with distinct users per "
    "bucket; at the silver layer this is how you keep raw payloads "
    "queryable without freezing a schema.",
)
def variant_extract_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select(
            (F.floor(k / 10).cast("bigint") * 10).alias("k_bucket"), "user_id"
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("k_bucket")
    )


# ----------------------------------------------------------------------------
# SLA attainment: cumulative ship-within-N-days shares per month
# ----------------------------------------------------------------------------

_SLA_ORACLE = """
WITH lagged AS (
  SELECT date_trunc('month', o.o_orderdate) AS m,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT CAST(m AS DATE) AS month,
       COUNT(*) AS n_shipments,
       CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS within_30d,
       CAST(SUM(CASE WHEN lag_days <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS within_60d,
       CAST(SUM(CASE WHEN lag_days <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS within_90d,
       CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS sla_30d_rate,
       CAST(SUM(CASE WHEN lag_days <= 90 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS sla_90d_rate
FROM lagged GROUP BY 1 ORDER BY 1
"""


@register(
    "sla_attainment",
    _SLA_ORACLE,
    "Fulfillment SLA attainment: per order month, cumulative shares "
    "of shipments leaving within 30/60/90 days (exact counts, shared "
    "divisions). One co-partitioned fact join + a month-keyed "
    "aggregation — the ops-review curve that q12's delay buckets "
    "feed; conditional aggregation keeps it to a single pass.",
)
def sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lagged = li.join(od, li.l_orderkey == od.o_orderkey).select(
        F.trunc("o_orderdate", "month").alias("month"),
        F.datediff("l_shipdate", "o_orderdate").alias("lag_days"),
    )
    w30 = F.sum(F.when(F.col("lag_days") <= 30, 1).otherwise(0))
    w60 = F.sum(F.when(F.col("lag_days") <= 60, 1).otherwise(0))
    w90 = F.sum(F.when(F.col("lag_days") <= 90, 1).otherwise(0))
    return (
        lagged.groupBy("month")
        .agg(
            F.count("*").alias("n_shipments"),
            w30.alias("within_30d"),
            w60.alias("within_60d"),
            w90.alias("within_90d"),
            (w30.cast("double") / F.count("*")).alias("sla_30d_rate"),
            (w90.cast("double") / F.count("*")).alias("sla_90d_rate"),
        )
        .orderBy("month")
    )


# ----------------------------------------------------------------------------
# Seasonal-naive forecast with portable exact arithmetic
# ----------------------------------------------------------------------------
# forecast(m) = rev(m-12) scaled by the trailing-quarter-over-
# prior-year-quarter ratio; every operand is an exact fixed-point
# integer, the single ratio+product expression is shared text, and the
# forecast is evaluated ONLY against months that actually exist (a
# self-join on month arithmetic, no calendar generation).

_FORECAST_ORACLE = """
WITH m AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
trail AS (
  SELECT ym, rev,
         SUM(rev) OVER (ORDER BY ym ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS tq,
         LAG(rev, 12) OVER (ORDER BY ym) AS rev_ly,
         SUM(rev) OVER (ORDER BY ym ROWS BETWEEN 15 PRECEDING AND 13 PRECEDING) AS tq_ly
  FROM m
)
SELECT ym, rev AS actual_units, rev_ly AS same_month_ly_units,
       CAST(FLOOR(CAST(rev_ly AS DOUBLE) * tq / tq_ly) AS BIGINT) AS forecast_units,
       CAST(rev - CAST(FLOOR(CAST(rev_ly AS DOUBLE) * tq / tq_ly) AS BIGINT) AS BIGINT) AS forecast_error_units
FROM trail
WHERE rev_ly IS NOT NULL AND tq_ly IS NOT NULL AND tq_ly > 0
ORDER BY ym
"""


@register(
    "seasonal_naive_forecast",
    _FORECAST_ORACLE,
    "Seasonal-naive revenue forecast: same month last year scaled by "
    "the trailing-quarter / prior-year-quarter trend ratio, with the "
    "realized error — the baseline every forecasting system must "
    "beat, in pure portable arithmetic (exact integer moments, one "
    "shared double expression, CAST truncation identical because the "
    "operand is a positive double in both engines). The month series "
    "is aggregate-sized, so the ordered windows are free.",
)
def seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    m = od.selectExpr(
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym",
        "o_totalprice",
    ).groupBy("ym").agg(
        F.sum(dec("o_totalprice")).cast("bigint").alias("rev")
    )
    w = Window.orderBy("ym")
    trail = m.select(
        "ym",
        "rev",
        F.sum("rev").over(w.rowsBetween(-3, -1)).alias("tq"),
        F.lag("rev", 12).over(w).alias("rev_ly"),
        F.sum("rev").over(w.rowsBetween(-15, -13)).alias("tq_ly"),
    )
    return (
        trail.where(
            F.col("rev_ly").isNotNull()
            & F.col("tq_ly").isNotNull()
            & (F.col("tq_ly") > 0)
        )
        .selectExpr(
            "ym",
            "rev AS actual_units",
            "rev_ly AS same_month_ly_units",
            "CAST(FLOOR(CAST(rev_ly AS DOUBLE) * tq / tq_ly) AS BIGINT) AS forecast_units",
            "CAST(rev - CAST(FLOOR(CAST(rev_ly AS DOUBLE) * tq / tq_ly) AS BIGINT) AS BIGINT) AS forecast_error_units",
        )
        .orderBy("ym")
    )


# ----------------------------------------------------------------------------
# BFS over the near-dup graph (bounded-depth iterative traversal)
# ----------------------------------------------------------------------------
# Spark has no recursive SQL, so the classic pattern is a bounded
# frontier loop of joins — each iteration one co-partitioned join +
# a min-dist aggregate. The DuckDB oracle IS a recursive CTE, proving
# the loop computes exactly the recursive semantics. Depth is fixed
# (3) so the plan is static and Catalyst sees the whole pipeline.

_BFS_DEPTH = 3


def _bfs_oracle() -> str:
    from data_lakehouse_platform_spark.queries_llm import _minhash_ctes

    return f"""
WITH {_minhash_ctes()},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL SELECT doc_b, doc_a FROM cand
),
seed AS (SELECT MIN(src) AS s FROM edges),
bfs AS (
  WITH RECURSIVE walk(node, dist) AS (
    SELECT s, 0 FROM seed
    UNION
    SELECT e.dst, w.dist + 1
    FROM walk w JOIN edges e ON w.node = e.src
    WHERE w.dist < {_BFS_DEPTH}
  )
  SELECT node, MIN(dist) AS dist FROM walk GROUP BY node
)
SELECT node AS doc_id, CAST(dist AS INT) AS dist FROM bfs ORDER BY dist, doc_id
"""


@register(
    "graph_bfs_depth3",
    _bfs_oracle(),
    f"Bounded BFS (depth {_BFS_DEPTH}) from the smallest connected "
    "doc over the MinHash-LSH near-dup graph: Spark expresses the "
    "traversal as a fixed frontier-join loop (no recursive SQL "
    "needed when depth is bounded), the oracle as a genuine "
    "RECURSIVE CTE — the loop provably computes recursive-query "
    "semantics. Each hop is one edge-keyed join; at scale this is "
    "Pregel-by-joins with the frontier never leaving the cluster.",
)
def graph_bfs_depth3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import dedup as D
    from data_lakehouse_platform_spark.operators import text as T
    from data_lakehouse_platform_spark.queries_llm import (
        _BANDS,
        _LSH_MAX_BUCKET,
        _N_HASHES,
    )

    docs = _t(spark, sf_dir, "documents")
    sh = T.explode_shingles(docs, "doc_id", "text", k=3, distinct=False)
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    cand = D.lsh_candidate_pairs(
        sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET
    ).select(
        "doc_a", "doc_b"
    )
    # Persist the edge list: without this, every BFS hop (and the seed
    # fetch) re-evaluates the whole MinHash/LSH lineage — 4 redundant
    # LSH passes over the corpus. One materialization, reused by the
    # seed agg and all three frontier joins.
    from pyspark import StorageLevel

    edges = (
        cand.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionAll(cand.selectExpr("doc_b AS src", "doc_a AS dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Bounded metadata fetch: one scalar seed (same posture as the LSH
    # pivot fetch) — the traversal itself never touches the driver.
    seed = edges.agg(F.min("src")).collect()[0][0]
    if seed is None:
        # Empty similarity graph (no LSH candidate pairs): mirror the
        # oracle's seed CTE, which emits one (NULL, 0) row.
        return spark.createDataFrame([(None, 0)], "doc_id long, dist int")
    frontier = spark.createDataFrame([(int(seed), 0)], "node long, dist int")
    visited = frontier
    for depth in range(1, _BFS_DEPTH + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(depth).alias("dist"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            # r10 optimization: each hop referenced the previous hops'
            # UNCHECKPOINTED frames through both the frontier join and
            # the visited anti-join, so the plan tree grew ~3x per
            # depth (the depth-3 final plan held 1,158 Exchange nodes
            # and re-executed every earlier hop several times — 61
            # jobs / 3,438 tasks measured at sf0.1).  Checkpointing the
            # frontier keeps the plan linear in depth: visited is a
            # union of <= depth checkpointed scans.  Same rows, same
            # final aggregate.
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(nxt)
        frontier = nxt
    return (
        visited.groupBy("node")
        .agg(F.min("dist").cast("int").alias("dist"))
        .selectExpr("node AS doc_id", "dist")
        .orderBy("dist", "doc_id")
    )


# ----------------------------------------------------------------------------
# Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL on repeat behavior
# ----------------------------------------------------------------------------
# Distinct set ops (16t/16u) ask WHO overlaps; the ALL variants keep
# multiplicity — how MANY TIMES a customer ordered in both halves of
# the year (min of the two counts) or more in H1 than H2 (count
# difference). Spark's intersectAll/exceptAll are hash aggregates on
# (row, count) — one shuffle, no explosion.

_BAG_CUT = "1995-07-01"

_BAG_ORACLE = f"""
WITH h1 AS (
  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '{_BAG_CUT}'
),
h2 AS (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_BAG_CUT}'
),
both_bag AS (SELECT o_custkey FROM h1 INTERSECT ALL SELECT o_custkey FROM h2),
h1_only_bag AS (SELECT o_custkey FROM h1 EXCEPT ALL SELECT o_custkey FROM h2)
SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS multiplicity FROM both_bag GROUP BY 2
UNION ALL
SELECT 'except_all', o_custkey, COUNT(*) FROM h1_only_bag GROUP BY 2
ORDER BY op, o_custkey
"""


@register(
    "bag_setops_orders",
    _BAG_ORACLE,
    "INTERSECT ALL / EXCEPT ALL with bag semantics over half-year "
    "order bags: multiplicity = min(orders in H1, orders in H2) for "
    "the intersection, surplus H1 orders for the difference — the "
    "repeat-behavior question the DISTINCT set-op cohorts (16t/16u) "
    "cannot answer. One hash aggregate per side in Spark's "
    "intersectAll/exceptAll, multiplicities re-counted for a "
    "bounded, comparable output.",
)
def bag_setops_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    h1 = od.where(F.col("o_orderdate") < _BAG_CUT).select("o_custkey")
    h2 = od.where(F.col("o_orderdate") >= _BAG_CUT).select("o_custkey")
    both = (
        h1.intersectAll(h2)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("multiplicity"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "multiplicity")
    )
    only = (
        h1.exceptAll(h2)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "multiplicity")
    )
    return both.unionAll(only).orderBy("op", "o_custkey")


# ----------------------------------------------------------------------------
# Duplicate-invoice detection (finance DQ screen)
# ----------------------------------------------------------------------------

_DUPINV_ORACLE = """
WITH groups AS (
  SELECT o_custkey, o_orderdate, o_totalprice,
         COUNT(*) AS n_dupes,
         MIN(o_orderkey) AS first_orderkey,
         MAX(o_orderkey) AS last_orderkey
  FROM orders
  GROUP BY o_custkey, o_orderdate, o_totalprice
  HAVING COUNT(*) > 1
)
SELECT * FROM groups ORDER BY o_custkey, o_orderdate, o_totalprice
"""


@register(
    "dq_duplicate_invoices",
    _DUPINV_ORACLE,
    "Duplicate-invoice screen: orders sharing (customer, date, exact "
    "amount) under different order keys — the classic double-payment "
    "audit. One grouped aggregation with a HAVING gate; at scale the "
    "composite key shuffles once and the suspicious set is tiny, so "
    "the follow-up investigation join is a broadcast.",
)
def dq_duplicate_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy("o_custkey", "o_orderdate", "o_totalprice")
        .agg(
            F.count("*").alias("n_dupes"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .where(F.col("n_dupes") > 1)
        .orderBy("o_custkey", "o_orderdate", "o_totalprice")
    )


# ----------------------------------------------------------------------------
# Brand x size assortment pivot (multi-aggregate pivot)
# ----------------------------------------------------------------------------

_ASSORT_SIZES = (1, 5, 10, 25, 50)

def _assort_cols(s: int) -> str:
    price = (
        f"CAST(SUM(CASE WHEN p_size = {s} THEN "
        f"CAST(FLOOR(p_retailprice * 1000000) AS DECIMAL(28,0)) "
        f"ELSE 0 END) AS DOUBLE) / 1000000 AS price_size_{s}"
    )
    return (
        f"CAST(SUM(CASE WHEN p_size = {s} THEN 1 ELSE 0 END) AS BIGINT) AS n_size_{s},\n"
        f"       {price}"
    )


_ASSORT_ORACLE = f"""
SELECT p_brand,
       {", ".join(_assort_cols(s) for s in _ASSORT_SIZES)}
FROM part
GROUP BY p_brand ORDER BY p_brand
"""


@register(
    "pivot_brand_assortment",
    _ASSORT_ORACLE,
    "Assortment pivot: per brand, SKU counts AND exact retail-price "
    "totals for five pivoted size columns — the multi-measure pivot "
    "(pivot_events pivots a single count). Spark's pivot(values=...) "
    "with explicit pivot values skips the extra distinct-discovery "
    "job; the oracle spells the same thing as conditional aggregation.",
)
def pivot_brand_assortment(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    pv = (
        part.where(F.col("p_size").isin(*_ASSORT_SIZES))
        .groupBy("p_brand")
        .pivot("p_size", list(_ASSORT_SIZES))
        .agg(
            # count(*) is rejected inside pivot aggregates
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(SUM(CAST(FLOOR(p_retailprice * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000"
            ).alias("price"),
        )
    )
    # pivot drops brands with NO row in any pivoted size only if they
    # never appear; conditional-agg oracle keeps all brands — align by
    # re-joining the full brand list with zero-fill.
    brands = part.select("p_brand").distinct()
    out = brands.join(pv, "p_brand", "left")
    cols = [F.col("p_brand")]
    for s in _ASSORT_SIZES:
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"n_size_{s}"))
        cols.append(
            F.coalesce(F.col(f"{s}_price"), F.lit(0.0)).alias(f"price_size_{s}")
        )
    return out.select(*cols).orderBy("p_brand")


# ----------------------------------------------------------------------------
# Exact weighted median (cumulative-weight crossing, no interpolation)
# ----------------------------------------------------------------------------
# The quantity-weighted median unit price per return flag: sort by
# price within the group, accumulate integer quantity weight, and take
# the first row whose doubled cumulative weight reaches the total —
# the discrete lower weighted median, pure integer comparisons.

_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS price,
         CAST(FLOOR(l_quantity) AS BIGINT) AS wt
  FROM lineitem
),
c AS (
  SELECT l_returnflag, price, wt,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY price, wt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
  FROM w
),
hit AS (
  SELECT l_returnflag, price, cum, tot,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY price, wt) AS rn
  FROM c WHERE 2 * cum >= tot
)
SELECT l_returnflag,
       price AS weighted_median_price,
       CAST(tot AS BIGINT) AS total_weight
FROM hit WHERE rn = 1 ORDER BY l_returnflag
"""


@register(
    "weighted_median_price",
    _WMEDIAN_ORACLE,
    "Exact quantity-weighted median price per return flag: one "
    "price-ordered cumulative integer-weight window, then the first "
    "row where 2*cum >= total — the discrete lower weighted median "
    "with zero interpolation or float thresholds. The robust 'typical "
    "unit price' that an unweighted median misstates when line sizes "
    "vary; same per-group-sort cost as any ranked window at scale.",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.ranking import (
        select_group_weight_crossing,
    )

    li = _t(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.floor("l_quantity").cast("bigint").alias("wt"),
    )
    # r10 optimization: the weight-crossing SELECTION twin — the
    # per-(flag, bucket) weight sums the stats pass already collects
    # locate the single bucket containing the 2*cum >= tot crossing,
    # so only that bucket's rows (bounded by bucket width) get a
    # running sum, where the previous form persisted the projection
    # and cumulated EVERY row.  Ties order by wt too, which makes
    # every cum value order-independent (tied rows carry equal
    # weights); equal prices share a bucket, and rows in later
    # buckets have strictly larger price, so min(struct) over the
    # crossing bucket's hit rows is the same first-crossing row.
    c = select_group_weight_crossing(
        w,
        ["l_returnflag"],
        [F.col("price"), F.col("wt")],
        bucket_key=F.col("price"),
        weight=F.col("wt"),
        cum_col="cum",
        tot_col="tot",
        weight_type="bigint",
    )
    hit = c.where(2 * F.col("cum") >= F.col("tot"))
    return (
        hit.groupBy("l_returnflag")
        .agg(
            F.min(F.struct("price", "wt")).alias("__first"),
            F.max("tot").alias("tot"),
        )
        .select(
            "l_returnflag",
            F.col("__first.price").alias("weighted_median_price"),
            F.col("tot").cast("bigint").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ----------------------------------------------------------------------------
# Market-segment mix per region (share-of-region composition)
# ----------------------------------------------------------------------------

_SEGMIX_ORACLE = """
WITH base AS (
  SELECT r.r_name, c.c_mktsegment, COUNT(*) AS n_customers
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, c_mktsegment, n_customers,
       CAST(n_customers AS DOUBLE) /
         SUM(n_customers) OVER (PARTITION BY r_name) AS segment_share
FROM base ORDER BY r_name, c_mktsegment
"""


@register(
    "segment_mix_by_region",
    _SEGMIX_ORACLE,
    "Customer-base composition: market-segment counts and within-"
    "region shares (share via a partitioned window over the tiny "
    "region x segment aggregate — no total re-scan). Broadcast dim "
    "joins; output bounded by |regions| x |segments|.",
)
def segment_mix_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    base = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )
    return base.select(
        "r_name",
        "c_mktsegment",
        "n_customers",
        (
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(Window.partitionBy("r_name"))
        ).alias("segment_share"),
    ).orderBy("r_name", "c_mktsegment")


# ----------------------------------------------------------------------------
# Nearest-direction as-of join (attribution to the closest touchpoint)
# ----------------------------------------------------------------------------

_NEAREST_ORACLE = """
WITH l AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, event_id AS rid, ts, value FROM events WHERE event_type = 'view'
),
u AS (
  SELECT user_id, ts, event_id,
         CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS TIMESTAMP) AS rts,
         CAST(NULL AS BIGINT) AS tb, 1 AS side
  FROM l
  UNION ALL
  SELECT user_id, ts, NULL, value, ts, rid, 0 FROM r
),
w AS (
  SELECT *,
    LAST_VALUE(rts IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, tb
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bts,
    LAST_VALUE(rv IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, tb
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bv,
    FIRST_VALUE(rts IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, tb
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fts,
    FIRST_VALUE(rv IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, tb
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fv
  FROM u
)
SELECT user_id, event_id, ts,
  CASE WHEN bts IS NOT NULL AND (fts IS NULL
            OR epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
       THEN bts ELSE fts END AS ts_right,
  CASE WHEN bts IS NOT NULL AND (fts IS NULL
            OR epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
       THEN bv ELSE fv END AS value_right
FROM w WHERE side = 1
"""


@register(
    "asof_nearest_events",
    _NEAREST_ORACLE,
    "Nearest-direction as-of join: each purchase attributed to its "
    "CLOSEST view in time, either side (ties prefer backward, pandas "
    "merge_asof nearest semantics). One union + one per-user sort "
    "serves both directions via a preceding last_value and a "
    "following first_value frame — completes the as-of family "
    "(backward, forward+tolerance, nearest) at single-direction cost. "
    "Same-timestamp views break ties on event id in both engines.",
)
def asof_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.asof import asof_join_nearest

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    right = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("rid"), "ts", "value"
    )
    return asof_join_nearest(
        left,
        right,
        on="ts",
        by="user_id",
        value_cols=["value"],
        right_tiebreak="rid",
    )


# ----------------------------------------------------------------------------
# Joint distribution: basket size x order-value decile matrix
# ----------------------------------------------------------------------------

_BVM_ORACLE = """
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS basket_size FROM lineitem GROUP BY l_orderkey
),
ranked AS (
  SELECT o.o_orderkey, s.basket_size,
         NTILE(10) OVER (ORDER BY o.o_totalprice, o.o_orderkey) AS value_decile
  FROM orders o JOIN sizes s ON o.o_orderkey = s.l_orderkey
)
SELECT basket_size, value_decile, COUNT(*) AS n_orders
FROM ranked GROUP BY basket_size, value_decile
ORDER BY basket_size, value_decile
"""


@register(
    "basket_value_matrix",
    _BVM_ORACLE,
    "Joint profile of basket size x order-value decile (NTILE with a "
    "unique orderkey tiebreak so decile cuts are identical across "
    "engines): the dependence structure between how MANY lines an "
    "order has and how much it is WORTH, as a bounded contingency "
    "matrix. One fact-side aggregation, one co-partitioned join; the "
    "decile assignment runs through the distributed two-pass global "
    "rank + SQL-standard tile arithmetic (operators/ranking.py), never "
    "an unpartitioned NTILE window over the orders fact.",
)
def basket_value_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from data_lakehouse_platform_spark.operators.ranking import (
        with_global_ntile,
    )

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("basket_size"))
    base = od.join(sizes, od.o_orderkey == sizes.l_orderkey).select(
        "basket_size", "o_totalprice", "o_orderkey"
    )
    # Distributed exact NTILE, r11 selection form (guide §1.2): the
    # decile only needs 9 CUT rows of the (o_totalprice, o_orderkey)
    # order — locate them by rank selection and assign tiles with a
    # pure comparison projection, instead of ranking every joined row
    # (full window + broadcast-offsets join).  The joined base feeds
    # the cut passes + the final projection, so it is persisted at its
    # natural join width (CPU-light consumers would not mind a narrow
    # cache, but the width costs nothing here — same footprint the old
    # form's internal persist paid).  Value contract unchanged:
    # NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey).
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    ranked = with_global_ntile(
        base,
        [("o_totalprice", False), ("o_orderkey", False)],
        10,
        "value_decile",
    ).select("basket_size", "value_decile")
    return (
        ranked.groupBy("basket_size", "value_decile")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("basket_size", "value_decile")
    )
