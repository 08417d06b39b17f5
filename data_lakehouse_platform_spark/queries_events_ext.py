"""Event-analytics extensions over the `events` stream table: ordered
funnel conversion, weekly retention cohorts, and regular-grid
resampling with forward fill — the product-analytics / time-series
surface of the engine.

Determinism notes: every aggregate here is MIN/MAX/COUNT (order-free);
forward fill carries a MAX-per-day value so no float summation order
exists anywhere; week truncation is Monday-start in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase, strictly increasing ts
# ----------------------------------------------------------------------------

_FUNNEL_ORACLE = """
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
)
SELECT u.user_id, s1.view_ts, s2.click_ts, s3.purchase_ts,
  CASE WHEN s3.purchase_ts IS NOT NULL THEN 3
       WHEN s2.click_ts IS NOT NULL THEN 2
       WHEN s1.view_ts IS NOT NULL THEN 1
       ELSE 0 END AS reached_step
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


@register(
    "funnel_steps",
    _FUNNEL_ORACLE,
    "Ordered conversion funnel (view -> click -> purchase with strictly "
    "increasing timestamps): each stage is a grouped MIN after a "
    "key-join against the previous stage's anchor — three shuffles all "
    "on user_id, so AQE coalesces them onto one co-partitioned layout; "
    "no window over the raw event stream, no per-user sort. The "
    "sequential-pattern query every product-analytics store ships.",
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        ev.select("user_id")
        .distinct()
        .join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .when(F.col("view_ts").isNotNull(), 1)
            .otherwise(0)
            .alias("reached_step"),
        )
    )


# ----------------------------------------------------------------------------
# Weekly retention cohorts: signup week x activity-week offset
# ----------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         date_trunc('week', e.ts) AS active_week
  FROM events e JOIN cohort c USING (user_id)
  WHERE date_trunc('week', e.ts) >= c.cohort_week
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(date_diff('day', cohort_week, active_week) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_active_users
FROM activity
GROUP BY 1, 2
"""


@register(
    "retention_cohorts",
    _RETENTION_ORACLE,
    "Weekly retention matrix: cohort = Monday-truncated week of first "
    "signup; a user counts in (cohort_week, offset) once per active "
    "week at or after signup. Cohort anchors join back to the stream "
    "broadcast-or-hash on user_id; the DISTINCT collapses per-week "
    "duplicates map-side before the countDistinct shuffle. Output is "
    "the cohort heat-map table dashboards pivot.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("active_week"),
        )
        .filter(F.col("active_week") >= F.col("cohort_week"))
        .distinct()
    )
    return activity.groupBy(
        "cohort_week",
        (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_active_users"))


# ----------------------------------------------------------------------------
# Regular-grid resample + forward fill (time-series gap repair)
# ----------------------------------------------------------------------------

_RESAMPLE_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, MAX(value) AS day_max
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
  SELECT g.user_id, g.day, daily.day_max
  FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day
)
SELECT user_id, day, day_max,
       LAST_VALUE(day_max IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled,
       CAST(day_max IS NULL AS INT) AS is_gap
FROM joined
"""


@register(
    "resample_ffill",
    _RESAMPLE_ORACLE,
    "Time-series gap repair: per user, a regular daily grid spanning "
    "their observed range (sequence + explode — grid rows ~ span, "
    "generated, never stored), left-joined against per-day MAX "
    "observations, forward-filled with last_value(IGNORE NULLS). MAX "
    "as the carried value keeps every number order-independent (a "
    "float SUM would not be). One shuffle on user_id for the window; "
    "the hypertable-style densify every monitoring store needs.",
)
def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = (
        ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.max("value").alias("day_max"))
    )
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
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        "day_max",
        F.last("day_max", ignorenulls=True).over(w).alias("filled"),
        F.col("day_max").isNull().cast("int").alias("is_gap"),
    )


# ----------------------------------------------------------------------------
# Time-weighted average (irregular-series aggregate, exact fixed-point)
# ----------------------------------------------------------------------------

_TWA_ORACLE = """
WITH seg AS (
  SELECT user_id, value, ts,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
),
w AS (
  SELECT user_id,
    CAST(FLOOR(value * 1000000) AS BIGINT)
      * CAST(date_diff('second', ts, next_ts) AS BIGINT) AS wv,
    CAST(date_diff('second', ts, next_ts) AS BIGINT) AS dt
  FROM seg WHERE next_ts IS NOT NULL
)
SELECT user_id,
  CAST(SUM(wv) AS DOUBLE) / (1000000.0 * SUM(dt)) AS time_weighted_avg,
  CAST(SUM(dt) AS BIGINT) AS observed_seconds,
  COUNT(*) AS n_segments
FROM w
GROUP BY user_id
HAVING SUM(dt) > 0
"""


@register(
    "time_weighted_avg",
    _TWA_ORACLE,
    "Time-weighted average for irregular series (the TimescaleDB "
    "hypertable aggregate): each observation holds until the next one "
    "(LEAD segmenting, unique event_id tiebreak), weight = fixed-point "
    "value x whole-second duration in exact int64, one double division "
    "at the end — so the float-summation order problem never exists. "
    "One shuffle on user_id for the LEAD window, then a grouped sum.",
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    dt = (
        F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
    ).cast("bigint")
    wv = F.floor(F.col("value") * 1_000_000).cast("bigint") * dt
    return (
        seg.select("user_id", wv.alias("wv"), dt.alias("dt"))
        .groupBy("user_id")
        .agg(
            (F.sum("wv").cast("double") / (F.lit(1e6) * F.sum("dt"))).alias(
                "time_weighted_avg"
            ),
            F.sum("dt").alias("observed_seconds"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .filter(F.col("observed_seconds") > 0)
    )


# ----------------------------------------------------------------------------
# Market-basket co-occurrence (association mining, exact counts)
# ----------------------------------------------------------------------------

_BASKET_MIN_SUPPORT = 3

_BASKET_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
part_n AS (SELECT l_partkey, COUNT(*) AS n_orders FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_together
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
)
SELECT part_a, part_b, n_together,
  pa.n_orders AS n_orders_a, pb.n_orders AS n_orders_b,
  CAST(n_together AS DOUBLE) / pa.n_orders AS confidence_a_to_b
FROM pairs
JOIN part_n pa ON part_a = pa.l_partkey
JOIN part_n pb ON part_b = pb.l_partkey
"""


@register(
    "market_basket_pairs",
    _BASKET_ORACLE,
    f"Market-basket association pairs: parts co-occurring in >= "
    f"{_BASKET_MIN_SUPPORT} orders, with per-part order counts and "
    "confidence(A->B) as an exact count ratio. The self-join is keyed "
    "on the ORDER (baskets are small — pair fan-out is bounded by "
    "items-per-basket squared, never corpus-squared), then pair counts "
    "shuffle with map-side combine. The recommendation-mining query "
    "behind the reference's product-suggestion flow "
    "(check_and_recommend_consumer.py picks co-orderable products).",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    part_n = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_together"))
        .filter(F.col("n_together") >= _BASKET_MIN_SUPPORT)
    )
    pa = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("n_orders_a")
    )
    pb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("n_orders_b")
    )
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_together",
            "n_orders_a",
            "n_orders_b",
            (F.col("n_together").cast("double") / F.col("n_orders_a")).alias(
                "confidence_a_to_b"
            ),
        )
    )
