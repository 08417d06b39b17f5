"""Robust-statistics & integrity screens: chi-square independence,
Benford first-digit fraud screening, rolling medians, and cumulative
distinct counts — the distribution-shift / anomaly checks a data team
runs over a corpus before trusting it.

Cross-engine determinism strategy (the registry contract): every
statistic reduces to integer counts, single IEEE double operations
(one multiply/divide at a time — identical on every engine), or
fixed-point ``floor(x * 10^k)`` integer sums. Expected-value constants
that would require transcendental functions (Benford's log10 law) are
precomputed once in Python and injected into BOTH engines as identical
decimal literals, so no engine ever evaluates a ``log`` whose low bits
could differ.

Reference analog: the reference's DQ checks are row-count/null/dup
gates (scripts/batch/data_quality/bronze_validation.py); these are the
statistical upgrades of that family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.functions.money import dec
from data_lakehouse_platform_spark.queries import _t, register

# ----------------------------------------------------------------------------
# Cumulative distinct users by day
# ----------------------------------------------------------------------------

_CUMUSERS_ORACLE = """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
daily AS (SELECT first_day, COUNT(*) AS new_users FROM f GROUP BY first_day)
SELECT first_day AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY first_day) AS BIGINT) AS cum_users
FROM daily
"""


@register(
    "cumulative_distinct_users",
    _CUMUSERS_ORACLE,
    "Running distinct-user count by day WITHOUT a running COUNT "
    "(DISTINCT ...) window (quadratic state): each user collapses to "
    "their first-seen day (one groupBy, map-side combinable), daily "
    "first-seen counts roll up, and the cumulative sum runs over the "
    "DATE domain — bounded by the calendar, not the user count, so "
    "the final window touches a few hundred rows at any corpus size.",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = first.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("first_day")  # date-cardinality input: bounded
    return daily.select(
        F.col("first_day").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


# ----------------------------------------------------------------------------
# Chi-square test of independence: event type x weekday
# ----------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH obs AS (
  SELECT event_type, EXTRACT(DOW FROM ts) AS dow, COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
ct AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM obs),
cells AS (
  SELECT obs.event_type, obs.dow, obs.o,
         (CAST(rt.r AS DOUBLE) * ct.c) / tot.n AS e
  FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot
)
SELECT
  (SELECT CAST(n AS BIGINT) FROM tot) AS n_events,
  COUNT(*) AS n_cells,
  (SELECT (COUNT(*) - 1) FROM rt) * (SELECT (COUNT(*) - 1) FROM ct) AS dof,
  CAST(SUM(CAST(FLOOR(((o - e) * (o - e) / e) * 1000000000) AS BIGINT)) AS DOUBLE)
    / 1000000000 AS chi2
FROM cells
"""


@register(
    "chi_square_independence",
    _CHI2_ORACLE,
    "Chi-square independence test (event type x weekday): are event "
    "kinds uniform across the week, or does the traffic mix shift? "
    "Observed counts are one map-side-combinable groupBy; marginals "
    "re-aggregate the CELL table (|types| x 7 rows — never the fact "
    "table twice); per-cell (o-e)^2/e terms are floored to 1e-9 fixed "
    "point before the sum so the statistic is bit-identical across "
    "engines and partitionings.",
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    obs = (
        ev.groupBy("event_type", (F.dayofweek("ts") - 1).alias("dow"))
        .agg(F.count(F.lit(1)).alias("o"))
        # |types| x 7 rows — materialize so the marginal/total branches
        # reuse it and the events fact table is scanned exactly ONCE.
        .localCheckpoint(eager=True)
    )
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = obs.groupBy().agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
        .withColumn("e", (F.col("r").cast("double") * F.col("c")) / F.col("n"))
    )
    term_fp = F.floor(
        ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
        * F.lit(1_000_000_000)
    ).cast("bigint")
    # dof from the cell table inside the same aggregate — no eager
    # driver actions, so the events scan happens once per plan branch
    # and never at build time.
    dof = (
        (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
    ).cast("bigint")
    return cells.groupBy().agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
        dof.alias("dof"),
        (F.sum(term_fp).cast("double") / F.lit(1_000_000_000)).alias("chi2"),
    )


# ----------------------------------------------------------------------------
# Benford first-digit screen over order totals
# ----------------------------------------------------------------------------

# log10(1 + 1/d) computed ONCE here and injected into both engines as
# identical 9-dp literals — neither engine evaluates a log.
_BENFORD = {d: round(math.log10(1 + 1 / d), 9) for d in range(1, 10)}

_BENFORD_CASE_SQL = "CASE " + " ".join(
    f"WHEN first_digit = {d} THEN {_BENFORD[d]:.9f}" for d in range(1, 10)
) + " END"

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS first_digit
  FROM orders
),
obs AS (SELECT first_digit, COUNT(*) AS n_orders FROM digits GROUP BY 1),
tot AS (SELECT SUM(n_orders) AS n FROM obs)
SELECT first_digit, n_orders,
       CAST({_BENFORD_CASE_SQL} AS DOUBLE) AS expected_share,
       CAST(FLOOR(ABS(CAST(n_orders AS DOUBLE) / tot.n
                      - ({_BENFORD_CASE_SQL})) * 1000000000) AS BIGINT)
         AS abs_dev_fp
FROM obs CROSS JOIN tot
"""


@register(
    "benford_first_digit",
    _BENFORD_ORACLE,
    "Benford's-law first-digit screen over order totals — the classic "
    "fabricated-amounts detector. One map-side-combinable groupBy over "
    "9 digit groups; expected shares are Python-precomputed log10 "
    "literals injected into both engines, and the deviation is floored "
    "to 1e-9 fixed point, so no transcendental function and no float "
    "fold-order ever touches the comparison.",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    digits = od.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("first_digit")
    )
    obs = (
        digits.groupBy("first_digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        # 9 rows — materialize so the total branch reuses it and orders
        # is scanned exactly once.
        .localCheckpoint(eager=True)
    )
    tot = obs.groupBy().agg(F.sum("n_orders").alias("n"))
    expected = F.coalesce(
        *[
            F.when(F.col("first_digit") == d, F.lit(_BENFORD[d]))
            for d in range(1, 10)
        ]
    )
    return (
        obs.crossJoin(F.broadcast(tot))
        .withColumn("expected_share", expected)
        .withColumn(
            "abs_dev_fp",
            F.floor(
                F.abs(
                    F.col("n_orders").cast("double") / F.col("n")
                    - F.col("expected_share")
                )
                * F.lit(1_000_000_000)
            ).cast("bigint"),
        )
        .select("first_digit", "n_orders", "expected_share", "abs_dev_fp")
    )


# ----------------------------------------------------------------------------
# Rolling 7-day median of daily revenue (exact, sorted fixed-point arrays)
# ----------------------------------------------------------------------------

_ROLLMED_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS day,
         SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS rev_fp
  FROM orders GROUP BY 1
),
framed AS (
  SELECT day, rev_fp,
         list_sort(list(CAST(rev_fp AS BIGINT))
           OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM daily
)
SELECT day,
       CAST(rev_fp AS DOUBLE) / 1000000 AS revenue,
       CAST(
         CASE WHEN len(arr) % 2 = 1 THEN 2 * arr[(len(arr) + 1) // 2]
              ELSE arr[len(arr) // 2] + arr[len(arr) // 2 + 1] END
         AS DOUBLE) / 2000000 AS rolling_median_7d
FROM framed
"""


@register(
    "rolling_median_7d",
    _ROLLMED_ORACLE,
    "Exact rolling 7-day median of daily revenue — the robust trend "
    "smoother that, unlike a moving average, shrugs off one-day spikes. "
    "Daily totals are exact fixed-point sums; each 7-row frame collects "
    "a sorted bigint array and the median is pure integer arithmetic "
    "(2x-scaled lower/upper average) with ONE final double divide — "
    "bit-identical across engines. The window runs over the DATE "
    "domain (bounded), with day-frame state of at most 7 bigints.",
)
def rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice")).alias("rev_fp")
    )
    w = (
        Window.orderBy("day").rowsBetween(-6, 0)
    )  # date-domain window: bounded input, 7-row frames
    framed = daily.withColumn(
        "arr",
        F.array_sort(F.collect_list(F.col("rev_fp").cast("bigint")).over(w)),
    )
    n = F.size("arr")
    lo = F.element_at("arr", F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at("arr", (F.floor(n / 2) + 1).cast("int"))
    med_x2 = lo + hi  # odd frames: lo == hi == the center element
    return framed.select(
        "day",
        (F.col("rev_fp").cast("double") / F.lit(1_000_000)).alias("revenue"),
        (med_x2.cast("double") / F.lit(2_000_000)).alias("rolling_median_7d"),
    )
