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
from data_lakehouse_platform_spark.functions.money import sql_sum, dec_sum
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
    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("grp", F.date_sub(F.col("day"), F.row_number().over(w)))
    runs = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    longest = runs.groupBy("user_id").agg(F.max("len").alias("streak_days"))
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
