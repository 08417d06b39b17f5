"""Round-7 registry extensions: the Paasche/Fisher price-index twins,
a Nelson-Aalen cumulative-hazard curve, an exact Pareto 80/20
concentration point, purchase-regularity segmentation, a Fano-factor
burstiness screen, order-backlog aging, a majority-Markov next-event
accuracy eval, Wilson confidence bounds for return rates, and a
per-label embedding-centroid cosine audit.

Registered LAST in ``queries.all_queries()`` — the external driver
grades the first 50 registry keys by registration order, so new
modules only ever append (tests/test_oracle_parity.py pins the set).

Every query keeps the registry's two disciplines: (a) the DuckDB
oracle is the NAIVE form (per-customer cumulative sorts, per-row
recomputation) so the driver compare doubles as an equivalence proof
for the scale-safe Spark plan, and (b) cross-engine exactness via the
proven tricks — exact integer moments with ONE final divide,
truncating integer division (Spark ``DIV`` == DuckDB ``//``), ordered
float folds (``aggregate`` == ``list_reduce(list_prepend(...))``), and
IEEE-exact ``sqrt`` of identically-derived doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.queries import _t, register

# ----------------------------------------------------------------------------
# Paasche + Fisher price indexes (the Laspeyres twins)
# ----------------------------------------------------------------------------

_PAASCHE_FISHER_ORACLE = """
WITH pm AS (
  SELECT date_trunc('month', o.o_orderdate) AS mon,
         l.l_partkey AS part,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(FLOOR(l.l_extendedprice * 100)) AS BIGINT) AS rev_c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
base AS (
  SELECT part, qty AS q0, rev_c AS rev0_c
  FROM pm WHERE mon = (SELECT MIN(mon) FROM pm)
),
j AS (
  SELECT pm.mon, pm.qty, pm.rev_c, base.q0, base.rev0_c
  FROM pm JOIN base ON pm.part = base.part
),
agg AS (
  SELECT mon,
         CAST(COUNT(*) AS BIGINT)                          AS n_parts,
         CAST(SUM(rev_c * 1000 * q0 // qty) AS BIGINT)     AS lasp_num,
         CAST(SUM(rev0_c * 1000) AS BIGINT)                AS lasp_den,
         CAST(SUM(rev_c * 1000) AS BIGINT)                 AS paas_num,
         CAST(SUM(rev0_c * 1000 * qty // q0) AS BIGINT)    AS paas_den
  FROM j GROUP BY mon
)
SELECT CAST(mon AS DATE) AS mon, n_parts,
       CAST(lasp_num AS DOUBLE) / lasp_den AS laspeyres,
       CAST(paas_num AS DOUBLE) / paas_den AS paasche,
       sqrt((CAST(lasp_num AS DOUBLE) / lasp_den)
            * (CAST(paas_num AS DOUBLE) / paas_den)) AS fisher
FROM agg
ORDER BY mon
"""


@register(
    "paasche_fisher_price_index",
    _PAASCHE_FISHER_ORACLE,
    "PAASCHE and FISHER price indexes per month vs the first month — "
    "the laspeyres_price_index twins that complete the classic index "
    "triple: Paasche prices the CURRENT month's basket at base-month "
    "unit values (sum(p_t q_t) / sum(p_0 q_t)), Fisher is the "
    "geometric mean sqrt(L * P) (the 'ideal' index — it alone passes "
    "the time-reversal test). Exactness: both numerators/denominators "
    "are sums of truncating BIGINT divisions (Spark DIV == DuckDB //), "
    "each index is ONE double divide, and Fisher is sqrt of the "
    "product of those two doubles — sqrt is correctly rounded in IEEE "
    "754, so identical operand bits give identical results on both "
    "engines. Plan: one fact join pre-aggregated to (month, part), a "
    "broadcast base-month basket, one grouped sum — no window, no "
    "pairs; scales as the Laspeyres plan does.",
)
def paasche_fisher_price_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    pm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("mon"),
            F.col("l_partkey").alias("part"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100))
            .cast("long")
            .alias("rev_c"),
        )
    )
    base_mon = pm.agg(F.min("mon").alias("m0"))
    base = pm.join(F.broadcast(base_mon), pm.mon == F.col("m0")).select(
        "part",
        F.col("qty").alias("q0"),
        F.col("rev_c").alias("rev0_c"),
    )
    lasp = F.col("lasp_num").cast("double") / F.col("lasp_den")
    paas = F.col("paas_num").cast("double") / F.col("paas_den")
    return (
        pm.join(F.broadcast(base), "part")
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.expr("rev_c * 1000 * q0 DIV qty"))
            .cast("long")
            .alias("lasp_num"),
            F.sum(F.col("rev0_c") * 1000).cast("long").alias("lasp_den"),
            F.sum(F.col("rev_c") * 1000).cast("long").alias("paas_num"),
            F.sum(F.expr("rev0_c * 1000 * qty DIV q0"))
            .cast("long")
            .alias("paas_den"),
        )
        .select(
            F.to_date("mon").alias("mon"),
            "n_parts",
            lasp.alias("laspeyres"),
            paas.alias("paasche"),
            F.sqrt(lasp * paas).alias("fisher"),
        )
        .orderBy("mon")
    )


# ----------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (the Kaplan-Meier dual)
# ----------------------------------------------------------------------------

_NA_WINDOW_DAYS = 90
_NA_HORIZONS = (180, 365, 730, 1460)

_NA_ORACLE = f"""
WITH per_user AS (
  SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS f,
         CAST(MAX(o_orderdate) AS DATE) AS l
  FROM orders GROUP BY 1
),
bounds AS (SELECT MAX(l) AS tend FROM per_user),
u AS (
  SELECT date_diff('day', f, l) AS dur,
         (l <= tend - INTERVAL {_NA_WINDOW_DAYS} DAY) AS churned
  FROM per_user, bounds
),
hist AS (
  SELECT dur, COUNT(*) AS n_all,
         CAST(COALESCE(SUM(CASE WHEN churned THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS d
  FROM u GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n_users FROM u),
risk AS (
  SELECT dur, d,
         n_users - COALESCE(SUM(n_all) OVER (
           ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS n_at
  FROM hist, tot
),
increments AS (
  SELECT dur, d, CAST(d AS DOUBLE) / n_at AS h
  FROM risk WHERE d > 0
),
horizons AS (SELECT unnest({list(_NA_HORIZONS)}) AS horizon_days)
SELECT horizon_days,
  list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
      COALESCE(list(h ORDER BY dur) FILTER (WHERE dur <= horizon_days),
               [])),
    (a, b) -> a + b) AS cum_hazard,
  CAST(COALESCE(SUM(d) FILTER (WHERE dur <= horizon_days), 0) AS BIGINT)
    AS deaths_within
FROM horizons LEFT JOIN increments ON TRUE
GROUP BY horizon_days
ORDER BY horizon_days
"""


@register(
    "nelson_aalen_hazard",
    _NA_ORACLE,
    "Nelson-Aalen cumulative-hazard curve of customer lifetime — the "
    "estimator dual of kaplan_meier_churn (H(t) = sum of d_i/n_i over "
    "death times; S ~ exp(-H)), preferred when hazard INCREMENTS are "
    "the decision quantity (e.g. comparing churn pressure between "
    "periods). Same censoring rule as the KM query. Exactness: each "
    "increment is ONE double divide of exact death/at-risk counts, "
    "and the cumulative sum is an ordered left-fold (ascending "
    "duration, seeded 0.0) on BOTH engines — identical operand bits, "
    "identical addition order, bit-identical doubles. Scale: "
    "lifetimes collapse to a duration histogram first (rows = "
    "distinct durations, calendar-bounded), so the unpartitioned "
    "window and the fold run on dozens of rows at any corpus size.",
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    per_user = orders.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("f"),
        F.max(F.to_date("o_orderdate")).alias("l"),
    )
    tend = per_user.agg(F.max("l").alias("tend"))
    u = per_user.crossJoin(F.broadcast(tend)).select(
        F.datediff("l", "f").alias("dur"),
        (F.col("l") <= F.date_sub("tend", _NA_WINDOW_DAYS)).alias(
            "churned"
        ),
    )
    hist = u.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    tot = u.agg(F.count(F.lit(1)).alias("n_users"))
    w = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = hist.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_all").over(w), F.lit(0))
        ).alias("n_at"),
    )
    incs = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        (F.col("d").cast("double") / F.col("n_at")).alias("h"),
    )
    packed = incs.agg(
        F.sort_array(F.collect_list(F.struct("dur", "d", "h"))).alias(
            "xs"
        )
    )
    horizons = F.array(*[F.lit(h) for h in _NA_HORIZONS])
    return (
        packed.select(
            F.explode(horizons).alias("horizon_days"), "xs"
        )
        .select(
            "horizon_days",
            F.expr(
                "aggregate(filter(xs, x -> x.dur <= horizon_days),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.h)"
            ).alias("cum_hazard"),
            F.expr(
                "CAST(aggregate(filter(xs, x -> x.dur <= horizon_days),"
                " 0L, (acc, x) -> acc + x.d) AS BIGINT)"
            ).alias("deaths_within"),
        )
        .orderBy("horizon_days")
    )


# ----------------------------------------------------------------------------
# Pareto 80/20 concentration point (exact, histogram-based)
# ----------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(FLOOR(o_totalprice * 100)) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT rev_c,
         SUM(rev_c) OVER (
           ORDER BY rev_c DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_c,
         ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS rn
  FROM per_cust
),
tot AS (
  SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c,
         CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM per_cust
)
SELECT CAST(MIN(rn) AS BIGINT) AS n_top,
       MIN(n_cust) AS n_customers,
       CAST(MIN(rn) AS DOUBLE) / MIN(n_cust) AS top_share
FROM ranked, tot
WHERE 5 * cum_c >= 4 * tot_c
"""


@register(
    "pareto_8020_customers",
    _PARETO_ORACLE,
    "Exact Pareto concentration point: the MINIMUM number of customers "
    "(by descending revenue) whose cumulative revenue reaches 80% of "
    "the total — the single-number sharpening of lorenz_curve_deciles. "
    "The Spark plan never sorts customers: revenue collapses to a "
    "histogram of distinct revenue-cent levels (equal-revenue "
    "customers are interchangeable for a cumulative-revenue threshold), "
    "a level-ordered running sum finds the boundary level, and the "
    "partial take inside it is an exact integer ceiling "
    "((4*tot - 5*cum_before + 5*rev - 1) DIV (5*rev)) — all-integer "
    "arithmetic, the 80% test is 5*cum >= 4*tot with no floats at "
    "all until the final share divide. The oracle is the NAIVE "
    "per-customer cumulative sort, so the driver compare proves the "
    "histogram plan equivalent. Scale: the window runs over DISTINCT "
    "revenue levels, not customers.",
)
def pareto_8020_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100))
        .cast("long")
        .alias("rev_c")
    )
    levels = per_cust.groupBy("rev_c").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    tot = per_cust.agg(
        F.sum("rev_c").cast("long").alias("tot_c"),
        F.count(F.lit(1)).cast("long").alias("n_cust"),
    )
    w = Window.orderBy(F.desc("rev_c")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lev = levels.crossJoin(F.broadcast(tot)).select(
        "rev_c",
        "k",
        "tot_c",
        "n_cust",
        F.coalesce(F.sum(F.col("rev_c") * F.col("k")).over(w), F.lit(0))
        .cast("long")
        .alias("cum_before_c"),
        F.coalesce(F.sum("k").over(w), F.lit(0))
        .cast("long")
        .alias("cnt_before"),
    )
    # boundary level: the first (highest-revenue-first) level whose
    # full take crosses 80%; inside it the exact minimum extra
    # customers is an integer ceiling
    boundary = lev.filter(
        (5 * (F.col("cum_before_c") + F.col("rev_c") * F.col("k")))
        >= 4 * F.col("tot_c")
    ).orderBy(F.desc("rev_c")).limit(1)
    need = (
        4 * F.col("tot_c") - 5 * F.col("cum_before_c")
    )  # remaining fifths of cents
    extra = F.expr(
        "CAST((4 * tot_c - 5 * cum_before_c + 5 * rev_c - 1) "
        "DIV (5 * rev_c) AS BIGINT)"
    )
    return boundary.select(
        F.when(need <= 0, F.col("cnt_before"))
        .otherwise(F.col("cnt_before") + extra)
        .cast("long")
        .alias("n_top"),
        F.col("n_cust").alias("n_customers"),
        (
            F.when(need <= 0, F.col("cnt_before"))
            .otherwise(F.col("cnt_before") + extra)
            .cast("double")
            / F.col("n_cust")
        ).alias("top_share"),
    )


# ----------------------------------------------------------------------------
# Purchase-regularity segmentation (inter-order gap discipline)
# ----------------------------------------------------------------------------

_REGULARITY_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
           lag(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders
),
per_cust AS (
  SELECT o_custkey,
         CAST(COUNT(gap) AS BIGINT) AS n_gaps,
         CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap,
         CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap
  FROM gaps GROUP BY 1
),
labeled AS (
  SELECT CASE
           WHEN n_gaps = 0 THEN 'one_time'
           WHEN n_gaps >= 3 AND max_gap * n_gaps <= 2 * sum_gap
             THEN 'regular'
           ELSE 'sporadic'
         END AS segment,
         n_gaps, sum_gap
  FROM per_cust
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n_gaps) AS BIGINT) AS total_gaps,
       CASE WHEN SUM(n_gaps) > 0
            THEN CAST(SUM(sum_gap) AS DOUBLE) / SUM(n_gaps)
       END AS avg_gap_days
FROM labeled
GROUP BY segment
ORDER BY segment
"""


@register(
    "purchase_regularity_segments",
    _REGULARITY_ORACLE,
    "Purchase-cadence segmentation: per customer, the inter-order gap "
    "series (lag window keyed by customer — fully partition-parallel) "
    "classifies into one_time (no repeat), regular (>= 3 gaps and the "
    "LONGEST gap at most twice the mean — stated as the all-integer "
    "rule max_gap * n_gaps <= 2 * sum_gap, no float compare), or "
    "sporadic. The subscription-detection primitive behind replenish "
    "reminders and churn risk tiers. Output: per segment, customer "
    "count, gap count, mean gap (ONE double divide of exact integer "
    "sums, NULL-guarded for the one_time segment — Spark ANSI raises "
    "on 0/0, the conversion_ab_pairs pattern).",
)
def purchase_regularity_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.select(
        "o_custkey", F.datediff("d", F.lag("d").over(w)).alias("gap")
    )
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        F.coalesce(F.sum("gap"), F.lit(0)).cast("long").alias("sum_gap"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap"),
    )
    seg = F.when(F.col("n_gaps") == 0, F.lit("one_time")).when(
        (F.col("n_gaps") >= 3)
        & (F.col("max_gap") * F.col("n_gaps") <= 2 * F.col("sum_gap")),
        F.lit("regular"),
    ).otherwise(F.lit("sporadic"))
    return (
        per_cust.select(
            seg.alias("segment"), "n_gaps", "sum_gap"
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_gaps").cast("long").alias("total_gaps"),
            F.when(
                F.sum("n_gaps") > 0,
                F.sum("sum_gap").cast("double") / F.sum("n_gaps"),
            ).alias("avg_gap_days"),
        )
        .orderBy("segment")
    )


# ----------------------------------------------------------------------------
# Fano-factor burstiness screen (events table)
# ----------------------------------------------------------------------------

_FANO_MIN_DAYS = 5

_FANO_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS d,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
)
SELECT user_id, d AS active_days, sx AS n_events,
       CAST(d * sxx - sx * sx AS DOUBLE) / (d * sx) AS fano
FROM mom
WHERE d >= {_FANO_MIN_DAYS}
ORDER BY fano DESC, user_id
"""


@register(
    "user_burstiness_fano",
    _FANO_ORACLE,
    "Fano factor (variance-to-mean ratio of the user's ACTIVE-day "
    "event counts) — the burstiness screen: ~1 is Poisson-like "
    "organic traffic, >> 1 is bursty (campaign spikes, scripted "
    "replays), << 1 is metronomic automation. Exactness: population "
    "variance / mean collapses algebraically to (d*Sxx - Sx^2) / "
    "(d*Sx) — exact BIGINT moments, ONE double divide (the ols "
    "integer-moment pattern). Plan: two hash aggregations (user-day, "
    "then user), no window, no collect; output bounded by users with "
    f">= {_FANO_MIN_DAYS} active days.",
)
def user_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    mom = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return (
        mom.filter(F.col("d") >= _FANO_MIN_DAYS)
        .select(
            "user_id",
            F.col("d").alias("active_days"),
            F.col("sx").alias("n_events"),
            (
                (
                    F.col("d") * F.col("sxx")
                    - F.col("sx") * F.col("sx")
                ).cast("double")
                / (F.col("d") * F.col("sx"))
            ).alias("fano"),
        )
        .orderBy(F.desc("fano"), "user_id")
    )


# ----------------------------------------------------------------------------
# Order-backlog aging (open orders by age bucket)
# ----------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH bounds AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS as_of_day FROM orders
),
open_orders AS (
  SELECT date_diff('day', CAST(o_orderdate AS DATE), as_of_day) AS age,
         FLOOR(o_totalprice * 100) AS price_c
  FROM orders, bounds
  WHERE o_orderstatus <> 'F'
)
SELECT CASE
         WHEN age <= 30 THEN '0-30'
         WHEN age <= 90 THEN '31-90'
         WHEN age <= 365 THEN '91-365'
         ELSE '365+'
       END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(price_c) AS BIGINT) AS value_cents,
       CAST(MAX(age) AS BIGINT) AS oldest_days
FROM open_orders
GROUP BY 1
ORDER BY MIN(age)
"""


@register(
    "order_backlog_aging",
    _BACKLOG_ORACLE,
    "Open-order backlog aging: every non-finalized order "
    "(o_orderstatus <> 'F') bucketed by days outstanding relative to "
    "the corpus as-of date (0-30 / 31-90 / 91-365 / 365+), with order "
    "count, exact value in cents, and the oldest age per bucket — the "
    "working-capital report every fulfillment team runs daily. "
    "Deterministic bucket ordering via ORDER BY MIN(age) (bucket "
    "labels don't sort chronologically as strings). Plan: one scan, "
    "broadcast 1-row as-of date, one hash aggregation — map-side "
    "partials, no window.",
)
def order_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    asof = o.agg(F.max(F.to_date("o_orderdate")).alias("asof"))
    aged = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(asof))
        .select(
            F.datediff("asof", F.to_date("o_orderdate")).alias("age"),
            F.floor(F.col("o_totalprice") * 100).alias("price_c"),
        )
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 90, "31-90")
        .when(F.col("age") <= 365, "91-365")
        .otherwise("365+")
    )
    return (
        aged.select(bucket.alias("age_bucket"), "age", "price_c")
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_c").cast("long").alias("value_cents"),
            F.max("age").cast("long").alias("oldest_days"),
            F.min("age").alias("__min_age"),
        )
        .orderBy("__min_age")
        .drop("__min_age")
    )


# ----------------------------------------------------------------------------
# Majority-Markov next-event accuracy (sequence-model baseline eval)
# ----------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
),
trans AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY 1, 2
),
majority AS (
  SELECT cur, nxt AS pred, n AS n_pred
  FROM (
    SELECT cur, nxt, n,
           ROW_NUMBER() OVER (
             PARTITION BY cur ORDER BY n DESC, nxt
           ) AS rn
    FROM trans
  ) r WHERE rn = 1
)
SELECT t.cur AS from_type, m.pred AS predicted_next,
       CAST(SUM(t.n) AS BIGINT) AS n_transitions,
       CAST(SUM(CASE WHEN t.nxt = m.pred THEN t.n ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN t.nxt = m.pred THEN t.n ELSE 0 END)
            AS DOUBLE) / SUM(t.n) AS accuracy
FROM trans t JOIN majority m ON t.cur = m.cur
GROUP BY 1, 2
ORDER BY 1
"""


@register(
    "markov_next_event_accuracy",
    _MARKOV_ORACLE,
    "First-order majority-Markov baseline eval: per event type, the "
    "majority next event (argmax of the transition counts, "
    "lexicographic tiebreak) and the accuracy that predictor achieves "
    "over the observed transitions — THE baseline any sequence model "
    "must beat before it earns a deploy, computed entirely from the "
    "transition histogram (no second pass over events). Plan: one "
    "user-partitioned lead() window (parallel by user), transitions "
    "aggregate to event_type^2 rows (domain-bounded), the argmax is a "
    "MAX_BY over that tiny frame, accuracy is ONE double divide of "
    "exact counts. Ties broken by event-type name on both engines.",
)
def markov_next_event_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # argmax with a deterministic tiebreak — min_by over the struct
    # (-count, name) is expression-level (no window) and matches the
    # oracle's ROW_NUMBER(ORDER BY n DESC, nxt) exactly
    majority = trans.groupBy("cur").agg(
        F.expr("min_by(nxt, struct(-n, nxt))").alias("pred")
    )
    return (
        trans.join(F.broadcast(majority), "cur")
        .groupBy(
            F.col("cur").alias("from_type"),
            F.col("pred").alias("predicted_next"),
        )
        .agg(
            F.sum("n").cast("long").alias("n_transitions"),
            F.sum(
                F.when(F.col("nxt") == F.col("pred"), F.col("n"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "from_type",
            "predicted_next",
            "n_transitions",
            "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_transitions")
            ).alias("accuracy"),
        )
        .orderBy("from_type")
    )


# ----------------------------------------------------------------------------
# Wilson confidence bounds for part-brand return rates
# ----------------------------------------------------------------------------

_WILSON_Z2_NUM = 96  # z^2 expressed as the exact rational 96/25 ~ 1.96^2
_WILSON_Z2_DEN = 25

_WILSON_ORACLE = f"""
WITH counts AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT brand, n, r,
       CAST(r AS DOUBLE) / n AS p_hat,
       (CAST(25 * r + 48 AS DOUBLE) / (25 * n + 96))
         - sqrt(CAST(2304 * n * n
                     + 2400 * n * r * (n - r) AS DOUBLE))
           / (25 * n + 96) / n AS wilson_lo,
       (CAST(25 * r + 48 AS DOUBLE) / (25 * n + 96))
         + sqrt(CAST(2304 * n * n
                     + 2400 * n * r * (n - r) AS DOUBLE))
           / (25 * n + 96) / n AS wilson_hi
FROM counts
ORDER BY brand
"""


@register(
    "wilson_ci_return_rate",
    _WILSON_ORACLE,
    "Wilson 95% score interval for each part brand's line return rate "
    "— the small-sample-safe bound (never leaves [0,1], no normality "
    "assumption at the tails) that ranks brands for QA attention by "
    "wilson_lo, not by the noisy point estimate. Exactness: with "
    "z^2 = 96/25 (1.96^2 exactly), the interval algebra clears "
    "denominators to INTEGER forms — center (25r+48)/(25n+96) and "
    "half-width sqrt(2304n^2 + 2400nr(n-r)) / (25n+96) / n — so both "
    "engines evaluate identical integer operands through one divide, "
    "one IEEE-exact sqrt, and two more divides in the same order; no "
    "epsilon anywhere. Plan: broadcast-able dim join, one hash "
    "aggregation over brand (bounded domain).",
)
def wilson_ci_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    counts = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("long")
            .alias("r"),
        )
    )
    center = (25 * F.col("r") + 48).cast("double") / (
        25 * F.col("n") + 96
    )
    half = (
        F.sqrt(
            (
                2304 * F.col("n") * F.col("n")
                + 2400 * F.col("n") * F.col("r") * (F.col("n") - F.col("r"))
            ).cast("double")
        )
        / (25 * F.col("n") + 96)
        / F.col("n")
    )
    return counts.select(
        "brand",
        "n",
        "r",
        (F.col("r").cast("double") / F.col("n")).alias("p_hat"),
        (center - half).alias("wilson_lo"),
        (center + half).alias("wilson_hi"),
    ).orderBy("brand")


# ----------------------------------------------------------------------------
# Embedding-centroid cosine audit (per-label cluster tightness)
# ----------------------------------------------------------------------------

_CENTROID_COS_ORACLE = """
WITH dims AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS vd
  FROM embeddings
),
cent AS (
  SELECT label, dim,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(vd ORDER BY vec_id)), (a, b) -> a + b)
           / COUNT(*) AS c
  FROM dims GROUP BY 1, 2
),
nc AS (
  SELECT label,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(c * c ORDER BY dim)), (a, b) -> a + b) AS ncs
  FROM cent GROUP BY 1
),
per_vec AS (
  SELECT d.vec_id, d.label,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(d.vd * c.c ORDER BY d.dim)), (a, b) -> a + b) AS dot,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(d.vd * d.vd ORDER BY d.dim)), (a, b) -> a + b) AS nv
  FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
  GROUP BY 1, 2
),
cosv AS (
  SELECT p.label,
         CASE WHEN p.nv = 0 OR n.ncs = 0 THEN NULL
              ELSE p.dot / (sqrt(p.nv) * sqrt(n.ncs)) END AS cosim
  FROM per_vec p JOIN nc n ON p.label = n.label
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(cosim) AS min_cos,
       MAX(cosim) AS max_cos,
       CAST(SUM(CASE WHEN cosim < 0.9 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below
FROM cosv
GROUP BY label
ORDER BY label
"""


@register(
    "embedding_centroid_cosine",
    _CENTROID_COS_ORACLE,
    "Per-label cluster-tightness audit: each label's centroid (per-"
    "dimension mean) and, for every member, its cosine to that "
    "centroid — emitting member count, the loosest and tightest "
    "member (min/max cosine) and how many members fall below 0.9, the "
    "screen that catches mislabeled vectors and split clusters before "
    "they poison a semantic-dedup or ANN-recall run. Exactness: every "
    "float is cast to double FIRST (exact), all sums — centroid "
    "accumulation (by vec_id), dot products and norms (by dimension) "
    "— are ordered left-folds seeded 0.0 on BOTH engines, sqrt is "
    "IEEE-exact, and zero-norm members yield NULL (guarded on both "
    "sides; Spark ANSI raises on double 0/0). Only order-independent "
    "label aggregates (count/min/max) touch the cosines. Plan: "
    "posexplode to (label, dim) partial aggregates — shuffle bounded "
    "by vectors x dims (linear), centroid and norm frames are "
    "labels x dims (broadcast), no pairwise joins anywhere.",
)
def embedding_centroid_cosine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("dim", "v"),
    ).select("label", "vec_id", "dim", F.col("v").cast("double").alias("vd"))
    # centroid per (label, dim): ordered fold over members (vec_id
    # order) so the double sum is bit-stable, then ONE divide
    cent = (
        dims.groupBy("label", "dim")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("vec_id", "vd"))
            ).alias("xs"),
            F.count(F.lit(1)).alias("k"),
        )
        .select(
            "label",
            "dim",
            (
                F.expr(
                    "aggregate(xs, CAST(0.0 AS DOUBLE),"
                    " (a, x) -> a + x.vd)"
                )
                / F.col("k")
            ).alias("c"),
        )
    )
    nc = (
        cent.groupBy("label")
        .agg(
            F.sort_array(F.collect_list(F.struct("dim", "c"))).alias(
                "cs"
            )
        )
        .select(
            "label",
            F.expr(
                "aggregate(cs, CAST(0.0 AS DOUBLE),"
                " (a, x) -> a + x.c * x.c)"
            ).alias("ncs"),
        )
    )
    per_vec = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("dim", "vd", "c"))
            ).alias("xs")
        )
        .select(
            "label",
            "vec_id",
            F.expr(
                "aggregate(xs, CAST(0.0 AS DOUBLE),"
                " (a, x) -> a + x.vd * x.c)"
            ).alias("dot"),
            F.expr(
                "aggregate(xs, CAST(0.0 AS DOUBLE),"
                " (a, x) -> a + x.vd * x.vd)"
            ).alias("nv"),
        )
    )
    cosim = F.when(
        (F.col("nv") == 0) | (F.col("ncs") == 0), F.lit(None)
    ).otherwise(
        F.col("dot") / (F.sqrt("nv") * F.sqrt("ncs"))
    )
    return (
        per_vec.join(F.broadcast(nc), "label")
        .select("label", cosim.alias("cosim"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("cosim").alias("min_cos"),
            F.max("cosim").alias("max_cos"),
            F.sum(F.when(F.col("cosim") < 0.9, 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
        )
        .orderBy("label")
    )


# ----------------------------------------------------------------------------
# Tail latency per ship mode (exact order statistics)
# ----------------------------------------------------------------------------

_TAIL_ORACLE = """
WITH lat AS (
  SELECT n.n_name AS nation,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS days,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
ranked AS (
  SELECT nation, days,
         ROW_NUMBER() OVER (
           PARTITION BY nation
           ORDER BY days, l_orderkey, l_linenumber
         ) AS rn,
         COUNT(*) OVER (PARTITION BY nation) AS n
  FROM lat
)
SELECT nation,
       CAST(MIN(n) AS BIGINT) AS n_lines,
       CAST(MIN(CASE WHEN 100 * rn >= 90 * n THEN days END)
            AS BIGINT) AS p90_days,
       CAST(MIN(CASE WHEN 100 * rn >= 99 * n THEN days END)
            AS BIGINT) AS p99_days,
       CAST(MAX(days) AS BIGINT) AS max_days
FROM ranked
GROUP BY nation
ORDER BY nation
"""


@register(
    "nation_tail_latency",
    _TAIL_ORACLE,
    "Tail fulfillment latency (order-to-ship delay) per customer "
    "nation: exact discrete p90/p99 as SELECTION order statistics — "
    "the smallest value whose rank covers the quantile (100*rn >= "
    "q*n, integer compare, no interpolation, so both engines pick the "
    "identical row) — plus max; the geographic-SLA view that "
    "lead_time_quartiles' priority split does not give. Scale: the "
    "Spark plan collapses to a (nation, days) HISTOGRAM first — the "
    "rank scan then runs over distinct delay values per nation "
    "(calendar-bounded), not lines, and the dims broadcast; the "
    "oracle ranks every line naively, making the compare the "
    "equivalence proof.",
)
def nation_tail_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("days"),
        )
    )
    hist = lat.groupBy("nation", "days").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    w = Window.partitionBy("nation").orderBy("days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("nation")
    ranked = hist.select(
        "nation",
        "days",
        F.sum("k").over(w).alias("cum"),
        F.sum("k").over(wn).alias("n"),
    )
    return (
        ranked.groupBy("nation")
        .agg(
            F.min("n").cast("long").alias("n_lines"),
            F.min(
                F.when(100 * F.col("cum") >= 90 * F.col("n"), F.col("days"))
            )
            .cast("long")
            .alias("p90_days"),
            F.min(
                F.when(100 * F.col("cum") >= 99 * F.col("n"), F.col("days"))
            )
            .cast("long")
            .alias("p99_days"),
            F.max("days").cast("long").alias("max_days"),
        )
        .orderBy("nation")
    )


# ----------------------------------------------------------------------------
# Event-rate anomaly days via median/MAD (robust, all-integer gate)
# ----------------------------------------------------------------------------

_MAD_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type,
         CAST(2 * median(x) AS BIGINT) AS med2
  FROM daily GROUP BY 1
),
dev AS (
  SELECT d.event_type, d.day, d.x, m.med2,
         abs(2 * d.x - m.med2) AS adev2
  FROM daily d JOIN med m ON d.event_type = m.event_type
),
mad AS (
  SELECT event_type,
         CAST(2 * median(adev2) AS BIGINT) AS mad4
  FROM dev GROUP BY 1
)
SELECT d.event_type, d.day, d.x, d.med2, m.mad4
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE m.mad4 > 0 AND 4 * d.adev2 > 7 * m.mad4
ORDER BY d.event_type, d.day
"""


@register(
    "event_rate_mad_anomalies",
    _MAD_ORACLE,
    "Robust event-rate anomaly days: per event type, daily counts "
    "whose deviation from the type's MEDIAN exceeds 3.5 MADs — the "
    "outlier gate that, unlike the z-score, is not dragged by the "
    "anomalies themselves (poisson_rate_anomaly's parametric "
    "complement). Exactness: medians of integers are half-integral, "
    "so 2*median and 2*median(|2x - 2*med|) are exact BIGINTs (both "
    "engines interpolate p50 as the midpoint of the two middle "
    "values, exact in doubles), and the 3.5-MAD gate clears to the "
    "ALL-INTEGER comparison 4*|2x - med2| > 7*mad4 — no float "
    "threshold anywhere. Scale: everything after the first "
    "aggregation runs on (type, day) rows — calendar-bounded.",
)
def event_rate_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    med = daily.groupBy("event_type").agg(
        (2 * F.expr("percentile(x, 0.5)")).cast("long").alias("med2")
    )
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day",
        "x",
        "med2",
        F.abs(2 * F.col("x") - F.col("med2")).alias("adev2"),
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.expr("percentile(adev2, 0.5)"))
        .cast("long")
        .alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("mad4") > 0)
            & (4 * F.col("adev2") > 7 * F.col("mad4"))
        )
        .select("event_type", "day", "x", "med2", "mad4")
        .orderBy("event_type", "day")
    )


# ----------------------------------------------------------------------------
# ABC x XYZ inventory matrix (revenue concentration x demand stability)
# ----------------------------------------------------------------------------

_ABC_XYZ_ORACLE = """
WITH per_part AS (
  SELECT l.l_partkey AS part,
         CAST(SUM(FLOOR(l.l_extendedprice * 100)) AS BIGINT) AS rev_c
  FROM lineitem l GROUP BY 1
),
ranked AS (
  SELECT part, rev_c,
         SUM(rev_c) OVER (
           ORDER BY rev_c DESC, part
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_c
  FROM per_part
),
tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM per_part),
abc AS (
  SELECT part, rev_c,
         CASE WHEN 10 * cum_c <= 8 * tot_c THEN 'A'
              WHEN 100 * cum_c <= 95 * tot_c THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked, tot
),
monthly AS (
  SELECT l.l_partkey AS part,
         date_trunc('month', o.o_orderdate) AS mon,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
xyz AS (
  SELECT part,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(q * q) AS BIGINT) AS sqq
  FROM monthly GROUP BY 1
),
labeled AS (
  SELECT a.abc_class,
         CASE WHEN 4 * (x.m * x.sqq - x.sq * x.sq) <= x.sq * x.sq
                THEN 'X'
              WHEN x.m * x.sqq - x.sq * x.sq <= x.sq * x.sq
                THEN 'Y'
              ELSE 'Z' END AS xyz_class,
         a.rev_c
  FROM abc a JOIN xyz x ON a.part = x.part
)
SELECT abc_class, xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_c) AS BIGINT) AS revenue_cents
FROM labeled
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "abc_xyz_matrix",
    _ABC_XYZ_ORACLE,
    "The ABC x XYZ inventory planning matrix: ABC = cumulative-revenue "
    "class (A = first 80% of revenue by descending part revenue, B = "
    "next 15%, C = tail; all-integer threshold compares 10*cum <= "
    "8*tot / 100*cum <= 95*tot with (revenue, partkey) tiebreak), XYZ "
    "= demand stability over the part's active months via the "
    "coefficient of variation, cleared of floats entirely: cv^2 <= "
    "1/4 <=> 4*(m*Sqq - Sq^2) <= Sq^2 ('X'), cv^2 <= 1 ('Y'), else "
    "'Z'. Nine cells with part counts and exact revenue. Scale: the "
    "Spark ABC pass rides the revenue-LEVEL histogram (running sums "
    "over distinct revenue values; within a level, parts rank by key "
    "inside that level's tie group only — exact same classes as the "
    "oracle's naive per-part cumulative sort), XYZ is two hash "
    "aggregations; no table-sized window anywhere.",
)
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    from pyspark import StorageLevel

    from data_lakehouse_platform_spark.catalog import input_scaled_partitions

    per_part = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100))
            .cast("long")
            .alias("rev_c")
        )
        # r10 optimization: per_part feeds three consumers (the revenue
        # level histogram, the total scalar, and the ABC join) — without
        # the persist each re-ran the lineitem scan + groupBy (plan
        # audit: lineitem scanned 4x in this query).  Part-cardinality,
        # persisted once at input-scaled width (1 partition locally,
        # thousands at lake scale — cached plans keep their static
        # partitioning); the monthly XYZ branch still scans the fact
        # separately (it needs the orders join for calendar months).
        .repartition(input_scaled_partitions(sf_dir, "lineitem"), "part")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ABC via the level histogram: running revenue BEFORE each level,
    # plus each part's rank inside its own tie level (tiny windows)
    levels = per_part.groupBy("rev_c").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    wlev = Window.orderBy(F.desc("rev_c")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lev = levels.select(
        "rev_c",
        F.coalesce(
            F.sum(F.col("rev_c") * F.col("k")).over(wlev), F.lit(0)
        )
        .cast("long")
        .alias("cum_before_c"),
    )
    wtie = Window.partitionBy("rev_c").orderBy("part")
    tot = per_part.agg(F.sum("rev_c").cast("long").alias("tot_c"))
    abc = (
        per_part.join(lev, "rev_c")
        .crossJoin(F.broadcast(tot))
        .select(
            "part",
            "rev_c",
            (
                F.col("cum_before_c")
                + F.col("rev_c") * F.row_number().over(wtie)
            ).alias("cum_c"),
            "tot_c",
        )
        .select(
            "part",
            "rev_c",
            F.when(
                10 * F.col("cum_c") <= 8 * F.col("tot_c"), "A"
            )
            .when(100 * F.col("cum_c") <= 95 * F.col("tot_c"), "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    monthly = (
        li.select("l_orderkey", "l_partkey", "l_quantity")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    xyz = monthly.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    var_num = F.col("m") * F.col("sqq") - F.col("sq") * F.col("sq")
    labeled = abc.join(xyz, "part").select(
        "abc_class",
        F.when(4 * var_num <= F.col("sq") * F.col("sq"), "X")
        .when(var_num <= F.col("sq") * F.col("sq"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        "rev_c",
    )
    return (
        labeled.groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev_c").cast("long").alias("revenue_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )


# ----------------------------------------------------------------------------
# Character-diversity (Gini impurity) per language
# ----------------------------------------------------------------------------

_CHAR_GINI_ORACLE = """
WITH chars AS (
  SELECT lang, unnest(string_split(text, '')) AS ch
  FROM documents
),
counts AS (
  SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM chars GROUP BY 1, 2
),
agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS distinct_chars,
         CAST(SUM(c) AS BIGINT) AS total_chars,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2
  FROM counts GROUP BY 1
)
SELECT lang, distinct_chars, total_chars,
       CAST(total_chars * total_chars - sum_c2 AS DOUBLE)
         / (total_chars * total_chars) AS gini_impurity
FROM agg
ORDER BY lang
"""


@register(
    "char_gini_by_lang",
    _CHAR_GINI_ORACLE,
    "Character-diversity screen per language: Gini impurity of the "
    "corpus character distribution (1 - sum p_i^2 — the log-free "
    "entropy stand-in, like token_diversity_simpson at token level) "
    "plus alphabet size — near-zero impurity flags degenerate or "
    "template-flooded slices, an unexpectedly small alphabet flags "
    "mojibake or wrong-language routing. Exactness: impurity "
    "collapses to (N^2 - sum c^2) / N^2 — exact BIGINT character "
    "counts, ONE double divide. Scale: explode is linear in corpus "
    "characters and aggregates immediately to (lang, char) — the "
    "downstream frames are alphabet-bounded.",
)
def char_gini_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("lang", "text")
    counts = (
        d.select("lang", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("lang", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = counts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("distinct_chars"),
        F.sum("c").cast("long").alias("total_chars"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    n2 = F.col("total_chars") * F.col("total_chars")
    return agg.select(
        "lang",
        "distinct_chars",
        "total_chars",
        ((n2 - F.col("sum_c2")).cast("double") / n2).alias(
            "gini_impurity"
        ),
    ).orderBy("lang")


# ----------------------------------------------------------------------------
# Supplier lead-time trend (Mann-Kendall S on monthly means, all-integer)
# ----------------------------------------------------------------------------

_SUPP_TREND_ORACLE = """
WITH monthly AS (
  SELECT l.l_suppkey AS supp,
         date_trunc('month', o.o_orderdate) AS mon,
         CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE))) AS BIGINT)
           AS sum_days,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.supp,
         CASE WHEN b.sum_days * a.n > a.sum_days * b.n THEN 1
              WHEN b.sum_days * a.n < a.sum_days * b.n THEN -1
              ELSE 0 END AS sgn
  FROM monthly a JOIN monthly b
    ON a.supp = b.supp AND a.mon < b.mon
),
stat AS (
  SELECT supp, CAST(SUM(sgn) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
),
m AS (
  SELECT supp, CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly
  GROUP BY 1
)
SELECT s.supp AS suppkey, m.n_months, s.n_pairs, s.s_stat,
       CASE WHEN s.s_stat < 0 THEN 'improving'
            WHEN s.s_stat > 0 THEN 'worsening'
            ELSE 'flat' END AS trend
FROM stat s JOIN m ON s.supp = m.supp
WHERE m.n_months >= 6
ORDER BY suppkey
"""


@register(
    "supplier_leadtime_trend_counts",
    _SUPP_TREND_ORACLE,
    "Per-supplier lead-time trend: the Mann-Kendall S statistic over "
    "the supplier's MONTHLY MEAN order-to-ship delay — negative S = "
    "lead times improving, positive = worsening — the vendor-"
    "management scorecard row that mann_kendall_trend's single global "
    "series does not give. Exactness: mean comparisons between months "
    "cross-multiply exact integer (sum, count) pairs (sum_i * n_j vs "
    "sum_j * n_i — never a float mean), so S is an exact integer. "
    "Scale: pairs form within (supplier, month-pair) only — months^2 "
    "per supplier is calendar-bounded, the pair count is LINEAR in "
    "suppliers; the oracle is the same naive pairwise join, proving "
    "the Spark plan (a self-join partitioned by supplier) equivalent.",
)
def supplier_leadtime_trend_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("supp"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(
            F.sum(
                F.datediff(
                    F.to_date("l_shipdate"), F.to_date("o_orderdate")
                )
            )
            .cast("long")
            .alias("sum_days"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    pairs = a.join(
        b,
        (F.col("a.supp") == F.col("b.supp"))
        & (F.col("a.mon") < F.col("b.mon")),
    ).select(
        F.col("a.supp").alias("supp"),
        F.when(
            F.col("b.sum_days") * F.col("a.n")
            > F.col("a.sum_days") * F.col("b.n"),
            1,
        )
        .when(
            F.col("b.sum_days") * F.col("a.n")
            < F.col("a.sum_days") * F.col("b.n"),
            -1,
        )
        .otherwise(0)
        .alias("sgn"),
    )
    stat = pairs.groupBy("supp").agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    months = monthly.groupBy("supp").agg(
        F.count(F.lit(1)).cast("long").alias("n_months")
    )
    return (
        stat.join(months, "supp")
        .filter(F.col("n_months") >= 6)
        .select(
            F.col("supp").alias("suppkey"),
            "n_months",
            "n_pairs",
            "s_stat",
            F.when(F.col("s_stat") < 0, "improving")
            .when(F.col("s_stat") > 0, "worsening")
            .otherwise("flat")
            .alias("trend"),
        )
        .orderBy("suppkey")
    )


# ----------------------------------------------------------------------------
# Holt-Winters additive forecast (level + trend + weekly season, integers)
# ----------------------------------------------------------------------------

_HW_HORIZONS = (1, 7, 14)

# the recurrence, spelled once and inlined into both engines' replays
_HW_SI_SQL = "r.s[((q.rn - 1) % 7) + 1]"
_HW_LT_SQL = f"(q.cents - {_HW_SI_SQL} + r.l + r.b) // 2"
_HW_BT_SQL = f"(({_HW_LT_SQL}) - r.l + r.b) // 2"

_HW_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS DECIMAL(28,0)))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
q AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
),
r AS (
  SELECT CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS l,
         CAST(0 AS BIGINT) AS b,
         [0, 0, 0, 0, 0, 0, 0]::BIGINT[] AS s
  UNION ALL
  SELECT q.rn,
         {_HW_LT_SQL} AS l,
         {_HW_BT_SQL} AS b,
         list_transform(r.s, (v, j) ->
           CASE WHEN j = ((q.rn - 1) % 7) + 1
                THEN (q.cents - ({_HW_LT_SQL}) + {_HW_SI_SQL}) // 2
                ELSE v END) AS s
  FROM r JOIN q ON q.rn = r.rn + 1
),
final AS (
  SELECT l, b, s, rn AS n_days FROM r ORDER BY rn DESC LIMIT 1
),
horizons AS (SELECT unnest({list(_HW_HORIZONS)}) AS horizon_days)
SELECT horizon_days, CAST(n_days AS BIGINT) AS n_days,
       l / 100.0 AS level,
       b / 100.0 AS trend,
       s[CAST((n_days - 1 + horizon_days) % 7 AS INT) + 1] / 100.0
         AS season,
       (l + horizon_days * b
          + s[CAST((n_days - 1 + horizon_days) % 7 AS INT) + 1])
         / 100.0 AS forecast
FROM horizons, final
ORDER BY horizon_days
"""

_HW_SI = "element_at(acc.s, CAST(acc.i % 7 AS INT) + 1)"
_HW_LT = f"(x.cents - {_HW_SI} + acc.l + acc.b) div 2"
_HW_BT = f"(({_HW_LT}) - acc.l + acc.b) div 2"
_HW_FOLD = (
    "aggregate(xs,"
    " named_struct('l', 0L, 'b', 0L,"
    "              's', array_repeat(0L, 7), 'i', 0L),"
    " (acc, x) -> named_struct("
    f"   'l', {_HW_LT},"
    f"   'b', {_HW_BT},"
    "    's', transform(acc.s, (v, j) ->"
    "           IF(CAST(j AS BIGINT) = acc.i % 7,"
    f"             (x.cents - ({_HW_LT}) + {_HW_SI}) div 2, v)),"
    "    'i', acc.i + 1L),"
    " acc -> acc)"
)


@register(
    "holt_winters_forecast",
    _HW_ORACLE,
    "Holt-Winters ADDITIVE triple-exponential forecast of daily "
    "revenue (level + trend + weekly season, alpha = beta = gamma = "
    "1/2) at 1/7/14-day horizons — the seasonal upgrade over "
    "holt_linear_forecast when weekday structure dominates. The whole "
    "state (level, trend, the 7 seasonal terms) is an INTEGER "
    "recurrence on exact cents: l' = (x - s_i + l + b) div 2, b' = "
    "(l' - l + b) div 2, s_i' = (x - l' + s_i) div 2 — truncating "
    "integer division agrees between Spark div and DuckDB // for both "
    "signs, so the state replays bit-identically (Spark: one "
    "aggregate() left fold carrying a struct with the season array; "
    "oracle: recursive CTE with BIGINT[] list state); doubles appear "
    "only in the final display divides. Scale: orders collapse "
    "map-side to per-day cents, the fold runs over a calendar-bounded "
    "array.",
)
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast(
                    "decimal(28,0)"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias(
            "xs"
        )
    )
    state = packed.select(
        F.size("xs").cast("bigint").alias("n_days"),
        F.expr(_HW_FOLD).alias("st"),
    )
    horizons = F.array(*[F.lit(h) for h in _HW_HORIZONS])
    season = F.expr(
        "element_at(st.s,"
        " CAST((n_days - 1 + horizon_days) % 7 AS INT) + 1)"
    )
    return (
        state.select(F.explode(horizons).alias("horizon_days"),
                     "n_days", "st")
        .select(
            "horizon_days",
            "n_days",
            (F.col("st.l") / F.lit(100.0)).alias("level"),
            (F.col("st.b") / F.lit(100.0)).alias("trend"),
            (season / F.lit(100.0)).alias("season"),
            (
                (
                    F.col("st.l")
                    + F.col("horizon_days") * F.col("st.b")
                    + season
                )
                / F.lit(100.0)
            ).alias("forecast"),
        )
        .orderBy("horizon_days")
    )


# ----------------------------------------------------------------------------
# Stationary event mix: in-engine power iteration on the Markov matrix
# ----------------------------------------------------------------------------

_STATIONARY_ITERS = 20

_STATIONARY_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
),
trans AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
types AS (
  SELECT event_type AS t,
         CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS tid
  FROM (SELECT DISTINCT event_type FROM events) d
),
dense AS (
  SELECT ti.tid AS i, tj.tid AS j,
         CAST(COALESCE(tr.n, 0) AS BIGINT) AS cnt
  FROM types ti
  CROSS JOIN types tj
  LEFT JOIN trans tr ON tr.cur = ti.t AND tr.nxt = tj.t
),
rowtot AS (
  SELECT i, CAST(SUM(cnt) AS BIGINT) AS tot FROM dense GROUP BY 1
),
probs AS (
  SELECT d.i, d.j,
         CASE WHEN r.tot = 0
              THEN CASE WHEN d.i = d.j THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END
              ELSE CAST(d.cnt AS DOUBLE) / r.tot END AS p
  FROM dense d JOIN rowtot r ON d.i = r.i
),
packed AS (
  SELECT list(p ORDER BY i, j) AS pm,
         CAST((SELECT COUNT(*) FROM types) AS BIGINT) AS m
  FROM probs
),
go AS (
  SELECT 0 AS k, m, pm,
         list_transform(generate_series(1, m), x -> 1.0 / m) AS v
  FROM packed
  UNION ALL
  SELECT k + 1, m, pm,
         list_transform(generate_series(1, m), j ->
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(generate_series(1, m),
               i -> v[i] * pm[(i - 1) * m + j])),
             (a, b) -> a + b))
  FROM go WHERE k < {_STATIONARY_ITERS}
),
fin AS (SELECT v FROM go ORDER BY k DESC LIMIT 1)
SELECT t.t AS event_type,
       f.v[CAST(t.tid AS INT)] AS stationary_share
FROM types t, fin f
ORDER BY event_type
"""


@register(
    "stationary_event_mix",
    _STATIONARY_ORACLE,
    "Long-run stationary distribution of the user-journey Markov "
    f"chain: {_STATIONARY_ITERS} power-iteration steps of v' = P^T v "
    "on the dense event-type transition matrix (rows with no observed "
    "exit get a self-loop, the standard absorbing fix) — where the "
    "journey settles, vs where it starts; the steady-state companion "
    "of event_transitions and markov_next_event_accuracy. ENTIRELY "
    "in-engine: the matrix packs into ONE row-major array (domain-"
    "bounded, event_types^2 entries) and the iteration is a pure "
    "expression fold — Spark aggregate(sequence(1, k)) over nested "
    "transform/aggregate, DuckDB a recursive CTE over the same nested "
    "list folds; every inner product folds i ascending with identical "
    "operands (probabilities are single divides of exact counts, v0 = "
    "1.0/m), so all doubles are bit-identical. No driver loop, no "
    "collect.",
)
def stationary_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wt = Window.orderBy("t")  # domain-bounded: distinct event types
    types = (
        e.select(F.col("event_type").alias("t"))
        .distinct()
        .select("t", F.row_number().over(wt).cast("long").alias("tid"))
    )
    ti = types.select(F.col("t").alias("ct"), F.col("tid").alias("i"))
    tj = types.select(F.col("t").alias("nt"), F.col("tid").alias("j"))
    dense = (
        ti.crossJoin(F.broadcast(tj))
        .join(
            F.broadcast(trans),
            (F.col("ct") == F.col("cur")) & (F.col("nt") == F.col("nxt")),
            "left",
        )
        .select(
            "i", "j", F.coalesce(F.col("n"), F.lit(0)).alias("cnt")
        )
    )
    wrow = Window.partitionBy("i")
    probs = dense.select(
        "i",
        "j",
        F.when(
            F.sum("cnt").over(wrow) == 0,
            F.when(F.col("i") == F.col("j"), F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
        )
        .otherwise(
            F.col("cnt").cast("double") / F.sum("cnt").over(wrow)
        )
        .alias("p"),
    )
    packed = probs.agg(
        F.sort_array(F.collect_list(F.struct("i", "j", "p"))).alias(
            "pj"
        ),
        F.max("i").cast("int").alias("m"),
    ).select(
        F.expr("transform(pj, x -> x.p)").alias("pm"), "m"
    )
    iterate = (
        "aggregate(sequence(1, {k}),"
        " transform(sequence(1, m), x -> 1.0D / m),"
        " (v, kk) -> transform(sequence(1, m), j ->"
        "   aggregate(sequence(1, m), CAST(0.0 AS DOUBLE),"
        "     (a, i) -> a + element_at(v, i)"
        "       * element_at(pm, (i - 1) * m + j))),"
        " v -> v)"
    ).format(k=_STATIONARY_ITERS)
    v = packed.select(F.expr(iterate).alias("v"))
    return (
        types.crossJoin(F.broadcast(v))
        .select(
            F.col("t").alias("event_type"),
            F.expr(
                "element_at(v, CAST(tid AS INT))"
            ).alias("stationary_share"),
        )
        .orderBy("event_type")
    )


# ----------------------------------------------------------------------------
# Brand reorder rate (repeat-purchase loyalty per brand)
# ----------------------------------------------------------------------------

_REORDER_ORACLE = """
WITH cb AS (
  SELECT p.p_brand AS brand, o.o_custkey AS cust,
         CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS reorder_rate
FROM cb
GROUP BY brand
ORDER BY brand
"""


@register(
    "brand_reorder_rate",
    _REORDER_ORACLE,
    "Repeat-purchase loyalty per part brand: of the customers who "
    "ever bought the brand, the share who bought it in 2+ DISTINCT "
    "orders — the retention-quality signal behind assortment and "
    "promo decisions (a high-revenue brand with a low reorder rate is "
    "promo-driven, not loved). Exactness: counts + ONE divide. "
    "Scale: broadcast part dim, (brand, customer) pre-aggregation "
    "with COUNT(DISTINCT orderkey) expanded by Spark's own "
    "partial-distinct rewrite, then a brand-bounded rollup.",
)
def brand_reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("o_custkey").alias("cust"),
        )
        .agg(F.countDistinct("o_orderkey").cast("long").alias("n_orders"))
    )
    return (
        cb.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buyers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_repeat"),
        )
        .select(
            "brand",
            "n_buyers",
            "n_repeat",
            (
                F.col("n_repeat").cast("double") / F.col("n_buyers")
            ).alias("reorder_rate"),
        )
        .orderBy("brand")
    )


# ----------------------------------------------------------------------------
# kNN label agreement (embedding-space label-consistency eval)
# ----------------------------------------------------------------------------

_KNN_PROBES = 64
_KNN_K = 5

_KNN_ORACLE = f"""
WITH probes AS (
  SELECT vec_id, embedding, label
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {_KNN_PROBES}
),
pairs AS (
  SELECT p.vec_id AS probe_id, p.label AS probe_label,
         e.vec_id AS cand_id, e.label AS cand_label,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(generate_series(1, len(p.embedding)),
             i -> CAST(p.embedding[i] AS DOUBLE)
                  * CAST(e.embedding[i] AS DOUBLE))),
           (a, b) -> a + b) AS dot
  FROM probes p JOIN embeddings e ON e.vec_id <> p.vec_id
),
ranked AS (
  SELECT probe_id, probe_label, cand_label,
         ROW_NUMBER() OVER (
           PARTITION BY probe_id ORDER BY dot DESC, cand_id
         ) AS rn
  FROM pairs
),
per_probe AS (
  SELECT probe_id, probe_label,
         CAST(SUM(CASE WHEN cand_label = probe_label THEN 1 ELSE 0 END)
              AS BIGINT) AS agree
  FROM ranked WHERE rn <= {_KNN_K}
  GROUP BY 1, 2
)
SELECT probe_label AS label,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(agree) AS BIGINT) AS n_agree,
       CAST(SUM(agree) AS DOUBLE) / ({_KNN_K} * COUNT(*))
         AS agreement_rate
FROM per_probe
GROUP BY probe_label
ORDER BY label
"""


@register(
    "knn_label_agreement",
    _KNN_ORACLE,
    f"Embedding-space label-consistency eval: for {_KNN_PROBES} "
    "deterministic probe vectors (md5 bottom-k — engine-neutral "
    "sampling), the exact {k}-nearest neighbors by dot product over "
    "the WHOLE corpus, and the share of neighbors sharing the probe's "
    "label — low agreement flags noisy labels or an embedding that "
    "does not separate the classes, the go/no-go check before "
    "dedup_semantic or a kNN classifier. Exactness: dot products fold "
    "dimensions ascending with float->double casts (identical "
    "operand bits both engines), neighbor ranks break ties by "
    "candidate id. Scale: probe set is CONSTANT-bounded, so the "
    "similarity pass is probes x corpus = linear; the rank windows "
    "partition by probe.".format(k=_KNN_K),
)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    wp = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    probes = (
        e.select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("pv"),
            F.col("label").alias("probe_label"),
            F.row_number().over(wp).alias("pr"),
        )
        .filter(F.col("pr") <= _KNN_PROBES)
        .drop("pr")
    )
    dot = F.expr(
        "aggregate(zip_with(pv, embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    pairs = (
        F.broadcast(probes)
        .join(e, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "probe_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            dot.alias("dot"),
        )
    )
    wr = Window.partitionBy("probe_id").orderBy(
        F.desc("dot"), "cand_id"
    )
    per_probe = (
        pairs.select(
            "probe_id",
            "probe_label",
            "cand_label",
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") <= _KNN_K)
        .groupBy("probe_id", "probe_label")
        .agg(
            F.sum(
                F.when(
                    F.col("cand_label") == F.col("probe_label"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("agree")
        )
    )
    return (
        per_probe.groupBy(F.col("probe_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum("agree").cast("long").alias("n_agree"),
        )
        .select(
            "label",
            "n_probes",
            "n_agree",
            (
                F.col("n_agree").cast("double")
                / (_KNN_K * F.col("n_probes"))
            ).alias("agreement_rate"),
        )
        .orderBy("label")
    )


# ----------------------------------------------------------------------------
# Discriminative terms per language (chi-square keyness)
# ----------------------------------------------------------------------------

_CHI2_TOPK = 10
_CHI2_MIN_COUNT = 5

_CHI2_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tk
  FROM documents
),
tok2 AS (SELECT lang, tk FROM tok WHERE tk <> ''),
lt AS (
  SELECT lang, tk, CAST(COUNT(*) AS BIGINT) AS a
  FROM tok2 GROUP BY 1, 2
),
ltot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS lsum FROM tok2 GROUP BY 1),
ttot AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS tsum FROM tok2 GROUP BY 1),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok2),
cells AS (
  SELECT lt.lang, lt.tk, lt.a,
         ttot.tsum - lt.a AS b,
         ltot.lsum - lt.a AS c,
         g.n - ttot.tsum - ltot.lsum + lt.a AS d,
         g.n AS n
  FROM lt JOIN ltot ON lt.lang = ltot.lang
  JOIN ttot ON lt.tk = ttot.tk
  CROSS JOIN g
),
scored AS (
  SELECT lang, tk, a,
         CAST(n AS DOUBLE)
           * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
              - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
           * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
              - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
           / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
              * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
           AS chi2
  FROM cells
  WHERE a >= {_CHI2_MIN_COUNT}
    AND CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        > CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
),
ranked AS (
  SELECT lang, tk, a, chi2,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY chi2 DESC, tk
         ) AS rn
  FROM scored
)
SELECT lang, tk AS term, a AS n_in_lang, chi2, CAST(rn AS BIGINT) AS rnk
FROM ranked WHERE rn <= {_CHI2_TOPK}
ORDER BY lang, rnk
"""


@register(
    "discriminative_terms_chi2",
    _CHI2_ORACLE,
    "Keyness analysis: the top tokens most DISCRIMINATIVE of each "
    "language by chi-square over the (in-lang, out-lang) x (term, "
    "not-term) contingency cells, positive-association side only (ad "
    "> bc) with a min-count floor — the screen that surfaces "
    "language-routing contamination (an English stopword ranking high "
    "for 'de' means mislabeled docs). Exactness: the cells are exact "
    "BIGINT counts; chi2 = n*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) is "
    "evaluated with every operand cast to double FIRST and the same "
    "operation order on both engines (int64 products would overflow "
    "at corpus scale; identical double operands + identical op order "
    "= identical doubles). Ranks tie-break by term. Scale: everything "
    "aggregates to (lang, token) — vocabulary-bounded; the rank "
    "window partitions by language.",
)
def discriminative_terms_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("lang", "text")
    tok = d.select(
        "lang", F.explode(F.split("text", " ")).alias("tk")
    ).filter(F.col("tk") != "")
    lt = tok.groupBy("lang", "tk").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    ltot = tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("lsum")
    )
    ttot = tok.groupBy("tk").agg(
        F.count(F.lit(1)).cast("long").alias("tsum")
    )
    g = tok.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = (
        lt.join(F.broadcast(ltot), "lang")
        .join(ttot, "tk")
        .crossJoin(F.broadcast(g))
        .select(
            "lang",
            "tk",
            "a",
            (F.col("tsum") - F.col("a")).alias("b"),
            (F.col("lsum") - F.col("a")).alias("c"),
            (
                F.col("n") - F.col("tsum") - F.col("lsum") + F.col("a")
            ).alias("d"),
            "n",
        )
    )
    ad = F.col("a").cast("double") * F.col("d").cast("double")
    bc = F.col("b").cast("double") * F.col("c").cast("double")
    chi2 = (
        F.col("n").cast("double")
        * (ad - bc)
        * (ad - bc)
        / (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d")).cast("double")
            * (F.col("a") + F.col("c")).cast("double")
            * (F.col("b") + F.col("d")).cast("double")
        )
    )
    scored = cells.filter(
        (F.col("a") >= _CHI2_MIN_COUNT) & (ad > bc)
    ).select("lang", "tk", "a", chi2.alias("chi2"))
    wr = Window.partitionBy("lang").orderBy(F.desc("chi2"), "tk")
    return (
        scored.select(
            "lang", "tk", "a", "chi2",
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") <= _CHI2_TOPK)
        .select(
            "lang",
            F.col("tk").alias("term"),
            F.col("a").alias("n_in_lang"),
            "chi2",
            F.col("rn").cast("long").alias("rnk"),
        )
        .orderBy("lang", "rnk")
    )


# ----------------------------------------------------------------------------
# Ship-delay percentiles by order-size band (exact selection ranks)
# ----------------------------------------------------------------------------

_DELAY_BAND_ORACLE = """
WITH lines AS (
  SELECT CASE WHEN CAST(l.l_quantity AS BIGINT) <= 10 THEN 'small'
              WHEN CAST(l.l_quantity AS BIGINT) <= 30 THEN 'medium'
              ELSE 'large' END AS band,
         CAST(l.l_quantity AS BIGINT) AS q,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS days,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ranked AS (
  SELECT band, days,
         ROW_NUMBER() OVER (
           PARTITION BY band
           ORDER BY days, l_orderkey, l_linenumber
         ) AS rn,
         COUNT(*) OVER (PARTITION BY band) AS n
  FROM lines
)
SELECT band,
       CAST(MIN(n) AS BIGINT) AS n_lines,
       CAST(MIN(CASE WHEN 2 * rn >= n THEN days END) AS BIGINT)
         AS p50_days,
       CAST(MIN(CASE WHEN 100 * rn >= 95 * n THEN days END) AS BIGINT)
         AS p95_days,
       CAST(MAX(days) AS BIGINT) AS max_days
FROM ranked
GROUP BY band
ORDER BY MIN(CASE WHEN band = 'small' THEN 1
                  WHEN band = 'medium' THEN 2 ELSE 3 END)
"""


@register(
    "delay_by_quantity_band",
    _DELAY_BAND_ORACLE,
    "Does order size slow fulfillment? Exact discrete p50/p95/max "
    "order-to-ship delay per quantity band (small <= 10, medium <= "
    "30, large) — selection order statistics (2*rn >= n and 100*rn >= "
    "95*n integer compares, no interpolation), bands ordered "
    "small/medium/large. Scale: the Spark plan collapses to a (band, "
    "days) histogram before ranking (distinct delay values, calendar-"
    "bounded), the oracle ranks every line naively — the equivalence "
    "proof, same as nation_tail_latency.",
)
def delay_by_quantity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    band = (
        F.when(F.col("l_quantity").cast("long") <= 10, "small")
        .when(F.col("l_quantity").cast("long") <= 30, "medium")
        .otherwise("large")
    )
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        band.alias("band"),
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("days"),
    )
    hist = lines.groupBy("band", "days").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    w = Window.partitionBy("band").orderBy("days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("band")
    ranked = hist.select(
        "band",
        "days",
        F.sum("k").over(w).alias("cum"),
        F.sum("k").over(wn).alias("n"),
    )
    order_key = (
        F.when(F.col("band") == "small", 1)
        .when(F.col("band") == "medium", 2)
        .otherwise(3)
    )
    return (
        ranked.groupBy("band")
        .agg(
            F.min("n").cast("long").alias("n_lines"),
            F.min(
                F.when(2 * F.col("cum") >= F.col("n"), F.col("days"))
            )
            .cast("long")
            .alias("p50_days"),
            F.min(
                F.when(100 * F.col("cum") >= 95 * F.col("n"), F.col("days"))
            )
            .cast("long")
            .alias("p95_days"),
            F.max("days").cast("long").alias("max_days"),
            F.min(order_key).alias("__ok"),
        )
        .orderBy("__ok")
        .drop("__ok")
    )


# ----------------------------------------------------------------------------
# Domain-rule DQ audit (expectations-style constraint sweep)
# ----------------------------------------------------------------------------

_DQ_RULES_ORACLE = """
WITH j AS (
  SELECT l.l_discount, l.l_tax, CAST(l.l_quantity AS BIGINT) AS q,
         l.l_extendedprice,
         CAST(l.l_shipdate AS DATE) AS ship,
         CAST(o.o_orderdate AS DATE) AS ordd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j),
rules AS (
  SELECT 'discount_in_0_10pct' AS rule,
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                       THEN 1 ELSE 0 END) AS BIGINT) AS viol
  FROM j
  UNION ALL
  SELECT 'tax_in_0_8pct',
         CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM j
  UNION ALL
  SELECT 'quantity_1_to_50',
         CAST(SUM(CASE WHEN q < 1 OR q > 50 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM j
  UNION ALL
  SELECT 'extendedprice_positive',
         CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM j
  UNION ALL
  SELECT 'ship_not_before_order',
         CAST(SUM(CASE WHEN ship < ordd THEN 1 ELSE 0 END) AS BIGINT)
  FROM j
)
SELECT rule, viol AS n_violations, tot.n AS n_rows,
       CAST(1000000 * viol AS DOUBLE) / tot.n AS violation_ppm
FROM rules, tot
ORDER BY rule
"""


@register(
    "dq_domain_rules",
    _DQ_RULES_ORACLE,
    "Expectations-style domain-rule sweep over the fact join: five "
    "declarative constraints (discount in [0, 0.1], tax in [0, 0.08], "
    "quantity in [1, 50], positive price, ship date not before order "
    "date) with violation counts and exact ppm — the DLT/Great-"
    "Expectations-shaped audit that complements dq_metrics' "
    "null/dupe profile and dq_referential's FK sweep; the cross-field "
    "temporal rule is why the scan joins orders. ONE pass: all five "
    "rules are conditional sums in a single aggregation (map-side "
    "partials, no per-rule scan), the ppm is one double divide of "
    "exact counts.",
)
def dq_domain_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_tax", "l_quantity",
        "l_extendedprice", "l_shipdate",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_discount",
        "l_tax",
        F.col("l_quantity").cast("long").alias("q"),
        "l_extendedprice",
        F.to_date("l_shipdate").alias("ship"),
        F.to_date("o_orderdate").alias("ordd"),
    )
    def _viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    one = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _viol(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("discount_in_0_10pct"),
        _viol((F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)).alias(
            "tax_in_0_8pct"
        ),
        _viol((F.col("q") < 1) | (F.col("q") > 50)).alias(
            "quantity_1_to_50"
        ),
        _viol(F.col("l_extendedprice") <= 0).alias(
            "extendedprice_positive"
        ),
        _viol(F.col("ship") < F.col("ordd")).alias(
            "ship_not_before_order"
        ),
    )
    rules = [
        "discount_in_0_10pct",
        "extendedprice_positive",
        "quantity_1_to_50",
        "ship_not_before_order",
        "tax_in_0_8pct",
    ]
    stacked = one.select(
        F.expr(
            "stack({n}, {args}) AS (rule, n_violations)".format(
                n=len(rules),
                args=", ".join(f"'{r}', {r}" for r in rules),
            )
        ),
        F.col("n").alias("n_rows"),
    )
    return stacked.select(
        "rule",
        "n_violations",
        "n_rows",
        (
            (1000000 * F.col("n_violations")).cast("double")
            / F.col("n_rows")
        ).alias("violation_ppm"),
    ).orderBy("rule")
