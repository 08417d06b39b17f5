"""Round-9 registry additions.

Registered AFTER every pre-existing module (see the import order note
in :func:`queries.all_queries`): the external driver grades the first
50 registry keys by registration order, so new entries only ever
append.

First batch: the value-checked twin of basket_triples with the
whale-basket cap actually FIRING (VERDICT r8 "Next round" #5) — the
capped form the scale lane rides gets its own hash-checked correctness
row, the dedup_minhash_lsh_capped discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.queries import register
from data_lakehouse_platform_spark.queries_r8_ext import (
    _tri_oracle,
    basket_triples,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Cap chosen to BIND at board scale: sf0.01's distinct-parts-per-order
# histogram tops out at 13 (729 baskets hold 8-13 parts), so cap=7
# demonstrably drops them and the board hash-checks the dropped-basket
# semantics — which triples lose support and which survive via OTHER
# (small) baskets — against DuckDB.  The production cap (64,
# queries_r8_ext._TRI_CAP) never fires at driver SFs.
_TRI_DEMO_CAP = 7


@register(
    "basket_triples_capped",
    _tri_oracle(_TRI_DEMO_CAP),
    "The 100-TB form of Apriori 3-itemset candidates with the whale-"
    "basket cap actually FIRING: baskets holding more than cap distinct "
    "parts are dropped from triple generation (a bot order's C(items,3) "
    "fan-out is cubic and carries no bundle signal), bounding any "
    "single basket's contribution at C(cap,3). The cap here (7) is set "
    "to bind at board scale so the gate's semantics — not just its "
    "plan shape — carry a green correctness row; production uses 64.",
)
def basket_triples_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return basket_triples(spark, sf_dir, cap=_TRI_DEMO_CAP)


# ----------------------------------------------------------------------------
# Welch's t-test: deep-discount vs shallow-discount line price
# ----------------------------------------------------------------------------

_DEC = "decimal(38,0)"

# One shared +,-,*,/,sqrt expression sequence over exact integer group
# moments (n, sum, sum-of-squares in DECIMAL/HUGEINT) — the stattests
# family discipline: IEEE-correctly-rounded ops on identical bits give
# identical bits on both engines; no ln/exp anywhere.
_WELCH_EXPRS = {
    "mean_deep": "s1 / n1",
    "mean_shallow": "s2 / n2",
    "var_deep": "(n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))",
    "var_shallow": "(n2 * ss2 - s2 * s2) / (n2 * (n2 - 1))",
}
_WELCH_T = (
    "(s1 / n1 - s2 / n2) / SQRT("
    "(n1 * ss1 - s1 * s1) / (n1 * (n1 - 1)) / n1 + "
    "(n2 * ss2 - s2 * s2) / (n2 * (n2 - 1)) / n2)"
)
_WELCH_DF = (
    "((n1 * ss1 - s1 * s1) / (n1 * (n1 - 1)) / n1 + "
    "(n2 * ss2 - s2 * s2) / (n2 * (n2 - 1)) / n2) * "
    "((n1 * ss1 - s1 * s1) / (n1 * (n1 - 1)) / n1 + "
    "(n2 * ss2 - s2 * s2) / (n2 * (n2 - 1)) / n2) / ("
    "((n1 * ss1 - s1 * s1) / (n1 * (n1 - 1)) / n1) * "
    "((n1 * ss1 - s1 * s1) / (n1 * (n1 - 1)) / n1) / (n1 - 1) + "
    "((n2 * ss2 - s2 * s2) / (n2 * (n2 - 1)) / n2) * "
    "((n2 * ss2 - s2 * s2) / (n2 * (n2 - 1)) / n2) / (n2 - 1))"
)

_WELCH_ORACLE = f"""
WITH rows_ AS (
  SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_c,
         CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS deep
  FROM lineitem
),
m AS (
  SELECT
    CAST(CAST(SUM(deep) AS HUGEINT) AS DOUBLE) AS n1,
    CAST(CAST(SUM(deep * price_c) AS HUGEINT) AS DOUBLE) AS s1,
    CAST(CAST(SUM(deep * price_c * price_c) AS HUGEINT) AS DOUBLE) AS ss1,
    CAST(CAST(SUM(1 - deep) AS HUGEINT) AS DOUBLE) AS n2,
    CAST(CAST(SUM((1 - deep) * price_c) AS HUGEINT) AS DOUBLE) AS s2,
    CAST(CAST(SUM((1 - deep) * price_c * price_c) AS HUGEINT) AS DOUBLE)
      AS ss2
  FROM rows_
)
SELECT CAST(n1 AS BIGINT) AS n_deep,
       CAST(n2 AS BIGINT) AS n_shallow,
       {_WELCH_EXPRS['mean_deep']} AS mean_deep_cents,
       {_WELCH_EXPRS['mean_shallow']} AS mean_shallow_cents,
       {_WELCH_T} AS t_welch,
       {_WELCH_DF} AS df_welch
FROM m
"""


@register(
    "welch_t_discount_price",
    _WELCH_ORACLE,
    "Welch's unequal-variance t-test: do deep-discounted (>= 5%) line "
    "items carry a different extended price than shallow ones?  Group "
    "moments (n, sum, sum of squares of fixed-point cents) accumulate "
    "exactly in DECIMAL/HUGEINT through ONE map-side-combinable "
    "aggregate; t and the Welch-Satterthwaite df are one shared "
    "+,-,*,/,sqrt expression over the six doubles — the parametric "
    "companion to mannwhitney_value_shift. Scale: a single full scan, "
    "six running sums, a 1-row result.",
)
def welch_t_discount_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    rows = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_c"),
        F.when(F.col("l_discount") >= 0.05, F.lit(1))
        .otherwise(F.lit(0))
        .alias("deep"),
    )
    d = F.col("deep")
    p = F.col("price_c")
    m = rows.agg(
        F.sum(d.cast(_DEC)).cast("double").alias("n1"),
        F.sum((d * p).cast(_DEC)).cast("double").alias("s1"),
        F.sum((d * p * p).cast(_DEC)).cast("double").alias("ss1"),
        F.sum((1 - d).cast(_DEC)).cast("double").alias("n2"),
        F.sum(((1 - d) * p).cast(_DEC)).cast("double").alias("s2"),
        F.sum(((1 - d) * p * p).cast(_DEC)).cast("double").alias("ss2"),
    )
    return m.selectExpr(
        "CAST(n1 AS BIGINT) AS n_deep",
        "CAST(n2 AS BIGINT) AS n_shallow",
        f"{_WELCH_EXPRS['mean_deep']} AS mean_deep_cents",
        f"{_WELCH_EXPRS['mean_shallow']} AS mean_shallow_cents",
        f"{_WELCH_T} AS t_welch",
        f"{_WELCH_DF} AS df_welch",
    )


# ----------------------------------------------------------------------------
# One-way ANOVA F: order value across the five order priorities
# ----------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH g AS (
  SELECT o_orderpriority AS priority,
         CAST(COUNT(*) AS HUGEINT) AS n_g,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
              AS HUGEINT) AS s_g,
         SUM(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS ss_g
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_g) AS DOUBLE) AS nd,
         CAST(SUM(s_g) AS DOUBLE) AS sd,
         CAST(SUM(ss_g) AS DOUBLE) AS ssd,
         CAST(COUNT(*) AS DOUBLE) AS k,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             (SELECT list((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
                          * CAST(s_g AS DOUBLE) ORDER BY priority)
              FROM g)),
           (a, b) -> a + b) AS sum_sq_over_n
  FROM g
),
f AS (
  SELECT ((sum_sq_over_n - sd * sd / nd) / (k - 1))
         / ((ssd - sum_sq_over_n) / (nd - k)) AS f_statistic
  FROM tot
)
SELECT g.priority, CAST(g.n_g AS BIGINT) AS n_g,
       CAST(g.s_g AS DOUBLE) / CAST(g.n_g AS DOUBLE) AS mean_cents,
       f.f_statistic
FROM g CROSS JOIN f
ORDER BY g.priority
"""


@register(
    "anova_f_priority",
    _ANOVA_ORACLE,
    "One-way ANOVA F: does mean order value differ across the five "
    "order priorities?  Per-group moments accumulate exactly in "
    "DECIMAL/HUGEINT (one map-side-combinable aggregate, 5 groups); "
    "the cross-group sum of s_g^2/n_g runs as an ordered left-fold "
    "over priorities on BOTH engines (the kruskal_wallis discipline), "
    "and F is one shared double expression — the parametric companion "
    "to kruskal_wallis_regions. One row per group with F attached.",
)
def anova_f_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    g = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("priority"),
                cents.alias("c"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("n_g"),
            F.sum(F.col("c").cast(_DEC)).alias("s_g"),
            F.sum((F.col("c").cast(_DEC) * F.col("c"))).alias("ss_g"),
        )
    )
    tot = g.agg(
        F.sum("n_g").cast("double").alias("nd"),
        F.sum("s_g").cast("double").alias("sd"),
        F.sum("ss_g").cast("double").alias("ssd"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "priority",
                    F.col("s_g").cast("double").alias("sgd"),
                    F.col("n_g").cast("double").alias("ngd"),
                )
            )
        ).alias("xs"),
    ).selectExpr(
        "nd", "sd", "ssd", "k",
        "aggregate(xs, CAST(0.0 AS DOUBLE),"
        " (a, x) -> a + (x.sgd / x.ngd) * x.sgd) AS sum_sq_over_n",
    )
    f = tot.selectExpr(
        "((sum_sq_over_n - sd * sd / nd) / (k - 1))"
        " / ((ssd - sum_sq_over_n) / (nd - k)) AS f_statistic"
    )
    return (
        g.crossJoin(F.broadcast(f))
        .selectExpr(
            "priority",
            "CAST(n_g AS BIGINT) AS n_g",
            "CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean_cents",
            "f_statistic",
        )
        .orderBy("priority")
    )


# ----------------------------------------------------------------------------
# Two-proportion z-test: return rate, deep vs shallow discount
# ----------------------------------------------------------------------------

_TPZ_Z = (
    "(r1 / n1 - r2 / n2) / SQRT("
    "((r1 + r2) / (n1 + n2)) * (1 - (r1 + r2) / (n1 + n2))"
    " * (1 / n1 + 1 / n2))"
)

_TPZ_ORACLE = f"""
WITH rows_ AS (
  SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS deep,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
m AS (
  SELECT
    CAST(CAST(SUM(deep) AS HUGEINT) AS DOUBLE) AS n1,
    CAST(CAST(SUM(deep * ret) AS HUGEINT) AS DOUBLE) AS r1,
    CAST(CAST(SUM(1 - deep) AS HUGEINT) AS DOUBLE) AS n2,
    CAST(CAST(SUM((1 - deep) * ret) AS HUGEINT) AS DOUBLE) AS r2
  FROM rows_
)
SELECT CAST(n1 AS BIGINT) AS n_deep, CAST(r1 AS BIGINT) AS ret_deep,
       CAST(n2 AS BIGINT) AS n_shallow, CAST(r2 AS BIGINT) AS ret_shallow,
       r1 / n1 AS rate_deep, r2 / n2 AS rate_shallow,
       {_TPZ_Z} AS z_pooled
FROM m
"""


@register(
    "two_proportion_z_return",
    _TPZ_ORACLE,
    "Two-proportion pooled z-test: is the return RATE different for "
    "deep-discounted (>= 5%) line items?  Four exact integer counts "
    "from one map-side-combinable conditional aggregate; the pooled z "
    "is one shared +,-,*,/,sqrt expression — the rate companion to "
    "odds_ratio_discount_return (effect size) and wilson_ci_return_"
    "rate (per-group intervals). One full scan, a 1-row result.",
)
def two_proportion_z_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    rows = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_discount") >= 0.05, F.lit(1))
        .otherwise(F.lit(0))
        .alias("deep"),
        F.when(F.col("l_returnflag") == "R", F.lit(1))
        .otherwise(F.lit(0))
        .alias("ret"),
    )
    d, r = F.col("deep"), F.col("ret")
    m = rows.agg(
        F.sum(d.cast(_DEC)).cast("double").alias("n1"),
        F.sum((d * r).cast(_DEC)).cast("double").alias("r1"),
        F.sum((1 - d).cast(_DEC)).cast("double").alias("n2"),
        F.sum(((1 - d) * r).cast(_DEC)).cast("double").alias("r2"),
    )
    return m.selectExpr(
        "CAST(n1 AS BIGINT) AS n_deep",
        "CAST(r1 AS BIGINT) AS ret_deep",
        "CAST(n2 AS BIGINT) AS n_shallow",
        "CAST(r2 AS BIGINT) AS ret_shallow",
        "r1 / n1 AS rate_deep",
        "r2 / n2 AS rate_shallow",
        f"{_TPZ_Z} AS z_pooled",
    )


# ----------------------------------------------------------------------------
# Cochran-Armitage trend test: return rate vs discount level
# ----------------------------------------------------------------------------

_CA_ORACLE = """
WITH g AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS score,
         CAST(COUNT(*) AS HUGEINT) AS n_i,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS HUGEINT) AS r_i
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_i) AS HUGEINT) AS n,
         CAST(SUM(r_i) AS HUGEINT) AS r,
         CAST(SUM(score * n_i) AS HUGEINT) AS wn,
         CAST(SUM(score * score * n_i) AS HUGEINT) AS wwn,
         CAST(SUM(score * r_i) AS HUGEINT) AS wr
  FROM g
),
z AS (
  SELECT
    (CAST(n AS DOUBLE) * CAST(wr AS DOUBLE)
     - CAST(r AS DOUBLE) * CAST(wn AS DOUBLE))
    / SQRT(
        (CAST(r AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(r AS DOUBLE)))
        * (CAST(n AS DOUBLE) * CAST(wwn AS DOUBLE)
           - CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE))
        / CAST(n AS DOUBLE)
      ) AS z_trend
  FROM tot
)
SELECT g.score AS discount_pct,
       CAST(g.n_i AS BIGINT) AS n_i,
       CAST(g.r_i AS BIGINT) AS returns_i,
       CAST(g.r_i AS DOUBLE) / CAST(g.n_i AS DOUBLE) AS return_rate,
       z.z_trend
FROM g CROSS JOIN z
ORDER BY g.score
"""


@register(
    "cochran_armitage_trend",
    _CA_ORACLE,
    "Cochran-Armitage trend test: does return probability rise "
    "MONOTONICALLY with discount level?  Discount percent is the "
    "ordinal score; the five integer moments (n, r, sum wn, ww n, wr) "
    "accumulate exactly in DECIMAL/HUGEINT through one group-by plus "
    "one 11-row total; z is one shared +,-,*,/,sqrt expression — the "
    "dose-response upgrade of two_proportion_z's binary split. One row "
    "per discount level with the trend z attached.",
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    g = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_discount") * 100)
            .cast("long")
            .alias("score"),
            F.when(F.col("l_returnflag") == "R", F.lit(1))
            .otherwise(F.lit(0))
            .alias("ret"),
        )
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("n_i"),
            F.sum("ret").cast(_DEC).alias("r_i"),
        )
    )
    tot = g.agg(
        F.sum("n_i").alias("n"),
        F.sum("r_i").alias("r"),
        F.sum(F.col("score") * F.col("n_i")).alias("wn"),
        F.sum(F.col("score") * F.col("score") * F.col("n_i")).alias("wwn"),
        F.sum(F.col("score") * F.col("r_i")).alias("wr"),
    )
    z = tot.selectExpr(
        "(CAST(n AS DOUBLE) * CAST(wr AS DOUBLE)"
        " - CAST(r AS DOUBLE) * CAST(wn AS DOUBLE))"
        " / SQRT("
        "(CAST(r AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(r AS DOUBLE)))"
        " * (CAST(n AS DOUBLE) * CAST(wwn AS DOUBLE)"
        " - CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE))"
        " / CAST(n AS DOUBLE)"
        ") AS z_trend"
    )
    return (
        g.crossJoin(F.broadcast(z))
        .selectExpr(
            "score AS discount_pct",
            "CAST(n_i AS BIGINT) AS n_i",
            "CAST(r_i AS BIGINT) AS returns_i",
            "CAST(r_i AS DOUBLE) / CAST(n_i AS DOUBLE) AS return_rate",
            "z_trend",
        )
        .orderBy("discount_pct")
    )


# ----------------------------------------------------------------------------
# Jarque-Bera normality diagnostic on order values
# ----------------------------------------------------------------------------

# Central moments from raw integer moments, all in doubles cast from
# exact DECIMAL/HUGEINT sums, one shared expression sequence:
#   m  = s1/n
#   m2 = s2/n - m*m
#   m3 = s3/n - 3*m*(s2/n) + 2*m*m*m
#   m4 = s4/n - 4*m*(s3/n) + 6*m*m*(s2/n) - 3*m*m*m*m
#   skew = m3 / (SQRT(m2)*SQRT(m2)*SQRT(m2))   [m2^1.5 without POW]
#   exk  = m4 / (m2*m2) - 3
#   jb   = n/6 * (skew*skew + exk*exk/4)
_JB_EXPR = {
    "m": "s1 / n",
    "m2": "s2 / n - (s1 / n) * (s1 / n)",
    "m3": ("s3 / n - 3 * (s1 / n) * (s2 / n)"
           " + 2 * (s1 / n) * (s1 / n) * (s1 / n)"),
    "m4": ("s4 / n - 4 * (s1 / n) * (s3 / n)"
           " + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
           " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)"),
}
_JB_SKEW = (
    f"({_JB_EXPR['m3']}) / (SQRT({_JB_EXPR['m2']})"
    f" * SQRT({_JB_EXPR['m2']}) * SQRT({_JB_EXPR['m2']}))"
)
_JB_EXK = f"({_JB_EXPR['m4']}) / (({_JB_EXPR['m2']}) * ({_JB_EXPR['m2']})) - 3"
_JB_STAT = (
    f"n / 6 * (({_JB_SKEW}) * ({_JB_SKEW})"
    f" + ({_JB_EXK}) * ({_JB_EXK}) / 4)"
)

# o_totalprice cents <= ~5.5e7 at any SF; cents^4 <= ~9e30 — inside
# DECIMAL(38,0)/HUGEINT exactly, then ONE cast to double per moment.
_JB_ORACLE = f"""
WITH m AS (
  SELECT
    CAST(CAST(COUNT(*) AS HUGEINT) AS DOUBLE) AS n,
    CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)) AS DOUBLE) AS s1,
    CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      AS s2,
    CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(o_totalprice * 100) AS BIGINT)
             * CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      AS s3,
    CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(o_totalprice * 100) AS BIGINT)
             * CAST(FLOOR(o_totalprice * 100) AS BIGINT)
             * CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      AS s4
  FROM orders
)
SELECT CAST(n AS BIGINT) AS n_orders,
       {_JB_EXPR['m']} AS mean_cents,
       {_JB_SKEW} AS skewness,
       {_JB_EXK} AS excess_kurtosis,
       {_JB_STAT} AS jarque_bera
FROM m
"""


@register(
    "jarque_bera_totalprice",
    _JB_ORACLE,
    "Jarque-Bera normality diagnostic on order values: the four raw "
    "integer-cents moments accumulate exactly in DECIMAL/HUGEINT "
    "(cents^4 stays inside 38 digits) through one map-side-combinable "
    "aggregate; skewness, excess kurtosis and JB are one shared "
    "+,-,*,/,sqrt expression (m2^1.5 via three SQRT factors — no POW, "
    "no logs). The distribution-shape companion to "
    "histogram_totalprice and winsorized_stats.",
)
def jarque_bera_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    c = F.floor(F.col("o_totalprice") * 100).cast("long")
    cd = c.cast(_DEC)
    m = _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).cast(_DEC).cast("double").alias("n"),
        F.sum(cd).cast("double").alias("s1"),
        F.sum(cd * c).cast("double").alias("s2"),
        F.sum(cd * c * c).cast("double").alias("s3"),
        F.sum(cd * c * c * c).cast("double").alias("s4"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_orders",
        f"{_JB_EXPR['m']} AS mean_cents",
        f"{_JB_SKEW} AS skewness",
        f"{_JB_EXK} AS excess_kurtosis",
        f"{_JB_STAT} AS jarque_bera",
    )


# ----------------------------------------------------------------------------
# Sign test on day-over-day revenue direction
# ----------------------------------------------------------------------------

_SIGN_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
              AS HUGEINT) AS cents
  FROM orders GROUP BY 1
),
diffs AS (
  SELECT day, cents,
         cents - LAG(cents) OVER (ORDER BY day) AS d
  FROM daily
),
m AS (
  SELECT
    CAST(CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS HUGEINT)
         AS DOUBLE) AS n_up,
    CAST(CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS HUGEINT)
         AS DOUBLE) AS n_down,
    CAST(CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS HUGEINT)
         AS DOUBLE) AS n_tie
  FROM diffs WHERE d IS NOT NULL
)
SELECT CAST(n_up AS BIGINT) AS n_up,
       CAST(n_down AS BIGINT) AS n_down,
       CAST(n_tie AS BIGINT) AS n_tie,
       (n_up - n_down) / SQRT(n_up + n_down) AS z_sign
FROM m
"""


@register(
    "sign_test_dod_revenue",
    _SIGN_ORACLE,
    "Sign test on day-over-day revenue direction: is daily revenue as "
    "likely to rise as to fall?  Exact integer day cents, a LAG diff, "
    "three conditional counts (ties reported, excluded from z per the "
    "classical test), z = (n_up - n_down)/sqrt(n) — one shared sqrt "
    "expression. The direction-only companion to "
    "runs_test_daily_revenue (independence) and mann_kendall_trend "
    "(monotone trend); bounded by the ~2,400-day calendar.",
)
def sign_test_dod_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast(_DEC)
            ).alias("cents")
        )
    )
    d = (
        daily.withColumn(
            "d",
            F.col("cents") - F.lag("cents").over(Window.orderBy("day")),
        )
        .filter(F.col("d").isNotNull())
    )
    m = d.agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0).cast(_DEC))
        .cast("double")
        .alias("n_up"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0).cast(_DEC))
        .cast("double")
        .alias("n_down"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0).cast(_DEC))
        .cast("double")
        .alias("n_tie"),
    )
    return m.selectExpr(
        "CAST(n_up AS BIGINT) AS n_up",
        "CAST(n_down AS BIGINT) AS n_down",
        "CAST(n_tie AS BIGINT) AS n_tie",
        "(n_up - n_down) / SQRT(n_up + n_down) AS z_sign",
    )


# ----------------------------------------------------------------------------
# McNemar paired test: discounted vs returned, paired WITHIN each order
# ----------------------------------------------------------------------------

_MCN_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         MAX(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS disc,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY 1
),
cells AS (
  SELECT
    CAST(SUM(disc * ret) AS BIGINT) AS both_,
    CAST(SUM(disc * (1 - ret)) AS BIGINT) AS disc_only,
    CAST(SUM((1 - disc) * ret) AS BIGINT) AS ret_only,
    CAST(SUM((1 - disc) * (1 - ret)) AS BIGINT) AS neither
  FROM per_order
)
SELECT both_, disc_only, ret_only, neither,
       (CAST(disc_only AS DOUBLE) - CAST(ret_only AS DOUBLE))
       * (CAST(disc_only AS DOUBLE) - CAST(ret_only AS DOUBLE))
       / (CAST(disc_only AS DOUBLE) + CAST(ret_only AS DOUBLE))
         AS mcnemar_chi2
FROM cells
"""


@register(
    "mcnemar_discount_return",
    _MCN_ORACLE,
    "McNemar's test for PAIRED binary outcomes: within each order, "
    "does 'contains a deep-discount line' flip together with "
    "'contains a returned line'?  The chi2 uses only the DISCORDANT "
    "cells ((b-c)^2/(b+c)) — the paired-categorical family the "
    "independence tests (chi_square, odds_ratio on unpaired lines) "
    "cannot answer.  One per-order MAX aggregate + four exact "
    "conditional counts; the statistic is one shared double "
    "expression, no sqrt, no logs.",
)
def mcnemar_discount_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    per_order = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.max(
                F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)
            ).alias("disc"),
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("ret"),
        )
    )
    d, r = F.col("disc"), F.col("ret")
    cells = per_order.agg(
        F.sum(d * r).cast("long").alias("both_"),
        F.sum(d * (1 - r)).cast("long").alias("disc_only"),
        F.sum((1 - d) * r).cast("long").alias("ret_only"),
        F.sum((1 - d) * (1 - r)).cast("long").alias("neither"),
    )
    return cells.selectExpr(
        "both_", "disc_only", "ret_only", "neither",
        "(CAST(disc_only AS DOUBLE) - CAST(ret_only AS DOUBLE))"
        " * (CAST(disc_only AS DOUBLE) - CAST(ret_only AS DOUBLE))"
        " / (CAST(disc_only AS DOUBLE) + CAST(ret_only AS DOUBLE))"
        " AS mcnemar_chi2",
    )
