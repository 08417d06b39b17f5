"""Experimentation / pricing economics / forecast evaluation /
dedup observability — round-4 additions (imported LAST in
queries.all_queries(): the driver's first-50 set is pinned by
registration order).

Determinism strategy: exact integer counts and fixed-point sums
everywhere; emitted doubles are single divides of exact integers, or
compositions of such divides combined in IDENTICAL operation order on
both engines (the Kaplan-Meier / HLL-fold precedent — IEEE doubles
are deterministic given the same operand bits and the same op
sequence; what does NOT reproduce is reordered float accumulation,
which never happens here).

Scale posture: segment/brand/model domains are tiny and fixed, daily
series are calendar-bounded, so every pairwise or recursive pass below
runs on dozens-to-thousands of rows at any corpus size; the fact
tables are touched exactly once each, by partial-aggregating scans.

Reference analog: the reference's gold KPIs stop at plain aggregates
(show_gold_tables.py); conversion testing, price elasticity, and
forecast backtesting are the decision-grade statistics a lakehouse
team builds on top of that same star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.queries import _t, register

# ----------------------------------------------------------------------------
# Two-proportion conversion test across segment pairs
# ----------------------------------------------------------------------------

_CONV_CUTOFF = "2001-02-01"

_AB_ORACLE = f"""
WITH converted AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_CONV_CUTOFF} 00:00:00'
),
flags AS (
  SELECT c.c_mktsegment AS seg,
         CASE WHEN v.o_custkey IS NULL THEN 0 ELSE 1 END AS conv
  FROM customer c LEFT JOIN converted v ON c.c_custkey = v.o_custkey
),
seg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(conv), 0) AS BIGINT) AS c
  FROM flags GROUP BY seg
)
SELECT a.seg AS seg_a, b.seg AS seg_b,
  a.n AS n_a, a.c AS conv_a, b.n AS n_b, b.c AS conv_b,
  CAST(a.c AS DOUBLE) / a.n AS p_a,
  CAST(b.c AS DOUBLE) / b.n AS p_b,
  (CAST(a.c AS DOUBLE) / a.n - CAST(b.c AS DOUBLE) / b.n)
    * (CAST(a.c AS DOUBLE) / a.n - CAST(b.c AS DOUBLE) / b.n)
    / ((CAST(a.c + b.c AS DOUBLE) / (a.n + b.n))
       * (1.0 - CAST(a.c + b.c AS DOUBLE) / (a.n + b.n))
       * (1.0 / a.n + 1.0 / b.n)) AS z_squared
FROM seg a JOIN seg b ON a.seg < b.seg
WHERE a.c + b.c > 0 AND a.c + b.c < a.n + b.n
ORDER BY seg_a, seg_b
"""


@register(
    "conversion_ab_pairs",
    _AB_ORACLE,
    "Two-proportion z-test (emitted as z^2, sqrt-free) of recent-order "
    f"conversion (any order on/after {_CONV_CUTOFF}) between every "
    "pair of market segments — the experimentation primitive, run "
    "pairwise across a FIXED tiny domain (5 segments -> 10 rows; "
    "degenerate pairs with pooled conversion 0% or 100%, where the "
    "test is undefined, are excluded on both engines). "
    "Counts are exact; p_a/p_b/pooled-p are single divides and z^2 "
    "composes them in identical operation order on both engines, so "
    "the doubles are bit-stable (the KM-fold precedent). The fact "
    "scan is one distinct-custkey pass (shuffle bounded by customer "
    "count), then one broadcast-sized join to customers.",
)
def conversion_ab_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    conv = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(f"{_CONV_CUTOFF} 00:00:00"))
        .select("o_custkey")
        .distinct()
        .withColumn("__conv", F.lit(1))
    )
    seg = (
        cust.join(conv, cust.c_custkey == conv.o_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("__conv"), F.lit(0))
            .cast("bigint")
            .alias("c"),
        )
    )
    a = seg.alias("a")
    b = seg.alias("b")
    p_a = F.col("a.c").cast("double") / F.col("a.n")
    p_b = F.col("b.c").cast("double") / F.col("b.n")
    pp = (F.col("a.c") + F.col("b.c")).cast("double") / (
        F.col("a.n") + F.col("b.n")
    )
    z2 = ((p_a - p_b) * (p_a - p_b)) / (
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("a.n") + F.lit(1.0) / F.col("b.n"))
    )
    pooled_c = F.col("a.c") + F.col("b.c")
    return (
        a.join(b, F.col("a.seg") < F.col("b.seg"))
        .filter(
            (pooled_c > 0) & (pooled_c < (F.col("a.n") + F.col("b.n")))
        )
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("b.seg").alias("seg_b"),
            F.col("a.n").alias("n_a"),
            F.col("a.c").alias("conv_a"),
            F.col("b.n").alias("n_b"),
            F.col("b.c").alias("conv_b"),
            p_a.alias("p_a"),
            p_b.alias("p_b"),
            z2.alias("z_squared"),
        )
        .orderBy("seg_a", "seg_b")
    )


# ----------------------------------------------------------------------------
# Forecast backtest: seasonal-naive vs Holt, one-step-ahead MAE
# ----------------------------------------------------------------------------

_BACKTEST_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS DECIMAL(28,0)))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
seq AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
),
rec AS (
  SELECT rn, cents AS l, CAST(0 AS BIGINT) AS b FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.rn,
         (s.cents + r.l + r.b) // 2 AS l,
         (((s.cents + r.l + r.b) // 2) - r.l + r.b) // 2 AS b
  FROM rec r JOIN seq s ON s.rn = r.rn + 1
),
naive AS (
  SELECT rn, cents, lag(cents, 7) OVER (ORDER BY rn) AS pred FROM seq
),
holt AS (
  SELECT s.rn, s.cents, r.l + r.b AS pred
  FROM seq s JOIN rec r ON r.rn = s.rn - 1
),
scored AS (
  SELECT 'holt' AS model, rn, ABS(cents - pred) AS abs_err
  FROM holt WHERE rn >= 8
  UNION ALL
  SELECT 'seasonal_naive' AS model, rn, ABS(cents - pred) AS abs_err
  FROM naive WHERE rn >= 8
)
SELECT model, CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(abs_err) AS DOUBLE) / (COUNT(*) * 100) AS mae
FROM scored GROUP BY model ORDER BY model
"""


@register(
    "forecast_backtest_mae",
    _BACKTEST_ORACLE,
    "One-step-ahead backtest of the two registry forecasters on daily "
    "revenue: seasonal-naive (this day last week) vs Holt level+trend "
    "(predict l+b BEFORE seeing the day) — the evaluation layer that "
    "tells you whether the fancier model earns its keep, scored on "
    "the common window (day 8+). Absolute errors are exact integer "
    "cents (the Holt state replays the integer recurrence), MAE is "
    "ONE divide of the exact error sum by n*100. Calendar-bounded "
    "throughout.",
)
def forecast_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("decimal(28,0)")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    seq = daily.select(
        "cents",
        F.row_number().over(w).alias("rn"),
        F.lag("cents", 7).over(w).alias("naive_pred"),
    )
    # Holt state per step: one ordered fold emitting the (l, b) array,
    # exploded back to rows (position i = rn i+1)
    st = (
        daily.agg(
            F.sort_array(F.collect_list(F.struct("day", "cents"))).alias(
                "xs"
            )
        )
        .select(
            F.posexplode(
                F.expr(
                    "aggregate(xs,"
                    " named_struct('l', CAST(NULL AS BIGINT),"
                    "              'b', CAST(NULL AS BIGINT),"
                    "              'arr', CAST(array() AS"
                    "                ARRAY<STRUCT<l: BIGINT, b: BIGINT>>)),"
                    " (acc, x) -> named_struct("
                    "   'l', IF(acc.l IS NULL, x.cents,"
                    "           (x.cents + acc.l + acc.b) div 2),"
                    "   'b', IF(acc.l IS NULL, 0L,"
                    "           (((x.cents + acc.l + acc.b) div 2)"
                    "            - acc.l + acc.b) div 2),"
                    "   'arr', array_append(acc.arr, named_struct("
                    "     'l', IF(acc.l IS NULL, x.cents,"
                    "             (x.cents + acc.l + acc.b) div 2),"
                    "     'b', IF(acc.l IS NULL, 0L,"
                    "             (((x.cents + acc.l + acc.b) div 2)"
                    "              - acc.l + acc.b) div 2)))),"
                    " acc -> acc.arr)"
                )
            ).alias("pos", "st")
        )
        .select(
            (F.col("pos") + 1).alias("rn_state"),
            (F.col("st.l") + F.col("st.b")).alias("holt_pred"),
        )
    )
    joined = seq.join(
        st, seq.rn == st.rn_state + 1, "inner"
    ).filter(F.col("rn") >= 8)
    holt = joined.select(
        F.lit("holt").alias("model"),
        F.abs(F.col("cents") - F.col("holt_pred")).alias("abs_err"),
    )
    naive = joined.select(
        F.lit("seasonal_naive").alias("model"),
        F.abs(F.col("cents") - F.col("naive_pred")).alias("abs_err"),
    )
    return (
        holt.unionByName(naive)
        .groupBy("model")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            (
                F.sum("abs_err").cast("double")
                / (F.count(F.lit(1)) * 100)
            ).alias("mae"),
        )
        .orderBy("model")
    )


# ----------------------------------------------------------------------------
# Arc price elasticity of demand by brand (discount bands)
# ----------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
WITH bands AS (
  SELECT p.p_brand AS brand,
         CASE WHEN l.l_discount >= 0.05 THEN 'high' ELSE 'low' END AS band,
         CAST(SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                             * 1000000) AS DECIMAL(28,0))) AS BIGINT)
           AS rev_micros
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
wide AS (
  SELECT lo.brand,
         lo.qty AS q_low, hi.qty AS q_high,
         CAST(lo.rev_micros AS DOUBLE) / (lo.qty * 1000000.0) AS price_low,
         CAST(hi.rev_micros AS DOUBLE) / (hi.qty * 1000000.0) AS price_high
  FROM bands lo JOIN bands hi
    ON lo.brand = hi.brand AND lo.band = 'low' AND hi.band = 'high'
)
SELECT brand, q_low, q_high, price_low, price_high,
  ((CAST(q_high - q_low AS DOUBLE) / (q_high + q_low))
   * ((price_high + price_low) / (price_high - price_low)))
    AS arc_elasticity
FROM wide
WHERE price_high <> price_low
ORDER BY brand
"""


@register(
    "discount_arc_elasticity",
    _ELASTICITY_ORACLE,
    "Arc price elasticity of demand per brand, between low- (<5%) and "
    "high-discount lineitems: midpoint-formula elasticity "
    "(dQ/Qavg)/(dP/Pavg) — the pricing-decision statistic, "
    "transcendental-free (the textbook log-log form is avoided on "
    "purpose). Quantities and fixed-point revenues are exact; unit "
    "prices are single divides and the elasticity composes them in "
    "identical op order on both engines. One fact scan partial-"
    "aggregated to the (brand x 2 bands) domain; everything after is "
    "dozens of rows.",
)
def discount_arc_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bands = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.when(F.col("l_discount") >= 0.05, "high")
            .otherwise("low")
            .alias("band"),
        )
        .agg(
            F.sum(F.floor(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("qty"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 1000000
                ).cast("decimal(28,0)")
            )
            .cast("bigint")
            .alias("rev_micros"),
        )
    )
    lo = bands.filter(F.col("band") == "low").alias("lo")
    hi = bands.filter(F.col("band") == "high").alias("hi")
    price_low = F.col("lo.rev_micros").cast("double") / (
        F.col("lo.qty") * F.lit(1000000.0)
    )
    price_high = F.col("hi.rev_micros").cast("double") / (
        F.col("hi.qty") * F.lit(1000000.0)
    )
    elast = (
        (F.col("hi.qty") - F.col("lo.qty")).cast("double")
        / (F.col("hi.qty") + F.col("lo.qty"))
    ) * ((price_high + price_low) / (price_high - price_low))
    return (
        lo.join(hi, F.col("lo.brand") == F.col("hi.brand"))
        .filter(price_high != price_low)
        .select(
            F.col("lo.brand").alias("brand"),
            F.col("lo.qty").alias("q_low"),
            F.col("hi.qty").alias("q_high"),
            price_low.alias("price_low"),
            price_high.alias("price_high"),
            elast.alias("arc_elasticity"),
        )
        .orderBy("brand")
    )


# ----------------------------------------------------------------------------
# Dedup observability: exact-duplicate cluster size histogram
# ----------------------------------------------------------------------------

_DUPHIST_ORACLE = """
WITH clusters AS (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM documents GROUP BY 1
)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS docs_total
FROM clusters GROUP BY cluster_size ORDER BY cluster_size
"""


@register(
    "dedup_cluster_size_hist",
    _DUPHIST_ORACLE,
    "Exact-duplicate cluster-size histogram — the observability "
    "companion to dedup_exact: how much of the corpus sits in "
    "singleton vs crowd clusters, which is what you check BEFORE "
    "choosing a dedup strategy (a heavy tail says near-dup passes "
    "will pay off). Two map-side-combinable groupBys: md5 content "
    "hash (shuffle bounded by distinct contents), then size "
    "(bounded by the largest crowd).",
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    clusters = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("docs_total"),
        )
        .orderBy("cluster_size")
    )


# ----------------------------------------------------------------------------
# Difference-in-differences: promo-buyer revenue trend vs control
# ----------------------------------------------------------------------------

_DID_CUTOFF = "1998-01-01"

_DID_ORACLE = f"""
WITH treated AS (
  SELECT DISTINCT o.o_custkey
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
),
scored AS (
  SELECT CASE WHEN t.o_custkey IS NULL THEN 'control' ELSE 'treated' END
           AS grp,
         CASE WHEN o.o_orderdate >= TIMESTAMP '{_DID_CUTOFF} 00:00:00'
              THEN 'post' ELSE 'pre' END AS period,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o LEFT JOIN treated t ON o.o_custkey = t.o_custkey
),
cell AS (
  SELECT grp, period,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS total
  FROM scored GROUP BY grp, period
),
wide AS (
  SELECT
    MAX(CASE WHEN grp='treated' AND period='pre'  THEN total END) AS t1,
    MAX(CASE WHEN grp='treated' AND period='pre'  THEN n END)     AS n1,
    MAX(CASE WHEN grp='treated' AND period='post' THEN total END) AS t2,
    MAX(CASE WHEN grp='treated' AND period='post' THEN n END)     AS n2,
    MAX(CASE WHEN grp='control' AND period='pre'  THEN total END) AS t3,
    MAX(CASE WHEN grp='control' AND period='pre'  THEN n END)     AS n3,
    MAX(CASE WHEN grp='control' AND period='post' THEN total END) AS t4,
    MAX(CASE WHEN grp='control' AND period='post' THEN n END)     AS n4
  FROM cell
)
SELECT
  CAST(t1 AS DOUBLE) / (n1 * 100) AS treated_pre,
  CAST(t2 AS DOUBLE) / (n2 * 100) AS treated_post,
  CAST(t3 AS DOUBLE) / (n3 * 100) AS control_pre,
  CAST(t4 AS DOUBLE) / (n4 * 100) AS control_post,
  (CAST(t2 AS DOUBLE) / (n2 * 100) - CAST(t1 AS DOUBLE) / (n1 * 100))
    - (CAST(t4 AS DOUBLE) / (n4 * 100) - CAST(t3 AS DOUBLE) / (n3 * 100))
    AS did_avg_order_value
FROM wide
"""


@register(
    "promotion_lift_did",
    _DID_ORACLE,
    "Difference-in-differences on average order value: customers who "
    "ever bought a PROMO-type part (treated) vs the rest (control), "
    f"before vs after {_DID_CUTOFF} — the causal-inference primitive "
    "that removes the shared time trend a naive before/after would "
    "swallow. The four cell means are single divides of exact "
    "integer-cent totals; the DiD combines them in identical op order "
    "on both engines. One lineitem⋈part pass (broadcast part) defines "
    "the treated set, one orders scan fills the 2x2 grid.",
)
def promotion_lift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    treated = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey),
            orders.o_orderkey == li.l_orderkey,
        )
        .select("o_custkey")
        .distinct()
        .withColumn("__t", F.lit(1))
    )
    scored = orders.join(
        treated, orders.o_custkey == treated.o_custkey, "left"
    ).select(
        F.when(F.col("__t").isNull(), "control")
        .otherwise("treated")
        .alias("grp"),
        F.when(
            F.col("o_orderdate") >= F.lit(f"{_DID_CUTOFF} 00:00:00"),
            "post",
        )
        .otherwise("pre")
        .alias("period"),
        F.floor(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cell = scored.groupBy("grp", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .cast("bigint")
        .alias("total"),
    )
    wide = cell.agg(
        *[
            F.max(
                F.when(
                    (F.col("grp") == g) & (F.col("period") == p),
                    F.col(c),
                )
            ).alias(f"{a}{i}")
            for i, (g, p) in enumerate(
                [
                    ("treated", "pre"),
                    ("treated", "post"),
                    ("control", "pre"),
                    ("control", "post"),
                ],
                start=1,
            )
            for a, c in (("t", "total"), ("n", "n"))
        ]
    )
    m = {
        i: F.col(f"t{i}").cast("double") / (F.col(f"n{i}") * 100)
        for i in (1, 2, 3, 4)
    }
    return wide.select(
        m[1].alias("treated_pre"),
        m[2].alias("treated_post"),
        m[3].alias("control_pre"),
        m[4].alias("control_post"),
        ((m[2] - m[1]) - (m[4] - m[3])).alias("did_avg_order_value"),
    )


# ----------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)
# ----------------------------------------------------------------------------

_CUPED_ORACLE = f"""
WITH per_cust AS (
  SELECT c.c_custkey, c.c_mktsegment AS seg,
         CAST(COALESCE(SUM(CASE WHEN o.o_orderdate
                < TIMESTAMP '{_DID_CUTOFF} 00:00:00'
              THEN CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) END), 0)
           AS BIGINT) AS xi,
         CAST(COALESCE(SUM(CASE WHEN o.o_orderdate
                >= TIMESTAMP '{_DID_CUTOFF} 00:00:00'
              THEN CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) END), 0)
           AS BIGINT) AS yi
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(xi AS DECIMAL(38,0))
                  * CAST(xi AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(yi AS DECIMAL(38,0))
                  * CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(xi AS DECIMAL(38,0))
                  * CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS sxy
  FROM per_cust
),
seg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) AS seg_sx,
         CAST(SUM(CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS seg_sy
  FROM per_cust GROUP BY seg
)
SELECT s.seg, s.n_cust,
  s.seg_sy / s.n_cust / 100 AS mean_post,
  (s.seg_sy / s.n_cust
   - ((g.n * g.sxy - g.sx * g.sy) / (g.n * g.sxx - g.sx * g.sx))
     * (s.seg_sx / s.n_cust - g.sx / g.n)) / 100 AS cuped_adjusted_post,
  ((g.n * g.sxy - g.sx * g.sy) * (g.n * g.sxy - g.sx * g.sy))
    / ((g.n * g.sxx - g.sx * g.sx) * (g.n * g.syy - g.sy * g.sy))
    AS variance_reduction
FROM seg s, g
ORDER BY seg
"""


@register(
    "cuped_adjusted_lift",
    _CUPED_ORACLE,
    "CUPED covariate adjustment of post-period customer spend by "
    "segment: theta = cov(x,y)/var(x) over pre-period spend, adjusted "
    "mean = mean_y - theta*(mean_x - global mean_x), plus the variance-"
    "reduction factor rho^2 — the standard experimentation trick that "
    "shrinks metric variance without biasing the contrast. All moments "
    "are exact integer-cent sums (DECIMAL accumulation, the "
    "corr_qty_price pattern) cast once to DOUBLE into a closed-form "
    "expression with identical text on both engines. Per-customer "
    "spends stay ~bounded as TPC-H scales customers, so the moments "
    "hold far inside the exact range; one orders scan, one tiny "
    "global-moments broadcast.",
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit(f"{_DID_CUTOFF} 00:00:00")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("o_orderdate") < cut, cents)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("xi"),
            F.coalesce(
                F.sum(F.when(F.col("o_orderdate") >= cut, cents)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("yi"),
        )
    )
    g = per_cust.selectExpr(
        "CAST(COUNT(*) AS DOUBLE) AS n",
        "CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) AS sx",
        "CAST(SUM(CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS sy",
        "CAST(SUM(CAST(xi AS DECIMAL(38,0))"
        " * CAST(xi AS DECIMAL(38,0))) AS DOUBLE) AS sxx",
        "CAST(SUM(CAST(yi AS DECIMAL(38,0))"
        " * CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS syy",
        "CAST(SUM(CAST(xi AS DECIMAL(38,0))"
        " * CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS sxy",
    )
    seg = per_cust.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.col("xi").cast("decimal(38,0)"))
        .cast("double")
        .alias("seg_sx"),
        F.sum(F.col("yi").cast("decimal(38,0)"))
        .cast("double")
        .alias("seg_sy"),
    )
    joined = seg.crossJoin(F.broadcast(g))
    return joined.selectExpr(
        "seg",
        "n_cust",
        "seg_sy / n_cust / 100 AS mean_post",
        "(seg_sy / n_cust"
        " - ((n * sxy - sx * sy) / (n * sxx - sx * sx))"
        "   * (seg_sx / n_cust - sx / n)) / 100 AS cuped_adjusted_post",
        "((n * sxy - sx * sy) * (n * sxy - sx * sy))"
        " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
        " AS variance_reduction",
    ).orderBy("seg")
