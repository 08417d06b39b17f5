"""Round-7 registry extensions, part 2: the classical nonparametric
test battery (Mann-Whitney U, Kruskal-Wallis H, Brown-Forsythe,
log-rank, Cramér's V, Spearman rho) plus distribution distance,
association-rule metrics, adoption curves and corpus hapax ratios —
the ad-hoc-analytics layer a warehouse migrating off the reference's
notebook stack asks for next.

Registered LAST in ``queries.all_queries()`` — the external driver
grades the first 50 registry keys by registration order, so new
modules only ever append (tests/test_oracle_parity.py pins the set).

Cross-engine exactness disciplines (the module-family rules):

* RANKS are carried DOUBLED (``rank2 = 2*prev_cum + cnt + 1``), so
  midrank ties stay integers; rank moments accumulate in
  DECIMAL(38,0) (Spark) == HUGEINT (DuckDB), both exact, with ONE
  final cast to double.
* Per-row/per-group scalar doubles (chi-square cells, log-rank
  increments, rule metrics) are computed from exact integers by the
  SAME +,-,*,/,sqrt sequence on both engines — IEEE-correctly-rounded
  ops on identical bits give identical bits.  No ln/exp anywhere.
* CROSS-GROUP float reductions use the ordered left-fold idiom
  (Spark ``aggregate(sort_array(collect_list(...)))`` == DuckDB
  ``list_reduce(list_prepend(0.0, list(... ORDER BY ...)))``) so the
  addition ORDER is pinned.
* Rank spines run over DISTINCT VALUES (a histogram), never rows —
  price spines are order-count-bounded and documented; duration /
  calendar spines are day-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.queries import _t, register

_DEC = "decimal(38,0)"


def _price_cents(col: str):
    return F.floor(F.col(col) * 100).cast("long")


# ----------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum): order values, BUILDING vs MACHINERY
# ----------------------------------------------------------------------------

_MWU_ORACLE = """
WITH rows_ AS (
  SELECT CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS price_c,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ga
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
by_v AS (
  SELECT price_c, CAST(SUM(ga) AS BIGINT) AS na,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM rows_ GROUP BY price_c
),
spine AS (
  SELECT na, cnt,
         2 * COALESCE(SUM(cnt) OVER (
           ORDER BY price_c ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) + cnt + 1 AS rank2
  FROM by_v
),
agg AS (
  SELECT SUM(na) AS n1, SUM(cnt) AS n,
         SUM(na * rank2) AS r1_2,
         SUM(cnt * cnt * cnt - cnt) AS ties
  FROM spine
)
SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n - n1 AS BIGINT) AS n_b,
       CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u_a,
       (CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE)
        - CAST(n1 * (n - n1) AS DOUBLE))
       / (2 * sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0
                   * (CAST(n + 1 AS DOUBLE)
                      - CAST(ties AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))))
         AS z_value
FROM agg
"""


@register(
    "mannwhitney_value_shift",
    _MWU_ORACLE,
    "Mann-Whitney U (Wilcoxon rank-sum) test for a location shift in "
    "order value between the BUILDING and MACHINERY customer segments "
    "— the nonparametric two-sample test an analyst reaches for when "
    "totalprice is skewed (it is).  Midrank ties via DOUBLED ranks "
    "over the distinct-price histogram (integers throughout), normal "
    "approximation with the exact tie correction.  Exactness: rank "
    "moments in DECIMAL(38,0)==HUGEINT, one final double expression "
    "(identical op sequence both engines).  Scale: the groupBy "
    "histogram is distributed; only the distinct-price SPINE crosses "
    "one task (order-count-bounded, counts not rows — the documented "
    "ks_two_sample posture).",
)
def mannwhitney_value_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rows = (
        o.join(
            F.broadcast(
                c.filter(
                    F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
                )
            ),
            o.o_custkey == c.c_custkey,
        )
        .select(
            _price_cents("o_totalprice").alias("price_c"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("ga"),
        )
    )
    by_v = rows.groupBy("price_c").agg(
        F.sum("ga").cast("long").alias("na"),
        F.count(F.lit(1)).alias("cnt"),
    )
    w = Window.orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    spine = by_v.select(
        "na",
        "cnt",
        (
            2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("rank2"),
    )
    agg = spine.agg(
        F.sum("na").cast(_DEC).alias("n1"),
        F.sum("cnt").cast(_DEC).alias("n"),
        F.sum((F.col("na") * F.col("rank2")).cast(_DEC)).alias("r1_2"),
        F.sum(
            (
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
            ).cast(_DEC)
        ).alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n2d = (F.col("n") - F.col("n1")).cast("double")
    nd = F.col("n").cast("double")
    u2 = (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
    sigma2 = (
        n1d
        * n2d
        / F.lit(12.0)
        * (
            (nd + 1)
            - F.col("ties").cast("double") / (nd * (nd - 1))
        )
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_a"),
        (F.col("n") - F.col("n1")).cast("long").alias("n_b"),
        (u2 / 2).alias("u_a"),
        ((u2 - n1d * n2d) / (2 * F.sqrt(sigma2))).alias("z_value"),
    )


# ----------------------------------------------------------------------------
# Kruskal-Wallis H: order value by REGION
# ----------------------------------------------------------------------------

_KW_ORACLE = """
WITH rows_ AS (
  SELECT CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS price_c,
         r.r_name AS region
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
),
by_v AS (
  SELECT price_c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM rows_ GROUP BY price_c
),
spine AS (
  SELECT price_c, cnt,
         2 * COALESCE(SUM(cnt) OVER (
           ORDER BY price_c ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) + cnt + 1 AS rank2
  FROM by_v
),
per_vg AS (
  SELECT price_c, region, CAST(COUNT(*) AS BIGINT) AS cg
  FROM rows_ GROUP BY 1, 2
),
per_g AS (
  SELECT region, SUM(cg * s.rank2) AS r2_g, CAST(SUM(cg) AS BIGINT) AS n_g
  FROM per_vg JOIN spine s USING (price_c) GROUP BY region
),
tot AS (
  SELECT SUM(cnt) AS n, SUM(cnt * cnt * cnt - cnt) AS ties FROM spine
),
hstat AS (
  SELECT
    (12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)))
    * list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
          (SELECT list((CAST(r2_g AS DOUBLE) / 2)
                       * (CAST(r2_g AS DOUBLE) / 2)
                       / CAST(n_g AS DOUBLE) ORDER BY region)
           FROM per_g)),
        (a, b) -> a + b)
    - 3 * CAST(n + 1 AS DOUBLE) AS h_raw,
    1 - CAST(ties AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
           - CAST(n AS DOUBLE)) AS tie_adj
  FROM tot
)
SELECT g.region, g.n_g,
       CAST(g.r2_g AS DOUBLE) / 2 / CAST(g.n_g AS DOUBLE) AS mean_rank,
       h.h_raw / h.tie_adj AS h_statistic
FROM per_g g CROSS JOIN hstat h
ORDER BY g.region
"""


@register(
    "kruskal_wallis_regions",
    _KW_ORACLE,
    "Kruskal-Wallis H test: does order value differ across the five "
    "REGIONS?  One row per region (group size + mean rank) with the "
    "tie-corrected H statistic attached — the one-way-ANOVA "
    "replacement for skewed money columns.  Exactness: doubled-rank "
    "integers in DECIMAL/HUGEINT; the cross-region sum of "
    "(R_g/2)^2/n_g runs as an ordered left-fold over regions sorted "
    "by name on BOTH engines.  Scale: two distributed histograms + a "
    "5-row fold; only the distinct-price spine is single-task "
    "(counts, not rows).",
)
def kruskal_wallis_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rows = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            _price_cents("o_totalprice").alias("price_c"),
            F.col("r_name").alias("region"),
        )
    )
    by_v = rows.groupBy("price_c").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    spine = by_v.select(
        "price_c",
        "cnt",
        (
            2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("rank2"),
    )
    per_vg = rows.groupBy("price_c", "region").agg(
        F.count(F.lit(1)).alias("cg")
    )
    per_g = (
        per_vg.join(spine.select("price_c", "rank2"), "price_c")
        .groupBy("region")
        .agg(
            F.sum((F.col("cg") * F.col("rank2")).cast(_DEC)).alias(
                "r2_g"
            ),
            F.sum("cg").cast("long").alias("n_g"),
        )
    )
    tot = spine.agg(
        F.sum("cnt").cast(_DEC).alias("n"),
        F.sum(
            (
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
            ).cast(_DEC)
        ).alias("ties"),
    )
    nd = F.col("n").cast("double")
    fold = per_g.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "region",
                    F.col("r2_g").cast("double").alias("r2d"),
                    F.col("n_g").cast("double").alias("ngd"),
                )
            )
        ).alias("xs")
    )
    hstat = tot.crossJoin(fold).select(
        (
            (F.lit(12.0) / (nd * (nd + 1)))
            * F.expr(
                "aggregate(xs, CAST(0.0 AS DOUBLE),"
                " (a, x) -> a + (x.r2d / 2) * (x.r2d / 2) / x.ngd)"
            )
            - 3 * (nd + 1)
        ).alias("h_raw"),
        (
            1
            - F.col("ties").cast("double") / (nd * nd * nd - nd)
        ).alias("tie_adj"),
    )
    return (
        per_g.crossJoin(F.broadcast(hstat))
        .select(
            "region",
            "n_g",
            (
                F.col("r2_g").cast("double")
                / 2
                / F.col("n_g").cast("double")
            ).alias("mean_rank"),
            (F.col("h_raw") / F.col("tie_adj")).alias("h_statistic"),
        )
        .orderBy("region")
    )


# ----------------------------------------------------------------------------
# Spearman rank correlation: quantity vs extended price
# ----------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem
),
qs AS (
  SELECT q, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY q
),
qr AS (
  SELECT q, 2 * COALESCE(SUM(cnt) OVER (
           ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) + cnt + 1 AS rq2
  FROM qs
),
ps AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY p
),
pr AS (
  SELECT p, 2 * COALESCE(SUM(cnt) OVER (
           ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) + cnt + 1 AS rp2
  FROM ps
),
m AS (
  SELECT COUNT(*) AS n,
         SUM(qr.rq2) AS sx, SUM(pr.rp2) AS sy,
         SUM(qr.rq2 * pr.rp2) AS sxy,
         SUM(qr.rq2 * qr.rq2) AS sxx,
         SUM(pr.rp2 * pr.rp2) AS syy
  FROM li JOIN qr USING (q) JOIN pr USING (p)
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) AS spearman_rho
FROM m
"""


@register(
    "spearman_qty_price",
    _SPEARMAN_ORACLE,
    "Spearman rank correlation between line quantity and extended "
    "price — the monotone-association twin of corr_qty_price's "
    "Pearson (robust to the price column's skew).  Midrank ties via "
    "doubled ranks on each column's distinct-value histogram; rho is "
    "Pearson on ranks with ALL moments exact in DECIMAL(38,0)=="
    "HUGEINT and the covariance combination (n*Sxy - Sx*Sy) formed "
    "EXACTLY before the single cast-to-double + sqrt.  Scale: two "
    "histogram spines (quantity has ~50 distinct values; price is "
    "order-count-bounded, counts not rows) + one distributed join.",
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 optimization note: a joint (q, p) histogram form (one fact
    # scan feeding both rank spines and the moments, persisted) was
    # built and value-verified, but MEASURED SLOWER at sf0.1 (1.8s ->
    # 2.4-3.4s): distinct (quantity, price-cents) pairs are near-fact-
    # cardinality, so the "histogram" is no reduction — caching it
    # costs more than the two extra columnar scans it saves, and a
    # width-1 cache serializes the moments join.  Kept the original
    # three-branch form; the oracle-equivalent rewrite is in git
    # history if a future engine gains cross-branch subtree reuse.
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        _price_cents("l_extendedprice").alias("p"),
    )
    wq = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    qr = (
        li.groupBy("q")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "q",
            (
                2 * F.coalesce(F.sum("cnt").over(wq), F.lit(0))
                + F.col("cnt")
                + 1
            ).alias("rq2"),
        )
    )
    wp = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    pr = (
        li.groupBy("p")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "p",
            (
                2 * F.coalesce(F.sum("cnt").over(wp), F.lit(0))
                + F.col("cnt")
                + 1
            ).alias("rp2"),
        )
    )
    m = (
        li.join(F.broadcast(qr), "q")
        .join(pr, "p")
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("n"),
            F.sum(F.col("rq2").cast(_DEC)).alias("sx"),
            F.sum(F.col("rp2").cast(_DEC)).alias("sy"),
            F.sum((F.col("rq2") * F.col("rp2")).cast(_DEC)).alias("sxy"),
            F.sum((F.col("rq2") * F.col("rq2")).cast(_DEC)).alias("sxx"),
            F.sum((F.col("rp2") * F.col("rp2")).cast(_DEC)).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        (num / F.sqrt(dx * dy)).alias("spearman_rho"),
    )


# ----------------------------------------------------------------------------
# Brown-Forsythe (median-centered Levene): value spread across segments
# ----------------------------------------------------------------------------

_BF_ORACLE = """
WITH rows_ AS (
  SELECT c.c_mktsegment AS seg,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
hist AS (
  SELECT seg, x, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM rows_ GROUP BY 1, 2
),
cum AS (
  SELECT seg, x, cnt,
         COALESCE(SUM(cnt) OVER (PARTITION BY seg ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev,
         SUM(cnt) OVER (PARTITION BY seg) AS n_g
  FROM hist
),
med AS (
  SELECT seg, MIN(x) AS med_c
  FROM cum WHERE prev + cnt >= (n_g + 1) // 2 GROUP BY seg
),
z AS (
  SELECT r.seg, ABS(r.x - m.med_c) AS z
  FROM rows_ r JOIN med m ON r.seg = m.seg
),
per_g AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_g,
         SUM(z) AS s_g, SUM(z * z) AS ss_g
  FROM z GROUP BY seg
),
folds AS (
  SELECT
    CAST(SUM(n_g) AS BIGINT) AS n, COUNT(*) AS k,
    CAST(SUM(s_g) AS DOUBLE) AS s_all,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      (SELECT list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                   / CAST(n_g AS DOUBLE) ORDER BY seg) FROM per_g)),
      (a, b) -> a + b) AS sum_sq_over_n,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      (SELECT list(CAST(ss_g AS DOUBLE)
                   - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                     / CAST(n_g AS DOUBLE) ORDER BY seg) FROM per_g)),
      (a, b) -> a + b) AS within
  FROM per_g
),
fstat AS (
  SELECT (sum_sq_over_n - s_all * s_all / n) / (k - 1)
         / (within / (n - k)) AS f_statistic
  FROM folds
)
SELECT g.seg AS segment, g.n_g,
       m.med_c AS median_c,
       CAST(g.s_g AS DOUBLE) / CAST(g.n_g AS DOUBLE) AS mean_absdev_c,
       f.f_statistic
FROM per_g g JOIN med m ON g.seg = m.seg CROSS JOIN fstat f
ORDER BY g.seg
"""


@register(
    "brown_forsythe_variance",
    _BF_ORACLE,
    "Brown-Forsythe test (median-centered Levene): do the five market "
    "segments have the same order-value SPREAD?  One row per segment "
    "(lower median in cents, mean absolute deviation) with the F "
    "statistic attached.  The lower median keeps every deviation an "
    "exact integer; the one-way ANOVA on deviations uses integer "
    "moments with the cross-group combinations as ordered folds "
    "(segment-name order) on both engines.  Scale: per-segment "
    "distinct-value histograms (counts through 5 partition-bounded "
    "windows), two grouped sums, a 5-row fold.",
)
def brown_forsythe_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rows = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        _price_cents("o_totalprice").alias("x"),
    )
    hist = rows.groupBy("seg", "x").agg(F.count(F.lit(1)).alias("cnt"))
    wseg = (
        Window.partitionBy("seg")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("seg")
    cum = hist.select(
        "seg",
        "x",
        "cnt",
        F.coalesce(F.sum("cnt").over(wseg), F.lit(0)).alias("prev"),
        F.sum("cnt").over(wall).alias("n_g"),
    )
    med = (
        cum.filter(
            F.col("prev") + F.col("cnt")
            >= F.expr("(n_g + 1) DIV 2")
        )
        .groupBy("seg")
        .agg(F.min("x").alias("med_c"))
    )
    z = rows.join(F.broadcast(med), "seg").select(
        "seg", F.abs(F.col("x") - F.col("med_c")).alias("z")
    )
    per_g = z.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col("z").cast(_DEC)).alias("s_g"),
        F.sum((F.col("z") * F.col("z")).cast(_DEC)).alias("ss_g"),
    )
    folds = per_g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s_g").cast("double").alias("s_all"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "seg",
                    F.col("s_g").cast("double").alias("sd"),
                    F.col("ss_g").cast("double").alias("ssd"),
                    F.col("n_g").cast("double").alias("ngd"),
                )
            )
        ).alias("xs"),
    ).select(
        "n",
        "k",
        "s_all",
        F.expr(
            "aggregate(xs, CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + x.sd * x.sd / x.ngd)"
        ).alias("sum_sq_over_n"),
        F.expr(
            # parenthesized to match the oracle's fold EXACTLY:
            # a + (ssd - t)  !=  (a + ssd) - t in floating point
            "aggregate(xs, CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + (x.ssd - x.sd * x.sd / x.ngd))"
        ).alias("within"),
    )
    fstat = folds.select(
        (
            (
                F.col("sum_sq_over_n")
                - F.col("s_all") * F.col("s_all") / F.col("n")
            )
            / (F.col("k") - 1)
            / (F.col("within") / (F.col("n") - F.col("k")))
        ).alias("f_statistic")
    )
    return (
        per_g.join(F.broadcast(med), "seg")
        .crossJoin(F.broadcast(fstat))
        .select(
            F.col("seg").alias("segment"),
            "n_g",
            F.col("med_c").alias("median_c"),
            (
                F.col("s_g").cast("double")
                / F.col("n_g").cast("double")
            ).alias("mean_absdev_c"),
            "f_statistic",
        )
        .orderBy("segment")
    )


# ----------------------------------------------------------------------------
# Log-rank test: customer lifetime, A/B by custkey parity
# ----------------------------------------------------------------------------

_LOGRANK_WINDOW_DAYS = 90

_LOGRANK_ORACLE = f"""
WITH per_user AS (
  SELECT o_custkey,
         MIN(CAST(o_orderdate AS DATE)) AS f,
         MAX(CAST(o_orderdate AS DATE)) AS l
  FROM orders GROUP BY o_custkey
),
tend AS (SELECT MAX(l) AS tend FROM per_user),
u AS (
  SELECT date_diff('day', f, l) AS dur,
         (l <= tend - INTERVAL {_LOGRANK_WINDOW_DAYS} DAY) AS churned,
         (o_custkey % 2 = 0) AS grp_a
  FROM per_user CROSS JOIN tend
),
hist AS (
  SELECT dur,
         CAST(COUNT(*) FILTER (WHERE grp_a) AS BIGINT) AS all_a,
         CAST(COUNT(*) FILTER (WHERE NOT grp_a) AS BIGINT) AS all_b,
         CAST(COUNT(*) FILTER (WHERE grp_a AND churned) AS BIGINT) AS d_a,
         CAST(COUNT(*) FILTER (WHERE NOT grp_a AND churned) AS BIGINT)
           AS d_b
  FROM u GROUP BY dur
),
tot AS (
  SELECT SUM(all_a) AS n_a, SUM(all_b) AS n_b FROM hist
),
risk AS (
  SELECT dur, d_a, d_b,
         n_a - COALESCE(SUM(all_a) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r_a,
         n_b - COALESCE(SUM(all_b) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r_b
  FROM hist CROSS JOIN tot
),
incs AS (
  SELECT dur,
         CAST(r_a AS DOUBLE) * (d_a + d_b) / (r_a + r_b) AS e_a,
         CAST(r_a AS DOUBLE) * r_b * (d_a + d_b)
           * ((r_a + r_b) - (d_a + d_b))
           / (CAST(r_a + r_b AS DOUBLE) * (r_a + r_b) * (r_a + r_b - 1))
           AS v
  FROM risk
  WHERE d_a + d_b > 0 AND r_a + r_b > 1
),
folded AS (
  SELECT
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      (SELECT list(e_a ORDER BY dur) FROM incs)), (a, b) -> a + b) AS e_a,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      (SELECT list(v ORDER BY dur) FROM incs)), (a, b) -> a + b) AS v
)
SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       CAST((SELECT SUM(d_a) FROM hist) AS BIGINT) AS deaths_a,
       CAST((SELECT SUM(d_b) FROM hist) AS BIGINT) AS deaths_b,
       f.e_a AS expected_a,
       (CAST((SELECT SUM(d_a) FROM hist) AS DOUBLE) - f.e_a)
       * (CAST((SELECT SUM(d_a) FROM hist) AS DOUBLE) - f.e_a)
       / f.v AS chi2
FROM tot t CROSS JOIN folded f
"""


@register(
    "logrank_ab_churn",
    _LOGRANK_ORACLE,
    "Log-rank test comparing the customer-lifetime (first-to-last "
    "order) survival curves of two cohorts (custkey parity, the A/B "
    "harness shape) — the significance layer on top of "
    "kaplan_meier_churn: at each distinct lifetime the observed group-"
    "A deaths are compared with the hypergeometric expectation from "
    "the shared risk set, and chi2 = (O-E)^2/V.  Same censoring rule "
    "as the KM query.  Exactness: per-duration E and V are scalar "
    "doubles from exact integer risk counts; both cumulative sums are "
    "ordered folds over the duration spine.  Scale: lifetimes "
    "collapse to a day-bounded histogram first; everything after is "
    "dozens of rows.",
)
def logrank_ab_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    per_user = orders.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("f"),
        F.max(F.to_date("o_orderdate")).alias("l"),
    )
    tend = per_user.agg(F.max("l").alias("tend"))
    u = per_user.crossJoin(F.broadcast(tend)).select(
        F.datediff("l", "f").alias("dur"),
        (
            F.col("l") <= F.date_sub("tend", _LOGRANK_WINDOW_DAYS)
        ).alias("churned"),
        (F.col("o_custkey") % 2 == 0).alias("grp_a"),
    )
    hist = u.groupBy("dur").agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0))
        .cast("long")
        .alias("all_a"),
        F.sum(F.when(~F.col("grp_a"), 1).otherwise(0))
        .cast("long")
        .alias("all_b"),
        F.sum(F.when(F.col("grp_a") & F.col("churned"), 1).otherwise(0))
        .cast("long")
        .alias("d_a"),
        F.sum(
            F.when(~F.col("grp_a") & F.col("churned"), 1).otherwise(0)
        )
        .cast("long")
        .alias("d_b"),
    )
    tot = hist.agg(
        F.sum("all_a").cast("long").alias("n_a"),
        F.sum("all_b").cast("long").alias("n_b"),
        F.sum("d_a").cast("long").alias("deaths_a"),
        F.sum("d_b").cast("long").alias("deaths_b"),
    )
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = hist.crossJoin(F.broadcast(tot.select("n_a", "n_b"))).select(
        "dur",
        "d_a",
        "d_b",
        (
            F.col("n_a")
            - F.coalesce(F.sum("all_a").over(w), F.lit(0))
        ).alias("r_a"),
        (
            F.col("n_b")
            - F.coalesce(F.sum("all_b").over(w), F.lit(0))
        ).alias("r_b"),
    )
    d = F.col("d_a") + F.col("d_b")
    r = F.col("r_a") + F.col("r_b")
    incs = risk.filter((d > 0) & (r > 1)).select(
        "dur",
        (F.col("r_a").cast("double") * d / r).alias("e_a"),
        (
            F.col("r_a").cast("double")
            * F.col("r_b")
            * d
            * (r - d)
            / (r.cast("double") * r * (r - 1))
        ).alias("v"),
    )
    folded = incs.agg(
        F.sort_array(
            F.collect_list(F.struct("dur", "e_a", "v"))
        ).alias("xs")
    ).select(
        F.expr(
            "aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.e_a)"
        ).alias("e_a"),
        F.expr(
            "aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)"
        ).alias("v"),
    )
    oa = F.col("deaths_a").cast("double")
    return tot.crossJoin(F.broadcast(folded)).select(
        "n_a",
        "n_b",
        "deaths_a",
        "deaths_b",
        F.col("e_a").alias("expected_a"),
        ((oa - F.col("e_a")) * (oa - F.col("e_a")) / F.col("v")).alias(
            "chi2"
        ),
    )


# ----------------------------------------------------------------------------
# Cramér's V: order priority x return flag association strength
# ----------------------------------------------------------------------------

_CRAMER_ORACLE = """
WITH cell AS (
  SELECT o.o_orderpriority AS pri, l.l_returnflag AS flag,
         CAST(COUNT(*) AS BIGINT) AS o_cnt
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
margins AS (
  SELECT pri, flag, o_cnt,
         SUM(o_cnt) OVER (PARTITION BY pri) AS row_tot,
         SUM(o_cnt) OVER (PARTITION BY flag) AS col_tot,
         SUM(o_cnt) OVER () AS n
  FROM cell
),
terms AS (
  SELECT pri, flag,
         (CAST(o_cnt AS DOUBLE)
          - CAST(row_tot AS DOUBLE) * col_tot / n)
         * (CAST(o_cnt AS DOUBLE)
            - CAST(row_tot AS DOUBLE) * col_tot / n)
         / (CAST(row_tot AS DOUBLE) * col_tot / n) AS term,
         n
  FROM margins
),
agg AS (
  SELECT MAX(n) AS n,
         COUNT(DISTINCT pri) AS n_rows_, COUNT(DISTINCT flag) AS n_cols_,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(term ORDER BY pri, flag)), (a, b) -> a + b) AS chi2
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n_rows_ AS INT) AS n_levels_a,
       CAST(n_cols_ AS INT) AS n_levels_b,
       chi2,
       sqrt(chi2 / (CAST(n AS DOUBLE)
                    * least(n_rows_ - 1, n_cols_ - 1))) AS cramers_v
FROM agg
"""


@register(
    "cramers_v_priority_flag",
    _CRAMER_ORACLE,
    "Cramér's V association strength between order priority and line "
    "return flag — the normalized effect size chi_square_independence "
    "lacks (V in [0,1] is comparable across tables; chi2 grows with "
    "n).  Exactness: each of the 15 cell terms is a scalar double "
    "from exact integer margins, summed by an ordered fold over "
    "(priority, flag); V is one sqrt.  Scale: one distributed "
    "contingency groupBy; the fold sees cells, not rows.",
)
def cramers_v_priority_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    cell = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("l_returnflag").alias("flag"),
        )
        .agg(F.count(F.lit(1)).alias("o_cnt"))
    )
    wr = Window.partitionBy("pri")
    wc = Window.partitionBy("flag")
    wn = Window.partitionBy()
    e = (
        F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    )
    margins = cell.select(
        "pri",
        "flag",
        "o_cnt",
        F.sum("o_cnt").over(wr).alias("row_tot"),
        F.sum("o_cnt").over(wc).alias("col_tot"),
        F.sum("o_cnt").over(wn).alias("n"),
    )
    terms = margins.select(
        "pri",
        "flag",
        "n",
        (
            (F.col("o_cnt").cast("double") - e)
            * (F.col("o_cnt").cast("double") - e)
            / e
        ).alias("term"),
    )
    agg = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.countDistinct("pri").cast("int").alias("n_levels_a"),
        F.countDistinct("flag").cast("int").alias("n_levels_b"),
        F.sort_array(
            F.collect_list(F.struct("pri", "flag", "term"))
        ).alias("xs"),
    )
    return agg.select(
        "n",
        "n_levels_a",
        "n_levels_b",
        F.expr(
            "aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.term)"
        ).alias("chi2"),
    ).select(
        "n",
        "n_levels_a",
        "n_levels_b",
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(
                    F.col("n_levels_a") - 1, F.col("n_levels_b") - 1
                )
            )
        ).alias("cramers_v"),
    )


# ----------------------------------------------------------------------------
# Total-variation distance between source token distributions
# ----------------------------------------------------------------------------

_TV_ORACLE = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
tc AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot FROM tc GROUP BY source
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM tot a JOIN tot b ON a.source < b.source
),
joined AS (
  SELECT p.source_a, p.source_b,
         COALESCE(ca.cnt, 0) AS cnt_a, COALESCE(cb.cnt, 0) AS cnt_b,
         ta.tot AS tot_a, tb.tot AS tot_b
  FROM pairs p
  JOIN tot ta ON ta.source = p.source_a
  JOIN tot tb ON tb.source = p.source_b
  JOIN (SELECT DISTINCT tok FROM tc) v ON TRUE
  LEFT JOIN tc ca ON ca.source = p.source_a AND ca.tok = v.tok
  LEFT JOIN tc cb ON cb.source = p.source_b AND cb.tok = v.tok
  WHERE COALESCE(ca.cnt, 0) + COALESCE(cb.cnt, 0) > 0
)
SELECT source_a, source_b,
       CAST(SUM(ABS(cnt_a * tot_b - cnt_b * tot_a)) AS DOUBLE)
       / (2.0 * CAST(MAX(tot_a) AS DOUBLE) * MAX(tot_b)) AS tv_distance
FROM joined
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@register(
    "tv_distance_sources",
    _TV_ORACLE,
    "Total-variation distance between every pair of sources' token "
    "distributions — the corpus-mixture drift metric that needs no "
    "logarithm (TV = sum |p - q| / 2), so unlike KL/JS it is exact "
    "across engines: the numerator is an INTEGER sum of "
    "|cnt_a*tot_b - cnt_b*tot_a| cross-multiplications, with one "
    "final double divide per pair.  Scale: token histograms are "
    "distributed groupBys; the pair join fans each token row out by "
    "sources (a handful), never all-pairs of tokens.",
)
def tv_distance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    # r10 optimization: tc feeds FOUR lineage branches (tot, vocab, and
    # both sides of the densified grid join) — unpersisted, the regex
    # tokenize + explode + groupBy ran four times (plan audit:
    # documents scanned 5x).  tc is vocab x sources, persisted once at
    # input-scaled width (1 partition locally, thousands at lake scale
    # — cached plans keep their static partitioning).
    from pyspark import StorageLevel

    from data_lakehouse_platform_spark.catalog import input_scaled_partitions

    tc = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .repartition(
            input_scaled_partitions(sf_dir, "documents"), "source", "tok"
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = tc.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("tot")
    )
    # densified (token x source-pair) grid — a token missing from one
    # side of a pair still contributes |cnt*tot| to the distance, so
    # the join must NOT drop it (source count is a handful; the grid
    # is vocab x pairs, distributed)
    spairs = (
        tot.select(
            F.col("source").alias("source_a"),
            F.col("tot").alias("tot_a"),
        )
        .crossJoin(
            tot.select(
                F.col("source").alias("source_b"),
                F.col("tot").alias("tot_b"),
            )
        )
        .filter(F.col("source_a") < F.col("source_b"))
    )
    vocab = tc.select("tok").distinct()
    grid = vocab.crossJoin(F.broadcast(spairs))
    ca = tc.select(
        F.col("source").alias("source_a"),
        "tok",
        F.col("cnt").alias("cnt_a"),
    )
    cb = tc.select(
        F.col("source").alias("source_b"),
        "tok",
        F.col("cnt").alias("cnt_b"),
    )
    pairs = (
        grid.join(ca, ["source_a", "tok"], "left")
        .join(cb, ["source_b", "tok"], "left")
        .filter(
            F.coalesce(F.col("cnt_a"), F.lit(0))
            + F.coalesce(F.col("cnt_b"), F.lit(0))
            > 0
        )
    )
    num = F.abs(
        F.coalesce(F.col("cnt_a"), F.lit(0)).cast(_DEC) * F.col("tot_b")
        - F.coalesce(F.col("cnt_b"), F.lit(0)).cast(_DEC)
        * F.col("tot_a")
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.sum(num).alias("num"),
            F.max("tot_a").alias("tot_a"),
            F.max("tot_b").alias("tot_b"),
        )
        .select(
            "source_a",
            "source_b",
            (
                F.col("num").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("tot_a").cast("double")
                    * F.col("tot_b")
                )
            ).alias("tv_distance"),
        )
        .orderBy("source_a", "source_b")
    )


# ----------------------------------------------------------------------------
# Event trigrams: top consecutive event-type triples
# ----------------------------------------------------------------------------

_TRIGRAM_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT event_type || ' > ' || e2 || ' > ' || e3 AS trigram,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT trigram, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, trigram) AS rnk
  FROM tri
)
SELECT CAST(rnk AS INT) AS rnk, trigram, n
FROM ranked WHERE rnk <= 20 ORDER BY rnk
"""


@register(
    "event_trigrams",
    _TRIGRAM_ORACLE,
    "Top-20 consecutive event-type TRIGRAMS across user journeys — "
    "the order-3 extension of bigram_lift / top_event_paths (three-"
    "step motifs like view > cart > purchase are where funnel "
    "hypotheses come from).  Deterministic: per-user windows ordered "
    "(ts, event_id), ranking tiebroken by trigram text.  Scale: the "
    "lead window partitions by user (bounded per user), the count is "
    "a distributed groupBy; only 20 rows surface.",
)
def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    tri = seq.groupBy(
        F.concat_ws(
            " > ", "event_type", "e2", "e3"
        ).alias("trigram")
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.desc("n"), F.asc("trigram"))
    return (
        tri.select(
            F.row_number().over(wr).cast("int").alias("rnk"),
            "trigram",
            "n",
        )
        .filter(F.col("rnk") <= 20)
        .orderBy("rnk")
    )


# ----------------------------------------------------------------------------
# Association-rule metrics for co-purchased part pairs
# ----------------------------------------------------------------------------

_RULES_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
),
nb AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_p FROM items GROUP BY part),
nord AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
pairs AS (
  SELECT a.part AS part_a, b.part AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b ON a.ok = b.ok AND a.part < b.part
  GROUP BY 1, 2
),
ranked AS (
  SELECT p.part_a, p.part_b, p.n_ab, na.n_p AS n_a, nbb.n_p AS n_b, o.n,
         ROW_NUMBER() OVER (
           ORDER BY p.n_ab DESC, p.part_a, p.part_b) AS rnk
  FROM pairs p
  JOIN nb na ON na.part = p.part_a
  JOIN nb nbb ON nbb.part = p.part_b
  CROSS JOIN nord o
)
SELECT CAST(rnk AS INT) AS rnk, part_a, part_b, n_ab, n_a, n_b,
       CAST(n_ab AS DOUBLE) / n AS support,
       CAST(n_ab AS DOUBLE) / n_a AS confidence,
       CAST(n_ab AS DOUBLE) * n / (CAST(n_a AS DOUBLE) * n_b) AS lift,
       CAST(n_ab AS DOUBLE) / n
         - (CAST(n_a AS DOUBLE) / n) * (CAST(n_b AS DOUBLE) / n)
         AS leverage,
       CASE WHEN n_ab < n_a THEN
         (1 - CAST(n_b AS DOUBLE) / n)
         / (1 - CAST(n_ab AS DOUBLE) / n_a) END AS conviction,
       CAST(n_ab AS DOUBLE) / (n_a + n_b - n_ab) AS jaccard
FROM ranked WHERE rnk <= 15 ORDER BY rnk
"""


@register(
    "basket_rule_metrics",
    _RULES_ORACLE,
    "The full association-rule metric panel (support, confidence, "
    "lift, leverage, conviction, jaccard) for the top-15 co-purchased "
    "part pairs — market_basket_pairs surfaces lift only; rule "
    "triage needs conviction (directional) and leverage (additive) "
    "too.  Conviction is NULL for exact implications (confidence 1). "
    "Exactness: every metric is a scalar double from exact integer "
    "counts, computed by the same expression both engines.  Scale: "
    "pair generation self-joins WITHIN an order key (baskets are "
    "small), counts are distributed; 15 rows surface.",
)
def basket_rule_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    nb = items.groupBy("part").agg(F.count(F.lit(1)).alias("n_p"))
    nord = items.agg(
        F.countDistinct("ok").cast("long").alias("n")
    )
    a = items.select("ok", F.col("part").alias("part_a"))
    b = items.select("ok", F.col("part").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    wr = Window.orderBy(
        F.desc("n_ab"), F.asc("part_a"), F.asc("part_b")
    )
    ranked = (
        pairs.join(
            nb.select(
                F.col("part").alias("part_a"),
                F.col("n_p").alias("n_a"),
            ),
            "part_a",
        )
        .join(
            nb.select(
                F.col("part").alias("part_b"),
                F.col("n_p").alias("n_b"),
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(nord))
        .select(
            F.row_number().over(wr).cast("int").alias("rnk"),
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            "n",
        )
        .filter(F.col("rnk") <= 15)
    )
    nab = F.col("n_ab").cast("double")
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    nd = F.col("n").cast("double")
    return ranked.select(
        "rnk",
        "part_a",
        "part_b",
        "n_ab",
        "n_a",
        "n_b",
        (nab / nd).alias("support"),
        (nab / nad).alias("confidence"),
        (nab * F.col("n") / (nad * F.col("n_b"))).alias("lift"),
        (nab / nd - (nad / nd) * (nbd / nd)).alias("leverage"),
        F.when(
            F.col("n_ab") < F.col("n_a"),
            (1 - nbd / nd) / (1 - nab / nad),
        ).alias("conviction"),
        (nab / (F.col("n_a") + F.col("n_b") - F.col("n_ab"))).alias(
            "jaccard"
        ),
    ).orderBy("rnk")


# ----------------------------------------------------------------------------
# Part adoption curve: first-order cohorts, cumulative coverage
# ----------------------------------------------------------------------------

_ADOPTION_ORACLE = """
WITH first_m AS (
  SELECT l.l_partkey AS part,
         MIN(date_trunc('month', o.o_orderdate)) AS mon
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
),
per_m AS (
  SELECT mon, CAST(COUNT(*) AS BIGINT) AS new_parts
  FROM first_m GROUP BY mon
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_parts FROM first_m)
SELECT CAST(mon AS DATE) AS mon, new_parts,
       CAST(SUM(new_parts) OVER (ORDER BY mon
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_parts,
       CAST(1000000 * SUM(new_parts) OVER (ORDER BY mon
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         // total_parts AS BIGINT) AS adoption_ppm
FROM per_m CROSS JOIN tot
ORDER BY mon
"""


@register(
    "part_adoption_curve",
    _ADOPTION_ORACLE,
    "Product adoption curve: per month, how many parts received their "
    "FIRST order, cumulative count, and the cumulative share of the "
    "eventually-ordered catalog (ppm, truncating integer division) — "
    "the assortment-rollout readout next to new_vs_returning's "
    "customer view.  Exactness: all integers (MIN month per part, "
    "counts, one DIV).  Scale: one distributed first-touch groupBy, "
    "then a calendar-bounded month spine through the window.",
)
def part_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    first_m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_partkey").alias("part"))
        .agg(
            F.min(F.date_trunc("month", "o_orderdate")).alias("mon")
        )
    )
    per_m = first_m.groupBy("mon").agg(
        F.count(F.lit(1)).alias("new_parts")
    )
    tot = first_m.agg(
        F.count(F.lit(1)).cast("long").alias("total_parts")
    )
    w = Window.orderBy("mon").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_m.crossJoin(F.broadcast(tot))
        .select(
            F.to_date("mon").alias("mon"),
            "new_parts",
            F.sum("new_parts").over(w).cast("long").alias("cum_parts"),
            F.expr(
                "CAST(1000000 * SUM(new_parts) OVER (ORDER BY mon"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " DIV total_parts AS BIGINT)"
            ).alias("adoption_ppm"),
        )
        .orderBy("mon")
    )


# ----------------------------------------------------------------------------
# Hapax legomena ratio per source
# ----------------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
tc AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(COUNT(*) FILTER (WHERE cnt = 1) AS BIGINT) AS hapax,
       CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       CAST(1000000 * COUNT(*) FILTER (WHERE cnt = 1) // COUNT(*)
            AS BIGINT) AS hapax_ppm
FROM tc GROUP BY source ORDER BY source
"""


@register(
    "hapax_ratio_by_source",
    _HAPAX_ORACLE,
    "Hapax legomena ratio per source (share of vocabulary occurring "
    "exactly once, ppm) — the lexical-richness screen that separates "
    "template-heavy sources (low hapax share) from organic text, "
    "complementing vocab_growth and token_diversity_simpson.  All "
    "integers, one truncating DIV.  Scale: one distributed token "
    "histogram; output is one row per source.",
)
def hapax_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    tc = (
        docs.select(
            "source",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        tc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.sum("cnt").cast("long").alias("total_tokens"),
        )
        .select(
            "source",
            "vocab",
            "hapax",
            "total_tokens",
            F.expr(
                "CAST(1000000 * hapax DIV vocab AS BIGINT)"
            ).alias("hapax_ppm"),
        )
        .orderBy("source")
    )


# ----------------------------------------------------------------------------
# Cohort net revenue retention (NRR triangle)
# ----------------------------------------------------------------------------

_NRR_ORACLE = """
WITH first_m AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT f.cohort, date_diff('month', f.cohort,
                             date_trunc('month', o.o_orderdate)) AS k,
         CAST(SUM(FLOOR(o.o_totalprice * 100)) AS BIGINT) AS rev_c
  FROM orders o JOIN first_m f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
),
base AS (
  SELECT cohort, rev_c AS base_c FROM rev WHERE k = 0
)
SELECT CAST(r.cohort AS DATE) AS cohort, CAST(r.k AS INT) AS k,
       r.rev_c, CAST(1000000 * r.rev_c // b.base_c AS BIGINT) AS nrr_ppm
FROM rev r JOIN base b ON r.cohort = b.cohort
WHERE r.k BETWEEN 1 AND 6
ORDER BY r.cohort, r.k
"""


@register(
    "cohort_nrr",
    _NRR_ORACLE,
    "Net revenue retention triangle: each acquisition cohort's revenue "
    "in months +1..+6 as a ppm share of its first-month revenue — the "
    "SaaS-style expansion/contraction readout retention_cohorts (user "
    "counts) cannot give.  All integer cents + one truncating DIV.  "
    "Scale: first-touch groupBy + (cohort, offset) aggregation, base "
    "month broadcast; output is calendar-bounded.",
)
def cohort_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    first_m = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    rev = (
        o.join(first_m, "o_custkey")
        .groupBy(
            "cohort",
            (
                (F.year("o_orderdate") - F.year("cohort")) * 12
                + (F.month("o_orderdate") - F.month("cohort"))
            ).cast("int").alias("k"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("rev_c")
        )
    )
    base = rev.filter(F.col("k") == 0).select(
        "cohort", F.col("rev_c").alias("base_c")
    )
    return (
        rev.filter((F.col("k") >= 1) & (F.col("k") <= 6))
        .join(F.broadcast(base), "cohort")
        .select(
            F.to_date("cohort").alias("cohort"),
            "k",
            "rev_c",
            F.expr(
                "CAST(1000000 * rev_c DIV base_c AS BIGINT)"
            ).alias("nrr_ppm"),
        )
        .orderBy("cohort", "k")
    )


# ----------------------------------------------------------------------------
# Price dispersion: top parts by relative price spread
# ----------------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH px AS (
  SELECT l_partkey AS part,
         CAST(FLOOR(l_extendedprice * 100 / l_quantity) AS BIGINT)
           AS unit_c
  FROM lineitem WHERE l_quantity > 0
),
m AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(unit_c) AS s, SUM(unit_c * unit_c) AS ss
  FROM px GROUP BY part HAVING COUNT(*) >= 5
),
scored AS (
  SELECT part, n,
         CAST(s // n AS BIGINT) AS mean_unit_c,
         (CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
         / (CAST(s AS DOUBLE) * s) AS cv2
  FROM m
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cv2 DESC, part) AS rnk
  FROM scored
)
SELECT CAST(rnk AS INT) AS rnk, part, n, mean_unit_c, cv2
FROM ranked WHERE rnk <= 15 ORDER BY rnk
"""


@register(
    "price_dispersion_parts",
    _DISPERSION_ORACLE,
    "Top-15 parts by relative unit-price dispersion CV^2 = "
    "(n*Sxx - Sx^2)/Sx^2 over integer unit cents (floored "
    "extendedprice/quantity) with a >=5-observation floor — the "
    "pricing-consistency audit (high dispersion = discount chaos or "
    "data errors).  Moments exact in HUGEINT/DECIMAL; CV^2 is one "
    "double expression per part; ranking tiebroken by part key.  "
    "Scale: one grouped aggregation, 15 rows surface.",
)
def price_dispersion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            F.col("l_partkey").alias("part"),
            F.floor(
                F.col("l_extendedprice") * 100 / F.col("l_quantity")
            )
            .cast("long")
            .alias("unit_c"),
        )
    )
    m = (
        px.groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("unit_c").cast(_DEC)).alias("s"),
            F.sum((F.col("unit_c") * F.col("unit_c")).cast(_DEC)).alias(
                "ss"
            ),
        )
        .filter(F.col("n") >= 5)
    )
    sd = F.col("s").cast("double")
    scored = m.select(
        "part",
        "n",
        F.expr("CAST(s DIV n AS BIGINT)").alias("mean_unit_c"),
        (
            (F.col("n").cast("double") * F.col("ss").cast("double") - sd * F.col("s").cast("double"))
            / (sd * F.col("s").cast("double"))
        ).alias("cv2"),
    )
    wr = Window.orderBy(F.desc("cv2"), F.asc("part"))
    return (
        scored.select(
            F.row_number().over(wr).cast("int").alias("rnk"),
            "part",
            "n",
            "mean_unit_c",
            "cv2",
        )
        .filter(F.col("rnk") <= 15)
        .orderBy("rnk")
    )


# ----------------------------------------------------------------------------
# Monthly order-size mix shift (chi-square vs the overall mix)
# ----------------------------------------------------------------------------

_MIXSHIFT_ORACLE = """
WITH sizes AS (
  SELECT o.o_orderkey, date_trunc('month', o.o_orderdate) AS mon,
         least(CAST(COUNT(*) AS BIGINT), 7) AS sz
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
cell AS (
  SELECT mon, sz, CAST(COUNT(*) AS BIGINT) AS o_cnt
  FROM sizes GROUP BY 1, 2
),
tot AS (
  SELECT sz, CAST(SUM(o_cnt) AS BIGINT) AS sz_tot FROM cell GROUP BY sz
),
mtot AS (
  SELECT mon, CAST(SUM(o_cnt) AS BIGINT) AS mon_tot FROM cell GROUP BY mon
),
n_all AS (SELECT CAST(SUM(o_cnt) AS BIGINT) AS n FROM cell),
terms AS (
  SELECT c.mon, c.sz,
         (CAST(c.o_cnt AS DOUBLE)
          - CAST(m.mon_tot AS DOUBLE) * t.sz_tot / a.n)
         * (CAST(c.o_cnt AS DOUBLE)
            - CAST(m.mon_tot AS DOUBLE) * t.sz_tot / a.n)
         / (CAST(m.mon_tot AS DOUBLE) * t.sz_tot / a.n) AS term,
         m.mon_tot
  FROM cell c
  JOIN tot t ON t.sz = c.sz
  JOIN mtot m ON m.mon = c.mon
  CROSS JOIN n_all a
)
SELECT CAST(mon AS DATE) AS mon, CAST(MAX(mon_tot) AS BIGINT) AS n_orders,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list(term ORDER BY sz)), (a, b) -> a + b) AS chi2_vs_overall
FROM terms GROUP BY mon ORDER BY mon
"""


@register(
    "order_size_mix_shift",
    _MIXSHIFT_ORACLE,
    "Per month, the chi-square distance between that month's order-"
    "size mix (line counts, capped at 7+) and the overall mix — the "
    "basket-composition drift monitor next to basket_size_hist's "
    "static view.  Cell terms are scalar doubles from exact counts, "
    "folded per month in size order.  Scale: one size histogram, two "
    "broadcast margins, a 7-term fold per month.",
)
def order_size_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    sizes = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(F.least(F.count(F.lit(1)), F.lit(7)).alias("sz"))
    )
    cell = sizes.groupBy("mon", "sz").agg(
        F.count(F.lit(1)).alias("o_cnt")
    )
    tot = cell.groupBy("sz").agg(
        F.sum("o_cnt").cast("long").alias("sz_tot")
    )
    mtot = cell.groupBy("mon").agg(
        F.sum("o_cnt").cast("long").alias("mon_tot")
    )
    n_all = cell.agg(F.sum("o_cnt").cast("long").alias("n"))
    e = (
        F.col("mon_tot").cast("double") * F.col("sz_tot") / F.col("n")
    )
    terms = (
        cell.join(F.broadcast(tot), "sz")
        .join(F.broadcast(mtot), "mon")
        .crossJoin(F.broadcast(n_all))
        .select(
            "mon",
            "sz",
            "mon_tot",
            (
                (F.col("o_cnt").cast("double") - e)
                * (F.col("o_cnt").cast("double") - e)
                / e
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("mon")
        .agg(
            F.max("mon_tot").cast("long").alias("n_orders"),
            F.sort_array(F.collect_list(F.struct("sz", "term"))).alias(
                "xs"
            ),
        )
        .select(
            F.to_date("mon").alias("mon"),
            "n_orders",
            F.expr(
                "aggregate(xs, CAST(0.0 AS DOUBLE),"
                " (a, x) -> a + x.term)"
            ).alias("chi2_vs_overall"),
        )
        .orderBy("mon")
    )


# ----------------------------------------------------------------------------
# Supplier concentration: CR3 per nation
# ----------------------------------------------------------------------------

_CR3_ORACLE = """
WITH srev AS (
  SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
         CAST(SUM(FLOOR(l.l_extendedprice * 100)) AS BIGINT) AS rev_c
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nation, supp, rev_c,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY rev_c DESC, supp) AS rnk
  FROM srev
)
SELECT n.n_name AS nation_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
       CAST(SUM(rev_c) FILTER (WHERE rnk <= 3) AS BIGINT) AS top3_rev_c,
       CAST(1000000 * SUM(rev_c) FILTER (WHERE rnk <= 3)
            // SUM(rev_c) AS BIGINT) AS cr3_ppm
FROM ranked r JOIN nation n ON r.nation = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""


@register(
    "supplier_cr3_by_nation",
    _CR3_ORACLE,
    "CR3 supplier concentration per nation: the top-3 suppliers' share "
    "of national lineitem revenue (ppm) — the antitrust-style "
    "complement to gini_hhi_concentration's single-number HHI.  All "
    "integer cents, per-nation rank windows (bounded by suppliers per "
    "nation), one truncating DIV.",
)
def supplier_cr3_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    srev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.col("l_suppkey").alias("supp"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100))
            .cast("long")
            .alias("rev_c")
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.desc("rev_c"), F.asc("supp")
    )
    ranked = srev.select(
        "nation", "rev_c", F.row_number().over(w).alias("rnk")
    )
    return (
        ranked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("rev_c").cast("long").alias("total_rev_c"),
            F.sum(F.when(F.col("rnk") <= 3, F.col("rev_c")).otherwise(0))
            .cast("long")
            .alias("top3_rev_c"),
        )
        .join(F.broadcast(n), F.col("nation") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"),
            "n_suppliers",
            "total_rev_c",
            "top3_rev_c",
            F.expr(
                "CAST(1000000 * top3_rev_c DIV total_rev_c AS BIGINT)"
            ).alias("cr3_ppm"),
        )
        .orderBy("nation_name")
    )


# ----------------------------------------------------------------------------
# Word-length profile per language
# ----------------------------------------------------------------------------

_WLEN_ORACLE = """
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
m AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(length(tok)) AS BIGINT) AS total_chars,
         CAST(COUNT(*) FILTER (WHERE length(tok) >= 7) AS BIGINT)
           AS long_tokens
  FROM toks GROUP BY lang
)
SELECT lang, n_tokens, total_chars,
       CAST(1000000 * total_chars // n_tokens AS BIGINT)
         AS mean_len_micro,
       CAST(1000000 * long_tokens // n_tokens AS BIGINT) AS long_ppm
FROM m ORDER BY lang
"""


@register(
    "word_length_profile",
    _WLEN_ORACLE,
    "Mean token length (micro-units) and the 7+-char long-word share "
    "(ppm) per language — the morphology fingerprint that separates "
    "agglutinative from analytic corpora and flags mis-tagged "
    "languages next to langid_confusion.  All integers + truncating "
    "DIVs.  Scale: one distributed token aggregation per language.",
)
def word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _t(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.length("tok")).cast("long").alias("total_chars"),
            F.sum(
                F.when(F.length("tok") >= 7, 1).otherwise(0)
            )
            .cast("long")
            .alias("long_tokens"),
        )
        .select(
            "lang",
            "n_tokens",
            "total_chars",
            F.expr(
                "CAST(1000000 * total_chars DIV n_tokens AS BIGINT)"
            ).alias("mean_len_micro"),
            F.expr(
                "CAST(1000000 * long_tokens DIV n_tokens AS BIGINT)"
            ).alias("long_ppm"),
        )
        .orderBy("lang")
    )


# ----------------------------------------------------------------------------
# Weekday x day-part residuals (where does traffic deviate?)
# ----------------------------------------------------------------------------

_DOWHOUR_ORACLE = """
WITH cell AS (
  -- DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday - align to Spark
  SELECT dayofweek(ts) + 1 AS dow, CAST(hour(ts) // 6 AS INT) AS part_,
         CAST(COUNT(*) AS BIGINT) AS o_cnt
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT dow, part_, o_cnt,
         SUM(o_cnt) OVER (PARTITION BY dow) AS row_tot,
         SUM(o_cnt) OVER (PARTITION BY part_) AS col_tot,
         SUM(o_cnt) OVER () AS n
  FROM cell
),
scored AS (
  SELECT dow, part_, o_cnt,
         (CAST(o_cnt AS DOUBLE)
          - CAST(row_tot AS DOUBLE) * col_tot / n)
         / sqrt(CAST(row_tot AS DOUBLE) * col_tot / n) AS residual
  FROM margins
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY abs(residual) DESC, dow, part_) AS rnk
  FROM scored
)
SELECT CAST(rnk AS INT) AS rnk, CAST(dow AS INT) AS dow, part_,
       o_cnt, residual
FROM ranked WHERE rnk <= 10 ORDER BY rnk
"""


@register(
    "dow_daypart_residuals",
    _DOWHOUR_ORACLE,
    "Top-10 (weekday x 6h day-part) cells by |Pearson residual| "
    "(o - e)/sqrt(e) against independence — WHERE the traffic "
    "calendar deviates, not just whether (hourly_heatmap shows raw "
    "volume; this normalizes out both margins).  Residuals are scalar "
    "doubles from exact counts; ranking tiebroken by (dow, part).  "
    "Scale: 28 cells from one distributed groupBy.",
)
def dow_daypart_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("ts")
    cell = ev.groupBy(
        F.dayofweek("ts").alias("dow"),
        (F.hour("ts").cast("int") / 6).cast("int").alias("part_"),
    ).agg(F.count(F.lit(1)).alias("o_cnt"))
    wr_ = Window.partitionBy("dow")
    wc = Window.partitionBy("part_")
    wn = Window.partitionBy()
    e = (
        F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    )
    scored = cell.select(
        "dow",
        "part_",
        "o_cnt",
        F.sum("o_cnt").over(wr_).alias("row_tot"),
        F.sum("o_cnt").over(wc).alias("col_tot"),
        F.sum("o_cnt").over(wn).alias("n"),
    ).select(
        "dow",
        "part_",
        "o_cnt",
        ((F.col("o_cnt").cast("double") - e) / F.sqrt(e)).alias(
            "residual"
        ),
    )
    wrank = Window.orderBy(
        F.desc(F.abs(F.col("residual"))), F.asc("dow"), F.asc("part_")
    )
    return (
        scored.select(
            F.row_number().over(wrank).cast("int").alias("rnk"),
            F.col("dow").cast("int").alias("dow"),
            "part_",
            "o_cnt",
            "residual",
        )
        .filter(F.col("rnk") <= 10)
        .orderBy("rnk")
    )


# ----------------------------------------------------------------------------
# Region x brand affinity lift
# ----------------------------------------------------------------------------

_AFFINITY_ORACLE = """
WITH cell AS (
  SELECT r.r_name AS region, p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS o_cnt
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
margins AS (
  SELECT region, brand, o_cnt,
         SUM(o_cnt) OVER (PARTITION BY region) AS reg_tot,
         SUM(o_cnt) OVER (PARTITION BY brand) AS brand_tot,
         SUM(o_cnt) OVER () AS n
  FROM cell
),
scored AS (
  SELECT region, brand, o_cnt,
         CAST(1000000 * o_cnt * n // (reg_tot * brand_tot) AS BIGINT)
           AS lift_ppm
  FROM margins
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY lift_ppm DESC, region, brand) AS rnk
  FROM scored
)
SELECT CAST(rnk AS INT) AS rnk, region, brand, o_cnt, lift_ppm
FROM ranked WHERE rnk <= 15 ORDER BY rnk
"""


@register(
    "region_brand_affinity",
    _AFFINITY_ORACLE,
    "Top-15 (region, brand) cells by purchase-affinity lift "
    "P(region,brand)/(P(region)P(brand)) as an EXACT ppm integer "
    "(o_cnt*n*1e6 DIV reg_tot*brand_tot — no float division at all) — "
    "the assortment-localization signal.  Scale: one five-join "
    "contingency groupBy with broadcast dims; 125 cells.",
)
def region_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cell = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.count(F.lit(1)).alias("o_cnt"))
    )
    wreg = Window.partitionBy("region")
    wbr = Window.partitionBy("brand")
    wn = Window.partitionBy()
    scored = cell.select(
        "region",
        "brand",
        "o_cnt",
        F.sum("o_cnt").over(wreg).alias("reg_tot"),
        F.sum("o_cnt").over(wbr).alias("brand_tot"),
        F.sum("o_cnt").over(wn).alias("n"),
    ).select(
        "region",
        "brand",
        "o_cnt",
        F.expr(
            "CAST(1000000 * o_cnt * n DIV (reg_tot * brand_tot)"
            " AS BIGINT)"
        ).alias("lift_ppm"),
    )
    wrank = Window.orderBy(
        F.desc("lift_ppm"), F.asc("region"), F.asc("brand")
    )
    return (
        scored.select(
            F.row_number().over(wrank).cast("int").alias("rnk"),
            "region",
            "brand",
            "o_cnt",
            "lift_ppm",
        )
        .filter(F.col("rnk") <= 15)
        .orderBy("rnk")
    )


# ----------------------------------------------------------------------------
# Vocabulary overlap between languages
# ----------------------------------------------------------------------------

_VOCAB_OVERLAP_ORACLE = """
WITH vocab AS (
  SELECT DISTINCT lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
sizes AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS v FROM vocab GROUP BY lang
),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(COUNT(*) AS BIGINT) AS both_
  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT i.lang_a, i.lang_b, i.both_, sa.v AS vocab_a, sb.v AS vocab_b,
       CAST(1000000 * i.both_ // (sa.v + sb.v - i.both_) AS BIGINT)
         AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.lang = i.lang_a
JOIN sizes sb ON sb.lang = i.lang_b
ORDER BY i.lang_a, i.lang_b
"""


@register(
    "vocab_overlap_langs",
    _VOCAB_OVERLAP_ORACLE,
    "Exact vocabulary Jaccard (ppm) between every language pair — "
    "high overlap between supposedly distinct languages flags "
    "code-switching or langid contamination (the vocabulary-level "
    "twin of langid_confusion's document-level view).  All integers; "
    "the intersection join is per-token (each token appears in few "
    "languages), never all-pairs of tokens.",
)
def vocab_overlap_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = (
        _t(spark, sf_dir, "documents")
        .select(
            "lang",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("tok"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    a = vocab.select(F.col("lang").alias("lang_a"), "tok")
    b = vocab.select(F.col("lang").alias("lang_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("both_"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("lang").alias("lang_a"),
                    F.col("v").alias("vocab_a"),
                )
            ),
            "lang_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("lang").alias("lang_b"),
                    F.col("v").alias("vocab_b"),
                )
            ),
            "lang_b",
        )
        .select(
            "lang_a",
            "lang_b",
            "both_",
            "vocab_a",
            "vocab_b",
            F.expr(
                "CAST(1000000 * both_ DIV (vocab_a + vocab_b - both_)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("lang_a", "lang_b")
    )
