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
    tc = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
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
