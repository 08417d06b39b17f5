"""Robust trend / changepoint / distribution-shift statistics and an
exactly-computable BM25 retrieval ranking — round-4 additions to the
registry (imported LAST in queries.all_queries(): the driver's
first-50 set is pinned by registration order).

Determinism strategy (the registry contract, see queries_robust_ext):
every statistic reduces to integer counts, fixed-point
``FLOOR(x * 100)`` cent sums (exact DECIMAL accumulation), pairwise
integer differences, and at most ONE double divide of exact integers
per emitted number — no engine transcendentals, no float-sum order
dependence.

Scale posture: the trend statistics aggregate to the MONTH/DAY
calendar domain first, so every pairwise pass is bounded by the
calendar squared (a few thousand rows at any corpus size), never by
the fact table; BM25 is one corpus-stats scalar broadcast plus a
map-only per-document score and a global top-k sort+limit.

Reference analog: the reference's volume-anomaly DQ check
(data_quality/*_validation.py) eyeballs row counts; Theil-Sen /
Mann-Kendall / CUSUM / KS are the statistically defensible upgrades a
lakehouse team actually deploys for drift detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.queries import _t, register

# These queries deliberately aggregate revenue in integer CENTS
# (scale 100), NOT money.SCALE micros: CUSUM multiplies the prefix sum
# by the month count and KS cross-multiplies CDF counts, so the micros
# scale would exit int64 around sf100 while cents hold to ~sf10000.
# tests/test_oracle_parity.py's fixed-point-scale guard consumes this
# declaration — an oracle here using any OTHER scale still fails it.
CENT_SCALE_QUERIES = frozenset(
    {
        "theil_sen_trend",
        "mann_kendall_trend",
        "cusum_changepoint",
        "ks_two_sample",
        "holt_linear_forecast",
        "forecast_backtest_mae",
        "promotion_lift_did",
        "cuped_adjusted_lift",
        # r5 (queries_ops_ext): detrended*7 / rolling order statistics
        # must stay integral in int64 at large SF
        "seasonal_decompose_daily",
        "trailing_percentile_bands",
        # r7 (queries_lakeops_ext): the Holt-Winters state recurrence
        # replays per-day cent sums through integer divisions — the
        # holt_linear_forecast scale argument verbatim
        "holt_winters_forecast",
    }
)

# Monthly order revenue in exact integer CENTS (floor + decimal sum:
# identical on both engines, order-independent, and the pairwise
# differences below stay far inside int64 even at large SF).
_MONTHLY_CTE = """
monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS DECIMAL(28,0)))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
)
"""


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("decimal(28,0)"))
            .cast("bigint")
            .alias("rev")
        )
    )


# ----------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes)
# ----------------------------------------------------------------------------

_THEIL_SEN_ORACLE = f"""
WITH {_MONTHLY_CTE},
pairs AS (
  SELECT a.month AS m_a,
         CAST(date_diff('day', CAST(a.month AS DATE), CAST(b.month AS DATE))
              AS BIGINT) AS ddays,
         CAST(b.rev - a.rev AS DOUBLE)
           / date_diff('day', CAST(a.month AS DATE), CAST(b.month AS DATE))
           AS slope
  FROM monthly a JOIN monthly b ON a.month < b.month
),
ranked AS (
  SELECT slope,
         ROW_NUMBER() OVER (ORDER BY slope, ddays, m_a) AS rn,
         COUNT(*) OVER () AS n_pairs
  FROM pairs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM monthly) AS n_months,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       slope AS sen_slope_cents_per_day
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""


@register(
    "theil_sen_trend",
    _THEIL_SEN_ORACLE,
    "Theil-Sen robust trend of monthly revenue: the median of all "
    "pairwise slopes (lower median, deterministic tiebreak), immune "
    "to the outlier months that wreck OLS (ols_daily_trend's "
    "breakdown point is 0; Theil-Sen's is 29%). Slopes are ONE double "
    "divide of exact integer cent-differences by exact day gaps, so "
    "ranking and the emitted median are bit-stable. Pairs live on the "
    "calendar-month domain — O(months^2) rows regardless of fact "
    "size.",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _monthly(spark, sf_dir)
    a = m.alias("a")
    b = m.alias("b")
    ddays = F.datediff(F.to_date("b.month"), F.to_date("a.month"))
    pairs = (
        a.join(b, F.col("a.month") < F.col("b.month"))
        .select(
            F.col("a.month").alias("m_a"),
            ddays.cast("bigint").alias("ddays"),
            (
                (F.col("b.rev") - F.col("a.rev")).cast("double") / ddays
            ).alias("slope"),
        )
    )
    w = Window.orderBy("slope", "ddays", "m_a")  # months^2 domain: bounded
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n_pairs"),
    )
    n_months = m.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return (
        ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        .crossJoin(F.broadcast(n_months))
        .select(
            F.col("c").alias("n_months"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("slope").alias("sen_slope_cents_per_day"),
        )
    )


# ----------------------------------------------------------------------------
# Mann-Kendall trend test (exact S statistic + tie-corrected variance)
# ----------------------------------------------------------------------------

_MANN_KENDALL_ORACLE = f"""
WITH {_MONTHLY_CTE},
s AS (
  SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM monthly a JOIN monthly b ON a.month < b.month
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly),
ties AS (
  SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
           AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM monthly GROUP BY rev HAVING COUNT(*) > 1) g
)
SELECT n.n_months,
       s.s_stat,
       CAST(n.n_months * (n.n_months - 1) * (2 * n.n_months + 5)
            - ties.tie_term AS BIGINT) AS var_s_x18,
       CAST(2 * s.s_stat AS DOUBLE)
         / (n.n_months * (n.n_months - 1)) AS kendall_tau
FROM s CROSS JOIN n CROSS JOIN ties
"""


@register(
    "mann_kendall_trend",
    _MANN_KENDALL_ORACLE,
    "Mann-Kendall monotone-trend test on monthly revenue: S = sum of "
    "pairwise signs (exact BIGINT), the tie-corrected variance "
    "NUMERATOR var_s_x18 = n(n-1)(2n+5) - sum t(t-1)(2t+5) kept as an "
    "exact integer (the /18 and sqrt belong to the caller's z-score, "
    "not to cross-engine hashing), and Kendall's tau as one double "
    "divide. Distribution-free where ols_daily_trend assumes "
    "linearity; pairs bounded by the month calendar.",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _monthly(spark, sf_dir)
    a = m.alias("a")
    b = m.alias("b")
    s = (
        a.join(b, F.col("a.month") < F.col("b.month"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = m.agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))
    ties = (
        m.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("tie_term")
        )
    )
    nm = F.col("n_months")
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            nm,
            F.col("s_stat"),
            (nm * (nm - 1) * (2 * nm + 5) - F.col("tie_term"))
            .cast("bigint")
            .alias("var_s_x18"),
            (
                (2 * F.col("s_stat")).cast("double") / (nm * (nm - 1))
            ).alias("kendall_tau"),
        )
    )


# ----------------------------------------------------------------------------
# CUSUM changepoint (argmax of mean-centered cumulative deviation)
# ----------------------------------------------------------------------------

_CUSUM_ORACLE = f"""
WITH {_MONTHLY_CTE},
pre AS (
  SELECT month,
         CAST(SUM(rev) OVER (ORDER BY month) AS BIGINT) AS prefix,
         ROW_NUMBER() OVER (ORDER BY month) AS t,
         CAST(SUM(rev) OVER () AS BIGINT) AS total,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM monthly
),
dev AS (
  SELECT month, n,
         CAST(n * prefix - t * total AS BIGINT) AS d
  FROM pre
)
SELECT (SELECT CAST(n AS BIGINT) FROM dev LIMIT 1) AS n_months,
       month AS changepoint_month,
       CAST(d AS DOUBLE) / n AS cusum_stat_cents
FROM dev
ORDER BY ABS(d) DESC, month
LIMIT 1
"""


@register(
    "cusum_changepoint",
    _CUSUM_ORACLE,
    "CUSUM changepoint on monthly revenue: the month maximizing "
    "|cumulative deviation from the global mean|, computed scale-free "
    "as n*prefix_t - t*total (exact BIGINT — no mean division inside "
    "the scan; the single divide by n happens once, on the emitted "
    "statistic). Earliest month wins ties deterministically. The "
    "window runs over the bounded month calendar; the same integer "
    "trick holds to ~10^5x this SF before int64 cents overflow.",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _monthly(spark, sf_dir)
    w = Window.orderBy("month")  # month-calendar domain: bounded
    wall = Window.partitionBy()
    pre = m.select(
        "month",
        F.sum("rev").over(w).cast("bigint").alias("prefix"),
        F.row_number().over(w).alias("t"),
        F.sum("rev").over(wall).cast("bigint").alias("total"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    dev = pre.select(
        "month",
        "n",
        (F.col("n") * F.col("prefix") - F.col("t") * F.col("total"))
        .cast("bigint")
        .alias("d"),
    )
    return (
        dev.orderBy(F.abs(F.col("d")).desc(), F.col("month"))
        .limit(1)
        .select(
            F.col("n").alias("n_months"),
            F.to_date("month").alias("changepoint_month"),
            (F.col("d").cast("double") / F.col("n")).alias(
                "cusum_stat_cents"
            ),
        )
    )


# ----------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance (exact rational supremum)
# ----------------------------------------------------------------------------

_KS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS hi,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS DECIMAL(28,0)))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
vals AS (
  SELECT rev,
         CAST(SUM(hi) AS BIGINT) AS c1,
         CAST(SUM(1 - hi) AS BIGINT) AS c2
  FROM daily GROUP BY rev
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM vals
),
cum AS (
  SELECT rev,
         CAST(SUM(c1) OVER (ORDER BY rev) AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY rev) AS BIGINT) AS f2
  FROM vals
)
SELECT tot.n1, tot.n2,
       CAST(ABS(cum.f1 * tot.n2 - cum.f2 * tot.n1) AS BIGINT) AS d_num,
       CAST(ABS(cum.f1 * tot.n2 - cum.f2 * tot.n1) AS DOUBLE)
         / (tot.n1 * tot.n2) AS ks_d
FROM cum CROSS JOIN tot
ORDER BY ABS(cum.f1 * tot.n2 - cum.f2 * tot.n1) DESC, cum.rev
LIMIT 1
"""


@register(
    "ks_two_sample",
    _KS_ORACLE,
    "Two-sample Kolmogorov-Smirnov distance between the daily-revenue "
    "distributions of high-priority (1-URGENT/2-HIGH) and "
    "regular-priority order flow: sup over the merged support of "
    "|F1 - F2|, held EXACT as the integer cross-product "
    "|f1*n2 - f2*n1| until one final double divide by n1*n2 — no "
    "float CDFs to drift. Support collapses to distinct per-(day,"
    "class) revenue values first, so the ordered pass is bounded by "
    "the calendar, not the order count. The drift detector behind "
    "dq_volume_anomaly, upgraded from counts to whole distributions.",
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("day"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("hi"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("decimal(28,0)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    vals = daily.groupBy("rev").agg(
        F.sum("hi").cast("bigint").alias("c1"),
        F.sum(1 - F.col("hi")).cast("bigint").alias("c2"),
    )
    tot = vals.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    w = Window.orderBy("rev")  # distinct daily values: calendar-bounded
    cum = vals.select(
        "rev",
        F.sum("c1").over(w).cast("bigint").alias("f1"),
        F.sum("c2").over(w).cast("bigint").alias("f2"),
    )
    d = F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .orderBy(d.desc(), F.col("rev"))
        .limit(1)
        .select(
            "n1",
            "n2",
            d.cast("bigint").alias("d_num"),
            (d.cast("double") / (F.col("n1") * F.col("n2"))).alias("ks_d"),
        )
    )


# ----------------------------------------------------------------------------
# BM25 retrieval top-k (log-free Robertson-Sparck-Jones idf, exact)
# ----------------------------------------------------------------------------

_BM25_TERMS = ("spark", "merge", "vector")
# k1 = 1.2 = 6/5, b = 0.75 = 3/4.  Per-term score with the RSJ odds
# idf (N - df + 0.5)/(df + 0.5) — the log dropped so the whole term
# is ONE divide of two exact BIGINT products (engine ln()s disagree in
# the low bits; the log is monotone per term, and this variant is the
# documented contract, not an approximation of another one):
#   score_t = [ (2N - 2df + 1) * tf * 22 * sum_dl ]
#           / [ (2df + 1) * (10 * sum_dl * tf + 3 * sum_dl + 9 * dl * N) ]
# (derived by multiplying numerator and denominator of the standard
#  tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) form by 10*sum_dl, with
#  avgdl = sum_dl / N kept as the exact integer pair).

_BM25_NORM = "regexp_replace(trim(text), '\\s+', ' ', 'g')"


def _bm25_oracle() -> str:
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(string_split({_BM25_NORM}, ' '), "
        f"x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score_terms = " + ".join(
        f"(CAST((2 * s.n - 2 * s.df{i} + 1) * d.tf{i} * 22 * s.sum_dl "
        f"AS DOUBLE) / ((2 * s.df{i} + 1) * (10 * s.sum_dl * d.tf{i} "
        f"+ 3 * s.sum_dl + 9 * d.dl * s.n)))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split({_BM25_NORM}, ' ')) AS BIGINT) AS dl,
         {tf_cols}
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM toks
)
SELECT d.doc_id, d.dl, {score_terms} AS bm25,
       CAST(ROW_NUMBER() OVER (ORDER BY ({score_terms}) DESC, d.doc_id)
            AS BIGINT) AS rank
FROM toks d CROSS JOIN stats s
WHERE d.tf0 + d.tf1 + d.tf2 > 0
ORDER BY rank
LIMIT 20
"""


@register(
    "bm25_topk",
    _bm25_oracle(),
    "BM25 top-20 retrieval over the document corpus for a fixed "
    "3-term query (k1=1.2, b=0.75), with the Robertson-Sparck-Jones "
    "odds idf kept LOG-FREE so each per-term score is one double "
    "divide of two exact integer products (corpus stats N / sum_dl / "
    "df as a 1-row broadcast; engine ln()s are not bit-portable and "
    "the log is monotone per term — this exact variant IS the "
    "contract). Map-only scoring + a global top-k sort-limit: the "
    "retrieval primitive for corpus curation next to tfidf_top_terms, "
    "at 100 TB a broadcast of three scalars and one scan.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        T.ws_tokens("text").alias("__toks"),
    ).select(
        "doc_id",
        F.size("__toks").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("__toks", lambda x: x == F.lit(t)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        term = (
            (
                (2 * F.col("n") - 2 * F.col(f"df{i}") + 1)
                * F.col(f"tf{i}")
                * 22
                * F.col("sum_dl")
            ).cast("double")
            / (
                (2 * F.col(f"df{i}") + 1)
                * (
                    10 * F.col("sum_dl") * F.col(f"tf{i}")
                    + 3 * F.col("sum_dl")
                    + 9 * F.col("dl") * F.col("n")
                )
            )
        )
        score = term if score is None else score + term
    scored = (
        toks.crossJoin(F.broadcast(stats))
        .filter(sum(F.col(f"tf{i}") for i in range(len(_BM25_TERMS))) > 0)
        .select("doc_id", "dl", score.alias("bm25"))
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.select(
            "doc_id", "dl", "bm25",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= 20)
    )


# ----------------------------------------------------------------------------
# IR evaluation: precision/recall/MRR/NDCG of the ANN ranking vs labels
# ----------------------------------------------------------------------------

_IR_K = 10
# NDCG discount gains 1/log2(i+1) pre-scaled to INTEGER MICROS in
# Python and injected into BOTH engines as identical literals: DCG
# becomes an exact integer sum (order-free, engine-free) and the only
# float op left is the final dcg/idcg divide.  (Engine log2()s are not
# bit-portable; positions are fixed 1..k, so the constants are data-
# independent.)
import math as _math  # noqa: E402

_IR_GAINS = [int(1_000_000 / _math.log2(i + 1)) for i in range(1, _IR_K + 1)]
_IR_IDCG_PREFIX = [sum(_IR_GAINS[: i + 1]) for i in range(_IR_K)]


def _ir_oracle() -> str:
    gains_case = " ".join(
        f"WHEN rank = {i + 1} THEN {g}" for i, g in enumerate(_IR_GAINS)
    )
    idcg_list = ", ".join(str(x) for x in _IR_IDCG_PREFIX)
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
      FROM e WHERE vec_id < 8),
nrel AS (
  SELECT q.query_id,
         CAST(COUNT(*) FILTER (WHERE e.label = q.qlabel) AS BIGINT) AS n_rel
  FROM q JOIN e ON e.vec_id != q.query_id
  GROUP BY q.query_id
),
ranked AS (
  SELECT query_id, cand_id, rel, rank FROM (
    SELECT q.query_id, e.vec_id AS cand_id,
           CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(qv, v)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(v, v))) DESC, e.vec_id
           ) AS rank
    FROM e JOIN q ON e.vec_id != q.query_id
  ) t WHERE rank <= {_IR_K}
),
agg AS (
  SELECT query_id,
         CAST(SUM(rel) AS BIGINT) AS hits_at_k,
         MIN(CASE WHEN rel = 1 THEN rank END) AS first_hit,
         CAST(SUM(CASE WHEN rel = 1 THEN (CASE {gains_case} END)
                       ELSE 0 END) AS BIGINT) AS dcg_micros
  FROM ranked GROUP BY query_id
)
SELECT a.query_id, n.n_rel, a.hits_at_k,
       CAST(a.hits_at_k AS DOUBLE) / {_IR_K} AS precision_at_k,
       CASE WHEN n.n_rel = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(a.hits_at_k AS DOUBLE) / n.n_rel END AS recall_at_k,
       CASE WHEN a.first_hit IS NULL THEN CAST(0 AS DOUBLE)
            ELSE CAST(1 AS DOUBLE) / a.first_hit END AS rr,
       a.dcg_micros,
       CASE WHEN n.n_rel = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(a.dcg_micros AS DOUBLE)
                 / ([{idcg_list}][CAST(LEAST(n.n_rel, {_IR_K}) AS INTEGER)])
       END AS ndcg_at_k
FROM agg a JOIN nrel n USING (query_id)
"""


@register(
    "ir_eval_ann",
    _ir_oracle(),
    "Retrieval-quality scorecard for the exact cosine ranking against "
    "label ground truth, per query (vec_id < 8, k=10): precision@k, "
    "recall@k, reciprocal rank, and NDCG@k with the log2 discount "
    "gains PRE-SCALED to integer micros in Python and injected as "
    "literals — DCG/IDCG are exact integer sums, so the whole "
    "scorecard is engine- and partitioning-invariant with one double "
    "divide per emitted metric. The measurement layer every ANN "
    "variant (LSH/IVF/PQ) plugs into: swap the ranking, keep the "
    "oracle-checked metrics.",
)
def ir_eval_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import similarity as S

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    ranked = S.ann_topk_bruteforce(emb, queries, k=_IR_K)
    labels = emb.select("vec_id", "label")
    qlab = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    rel = (
        ranked.join(
            F.broadcast(labels.withColumnRenamed("vec_id", "cand_id")),
            "cand_id",
        )
        .join(F.broadcast(qlab), "query_id")
        .select(
            "query_id",
            "rank",
            F.when(F.col("label") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    gains = F.array(*[F.lit(g) for g in _IR_GAINS])
    agg = rel.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("hits_at_k"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_hit"),
        F.sum(
            F.when(
                F.col("rel") == 1, F.element_at(gains, F.col("rank"))
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("dcg_micros"),
    )
    nrel = (
        qlab.join(
            F.broadcast(labels), F.col("vec_id") != F.col("query_id")
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rel")
        )
    )
    idcg_prefix = F.array(*[F.lit(x) for x in _IR_IDCG_PREFIX])
    m = F.least(F.col("n_rel"), F.lit(_IR_K)).cast("int")
    idcg = F.when(m > 0, F.element_at(idcg_prefix, m))
    return agg.join(nrel, "query_id").select(
        "query_id",
        "n_rel",
        "hits_at_k",
        (F.col("hits_at_k").cast("double") / _IR_K).alias("precision_at_k"),
        F.when(F.col("n_rel") == 0, F.lit(0.0))
        .otherwise(F.col("hits_at_k").cast("double") / F.col("n_rel"))
        .alias("recall_at_k"),
        F.when(F.col("first_hit").isNull(), F.lit(0.0))
        .otherwise(F.lit(1.0).cast("double") / F.col("first_hit"))
        .alias("rr"),
        "dcg_micros",
        F.when(F.col("n_rel") == 0, F.lit(0.0))
        .otherwise(F.col("dcg_micros").cast("double") / idcg)
        .alias("ndcg_at_k"),
    )


# ----------------------------------------------------------------------------
# Poisson rate anomaly (exact integer inequality, no sqrt)
# ----------------------------------------------------------------------------

_POISSON_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d,
         CAST(SUM(n_events) AS BIGINT) AS t
  FROM daily
)
SELECT day, n_events,
       (CAST(d * n_events - t AS DOUBLE) * CAST(d * n_events - t AS DOUBLE))
         / (d * t) AS z2,
       CASE WHEN (CAST(d * n_events - t AS DOUBLE)
                  * CAST(d * n_events - t AS DOUBLE)) > 9 * (d * t)
            THEN 1 ELSE 0 END AS is_anomaly
FROM daily CROSS JOIN tot
ORDER BY ABS(d * n_events - t) DESC, day
LIMIT 10
"""


@register(
    "poisson_rate_anomaly",
    _POISSON_ORACLE,
    "Ten most rate-deviant days against the 3-sigma Poisson band "
    "around the global daily rate, WITHOUT sqrt or a float mean: the "
    "test (n_d - T/D)^2 > 9*T/D is cross-multiplied to the exact-"
    "integer deviation D*n_d - T, squared as one deterministic double "
    "product, against the integer threshold 9*D*T (is_anomaly flag); "
    "ranking by the exact |integer deviation| keeps the top-10 "
    "engine-stable even when nothing crosses the band. The "
    "statistically grounded form of dq_volume_anomaly's threshold "
    "check; one tiny calendar-domain aggregate + a broadcast scalar.",
)
def poisson_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("n_events").cast("bigint").alias("t"),
    )
    idiff = F.col("d") * F.col("n_events") - F.col("t")
    diff = idiff.cast("double")
    z2 = (diff * diff) / (F.col("d") * F.col("t"))
    return (
        daily.crossJoin(F.broadcast(tot))
        .orderBy(F.abs(idiff).desc(), F.col("day"))
        .limit(10)
        .select(
            "day",
            "n_events",
            z2.alias("z2"),
            F.when(
                (diff * diff) > 9 * (F.col("d") * F.col("t")), 1
            )
            .otherwise(0)
            .alias("is_anomaly"),
        )
    )


# ----------------------------------------------------------------------------
# Winsorized / trimmed mean (robust location via selection-rank fences)
# ----------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
stats AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total,
         CAST(COUNT(*) // 20 AS BIGINT) AS k
  FROM o GROUP BY priority
),
ranked AS (
  SELECT priority, cents,
         ROW_NUMBER() OVER (
           PARTITION BY priority ORDER BY cents, o_orderkey
         ) AS rn
  FROM o
),
fences AS (
  SELECT r.priority,
         CAST(MAX(CASE WHEN rn = s.k + 1 THEN cents END) AS BIGINT) AS lo,
         CAST(MAX(CASE WHEN rn = s.n - s.k THEN cents END) AS BIGINT) AS hi
  FROM ranked r JOIN stats s USING (priority)
  GROUP BY r.priority
),
p2 AS (
  SELECT o.priority,
         CAST(SUM(LEAST(GREATEST(cents, lo), hi)) AS BIGINT) AS w_sum,
         CAST(SUM(CASE WHEN cents < lo THEN cents ELSE 0 END) AS BIGINT)
           AS sum_below,
         CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_below,
         CAST(SUM(CASE WHEN cents > hi THEN cents ELSE 0 END) AS BIGINT)
           AS sum_above,
         CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_above
  FROM o JOIN fences USING (priority)
  GROUP BY o.priority
)
SELECT s.priority, s.n, s.k,
       CAST(f.lo AS DOUBLE) / 100 AS fence_lo,
       CAST(f.hi AS DOUBLE) / 100 AS fence_hi,
       CAST(p2.w_sum AS DOUBLE) / (s.n * 100) AS winsorized_mean,
       CAST(s.total - p2.sum_below - (s.k - p2.cnt_below) * f.lo
            - p2.sum_above - (s.k - p2.cnt_above) * f.hi AS DOUBLE)
         / ((s.n - 2 * s.k) * 100) AS trimmed_mean
FROM stats s JOIN fences f USING (priority) JOIN p2 USING (priority)
"""


@register(
    "winsorized_stats",
    _WINSOR_ORACLE,
    "5% winsorized AND trimmed mean of order value per priority: fence "
    "values come from TWO order statistics per group via "
    "select_group_ranks (only buckets containing rank k+1 or n-k are "
    "sorted — nothing persisted, task input bounded by bucket width at "
    "any scale), then one clamp-sum pass. The trimmed sum avoids "
    "ranking every row: total minus the strictly-outside mass minus "
    "the tie-filling fence copies — exact integer cents throughout, "
    "two divides at the end. The robust-location complement to "
    "mad_order_values/iqr_outlier_fences.",
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.ranking import (
        select_group_ranks,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )

    def _fence_ranks(n: int) -> set[int]:
        k = n // 20
        return {k + 1, n - k}

    sel = select_group_ranks(
        o,
        ["priority"],
        [F.col("cents"), F.col("o_orderkey")],
        bucket_key=F.col("cents"),
        ranks_fn=_fence_ranks,
        n_col="gn",
    ).select("priority", "cents", "rn", "gn")
    k_of = (F.col("gn") / 20).cast("bigint")
    fences = sel.groupBy("priority").agg(
        F.max(
            F.when(F.col("rn") == k_of + 1, F.col("cents"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.col("gn") - k_of, F.col("cents"))
        ).alias("hi"),
        F.max("gn").cast("bigint").alias("n"),
    ).withColumn("k", (F.col("n") / 20).cast("bigint"))
    p2 = (
        o.join(F.broadcast(fences), "priority")
        .groupBy("priority")
        .agg(
            F.max("n").alias("n"),
            F.max("k").alias("k"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.sum("cents").cast("bigint").alias("total"),
            F.sum(F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")))
            .cast("bigint")
            .alias("w_sum"),
            F.sum(F.when(F.col("cents") < F.col("lo"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("sum_below"),
            F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_below"),
            F.sum(F.when(F.col("cents") > F.col("hi"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("sum_above"),
            F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_above"),
        )
    )
    trimmed_num = (
        F.col("total")
        - F.col("sum_below")
        - (F.col("k") - F.col("cnt_below")) * F.col("lo")
        - F.col("sum_above")
        - (F.col("k") - F.col("cnt_above")) * F.col("hi")
    )
    return p2.select(
        "priority",
        "n",
        "k",
        (F.col("lo").cast("double") / 100).alias("fence_lo"),
        (F.col("hi").cast("double") / 100).alias("fence_hi"),
        (F.col("w_sum").cast("double") / (F.col("n") * 100)).alias(
            "winsorized_mean"
        ),
        (
            trimmed_num.cast("double")
            / ((F.col("n") - 2 * F.col("k")) * 100)
        ).alias("trimmed_mean"),
    )


# ----------------------------------------------------------------------------
# Holt linear (double-exponential) forecast as an integer recurrence
# ----------------------------------------------------------------------------

_HOLT_HORIZONS = (1, 7, 28)

_HOLT_ORACLE = f"""
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
final AS (
  SELECT l, b, CAST(rn AS BIGINT) AS n_days
  FROM rec ORDER BY rn DESC LIMIT 1
),
horizons AS (SELECT unnest({list(_HOLT_HORIZONS)}) AS horizon_days)
SELECT horizon_days, n_days,
       l / 100.0 AS level,
       b / 100.0 AS trend,
       (l + horizon_days * b) / 100.0 AS forecast
FROM horizons, final
ORDER BY horizon_days
"""


@register(
    "holt_linear_forecast",
    _HOLT_ORACLE,
    "Holt double-exponential (level + trend) forecast of daily revenue "
    "at 1/7/28-day horizons, alpha = beta = 1/2 — the upgrade over "
    "seasonal_naive_forecast when the series trends. Defined as the "
    "INTEGER recurrence l_t = (x_t + l + b) div 2, b_t = (l_t - l + b) "
    "div 2 on exact cents (truncating integer division agrees between "
    "Spark's div and DuckDB's // for BOTH signs — the trend term goes "
    "negative on downswings), so the state replays bit-identically on "
    "any engine; doubles appear only in the final single divides. "
    "Scale: orders collapse map-side to per-day cent sums, so the "
    "ordered fold runs over a calendar-bounded array (Spark: one "
    "aggregate() left fold; oracle: recursive CTE replay, the EWMA "
    "pattern).",
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("xs")
    )
    state = packed.select(
        F.size("xs").cast("bigint").alias("n_days"),
        F.expr(
            "aggregate(xs,"
            " named_struct('l', CAST(NULL AS BIGINT),"
            "              'b', CAST(NULL AS BIGINT)),"
            " (acc, x) -> IF(acc.l IS NULL,"
            "   named_struct('l', x.cents, 'b', 0L),"
            "   named_struct("
            "     'l', (x.cents + acc.l + acc.b) div 2,"
            "     'b', (((x.cents + acc.l + acc.b) div 2)"
            "           - acc.l + acc.b) div 2)),"
            " acc -> acc)"
        ).alias("st"),
    )
    horizons = F.array(*[F.lit(h) for h in _HOLT_HORIZONS])
    return (
        state.select(
            F.explode(horizons).alias("horizon_days"), "n_days", "st"
        )
        .select(
            "horizon_days",
            "n_days",
            (F.col("st.l") / F.lit(100.0)).alias("level"),
            (F.col("st.b") / F.lit(100.0)).alias("trend"),
            (
                (F.col("st.l") + F.col("horizon_days") * F.col("st.b"))
                / F.lit(100.0)
            ).alias("forecast"),
        )
        .orderBy("horizon_days")
    )
