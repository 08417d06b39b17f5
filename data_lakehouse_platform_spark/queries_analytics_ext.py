"""Analytics extensions: IVF ANN (the second approximate-search scale
route next to LSH), the TPC-H Q20 nested-qualification shape, portable
exact percentiles, CUBE grouping sets, and INTERSECT/EXCEPT set-op
cohort queries.

Same contract as queries.py: every builder has a DuckDB oracle twin,
money through fixed-point helpers, deterministic tie-breaking on every
ranked or argmax decision so both engines branch identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.functions.money import dec_sum, sql_sum
from data_lakehouse_platform_spark.operators import similarity as S
from data_lakehouse_platform_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# IVF ANN: nearest-centroid cells + multi-probe search
# ----------------------------------------------------------------------------

_IVF_CENTROID_BASE = 200
_IVF_CELLS = 16
_IVF_NPROBE = 4
_IVF_K = 10

_IVF_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

_ANN_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
piv AS (
  SELECT CAST(vec_id - {_IVF_CENTROID_BASE} AS INT) AS cid, v AS cv
  FROM e WHERE vec_id BETWEEN {_IVF_CENTROID_BASE} AND {_IVF_CENTROID_BASE + _IVF_CELLS - 1}
),
assign AS (
  SELECT vec_id, v, cid,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
      {_IVF_COS.format(a="v", b="cv")} DESC, cid) AS rn
  FROM e CROSS JOIN piv
),
cell AS (SELECT vec_id, v, cid FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
qassign AS (
  SELECT query_id, qv, cid,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
      {_IVF_COS.format(a="qv", b="cv")} DESC, cid) AS rn
  FROM q CROSS JOIN piv
),
probe AS (SELECT query_id, qv, cid FROM qassign WHERE rn <= {_IVF_NPROBE}),
scored AS (
  SELECT query_id, c.vec_id AS cand_id,
    {_IVF_COS.format(a="qv", b="c.v")} AS cosine
  FROM cell c JOIN probe p ON c.cid = p.cid AND c.vec_id != p.query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id
  ) AS rank
  FROM scored
) t
WHERE rank <= {_IVF_K}
"""


@register(
    "ann_ivf_topk",
    _ANN_IVF_ORACLE,
    "IVF approximate top-k: 16 deterministic coarse centroids (fixed "
    "corpus rows standing in for offline k-means output), cell "
    "assignment as a literal-array codegen map pass (argmax cosine, "
    "ties to lowest cell id), queries probe their 4 nearest cells. "
    "Candidates per query ~ nprobe/cells of the corpus; the corpus "
    "never shuffles before the final width-k window. The second scale "
    "route next to ann_lsh_topk (SURVEY §2 #31).",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    # Bounded metadata fetch (16 rows) — centroids become literal arrays.
    rows = (
        emb.filter(
            F.col("vec_id").between(_IVF_CENTROID_BASE, _IVF_CENTROID_BASE + _IVF_CELLS - 1)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = [
        (int(r.vec_id) - _IVF_CENTROID_BASE, [float(x) for x in r.embedding]) for r in rows
    ]
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ann_topk_ivf(
        emb, queries, centroids, k=_IVF_K, nprobe=_IVF_NPROBE
    ).select("query_id", "cand_id", "cosine", "rank")


# ----------------------------------------------------------------------------
# Q20 shape: nested qualification (suppliers with excess class shipments)
# ----------------------------------------------------------------------------

_Q20_QTY = 50

_Q20_ORACLE = f"""
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING {sql_sum('l_quantity')} > {_Q20_QTY}
)
"""


@register(
    "q20_promotion_suppliers",
    _Q20_ORACLE,
    "Promotion-capable suppliers (TPC-H Q20 shape; shipped volume "
    "replaces the missing partsupp availability): the nested IN becomes "
    "a grouped HAVING per (supplier, part) — partial agg shrinks the "
    "shuffle to one row per pair — then a LEFT SEMI join into supplier "
    "(never widening rows) and a broadcast nation attach. Part-name and "
    "year filters prune before the shuffle; quantity threshold is an "
    "exact fixed-point sum.",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(dec_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > _Q20_QTY)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# ----------------------------------------------------------------------------
# Exact portable percentiles (ordered-set aggregate without engine quirks)
# ----------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH j AS (
  SELECT c_mktsegment AS segment, o_totalprice, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT segment, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY segment ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY segment) AS n
  FROM j
)
SELECT segment,
  MAX(CASE WHEN rn = CAST(CEIL(0.5  * n) AS BIGINT) THEN o_totalprice END) AS p50,
  MAX(CASE WHEN rn = CAST(CEIL(0.9  * n) AS BIGINT) THEN o_totalprice END) AS p90,
  MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN o_totalprice END) AS p99,
  MAX(CASE WHEN rn = n THEN o_totalprice END) AS p100,
  MAX(n) AS n_orders
FROM r GROUP BY segment
"""


@register(
    "quantile_order_values",
    _QUANT_ORACLE,
    "Exact discrete percentiles per segment, implemented portably: "
    "rank + count windows pick the ceil(p*n)-th actual value (unique "
    "orderkey tiebreaker), so no engine-specific interpolation rule is "
    "involved — percentile_cont/percentile disagree across engines at "
    "the ulp, discrete selection cannot. Ranks come from the bucketed "
    "grouped rank (operators/ranking.py): windows run per (segment, "
    "value-bucket) so no task ever sorts a whole segment (~20%% of the "
    "fact table) — the exact-quantile shape that survives 100x scale.",
)
def quantile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.ranking import with_grouped_rank

    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice", "o_orderkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_totalprice", "o_orderkey"
    )
    r = with_grouped_rank(
        j,
        ["segment"],
        [F.col("o_totalprice"), F.col("o_orderkey")],
        bucket_key=F.col("o_totalprice"),
        rn_col="rn",
        n_col="n",
    )

    def pick(p: float, alias: str) -> F.Column:
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        ).alias(alias)

    return r.groupBy("segment").agg(
        pick(0.5, "p50"),
        pick(0.9, "p90"),
        pick(0.99, "p99"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("o_totalprice"))).alias("p100"),
        F.max("n").alias("n_orders"),
    )


# ----------------------------------------------------------------------------
# CUBE grouping sets
# ----------------------------------------------------------------------------

_CUBE_ORACLE = f"""
SELECT
  COALESCE(segment, 'ALL') AS segment,
  COALESCE(o_year, -1) AS o_year,
  {sql_sum('o_totalprice')} AS revenue,
  COUNT(*) AS n_orders
FROM (
  SELECT c_mktsegment AS segment, YEAR(o_orderdate) AS o_year, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
) j
GROUP BY CUBE (segment, o_year)
"""


@register(
    "cube_sales",
    _CUBE_ORACLE,
    "Full CUBE over (segment, year): all four grouping sets in ONE "
    "shuffle (Spark expands the sets map-side and aggregates once), vs "
    "four separate scans if written naively. Complements rollup_sales "
    "(hierarchical) with the cross-product lattice; sentinel values "
    "stand in for grouping nulls so the hash compare is unambiguous.",
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.year("o_orderdate").alias("o_year"),
        "o_totalprice",
    )
    return (
        j.cube("segment", "o_year")
        .agg(dec_sum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("segment", F.lit("ALL")).alias("segment"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "revenue",
            "n_orders",
        )
    )


# ----------------------------------------------------------------------------
# Set-op cohorts: EXCEPT (churn) / INTERSECT (retention)
# ----------------------------------------------------------------------------

_CHURN_ORACLE = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996),
     y00 AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 2000)
SELECT c_mktsegment, COUNT(*) AS churned_customers
FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y00) ch
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register(
    "except_churned_buyers",
    _CHURN_ORACLE,
    "Churn cohort via EXCEPT: distinct 1996 buyers minus distinct 2000 "
    "buyers. Each side's year filter pushes to the scan and the "
    "distinct shrinks to one row per customer before the set op — "
    "Spark plans EXCEPT DISTINCT as a left-anti over pre-deduped "
    "sides, shuffled on the single key column. Segment rollup attaches "
    "by broadcast.",
)
def except_churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    y00 = orders.filter(F.year("o_orderdate") == 2000).select("o_custkey").distinct()
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        y96.subtract(y00)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("churned_customers"))
    )


_RETAIN_ORACLE = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996),
     y00 AS (SELECT DISTINCT o_custkey FROM orders WHERE YEAR(o_orderdate) = 2000)
SELECT c_mktsegment, COUNT(*) AS retained_customers
FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y00) rt
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register(
    "intersect_retained_buyers",
    _RETAIN_ORACLE,
    "Retention cohort via INTERSECT: customers active in both 1996 and "
    "2000. Same pre-deduped narrow-key posture as the EXCEPT twin — "
    "Spark plans INTERSECT DISTINCT as a left-semi over distinct "
    "sides; both shuffles carry only the 8-byte key.",
)
def intersect_retained_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    y00 = orders.filter(F.year("o_orderdate") == 2000).select("o_custkey").distinct()
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        y96.intersect(y00)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("retained_customers"))
    )


# ----------------------------------------------------------------------------
# FULL OUTER reconciliation (presence-matrix of two grouped sides)
# ----------------------------------------------------------------------------

_RECON_ORACLE = """
WITH y96 AS (
  SELECT o_custkey, COUNT(*) AS n_1996 FROM orders
  WHERE YEAR(o_orderdate) = 1996 GROUP BY o_custkey
),
y00 AS (
  SELECT o_custkey, COUNT(*) AS n_2000 FROM orders
  WHERE YEAR(o_orderdate) = 2000 GROUP BY o_custkey
)
SELECT
  COALESCE(y96.o_custkey, y00.o_custkey) AS custkey,
  COALESCE(n_1996, 0) AS n_1996,
  COALESCE(n_2000, 0) AS n_2000,
  CASE
    WHEN y96.o_custkey IS NULL THEN 'only_2000'
    WHEN y00.o_custkey IS NULL THEN 'only_1996'
    ELSE 'both'
  END AS presence
FROM y96 FULL OUTER JOIN y00 ON y96.o_custkey = y00.o_custkey
"""


@register(
    "full_outer_reconcile",
    _RECON_ORACLE,
    "FULL OUTER reconciliation of two grouped periods — the audit "
    "shape for comparing two pipeline runs / two snapshots (which keys "
    "appear in one side only, which drifted). Both sides pre-aggregate "
    "to one row per key before the join, so the full-outer shuffles "
    "only (key, count) pairs; presence classification is pure codegen.",
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    y96 = (
        orders.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("k96"))
        .agg(F.count(F.lit(1)).alias("n_1996"))
    )
    y00 = (
        orders.filter(F.year("o_orderdate") == 2000)
        .groupBy(F.col("o_custkey").alias("k00"))
        .agg(F.count(F.lit(1)).alias("n_2000"))
    )
    j = y96.join(y00, y96.k96 == y00.k00, "full_outer")
    return j.select(
        F.coalesce("k96", "k00").alias("custkey"),
        F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
        F.coalesce("n_2000", F.lit(0)).alias("n_2000"),
        F.when(F.col("k96").isNull(), "only_2000")
        .when(F.col("k00").isNull(), "only_1996")
        .otherwise("both")
        .alias("presence"),
    )


# ----------------------------------------------------------------------------
# first_value / last_value full-frame windows
# ----------------------------------------------------------------------------

_FIRST_LAST_ORACLE = """
SELECT DISTINCT o_custkey,
  FIRST_VALUE(o_totalprice) OVER w AS first_price,
  LAST_VALUE(o_totalprice) OVER w AS last_price,
  FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
  LAST_VALUE(o_orderkey) OVER w AS last_orderkey
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@register(
    "window_first_last",
    _FIRST_LAST_ORACLE,
    "First/last order per customer via full-frame first_value/"
    "last_value windows (unique orderkey tiebreaker makes the frame "
    "edges deterministic) — the SCD2 'earliest/current version' "
    "selection shape (gold_dim_products.py picks current rows per "
    "key). One shuffle on the customer key; DISTINCT collapses the "
    "per-row window output to one row per customer map-side first.",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
    ).distinct()


# ----------------------------------------------------------------------------
# k-means trainer (IVF centroid training; operators/kmeans.py)
# ----------------------------------------------------------------------------

_KM_K = 8
_KM_DIM = 64
_KM_ROUNDS = 2


def _km_ctes(k: int = _KM_K, rounds: int = _KM_ROUNDS, dim: int = _KM_DIM) -> list[str]:
    """CTE chain unrolling ``rounds`` Lloyd iterations (assign +
    fixed-point mean update each), ending in ``fin`` (per-vector final
    assignment candidates with v, cid, cosine, rn; rn=1 is the chosen
    cell) — the SQL twin of operators/kmeans.lloyd_kmeans's loop,
    shared by the trainer oracle and the semantic-dedup oracle."""
    cos = _IVF_COS.format(a="v", b="cv")
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < {k})",
        f"dims AS (SELECT CAST(unnest(range(1, {dim + 1})) AS INT) AS d)",
    ]
    for r in range(1, rounds + 1):
        ctes += [
            f"""a{r} AS (
  SELECT vec_id, v, cid,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY {cos} DESC, cid) AS rn
  FROM e CROSS JOIN c{r - 1}
)""",
            f"m{r} AS (SELECT vec_id, v, cid FROM a{r} WHERE rn = 1)",
            f"""upd{r} AS (
  SELECT cid, d,
    CAST(SUM(CAST(FLOOR(v[d] * 1000000) AS BIGINT)) AS DOUBLE)
      / (1000000.0 * COUNT(*)) AS x
  FROM m{r} CROSS JOIN dims
  GROUP BY cid, d
)""",
            f"c{r} AS (SELECT cid, list(x ORDER BY d) AS cv FROM upd{r} GROUP BY cid)",
        ]
    ctes.append(
        f"""fin AS (
  SELECT vec_id, v, cid, {cos} AS cosine,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY {cos} DESC, cid) AS rn
  FROM e CROSS JOIN c{rounds}
)"""
    )
    return ctes


_KM_ORACLE = (
    "WITH "
    + ",\n".join(_km_ctes())
    + """
SELECT vec_id, CAST(cid AS INT) AS cell_id, cosine,
       COUNT(*) OVER (PARTITION BY cid) AS cell_size
FROM fin WHERE rn = 1
"""
)


@register(
    "kmeans_cells",
    _KM_ORACLE,
    "Distributed spherical k-means trainer (Lloyd, 2 rounds, 8 cells) "
    "producing the IVF coarse quantizer ann_ivf_topk consumes. Each "
    "round: literal-centroid argmax map pass (no corpus shuffle) + a "
    "k x d-group mean update in FIXED POINT (sum(floor(x*1e6)) over "
    "exact int64) so centroids are bit-identical regardless of "
    "partitioning or aggregation order — the property that makes an "
    "iterative float algorithm oracle-exact. Only k x d mean rows ever "
    "reach the driver.",
)
def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.kmeans import lloyd_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assignments, _ = lloyd_kmeans(emb, k=_KM_K, rounds=_KM_ROUNDS)
    return assignments


# ----------------------------------------------------------------------------
# RANGE-frame window: trailing 7-day spend (value-based frame, peers
# aggregate together — no tiebreaker needed or wanted)
# ----------------------------------------------------------------------------

_TRAIL_SECS = 6 * 86400  # trailing week: today + 6 prior days

_TRAIL_ORACLE = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) OVER (
    PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
    RANGE BETWEEN {_TRAIL_SECS} PRECEDING AND CURRENT ROW
  ) AS DOUBLE) / 1000000 AS trailing_7d_spend
FROM orders
"""


@register(
    "window_trailing_7d",
    _TRAIL_ORACLE,
    "Trailing-7-day spend per customer via a RANGE (value-based) window "
    "frame over epoch seconds — the time-decayed-metric shape rows "
    "frames cannot express (frame width follows the TIMESTAMPS, not row "
    "counts; same-instant peers aggregate together so no tiebreaker "
    "exists to get wrong). One shuffle on the customer key; "
    "decimal-exact money.",
)
def window_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec, undec

    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-_TRAIL_SECS, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        undec(F.sum(dec("o_totalprice")).over(w)).alias("trailing_7d_spend"),
    )


# ----------------------------------------------------------------------------
# Semantic dedup: near-dup embedding pairs restricted to trained cells
# ----------------------------------------------------------------------------

_SEM_TAU = 0.4

_SEM_ORACLE = (
    "WITH "
    + ",\n".join(_km_ctes())
    + f""",
cells AS (SELECT vec_id, v, cid FROM fin WHERE rn = 1),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, CAST(a.cid AS INT) AS cell_id,
    {_IVF_COS.format(a="a.v", b="b.v")} AS cosine
  FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, cell_id, cosine FROM pairs WHERE cosine >= {_SEM_TAU}
"""
)


@register(
    "dedup_semantic",
    _SEM_ORACLE,
    f"Embedding near-dup pairs (cosine >= {_SEM_TAU}) restricted to "
    "k-means cells: the scale path for semantic dedup. Brute force "
    "(embed_neardup_cosine) is O(n^2) over the corpus; here candidates "
    "are generated ONLY within a vector's trained cell, so the shuffle "
    "keys on cell_id and per-cell work is (n/k)^2 — the standard "
    "cluster-then-compare recipe (SemDeDup). Recall trades against k; "
    "the twin brute-force query measures that trade on the same data. "
    "Cells come from the bit-deterministic Lloyd trainer, so both "
    "engines search identical candidate sets.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )
    from data_lakehouse_platform_spark.operators.kmeans import lloyd_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assignments, _ = lloyd_kmeans(emb, k=_KM_K, rounds=_KM_ROUNDS)
    # r10 optimization: per-vector norm hoisted onto the join sides and
    # the threshold applied through the hoisted form — the previous
    # shape evaluated the full 3-HOF cosine in BOTH the pushed-down
    # join-side filter and the project, per candidate pair.  Emitted
    # cosine is bit-identical (same dot, same norm product/division).
    pts = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).select(
        "vec_id", "v", l2_norm("v").alias("nv")
    ).join(assignments.select("vec_id", "cell_id"), "vec_id")
    a = pts.alias("a")
    b = pts.alias("b")
    cos = cosine_with_norms(
        F.col("a.v"), F.col("b.v"), F.col("a.nv"), F.col("b.nv")
    )
    return a.join(
        b,
        (F.col("a.cell_id") == F.col("b.cell_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
        & (cos >= _SEM_TAU),
    ).select(
        F.col("a.vec_id").alias("doc_a"),
        F.col("b.vec_id").alias("doc_b"),
        F.col("a.cell_id").alias("cell_id"),
        cos.alias("cosine"),
    )


# ----------------------------------------------------------------------------
# NTILE decile segmentation (BI bucketing)
# ----------------------------------------------------------------------------

_NTILE_ORACLE = """
WITH spend AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
    CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS DOUBLE)
      / 1000000 AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, n_orders, total_spend,
  NTILE(10) OVER (ORDER BY total_spend DESC, o_custkey) AS spend_decile
FROM spend
"""


@register(
    "ntile_customer_deciles",
    _NTILE_ORACLE,
    "Customer spend deciles: grouped decimal-exact spend, then "
    "NTILE(10) with a unique key tiebreaker so both engines cut "
    "identical bucket boundaries. The segmentation primitive behind "
    "'top-10%% customers' BI slices. The decile cut runs on the "
    "distributed two-pass rank (operators/ranking.py) — bucketed "
    "partitioned windows + broadcast offsets — so no single task ever "
    "sees the whole customer table (10^9 rows at 100 TB).",
)
def ntile_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from data_lakehouse_platform_spark.catalog import (
        input_scaled_partitions,
    )
    from data_lakehouse_platform_spark.functions.money import dec, undec
    from data_lakehouse_platform_spark.operators.ranking import (
        with_global_ntile,
    )

    spend = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            undec(F.sum(dec("o_totalprice"))).alias("total_spend"),
        )
        # the decile cut passes re-read this aggregate 3x (quantile
        # sketch, bucket stats, cut window) — persist the reduction at
        # input-scaled width (r11, guide §5)
        .repartition(input_scaled_partitions(sf_dir, "orders"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # r11 (guide §1.2): NTILE-only consumer — locate the 9 decile cut
    # rows by rank selection and score by comparison, instead of
    # ranking every customer (full-width persist + window + offsets
    # join).  Equivalence proof in with_global_ntile's docstring.
    return with_global_ntile(
        spend,
        [("total_spend", True), ("o_custkey", False)],
        10,
        "spend_decile",
    )


# ----------------------------------------------------------------------------
# Arbitrary GROUPING SETS (beyond ROLLUP/CUBE's fixed lattices)
# ----------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS DOUBLE)
    / 1000000 AS total_spend,
  GROUPING(o_orderstatus) AS g_status,
  GROUPING(o_orderpriority) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@register(
    "grouping_sets_orders",
    _GSETS_ORACLE,
    "Arbitrary GROUPING SETS — the hand-picked lattice ((status, "
    "priority), (status), ()) that ROLLUP/CUBE cannot express when the "
    "wanted slices aren't a prefix chain or full powerset. Spark 4's "
    "native DataFrame.groupingSets API; GROUPING() flags disambiguate "
    "real NULLs from subtotal rows. Still one shuffle — Spark expands "
    "sets map-side exactly like rollup_sales/cube_sales.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec, undec

    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                [F.col("o_orderstatus"), F.col("o_orderpriority")],
                [F.col("o_orderstatus")],
                [],
            ],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            undec(F.sum(dec("o_totalprice"))).alias("total_spend"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        )
    )


# ----------------------------------------------------------------------------
# Robust stats: exact median absolute deviation per segment
# ----------------------------------------------------------------------------

_MAD_ORACLE = """
WITH j AS (
  SELECT c_mktsegment AS segment, o_totalprice, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r1 AS (
  SELECT segment, o_totalprice, o_orderkey,
    ROW_NUMBER() OVER (PARTITION BY segment ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY segment) AS n
  FROM j
),
med AS (
  SELECT segment,
    MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN o_totalprice END) AS median_price,
    MAX(n) AS n_orders
  FROM r1 GROUP BY segment
),
dev AS (
  SELECT r1.segment, ABS(r1.o_totalprice - med.median_price) AS d, r1.o_orderkey
  FROM r1 JOIN med ON r1.segment = med.segment
),
r2 AS (
  SELECT segment, d,
    ROW_NUMBER() OVER (PARTITION BY segment ORDER BY d, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY segment) AS n
  FROM dev
)
SELECT m.segment, m.median_price, m.n_orders,
  MAX(CASE WHEN r2.rn = CAST(CEIL(0.5 * r2.n) AS BIGINT) THEN r2.d END) AS mad
FROM r2 JOIN med m ON r2.segment = m.segment
GROUP BY m.segment, m.median_price, m.n_orders
"""


@register(
    "mad_order_values",
    _MAD_ORACLE,
    "Robust dispersion per segment: exact discrete median, then exact "
    "median of absolute deviations — two rank-window layers, both with "
    "unique tiebreakers and no interpolation, so the outlier-resistant "
    "alternative to stddev stays engine-portable (same discipline as "
    "quantile_order_values). Two shuffles on the segment key; the "
    "robust-threshold input for price/latency outlier gates.",
)
def mad_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice", "o_orderkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(F.col("c_mktsegment").alias("segment"), "o_totalprice", "o_orderkey")

    def discrete_median(df, val_col, out_name):
        import math

        from data_lakehouse_platform_spark.operators.ranking import (
            select_group_ranks,
        )

        # r10 optimization: the SELECTION twin — only the bucket that
        # contains the median rank is windowed, where the previous form
        # persisted the whole frame and ranked every row (this query
        # ran TWO of those passes; measured 4.4s -> ~2.8s at sf0.1).
        # Median rank ceil(n/2) matches the previous
        # ceil(0.5*n)-selection exactly.
        sel = select_group_ranks(
            df,
            ["segment"],
            [F.col(val_col), F.col("o_orderkey")],
            bucket_key=F.col(val_col),
            ranks_fn=lambda n: [int(math.ceil(0.5 * n))],
            rn_col="__rn",
            n_col="__n",
        )
        return sel.groupBy("segment").agg(
            F.max(
                F.when(
                    F.col("__rn") == F.ceil(0.5 * F.col("__n")).cast("bigint"),
                    F.col(val_col),
                )
            ).alias(out_name),
            F.max("__n").alias(f"__n_{out_name}"),
        )

    med = (
        discrete_median(j, "o_totalprice", "median_price")
        .withColumnRenamed("__n_median_price", "n_orders")
        # r10: truncate the first median's lineage (5 rows) — the
        # deviation pass consumes it in BOTH of its own eager passes
        # (approxQuantile + stats) and would otherwise re-run the whole
        # first selection pipeline each time.
        .localCheckpoint(eager=True)
    )
    dev = j.join(med.select("segment", "median_price"), "segment").select(
        "segment",
        F.abs(F.col("o_totalprice") - F.col("median_price")).alias("d"),
        "o_orderkey",
    )
    mad = discrete_median(dev, "d", "mad").select("segment", "mad")
    return med.join(mad, "segment").select("segment", "median_price", "n_orders", "mad")


# ----------------------------------------------------------------------------
# PQ ANN: product-quantization ADC scan (integer-exact MIPS variant)
# ----------------------------------------------------------------------------

_PQ_SEED_BASE = 300
_PQ_M = 8          # subspaces over the 64-dim embeddings
_PQ_BLK = 8        # dims per subspace
_PQ_CODES = 16     # centroids per subspace codebook
_PQ_K = 10
_PQ_SCALE = 1_000_000

_ANN_PQ_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
blocks AS (SELECT CAST(b AS INT) AS b FROM range({_PQ_M}) t(b)),
cb AS (
  SELECT CAST(vec_id - {_PQ_SEED_BASE} AS INT) AS code, b,
         v[b * {_PQ_BLK} + 1 : b * {_PQ_BLK} + {_PQ_BLK}] AS cvec
  FROM e CROSS JOIN blocks
  WHERE vec_id BETWEEN {_PQ_SEED_BASE} AND {_PQ_SEED_BASE + _PQ_CODES - 1}
),
cbn AS (
  SELECT code, b, cvec, list_dot_product(cvec, cvec) AS cn2 FROM cb
),
xs AS (
  SELECT vec_id, b, v[b * {_PQ_BLK} + 1 : b * {_PQ_BLK} + {_PQ_BLK}] AS xvec
  FROM e CROSS JOIN blocks
),
assign AS (
  SELECT vec_id, b, code,
    ROW_NUMBER() OVER (PARTITION BY vec_id, b ORDER BY
      2 * list_dot_product(xvec, cvec) - cn2 DESC, code) AS rn
  FROM xs JOIN cbn USING (b)
),
codes AS (SELECT vec_id, b, code FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
lut AS (
  SELECT query_id, b, code,
    CAST(FLOOR({_PQ_SCALE} * list_dot_product(
      qv[b * {_PQ_BLK} + 1 : b * {_PQ_BLK} + {_PQ_BLK}], cvec)) AS BIGINT) AS l
  FROM q CROSS JOIN cbn
),
adc AS (
  SELECT l.query_id, c.vec_id AS cand_id, CAST(SUM(l.l) AS BIGINT) AS adc_q6
  FROM codes c
  JOIN lut l ON c.b = l.b AND c.code = l.code AND c.vec_id != l.query_id
  GROUP BY 1, 2
)
SELECT query_id, cand_id, adc_q6, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_q6 DESC, cand_id
  ) AS rank
  FROM adc
) t
WHERE rank <= {_PQ_K}
"""


@register(
    "ann_pq_topk",
    _ANN_PQ_ORACLE,
    "Product-quantization ADC top-k, the third ANN scale route next to "
    "LSH and IVF (SURVEY §2 #31; operators/pq.py trains real fixed-"
    "point Lloyd codebooks — here the codebooks are 16 designated "
    "corpus rows standing in for offline training so the oracle can "
    "derive them too). Encode is one argmin-L2 codegen map pass "
    "(8 codes/vector = 32x compression); each query precomputes an "
    "INTEGER fixed-point LUT (floor(1e6 x block dot)), so the ADC "
    "score is an exact BIGINT sum — order-free, hash-safe — and the "
    "corpus scan is a pure zip_with/aggregate expression over the "
    "codes, never the raw vectors. MIPS objective (raw inner product).",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators import pq as P

    emb = _t(spark, sf_dir, "embeddings")
    # Bounded metadata fetch (16 rows) — seed codebooks become literals.
    rows = (
        emb.filter(
            F.col("vec_id").between(_PQ_SEED_BASE, _PQ_SEED_BASE + _PQ_CODES - 1)
        )
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    codebooks = [
        [
            (
                int(r.vec_id) - _PQ_SEED_BASE,
                [float(x) for x in r.embedding][b * _PQ_BLK : (b + 1) * _PQ_BLK],
            )
            for r in rows
        ]
        for b in range(_PQ_M)
    ]
    encoded = P.pq_encode(emb, codebooks)
    queries = emb.filter(F.col("vec_id") < 5)
    return P.ann_topk_pq_mips(
        encoded, queries, codebooks, k=_PQ_K, scale=_PQ_SCALE
    ).select("query_id", "cand_id", "adc_q6", "rank")
