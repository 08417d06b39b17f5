"""Extended relational coverage: classic decision-support shapes
(TPC-H Q4/Q7/Q14/Q18/Q19 adapted to the testdata schema) plus the
flagship `curate_corpus` pipeline that composes the LLM text/dedup
operators into one pretraining-curation pass.

Same contract as queries.py: every builder has a DuckDB oracle twin,
aggregates go through fixed-point money helpers, every top-N carries a
unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.functions.money import dec_sum, sql_sum
from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import register
from data_lakehouse_platform_spark.queries_llm import _LANG_MARKERS, _PUNCT, _STOPWORDS


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Q4 shape: EXISTS (semi join) + priority counts
# ----------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register(
    "q4_order_priority",
    _Q4_ORACLE,
    "Order-priority checking (TPC-H Q4 shape): date-range filter pushed to "
    "the scan, correlated EXISTS as a LEFT SEMI join on the order key, "
    "grouped count. The semi join never widens rows — at scale it shuffles "
    "only (orderkey, orderdate) pairs.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ----------------------------------------------------------------------------
# Q7 shape: nation-to-nation volume shipping (two broadcast dim chains)
# ----------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT
  ns.n_name AS supp_nation,
  nc.n_name AS cust_nation,
  YEAR(l_shipdate) AS l_year,
  {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY ns.n_name, nc.n_name, YEAR(l_shipdate)
"""


@register(
    "q7_volume_shipping",
    _Q7_ORACLE,
    "Volume shipping between nation pairs (TPC-H Q7 shape): ONE shuffle "
    "join (lineitem x orders on the order key) — supplier/customer/nation "
    "chains are all broadcast, so the fact table is shuffled exactly once "
    "and the grouped agg runs map-side partial first.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ns = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)  # the one shuffle join
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ----------------------------------------------------------------------------
# Q14 shape: conditional aggregation (promo revenue share)
# ----------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT
  {sql_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
    AS promo_revenue,
  {sql_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
  ({sql_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
    / ({sql_sum('l_extendedprice * (1 - l_discount)')}) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


@register(
    "q14_promo_revenue",
    _Q14_ORACLE,
    "Promotion revenue share (TPC-H Q14 shape): month filter pushed to the "
    "fact scan, part is broadcast, CASE-conditional fixed-point sums — the "
    "share is one double divide of two exact decimals, so it is "
    "partition-order independent.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = joined.agg(
        dec_sum(promo, "promo_revenue"),
        dec_sum(disc_price, "total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
    )


# ----------------------------------------------------------------------------
# Q18 shape: large-volume orders (HAVING over a grouped fact, then enrich)
# ----------------------------------------------------------------------------

_Q18_QTY = 150
_Q18_TOPN = 100

_Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       sum_qty
FROM (
  SELECT l_orderkey, {sql_sum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {sql_sum('l_quantity')} > {_Q18_QTY}
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT {_Q18_TOPN}
"""


@register(
    "q18_large_orders",
    _Q18_ORACLE,
    "Large-volume orders (TPC-H Q18 shape): grouped HAVING on the fact "
    "(map-side partial agg shrinks the shuffle to one row per order), the "
    "survivor set joins orders on the already-shuffled key and broadcast "
    "customer; global top-N with a unique tiebreaker.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > _Q18_QTY)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(_Q18_TOPN)
    )


# ----------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicates (OR-of-ANDs)
# ----------------------------------------------------------------------------

_Q19_PRED_SQL = """(
     (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10  AND l_quantity BETWEEN 1 AND 20)
  OR (p_brand = 'Brand#25' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
  OR (p_brand = 'Brand#5'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
)"""

_Q19_ORACLE = f"""
SELECT
  {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_PRED_SQL}
"""


@register(
    "q19_disjunctive_revenue",
    _Q19_ORACLE,
    "Discounted revenue under OR-of-ANDs predicates (TPC-H Q19 shape): "
    "part is broadcast and the disjunction mixes build-side (brand/size) "
    "and stream-side (quantity) attributes, so it evaluates post-join "
    "inside codegen; single-attribute residuals still push to each scan.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(20, 50) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ----------------------------------------------------------------------------
# Flagship: pretraining-corpus curation (quality x language x dedup in one pass)
# ----------------------------------------------------------------------------

_CURATE_MIN_TOKENS = 10
_CURATE_MIN_QUALITY = 0.3

_CURATE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
    {T.sql_normalize_ws('text')} AS norm,
    len(string_split({T.sql_normalize_ws('text')}, ' ')) AS n_tokens
  FROM documents
),
m AS (
  SELECT doc_id, text, norm, n_tokens,
    length(norm) AS n_chars,
    len(regexp_extract_all(norm, '{_PUNCT}')) AS n_punct,
    len(regexp_extract_all(norm, '{_STOPWORDS}')) AS n_stop,
    len(regexp_extract_all(norm, '{_LANG_MARKERS["en"]}')) AS score_en,
    len(regexp_extract_all(norm, '{_LANG_MARKERS["de"]}')) AS score_de,
    len(regexp_extract_all(norm, '{_LANG_MARKERS["fr"]}')) AS score_fr,
    len(regexp_extract_all(norm, '{_LANG_MARKERS["es"]}')) AS score_es,
    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_doc_id
  FROM base
),
scored AS (
  SELECT doc_id, n_tokens, keep_doc_id,
    CASE
      WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en > 0 THEN 'en'
      WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
      WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
      WHEN score_es > 0 THEN 'es'
      ELSE 'und'
    END AS lang,
    CAST(FLOOR((0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)
        + 0.3 * (1 - CAST(n_punct AS DOUBLE) / n_chars)
        + 0.2 * (LEAST(n_tokens, 200) / 200.0)) * 1000000) AS DOUBLE) / 1000000 AS quality_score
  FROM m
)
SELECT doc_id, lang, n_tokens, quality_score
FROM scored
WHERE doc_id = keep_doc_id
  AND lang != 'und'
  AND n_tokens >= {_CURATE_MIN_TOKENS}
  AND quality_score >= {_CURATE_MIN_QUALITY}
"""


@register(
    "curate_corpus",
    _CURATE_ORACLE,
    "Pretraining-corpus curation in one declarative plan: exact-dedup "
    "keeper selection (min doc per content hash — the only shuffle, keyed "
    "on a 16-byte hash), language gate, quality-score gate, token-length "
    "gate. Composes the text_* and dedup_exact primitives the way a real "
    "100 TB curation pass would: one scan, one narrow shuffle, every "
    "expression codegen'd.",
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalize_ws("text")
    m = docs.select(
        "doc_id",
        F.length(norm).alias("n_chars"),
        F.size(T.ws_tokens("text")).alias("n_tokens"),
        F.regexp_count(norm, F.lit(_PUNCT)).alias("n_punct"),
        F.regexp_count(norm, F.lit(_STOPWORDS)).alias("n_stop"),
        *[
            F.regexp_count(norm, F.lit(pat)).alias(f"score_{lang}")
            for lang, pat in _LANG_MARKERS.items()
        ],
        F.min("doc_id")
        .over(Window.partitionBy(F.md5(F.col("text").cast("binary"))))
        .alias("keep_doc_id"),
    )
    en, de, fr, es = (F.col(f"score_{x}") for x in ("en", "de", "fr", "es"))
    lang = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("und")
    )
    quality = (
        F.floor(
            (
                0.5 * (F.col("n_stop").cast("double") / F.col("n_tokens"))
                + 0.3 * (1 - F.col("n_punct").cast("double") / F.col("n_chars"))
                + 0.2 * (F.least(F.col("n_tokens"), F.lit(200)) / 200.0)
            )
            * 1_000_000
        ).cast("double")
        / 1_000_000
    )
    scored = m.select(
        "doc_id",
        "n_tokens",
        "keep_doc_id",
        lang.alias("lang"),
        quality.alias("quality_score"),
    )
    return scored.filter(
        (F.col("doc_id") == F.col("keep_doc_id"))
        & (F.col("lang") != "und")
        & (F.col("n_tokens") >= _CURATE_MIN_TOKENS)
        & (F.col("quality_score") >= _CURATE_MIN_QUALITY)
    ).select("doc_id", "lang", "n_tokens", "quality_score")
