"""Round-6 registry extensions: entity-resolution pair output, corpus
fingerprint/prefix dedup tiers, a randomness test, embedding-norm
outliers, a matched-basket price index, exact lead-time quartiles, and
governance audits (tokens-per-byte, unit-price dispersion,
k-anonymity).

Registered LAST in ``queries.all_queries()`` — the external driver
grades the first 50 registry keys by registration order, so new
modules only ever append (tests/test_oracle_parity.py pins the set).

Every query keeps the repo's two disciplines: (a) a DuckDB oracle that
is the NAIVE form (quadratic joins, whole-list SQL) so the driver
compare doubles as an equivalence proof for the scale-safe Spark plan,
and (b) cross-engine exactness via the proven tricks (ordered float
folds, single divides of exact integers, selection ranks instead of
interpolated percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.editdist import (
    edit_distance_pairs,
)
from data_lakehouse_platform_spark.queries import _t, register

# ----------------------------------------------------------------------------
# Entity resolution: the PAIRS, not just the counts
# ----------------------------------------------------------------------------

_EDITDIST_PAIRS_ORACLE = """
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a
JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a_key, b_key
"""


@register(
    "editdist_pairs_customers",
    _EDITDIST_PAIRS_ORACLE,
    "Global (unblocked) edit-distance similarity self-join emitting the "
    "matched PAIRS: every customer-name pair at Levenshtein distance "
    "<= 1, via operators.editdist.edit_distance_pairs — deletion-"
    "neighborhood signatures (SymSpell/FastSS), complete at the "
    "threshold, candidates bounded by signature-bucket density. The "
    "oracle is the O(n^2) pairwise join the plan avoids, making the "
    "driver compare the equivalence proof (~1.1M Levenshtein calls at "
    "sf0.01 vs the plan's signature buckets). fuzzy_match_customers "
    "reports blocked pair COUNTS; this emits the resolution pairs a "
    "downstream golden-record merge consumes. Reference analog: exact "
    "xxhash64 identity only (gold_dim_products.py:70-88).",
)
def editdist_pairs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_distance_pairs(
        c, key="c_custkey", text="c_name", threshold=1
    ).select("a_key", "b_key", "dist")


_FINGERPRINT_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         array_to_string(
           list_sort(list_distinct(string_split(text, ' '))), ' '
         ) AS f
  FROM documents
)
SELECT MIN(doc_id) AS rep_doc,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM fp
GROUP BY f
HAVING COUNT(*) > 1
ORDER BY n_docs DESC, rep_doc
"""


@register(
    "dedup_fingerprint",
    _FINGERPRINT_ORACLE,
    "OpenRefine-style FINGERPRINT clustering: canonical key = sorted "
    "distinct whitespace tokens, so token-order and repetition "
    "variants collapse into one group — the classic first pass of "
    "interactive entity resolution, here as one hash aggregation "
    "(shuffle keyed on the fingerprint, no pair materialization at "
    "all; contrast dedup_ngram_jaccard's candidate join). Emits each "
    "multi-member group's representative (min doc_id) and size. "
    "sort_array(array_distinct(split(...))) is expression-level on "
    "both engines, so the group keys agree byte-for-byte.",
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fp = d.select(
        "doc_id",
        F.array_join(
            F.sort_array(F.array_distinct(F.split(F.col("text"), " "))),
            " ",
        ).alias("f"),
    )
    return (
        fp.groupBy("f")
        .agg(
            F.min("doc_id").alias("rep_doc"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
        .select("rep_doc", "n_docs")
        .orderBy(F.desc("n_docs"), "rep_doc")
    )


# ----------------------------------------------------------------------------
# Wald-Wolfowitz runs test (randomness of the daily revenue walk)
# ----------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(SUM(FLOOR(o_totalprice * 100)) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
), diffs AS (
  SELECT day,
         CASE WHEN rev_c > LAG(rev_c) OVER (ORDER BY day)
              THEN 1 ELSE 0 END AS up,
         CASE WHEN LAG(rev_c) OVER (ORDER BY day) IS NULL
              THEN NULL ELSE 1 END AS has_prev
  FROM daily
), runs AS (
  SELECT up,
         CASE WHEN up = LAG(up) OVER (ORDER BY day)
              THEN 0 ELSE 1 END AS boundary
  FROM diffs WHERE has_prev = 1
)
SELECT CAST(COUNT(*) AS BIGINT)            AS n_steps,
       CAST(SUM(up) AS BIGINT)             AS n_up,
       CAST(COUNT(*) - SUM(up) AS BIGINT)  AS n_down,
       CAST(SUM(boundary) AS BIGINT)       AS n_runs
FROM runs
"""


@register(
    "runs_test_daily_revenue",
    _RUNS_ORACLE,
    "Wald-Wolfowitz RUNS TEST statistics over the daily-revenue walk: "
    "each day classifies up (revenue cents strictly above the prior "
    "day) or down, and n_runs counts the maximal same-direction "
    "stretches — the classic nonparametric randomness check (too few "
    "runs = trend, too many = oscillation); the z-score is one "
    "plug-in away and deliberately left to the caller (sqrt is not "
    "cross-engine exact). Daily revenue sums in integer CENTS (the "
    "fixed-point discipline), so every comparison is exact. The "
    "calendar-bounded daily series makes the single-task ordered "
    "window the documented rolling_median_7d posture — thousands of "
    "rows regardless of fact size.",
)
def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100))
        .cast("long")
        .alias("rev_c")
    )
    w = Window.orderBy("day")
    diffs = daily.select(
        "day",
        F.when(F.col("rev_c") > F.lag("rev_c").over(w), 1)
        .otherwise(0)
        .alias("up"),
        F.lag("rev_c").over(w).isNotNull().alias("has_prev"),
    ).where("has_prev")
    runs = diffs.select(
        "up",
        F.when(F.col("up") == F.lag("up").over(w), 0)
        .otherwise(1)
        .alias("boundary"),
    )
    return runs.agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum("up").cast("long").alias("n_up"),
        (F.count(F.lit(1)) - F.sum("up")).cast("long").alias("n_down"),
        F.sum("boundary").cast("long").alias("n_runs"),
    )


# ----------------------------------------------------------------------------
# Embedding-norm outliers (corrupt-vector screen before ANN indexing)
# ----------------------------------------------------------------------------

_NORM_OUTLIER_ORACLE = """
WITH norms AS (
  SELECT vec_id,
         list_reduce(
           list_prepend(
             0.0,
             list_transform(
               embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
             )
           ),
           (a, b) -> a + b
         ) AS norm2
  FROM embeddings
), med AS (
  SELECT norm2 AS med2
  FROM (SELECT norm2,
               ROW_NUMBER() OVER (ORDER BY norm2, vec_id) AS rn,
               COUNT(*) OVER () AS n
        FROM norms)
  WHERE rn = (n + 1) // 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       MIN(med.med2)            AS median_norm2,
       CAST(COUNT(CASE WHEN norms.norm2 > 4.0 * med.med2 THEN 1 END)
            AS BIGINT)          AS n_high,
       CAST(COUNT(CASE WHEN norms.norm2 * 4.0 < med.med2 THEN 1 END)
            AS BIGINT)          AS n_low
FROM norms, med
"""


@register(
    "embedding_norm_outliers",
    _NORM_OUTLIER_ORACLE,
    "Corrupt-vector screen before ANN indexing: squared L2 norm per "
    "embedding as an ORDERED left fold (Spark aggregate() == DuckDB "
    "list_reduce over the same element order -> bit-identical "
    "doubles, the HLL-fold trick), lower median chosen by SELECTION "
    "RANK (row_number at (n+1)/2 with vec_id tiebreak — exact in both "
    "engines, no interpolation), and vectors beyond 2x / below 0.5x "
    "the median norm flagged. A zero-norm or double-scaled vector — "
    "the classic embedding-pipeline corruption — lands in n_low / "
    "n_high. Shuffle: one sort for the rank + scalar broadcast of the "
    "median; never pairs.",
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    norms = e.select(
        "vec_id",
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * "
            "CAST(x AS DOUBLE)), 0.0D, (a, b) -> a + b)"
        ).alias("norm2"),
    )
    w = Window.orderBy("norm2", "vec_id")
    ranked = norms.select(
        "norm2",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.where(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select(F.col("norm2").alias("med2"))
    return norms.crossJoin(F.broadcast(med)).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("med2").alias("median_norm2"),
        F.count(F.when(F.col("norm2") > 4.0 * F.col("med2"), 1))
        .cast("long")
        .alias("n_high"),
        F.count(F.when(F.col("norm2") * 4.0 < F.col("med2"), 1))
        .cast("long")
        .alias("n_low"),
    )


# ----------------------------------------------------------------------------
# Governance ratios
# ----------------------------------------------------------------------------

_TOKENS_PER_BYTE_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
         / SUM(strlen(text)) AS tokens_per_byte
FROM documents
GROUP BY source
ORDER BY source
"""


@register(
    "tokens_per_byte",
    _TOKENS_PER_BYTE_ORACLE,
    "Tokenizer-economics datacard column: whitespace tokens per UTF-8 "
    "byte by source — the storage-cost side of tokenizer_fertility "
    "(which measures subword inflation). One map-side-combinable "
    "aggregation; the ratio is a SINGLE DIVIDE of two exact integer "
    "sums (never a mean of per-doc ratios), so the double is "
    "bit-identical cross-engine.",
)
def tokens_per_byte(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("source", "text")
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.sum(F.octet_length("text").cast("long")).alias("n_bytes"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_bytes",
            (
                F.col("n_tokens").cast("double") / F.col("n_bytes")
            ).alias("tokens_per_byte"),
        )
        .orderBy("source")
    )


_PRICE_DISPERSION_ORACLE = """
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       MIN(l_extendedprice / l_quantity) AS min_unit,
       MAX(l_extendedprice / l_quantity) AS max_unit,
       MAX(l_extendedprice / l_quantity)
         - MIN(l_extendedprice / l_quantity) AS spread
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(*) >= 5
ORDER BY spread DESC, l_partkey
LIMIT 20
"""


@register(
    "unit_price_dispersion",
    _PRICE_DISPERSION_ORACLE,
    "Pricing-consistency screen: per part sold on >= 5 line items, "
    "the spread between the best and worst realized unit price "
    "(extendedprice/quantity), top 20 — the governance question "
    "behind discount-leakage audits. Determinism: the per-row divide "
    "and the min/max/subtract chain are IEEE-identical on identical "
    "inputs (no accumulation ordering anywhere), and the top-k "
    "carries the l_partkey tiebreak. One partial-aggregated shuffle "
    "on l_partkey, then a 20-row limit.",
)
def unit_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(unit).alias("min_unit"),
            F.max(unit).alias("max_unit"),
        )
        .where(F.col("n_lines") >= 5)
        .select(
            "l_partkey",
            "n_lines",
            "min_unit",
            "max_unit",
            (F.col("max_unit") - F.col("min_unit")).alias("spread"),
        )
        .orderBy(F.desc("spread"), "l_partkey")
        .limit(20)
    )


# ----------------------------------------------------------------------------
# Price index (matched-basket Laspeyres, integer-exact)
# ----------------------------------------------------------------------------

_LASPEYRES_ORACLE = """
WITH pm AS (
  SELECT date_trunc('month', o.o_orderdate) AS mon,
         l.l_partkey AS part,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(FLOOR(l.l_extendedprice * 100)) AS BIGINT) AS rev_c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), base AS (
  SELECT part, qty AS q0, rev_c AS rev0_c
  FROM pm WHERE mon = (SELECT MIN(mon) FROM pm)
)
SELECT pm.mon AS mon,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM((pm.rev_c * 1000 * base.q0) // pm.qty) AS BIGINT)
         AS num_microc,
       CAST(SUM(base.rev0_c * 1000) AS BIGINT) AS den_microc,
       CAST(SUM((pm.rev_c * 1000 * base.q0) // pm.qty) AS DOUBLE)
         / SUM(base.rev0_c * 1000) AS laspeyres
FROM pm JOIN base ON pm.part = base.part
GROUP BY pm.mon
ORDER BY mon
"""


@register(
    "laspeyres_price_index",
    _LASPEYRES_ORACLE,
    "Matched-basket LASPEYRES price index per month vs the first month "
    "(base): each part's month-t unit value is priced at the BASE "
    "month's quantity, so the index isolates price movement from "
    "volume mix — the standard CPI construction, restricted to parts "
    "traded in both periods (the practical matched-sample handling). "
    "Exactness: per-part terms are FLOOR((rev_cents * 1000 * q0) / "
    "qty_t) BIGINT divisions (Spark DIV and DuckDB // both truncate "
    "toward zero), summed as integers; the index is one final divide. "
    "Plan: one fact->orders join pre-aggregated to (month, part), a "
    "broadcast-sized base-month basket, one grouped sum — no window, "
    "no pairs.",
)
def laspeyres_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # r10 optimization note: persisting pm (it feeds three lineage
    # branches, so the fact join + groupBy runs three times) was built
    # and value-verified, but MEASURED SLOWER at sf0.1 (1.56s ->
    # 1.9-2.0s at both static and input-scaled cache widths): (month,
    # part) is near-fact-cardinality here, so the cache saves two
    # cheap columnar scans and pays materialization + cache-read
    # stages on ~half-fact-sized data.  Kept the recompute form.
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
    base = (
        pm.join(F.broadcast(base_mon), pm.mon == F.col("m0"))
        .select(
            "part",
            F.col("qty").alias("q0"),
            F.col("rev_c").alias("rev0_c"),
        )
    )
    term = F.expr("rev_c * 1000 * q0 DIV qty")
    return (
        pm.join(F.broadcast(base), "part")
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(term).cast("long").alias("num_microc"),
            F.sum(F.col("rev0_c") * 1000).cast("long").alias("den_microc"),
        )
        .select(
            # DuckDB date_trunc('month', ts) yields DATE (memory:
            # round-4 gotcha) — Spark yields timestamp, so wrap
            F.to_date("mon").alias("mon"),
            "n_parts",
            "num_microc",
            "den_microc",
            (
                F.col("num_microc").cast("double") / F.col("den_microc")
            ).alias("laspeyres"),
        )
        .orderBy("mon")
    )


# ----------------------------------------------------------------------------
# Fulfillment lead time: exact discrete quartiles by priority
# ----------------------------------------------------------------------------

_LEADTIME_ORACLE = """
WITH lag AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate,
                   CAST(l.l_shipdate AS DATE)) AS lead_days,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), ranked AS (
  SELECT priority, lead_days,
         ROW_NUMBER() OVER (
           PARTITION BY priority
           ORDER BY lead_days, l_orderkey, l_linenumber
         ) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM lag
)
SELECT priority,
       CAST(MIN(n) AS BIGINT) AS n_lines,
       CAST(MIN(CASE WHEN rn = (n + 1) // 4 THEN lead_days END)
            AS BIGINT) AS q1_days,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN lead_days END)
            AS BIGINT) AS median_days,
       CAST(MIN(CASE WHEN rn = (3 * (n + 1)) // 4 THEN lead_days END)
            AS BIGINT) AS q3_days
FROM ranked
GROUP BY priority
ORDER BY priority
"""


@register(
    "lead_time_quartiles",
    _LEADTIME_ORACLE,
    "Fulfillment lead time (order date -> line ship date, days) as "
    "EXACT discrete quartiles per order priority — the SLA question "
    "behind sla_attainment, answered distribution-wide. Quartiles are "
    "SELECTION RANKS at (n+1)/4, (n+1)/2, 3(n+1)/4 with a total "
    "(lead, orderkey, linenumber) tiebreak — order statistics both "
    "engines compute identically, never interpolated floats. Five "
    "priority groups, so the per-group sort is a balanced grouped "
    "window.",
)
def lead_time_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("lead_days"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("priority").orderBy(
        "lead_days", "l_orderkey", "l_linenumber"
    )
    ranked = lag.select(
        "priority",
        "lead_days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("priority"))
        .alias("n"),
    )
    pick = lambda expr: F.min(  # noqa: E731
        F.when(expr, F.col("lead_days"))
    ).cast("long")
    return (
        ranked.groupBy("priority")
        .agg(
            F.min("n").cast("long").alias("n_lines"),
            pick(F.col("rn") == F.floor((F.col("n") + 1) / 4)).alias(
                "q1_days"
            ),
            pick(F.col("rn") == F.floor((F.col("n") + 1) / 2)).alias(
                "median_days"
            ),
            pick(
                F.col("rn") == F.floor((3 * (F.col("n") + 1)) / 4)
            ).alias("q3_days"),
        )
        .orderBy("priority")
    )


# ----------------------------------------------------------------------------
# Privacy: k-anonymity audit of a quasi-identifier
# ----------------------------------------------------------------------------

_KANON_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS grp
  FROM customer GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT)  AS n_groups,
       CAST(MIN(grp) AS BIGINT) AS k_anonymity,
       CAST(COUNT(CASE WHEN grp < 5 THEN 1 END) AS BIGINT)
         AS groups_below_5,
       CAST(COALESCE(SUM(CASE WHEN grp < 5 THEN grp END), 0) AS BIGINT)
         AS customers_below_5
FROM g
"""


@register(
    "k_anonymity_audit",
    _KANON_ORACLE,
    "Privacy-release audit: k-anonymity of the (nation, segment) "
    "quasi-identifier — the smallest equivalence class is the k any "
    "release of this projection provides, and the below-threshold "
    "groups/customers are what a suppression pass would have to "
    "generalize (k < 5 is the classic disclosure-risk line). The "
    "governance sibling of pii_scrub: that removes direct "
    "identifiers, this measures re-identification risk of the "
    "remaining quasi-identifiers. One map-combinable groupBy + a "
    "4-scalar fold.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("grp").cast("long").alias("k_anonymity"),
        F.count(F.when(F.col("grp") < 5, 1))
        .cast("long")
        .alias("groups_below_5"),
        F.coalesce(F.sum(F.when(F.col("grp") < 5, F.col("grp"))), F.lit(0))
        .cast("long")
        .alias("customers_below_5"),
    )


# ----------------------------------------------------------------------------
# Prefix-collision dedup (template detection)
# ----------------------------------------------------------------------------

_PREFIX_ORACLE = """
SELECT MIN(doc_id) AS rep_doc,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM (SELECT doc_id, source, substr(text, 1, 100) AS p FROM documents)
GROUP BY p
HAVING COUNT(*) > 1
ORDER BY n_docs DESC, rep_doc
"""


@register(
    "dedup_prefix_collision",
    _PREFIX_ORACLE,
    "Template/boilerplate detection by IDENTICAL 100-char prefix: "
    "documents opening with the same bytes are near-certain template "
    "siblings even when their tails diverge — the cheap complement to "
    "dedup_fingerprint (bag-of-words) and exact_substr_dedup (any-"
    "offset windows): prefix equality needs ONE substring + hash "
    "aggregation, no shingles, no pair join. n_sources reveals "
    "whether a template crossed source boundaries (cross-source "
    "contamination signal). Shuffle keyed on the prefix; group count "
    "bounded by distinct templates.",
)
def dedup_prefix_collision(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return (
        d.select(
            "doc_id", "source", F.substring("text", 1, 100).alias("p")
        )
        .groupBy("p")
        .agg(
            F.min("doc_id").alias("rep_doc"),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .where(F.col("n_docs") > 1)
        .select("rep_doc", "n_docs", "n_sources")
        .orderBy(F.desc("n_docs"), "rep_doc")
    )


# ----------------------------------------------------------------------------
# Supplier dependency risk: top-customer revenue concentration
# ----------------------------------------------------------------------------

_SUPP_CONC_ORACLE = """
WITH sc AS (
  SELECT l.l_suppkey AS suppkey, o.o_custkey AS custkey,
         CAST(SUM(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100))
              AS BIGINT) AS rev_c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), ranked AS (
  SELECT suppkey, custkey, rev_c,
         SUM(rev_c) OVER (PARTITION BY suppkey) AS total_c,
         ROW_NUMBER() OVER (
           PARTITION BY suppkey ORDER BY rev_c DESC, custkey
         ) AS rn,
         COUNT(*) OVER (PARTITION BY suppkey) AS n_customers
  FROM sc
)
SELECT suppkey,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(total_c AS BIGINT) AS total_rev_c,
       custkey AS top_custkey,
       CAST(rev_c AS BIGINT) AS top_rev_c,
       CAST(rev_c AS DOUBLE) / total_c AS top_share
FROM ranked WHERE rn = 1
ORDER BY top_share DESC, suppkey
LIMIT 25
"""


@register(
    "supplier_customer_concentration",
    _SUPP_CONC_ORACLE,
    "Supplier dependency risk: per supplier, the revenue share of its "
    "single largest customer — the concentration question procurement "
    "and credit teams ask (a supplier earning 80% from one buyer is "
    "one churn away from distress); top 25 most-concentrated "
    "suppliers. Exactness: discounted revenue in integer CENTS, the "
    "top customer by (rev DESC, custkey) selection rank, the share "
    "one divide of two exact integers. Plan: fact->orders join "
    "pre-aggregated to (supplier, customer), then one balanced "
    "grouped window over ~customers-per-supplier rows — never the "
    "raw fact through a window.",
)
def supplier_customer_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                )
            )
            .cast("long")
            .alias("rev_c")
        )
    )
    wsupp = Window.partitionBy("suppkey")
    worder = wsupp.orderBy(F.desc("rev_c"), "custkey")
    ranked = sc.select(
        "suppkey",
        "custkey",
        "rev_c",
        F.sum("rev_c").over(wsupp).alias("total_c"),
        F.row_number().over(worder).alias("rn"),
        F.count(F.lit(1)).over(wsupp).alias("n_customers"),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "suppkey",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("total_c").cast("long").alias("total_rev_c"),
            F.col("custkey").alias("top_custkey"),
            F.col("rev_c").cast("long").alias("top_rev_c"),
            (F.col("rev_c").cast("double") / F.col("total_c")).alias(
                "top_share"
            ),
        )
        .orderBy(F.desc("top_share"), "suppkey")
        .limit(25)
    )


# ----------------------------------------------------------------------------
# Embedding per-dimension variance (dead-feature screen, exact moments)
# ----------------------------------------------------------------------------

_DIM_VAR_ORACLE = """
WITH e AS (
  SELECT generate_subscripts(embedding, 1) AS d,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS xm
  FROM embeddings
), m AS (
  SELECT CAST(d - 1 AS INT) AS dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xm) AS BIGINT) AS sum_m,
         CAST(SUM(xm * xm) AS BIGINT) AS sumsq_m2
  FROM e GROUP BY d
)
SELECT dim, n, sum_m, sumsq_m2,
       CAST(n * sumsq_m2 - sum_m * sum_m AS DOUBLE) / (n * n)
         AS var_micro2
FROM m
ORDER BY var_micro2, dim
"""


@register(
    "embedding_dim_variance",
    _DIM_VAR_ORACLE,
    "Per-dimension embedding VARIANCE from exact fixed-point moments "
    "(values floored to integer micros; var = (n*Sxx - Sx^2)/n^2, "
    "cross-multiplied integers, ONE final divide — the corr_qty_price "
    "discipline applied per dimension), ordered ascending so dead / "
    "near-constant dimensions (quantization or projection bugs; "
    "candidates for pruning before PQ) lead the result. Complements "
    "embedding_dim_stats (count/min/max/mean — no spread measure). "
    "posexplode -> d-group partial-combined aggregate: d groups hit "
    "the shuffle, never n x d rows.",
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select("embedding")
    x = e.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim",
        F.floor(F.col("x").cast("double") * 1_000_000)
        .cast("long")
        .alias("xm"),
    )
    m = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").cast("long").alias("sum_m"),
        F.sum(F.col("xm") * F.col("xm")).cast("long").alias("sumsq_m2"),
    )
    return (
        m.select(
            "dim",
            "n",
            "sum_m",
            "sumsq_m2",
            (
                (
                    F.col("n") * F.col("sumsq_m2")
                    - F.col("sum_m") * F.col("sum_m")
                ).cast("double")
                / (F.col("n") * F.col("n"))
            ).alias("var_micro2"),
        )
        .orderBy("var_micro2", "dim")
    )
