"""Medallion-pipeline queries: the reference's bronze→silver→gold
capabilities re-expressed as declarative, scale-first Spark plans.

Write-side counterparts (partitioned append, compaction, merge-upsert)
live in sources/writers.py and are exercised by pytest (they mutate
storage, so they are not oracle queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.functions.money import dec_sum, money
from data_lakehouse_platform_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Bronze: incremental watermark load
# ----------------------------------------------------------------------------

_BRONZE_INC_ORACLE = """
SELECT
  o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
  YEAR(o_orderdate)  AS year,
  MONTH(o_orderdate) AS month,
  DAYOFMONTH(o_orderdate)   AS day
FROM orders
WHERE o_orderdate > (SELECT MAX(o_orderdate) - INTERVAL 180 DAY FROM orders)
"""


@register(
    "bronze_incremental_orders",
    _BRONZE_INC_ORACLE,
    "Incremental watermark load: only rows newer than the high-water mark, "
    "enriched with y/m/d partition columns. The watermark is a bounded "
    "1-row action first (a cheap max over the sink's stats), then applied "
    "as a LITERAL filter so it reaches the parquet scan as PushedFilters "
    "and prunes date partitions — at 100 TB only new partitions are read. "
    "Reference: bronze_dimension_fact_load.py:71-92 (same two-step: read "
    "existing max ts, filter source > it).",
)
def bronze_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    hw = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 180 DAYS")).alias("hw")
    ).first()["hw"]
    return (
        orders.filter(F.col("o_orderdate") > F.lit(hw))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            F.dayofmonth("o_orderdate").alias("day"),
        )
    )


# ----------------------------------------------------------------------------
# Silver: cleaning / conforming
# ----------------------------------------------------------------------------

_SILVER_CLEAN_ORACLE = """
SELECT
  doc_id,
  regexp_replace(trim(text), '\\s+', ' ', 'g') AS text_clean,
  length(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS n_chars_clean,
  upper(lang) AS lang,
  CASE WHEN source IN ('src0', 'srcNULL') THEN NULL ELSE source END AS source
FROM documents
"""


@register(
    "silver_clean_documents",
    _SILVER_CLEAN_ORACLE,
    "Silver-layer cleaning: whitespace normalization (regexp_replace), "
    "case conforming, sentinel-to-NULL normalization. Reference: "
    "silver_dimensions.py:52-66 (strip \\r) and :96-108 (null 'null').",
)
def silver_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    clean = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    return docs.select(
        "doc_id",
        clean.alias("text_clean"),
        F.length(clean).alias("n_chars_clean"),
        F.upper("lang").alias("lang"),
        F.when(F.col("source").isin("src0", "srcNULL"), F.lit(None))
        .otherwise(F.col("source"))
        .alias("source"),
    )


# ----------------------------------------------------------------------------
# Gold: SCD Type 2 dimension from a change stream
# ----------------------------------------------------------------------------

_SCD2_ORACLE = """
SELECT
  md5(CAST(user_id AS VARCHAR) || '|' || CAST(epoch_us(ts) AS VARCHAR)) AS state_key,
  user_id,
  event_type AS state,
  ts AS start_ts,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS end_ts,
  CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       THEN TRUE ELSE FALSE END AS is_current
FROM events
"""


@register(
    "scd2_user_state",
    _SCD2_ORACLE,
    "SCD Type 2 effective-dated dimension built from a change log in one "
    "window pass: each change opens a version (start_ts), LEAD() closes "
    "the previous one (end_ts), last version per key is current. The "
    "surrogate key is a deterministic content hash — unlike the "
    "reference's monotonically_increasing_id + max-key offset "
    "(gold_dim_products.py:99-110) it needs no driver round-trip and is "
    "reproducible across retries at 1000-executor scale. Reference: "
    "gold_dim_products.py:66-131 (xxhash64 diff + Delta merge).",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lead_ts = F.lead("ts").over(w)
    return ev.select(
        F.md5(
            F.concat_ws("|", F.col("user_id").cast("string"), F.unix_micros("ts").cast("string"))
        ).alias("state_key"),
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("start_ts"),
        lead_ts.alias("end_ts"),
        lead_ts.isNull().alias("is_current"),
    )


# ----------------------------------------------------------------------------
# SCD2 point-in-time (temporal containment) join
# ----------------------------------------------------------------------------

_PIT_ORACLE = """
WITH dim AS (
  SELECT user_id, event_type AS state, ts AS start_ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS end_ts
  FROM events WHERE event_type <> 'purchase'
),
purch AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       d.state AS state_at_purchase, d.start_ts AS state_since
FROM purch p
LEFT JOIN dim d
  ON p.user_id = d.user_id
 AND d.start_ts <= p.ts
 AND (d.end_ts IS NULL OR p.ts < d.end_ts)
"""


@register(
    "scd2_point_in_time",
    _PIT_ORACLE,
    "Temporal (point-in-time) join: each purchase picks up the SCD2 "
    "state version whose [start_ts, end_ts) interval contains it — "
    "the query every effective-dated dimension exists to answer. "
    "Versions come from the scd2_user_state construction (LEAD-closed "
    "intervals over non-purchase events); the join is an equi-join on "
    "user_id with the containment predicate as a residual, so the "
    "row-multiplication is bounded by versions-per-user, never a "
    "range-join blowup. Zero-width versions (same-timestamp changes) "
    "are excluded by the half-open interval, so every purchase "
    "matches at most one version. Reference analog: gold fact rows "
    "joining is_current dim versions (gold_fact_orders.py:117-124) — "
    "this is the historical generalization the reference can't do.",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # LEAD ordering must match the oracle's (ts, event_id) tiebreak.
    dim = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_id", F.col("event_type").alias("state"), F.col("ts").alias("start_ts"))
        .withColumn("end_ts", F.lead("start_ts").over(Window.partitionBy("user_id").orderBy("start_ts", "event_id")))
        .select(
            F.col("user_id").alias("d_user_id"), "state", "start_ts", "end_ts"
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = purch.join(
        dim,
        (F.col("user_id") == F.col("d_user_id"))
        & (F.col("start_ts") <= F.col("ts"))
        & (F.col("end_ts").isNull() | (F.col("ts") < F.col("end_ts"))),
        "left",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("state").alias("state_at_purchase"),
        F.col("start_ts").alias("state_since"),
    )


# ----------------------------------------------------------------------------
# Gold: star-schema fact build
# ----------------------------------------------------------------------------

_FACT_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  YEAR(o_orderdate)  AS year,
  MONTH(o_orderdate) AS month,
  o_custkey          AS customer_key,
  n_name             AS customer_nation,
  r_name             AS customer_region,
  p_brand,
  s_name             AS supplier_name,
  l_quantity         AS quantity,
  CAST(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000) AS DECIMAL(28,0)) AS DOUBLE) / 1000000 AS net_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
"""


@register(
    "gold_fact_star",
    _FACT_ORACLE,
    "Star-schema fact build: one fact-fact shuffle join "
    "(lineitem ⋈ orders on the natural key), then broadcast joins for "
    "every dimension — identical strategy to the reference "
    "(gold_fact_orders.py:116-121) but with partition columns derived "
    "in-plan. At 100 TB: lineitem and orders co-partition on orderkey; "
    "dims stay broadcast-sized.",
)
def gold_fact_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            F.col("o_custkey").alias("customer_key"),
            F.col("n_name").alias("customer_nation"),
            F.col("r_name").alias("customer_region"),
            "p_brand",
            F.col("s_name").alias("supplier_name"),
            F.col("l_quantity").alias("quantity"),
            money(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_revenue"),
        )
    )


# ----------------------------------------------------------------------------
# Data quality: rule engine emitting a metrics table
# ----------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT 'orders' AS table_name, 'null_count' AS check_name, 'o_custkey' AS column_name,
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS DOUBLE) AS metric_value,
       COUNT(*) FILTER (WHERE o_custkey IS NULL) <= 0.05 * COUNT(*) AS passed
FROM orders
UNION ALL
SELECT 'orders', 'unique', 'o_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE),
       COUNT(*) = COUNT(DISTINCT o_orderkey)
FROM orders
UNION ALL
SELECT 'lineitem', 'min', 'l_quantity',
       CAST(MIN(l_quantity) AS DOUBLE),
       MIN(l_quantity) >= 0
FROM lineitem
UNION ALL
SELECT 'lineitem', 'completeness', 'l_shipdate',
       CAST(COUNT(l_shipdate) AS DOUBLE) / COUNT(*),
       COUNT(l_shipdate) = COUNT(*)
FROM lineitem
UNION ALL
SELECT 'customer', 'unique', 'c_custkey',
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS DOUBLE),
       COUNT(*) = COUNT(DISTINCT c_custkey)
FROM customer
UNION ALL
SELECT 'customer', 'completeness', 'c_name',
       CAST(COUNT(c_name) AS DOUBLE) / COUNT(*),
       COUNT(c_name) = COUNT(*)
FROM customer
"""


@register(
    "dq_metrics",
    _DQ_ORACLE,
    "Data-quality rule engine: null-rate (<=5%), uniqueness, min and "
    "completeness constraints emitted as a metrics table — one aggregate "
    "pass per table, not one job per rule. Reference: "
    "bronze_validation.py:66-82 (null/unique) and "
    "silver_validation.py:86-135 (hasCompleteness/hasMin).",
)
def dq_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.quality import DQCheck, run_checks

    checks = [
        DQCheck("orders", "null_count", "o_custkey", max_null_rate=0.05),
        DQCheck("orders", "unique", "o_orderkey"),
        DQCheck("lineitem", "min", "l_quantity", min_value=0.0),
        DQCheck("lineitem", "completeness", "l_shipdate"),
        DQCheck("customer", "unique", "c_custkey"),
        DQCheck("customer", "completeness", "c_name"),
    ]
    tables = {name: _t(spark, sf_dir, name) for name in {"orders", "lineitem", "customer"}}
    return run_checks(tables, checks)


# ----------------------------------------------------------------------------
# Sessionization + windowed counts (batch analogs of the streaming path)
# ----------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH flagged AS (
  SELECT
    user_id, event_id, ts, value,
    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800000000
           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT
  user_id, session_idx,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(FLOOR((value) * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS total_value
FROM numbered
GROUP BY user_id, session_idx
"""


@register(
    "sessionize_events",
    _SESSION_ORACLE,
    "Gap-based sessionization (30-min inactivity): lag → gap flag → "
    "running sum = session id. Production path is the hot-key-safe "
    "salted variant — windows partition by (user, day-chunk) with exact "
    "boundary stitching, so one hyperactive user can never wall a task. "
    "Reference analog: Redis per-order session accumulation with TTL "
    "(order_details_consumer.py:33-71). Streaming twin: "
    "streaming/order_tracker.py (applyInPandasWithState).",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.catalog import input_scaled_partitions
    from data_lakehouse_platform_spark.operators.sessionize import sessionize_salted

    ev = _t(spark, sf_dir, "events")
    return sessionize_salted(
        ev,
        user_col="user_id",
        ts_col="ts",
        order_col="event_id",
        gap_minutes=30,
        # r10 optimization: session-cardinality cache at input-scaled
        # width (1 partition locally, thousands at lake scale) instead
        # of the pinned static shuffle width.
        cache_partitions=input_scaled_partitions(sf_dir, "events"),
    )


_WINDOWED_ORACLE = """
SELECT
  date_trunc('hour', ts) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(FLOOR((value) * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "windowed_event_counts",
    _WINDOWED_ORACLE,
    "Tumbling 1-hour windowed aggregate — the batch twin of the "
    "structured-streaming watermark aggregation in streaming/pipelines.py. "
    "Reference analog: realtime counters over Kafka topics.",
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "total_value"),
    )


# ----------------------------------------------------------------------------
# Recommendation: eligibility + exclusion + deterministic pick
# ----------------------------------------------------------------------------

_RECOMMEND_ORACLE = """
WITH eligible AS (
  SELECT c_custkey FROM customer
  WHERE c_acctbal >= 9000 AND c_mktsegment = 'BUILDING'
),
ordered_parts AS (
  SELECT DISTINCT o_custkey AS c_custkey, l_partkey
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey IN (SELECT c_custkey FROM eligible)
),
candidates AS (
  SELECT e.c_custkey, p.p_partkey, p.p_retailprice
  FROM eligible e CROSS JOIN part p
  WHERE NOT EXISTS (
    SELECT 1 FROM ordered_parts op
    WHERE op.c_custkey = e.c_custkey AND op.l_partkey = p.p_partkey
  )
)
SELECT
  c_custkey,
  p_partkey AS recommended_part,
  p_retailprice,
  CAST(20 + c_custkey % 31 AS INT) AS discount_percent,
  CAST(CAST(FLOOR((p_retailprice * (100 - (20 + c_custkey % 31)) / 100) * 1000000) AS DECIMAL(28,0)) AS DOUBLE) / 1000000
    AS discounted_price
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY c_custkey ORDER BY p_retailprice DESC, p_partkey
  ) AS rn
  FROM candidates
) t
WHERE rn = 1
"""


@register(
    "recommend_eligible",
    _RECOMMEND_ORACLE,
    "Recommendation flow: eligibility gate (tier + segment ~ the "
    "reference's diamond-tier + ACB-payment membership check), exclusion "
    "of already-purchased items (anti join), deterministic best-candidate "
    "pick and discount pricing. Re-expresses "
    "check_and_recommend_consumer.py:32-135 as one declarative plan; the "
    "candidate space is eligible_customers × broadcast(part) — bounded "
    "because part is a dim.",
)
def recommend_eligible(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")

    eligible = cust.filter(
        (F.col("c_acctbal") >= 9000) & (F.col("c_mktsegment") == "BUILDING")
    ).select("c_custkey")

    from pyspark import StorageLevel

    ordered_parts = (
        orders.join(F.broadcast(eligible), orders.o_custkey == eligible.c_custkey, "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey"))
        .distinct()
        # consumed twice (the candidate-bound scalar and the anti-join);
        # (eligible customer, part) pairs — a strong reduction of the fact
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # r10 optimization: the previous form cross-joined eligible
    # customers with EVERY part (|eligible| x |parts| rows through the
    # anti-join and the per-customer window).  A customer's best
    # non-ordered part sits at position <= (their ordered-part count)+1
    # of the global (retailprice DESC, partkey) order, so candidates
    # only need the global top (M+1) parts, M = max ordered-part count
    # over eligible customers — one bounded scalar (same driver posture
    # as the operator stats fetches).  Identical winners per customer.
    m_row = (
        ordered_parts.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n"))
        .collect()
    )
    m = int(m_row[0][0] or 0) if m_row else 0
    top_parts = (
        part.select("p_partkey", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), "p_partkey")
        .limit(m + 1)
    )
    candidates = (
        eligible.crossJoin(F.broadcast(top_parts))
        .join(
            ordered_parts.withColumnRenamed("l_partkey", "p_partkey"),
            ["c_custkey", "p_partkey"],
            "left_anti",
        )
    )

    w = Window.partitionBy("c_custkey").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    dp = (F.lit(20) + F.col("c_custkey") % 31).cast("int")
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("p_partkey").alias("recommended_part"),
            "p_retailprice",
            dp.alias("discount_percent"),
            money(F.col("p_retailprice") * (100 - dp) / 100).alias("discounted_price"),
        )
    )


# ----------------------------------------------------------------------------
# Semi-structured extraction: JSON payload columns
# ----------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END)
    AS n_high_k
FROM events
GROUP BY event_type
"""


@register(
    "json_props_extract",
    _JSON_ORACLE,
    "Semi-structured extraction: pull typed values out of a JSON string "
    "column (get_json_object) and aggregate — the lakehouse pattern for "
    "event payloads that arrive schemaless (the reference parses Kafka "
    "JSON the same way, bronze_dimension_fact_load.py:118-131). "
    "Extraction is a codegen'd map expression; in production promote hot "
    "JSON paths to real columns at the silver layer.",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k > 50, 1)).alias("n_high_k"),
    )


# ----------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-view refresh)
# ----------------------------------------------------------------------------

_REFRESH_CUTOFF = "2000-01-01"

_REFRESH_ORACLE = f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {{total}} AS total_spend,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_custkey
""".format(total="CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000")


@register(
    "incremental_agg_refresh",
    _REFRESH_ORACLE,
    "Materialized-view maintenance: the stored per-customer aggregate "
    f"(orders before {_REFRESH_CUTOFF}) absorbs the delta (orders since) "
    "by MERGING PARTIAL AGGREGATES — counts add, decimal sums add, maxes "
    "max — never rescanning history. The oracle is the full recompute "
    "over all orders, so the test IS the incremental==full proof. At "
    "100 TB this turns a daily gold refresh from O(history) into "
    "O(delta): the delta aggregates map-side, the merge joins on the "
    "grouping key, and history stays untouched parquet. Reference "
    "analog: incremental fact append (silver_facts.py) which re-appends "
    "rows but recomputes KPIs from scratch downstream.",
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec, undec

    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit(_REFRESH_CUTOFF).cast("timestamp")

    def partial(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("__spend_dec"),
            F.max("o_orderdate").alias("last_order"),
        )

    # "stored" aggregate state (in production: read from the gold table)
    stored = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        stored.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("__spend_dec").alias("__spend_dec"),
            F.max("last_order").alias("last_order"),
        )
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        undec(F.col("__spend_dec")).alias("total_spend"),
        "last_order",
    )


# ----------------------------------------------------------------------------
# Skew-resistant aggregation (salted two-stage groupBy)
# ----------------------------------------------------------------------------

_SALTED_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       {{qty}} AS sum_qty,
       MAX(l_shipdate) AS last_ship
FROM lineitem
GROUP BY l_returnflag
""".format(qty="CAST(SUM(CAST(FLOOR(l_quantity * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000")


@register(
    "skew_salted_agg",
    _SALTED_ORACLE,
    "Hot-key aggregation through operators/skew.salted_agg: stage 1 "
    "groups by (key, rowhash%16) so each hot key spreads over 16 "
    "reducers, stage 2 merges partials (counts/sums add, maxes max). "
    "lineitem has only 3 return flags — the degenerate skew case where "
    "every row funnels to 3 reducers without salting. The oracle is the "
    "plain GROUP BY, proving the two-stage decomposition lossless; "
    "decimal fixed-point keeps the salted partial sums order-proof.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec, undec
    from data_lakehouse_platform_spark.operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_shipdate", dec("l_quantity").alias("__qty_dec")
    )
    out = salted_agg(
        li,
        ["l_returnflag"],
        [
            ("l_shipdate", "count", "n_items"),
            ("__qty_dec", "sum", "__sum_qty_dec"),
            ("l_shipdate", "max", "last_ship"),
        ],
        salt=16,
    )
    return out.select(
        "l_returnflag",
        "n_items",
        undec(F.col("__sum_qty_dec")).alias("sum_qty"),
        "last_ship",
    )


# ----------------------------------------------------------------------------
# Column profiling (ANALYZE-style stats for the DQ/ops surface)
# ----------------------------------------------------------------------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
  COUNT(*) - COUNT({c}) AS n_nulls,
  COUNT(DISTINCT {c}) AS n_distinct,
  CAST(MIN({c}) AS VARCHAR) AS min_value,
  CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders"""
    for c in _PROFILE_COLS
)


@register(
    "profile_orders",
    _PROFILE_ORACLE,
    "ANALYZE-style column profile (one row per column: nulls, distinct "
    "count, min/max) — the table-stats pass that feeds DQ thresholds "
    "and CBO-style size estimates. Spark side is ONE scan: every "
    "column's aggregates computed together, then stack()-unpivoted to "
    "rows — versus the oracle's per-column UNION of scans. At 100 TB "
    "that is the difference between 1 pass and |columns| passes.",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            a
            for c in _PROFILE_COLS
            for a in (
                F.count(c).alias(f"__nn_{c}"),
                F.countDistinct(c).alias(f"__nd_{c}"),
                F.min(c).cast("string").alias(f"__min_{c}"),
                F.max(c).cast("string").alias(f"__max_{c}"),
            )
        ],
    )
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in _PROFILE_COLS
    )
    return agg.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


# ----------------------------------------------------------------------------
# DQ anomaly detection: daily volume z-scores from exact integer moments
# ----------------------------------------------------------------------------

_ANOM_Z = 2.0

_ANOM_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
mo AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(cnt) AS s1, SUM(cnt * cnt) AS s2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day, d.cnt,
  CAST(s1 AS DOUBLE) / n AS mean_cnt,
  CASE WHEN n * s2 > s1 * s1 THEN
    (d.cnt - CAST(s1 AS DOUBLE) / n)
      / sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / (CAST(n AS DOUBLE) * n))
  END AS z_score,
  CAST(CASE WHEN n * s2 > s1 * s1 THEN
    ABS((d.cnt - CAST(s1 AS DOUBLE) / n)
      / sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / (CAST(n AS DOUBLE) * n)))
      > {_ANOM_Z}
  ELSE FALSE END AS INT) AS is_anomaly
FROM daily d JOIN mo USING (event_type)
"""


@register(
    "dq_volume_anomaly",
    _ANOM_ORACLE,
    "DQ anomaly detection: per event type, each day's volume z-scored "
    "against the series (population stddev). The moments are EXACT "
    "integer sums (counts and squared counts in int64) — variance and "
    "z come from two double divisions and one sqrt at the end, so the "
    "float-summation order problem never exists and both engines agree "
    "bit-for-bit. Two tiny shuffles (day grid, then per-type moments "
    "broadcast back). The volume-drop alarm every ingest pipeline "
    "needs (reference: bronze_validation row-count checks generalized).",
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    mo = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var_ok = F.col("n") * F.col("s2") > F.col("s1") * F.col("s1")
    std = F.sqrt(
        (F.col("n").cast("double") * F.col("s2") - F.col("s1").cast("double") * F.col("s1"))
        / (F.col("n").cast("double") * F.col("n"))
    )
    z = (F.col("cnt") - mean) / std
    return (
        daily.join(F.broadcast(mo), "event_type")
        .select(
            "event_type",
            "day",
            "cnt",
            mean.alias("mean_cnt"),
            F.when(var_ok, z).alias("z_score"),
            F.when(var_ok, (F.abs(z) > _ANOM_Z)).otherwise(F.lit(False))
            .cast("int")
            .alias("is_anomaly"),
        )
    )


# ----------------------------------------------------------------------------
# Changelog compaction: last-writer-wins netting per key
# ----------------------------------------------------------------------------

_COMPACT_ORACLE = """
WITH ranked AS (
  SELECT user_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id, CAST(n_changes AS BIGINT) AS n_changes, ts AS last_ts,
       event_type AS last_event_type, value AS last_value
FROM ranked WHERE rn = 1
"""


@register(
    "changelog_compaction",
    _COMPACT_ORACLE,
    "Changelog compaction (Kafka compacted topic / CDC netting): each "
    "key's change history nets to its final record, last writer wins "
    "on the unique (ts, event_id) order. NOT a per-key window "
    "(a hyperactive key would funnel its whole history through one "
    "sort task): a single groupBy with MAX_BY over the composite "
    "order key partial-aggregates map-side, so a key's history "
    "collapses to one running maximum per mapper before anything "
    "shuffles. Reference analog: the orders consumer's last-state "
    "upsert into Redis (scripts/real-time/orders_consumer.py).",
)
def changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    last = F.max_by(
        F.struct("ts", "event_type", "value"), F.struct("ts", "event_id")
    ).alias("last")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_changes"), last)
        .select(
            "user_id",
            "n_changes",
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
        )
    )
