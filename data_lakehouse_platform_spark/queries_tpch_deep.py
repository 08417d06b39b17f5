"""Deep relational coverage: the remaining classic decision-support
shapes (TPC-H Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q21/Q22) adapted to the
testdata star schema (no partsupp / shipmode / commit dates — each
query keeps the original's *plan shape* and swaps in available
columns).

These exercise plan patterns the rest of the suite doesn't:
correlated-min selection (Q2), market-share ratio of conditional sums
(Q8), computed-profit rollup (Q9), scalar-subquery thresholding (Q11),
bucketed conditional counts (Q12), outer-join histogram (Q13),
argmax-by-scalar (Q15), distinct-count with NOT-IN exclusion (Q16),
per-group-average correlated filter (Q17), multi-condition window
qualification (Q21), and anti-join with scalar-average gate (Q22).

Same contract as queries.py: DuckDB oracle twin per query, fixed-point
money aggregates (functions/money.py), unique tiebreaker on every
top-N, identical IEEE expression order in both engines so doubles are
bit-exact.

Reference parity: these generalize the reference's analytical surface
(star joins + KPI aggregation, gold_fact_orders.py:57-137 and
show_gold_tables.py) beyond the shapes its hand-written scripts cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.functions.money import dec, dec_sum, sql_sum, undec
from data_lakehouse_platform_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Q2 shape: min-cost supplier (correlated MIN over a derived offer table)
# ----------------------------------------------------------------------------

_Q2_SIZE = 15  # parts with p_size <= 15, LARGE type

_Q2_ORACLE = f"""
WITH offers AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
    CAST(SUM(CAST(FLOOR((l_extendedprice / l_quantity) * 1000000) AS DECIMAL(28,0))) AS DOUBLE)
      / 1000000 / COUNT(*) AS avg_unit_price
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT partkey, suppkey, avg_unit_price,
         MIN(avg_unit_price) OVER (PARTITION BY partkey) AS min_price
  FROM offers
)
SELECT s_name, n_name, p_partkey, p_name, avg_unit_price AS min_unit_price,
       s_suppkey
FROM best
JOIN part     ON p_partkey = partkey
JOIN supplier ON s_suppkey = suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE avg_unit_price = min_price
  AND p_type = 'LARGE' AND p_size <= {_Q2_SIZE}
"""


@register(
    "q2_min_cost_supplier",
    _Q2_ORACLE,
    "Minimum-cost supplier per part (TPC-H Q2 shape, offer table derived "
    "from sale history since there is no partsupp): grouped per "
    "(part, supplier) average unit price — map-side partial agg shrinks the "
    "fact shuffle to one row per pair — then a window MIN per part replaces "
    "the correlated subquery (one extra narrow shuffle instead of a "
    "re-scan), equality filter keeps ties, and part/supplier/nation attach "
    "as broadcasts. The part-class filter applies before output so the "
    "window runs on the full offer table exactly like the correlated MIN "
    "would. Averages use exact fixed-point sums so the equality comparison "
    "is bit-identical across engines and partitionings.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    offers = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        (undec(F.sum(dec(F.col("l_extendedprice") / F.col("l_quantity")))) / F.count(F.lit(1))).alias(
            "avg_unit_price"
        )
    )
    w = Window.partitionBy("partkey")
    best = offers.withColumn("min_price", F.min("avg_unit_price").over(w)).filter(
        F.col("avg_unit_price") == F.col("min_price")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= _Q2_SIZE)
    ).select("p_partkey", "p_name")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(part), best.partkey == part.p_partkey)
        .join(F.broadcast(supp), best.suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("avg_unit_price").alias("min_unit_price"),
            "s_suppkey",
        )
    )


# ----------------------------------------------------------------------------
# Q8 shape: national market share within a region
# ----------------------------------------------------------------------------

_Q8_NATION = "NATION_5"
_Q8_REGION = "ASIA"
_Q8_TYPE = "ECONOMY"

_Q8_ORACLE = f"""
SELECT
  YEAR(o_orderdate) AS o_year,
  {sql_sum(f"CASE WHEN ns.n_name = '{_Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
    AS nation_volume,
  {sql_sum('l_extendedprice * (1 - l_discount)')} AS total_volume,
  ({sql_sum(f"CASE WHEN ns.n_name = '{_Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
    / ({sql_sum('l_extendedprice * (1 - l_discount)')}) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN part      ON l_partkey = p_partkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region    ON nc.n_regionkey = r_regionkey
WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
GROUP BY YEAR(o_orderdate)
"""


@register(
    "q8_market_share",
    _Q8_ORACLE,
    "National market share (TPC-H Q8 shape): 8-table star with ONE fact "
    "shuffle (lineitem x orders); part/supplier/customer/nation/region all "
    "broadcast. The region and part-type filters prune the broadcast "
    "build sides before the join, so most fact rows drop at the first "
    "broadcast probe. Share = divide of two exact fixed-point sums, so the "
    "ratio is partition-order independent.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION).select("r_regionkey")
    ns = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == _Q8_NATION, vol).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)  # the one shuffle
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dec_sum(nat_vol, "nation_volume"),
            dec_sum(vol, "total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
    )


# ----------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# ----------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
  {sql_sum('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%r%'
GROUP BY n_name, YEAR(o_orderdate)
"""


@register(
    "q9_product_profit",
    _Q9_ORACLE,
    "Product profit rollup (TPC-H Q9 shape; cost basis 0.6 x retail price "
    "since there is no partsupp supplycost): one fact shuffle against "
    "orders, part/supplier/nation broadcast, profit computed per row with "
    "a fixed IEEE expression order so the fixed-point sum is bit-exact. "
    "The p_name LIKE filter prunes the part build side pre-join.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%r%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dec_sum(profit, "sum_profit"))
    )


# ----------------------------------------------------------------------------
# Q11 shape: important part values (scalar-subquery threshold)
# ----------------------------------------------------------------------------

_Q11_FACTOR = 1.2  # parts worth >1.2x the mean part value (scale-free)

_Q11_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey, {sql_sum('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT ({sql_sum('part_value')}) / COUNT(*) FROM per_part) * {_Q11_FACTOR}
"""


@register(
    "q11_important_values",
    _Q11_ORACLE,
    "Important part values (TPC-H Q11 shape; threshold is 1.2x the MEAN "
    "part value so selectivity is scale-free, unlike the spec's "
    "fraction-of-total which vanishes as the part count grows): per-part "
    "grouped revenue (partial agg shrinks the shuffle to one row per "
    "part), then a 1-row global average broadcast-cross-joined back as "
    "the threshold — the scalar subquery costs one extra tiny stage, "
    "never a re-scan. The average re-aggregates the exact per-part sums "
    "in fixed point, so the threshold compare is bit-identical across "
    "engines and partitionings.",
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    per_part = li.groupBy("l_partkey").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "part_value")
    )
    total = per_part.agg(
        (undec(F.sum(dec("part_value"))) / F.count(F.lit(1))).alias("mean_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("mean_value") * _Q11_FACTOR)
        .select("l_partkey", "part_value")
    )


# ----------------------------------------------------------------------------
# Q12 shape: ship-delay buckets x priority class counts
# ----------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT
  CASE
    WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN '0-29d'
    WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN '30-89d'
    WHEN date_diff('day', o_orderdate, l_shipdate) < 365 THEN '90-364d'
    ELSE '365d+'
  END AS delay_bucket,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


@register(
    "q12_ship_delay",
    _Q12_ORACLE,
    "Shipping-delay audit (TPC-H Q12 shape; delay buckets from "
    "shipdate - orderdate replace the missing shipmode column): year "
    "filter pushed to the fact scan, one shuffle join on the order key, "
    "conditional counts entirely in codegen. At scale the grouped output "
    "is 4 rows — partial aggregation collapses everything map-side.",
)
def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "0-29d")
        .when(delay < 90, "30-89d")
        .when(delay < 365, "90-364d")
        .otherwise("365d+")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ----------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer-join histogram)
# ----------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


@register(
    "q13_order_count_distribution",
    _Q13_ORACLE,
    "Customer order-count histogram (TPC-H Q13 shape; the priority "
    "exclusion stands in for the comment NOT-LIKE filter): LEFT OUTER "
    "join with the filter on the join condition (not a WHERE — customers "
    "with zero surviving orders must stay, counting 0), per-customer "
    "count, then a second tiny aggregation over counts. Two shuffles, "
    "both inherent to the double aggregation; the second one's input is "
    "one row per customer.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ----------------------------------------------------------------------------
# Q15 shape: top supplier (argmax against a scalar aggregate)
# ----------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    {sql_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register(
    "q15_top_supplier",
    _Q15_ORACLE,
    "Top supplier of the quarter (TPC-H Q15 shape): quarter filter pushed "
    "to the scan, per-supplier grouped revenue, and the MAX scalar "
    "broadcast-cross-joined back for the equality filter (ties kept, as "
    "in the spec) — the 'view evaluated twice' of the original collapses "
    "to one aggregation plus a 1-row broadcast. Revenue is an exact "
    "fixed-point sum so the equality match is deterministic.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ----------------------------------------------------------------------------
# Q16 shape: supplier counts per part class, NOT-IN exclusion
# ----------------------------------------------------------------------------

_Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)

_Q16_ORACLE = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register(
    "q16_supplier_part_counts",
    _Q16_ORACLE,
    "Supplier diversity per part class (TPC-H Q16 shape over sale history; "
    "negative-balance suppliers stand in for the complaints exclusion): "
    "part filters prune the broadcast build side, the NOT-IN is a "
    "broadcast LEFT ANTI join (the excluded set is tiny), and the distinct "
    "count shuffles (brand, type, size, suppkey) pairs after map-side "
    "dedup — bounded by classes x suppliers regardless of fact size.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#13") & F.col("p_size").isin(*_Q16_SIZES))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ----------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (per-part average correlation)
# ----------------------------------------------------------------------------

_Q17_BRAND = "Brand#3"

_Q17_ORACLE = f"""
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{_Q17_BRAND}'
),
with_avg AS (
  SELECT l_quantity, l_extendedprice,
    CAST(SUM(CAST(FLOOR(l_quantity * 1000000) AS DECIMAL(28,0)))
         OVER (PARTITION BY l_partkey) AS DOUBLE) / 1000000
      / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM branded
)
SELECT {sql_sum('l_extendedprice')} / 7.0 AS avg_yearly
FROM with_avg
WHERE l_quantity < 0.5 * avg_qty
"""


@register(
    "q17_small_qty_revenue",
    _Q17_ORACLE,
    "Small-quantity-order revenue (TPC-H Q17 shape): the brand filter "
    "prunes part to ~1/25 before a broadcast join, so the correlated "
    "per-part average runs as a window over only the branded slice — one "
    "narrow shuffle on partkey instead of a second fact scan. The average "
    "is an exact fixed-point sum over the window, making the "
    "0.5*avg branch decision bit-identical across engines.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == _Q17_BRAND).select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("l_partkey")
    avg_qty = undec(F.sum(dec("l_quantity")).over(w)) / F.count(F.lit(1)).over(w)
    return (
        branded.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dec_sum("l_extendedprice", "_s")))
        .select((F.col("_s") / 7.0).alias("avg_yearly"))
    )


# ----------------------------------------------------------------------------
# Q21 shape: suppliers who kept multi-supplier orders waiting
# ----------------------------------------------------------------------------

_Q21_LATE_DAYS = 365
_Q21_TOPN = 100

_Q21_ORACLE = f"""
WITH per AS (
  SELECT l_orderkey, l_suppkey,
    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
),
w AS (
  SELECT l_suppkey, late,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per
)
SELECT s_name, COUNT(*) AS numwait
FROM w JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {_Q21_TOPN}
"""


@register(
    "q21_waiting_supplier",
    _Q21_ORACLE,
    "Suppliers who solely delayed multi-supplier orders (TPC-H Q21 shape; "
    "lateness = shipped >365d after order date, replacing the missing "
    "commit/receipt dates): the EXISTS/NOT-EXISTS pair of the original "
    "becomes one grouped pass per (order, supplier) plus a window count "
    "per order — two narrow shuffles on the order key instead of three "
    "fact self-joins. Qualification (late, co-suppliers exist, no other "
    "late co-supplier) is pure integer logic; supplier names attach by "
    "broadcast; top-N carries the unique name tiebreaker.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS"),
        1,
    ).otherwise(0)
    per = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    qualified = (
        per.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qualified.join(F.broadcast(supp), qualified.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(_Q21_TOPN)
    )


# ----------------------------------------------------------------------------
# Q22 shape: dormant high-balance customers (anti join + scalar average)
# ----------------------------------------------------------------------------

_Q22_DORMANT_SINCE = "1999-01-01"

_Q22_ORACLE = f"""
SELECT c_mktsegment, COUNT(*) AS numcust, {sql_sum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT ({sql_sum('c_acctbal')}) / COUNT(*) FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '{_Q22_DORMANT_SINCE}'
  )
GROUP BY c_mktsegment
"""


@register(
    "q22_dormant_customers",
    _Q22_ORACLE,
    "Dormant high-balance customers (TPC-H Q22 shape; market segment "
    "stands in for the phone country code, dormancy = no order since "
    "1999): the scalar positive-balance average is a 1-row broadcast, "
    "the NOT EXISTS is a LEFT ANTI join shuffled on the customer key "
    "(orders filtered by the dormancy date and projected to the single "
    "key column first — the date filter pushes to the scan), and the "
    "final segment rollup is a tiny grouped agg. The balance gate "
    "compares doubles derived from exact sums, so both engines admit "
    "identical customers.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((undec(F.sum(dec("c_acctbal"))) / F.count(F.lit(1))).alias("avg_bal"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_DORMANT_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), dec_sum("c_acctbal", "totacctbal"))
    )
