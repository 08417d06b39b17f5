"""Portable-sketch & sequential-fold surface: cross-engine HyperLogLog,
count-min frequency estimation, Bloom-filter decontamination,
exact-substring (window-hash) dedup, an integer exponential smoother,
and multi-touch attribution.

Why these exist as *registry* queries and not just operator unit
tests: each one demonstrates a determinism discipline the 100 TB
target needs —

* sketches whose register layout is engine-neutral (md5-derived
  integers), so state built here merges with state built elsewhere
  and every estimate is re-checkable by the DuckDB oracle bit for
  bit (operators/sketches.py);
* the one floating-point reduction (HLL's harmonic mean) done as an
  ordered left fold, so partitioning can never change the answer;
* integer-only recurrences (EWMA as ``(prev + x) // 2``) where a
  double recurrence would drift across engines;
* integer-division credit splitting for attribution, where
  fractional credit would be partitioning-dependent in the low bits.

Reference analog: none — the reference counts uniques exactly in
MySQL and has no corpus-scale path; these are the sketch/fold
operators that replace that luxury (see operators/sketches.py
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators import sketches as SK
from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import _t, register

# ----------------------------------------------------------------------------
# HyperLogLog distinct users per event type (m = 64, engine-neutral)
# ----------------------------------------------------------------------------

_HLL_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         {SK.sql_hash60("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
split AS (
  SELECT event_type, hv >> 54 AS reg,
         hv & ((1::BIGINT << 54) - 1) AS w
  FROM h
),
rho AS (
  SELECT event_type, reg,
         MAX(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS m
  FROM split GROUP BY 1, 2
),
grid AS (
  SELECT DISTINCT event_type, g.reg
  FROM split, (SELECT unnest(generate_series(0, 63)) AS reg) g
),
filled AS (
  SELECT grid.event_type, grid.reg, COALESCE(rho.m, 0) AS m
  FROM grid LEFT JOIN rho
    ON grid.event_type = rho.event_type AND grid.reg = rho.reg
),
est AS (
  SELECT event_type,
         {SK.HLL_ALPHA} * {SK.HLL_M * SK.HLL_M} / list_reduce(
           list_prepend(0.0, list_transform(
             list(m ORDER BY reg),
             x -> 1.0 / ((1::BIGINT << x)::DOUBLE))),
           (a, b) -> a + b) AS hll_estimate
  FROM filled GROUP BY event_type
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT ex.event_type, ex.n_exact, est.hll_estimate
FROM ex JOIN est ON ex.event_type = est.event_type
"""


@register(
    "hll_distinct_users",
    _HLL_ORACLE,
    "Engine-neutral HyperLogLog (m=64) distinct-user estimate per "
    "event type, alongside the exact count for audit. The register "
    "table (group, reg, MAX rho) is the mergeable sketch state — a "
    "further MAX merges daily sketches into monthly uniques exactly, "
    "which Spark's own approx_count_distinct registers (engine-"
    "private HLL++) cannot do across engines. Map-side combinable: "
    "the shuffle carries at most |groups|*64 rows regardless of user "
    "cardinality; the only double — the harmonic mean — is an ordered "
    "64-element fold, bit-identical on any partitioning and engine "
    "(operators/sketches.py).",
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    regs = SK.hll_registers(ev, ["event_type"], "user_id")
    est = SK.hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "hll_estimate"
    )


# ----------------------------------------------------------------------------
# Count-min sketch: token-frequency estimates for the top exact tokens
# ----------------------------------------------------------------------------

_CM_D = 4
_CM_W = 512
_CM_TOPK = 10

_CM_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split({T.sql_normalize_ws('text')}, ' ')) AS tok
  FROM documents
),
cells AS (
  SELECT r.row,
         {SK.sql_hash60("CAST(r.row AS VARCHAR) || ':' || tok")} % {_CM_W} AS cell,
         COUNT(*) AS cnt
  FROM toks, (SELECT unnest(generate_series(0, {_CM_D - 1})) AS row) r
  GROUP BY 1, 2
),
exact AS (
  SELECT tok, COUNT(*) AS exact_freq,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
  FROM toks GROUP BY tok
),
probe AS (
  SELECT tok, exact_freq FROM exact WHERE rn <= {_CM_TOPK}
)
SELECT probe.tok AS token, probe.exact_freq,
       MIN(cells.cnt) AS cm_estimate
FROM probe, (SELECT unnest(generate_series(0, {_CM_D - 1})) AS row) pr
JOIN cells
  ON cells.row = pr.row
 AND cells.cell = {SK.sql_hash60("CAST(pr.row AS VARCHAR) || ':' || probe.tok")} % {_CM_W}
GROUP BY 1, 2
"""


@register(
    "countmin_token_freq",
    _CM_ORACLE,
    f"Count-min sketch ({_CM_D}x{_CM_W} cells) over the corpus token "
    f"stream, probed with the top-{_CM_TOPK} exact tokens so the "
    "overestimate (MIN over rows >= truth) is visible next to ground "
    "truth. The grouped cell count is map-side combinable — shuffle "
    "width is bounded by the sketch grid, never the vocabulary, which "
    "is what makes frequency estimation tractable on a 100 TB token "
    "stream where the exact table itself is the bottleneck. Probe "
    "side is 40 rows and broadcasts (operators/sketches.py).",
)
def countmin_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.ws_tokens("text")).alias("tok"))
    sketch = SK.countmin_table(toks, "tok", d=_CM_D, w=_CM_W)

    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_freq"))
    probe = exact.orderBy(F.desc("exact_freq"), F.asc("tok")).limit(_CM_TOPK)

    probe_cells = probe.select(
        F.col("tok").alias("token"),
        "exact_freq",
        F.explode(F.sequence(F.lit(0), F.lit(_CM_D - 1))).alias("row"),
    ).withColumn(
        "cell",
        SK.hash60(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("token")))
        % _CM_W,
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy("token", "exact_freq")
        .agg(F.min("cnt").alias("cm_estimate"))
    )


# ----------------------------------------------------------------------------
# Bloom-filter n-gram decontamination (sketch twin of decontaminate_ngram)
# ----------------------------------------------------------------------------

_BLOOM_K = 3
_BLOOM_M = 8192
_BLOOM_NGRAM = 5
_EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out eval document

_BLOOM_ORACLE = f"""
WITH {T.sql_shingles_cte(_BLOOM_NGRAM)},
eval_bits AS (
  SELECT DISTINCT
         {SK.sql_hash60("CAST(i.i AS VARCHAR) || ':' || s.shingle")} % {_BLOOM_M} AS bitpos
  FROM shingles s, (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS i) i
  WHERE s.doc_id % {_EVAL_MOD} = 0
),
cand AS (
  SELECT doc_id FROM documents WHERE doc_id % {_EVAL_MOD} <> 0
),
cand_bits AS (
  SELECT s.doc_id, s.shingle, i.i,
         {SK.sql_hash60("CAST(i.i AS VARCHAR) || ':' || s.shingle")} % {_BLOOM_M} AS bitpos
  FROM shingles s, (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS i) i
  WHERE s.doc_id % {_EVAL_MOD} <> 0
),
hits AS (
  SELECT cb.doc_id, cb.shingle
  FROM cand_bits cb JOIN eval_bits eb ON cb.bitpos = eb.bitpos
  GROUP BY cb.doc_id, cb.shingle
  HAVING COUNT(DISTINCT cb.i) = {_BLOOM_K}
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_grams
  FROM shingles WHERE doc_id % {_EVAL_MOD} <> 0 GROUP BY doc_id
),
flagged AS (
  SELECT doc_id, COUNT(*) AS n_flagged FROM hits GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(f.n_flagged, 0) AS n_flagged,
       COALESCE(f.n_flagged, 0) > 0 AS is_flagged
FROM cand c
LEFT JOIN per_doc p ON c.doc_id = p.doc_id
LEFT JOIN flagged f ON c.doc_id = f.doc_id
"""


@register(
    "bloom_decontaminate",
    _BLOOM_ORACLE,
    f"Bloom-filter decontamination: {_BLOOM_NGRAM}-gram shingles of "
    "held-out eval docs (doc_id % 97 == 0) set k=3 bits in an 8192-bit "
    "filter; a training doc is flagged when all 3 bits of any of its "
    "grams are set. The sketch twin of decontaminate_ngram: the "
    "broadcast is the BIT SET (<= m_bits rows), bounded by filter "
    "size, not by the eval corpus — the trade a 100 TB ingest tier "
    "makes when the eval suite itself is large. False positives are "
    "the textbook rate and surface honestly as n_flagged on clean "
    "docs; map-side gram hashing, no row explosion past k per gram "
    "(operators/sketches.py).",
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    shingles = T.explode_shingles(docs, "doc_id", "text", k=_BLOOM_NGRAM)

    eval_sh = shingles.filter(F.col("doc_id") % _EVAL_MOD == 0)
    bloom = SK.bloom_bits(eval_sh, "shingle", k=_BLOOM_K, m_bits=_BLOOM_M)

    cand_sh = shingles.filter(F.col("doc_id") % _EVAL_MOD != 0)
    cand_bits = cand_sh.select(
        "doc_id",
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i"),
    ).withColumn(
        "bitpos",
        SK.hash60(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("shingle")))
        % _BLOOM_M,
    )
    hits = (
        cand_bits.join(F.broadcast(bloom), "bitpos")
        .groupBy("doc_id", "shingle")
        .agg(F.count_distinct("i").alias("__nbits"))
        .filter(F.col("__nbits") == _BLOOM_K)
    )
    per_doc = cand_sh.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    flagged = hits.groupBy("doc_id").agg(F.count("*").alias("n_flagged"))

    cand = docs.filter(F.col("doc_id") % _EVAL_MOD != 0).select("doc_id")
    return (
        cand.join(per_doc, "doc_id", "left")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("bigint")).alias("n_grams"),
            F.coalesce("n_flagged", F.lit(0).cast("bigint")).alias("n_flagged"),
            (F.coalesce("n_flagged", F.lit(0).cast("bigint")) > 0).alias(
                "is_flagged"
            ),
        )
    )


# ----------------------------------------------------------------------------
# Exact-substring dedup: 64-char window hashes at stride 32
# ----------------------------------------------------------------------------

_WIN = 64
_STRIDE = 32

_SUBSTR_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, {T.sql_normalize_ws('text')} AS t FROM documents
),
arrs AS (
  SELECT doc_id,
         CASE WHEN length(t) >= {_WIN}
              THEN list_transform(
                     generate_series(0, (length(t) - {_WIN}) // {_STRIDE}),
                     i -> md5(substr(t, i * {_STRIDE} + 1, {_WIN})))
              ELSE [] END AS whs
  FROM norm
),
wins AS (
  SELECT doc_id, unnest(whs) AS wh FROM arrs
),
shared AS (
  SELECT wh FROM wins GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT w.doc_id, COUNT(*) AS n_shared
  FROM wins w JOIN shared s ON w.wh = s.wh
  GROUP BY w.doc_id
)
SELECT a.doc_id,
       CAST(len(a.whs) AS BIGINT) AS n_windows,
       COALESCE(p.n_shared, 0) AS n_shared
FROM arrs a LEFT JOIN per_doc p ON a.doc_id = p.doc_id
"""


@register(
    "exact_substr_dedup",
    _SUBSTR_ORACLE,
    f"Exact-substring duplicate detection: md5 hashes of {_WIN}-char "
    f"windows at stride {_STRIDE} over whitespace-normalized text; a "
    "window is 'shared' when its hash occurs in >= 2 distinct docs. "
    "The scalable stand-in for suffix-array ExactSubstr dedup (Lee et "
    "al. 2022): window hashing is map-side and emits ~len/stride "
    "hashes per doc (a constant fraction of input bytes), the "
    "multi-doc hash set comes from one grouped count, and the "
    "flag-back is a semi-join on that set — no pairwise comparison "
    "anywhere, so the plan survives a 100x corpus the way a "
    "suffix-array build would not.",
)
def exact_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    arrs = docs.select(
        "doc_id", T.normalize_ws("text").alias("__t")
    ).select(
        "doc_id",
        F.expr(
            f"CASE WHEN length(__t) >= {_WIN} "
            f"THEN transform(sequence(0, (length(__t) - {_WIN}) div {_STRIDE}), "
            f"               i -> md5(substring(__t, i * {_STRIDE} + 1, {_WIN}))) "
            f"ELSE array() END"
        ).alias("whs"),
    )
    # r10 optimization: the normalize + md5-window subtree (`arrs`) fed
    # three lineage branches (wins -> shared, wins -> per_doc, and the
    # n_windows projection), so the whole window-hash pass executed
    # three times (plan audit: documents scanned 3x).  Persist the
    # exploded (doc_id, wh) stream once — hash-cardinality, ~len/stride
    # rows per doc — and derive n_windows by counting it (identical to
    # size(whs): md5 never yields null, so explode emits exactly
    # size(whs) rows); docs with zero windows are restored by the
    # left join from a doc_id-only scan that prunes the text column.
    from pyspark import StorageLevel

    from data_lakehouse_platform_spark.catalog import input_scaled_partitions

    wins = (
        arrs.select("doc_id", F.explode("whs").alias("wh"))
        # input-scaled width for the cache: the md5 window pass itself
        # runs at the fanned-out scan width (map-side, before this
        # exchange); only the exploded (doc_id, hash) stream — a
        # constant fraction of input bytes — moves, landing in 1 cached
        # partition locally and thousands at lake scale.
        .repartition(input_scaled_partitions(sf_dir, "documents"), "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # "seen in >= 2 distinct docs" as min != max — fully map-side
    # combinable where COUNT(DISTINCT doc_id) would carry every
    # (hash, doc) pair through the shuffle.
    shared = (
        wins.groupBy("wh")
        .agg(F.min("doc_id").alias("__lo"), F.max("doc_id").alias("__hi"))
        .filter(F.col("__lo") != F.col("__hi"))
        .select("wh")
    )
    per_doc = (
        wins.join(shared, "wh").groupBy("doc_id").agg(F.count("*").alias("n_shared"))
    )
    n_win = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows")
    )
    return (
        docs.select("doc_id")
        .join(n_win, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0).cast("bigint")).alias(
                "n_windows"
            ),
            F.coalesce("n_shared", F.lit(0).cast("bigint")).alias("n_shared"),
        )
    )


# ----------------------------------------------------------------------------
# Integer EWMA of daily revenue per region (ordered fold / recursion)
# ----------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT r.r_name AS region, o.o_orderdate AS odate,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 1000000) AS DECIMAL(28,0)))
              AS BIGINT) AS micros
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
seq AS (
  SELECT region, odate, micros,
         ROW_NUMBER() OVER (PARTITION BY region ORDER BY odate) AS rn
  FROM daily
),
rec AS (
  SELECT region, odate, rn, micros, micros AS ewma_micros
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.region, s.odate, s.rn, s.micros,
         (r.ewma_micros + s.micros) // 2
  FROM rec r JOIN seq s ON s.region = r.region AND s.rn = r.rn + 1
)
SELECT region, odate,
       micros / 1000000.0 AS revenue,
       ewma_micros / 1000000.0 AS ewma
FROM rec
"""


@register(
    "ewma_daily_revenue",
    _EWMA_ORACLE,
    "Exponential smoother over daily revenue per region, defined as "
    "the INTEGER recurrence s_t = (s_{t-1} + y_t) div 2 on exact "
    "fixed-point micros — a half-life-one-day EWMA with no float "
    "drift, so any engine and any partitioning reproduces it bit for "
    "bit (the double appears only in the final single divide). "
    "Sequential state done scale-correctly: orders collapse map-side "
    "into per-(region, day) fixed-point sums FIRST, so the ordered "
    "fold runs over calendar-bounded arrays (#days per region), never "
    "over raw orders; at 100 TB the array is still a few thousand "
    "elements. Spark side is one aggregate() left fold; the oracle "
    "replays it as a recursive CTE.",
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.functions.money import dec

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")

    # customer is NOT broadcast-hinted: at corpus scale it is a fact-
    # sized dimension; the join shuffles on custkey (or AQE broadcasts
    # it when it truly is small). nation/region are genuinely tiny.
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("o_orderdate").alias("odate"))
        .agg(F.sum(dec("o_totalprice")).cast("bigint").alias("micros"))
    )
    folded = (
        daily.groupBy("region")
        .agg(
            F.sort_array(F.collect_list(F.struct("odate", "micros"))).alias("__xs")
        )
        .select(
            "region",
            "__xs",
            F.expr(
                "aggregate(__xs,"
                "  named_struct('last', CAST(NULL AS BIGINT),"
                "               'arr', CAST(array() AS ARRAY<BIGINT>)),"
                "  (acc, x) -> named_struct("
                "    'last', IF(acc.last IS NULL, x.micros,"
                "               (acc.last + x.micros) div 2),"
                "    'arr', array_append(acc.arr,"
                "       IF(acc.last IS NULL, x.micros,"
                "          (acc.last + x.micros) div 2))),"
                "  acc -> acc.arr)"
            ).alias("__ew"),
        )
    )
    return folded.select(
        "region", F.posexplode(F.arrays_zip("__xs", "__ew"))
    ).select(
        "region",
        F.col("col.__xs.odate").alias("odate"),
        (F.col("col.__xs.micros") / F.lit(1000000.0)).alias("revenue"),
        (F.col("col.__ew") / F.lit(1000000.0)).alias("ewma"),
    )


# ----------------------------------------------------------------------------
# Linear multi-touch attribution (click/view -> purchase within 7 days)
# ----------------------------------------------------------------------------

_ATTR_ORACLE = """
WITH purchases AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS value_micros
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
),
joined AS (
  SELECT p.p_id, p.value_micros, t.touch_type,
         COUNT(*) OVER (PARTITION BY p.p_id) AS n_in_window
  FROM purchases p
  JOIN touches t
    ON p.user_id = t.user_id
   AND t.t_ts > p.p_ts - INTERVAL 7 DAY
   AND t.t_ts <= p.p_ts
)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(1000 // n_in_window) AS BIGINT) AS credit_millis,
       CAST(SUM(value_micros // n_in_window) AS BIGINT) / 1000000.0
         AS credited_value
FROM joined
GROUP BY touch_type
"""


@register(
    "attribution_linear",
    _ATTR_ORACLE,
    "Linear multi-touch attribution: every click/view in the 7 days "
    "before a purchase shares that purchase's credit equally. Credit "
    "is split by INTEGER division of millicredits and fixed-point "
    "value micros — deterministic under any partitioning, where "
    "fractional credit would drift in the low bits. PAIR-FREE on "
    "purpose: the oracle's interval join materializes |P_u| x |T_u| "
    "rows per user — quadratic under a hyperactive user — so the "
    "Spark plan instead interleaves touches with two probe rows per "
    "purchase (at p_ts and p_ts - 7d) in ONE per-user window pass of "
    "running per-type counts; window counts are probe differences, "
    "and per-type credit is count_t * (credit div n) because every "
    "touch of one purchase carries the same integer credit. Cost is "
    "O(|P| + |T|) rows through one sort per user — the same events "
    "stream the reference's consumer walks per customer "
    "(orders_consumer.py), never a pairwise blowup. The ORACLE stays "
    "the pairwise interval join, so the driver's value check is "
    "itself the pairwise-equivalence proof.",
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.attribution import (
        linear_attribution,
    )

    return linear_attribution(_t(spark, sf_dir, "events"))


# ----------------------------------------------------------------------------
# HLL union rollup: merged per-type sketches vs global exact
# ----------------------------------------------------------------------------

_HLL_UNION_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         {SK.sql_hash60("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
split AS (
  SELECT event_type, hv >> 54 AS reg,
         hv & ((1::BIGINT << 54) - 1) AS w
  FROM h
),
per_type AS (
  SELECT event_type, reg,
         MAX(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS m
  FROM split GROUP BY 1, 2
),
merged AS (
  SELECT reg, MAX(m) AS m FROM per_type GROUP BY reg
),
grid AS (SELECT unnest(generate_series(0, 63)) AS reg),
filled AS (
  SELECT grid.reg, COALESCE(merged.m, 0) AS m
  FROM grid LEFT JOIN merged ON grid.reg = merged.reg
),
est AS (
  SELECT {SK.HLL_ALPHA} * {SK.HLL_M * SK.HLL_M} / list_reduce(
           list_prepend(0.0, list_transform(
             list(m ORDER BY reg),
             x -> 1.0 / ((1::BIGINT << x)::DOUBLE))),
           (a, b) -> a + b) AS hll_estimate
  FROM filled
),
ex AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events),
ty AS (
  SELECT CAST(SUM(n) AS BIGINT) AS sum_type_exacts FROM (
    SELECT COUNT(DISTINCT user_id) AS n FROM events GROUP BY event_type
  )
)
SELECT ex.n_exact, ty.sum_type_exacts, est.hll_estimate,
       ty.sum_type_exacts / (1.0 * ex.n_exact) AS overlap_factor
FROM ex, ty, est
"""


@register(
    "hll_union_rollup",
    _HLL_UNION_ORACLE,
    "The HLL MERGE in action: per-event-type register tables (the "
    "shape a daily pipeline persists) union into a global sketch with "
    "one register-wise MAX — lossless, so the merged estimate is "
    "IDENTICAL to a sketch built directly over the union, which no "
    "sum of per-type counts can do (users overlap across types; the "
    "overlap_factor column shows exactly how much double-counting a "
    "naive rollup would commit). This is why sketch state, not exact "
    "distinct state, is what daily jobs should persist at 100 TB: "
    "rollups over arbitrary type/day subsets become register MAXes "
    "over tiny tables.",
)
def hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = SK.hll_registers(ev, ["event_type"], "user_id")
    merged = per_type.groupBy("reg").agg(F.max("m").alias("m")).withColumn(
        "g", F.lit(1)
    )
    est = SK.hll_estimate(merged, ["g"]).select("hll_estimate")
    exact = ev.agg(F.count_distinct("user_id").alias("n_exact"))
    per_type_exact = (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .agg(F.sum("n").cast("bigint").alias("sum_type_exacts"))
    )
    return (
        exact.crossJoin(per_type_exact)
        .crossJoin(est)
        .select(
            "n_exact",
            "sum_type_exacts",
            "hll_estimate",
            (F.col("sum_type_exacts") / (F.lit(1.0) * F.col("n_exact"))).alias(
                "overlap_factor"
            ),
        )
    )


# ----------------------------------------------------------------------------
# Smoothed target encoding (m-estimate) of order priority
# ----------------------------------------------------------------------------

_TE_M = 10  # m-estimate pseudo-count

_TE_ORACLE = f"""
WITH per_cat AS (
  SELECT o_orderpriority AS priority,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos
  FROM orders GROUP BY 1
),
g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(n_pos) AS BIGINT) AS gpos
  FROM per_cat
)
SELECT p.priority, p.n, p.n_pos,
       p.n_pos / (1.0 * p.n) AS raw_rate,
       (p.n_pos * g.gn + {_TE_M} * g.gpos) / (1.0 * g.gn * (p.n + {_TE_M}))
         AS enc_smoothed
FROM per_cat p CROSS JOIN g
"""


@register(
    "target_encode_smoothed",
    _TE_ORACLE,
    f"m-estimate target encoding (m={_TE_M}) of order priority against "
    "the fulfilled-status target — the category-to-number feature prep "
    "step of every tabular ML pipeline, done leakage-consciously "
    "(global prior smooths small categories toward the corpus rate). "
    "Determinism discipline: the encoding is ONE double division of "
    "exact cross-multiplied integers — (n_pos*gn + m*gpos) / "
    "(gn*(n+m)) — so any engine and any partitioning produces the "
    "identical feature value; a naive mean-of-doubles would drift. "
    "Two map-side aggs over a pruned scan, a 5-row broadcast cross "
    "join: nothing here grows with the fact table.",
)
def target_encode_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    per_cat = od.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    g = per_cat.agg(
        F.sum("n").cast("bigint").alias("gn"),
        F.sum("n_pos").cast("bigint").alias("gpos"),
    )
    return per_cat.crossJoin(F.broadcast(g)).select(
        "priority",
        "n",
        "n_pos",
        (F.col("n_pos") / (F.lit(1.0) * F.col("n"))).alias("raw_rate"),
        (
            (F.col("n_pos") * F.col("gn") + F.lit(_TE_M) * F.col("gpos"))
            / (F.lit(1.0) * F.col("gn") * (F.col("n") + F.lit(_TE_M)))
        ).alias("enc_smoothed"),
    )


# ----------------------------------------------------------------------------
# Feature hashing (hashing trick) of document tokens per language
# ----------------------------------------------------------------------------

_FH_BUCKETS = 256

_FH_ORACLE = f"""
WITH toks AS (
  SELECT lang, unnest(string_split({T.sql_normalize_ws('text')}, ' ')) AS tok
  FROM documents
),
hashed AS (
  SELECT lang,
         {SK.sql_hash60("tok", salt="fh")} % {_FH_BUCKETS} AS bucket,
         CASE WHEN (({SK.sql_hash60("tok", salt="fh")} >> 8) & 1) = 1
              THEN 1 ELSE -1 END AS sgn
  FROM toks
)
SELECT lang, bucket,
       CAST(SUM(sgn) AS BIGINT) AS feat_value,
       COUNT(*) AS n_terms
FROM hashed GROUP BY 1, 2
"""


@register(
    "feature_hashing_agg",
    _FH_ORACLE,
    f"The hashing trick: tokens project into {_FH_BUCKETS} signed "
    "feature buckets (sign bit from an independent bit of the same "
    "md5 hash — the classic collision-debiasing), aggregated per "
    "language. This is how text becomes a FIXED-WIDTH feature vector "
    "with no vocabulary table at all — the feature dimension is a "
    "constant, so the shuffle is bounded by |langs| x buckets no "
    "matter how large the corpus vocabulary grows, and train/serve "
    "skew is impossible because there is no fitted state to drift. "
    "Integer-only (signed counts), hash-exact across engines.",
)
def feature_hashing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(T.ws_tokens("text")).alias("tok"))
    hashed = toks.select(
        "lang",
        (SK.hash60("tok", salt="fh") % _FH_BUCKETS).alias("bucket"),
        F.when(
            (SK.hash60("tok", salt="fh").bitwiseAND(F.lit(256)) / 256).cast("int")
            == 1,
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    return hashed.groupBy("lang", "bucket").agg(
        F.sum("sgn").cast("bigint").alias("feat_value"),
        F.count("*").alias("n_terms"),
    )


# ----------------------------------------------------------------------------
# Last-touch attribution (pair-free argmax-by-time window)
# ----------------------------------------------------------------------------

_LAST_TOUCH_ORACLE = """
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS value_micros
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.p_id, p.value_micros, t.touch_type,
         ROW_NUMBER() OVER (
           PARTITION BY p.p_id ORDER BY t.t_ts DESC, t.t_id DESC
         ) AS rn
  FROM p JOIN t
    ON p.user_id = t.user_id
   AND t.t_ts > p.p_ts - INTERVAL 7 DAY
   AND t.t_ts <= p.p_ts
)
SELECT touch_type,
       COUNT(*) AS n_conversions,
       CAST(SUM(value_micros) AS BIGINT) / 1000000.0 AS attributed_value
FROM j WHERE rn = 1
GROUP BY touch_type
"""


@register(
    "attribution_last_touch",
    _LAST_TOUCH_ORACLE,
    "Last-touch attribution: each purchase's full value credits the "
    "latest click/view in its 7-day window. PAIR-FREE like "
    "attribution_linear, but the running state is a per-user "
    "MAX(struct(t_ts, t_id, type)) — lexicographic struct max IS "
    "argmax-by-(time, id) — so every probe reads its latest preceding "
    "touch straight off one window pass; the oracle stays the "
    "pairwise interval join + ROW_NUMBER pick, so the driver check is "
    "the equivalence proof, ties included (equal timestamps resolve "
    "by event_id in both forms). O(|P|+|T|) per user, no pairs "
    "(operators/attribution.py).",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.attribution import (
        last_touch_attribution,
    )

    return last_touch_attribution(_t(spark, sf_dir, "events"))


# ----------------------------------------------------------------------------
# Time-decay attribution (pair-free per-day probe buckets)
# ----------------------------------------------------------------------------

_DECAY_ORACLE = """
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS value_micros
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.value_micros, t.touch_type,
         (epoch_us(p.p_ts) - epoch_us(t.t_ts)) // 86400000000 AS d
  FROM p JOIN t
    ON p.user_id = t.user_id
   AND t.t_ts > p.p_ts - INTERVAL 7 DAY
   AND t.t_ts <= p.p_ts
)
SELECT touch_type,
       COUNT(*) AS n_touches,
       CAST(SUM(1000 // (1::BIGINT << d)) AS BIGINT) AS decay_units_milli,
       CAST(SUM(value_micros // (1::BIGINT << d)) AS BIGINT) / 1000000.0
         AS decayed_value
FROM j GROUP BY touch_type
"""


@register(
    "attribution_time_decay",
    _DECAY_ORACLE,
    "Time-decay attribution: a touch aged d whole days at conversion "
    "time earns credit div 2^d — halving per day, exact integer "
    "arithmetic (powers of two, no float decay). PAIR-FREE like its "
    "siblings: 8 probes per purchase (one per day offset) ride the "
    "same per-user running-count window, consecutive probe "
    "differences ARE the per-day age buckets, and every touch in one "
    "bucket carries the identical credit so totals fold to count * "
    "credit. Ages are integer MICROSECONDS div day (timestamps carry "
    "sub-second precision; second-truncated ages would disagree at "
    "day boundaries). Oracle stays the pairwise join, so the driver "
    "check proves bucket-boundary equivalence too "
    "(operators/attribution.py).",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.attribution import (
        time_decay_attribution,
    )

    return time_decay_attribution(_t(spark, sf_dir, "events"))


# ----------------------------------------------------------------------------
# KMV (K-minimum-values) sketch: distinct counts AND set intersections
# ----------------------------------------------------------------------------

_KMV_K = 32
# (k-1) * 2^60: the KMV estimator numerator, exact in a double
# (5-significant-bit mantissa), spelled identically on both engines
_KMV_NUM = "CAST(31 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)"

_KMV_ORACLE = f"""
WITH du AS (
  SELECT DISTINCT event_type,
         {{h}} AS h
  FROM events
),
nt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM du GROUP BY 1
),
kmv AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM du
  ) WHERE rn <= {_KMV_K}
),
arrs AS (
  SELECT k.event_type, list(k.h ORDER BY k.h) AS arr, ANY_VALUE(n.n_exact) AS n_exact
  FROM kmv k JOIN nt n ON k.event_type = n.event_type
  GROUP BY k.event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.arr AS aa, b.arr AS ba,
         a.n_exact AS n_a, b.n_exact AS n_b,
         list_sort(list_distinct(list_concat(a.arr, b.arr))) AS u_all
  FROM arrs a JOIN arrs b ON a.event_type < b.event_type
),
calc AS (
  SELECT type_a, type_b, n_a, n_b,
    CASE WHEN n_a <= {_KMV_K} THEN CAST(n_a AS DOUBLE)
         ELSE ({_KMV_NUM}) / CAST(aa[{_KMV_K}] AS DOUBLE) END AS est_a,
    CASE WHEN n_b <= {_KMV_K} THEN CAST(n_b AS DOUBLE)
         ELSE ({_KMV_NUM}) / CAST(ba[{_KMV_K}] AS DOUBLE) END AS est_b,
    CASE WHEN n_a <= {_KMV_K} AND n_b <= {_KMV_K}
         THEN CAST(len(u_all) AS DOUBLE)
         ELSE ({_KMV_NUM}) / CAST(u_all[{_KMV_K}] AS DOUBLE) END AS est_union,
    CAST(len(list_intersect(u_all[1:{_KMV_K}],
                            list_intersect(aa, ba))) AS DOUBLE)
      / LEAST({_KMV_K}, len(u_all)) AS jaccard_est
  FROM pairs
),
exact AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS exact_intersection
  FROM du a JOIN du b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT c.type_a, c.type_b, c.n_a, c.n_b, c.est_a, c.est_b,
       c.jaccard_est,
       c.jaccard_est * c.est_union AS est_intersection,
       COALESCE(e.exact_intersection, 0) AS exact_intersection
FROM calc c LEFT JOIN exact e
  ON c.type_a = e.type_a AND c.type_b = e.type_b
ORDER BY c.type_a, c.type_b
"""


@register(
    "kmv_distinct_intersection",
    _KMV_ORACLE.format(h=SK.sql_hash60("CAST(user_id AS VARCHAR)")),
    f"KMV (K-minimum-values, k={_KMV_K}) sketch over per-event-type "
    "user sets: distinct estimates AND pairwise INTERSECTION estimates "
    "— the set-operation capability HLL lacks (HLL unions losslessly "
    "but cannot intersect; KMV's k smallest engine-neutral md5 hashes "
    "estimate Jaccard from the combined sketch, est_inter = "
    "jaccard * est_union). Small sets degrade to exact (sketch = "
    "complete set). The k-th hash per type comes from the selection-"
    "rank operator (no full per-type sort); every estimate is divides "
    "of exact integers in identical op order, and the exact "
    "intersection rides along as the audit column. Mergeable: union "
    "of KMV sets re-topped to k IS the sketch of the union — the "
    "shuffle carries k hashes per type, never user sets.",
)
def kmv_distinct_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from data_lakehouse_platform_spark.operators.ranking import (
        select_group_ranks,
    )

    K = _KMV_K
    du = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            SK.hash60(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
    )
    nt = du.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    theta = select_group_ranks(
        du,
        ["event_type"],
        [F.col("h")],
        bucket_key=F.col("h"),
        ranks_fn=lambda n: {min(K, n)},
    ).select("event_type", F.col("h").alias("__theta"))
    arrs = (
        du.join(F.broadcast(theta), "event_type")
        .filter(F.col("h") <= F.col("__theta"))
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("h")).alias("arr"))
        .join(nt, "event_type")
    )
    a = arrs.alias("a")
    b = arrs.alias("b")
    num = F.expr(_KMV_NUM)
    u_all = F.array_sort(
        F.array_union(F.col("a.arr"), F.col("b.arr"))
    )
    pairs = (
        a.join(F.broadcast(b), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n_exact").alias("n_a"),
            F.col("b.n_exact").alias("n_b"),
            F.col("a.arr").alias("aa"),
            F.col("b.arr").alias("ba"),
            u_all.alias("u_all"),
        )
    )
    est_a = F.when(
        F.col("n_a") <= K, F.col("n_a").cast("double")
    ).otherwise(num / F.element_at("aa", K).cast("double"))
    est_b = F.when(
        F.col("n_b") <= K, F.col("n_b").cast("double")
    ).otherwise(num / F.element_at("ba", K).cast("double"))
    est_union = F.when(
        (F.col("n_a") <= K) & (F.col("n_b") <= K),
        F.size("u_all").cast("double"),
    ).otherwise(num / F.element_at("u_all", K).cast("double"))
    jacc = F.size(
        F.array_intersect(
            F.slice("u_all", 1, K), F.array_intersect("aa", "ba")
        )
    ).cast("double") / F.least(F.lit(K), F.size("u_all"))
    exact = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    calc = pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        jacc.alias("jaccard_est"),
        (jacc * est_union).alias("est_intersection"),
    )
    return (
        calc.join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "est_a",
            "est_b",
            "jaccard_est",
            "est_intersection",
            F.coalesce(F.col("exact_intersection"), F.lit(0))
            .cast("bigint")
            .alias("exact_intersection"),
        )
        .orderBy("type_a", "type_b")
    )
