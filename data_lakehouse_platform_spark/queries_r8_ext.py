"""Round-8 registry additions.

Registered AFTER every pre-existing module (see the import order note
in :func:`queries.all_queries`): the external driver grades the first
50 registry keys by registration order, so new entries only ever
append.

First batch: the scale-production twin of MinHash+LSH with the
hot-bucket cap actually firing (VERDICT r7 "Next round" #2) — the form
you'd run at 100 TB gets its own value-hashed correctness row instead
of resting on stress shape 2 alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.operators import dedup as D
from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import register
from data_lakehouse_platform_spark.queries_llm import _BANDS, _N_HASHES, _minhash_ctes


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Cap chosen to BIND at board scale: sf0.01's bucket-size histogram is
# {1: ~1.8k, 2: 80, 3: 3}, so cap=2 demonstrably drops the size-3
# buckets and the board hash-checks the dropped-bucket semantics —
# which bucket members lose their pairs and which pairs survive via
# OTHER (small) bands — against DuckDB.  The production cap (1000,
# queries_llm._LSH_MAX_BUCKET) never fires at driver SFs, so without
# this twin the gate's firing path would be stress-proven (stress.py
# shape 2: a 10k identical-doc crowd) but never value-checked.
_LSH_DEMO_CAP = 2


@register(
    "dedup_minhash_lsh_capped",
    f"""
WITH {_minhash_ctes(cap=_LSH_DEMO_CAP)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM banded a
JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    "The 100-TB form of MinHash+LSH with the hot-bucket cap actually "
    "FIRING: band buckets holding more than max_bucket docs are dropped "
    "from pair generation (their members are near-identical crowds that "
    "dedup_exact collapses first), bounding any single reducer's pair "
    "fan-out at cap^2/2. The cap here (2) is set to bind at board scale "
    "so the gate's semantics — not just its plan shape — carry a green "
    "correctness row; production uses 1000.",
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = T.explode_shingles(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, distinct=False
    )
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    return D.lsh_candidate_pairs(
        sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_DEMO_CAP
    )


# ----------------------------------------------------------------------------
# Event-mix Gini impurity per user
# ----------------------------------------------------------------------------

_IMPURITY_ORACLE = """
WITH per_type AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT)     AS n_events,
         CAST(COUNT(*) AS BIGINT)   AS n_types,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per_type GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       1.0 - CAST(s2 AS DOUBLE)
           / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
       AS impurity
FROM per_user
"""


@register(
    "event_mix_impurity",
    _IMPURITY_ORACLE,
    "Gini impurity (1 - sum p_i^2) of each user's event-type mix — the "
    "behavioral-diversity score a segmentation pipeline ranks users by. "
    "Impurity is RATIONAL in the type counts, so it computes from two "
    "exact integer sums and one final double expression (identical op "
    "sequence both engines) — no log calls whose last-ulp behavior "
    "differs across libm implementations, which is why this engine's "
    "diversity family (Simpson, Gini, TV distance) is impurity-based. "
    "Two map-combinable shuffles keyed by user: no skew wall at 1e9 "
    "users.",
)
def event_mix_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    per_type = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_user = per_type.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return per_user.selectExpr(
        "user_id",
        "n_events",
        "n_types",
        "1.0D - CAST(s2 AS DOUBLE) / "
        "(CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)) "
        "AS impurity",
    )


# ----------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken local selection)
# ----------------------------------------------------------------------------

_WIN_K = 4  # word-shingle width
_WIN_W = 5  # selection window (shingle positions)


def _winnow_oracle() -> str:
    from data_lakehouse_platform_spark.operators.text import (
        sql_normalize_ws,
    )

    terms = " || ' ' || ".join(f"toks[pos + {j}]" for j in range(_WIN_K))
    return f"""
WITH norm_docs AS (
  SELECT doc_id, string_split({sql_normalize_ws('text')}, ' ') AS toks
  FROM documents
),
pos_sh AS (
  SELECT doc_id, toks,
         unnest(CASE WHEN len(toks) >= {_WIN_K}
                     THEN range(1, len(toks) - {_WIN_K - 2})
                     ELSE [] END) AS pos
  FROM norm_docs
),
hashed AS (
  SELECT doc_id, pos, md5({terms}) AS h FROM pos_sh
),
winmin AS (
  SELECT doc_id, pos, h,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {_WIN_W - 1} PRECEDING
                      AND CURRENT ROW) AS wmin
  FROM hashed
),
sel AS (
  SELECT doc_id, h FROM winmin
  WHERE pos >= {_WIN_W} AND h = wmin
)
SELECT s.doc_id,
       CAST(t.n_shingles AS BIGINT)  AS n_shingles,
       CAST(COUNT(*) AS BIGINT)      AS n_selected,
       CAST(COUNT(DISTINCT s.h) AS BIGINT) AS n_fp
FROM sel s
JOIN (SELECT doc_id, COUNT(*) AS n_shingles FROM hashed GROUP BY 1) t
  ON s.doc_id = t.doc_id
GROUP BY s.doc_id, t.n_shingles
"""


@register(
    "winnowing_fingerprint",
    _winnow_oracle(),
    f"Winnowing fingerprint selection (the MOSS algorithm): hash every "
    f"{_WIN_K}-word shingle, keep a shingle where its hash is the "
    f"minimum of the trailing {_WIN_W}-position window — guaranteeing "
    "any match of >= w+k-1 words shares a fingerprint while storing "
    "only ~2/(w+1) of the hashes, the classic storage/recall point for "
    "corpus-scale plagiarism and near-dup detection. Per doc: shingle "
    "count, selected positions, distinct fingerprints. All integers; "
    "the window min is a per-doc (high-cardinality-partitioned) sort — "
    "no global sort, no skew wall.",
)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_lakehouse_platform_spark.operators.text import (
        shingle_expr,
        ws_tokens,
    )

    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens("text").alias("toks")
    )
    hashed = toks.select(
        "doc_id",
        F.posexplode(shingle_expr("toks", _WIN_K)).alias("pos", "sh"),
    ).select("doc_id", "pos", F.md5(F.col("sh").cast("binary")).alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(_WIN_W - 1), 0
    )
    winmin = hashed.withColumn("wmin", F.min("h").over(win))
    sel = winmin.filter(
        (F.col("pos") >= _WIN_W - 1) & (F.col("h") == F.col("wmin"))
    )
    totals = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return (
        sel.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.countDistinct("h").alias("n_fp"),
        )
        .join(totals, "doc_id")
        .select("doc_id", "n_shingles", "n_selected", "n_fp")
    )


# ----------------------------------------------------------------------------
# Co-purchase neighbor Jaccard (bipartite customer-part graph)
# ----------------------------------------------------------------------------

_NJ_CAP = 40  # max buyers per part admitted to pair generation
_NJ_TOPK = 20

_NJ_ORACLE = f"""
WITH edges_all AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ok_parts AS (
  SELECT p FROM edges_all GROUP BY p HAVING COUNT(*) <= {_NJ_CAP}
),
edges AS (
  SELECT e.c, e.p FROM edges_all e JOIN ok_parts USING (p)
),
deg AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY c
),
pairs AS (
  SELECT a.c AS cust_a, b.c AS cust_b,
         CAST(COUNT(*) AS BIGINT) AS shared_parts
  FROM edges a JOIN edges b ON a.p = b.p AND a.c < b.c
  GROUP BY 1, 2
)
SELECT cust_a, cust_b, shared_parts,
       da.d AS deg_a, db.d AS deg_b,
       CAST(shared_parts AS DOUBLE)
         / CAST(da.d + db.d - shared_parts AS DOUBLE) AS jaccard
FROM pairs
JOIN deg da ON cust_a = da.c
JOIN deg db ON cust_b = db.c
ORDER BY jaccard DESC, cust_a, cust_b
LIMIT {_NJ_TOPK}
"""


@register(
    "graph_neighbor_jaccard",
    _NJ_ORACLE,
    "Neighbor-set Jaccard similarity between customers on the bipartite "
    "customer-part co-purchase graph — the item-based collaborative-"
    f"filtering primitive. Pair generation is bounded by the {_NJ_CAP}-"
    "buyer hot-part cap (a part everyone buys is a stop-item that "
    "carries no signal and would emit B^2/2 pairs from one reducer — "
    "the same cap discipline as LSH banding, expressed as HAVING "
    "COUNT <= cap in both engines, so capped semantics are value-"
    "checked). Jaccard is one double division over exact integer "
    "degrees; top-k with full tiebreakers.",
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_all = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        # r11 (guide §2.4): ONE exchange keyed on p serves everything
        # downstream — hash(p) clusters equal (c, p) rows, so the
        # dedup, the per-part stop-item counts, and both pair-join
        # sides all reuse this partitioning instead of re-shuffling
        # the fact-sized edge list (23 -> 19 exchanges, 7 -> 3 SMJ).
        .repartition(n_shuffle, "p")
        .dropDuplicates(["c", "p"])
    )
    # the fact-sized lineitem⋈orders + dedup feeds BOTH the stop-item
    # cap aggregate and the capped edge build: keep the edge index (two
    # longs per distinct (customer, part)), don't rebuild it per consumer
    # — the winnowing_pairs discipline
    edges_all = edges_all.persist(StorageLevel.MEMORY_AND_DISK)
    # r11: filter with the INVERSE list — parts OVER the cap.  The
    # stop-item list is tiny and stays tiny at any SF (hot parts, the
    # thing the cap exists to drop), so it broadcasts safely at 100 TB,
    # while the old ok_parts side grew with |parts|; the broadcast anti
    # join also keeps edges map-side on the cached p-partitioned index.
    hot_parts = (
        edges_all.groupBy("p")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > _NJ_CAP)
        .select("p")
    )
    # capped edges feed the degree pass AND both pair-join sides (3
    # consumers): persist, so the anti join runs once
    edges = edges_all.join(F.broadcast(hot_parts), "p", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = edges.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    a = edges.select(F.col("c").alias("cust_a"), "p")
    b = edges.select(F.col("c").alias("cust_b"), "p")
    pairs = (
        a.join(b, "p")
        .filter(F.col("cust_a") < F.col("cust_b"))
        .groupBy("cust_a", "cust_b")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
    )
    da = deg.select(F.col("c").alias("cust_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("c").alias("cust_b"), F.col("d").alias("deg_b"))
    out = (
        pairs.join(da, "cust_a")
        .join(db, "cust_b")
        .select(
            "cust_a", "cust_b", "shared_parts", "deg_a", "deg_b",
            (
                F.col("shared_parts").cast("double")
                / (
                    F.col("deg_a") + F.col("deg_b")
                    - F.col("shared_parts")
                ).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.orderBy(
        F.col("jaccard").desc(), "cust_a", "cust_b"
    ).limit(_NJ_TOPK)


# ----------------------------------------------------------------------------
# Apriori 3-itemset candidates (basket-bounded triple join)
# ----------------------------------------------------------------------------

_TRI_TOPK = 25
# Whale-basket cap: a basket with more items than this is dropped from
# triple generation (C(items,3) per basket goes cubic on a bot order
# with thousands of lines; a whale basket carries no bundle signal).
# 64 never fires at board SFs (max basket 13 at sf0.01) so the board
# row stays value-exact; the scale lane plants a 2,000-item whale that
# this cap excludes (see scale_bench.py).  basket_triples_capped in
# queries_r9_ext sets a low cap that FIRES at board scale so the
# dropped-basket semantics are value-checked, the
# dedup_minhash_lsh_capped discipline.
_TRI_CAP = 64


def _tri_oracle(cap: int) -> str:
    return f"""
WITH items_all AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
ok AS (
  SELECT o FROM items_all GROUP BY o HAVING COUNT(*) <= {cap}
),
items AS (
  SELECT items_all.* FROM items_all JOIN ok USING (o)
),
triples AS (
  SELECT a.p AS p1, b.p AS p2, c.p AS p3,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM items a
  JOIN items b ON a.o = b.o AND a.p < b.p
  JOIN items c ON b.o = c.o AND b.p < c.p
  GROUP BY 1, 2, 3
)
SELECT p1, p2, p3, support FROM triples
ORDER BY support DESC, p1, p2, p3
LIMIT {_TRI_TOPK}
"""


_TRI_ORACLE = _tri_oracle(_TRI_CAP)


@register(
    "basket_triples",
    _TRI_ORACLE,
    "Apriori 3-itemset candidate generation over order baskets — the "
    "step whose naive form explodes at scale. Both joins are keyed on "
    "the ORDER, so triple fan-out per basket is C(items,3) (baskets are "
    "single-digit), never corpus-shaped — and a whale-basket cap "
    f"(HAVING COUNT <= {_TRI_CAP} in both engines) excludes bot orders "
    "whose cubic fan-out would otherwise funnel one reducer; candidate "
    "counts then shuffle with map-side combine. Extends "
    "market_basket_pairs to the 3-way associations a bundle-"
    "recommendation flow mines. Top-k with full column tiebreakers.",
)
def basket_triples(
    spark: SparkSession, sf_dir: str, cap: int = _TRI_CAP
) -> DataFrame:
    from pyspark.sql import functions as F

    items_all = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ok = (
        items_all.groupBy("o")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= cap)
        .select("o")
    )
    items = items_all.join(ok, "o")
    a = items.select("o", F.col("p").alias("p1"))
    b = items.select("o", F.col("p").alias("p2"))
    c = items.select("o", F.col("p").alias("p3"))
    triples = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .join(c, "o")
        .filter(F.col("p2") < F.col("p3"))
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return triples.orderBy(
        F.col("support").desc(), "p1", "p2", "p3"
    ).limit(_TRI_TOPK)


# ----------------------------------------------------------------------------
# 30-day rolling correlation of daily revenue vs daily quantity
# ----------------------------------------------------------------------------

_RC_W = 30

_RC_ORACLE = f"""
WITH observed AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS xi,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS yi
  FROM lineitem GROUP BY 1
),
grid AS (
  SELECT CAST(unnest(generate_series(MIN(day), MAX(day),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM observed
),
daily AS (
  SELECT g.day,
         COALESCE(o.xi, 0) AS xi,
         COALESCE(o.yi, 0) AS yi
  FROM grid g LEFT JOIN observed o ON g.day = o.day
),
terms AS (
  SELECT day,
         CAST(xi AS DECIMAL(38,0)) AS x,
         CAST(yi AS DECIMAL(38,0)) AS y,
         CAST(xi AS DECIMAL(38,0)) * xi AS xx,
         CAST(yi AS DECIMAL(38,0)) * yi AS yy,
         CAST(xi AS DECIMAL(38,0)) * yi AS xy
  FROM daily
),
win AS (
  SELECT day,
         CAST(COUNT(*) OVER w AS DOUBLE)  AS n,
         CAST(SUM(x) OVER w AS DOUBLE)    AS sx,
         CAST(SUM(y) OVER w AS DOUBLE)    AS sy,
         CAST(SUM(xx) OVER w AS DOUBLE)   AS sxx,
         CAST(SUM(yy) OVER w AS DOUBLE)   AS syy,
         CAST(SUM(xy) OVER w AS DOUBLE)   AS sxy
  FROM terms
  WINDOW w AS (ORDER BY day
               ROWS BETWEEN {_RC_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT day,
       (n * sxy - sx * sy)
         / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
         AS corr_30d
FROM win WHERE n = {_RC_W}
"""


@register(
    "rolling_corr_30d",
    _RC_ORACLE,
    f"{_RC_W}-day rolling Pearson correlation between daily shipped "
    "quantity and daily revenue — the co-movement monitor a demand-"
    "pricing dashboard plots. Daily integer moments accumulate exactly "
    "(DECIMAL window sums over fixed-point cents), one closed-form "
    "double expression per emitted day; only FULL windows emit. The "
    "window runs over the DENSIFIED ~2,400-day calendar spine "
    "(sequence + left join, zero-activity days contribute (0,0) — the "
    "resample_ffill grid pattern), so '30-day' means 30 CALENDAR days "
    "even on a sparse series, never 30 observations.",
)
def rolling_corr_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    observed = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.sum(F.floor("l_quantity").cast("long"))
            .cast("long")
            .alias("xi"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("yi"),
        )
    )
    # densify: the window must slide over CALENDAR days, not observed
    # rows — a sparse series would otherwise silently turn "30-day"
    # into "30-observation".  Grid rows ~ span (thousands), missing
    # days are genuine (0, 0) observations.
    grid = observed.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = grid.join(observed, "day", "left").select(
        "day",
        F.coalesce("xi", F.lit(0)).alias("xi"),
        F.coalesce("yi", F.lit(0)).alias("yi"),
    )
    dec = "decimal(38,0)"
    terms = daily.select(
        "day",
        F.col("xi").cast(dec).alias("x"),
        F.col("yi").cast(dec).alias("y"),
        (F.col("xi").cast(dec) * F.col("xi")).alias("xx"),
        (F.col("yi").cast(dec) * F.col("yi")).alias("yy"),
        (F.col("xi").cast(dec) * F.col("yi")).alias("xy"),
    )
    w = Window.orderBy("day").rowsBetween(-(_RC_W - 1), 0)
    win = terms.select(
        "day",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("x").over(w).cast("double").alias("sx"),
        F.sum("y").over(w).cast("double").alias("sy"),
        F.sum("xx").over(w).cast("double").alias("sxx"),
        F.sum("yy").over(w).cast("double").alias("syy"),
        F.sum("xy").over(w).cast("double").alias("sxy"),
    )
    return win.filter(F.col("n") == _RC_W).selectExpr(
        "day",
        "(n * sxy - sx * sy) / "
        "(SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_30d",
    )


# ----------------------------------------------------------------------------
# Winnowing near-dup pairs (fingerprint-bucket join)
# ----------------------------------------------------------------------------

_WP_CAP = 20  # max docs sharing one fingerprint admitted to pairing
_WP_MIN_SHARED = 2


def _winnow_pairs_oracle() -> str:
    from data_lakehouse_platform_spark.operators.text import (
        sql_normalize_ws,
    )

    terms = " || ' ' || ".join(f"toks[pos + {j}]" for j in range(_WIN_K))
    return f"""
WITH norm_docs AS (
  SELECT doc_id, string_split({sql_normalize_ws('text')}, ' ') AS toks
  FROM documents
),
pos_sh AS (
  SELECT doc_id, toks,
         unnest(CASE WHEN len(toks) >= {_WIN_K}
                     THEN range(1, len(toks) - {_WIN_K - 2})
                     ELSE [] END) AS pos
  FROM norm_docs
),
hashed AS (
  SELECT doc_id, pos, md5({terms}) AS h FROM pos_sh
),
winmin AS (
  SELECT doc_id, pos, h,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {_WIN_W - 1} PRECEDING
                      AND CURRENT ROW) AS wmin
  FROM hashed
),
fp AS (
  SELECT DISTINCT doc_id, h FROM winmin
  WHERE pos >= {_WIN_W} AND h = wmin
),
ok_fp AS (
  SELECT h FROM fp GROUP BY h HAVING COUNT(*) <= {_WP_CAP}
),
fpc AS (
  SELECT f.doc_id, f.h FROM fp f JOIN ok_fp USING (h)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fp
FROM fpc a JOIN fpc b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {_WP_MIN_SHARED}
"""


@register(
    "winnowing_pairs",
    _winnow_pairs_oracle(),
    f"Near-dup candidate pairs from shared winnowing fingerprints — "
    f"the MOSS matching step: docs sharing >= {_WP_MIN_SHARED} "
    "selected fingerprints (winnowing guarantees any w+k-1-word match "
    "shares one, so requiring 2 suppresses single-collision noise). "
    f"Pair generation bucket-bounded by the {_WP_CAP}-doc hot-"
    "fingerprint cap (boilerplate shared by everyone is a stop-"
    "fingerprint — same discipline as LSH banding, gate mirrored in "
    "the oracle's HAVING). An independent recall channel beside "
    "MinHash-LSH: winnowing catches short verbatim spans LSH's "
    "whole-doc signatures dilute.",
)
def winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_lakehouse_platform_spark.operators.text import (
        shingle_expr,
        ws_tokens,
    )

    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens("text").alias("toks")
    )
    hashed = toks.select(
        "doc_id",
        F.posexplode(shingle_expr("toks", _WIN_K)).alias("pos", "sh"),
    ).select("doc_id", "pos", F.md5(F.col("sh").cast("binary")).alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(_WIN_W - 1), 0
    )
    fp = (
        hashed.withColumn("wmin", F.min("h").over(win))
        .filter(
            (F.col("pos") >= _WIN_W - 1) & (F.col("h") == F.col("wmin"))
        )
        .select("doc_id", "h")
        .distinct()
    )
    # both the cap aggregate and both join sides consume fp: keep the
    # fingerprint index (n_docs x selected-density narrow rows), don't
    # re-run the shingle+window pipeline per consumer
    fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
    ok = (
        fp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= _WP_CAP)
        .select("h")
    )
    fpc = fp.join(ok, "h")
    a = fpc.select(F.col("doc_id").alias("doc_a"), "h")
    b = fpc.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= _WP_MIN_SHARED)
    )


# ----------------------------------------------------------------------------
# Odds ratio: deep discount vs returns (Haldane-Anscombe corrected)
# ----------------------------------------------------------------------------

_OR_ORACLE = """
WITH cells AS (
  SELECT l_linestatus,
         CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM lineitem GROUP BY l_linestatus
)
SELECT l_linestatus, a, b, c, d,
       ((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5))
         / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5))
         AS odds_ratio
FROM cells
"""


@register(
    "odds_ratio_discount_return",
    _OR_ORACLE,
    "Odds ratio of RETURN given deep discount (>= 5%), per line "
    "status, with the Haldane-Anscombe +0.5 correction so empty cells "
    "never divide by zero — the 2x2 effect-size companion to the "
    "chi-square/Cramer's-V family. One map-side-combinable aggregate "
    "over four conditional counts; the ratio is one shared double "
    "expression (identical op sequence both engines, no logs).",
)
def odds_ratio_discount_return(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem")
    deep = F.col("l_discount") >= 0.05
    ret = F.col("l_returnflag") == "R"

    def _n(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    cells = li.groupBy("l_linestatus").agg(
        _n(deep & ret).alias("a"),
        _n(deep & ~ret).alias("b"),
        _n(~deep & ret).alias("c"),
        _n(~deep & ~ret).alias("d"),
    )
    return cells.selectExpr(
        "l_linestatus", "a", "b", "c", "d",
        "((CAST(a AS DOUBLE) + 0.5D) * (CAST(d AS DOUBLE) + 0.5D)) / "
        "((CAST(b AS DOUBLE) + 0.5D) * (CAST(c AS DOUBLE) + 0.5D)) "
        "AS odds_ratio",
    )
