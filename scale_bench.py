#!/usr/bin/env python
"""Synthetic 10x scale lane: catch super-linear behavior before a
cluster does.

/root/testdata is read-only and tops out at sf0.1, so PLANS.md can
prove plan SHAPE but nothing at sf0.1 proves the CONSTANTS — an
accidental O(n^2) (hot-key funnel, uncapped pair explosion, driver
collect) looks fine at 600k rows and dies at 100 TB.  This lane
derives a deterministic ~10x dataset (sf1-equivalent) the same way
stress.py synthesizes its whales — pure expressions over the existing
tables, no randomness — runs the most expensive bench queries at both
sizes, and asserts:

* wall(10x) / wall(1x) <= a per-query linearity bound (13x default —
  10x data + scheduling slack on a shared box; 20x for the near-dup
  family, where 10 verbatim replicas of every document make the
  near-dup graph itself denser, a harder-than-linear INSTANCE that
  the bucket caps must still contain);
* worst-task-records(10x) <= 13x worst-task-records(1x) + slack, from
  the Spark status API, stress.py-style — wall time alone can hide a
  funnel that a bigger box would absorb.

Replication: cross-join with a 10-row replica range; every key column
is shifted by replica * 10M so replicas are disjoint entities
(TPC-H-like growth: 10x customers AND 10x orders), while fixed dims
(region, nation) and designated metadata rows (ANN pivots/seeds at
small vec_ids, query sets) stay fixed size — so driver-side state
provably does NOT scale with the data.

Run: python scale_bench.py          (writes BENCH_SCALE.json; exit 0 =
     all bounds hold).  Dataset is cached under /tmp and regenerated
     only when absent.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.error
import urllib.request

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale10")
REPLICAS = 10
STEP = 10_000_000  # > any sf0.1 key; replicas are disjoint key ranges

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# key columns shifted per replica (dims region/nation stay fixed)
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# The most expensive bench queries (r3 single-shot ranking) across the
# operator families: agg/window, sessionize, near-dup, text, star join,
# ANN, sketch.  (name, ratio bound).
QUERIES = [
    ("iqr_outlier_fences", 13.0),
    ("heavy_hitter_tokens", 13.0),
    ("sessionize_events", 13.0),
    ("dedup_minhash_lsh", 20.0),
    ("exact_substr_dedup", 20.0),
    ("q3_shipping_priority", 13.0),
    ("gold_fact_star", 13.0),
    ("revenue_bridge", 13.0),
    ("oov_rate", 13.0),
    ("ann_pq_topk", 13.0),
    # r6: the two heaviest headline queries (r5 VERDICT item 5).
    # fuzzy_match runs the deletion-signature join over DISTINCT names,
    # so the 10x verbatim-replica set collapses back to the 1x distinct
    # set — near-flat ratio expected, but keep the standard bound.
    ("fuzzy_match_customers", 13.0),
    ("graph_components_bipartite", 13.0),
    # r7 session 2: the two new heaviest headline queries.  Spearman's
    # distinct-price spine is IDENTICAL at 10x (verbatim price values,
    # keys shifted), so only the moment join scales; tv_distance's
    # vocabulary and pair grid are likewise replica-invariant — both
    # should ratio well under the standard linear bound.
    ("spearman_qty_price", 13.0),
    ("tv_distance_sources", 13.0),
    # r8: the two new heaviest headline queries.  winnowing_pairs
    # rides the near-dup bound: 10 verbatim replicas of every doc make
    # every fingerprint bucket 10x denser, so pair counts grow ~100x
    # harder than linear UNLESS the hot-fingerprint cap holds — this
    # is exactly the instance the cap exists for.  neighbor_jaccard's
    # pair growth is likewise cap-bounded per part.
    ("winnowing_pairs", 20.0),
    ("graph_neighbor_jaccard", 20.0),
    # r9: Apriori triples under an ADVERSARIAL instance — generate()
    # plants a 2,000-distinct-part whale basket in the 10x lineitem
    # (C(2000,3) = 1.3e9 candidate triples if uncapped).  The whale-
    # basket cap (queries_r8_ext._TRI_CAP) must exclude it entirely,
    # so the capped query scales with the honest baskets: standard
    # linear bound, NOT a cap-inflated one.
    ("basket_triples", 13.0),
    # r10: the two new operator families with scale-sensitive shapes.
    # bitmap_rolling_distinct: replicas shift user ids, so every day's
    # roaring bitmap holds 10x the users — bitmap build AND the 7-way
    # window unions scale linearly in set size (the point of the
    # sketch: the second stage stays bitmap-sized, never event-sized).
    # ddsketch_quantiles: bucket state is O(1) per priority by
    # construction, so only the scan scales — expect well under the
    # linear bound; a ratio near it would mean the sketch state leaked
    # row-count dependence.
    ("bitmap_rolling_distinct", 13.0),
    ("ddsketch_quantiles", 13.0),
    # r11 (r10 verdict Next-round #8): the wave-2 rewrites added
    # input-scaled persists / checkpointed loops whose cache widths
    # must be proven at 10x.  graph_bfs's frontier is replica-disjoint
    # (components don't cross replicas), kmeans' training passes scale
    # with the fanned corpus, recommend_eligible's top-(M+1) candidate
    # bound must stay bounded when eligible customers are 10x.
    ("graph_bfs_depth3", 13.0),
    ("kmeans_cells", 13.0),
    ("recommend_eligible", 13.0),
]

# The whale basket planted into the 10x lineitem: one order far outside
# every shifted key range holding this many distinct parts.
WHALE_ORDERKEY = STEP * (REPLICAS + 5)
WHALE_PARTS = 2_000


def generate(spark) -> None:
    marker = os.path.join(DST, "_GENERATED.json")
    want = {"src": SRC, "replicas": REPLICAS, "step": STEP, "v": 2,
            "whale_parts": WHALE_PARTS}
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == want:
                return
        shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    from data_lakehouse_platform_spark.catalog import load_table

    reps = F.explode(
        F.array(*[F.lit(i) for i in range(REPLICAS)])
    ).alias("__r")
    for t in TABLES:
        df = load_table(spark, SRC, t)
        cols = SHIFT_COLS.get(t)
        out = os.path.join(DST, f"{t}.parquet")
        if not cols:
            df.write.mode("overwrite").parquet(out)
            continue
        dtypes = dict(df.dtypes)
        scaled = df.select("*", reps)
        for c in cols:
            # shift, then cast back so the scaled schema matches 1x
            scaled = scaled.withColumn(
                c,
                (F.col(c) + F.col("__r") * F.lit(STEP)).cast(dtypes[c]),
            )
        scaled = scaled.drop("__r").repartition(32)
        if t == "lineitem":
            # plant the whale basket: one bot order with WHALE_PARTS
            # distinct parts, built by cloning the first WHALE_PARTS
            # lineitem rows and overriding the basket keys.  Every
            # other column keeps realistic values so non-basket
            # queries see it as ordinary (tiny) noise.
            template = df.limit(WHALE_PARTS)
            widx = F.row_number().over(
                Window.orderBy(F.monotonically_increasing_id())
            )
            whale = (
                template.withColumn("__i", widx)
                .withColumn(
                    "l_orderkey",
                    F.lit(WHALE_ORDERKEY).cast(dtypes["l_orderkey"]),
                )
                .withColumn(
                    "l_partkey",
                    (F.lit(WHALE_ORDERKEY) + F.col("__i")).cast(
                        dtypes["l_partkey"]
                    ),
                )
                .drop("__i")
            )
            scaled = scaled.unionByName(whale)
        scaled.write.mode("overwrite").parquet(out)
    with open(marker, "w") as fh:
        json.dump(want, fh)


# -- status API (stress.py's worst-task probe) --------------------------


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def _last_stage(spark) -> int:
    stages = _api(spark, "/stages?status=COMPLETE")
    return max((s["stageId"] for s in stages), default=-1)


def _max_task_records(spark, since_stage: int) -> int:
    worst = 0
    for s in _api(spark, "/stages?status=COMPLETE"):
        if s["stageId"] <= since_stage:
            continue
        try:
            ts = _api(
                spark,
                f"/stages/{s['stageId']}/{s['attemptId']}"
                "/taskSummary?quantiles=1.0",
            )
        except urllib.error.HTTPError:
            continue
        shuffle = int(
            ts.get("shuffleReadMetrics", {}).get("readRecords", [0])[0]
        )
        scan = int(ts.get("inputMetrics", {}).get("recordsRead", [0])[0])
        worst = max(worst, shuffle, scan)
    return worst


def _run(spark, fn, sf_dir) -> tuple[float, int]:
    """min wall over 2 runs (shakes JIT/IO noise) + worst task records
    of the faster run."""
    best = (float("inf"), 0)
    for _ in range(2):
        spark.catalog.clearCache()
        mark = _last_stage(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        if wall < best[0]:
            best = (wall, _max_task_records(spark, mark))
    return best


def main() -> None:
    from data_lakehouse_platform_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        "dlp-scale-bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "4000",
            "spark.sql.shuffle.partitions": "32",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    generate(spark)
    gen_wall = time.perf_counter() - t0

    qmap = entry.queries()
    failures: list[str] = []
    results: dict[str, dict] = {}
    for name, bound in QUERIES:
        fn = qmap[name]
        w1, t1 = _run(spark, fn, SRC)
        w10, t10 = _run(spark, fn, DST)
        # sub-0.3s walls are scheduling noise; don't divide by them
        ratio = w10 / max(w1, 0.3)
        task_ratio = t10 / max(t1, 1)
        results[name] = {
            "wall_1x": round(w1, 3),
            "wall_10x": round(w10, 3),
            "ratio": round(ratio, 2),
            "bound": bound,
            "worst_task_1x": t1,
            "worst_task_10x": t10,
            "task_ratio": round(task_ratio, 2),
        }
        status = "ok"
        if ratio > bound:
            status = "WALL"
            failures.append(
                f"{name}: wall ratio {ratio:.1f}x > bound {bound}x "
                f"({w1:.2f}s -> {w10:.2f}s)"
            )
        # worst task must scale at most linearly too (a funnel can hide
        # inside an acceptable wall on a 32-core box); +50k absolute
        # slack for small-task noise
        if t10 > 13 * t1 + 50_000:
            status = "TASK"
            failures.append(
                f"{name}: worst task {t10:,} > 13x 1x-task {t1:,} + 50k "
                "— a task is absorbing super-linear share"
            )
        print(
            f"[{name}] 1x={w1:.2f}s 10x={w10:.2f}s ratio={ratio:.1f} "
            f"task {t1:,}->{t10:,} {status}",
            flush=True,
        )

    payload = {
        "metric": "scale_lane_10x",
        "replicas": REPLICAS,
        "src": SRC,
        "gen_wall_sec": round(gen_wall, 1),
        "queries": results,
        "bounds_hold": not failures,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_SCALE.json"),
        "w",
    ) as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["ratio"] for k, v in results.items()}))
    if failures:
        for f in failures:
            print(f"FAIL {f}")
        sys.exit(1)
    print("ALL SCALE BOUNDS HOLD")


if __name__ == "__main__":
    main()
