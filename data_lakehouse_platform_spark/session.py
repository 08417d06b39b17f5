"""Tuned SparkSession factory.

Scale posture: AQE on (runtime coalesce + skew-join), Arrow on for the
few Pandas-UDF operators, shuffle partitions sized for the local test
harness but overridable for cluster deploys (set
``spark.sql.shuffle.partitions`` ~2-3x total cores on a real cluster,
or leave AQE coalescing to shrink it).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-lakehouse-platform-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with scale-sane defaults.

    Local test harness: ``local[$SPARK_GRAFT_CPUS]`` (default 32).
    On a real cluster the same conf applies minus the master override.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Runtime re-planning: partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOT set: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning.
        # Measured in the r10 optimization round: letting AQE coalesce
        # the plans being persisted shrinks task counts (fuzzy_match
        # 539->134) but SERIALIZES the CPU-dense downstream stages the
        # pair-generation operators persist for (deletion-variant
        # explosion, Levenshtein verify are heavy per row yet tiny in
        # bytes, so byte-sized coalescing collapses them to 1-2 tasks:
        # fuzzy_match 3.2s -> 7.4s, graph_neighbor_jaccard 2.8s ->
        # 5.6s).  AQE coalescing optimizes shuffle bytes and is blind
        # to CPU density — keep cached-plan partitioning pinned.
        # Arrow batches for the Pandas-UDF operators (asof fallback,
        # multimodal); irrelevant to the pure-JVM hot paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dims under this size auto-broadcast; explicit broadcast()
        # hints are still used where we *know* the side is a dim.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge joins: skips both sort
        # passes (measured ~2x on the fact-fact joins here). Safe at
        # scale — this is a *preference*, Spark still requires the
        # build side to pass its per-partition size heuristic and
        # falls back to SMJ otherwise, and AQE re-splits skewed
        # partitions first.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Managed-table root for bucketed tables (writers.write_bucketed);
        # point at real table storage on a cluster deploy.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/dlp-warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
