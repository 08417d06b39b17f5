"""Lakehouse write-side operations over plain parquet.

The reference gets merge/SCD2 from Delta Lake (gold_dim_products.py
uses DeltaTable.merge); Delta isn't available in this container, so
the same table semantics are provided as rewrite operations with a
stage-then-swap protocol:

    write new state to <path>__stage → atomically swap directories

On a real deployment these map 1:1 onto Delta/Iceberg MERGE /
OPTIMIZE / partitioned APPEND — the call sites keep the same shape.
Scale notes per function.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame, path: str, date_col: str, mode: str = "append"
) -> None:
    """year/month/day hive-partitioned parquet append — the reference's
    bronze layout (bronze_dimension_fact_load.py:95-99). Partition
    pruning then makes incremental reads touch only new days."""
    (
        df.withColumn("year", F.year(date_col))
        .withColumn("month", F.month(date_col))
        .withColumn("day", F.dayofmonth(date_col))
        .write.partitionBy("year", "month", "day")
        .mode(mode)
        .parquet(path)
    )


def incremental_append(
    spark: SparkSession, target_path: str, source: DataFrame, ts_col: str
) -> int:
    """Watermark incremental load (bronze_dimension_fact_load.py:
    71-92): append only rows newer than the target's high-water mark;
    full load when the target doesn't exist. Returns rows written.

    The watermark is a single-row aggregate over the target — with a
    date-partitioned target this reads only footer stats, not data.
    """
    if _exists(target_path):
        hw = spark.read.parquet(target_path).agg(F.max(ts_col)).first()[0]
        if hw is None:
            # target exists but holds no usable watermark (all-null
            # ts): `> NULL` would silently drop EVERY source row
            # forever — fall back to a full load instead.
            new_rows = source
        else:
            new_rows = source.filter(F.col(ts_col) > F.lit(hw))
    else:
        new_rows = source
    # Count once via an accumulator-free path: write, then read back
    # footer counts would re-scan; a cached count here is acceptable
    # because callers want the number for logging/monitoring.
    new_rows = new_rows.cache()
    n = new_rows.count()
    if n > 0:
        new_rows.write.mode("append").parquet(target_path)
    new_rows.unpersist()
    return n


def compact(
    spark: SparkSession, path: str, target_partitions: int | None = None
) -> int:
    """Small-file compaction (the OPTIMIZE of a parquet table): rewrite
    to target_partitions files (default: AQE-advised via coalesce from
    current count). Stage-and-swap keeps readers consistent. Returns
    the resulting file count."""
    df = spark.read.parquet(path)
    if target_partitions is None:
        target_partitions = max(1, len(df.inputFiles()) // 8)
    staged = df.repartition(target_partitions)
    _swap_write(staged, path)
    return target_partitions


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE (upsert) on plain parquet: rows in `updates` replace
    target rows with the same key; new keys are inserted.

    Implementation: target LEFT ANTI updates (one shuffle on the key)
    UNION updates, rewritten via stage-and-swap. Equivalent to Delta's
    whenMatchedUpdateAll/whenNotMatchedInsertAll
    (gold_dim_products.py:112-131) without a transaction log. At
    scale, partition-prune the target first so only affected
    partitions rewrite."""
    if not _exists(target_path):
        updates.write.mode("overwrite").parquet(target_path)
        return
    target = spark.read.parquet(target_path)
    kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    _swap_write(merged, target_path)


def scd2_merge(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str,
) -> None:
    """SCD Type 2 merge on plain parquet, the reference's gold-dim
    flow (gold_dim_products.py:66-131) without Delta:

    * change detection: md5 over tracked columns (deterministic,
      unlike the reference's xxhash64 which differs across engines);
    * matched+changed current rows are closed out (is_current=false,
      end_ts = update ts);
    * changed/new keys insert a new current version;
    * surrogate key = md5(key|start_ts) — reproducible across retries,
      no driver round-trip for a max-key offset.

    Whole-table rewrite via stage-and-swap; on Delta/Iceberg this maps
    to a single MERGE.
    """
    fingerprint = lambda df: F.md5(  # noqa: E731
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in tracked_cols]).cast("binary")
    )
    surrogate = lambda key, ts: F.md5(  # noqa: E731
        F.concat_ws("|", key.cast("string"), ts.cast("string")).cast("binary")
    )

    # Collapse the update batch to ONE row per key — the latest by ts
    # (deterministic tiebreak on the content fingerprint). This makes
    # the merge safe for cumulative/replayed sources (a re-fed old
    # version can never resurrect: only the newest row per key merges)
    # — the same last-writer-wins collapse the CDC upsert sink uses.
    from pyspark.sql import Window as _W

    updates = (
        updates.withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy(key_col).orderBy(
                    F.col(ts_col).desc(), fingerprint(updates).desc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    fresh = updates.select(
        surrogate(F.col(key_col), F.col(ts_col)).alias("row_key"),
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col(ts_col).alias("start_ts"),
        # end_ts takes the SOURCE ts column's type (timestamp, date, or
        # an integer version/watermark column all work) — close-out
        # assigns start_ts values into it, so the types must agree.
        F.lit(None).cast(updates.schema[ts_col].dataType).alias("end_ts"),
        F.lit(True).alias("is_current"),
        fingerprint(updates).alias("__fp"),
    )

    if not _exists(target_path):
        fresh.drop("__fp").write.mode("overwrite").parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    tgt = target.withColumn("__fp", fingerprint(target))

    cur = tgt.filter(F.col("is_current"))
    hist = tgt.filter(~F.col("is_current"))

    upd = fresh.select(
        F.col(key_col).alias("__k"),
        F.col("__fp").alias("__new_fp"),
        F.col("start_ts").alias("__new_ts"),
    )
    # Close out current rows whose tracked content changed — but ONLY
    # for updates strictly NEWER than the current row's start_ts: a
    # replayed/backfilled batch carrying an older version must never
    # close a newer row (end_ts before its own start_ts) and regress
    # the dimension to stale content.
    changed = (
        F.col("__new_fp").isNotNull()
        & (F.col("__new_fp") != F.col("__fp"))
        & (F.col("__new_ts") > F.col("start_ts"))
    )
    joined = cur.join(upd, cur[key_col] == upd["__k"], "left")
    closed = joined.select(
        *[
            F.when(changed, F.col("__new_ts"))
            .otherwise(F.col("end_ts"))
            .alias("end_ts")
            if c == "end_ts"
            else (
                F.when(changed, F.lit(False))
                .otherwise(F.col("is_current"))
                .alias("is_current")
                if c == "is_current"
                else F.col(c)
            )
            for c in target.columns
        ]
    )
    # Insert new versions only for changed-and-newer or brand-new keys
    # (the same staleness guard as the close-out, so close and insert
    # always agree).
    cur_fp = cur.select(
        F.col(key_col).alias("__ck"),
        F.col("__fp").alias("__cur_fp"),
        F.col("start_ts").alias("__cur_start"),
    )
    inserts = (
        fresh.join(cur_fp, fresh[key_col] == cur_fp["__ck"], "left")
        .filter(
            F.col("__cur_fp").isNull()
            | (
                (F.col("__cur_fp") != F.col("__fp"))
                & (F.col("start_ts") > F.col("__cur_start"))
            )
        )
        .select(*target.columns)
    )
    merged = hist.select(*target.columns).unionByName(closed).unionByName(inserts)
    _swap_write(merged, target_path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed parquet table.

    Bucketing pre-shuffles a table ONCE at write time: two tables
    bucketed on the same key with the same bucket count join with NO
    exchange (and, with sort_cols, no sort) — the co-located-join
    strategy for fact⋈fact at 100 TB, where re-shuffling both sides
    per query is the dominant cost. See tests/test_scale_helpers.py
    for the zero-Exchange plan assertion. The reference re-shuffles
    orders⋈order_details on every run (gold_fact_orders.py:57-75);
    bucketing amortizes that shuffle across every downstream query.
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode(mode).format("parquet").saveAsTable(table_name)


# -- internals ---------------------------------------------------------------


def _exists(path: str) -> bool:
    return os.path.exists(path)


def _swap_write(df: DataFrame, path: str) -> None:
    """Write to a staging dir, then swap into place. Local-FS atomic
    enough for tests; object-store deployments use the table format's
    commit protocol instead."""
    stage = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(stage)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(stage, path)
    shutil.rmtree(backup, ignore_errors=True)
