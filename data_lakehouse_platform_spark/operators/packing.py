"""Distributed exclusive prefix sum — the backbone of deterministic
sequence packing (concatenate documents in a fixed pseudo-random
order, split into fixed-token context windows).

A naive global cumulative sum is `Window.orderBy(key)` with no
partitionBy — Spark funnels every row through ONE task, which is a
non-starter at 100 TB. This module implements the classic two-pass
distributed prefix sum instead:

1. bucket rows by a short prefix of the (string) order key — prefix
   order equals full-key order, so buckets are contiguous key ranges;
2. per-bucket cumulative sums run as a PARTITIONED window (parallel
   across the cluster);
3. bucket totals (<= 16^prefix_len rows — the only driver-side data)
   are cumulated on the driver and broadcast back as per-bucket
   offsets.

Every row's global offset = bucket offset + local inclusive sum -
own weight. Wall-clock is two parallel passes over the data plus a
16-to-4096-row broadcast, independent of cluster size.

Reference analog: the reference's surrogate-key assignment
(gold_dim_products.py:104-107, max-key offset + monotonically
increasing id) is the same offset-plus-local-order idea confined to a
single table; this generalizes it to an exact global prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "offset",
    bucket_chars: int = 2,
) -> DataFrame:
    """Add ``out_col`` = sum of ``weight_col`` over all rows strictly
    before this one in ascending ``order_col`` order.

    ``order_col`` must be a string with unique values (e.g. an md5 of
    a unique id) — uniqueness makes the global order, and thus every
    offset, exact. ``bucket_chars`` trades bucket count (16^n for hex
    keys) against per-bucket skew; 2 → 256 buckets.
    """
    from pyspark import StorageLevel

    bucketed = df.withColumn("__bucket", F.substring(F.col(order_col), 1, bucket_chars))
    # Consumed twice (local window pass + bucket-totals collect); the
    # upstream is typically whole-corpus tokenization — materialize so
    # it runs once, and so both consumers provably see the SAME rows.
    bucketed = bucketed.persist(StorageLevel.MEMORY_AND_DISK)
    w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn(
        "__incl", F.sum(F.col(weight_col).cast("bigint")).over(w)
    )
    totals = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(F.col(weight_col).cast("bigint")).alias("__tot"))
        .orderBy("__bucket")
        .collect()  # bounded: <= 16^bucket_chars rows
    )
    offsets, running = [], 0
    for r in totals:
        offsets.append((r["__bucket"], running))
        running += r["__tot"]
    off_df = df.sparkSession.createDataFrame(
        offsets, "__bucket: string, __boff: long"
    )
    return (
        local.join(F.broadcast(off_df), "__bucket")
        .withColumn(
            out_col,
            (F.col("__boff") + F.col("__incl") - F.col(weight_col)).cast("bigint"),
        )
        .drop("__bucket", "__incl", "__boff")
    )
