"""Approximate-aggregate scale paths: the sketches the engine swaps in
at 100 TB (HLL distinct counts, KLL-style percentile sketches) must
land within their documented error bounds of the exact operators they
replace — the 'exact -> sketch' trade quantile_order_values and
distinct_count_segments document in their docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_bound(spark):
    events = load_table(spark, SF_DIR, "events")
    exact = events.select(F.countDistinct("user_id").alias("n")).collect()[0].n
    approx = (
        events.select(F.approx_count_distinct("user_id", rsd=0.05).alias("n"))
        .collect()[0]
        .n
    )
    # HLL++ rsd=0.05: generous 3-sigma bound
    assert abs(approx - exact) / exact <= 0.15


def test_percentile_approx_tracks_exact(spark):
    orders = load_table(spark, SF_DIR, "orders")
    exact_n = orders.count()
    exact_p50 = (
        orders.orderBy("o_totalprice", "o_orderkey")
        .limit((exact_n + 1) // 2)
        .agg(F.max("o_totalprice"))
        .collect()[0][0]
    )
    approx_p50 = (
        orders.select(
            F.percentile_approx("o_totalprice", 0.5, accuracy=10000).alias("p")
        )
        .collect()[0]
        .p
    )
    # sketch picks an actual value near the true median
    assert abs(approx_p50 - exact_p50) / max(abs(exact_p50), 1e-9) <= 0.02


def test_sketch_and_exact_same_output_shape(spark):
    """The swap is drop-in: sketch variants produce the same column
    set as their exact twins, so a pipeline can switch on data volume
    without downstream changes."""
    events = load_table(spark, SF_DIR, "events")
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    sketch = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("n_users")
    )
    assert exact.columns == sketch.columns
    assert exact.schema["n_users"].dataType == sketch.schema["n_users"].dataType
