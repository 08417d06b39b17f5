"""Gap-based sessionization.

One shuffle by user key, two window passes over the same sort order
(Catalyst fuses them into a single Window exec): lag → gap flag →
running-sum session index → grouped session rollup. Scales linearly;
the only skew risk is a single hyperactive user, handled by AQE skew
splitting on the final groupBy.

Reference analog: per-order event accumulation in Redis with a TTL
window (order_details_consumer.py:33-71) — here the "session" close is
the inactivity gap instead of an explicit count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.functions.money import dec, undec


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us),
        1,
    ).otherwise(0)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = df.select(
        user_col,
        order_col,
        ts_col,
        value_col,
        new_session.alias("new_session"),
    ).withColumn("session_idx", F.sum("new_session").over(w_run))
    return flagged.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        undec(F.sum(dec(value_col))).alias("total_value"),
    )
