from data_lakehouse_platform_spark.streaming.pipelines import (
    read_event_stream,
    windowed_event_counts_stream,
    write_stream_parquet,
)
from data_lakehouse_platform_spark.streaming.order_tracker import track_order_completion

__all__ = [
    "read_event_stream",
    "windowed_event_counts_stream",
    "write_stream_parquet",
    "track_order_completion",
]
