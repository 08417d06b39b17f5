from data_lakehouse_platform_spark.sources.readers import (
    read_csv,
    read_json,
    read_jdbc,
    read_kafka_batch,
)
from data_lakehouse_platform_spark.sources.writers import (
    write_partitioned_by_date,
    incremental_append,
    compact,
    merge_upsert,
    scd2_merge,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_jdbc",
    "read_kafka_batch",
    "write_partitioned_by_date",
    "incremental_append",
    "compact",
    "merge_upsert",
    "scd2_merge",
]
