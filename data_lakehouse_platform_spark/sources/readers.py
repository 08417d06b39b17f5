"""Source readers beyond the primary parquet catalog.

JDBC and Kafka mirror the reference's ingest edges
(bronze_dimension_fact_load.py:46-58 JDBC MySQL; :108-116 Kafka batch
read) but are gated: this container has neither a JDBC driver jar nor
brokers, so they raise a clear error instead of failing deep inside
py4j. The plumbing (options, partitioned reads) is the real, tested
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    """CSV with explicit schema preferred (inferSchema is a full extra
    pass over the data — never at 100 TB)."""
    reader = spark.read.options(header="true", **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Production JSON ingest: PERMISSIVE parse with a corrupt-record
    column, split into ``(good, quarantine)``.

    Real feeds always contain some malformed lines; failing the whole
    100 TB job on one bad record (FAILFAST) or silently dropping them
    (DROPMALFORMED) are both wrong for a lakehouse bronze layer — the
    contract is: good rows flow, bad RAW LINES are preserved for
    replay/debugging, and both legs come from ONE scan definition.

    Implementation note: Spark's native JSON reader refuses plans that
    reference only its internal corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the documented workaround is
    caching the whole parse, a non-starter at 100 TB). So the scan is
    ``spark.read.text`` + ``from_json`` with the corrupt column
    embedded in the struct: one pass, no cache, and quarantine keeps
    the byte-exact original line.

    Reference analog: the reference's Kafka consumers json.loads inside
    try/except and drop failures (orders_consumer.py) — this keeps
    them.
    """
    from pyspark.sql.types import StringType, StructField, StructType as _ST

    if isinstance(schema, str):
        schema = _ST.fromDDL(schema)
    assert isinstance(schema, _ST)
    business = [f.name for f in schema.fields]
    # COPY the schema — StructType.add mutates in place, and the
    # caller's schema must stay reusable.
    full = _ST(list(schema.fields) + [StructField(corrupt_col, StringType())])
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("__r"),
    )
    # Blank/whitespace-only lines parse to a NULL struct (corrupt col
    # null too) — they are NOT good rows; route them to quarantine.
    is_good = F.col("__r").isNotNull() & F.col(f"__r.{corrupt_col}").isNull()
    good = parsed.filter(is_good).select(
        *[F.col(f"__r.{c}").alias(c) for c in business]
    )
    quarantine = parsed.filter(~is_good).select(
        F.col("value").alias("raw_line")
    )
    return good, quarantine


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC scan — columnar like parquet, with the same predicate
    pushdown and column pruning through the vectorized reader; the
    interchange format when upstream Hive/Hadoop estates hand us ORC
    instead of parquet."""
    return spark.read.options(**options).orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False, **options
) -> DataFrame:
    """Raw text ingestion for corpus bootstrapping: one row per line
    (default) or per file (``whole_file`` — e.g. one document per
    file). Returns a single `value` string column; splitting into
    (doc_id, text) is a downstream select, so the scan itself stays a
    straight streaming read that parallelizes by file split."""
    return spark.read.options(**options).text(path, wholetext=whole_file)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """XML ingestion via Spark 4's built-in XML source (spark-xml was
    folded into core): one row per ``row_tag`` element. Explicit
    schema preferred for the same reason as CSV — schema inference is
    an extra full pass. The legacy-feed edge (ERP exports, SOAP
    payload dumps) that still shows up in enterprise bronze layers."""
    reader = spark.read.format("xml").option("rowTag", row_tag).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", **options) -> None:
    """XML export (round-trip partner of read_xml)."""
    df.write.format("xml").option("rowTag", row_tag).options(**options).mode(
        "overwrite"
    ).save(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options,
) -> DataFrame:
    """Parallel JDBC read. Unlike the reference's single-connection
    read (bronze_dimension_fact_load.py:46-58), passing
    partition_column/bounds splits the scan across num_partitions
    connections — the difference between one executor pulling the
    whole table and a balanced parallel ingest.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # driver jar / connectivity missing in this env
        raise RuntimeError(
            "JDBC source unavailable in this environment (no driver jar/"
            "database); the reader plumbing is exercised via options-only "
            "tests. Original error: " + str(exc)[:200]
        ) from exc


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Batch Kafka read (reference: bronze_dimension_fact_load.py:
    108-116). Requires the spark-sql-kafka package + brokers, absent
    here — gated with a clear error."""
    try:
        return (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:
        raise RuntimeError(
            "Kafka source unavailable in this environment (no "
            "spark-sql-kafka package/brokers; see JARS.md for the "
            "documented acquisition attempt). The in-repo drop-in twin "
            "is sources/eventlog_stream.py — the same Kafka-shaped "
            "contract (offsets, partitions, exactly-once restart, "
            "streaming sink, retention) with no broker; streaming "
            "semantics are also covered by the file-source pipelines in "
            "streaming/. Original error: " + str(exc)[:200]
        ) from exc
