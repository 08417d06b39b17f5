"""Source-format-parameterized streaming conformance (VERDICT r7 gap
#1 / next-round #6): the SAME test bodies run against the in-repo
eventlog DataSource and against ``format("kafka")``.  The kafka
variant auto-skips in this container (no broker, no spark-sql-kafka
jar — JARS.md documents the acquisition attempt) but is COLLECTED, so
the moment ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` names a reachable broker on
a jar-equipped cluster the identical assertions execute — the gate
evaporates instead of being rewritten.

Option mapping exercised here (also in MIGRATION.md):
  kafka.bootstrap.servers  <->  path            (log directory)
  subscribe                <->  path            (one log = one topic)
  startingOffsets          <->  startingSegment
  value JSON decode        <->  typed columns (eventlog is schema-full)
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.eventlog_stream import (
    EventLogStreamDataSource,
    append_segment,
)

EVENT_DDL = (
    "event_id long, user_id long, event_type string, "
    "ts timestamp, value double"
)


def _rows(seg: int, n: int):
    return [
        {
            "event_id": seg * 1000 + i,
            "user_id": i % 5,
            "event_type": "view" if i % 2 else "purchase",
            "ts": f"2024-01-0{seg + 1} 00:00:{i:02d}",
            "value": float(i),
        }
        for i in range(n)
    ]


class EventlogHarness:
    """The in-repo Kafka-contract twin: one log dir = one topic."""

    def __init__(self, spark, tmp_path):
        spark.dataSource.register(EventLogStreamDataSource)
        self.log = str(tmp_path / "log")

    def produce(self, spark, seg, n):
        append_segment(self.log, _rows(seg, n))

    def stream(self, spark, from_start=True):
        r = spark.readStream.format("eventlog").option("path", self.log)
        if not from_start:
            # startingSegment is the startingOffsets=latest analog:
            # skip everything sealed so far
            from data_lakehouse_platform_spark.sources.eventlog_stream import (
                sealed_segments,
            )

            r = r.option("startingSegment", str(sealed_segments(self.log)))
        return r.load()


class KafkaHarness:
    """The real thing, reached through the SAME assertions.  Requires
    a broker named by SPARK_GRAFT_KAFKA_BOOTSTRAP plus the
    spark-sql-kafka package on the session classpath."""

    def __init__(self, spark, tmp_path):
        self.bootstrap = os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"]
        self.topic = f"dlp-conformance-{uuid.uuid4().hex[:12]}"

    def produce(self, spark, seg, n):
        payload = [(json.dumps(r),) for r in _rows(seg, n)]
        (
            spark.createDataFrame(payload, "value string")
            .write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("topic", self.topic)
            .save()
        )

    def stream(self, spark, from_start=True):
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.topic)
            .option(
                "startingOffsets", "earliest" if from_start else "latest"
            )
            .load()
            .select(
                F.from_json(
                    F.col("value").cast("string"), EVENT_DDL
                ).alias("e")
            )
            .select("e.*")
        )


def _kafka_reason():
    if not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"):
        return (
            "SPARK_GRAFT_KAFKA_BOOTSTRAP unset (no broker/jar in this "
            "container; see JARS.md)"
        )
    return None


@pytest.fixture(params=["eventlog", "kafka"])
def source(request, spark, tmp_path):
    if request.param == "kafka":
        reason = _kafka_reason()
        if reason:
            pytest.skip(reason)
        return KafkaHarness(spark, tmp_path)
    return EventlogHarness(spark, tmp_path)


def _run_until(q, pred, timeout_s=60):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        q.processAllAvailable()
        if pred():
            return
        time.sleep(0.3)
    raise AssertionError("stream did not reach expected state in time")


def test_conformance_exactly_once_across_restart(spark, tmp_path, source):
    """Produce -> consume -> stop -> produce more -> restart from the
    checkpoint: every event exactly once, no replays, no holes."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    source.produce(spark, 0, 10)
    source.produce(spark, 1, 10)

    def start():
        return (
            source.stream(spark)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 20

    source.produce(spark, 2, 7)
    q = start()
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 27  # only the new segment's rows arrived
    ids = sorted(r.event_id for r in got.select("event_id").collect())
    assert len(ids) == len(set(ids)) == 27  # exactly once


def test_conformance_schema_and_grouped_agg(spark, tmp_path, source):
    """Typed event schema + a grouped aggregation over the stream."""
    out = str(tmp_path / "out")
    source.produce(spark, 0, 12)
    q = (
        source.stream(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").cast("double").alias("total"),
        )
        .writeStream.format("memory")
        .queryName(f"agg_{uuid.uuid4().hex[:8]}")
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt2")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.event_type: (r.n, r.total)
        for r in spark.sql(f"SELECT * FROM {q.name}").collect()
    }
    assert rows["view"] == (6, sum(float(i) for i in range(12) if i % 2))
    assert rows["purchase"] == (
        6, sum(float(i) for i in range(12) if not i % 2)
    )
    sdf = source.stream(spark)
    for col in ("event_id", "user_id", "event_type", "ts", "value"):
        assert col in sdf.columns


def test_conformance_tail_from_latest(spark, tmp_path, source):
    """startingOffsets=latest / startingSegment analog: a consumer
    starting 'now' sees only events produced after it was planned."""
    out = str(tmp_path / "out")
    source.produce(spark, 0, 10)  # history the tail must NOT see
    tail = source.stream(spark, from_start=False)
    source.produce(spark, 1, 5)
    q = (
        tail.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(
        r.event_id for r in spark.read.parquet(out).collect()
    )
    assert ids == [1000 + i for i in range(5)]
