"""Streaming sketches (streaming/sketches.py): the streamed HLL
register table must be BIT-IDENTICAL to the batch sketch over the same
rows (that is the merge contract), and the streaming Misra-Gries state
must stay capacity-bounded while keeping every guaranteed heavy item."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators import sketches as SK
from data_lakehouse_platform_spark.streaming.pipelines import read_event_stream
from data_lakehouse_platform_spark.streaming.sketches import (
    heavy_hitter_stream,
    hll_register_stream,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_event_files(src, n_files=3, rows_per_file=40):
    src.mkdir()
    eid = 0
    for f in range(n_files):
        rows = []
        for i in range(rows_per_file):
            rows.append(
                {
                    "event_id": eid,
                    "ts": f"2024-01-01T00:{f:02d}:{i % 60:02d}",
                    "user_id": (eid * 7) % 53,
                    "event_type": "click" if eid % 3 else "view",
                    "value": float(i),
                    "props": "{}",
                }
            )
            eid += 1
        (src / f"{f}.json").write_text("\n".join(json.dumps(r) for r in rows))


def test_hll_stream_registers_match_batch(spark, tmp_path):
    src = tmp_path / "src"
    _write_event_files(src)

    stream = read_event_stream(spark, str(src), max_files_per_trigger=1)
    regs = hll_register_stream(stream, "event_type", "user_id")
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_regs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.event_type, r.reg): r.m
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).json(str(src))
    want = {
        (r.event_type, r.reg): r.m
        for r in SK.hll_registers(batch, ["event_type"], "user_id").collect()
    }
    assert got == want

    # ...so the estimates are bit-identical too (stream -> snapshot ->
    # estimate is the backfill-equivalence the docstring promises).
    snap = spark.createDataFrame(
        [(k[0], int(k[1]), int(v)) for k, v in got.items()],
        "event_type string, reg long, m long",
    )
    e_stream = {
        r.event_type: r.hll_estimate
        for r in SK.hll_estimate(snap, ["event_type"]).collect()
    }
    e_batch = {
        r.event_type: r.hll_estimate
        for r in SK.hll_estimate(
            SK.hll_registers(batch, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert e_stream == e_batch


def test_heavy_hitter_stream_bounded_and_complete(spark, tmp_path):
    src = tmp_path / "toks"
    src.mkdir()
    # 3 micro-batches; "flood" dominates (guaranteed heavy), the tail
    # is wide enough to force the MG reduction repeatedly.
    eid = 0
    for f in range(3):
        rows = []
        for i in range(200):
            tok = "flood" if i % 2 == 0 else f"tail{(eid * 13) % 97}"
            rows.append({"tok": tok})
            eid += 1
        (src / f"{f}.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    capacity = 16
    summary = heavy_hitter_stream(stream, "tok", capacity=capacity, shards=4)
    q = (
        summary.writeStream.outputMode("update")
        .format("memory")
        .queryName("mg_sum")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM mg_sum").collect()
    latest_seq = {}
    for r in rows:
        latest_seq[r.shard] = max(latest_seq.get(r.shard, 0), r.batch_seq)
    final = {
        (r.shard, r.item): r.weight
        for r in rows
        if r.batch_seq == latest_seq[r.shard]
    }
    # State bound: no shard's final summary exceeds capacity.
    per_shard: dict[int, int] = {}
    for (shard, _), _w in final.items():
        per_shard[shard] = per_shard.get(shard, 0) + 1
    assert all(n <= capacity for n in per_shard.values())

    # MG guarantee per shard: every item with share > 1/(capacity+1) of
    # its shard's stream is present in the final summary.
    batch = spark.read.schema("tok string").json(str(src)).select(
        F.pmod(F.hash(F.col("tok")), F.lit(4)).cast("int").alias("shard"),
        F.col("tok").alias("item"),
    )
    shard_totals = {
        r.shard: r.n for r in batch.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    exact = batch.groupBy("shard", "item").agg(F.count("*").alias("n")).collect()
    for r in exact:
        if r.n > shard_totals[r.shard] / (capacity + 1):
            assert (r.shard, r.item) in final, f"lost heavy item {r.item}"
    assert any(item == "flood" for (_, item) in final)


def test_eventlog_stream_to_sketch_artifact_with_batch_backfill(spark, tmp_path):
    """Capstone: the broker-twin eventlog source feeds the streaming HLL,
    the streamed registers land in the medallion sketch artifact, a
    BATCH backfill appends to the same artifact, and the rolled-up
    estimate is bit-identical to one sketch built over everything —
    stream and backfill truly share one state algebra."""
    from data_lakehouse_platform_spark.plans.medallion import MedallionPipeline
    from data_lakehouse_platform_spark.sources.eventlog_stream import (
        EventLogStreamDataSource,
        append_segment,
    )

    spark.dataSource.register(EventLogStreamDataSource)
    log = str(tmp_path / "log")

    def rows(seg, n):
        return [
            {
                "event_id": seg * 1000 + i,
                "user_id": (seg * 37 + i) % 61,
                "event_type": "view" if i % 2 else "purchase",
                "ts": f"2024-01-0{seg + 1} 00:00:{i % 60:02d}",
                "value": float(i),
            }
            for i in range(n)
        ]

    append_segment(log, rows(0, 40))
    append_segment(log, rows(1, 40))

    stream = spark.readStream.format("eventlog").option("path", log).load()
    regs = hll_register_stream(stream, "event_type", "user_id")
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName("el_regs")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    pipe = MedallionPipeline(spark, str(tmp_path / "lake"))
    streamed = spark.sql("SELECT event_type, reg, m FROM el_regs")
    streamed.write.mode("append").parquet(pipe.path("index", "hll_stream"))

    # batch backfill: a third day's rows never seen by the stream
    backfill = spark.createDataFrame(
        [(r["event_type"], r["user_id"]) for r in rows(2, 40)],
        "event_type string, user_id long",
    )
    pipe.build_uniques_sketch(backfill, ["event_type"], "user_id", name="stream")

    rolled = {
        r.event_type: r.hll_estimate
        for r in pipe.uniques_estimate(["event_type"], name="stream").collect()
    }
    everything = spark.createDataFrame(
        [(r["event_type"], r["user_id"]) for seg in range(3) for r in rows(seg, 40)],
        "event_type string, user_id long",
    )
    direct = {
        r.event_type: r.hll_estimate
        for r in SK.hll_estimate(
            SK.hll_registers(everything, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert rolled == direct and set(rolled) == {"view", "purchase"}
