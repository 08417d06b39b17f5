"""Streaming SOURCE over delta_lite tables (sources/delta_stream.py):
version-offset exactly-once tailing, snapshot bootstrap, partition
columns from the log, deletion vectors applied in the bootstrap,
OPTIMIZE commits skipped, non-append commits refused/ignored/skipped
per option — the delta-spark DeltaSource contract."""

from __future__ import annotations

import os

import pytest

from data_lakehouse_platform_spark.sources.delta_lite import (
    DeltaLiteTable,
)
from data_lakehouse_platform_spark.sources.delta_stream import (
    DeltaLiteStreamDataSource,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DeltaLiteStreamDataSource)
    return spark


def _mk(spark, tmp_path, rows, partition_by=None, name="t"):
    t = DeltaLiteTable(str(tmp_path / name))
    df = spark.createDataFrame(rows, "id long, val string, grp string")
    t.write(df, partition_by=partition_by)
    return t


def _drain(spark, table_dir, out_dir, ckpt, **options):
    """One availableNow wave into a parquet sink (memory sinks cannot
    recover checkpoints) — returns the cumulative sink rows."""
    reader = spark.readStream.format("delta_lite").option(
        "path", table_dir
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (r.id, r.val, r.grp)
        for r in spark.read.parquet(out_dir).collect()
    )


def test_snapshot_bootstrap_then_append_tail(registered, tmp_path):
    spark = registered
    t = _mk(
        spark,
        tmp_path,
        [(1, "a", "x"), (2, "b", "y")],
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # wave 1: the snapshot
    got = _drain(spark, t.path, out, ckpt)
    assert got == [(1, "a", "x"), (2, "b", "y")]
    # wave 2: nothing new -> no duplicates (exactly-once on replay)
    got = _drain(spark, t.path, out, ckpt)
    assert got == [(1, "a", "x"), (2, "b", "y")]
    # two appends while the stream is down
    t.write(
        spark.createDataFrame([(3, "c", "x")],
                              "id long, val string, grp string"),
        mode="append",
    )
    t.write(
        spark.createDataFrame([(4, "d", "y")],
                              "id long, val string, grp string"),
        mode="append",
    )
    got = _drain(spark, t.path, out, ckpt)
    assert got == [
        (1, "a", "x"), (2, "b", "y"), (3, "c", "x"), (4, "d", "y")
    ]


def test_partition_columns_come_from_the_log(registered, tmp_path):
    spark = registered
    t = _mk(
        spark,
        tmp_path,
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None)],
        partition_by=["grp"],
    )
    got = _drain(
        spark, t.path, str(tmp_path / "o"), str(tmp_path / "c")
    )
    # NULL partition value round-trips (__HIVE_DEFAULT_PARTITION__)
    assert got == [(1, "a", "x"), (2, "b", "y"), (3, "c", None)]


def test_bootstrap_applies_deletion_vectors(registered, tmp_path):
    spark = registered
    t = _mk(
        spark,
        tmp_path,
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "y")],
    )
    t.delete(spark, "id = 2", strategy="dv")
    got = _drain(
        spark, t.path, str(tmp_path / "o"), str(tmp_path / "c")
    )
    assert got == [(1, "a", "x"), (3, "c", "y")]


def test_non_append_commit_refused_then_option_paths(
    registered, tmp_path
):
    spark = registered
    t = _mk(
        spark,
        tmp_path,
        [(1, "a", "x"), (2, "b", "y")],
    )
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    assert len(_drain(spark, t.path, out, ckpt)) == 2
    # a rewrite DELETE removes a data file -> not an append
    t.delete(spark, "id = 1", strategy="rewrite")
    with pytest.raises(Exception, match="not an append"):
        _drain(spark, t.path, out, ckpt)
    # skipChangeCommits: the change commit is skipped entirely
    got = _drain(
        spark,
        t.path,
        str(tmp_path / "o2"),
        str(tmp_path / "c2"),
        skipChangeCommits="true",
    )
    # bootstrap snapshot (post-delete state); later change commits
    # would be skipped
    assert got == [(2, "b", "y")]
    # ignoreChanges: the rewrite's add files re-emit.  ONE data file,
    # so the delete's rewrite carries the surviving row (with separate
    # files the touched file's rewrite would be empty).
    t2 = DeltaLiteTable(str(tmp_path / "t2"))
    t2.write(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")],
            "id long, val string, grp string",
        ).coalesce(1)
    )
    o3, c3 = str(tmp_path / "o3"), str(tmp_path / "c3")
    _drain(spark, t2.path, o3, c3, ignoreChanges="true")
    t2.delete(spark, "id = 1", strategy="rewrite")
    got = _drain(spark, t2.path, o3, c3, ignoreChanges="true")
    # the surviving row re-emits (rewritten file served again):
    # delta-spark's documented ignoreChanges duplication
    assert got == [(1, "a", "x"), (2, "b", "y"), (2, "b", "y")]


def test_optimize_commits_are_skipped(registered, tmp_path):
    spark = registered
    t = _mk(spark, tmp_path, [(1, "a", "x")])
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    assert len(_drain(spark, t.path, out, ckpt)) == 1
    t.write(
        spark.createDataFrame([(2, "b", "y")],
                              "id long, val string, grp string"),
        mode="append",
    )
    t.optimize(spark)  # dataChange=false adds + removes
    got = _drain(spark, t.path, out, ckpt)
    # the append arrives once; OPTIMIZE contributes nothing
    assert got == [(1, "a", "x"), (2, "b", "y")]


def test_starting_version_latest_tails_only_new_commits(
    registered, tmp_path
):
    spark = registered
    t = _mk(spark, tmp_path, [(1, "a", "x")])
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    got = _drain(
        spark, t.path, out, ckpt, startingVersion="latest"
    )
    assert got == []  # the existing snapshot is NOT served
    t.write(
        spark.createDataFrame([(2, "b", "y")],
                              "id long, val string, grp string"),
        mode="append",
    )
    got = _drain(
        spark, t.path, out, ckpt, startingVersion="latest"
    )
    assert got == [(2, "b", "y")]


def test_starting_version_integer(registered, tmp_path):
    spark = registered
    t = _mk(spark, tmp_path, [(1, "a", "x")])
    t.write(
        spark.createDataFrame([(2, "b", "y")],
                              "id long, val string, grp string"),
        mode="append",
    )
    t.write(
        spark.createDataFrame([(3, "c", "y")],
                              "id long, val string, grp string"),
        mode="append",
    )
    got = _drain(
        spark,
        t.path,
        str(tmp_path / "o"),
        str(tmp_path / "c"),
        startingVersion="1",
    )
    # versions 1 and 2 as per-commit adds; version 0's snapshot skipped
    assert got == [(2, "b", "y"), (3, "c", "y")]


def test_schema_inferred_from_the_log(registered, tmp_path):
    spark = registered
    t = _mk(spark, tmp_path, [(1, "a", "x")])
    df = spark.readStream.format("delta_lite").option(
        "path", t.path
    ).load()
    assert [f.name for f in df.schema.fields] == ["id", "val", "grp"]
    assert df.isStreaming


# -- CDF streaming mode (readChangeFeed=true) ---------------------------


def _mk_cdf(spark, tmp_path, name="cdft"):
    t = DeltaLiteTable(str(tmp_path / name))
    t.write(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")],
            "id long, val string, grp string",
        ).coalesce(1),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    return t


def _drain_cdf(spark, table_dir, out_dir, ckpt):
    q = (
        spark.readStream.format("delta_lite")
        .option("path", table_dir)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (r._commit_version, r.id, r.val, r._change_type)
        for r in spark.read.parquet(out_dir).collect()
    )


def test_cdf_stream_schema_and_bootstrap(registered, tmp_path):
    spark = registered
    t = _mk_cdf(spark, tmp_path)
    df = (
        spark.readStream.format("delta_lite")
        .option("path", t.path)
        .option("readChangeFeed", "true")
        .load()
    )
    assert df.columns[-3:] == [
        "_change_type", "_commit_version", "_commit_timestamp"
    ]
    got = _drain_cdf(
        spark, t.path, str(tmp_path / "o"), str(tmp_path / "c")
    )
    # bootstrap snapshot = inserts at the bootstrap version
    assert got == [(0, 1, "a", "insert"), (0, 2, "b", "insert")]


def test_cdf_stream_serves_update_delete_merge_changes(
    registered, tmp_path
):
    spark = registered
    t = _mk_cdf(spark, tmp_path)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    _drain_cdf(spark, t.path, out, ckpt)  # bootstrap
    t.update(spark, "id = 2", {"val": "'B'"})            # v1
    t.delete(spark, "id = 1", strategy="rewrite")        # v2
    t.write(
        spark.createDataFrame([(3, "c", "y")],
                              "id long, val string, grp string"),
        mode="append",
    )                                                    # v3 (inferred)
    got = _drain_cdf(spark, t.path, out, ckpt)
    assert got == [
        (0, 1, "a", "insert"),
        (0, 2, "b", "insert"),
        (1, 2, "B", "update_postimage"),
        (1, 2, "b", "update_preimage"),
        (2, 1, "a", "delete"),
        (3, 3, "c", "insert"),
    ]
    # replay adds nothing (exactly-once)
    assert _drain_cdf(spark, t.path, out, ckpt) == got
    # _commit_timestamp is populated and non-decreasing per version
    rows = spark.read.parquet(out).collect()
    by_v = {}
    for r in rows:
        assert r._commit_timestamp is not None
        by_v.setdefault(r._commit_version, set()).add(
            r._commit_timestamp
        )
    assert all(len(s) == 1 for s in by_v.values())


def test_cdf_stream_refuses_underivable_mixed_commit(
    registered, tmp_path
):
    spark = registered
    # PLAIN table (no CDF): a rewrite delete mixes adds+removes with
    # no cdc actions -> the CDF stream refuses loudly
    t = DeltaLiteTable(str(tmp_path / "plain"))
    t.write(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")],
            "id long, val string, grp string",
        ).coalesce(1)
    )
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    _drain_cdf(spark, t.path, out, ckpt)
    t.delete(spark, "id = 1", strategy="rewrite")
    with pytest.raises(Exception, match="enableChangeDataFeed"):
        _drain_cdf(spark, t.path, out, ckpt)


# -- transactional streaming SINK (writeStream.format('delta_lite')) ----


def test_sink_creates_table_and_appends_exactly_once(
    registered, tmp_path
):
    """Table-to-table streaming replication: delta source -> delta
    sink, availableNow waves on a shared checkpoint — the sink table
    must track the source exactly (no loss, no duplicates) and carry
    txn actions for idempotent replay."""
    spark = registered
    src = _mk(spark, tmp_path, [(1, "a", "x"), (2, "b", "y")],
              name="src")
    sink_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")

    def wave():
        q = (
            spark.readStream.format("delta_lite")
            .option("path", src.path)
            .load()
            .writeStream.format("delta_lite")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r.id, r.val, r.grp)
            for r in DeltaLiteTable(sink_dir).read(spark).collect()
        )

    assert wave() == [(1, "a", "x"), (2, "b", "y")]
    assert wave() == [(1, "a", "x"), (2, "b", "y")]  # no duplicates
    src.write(
        spark.createDataFrame([(3, "c", "x")],
                              "id long, val string, grp string"),
        mode="append",
    )
    assert wave() == [(1, "a", "x"), (2, "b", "y"), (3, "c", "x")]
    # the sink's commits carry the exactly-once txn ledger
    t = DeltaLiteTable(sink_dir)
    vers = t.txn_versions()
    assert len(vers) == 1 and list(vers.values())[0] >= 1
    # schema was created from the stream
    assert t.read(spark).columns == ["id", "val", "grp"]


def test_sink_commit_is_idempotent_per_batch(registered, tmp_path):
    """A replayed commit (same batchId) must drop its staged files and
    leave the table unchanged — the txn-action guard, exercised
    directly on the writer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_lakehouse_platform_spark.sources.delta_stream import (
        _DeltaStreamWriter,
        _StagedFile,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    spark = registered
    sink_dir = str(tmp_path / "s2")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("val", StringType()),
        ]
    )
    w = _DeltaStreamWriter(schema, {"path": sink_dir})

    def staged(rows):
        os.makedirs(sink_dir, exist_ok=True)
        p = os.path.join(sink_dir, f".stream-stage-{len(rows)}.parquet")
        pq.write_table(
            pa.table(
                {"id": [r[0] for r in rows],
                 "val": [r[1] for r in rows]},
                schema=w._arrow_schema(),
            ),
            p,
        )
        return _StagedFile(p, len(rows))

    w.commit([staged([(1, "a"), (2, "b")])], batchId=0)
    t = DeltaLiteTable(sink_dir)
    assert t.latest_version() == 0
    # replay of batch 0 with fresh staged files: dropped, no commit
    w.commit([staged([(1, "a"), (2, "b")])], batchId=0)
    assert t.latest_version() == 0
    assert sorted(
        (r.id, r.val) for r in t.read(spark).collect()
    ) == [(1, "a"), (2, "b")]
    # no staged debris left behind
    assert not [
        f for f in os.listdir(sink_dir) if f.startswith(".stream-stage")
    ]
    # next batch commits normally
    w.commit([staged([(3, "c")])], batchId=1)
    assert t.latest_version() == 1
    assert t.txn_versions()[w._app_id] == 1


def test_sink_refuses_schema_drift_and_overwrite_mode(
    registered, tmp_path
):
    spark = registered
    src = _mk(spark, tmp_path, [(1, "a", "x")], name="src3")
    sink_dir = str(tmp_path / "s3")
    # pre-create the sink with a DIFFERENT schema
    DeltaLiteTable(sink_dir).write(
        spark.createDataFrame([(1,)], "only long")
    )
    q = (
        spark.readStream.format("delta_lite")
        .option("path", src.path)
        .load()
        .writeStream.format("delta_lite")
        .option("path", sink_dir)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="schema"):
        q.awaitTermination(120)
        q.processAllAvailable()
