"""Write-side lakehouse ops: partitioned append, incremental load,
compaction, merge-upsert, SCD2 merge (reference's gold-layer write
semantics on plain parquet)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.writers import (
    compact,
    incremental_append,
    merge_upsert,
    scd2_merge,
    write_partitioned_by_date,
)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "id long, ts timestamp, amount double"
    )


def test_write_partitioned_by_date(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _orders(
        spark,
        [
            (1, dt.datetime(2024, 1, 1, 10), 5.0),
            (2, dt.datetime(2024, 1, 2, 11), 6.0),
        ],
    )
    write_partitioned_by_date(df, path, "ts")
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert {"year", "month", "day"} <= set(back.columns)
    # partition pruning: day filter should read a single partition dir
    assert back.filter("day = 2").count() == 1


def test_incremental_append(spark, tmp_path):
    path = str(tmp_path / "t")
    first = _orders(spark, [(1, dt.datetime(2024, 1, 1), 5.0), (2, dt.datetime(2024, 1, 2), 6.0)])
    assert incremental_append(spark, path, first, "ts") == 2
    # re-loading the same data appends nothing (watermark)
    assert incremental_append(spark, path, first, "ts") == 0
    newer = _orders(spark, [(3, dt.datetime(2024, 1, 3), 7.0)])
    assert incremental_append(spark, path, newer, "ts") == 1
    assert spark.read.parquet(path).count() == 3


def test_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    assert len(spark.read.parquet(path).inputFiles()) == 64
    compact(spark, path, target_partitions=4)
    back = spark.read.parquet(path)
    assert len(back.inputFiles()) == 4
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == 999 * 1000


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, name string, v double"
    )
    base.write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b2", 20.0), (4, "d", 4.0)], "k long, name string, v double"
    )
    merge_upsert(spark, path, updates, ["k"])
    got = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 1.0), 2: ("b2", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}


def test_scd2_merge(spark, tmp_path):
    path = str(tmp_path / "dim")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    v1 = spark.createDataFrame(
        [("p1", "espresso", 3.0, t0), ("p2", "latte", 4.0, t0)],
        "pid string, name string, price double, updated_at timestamp",
    )
    scd2_merge(spark, path, v1, "pid", ["name", "price"], "updated_at")
    cur = spark.read.parquet(path)
    assert cur.count() == 2
    assert cur.filter("is_current").count() == 2

    # p1 price change + new p3; p2 unchanged
    v2 = spark.createDataFrame(
        [("p1", "espresso", 3.5, t1), ("p2", "latte", 4.0, t1), ("p3", "mocha", 5.0, t1)],
        "pid string, name string, price double, updated_at timestamp",
    )
    scd2_merge(spark, path, v2, "pid", ["name", "price"], "updated_at")
    dim = spark.read.parquet(path)
    rows = {(r.pid, r.is_current): r for r in dim.collect()}
    assert dim.count() == 4  # p1 old + p1 new + p2 + p3
    assert rows[("p1", False)].end_ts == t1
    assert rows[("p1", True)].price == 3.5
    assert rows[("p2", True)].price == 4.0 and ("p2", False) not in rows
    assert rows[("p3", True)].price == 5.0
    # surrogate keys unique and deterministic
    keys = [r.row_key for r in dim.collect()]
    assert len(set(keys)) == 4


def test_clustered_write_skips_files(spark, tmp_path):
    """Range-clustered layout: per-file min/max slices are disjoint
    (each file owns a contiguous range), footer-only pruning touches a
    strict subset of files, and the pruned read returns exactly the
    full-scan filter result."""
    from data_lakehouse_platform_spark.catalog import load_table
    from data_lakehouse_platform_spark.sources.clustering import (
        file_stats,
        read_pruned,
        write_clustered,
    )
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_clustered")
    write_clustered(orders, path, "o_totalprice", n_files=8)

    stats = sorted(file_stats(path, "o_totalprice"), key=lambda s: s.min)
    assert len(stats) == 8 and all(s.min is not None for s in stats)
    for a, b in zip(stats, stats[1:]):
        assert a.max <= b.min  # contiguous, non-overlapping slices

    lo, hi = stats[2].min, stats[2].max  # a band inside one file
    pruned = read_pruned(spark, path, "o_totalprice", lo, hi)
    # prunes to <=2 files (band may touch a boundary), not all 8
    assert len(set(r[0] for r in pruned.select(F.input_file_name()).collect())) <= 2
    want = sorted(
        r["o_orderkey"]
        for r in orders.filter(F.col("o_totalprice").between(lo, hi)).collect()
    )
    got = sorted(r["o_orderkey"] for r in pruned.collect())
    assert got == want and got


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Z-order layout: a box predicate on BOTH clustered columns
    prunes files via footer stats alone, each single column also
    prunes (the Morton curve keeps every dimension partially
    clustered — range clustering can't do that for its non-sort
    column), and the pruned read equals the full-scan filter."""
    from data_lakehouse_platform_spark.catalog import load_table
    from data_lakehouse_platform_spark.sources.clustering import (
        file_stats,
        read_pruned_multi,
        write_zordered,
    )
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_zorder")
    n_files = 16
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=n_files)

    stats_ck = file_stats(path, "o_custkey")
    assert len(stats_ck) == n_files

    # A ~12.5% box in each dimension.
    ck_lo, ck_hi = 100, 280
    tp_lo, tp_hi = 50_000.0, 110_000.0
    box = {"o_custkey": (ck_lo, ck_hi), "o_totalprice": (tp_lo, tp_hi)}

    def files_kept(ranges):
        df = read_pruned_multi(spark, path, ranges)
        return set(r[0] for r in df.select(F.input_file_name()).collect())

    # Footer-level candidate sets (metadata only, independent of rows):
    def candidates(ranges):
        per_col = {c: file_stats(path, c) for c in ranges}
        kept = []
        for s in per_col[next(iter(per_col))]:
            ok = True
            for c, (lo, hi) in ranges.items():
                st = next(x for x in per_col[c] if x.file == s.file)
                if st.min is not None and (st.max < lo or st.min > hi):
                    ok = False
            if ok:
                kept.append(s.file)
        return kept

    assert len(candidates(box)) < n_files  # the box skips files
    assert len(candidates({"o_custkey": (ck_lo, ck_hi)})) < n_files
    assert len(candidates({"o_totalprice": (tp_lo, tp_hi)})) < n_files

    pruned = read_pruned_multi(spark, path, box)
    want = sorted(
        r["o_orderkey"]
        for r in orders.filter(
            F.col("o_custkey").between(ck_lo, ck_hi)
            & F.col("o_totalprice").between(tp_lo, tp_hi)
        ).collect()
    )
    got = sorted(r["o_orderkey"] for r in pruned.collect())
    assert got == want and got


def test_observe_metrics_ride_the_write(spark, tmp_path):
    """Observation-based DQ: metrics accumulate during the write action
    itself (no second scan) and report exact row/null/min/max values."""
    from data_lakehouse_platform_spark.operators.quality import observe_metrics

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 4.5), (3, "c", None), (4, "d", 7.25)],
        "id long, name string, score double",
    )
    instrumented, obs = observe_metrics(df, name="write-dq")
    instrumented.write.mode("overwrite").parquet(str(tmp_path / "out"))

    m = obs.get
    assert m["n_rows"] == 4
    assert m["nulls_name"] == 1 and m["nulls_score"] == 1 and m["nulls_id"] == 0
    assert m["min_id"] == 1 and m["max_id"] == 4
    assert m["min_score"] == 4.5 and m["max_score"] == 10.0
    # the written data is untouched by instrumentation
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4


def test_scd2_merge_replayed_old_version_never_regresses(spark, tmp_path):
    """A backfill/replayed batch carrying an OLDER version of a key
    must not close the newer current row (which would set end_ts
    before its own start_ts) nor resurrect stale content."""
    path = str(tmp_path / "dim_replay")
    t_old = dt.datetime(2024, 1, 1)
    t_new = dt.datetime(2024, 6, 1)
    schema = "pid string, name string, price double, updated_at timestamp"
    scd2_merge(
        spark, path,
        spark.createDataFrame([("p1", "espresso", 4.0, t_new)], schema),
        "pid", ["name", "price"], "updated_at",
    )
    # replay of January's version, different content
    scd2_merge(
        spark, path,
        spark.createDataFrame([("p1", "espresso", 3.0, t_old)], schema),
        "pid", ["name", "price"], "updated_at",
    )
    dim = spark.read.parquet(path).collect()
    assert len(dim) == 1  # nothing closed, nothing inserted
    r = dim[0]
    assert r.is_current and r.price == 4.0 and r.end_ts is None
    assert r.start_ts == t_new


def test_incremental_append_null_watermark_full_loads(spark, tmp_path):
    """A target whose ts column is all NULL has no usable high-water
    mark: the load must fall back to a full append, not silently drop
    every source row via `ts > NULL`."""
    path = str(tmp_path / "bronze_nullhw")
    spark.createDataFrame(
        [(1, None), (2, None)], "k bigint, ts timestamp"
    ).write.parquet(path)
    src = spark.createDataFrame(
        [(3, dt.datetime(2024, 1, 1))], "k bigint, ts timestamp"
    )
    assert incremental_append(spark, path, src, "ts") == 1
    assert spark.read.parquet(path).count() == 3
