"""Per-file column statistics (``add.stats``) and data skipping.

delta-spark writes {numRecords, minValues, maxValues, nullCount} on
every add action and prunes the file list against the predicate BEFORE
the scan — the feature that makes a selective query on a 100 TB table
read megabytes instead of terabytes.  These tests pin:

* the stats JSON itself (values, null counting, numRecords);
* conservative omission (long strings, all-null columns, NaN floats);
* skipping soundness: for EVERY predicate, read(predicate=) must equal
  read().filter(predicate) — including predicates the evaluator cannot
  reason about (it must keep, never guess);
* partition-value pruning without any stats at all;
* stats surviving checkpoint + clean_log;
* the mutating verbs (DELETE dv/rewrite, UPDATE) pruning their locate
  scans through the same path.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.delta_lite import (
    DeltaLiteTable,
)


def _adds(t: DeltaLiteTable, version: int) -> list[dict]:
    log = os.path.join(t.log_dir, f"{version:020d}.json")
    return [
        json.loads(line)["add"]
        for line in open(log)
        if "add" in json.loads(line)
    ]


def _stats(add: dict) -> dict:
    return json.loads(add["stats"])


def test_write_emits_stats_json(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)],
        "id int, name string, score double",
    ).coalesce(1)
    t.write(df)
    adds = _adds(t, 0)
    assert len(adds) == 1
    s = _stats(adds[0])
    assert s["numRecords"] == 3
    assert s["minValues"] == {"id": 1, "name": "a", "score": 1.5}
    assert s["maxValues"] == {"id": 3, "name": "b", "score": 2.5}
    assert s["nullCount"] == {"id": 0, "name": 1, "score": 1}


def test_all_null_column_has_counts_but_no_bounds(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id int, v string"
    ).coalesce(1)
    t.write(df)
    s = _stats(_adds(t, 0)[0])
    assert "v" not in s["minValues"] and "v" not in s["maxValues"]
    assert s["nullCount"]["v"] == 2
    # all-null reasoning: v = 'x' can never match; v IS NULL must keep
    kept, total = t.files_matching(spark, "v = 'x'")
    assert (len(kept), total) == (0, 1)
    kept, _ = t.files_matching(spark, "v IS NULL")
    assert len(kept) == 1


def test_long_strings_drop_bounds_not_nullcount(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    long = "x" * 100
    df = spark.createDataFrame(
        [(1, long), (2, "short")], "id int, v string"
    ).coalesce(1)
    t.write(df)
    s = _stats(_adds(t, 0)[0])
    assert "v" not in s["minValues"]  # truncated max under-bounds
    assert s["nullCount"]["v"] == 0
    # and so the file is never skipped on that column
    kept, total = t.files_matching(spark, "v = 'zzzz'")
    assert (len(kept), total) == (1, 1)


def test_nan_drops_float_bounds(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 3.0)], "id int, v double"
    ).coalesce(1)
    t.write(df)
    s = _stats(_adds(t, 0)[0])
    assert "v" not in s["minValues"]
    kept, _ = t.files_matching(spark, "v > 1e12")
    assert len(kept) == 1  # no bounds -> never skipped


def test_skipping_prunes_and_result_is_exact(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    # 4 files with disjoint id ranges
    for lo in (0, 100, 200, 300):
        df = spark.createDataFrame(
            [(lo + i, f"v{lo + i}") for i in range(10)],
            "id int, v string",
        ).coalesce(1)
        t.write(df, mode="append")
    kept, total = t.files_matching(spark, "id >= 200 AND id < 210")
    assert total == 4 and len(kept) == 1
    got = sorted(
        r.id for r in t.read(spark, predicate="id >= 200 AND id < 210").collect()
    )
    assert got == list(range(200, 210))
    # IN list crossing two files
    kept, _ = t.files_matching(spark, "id IN (5, 105)")
    assert len(kept) == 2
    # inverted literal side and BETWEEN (parses to >= AND <=)
    kept, _ = t.files_matching(spark, "150 > id")
    assert len(kept) == 2
    kept, _ = t.files_matching(spark, "id BETWEEN 301 AND 305")
    assert len(kept) == 1
    # OR spans files; NOT narrows
    kept, _ = t.files_matching(spark, "id < 5 OR id > 395")
    assert len(kept) == 1
    kept, _ = t.files_matching(spark, "NOT (id < 100)")
    assert len(kept) == 3


def test_unsupported_predicate_keeps_everything(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    for lo in (0, 100):
        df = spark.createDataFrame(
            [(lo + i,) for i in range(5)], "id int"
        ).coalesce(1)
        t.write(df, mode="append")
    for pred in (
        "id % 7 = 3",          # arithmetic on the column
        "abs(id) < 2",         # function of the column
        "id < id + 1",         # column on both sides
        "rand() < 2",          # non-deterministic
    ):
        kept, total = t.files_matching(spark, pred)
        assert len(kept) == total == 2, pred
    # ... and read(predicate=) still returns the exact filter result
    got = sorted(r.id for r in t.read(spark, predicate="id % 100 = 3").collect())
    assert got == [3, 103]


def test_partition_pruning_without_stats(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, ["eu", "us", None][i % 3]) for i in range(9)],
        "id int, region string",
    )
    t.write(
        df,
        partition_by=["region"],
        configuration={"delta.dataSkippingNumIndexedCols": "0"},
    )
    assert all("stats" not in a for a in _adds(t, 0))  # knob honored
    kept, total = t.files_matching(spark, "region = 'eu'")
    assert total >= 3 and all("region=eu" in p for p in kept)
    # NULL partition: IS NULL keeps only the default-partition files
    kept, _ = t.files_matching(spark, "region IS NULL")
    assert kept and all("__HIVE_DEFAULT_PARTITION__" in p for p in kept)
    got = sorted(
        r.id for r in t.read(spark, predicate="region IS NULL").collect()
    )
    assert got == [2, 5, 8]


def test_date_and_timestamp_predicates(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("2024-01-0%d" % (i + 1),) for i in range(5)], "d string"
    ).select(F.col("d").cast("date"))
    t.write(df.coalesce(1), mode="append")
    df2 = spark.createDataFrame(
        [("2024-06-0%d" % (i + 1),) for i in range(5)], "d string"
    ).select(F.col("d").cast("date"))
    t.write(df2.coalesce(1), mode="append")
    kept, total = t.files_matching(spark, "d >= DATE '2024-06-01'")
    assert (len(kept), total) == (1, 2)
    kept, _ = t.files_matching(spark, "d = CAST('2024-01-03' AS DATE)")
    assert len(kept) == 1
    got = t.read(spark, predicate="d > DATE '2024-05-31'").count()
    assert got == 5


def test_decimal_bounds_widen_conservatively(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("0.1",), ("0.3",)], "v string"
    ).select(F.col("v").cast("decimal(10,2)"))
    t.write(df.coalesce(1))
    s = _stats(_adds(t, 0)[0])
    assert s["minValues"]["v"] <= 0.1 and s["maxValues"]["v"] >= 0.3
    kept, _ = t.files_matching(spark, "v = CAST('0.30' AS DECIMAL(10,2))")
    assert len(kept) == 1
    kept, _ = t.files_matching(spark, "v > CAST('0.31' AS DECIMAL(10,2))")
    assert len(kept) == 0


def test_stats_survive_checkpoint_and_clean_log(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    for lo in (0, 100):
        t.write(
            spark.createDataFrame(
                [(lo + i,) for i in range(5)], "id int"
            ).coalesce(1),
            mode="append",
        )
    t.checkpoint()
    t.clean_log()
    kept, total = t.files_matching(spark, "id >= 100")
    assert (len(kept), total) == (1, 2)
    got = sorted(r.id for r in t.read(spark, predicate="id >= 100").collect())
    assert got == [100, 101, 102, 103, 104]


def test_dv_delete_keeps_skipping_sound(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(i,) for i in range(10)], "id int"
        ).coalesce(1)
    )
    t.delete(spark, "id < 3", strategy="dv")
    # bounds are now loose (min 0 survives in stats) — never a wrong
    # skip, and the surviving rows are exact
    got = sorted(r.id for r in t.read(spark, predicate="id <= 5").collect())
    assert got == [3, 4, 5]
    kept, _ = t.files_matching(spark, "id = 0")
    assert len(kept) == 1  # conservative: stats still admit id=0


def test_mutating_verbs_prune_their_locate_scans(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    for lo in (0, 100, 200):
        t.write(
            spark.createDataFrame(
                [(lo + i, "x") for i in range(10)], "id int, v string"
            ).coalesce(1),
            mode="append",
        )
    # rewrite-strategy DELETE in one file's range rewrites ONE file
    res = t.delete(spark, "id BETWEEN 100 AND 104", strategy="rewrite")
    assert res["files"] == 1
    assert t.read(spark).count() == 25
    # UPDATE confined to one file touches one file
    res = t.update(spark, "id = 205", {"v": "'updated'"})
    assert res["files_rewritten"] == 1
    got = t.read(spark, predicate="v = 'updated'").collect()
    assert [r.id for r in got] == [205]


def test_skipping_soundness_randomized(spark, tmp_path):
    """Property: for every generated predicate, the pruned read equals
    the unpruned filter — if a file containing a match were ever
    wrongly skipped, the two result sets would differ."""
    import random

    rnd = random.Random(7)
    t = DeltaLiteTable(str(tmp_path / "t"))
    for _ in range(6):
        rows = [
            (
                rnd.randrange(0, 50),
                rnd.choice(["a", "b", "c", None]),
                round(rnd.uniform(-5, 5), 2),
            )
            for _ in range(20)
        ]
        t.write(
            spark.createDataFrame(
                rows, "id int, tag string, x double"
            ).coalesce(1),
            mode="append",
        )
    base = t.read(spark)
    preds = [
        "id = 7",
        "id < 10 AND tag = 'a'",
        "tag IN ('b', 'c') OR x > 4.5",
        "NOT (id >= 25)",
        "x BETWEEN -1.0 AND 1.0",
        "tag IS NULL AND id > 40",
        "tag IS NOT NULL",
        "id != 3",
        "id <=> 12",
    ]
    for _ in range(10):
        lo = rnd.randrange(0, 50)
        preds.append(f"id >= {lo} AND id < {lo + rnd.randrange(1, 8)}")
    nonesafe = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    for pred in preds:
        want = sorted(map(tuple, base.filter(pred).collect()), key=nonesafe)
        got = sorted(
            map(tuple, t.read(spark, predicate=pred).collect()),
            key=nonesafe,
        )
        assert got == want, pred
        kept, total = t.files_matching(spark, pred)
        assert total == 6 and len(kept) <= total, pred
