"""Hot-key-safe as-of join: asof_join_salted must be bit-identical to
the single-window asof_join across directions, tolerance gates, and
NULL-valued right rows, while bounding every window partition to one
(key, time-chunk) slice."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.asof import asof_join, asof_join_salted

L_SCHEMA = "k long, t long, lv string"
R_SCHEMA = "k long, t long, price double, note string"

CHUNK = 1_000  # integer time axis; chunk width 1000 units


def _data(seed: int, n_keys: int, n_left: int, n_right: int, span: int):
    rng = random.Random(seed)
    # unique times per key/side keep the compare deterministic
    left, right = [], []
    used = set()
    while len(left) < n_left:
        k, t = rng.randrange(n_keys), rng.randrange(span)
        if ("L", k, t) not in used:
            used.add(("L", k, t))
            left.append((k, t, f"l{len(left)}"))
    while len(right) < n_right:
        k, t = rng.randrange(n_keys), rng.randrange(span)
        if ("R", k, t) not in used:
            used.add(("R", k, t))
            # every 4th price NULL, every 3rd note NULL — exercises the
            # independent per-column last(ignorenulls) carry
            price = None if len(right) % 4 == 0 else round(rng.uniform(1, 9), 2)
            note = None if len(right) % 3 == 0 else f"n{len(right)}"
            right.append((k, t, price, note))
    return left, right


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _check(spark, direction, tolerance):
    left_rows, right_rows = _data(13, 6, 400, 300, 8 * CHUNK)
    left = spark.createDataFrame(left_rows, L_SCHEMA)
    right = spark.createDataFrame(right_rows, R_SCHEMA)
    plain = asof_join(
        left, right, on="t", by="k", direction=direction, tolerance=tolerance
    )
    salted = asof_join_salted(
        left, right, on="t", by="k", direction=direction,
        tolerance=tolerance, chunk=CHUNK,
    )
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _canon(plain.select(*sorted(plain.columns))) == _canon(
        salted.select(*sorted(plain.columns))
    )


def test_salted_asof_backward(spark):
    _check(spark, "backward", None)


def test_salted_asof_forward(spark):
    _check(spark, "forward", None)


def test_salted_asof_backward_tolerance(spark):
    # tolerance smaller than a chunk AND larger than a chunk
    _check(spark, "backward", CHUNK // 3)
    _check(spark, "backward", 3 * CHUNK)


def test_salted_asof_forward_tolerance(spark):
    _check(spark, "forward", 2 * CHUNK)


def test_salted_asof_null_column_carry_across_chunks(spark):
    """A chunk whose LAST right row has a NULL column must not mask an
    older non-null value for that column — the per-column boundary
    state has to cross chunks exactly like the global window does."""
    left = spark.createDataFrame([(1, 2 * CHUNK + 5, "x")], L_SCHEMA)
    right = spark.createDataFrame(
        [
            (1, 10, 7.5, "early"),        # chunk 0: non-null price
            (1, CHUNK + 20, None, "mid"), # chunk 1 boundary row: NULL price
        ],
        R_SCHEMA,
    )
    plain = asof_join(left, right, on="t", by="k")
    salted = asof_join_salted(left, right, on="t", by="k", chunk=CHUNK)
    cols = sorted(plain.columns)
    assert _canon(plain.select(*cols)) == _canon(salted.select(*cols))
    row = salted.collect()[0]
    assert row.price_right == 7.5 and row.note_right == "mid"


def test_salted_asof_bounds_hot_key_partitions(spark):
    """Skew proof: one bot key holds 100k left + 100k right events
    over 50 chunks. The salted window key (k, chunk) caps every
    partition at ~1/50th of the hot key's rows; results match the
    plain join exactly."""
    n = 50_000  # one event per time unit per side -> unique times
    hot_l = spark.range(n).select(
        F.lit(9).cast("long").alias("k"),
        F.col("id").alias("t"),
        F.concat(F.lit("l"), F.col("id")).alias("lv"),
    )
    hot_r = spark.range(n).select(
        F.lit(9).cast("long").alias("k"),
        F.col("id").alias("t"),
        (F.col("id") % 97).cast("double").alias("price"),
        F.concat(F.lit("n"), F.col("id")).alias("note"),
    )
    sizes = (
        hot_l.select("k", "t").unionAll(hot_r.select("k", "t"))
        .groupBy("k", F.floor(F.col("t") / CHUNK).alias("chunk"))
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]
    )
    assert sizes.mx <= (2 * n) // 40  # bounded per-chunk slice

    plain = asof_join(hot_l, hot_r, on="t", by="k")
    salted = asof_join_salted(hot_l, hot_r, on="t", by="k", chunk=CHUNK)
    assert plain.count() == salted.count() == n
    # spot-exactness on a deterministic sample instead of 100k-row sort
    sample_plain = plain.where(F.col("t") % 9973 == 0)
    sample_salted = salted.where(F.col("t") % 9973 == 0)
    cols = sorted(plain.columns)
    assert _canon(sample_plain.select(*cols)) == _canon(sample_salted.select(*cols))
