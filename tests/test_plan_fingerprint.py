"""Plan-shape fingerprints (r9): the canonicalized operator tree must
be stable across runs, insensitive to expression ids, and flip when
the join strategy flips — that's the whole point (wall time can't see
a broadcast silently becoming a shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.plans import (
    canonical_plan,
    plan_fingerprint,
)


def _dims(spark):
    big = spark.range(10_000).withColumn("k", F.col("id") % 100)
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return big, small


def test_fingerprint_stable_across_builds(spark):
    big, small = _dims(spark)
    a = plan_fingerprint(big.join(small, "k").groupBy("v").count())
    # a fresh build gets fresh expression ids — hash must not move
    big2, small2 = _dims(spark)
    b = plan_fingerprint(big2.join(small2, "k").groupBy("v").count())
    assert a == b


def test_join_hint_flip_trips_fingerprint(spark):
    big, small = _dims(spark)
    broadcasted = plan_fingerprint(
        big.join(F.broadcast(small), "k").groupBy("v").count()
    )
    big2, small2 = _dims(spark)
    shuffled = plan_fingerprint(
        big2.join(small2.hint("shuffle_hash"), "k").groupBy("v").count()
    )
    assert broadcasted != shuffled


def test_canonical_plan_is_operator_names_only(spark):
    big, small = _dims(spark)
    canon = canonical_plan(big.join(small, "k"))
    assert "#" not in canon  # no expression ids
    assert "file:" not in canon  # no paths
    for line in canon.splitlines():
        assert line and line[0].isalpha() and " " not in line
