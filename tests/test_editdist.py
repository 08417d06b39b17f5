"""Completeness + exactness of the deletion-signature edit-distance
join (operators/editdist.py) against a naive in-Python pairwise model.

The operator's whole claim is that it equals the quadratic blocked
self-join without running one — so the test IS the quadratic twin, on
corpora small enough to enumerate: seeded random strings over a tiny
alphabet (maximizing near-collisions), planted near-dups, verbatim
crowds, empty/1-char strings, and multiple blocks.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.editdist import (
    deletion_variants,
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _model_pairs(rows, threshold):
    """The quadratic twin: all (a_key, b_key, dist) with equal block,
    a_key < b_key, lev <= threshold."""
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ka, ba, ta), (kb, bb, tb) = rows[i], rows[j]
            if ba != bb:
                continue
            d = _lev(ta, tb)
            if d <= threshold:
                out.add((ba, min(ka, kb), max(ka, kb), d))
    return out


def _corpus(seed: int, n: int, blocks: int = 2):
    rng = random.Random(seed)
    alphabet = "abc"
    rows = []
    for k in range(n):
        length = rng.randint(0, 8)
        rows.append(
            (
                k,
                rng.randrange(blocks),
                "".join(rng.choice(alphabet) for _ in range(length)),
            )
        )
    # planted families: verbatim crowd + 1-edit + 2-edit neighbors
    base = "abcabcab"
    for k in range(n, n + 4):
        rows.append((k, 0, base))  # crowd of 4 identical
    rows.append((n + 4, 0, base[:-1] + "c"))  # substitution, d=1
    rows.append((n + 5, 0, base[1:]))  # deletion, d=1
    rows.append((n + 6, 0, "x" + base[:-1]))  # sub+shift-ish, d<=2
    rows.append((n + 7, 1, base))  # same text, OTHER block
    return rows


@pytest.mark.parametrize("seed,threshold", [(1, 1), (2, 2), (3, 2)])
def test_matches_quadratic_twin(spark, seed, threshold):
    rows = _corpus(seed, 60)
    df = spark.createDataFrame(rows, "k long, blk int, t string")
    got = {
        (r.blk, r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(
            df, "k", "t", block_cols=("blk",), threshold=threshold
        ).collect()
    }
    assert got == _model_pairs(rows, threshold)


def test_include_zero_false_drops_only_the_zero_tier(spark):
    rows = _corpus(7, 40)
    df = spark.createDataFrame(rows, "k long, blk int, t string")
    full = _model_pairs(rows, 2)
    nonzero = {p for p in full if p[3] >= 1}
    assert nonzero != full  # the verbatim crowd planted d=0 pairs
    got = {
        (r.blk, r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(
            df, "k", "t", block_cols=("blk",), threshold=2,
            include_zero=False,
        ).collect()
    }
    assert got == nonzero


def test_no_block_cols_means_one_global_block(spark):
    rows = [(k, 0, t) for k, _, t in _corpus(11, 30, blocks=1)]
    df = spark.createDataFrame(rows, "k long, blk int, t string")
    got = {
        (r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(df, "k", "t", threshold=2).collect()
    }
    assert got == {(a, b, d) for _, a, b, d in _model_pairs(rows, 2)}


def test_deletion_variants_enumeration(spark):
    """Spark-side variant set == the Python enumeration, including the
    empty and 1-char edge cases the sequence() guards exist for."""
    words = ["", "a", "ab", "abca", "zzzz"]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", deletion_variants("w", 2).alias("v")
    )
    got = {r.w: sorted(r.v) for r in df.collect()}
    for w in words:
        want = {w}
        want |= {w[:i] + w[i + 1:] for i in range(len(w))}
        want |= {
            (w[:i] + w[i + 1:])[:j] + (w[:i] + w[i + 1:])[j + 1:]
            for i in range(len(w))
            for j in range(len(w) - 1)
        }
        assert got[w] == sorted(want), w


def test_null_safe_on_empty_strings(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "a"), (4, "ab"), (5, "abc")],
        "k long, t string",
    )
    got = {
        (r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(df, "k", "t", threshold=2).collect()
    }
    rows = [(k, 0, t) for k, t in [(1, ""), (2, ""), (3, "a"), (4, "ab"), (5, "abc")]]
    assert got == {(a, b, d) for _, a, b, d in _model_pairs(rows, 2)}


def test_registry_query_has_no_cartesian_and_no_python(spark):
    import __spark_entry__ as entry

    df = entry.queries()["fuzzy_match_customers"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_whale_block_completeness_small(spark):
    """Miniature of stress.py shape 8: every row in ONE block, planted
    distance-1 dups must all surface."""
    n, planted = 500, 20
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(
            F.lit("Customer#"),
            F.lpad(
                F.pmod(F.col("id") * 2654435761, F.lit(1_000_000_000))
                .cast("string"),
                9,
                "0",
            ),
        ).alias("t"),
    )
    dups = spark.range(planted).select(
        (F.col("id") + n).alias("k"),
        F.concat(
            F.lit("Customer#"),
            F.substring(
                F.lpad(
                    F.pmod(F.col("id") * 2654435761, F.lit(1_000_000_000))
                    .cast("string"),
                    9,
                    "0",
                ),
                1,
                8,
            ),
            F.lit("X"),
        ).alias("t"),
    )
    pairs = edit_distance_pairs(
        base.unionAll(dups), "k", "t", threshold=2
    )
    found = pairs.where(F.col("b_key") - F.col("a_key") == n).count()
    assert found == planted


# -- hypothesis property layer ------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_H_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# tiny alphabets maximize near-collisions; the unicode strategy mixes
# multi-byte codepoints (umlauts, CJK, an astral-plane emoji) to pin
# CHARACTER-level (not byte-level) edit semantics in both engines
_ascii_texts = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=7),
    min_size=2,
    max_size=24,
)
_unicode_texts = st.lists(
    st.text(alphabet="aä日本\U0001F600", min_size=0, max_size=6),
    min_size=2,
    max_size=16,
)


@given(_ascii_texts)
@settings(**_H_SETTINGS)
def test_property_matches_model_ascii(spark, texts):
    rows = [(k, 0, t) for k, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "k long, blk int, t string")
    got = {
        (r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(df, "k", "t", threshold=2).collect()
    }
    assert got == {(a, b, d) for _, a, b, d in _model_pairs(rows, 2)}


@given(_unicode_texts)
@settings(**_H_SETTINGS)
def test_property_matches_model_unicode(spark, texts):
    """Deletion variants are built from substr slices — CHARACTER
    positions — so multi-byte text must behave exactly like ascii."""
    rows = [(k, 0, t) for k, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "k long, blk int, t string")
    got = {
        (r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(df, "k", "t", threshold=2).collect()
    }
    assert got == {(a, b, d) for _, a, b, d in _model_pairs(rows, 2)}


def test_eager_mode_matches_lazy_and_unpersists(spark):
    """eager=True returns the same pairs and deterministically
    releases the two persisted intermediates (lazy mode leaves them to
    the ContextCleaner — the documented trade)."""
    df = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "smith"), (4, "jones")],
        "k long, t string",
    )
    lazy = sorted(
        (r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(df, "k", "t", threshold=2).collect()
    )
    before = {
        r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    eager = sorted(
        (r.a_key, r.b_key, r.dist)
        for r in edit_distance_pairs(
            df, "k", "t", threshold=2, eager=True
        ).collect()
    )
    assert eager == lazy == [(1, 2, 1), (1, 3, 0), (2, 3, 1)]
    after = [
        r
        for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if r.id() not in before
    ]
    # the only surviving new storage is the (small) localCheckpoint of
    # the RESULT; the groups/sigs persists were released
    assert len(after) <= 1
