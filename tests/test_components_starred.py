"""Large-star/small-star connected components: equality with the
min-label-propagation implementation, fast convergence on the
adversarial long-chain graphs propagation is slow on, and the
singletons-absent contract."""

from __future__ import annotations

from data_lakehouse_platform_spark.operators.components import (
    connected_components,
    connected_components_starred,
)


def _canon(df):
    return sorted((r.node, r.component) for r in df.collect())


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_starred_equals_propagation_on_mixed_graph(spark):
    # two clumps, a triangle, a bridge, reversed/duplicated edges
    pairs = [
        (1, 2), (2, 3), (3, 1),          # triangle
        (10, 11), (11, 12), (12, 10),    # clump
        (3, 10),                         # bridge: one component 1..12
        (20, 21), (21, 20),              # dup both orders
        (30, 31), (31, 32),              # chain
    ]
    e = _edges(spark, pairs)
    assert _canon(connected_components_starred(e)) == _canon(
        connected_components(e)
    )


def test_starred_converges_on_long_path_in_few_rounds(spark):
    # a 64-node path: diameter 63 — label propagation needs ~63 rounds,
    # the star alternation is O(log n); max_iter=8 must suffice
    n = 64
    e = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    got = connected_components_starred(e, max_iter=8)
    assert _canon(got) == [(i, 0) for i in range(n)]


def test_starred_label_is_component_min(spark):
    e = _edges(spark, [(7, 5), (5, 9), (100, 42)])
    got = dict(_canon(connected_components_starred(e)))
    assert got == {5: 5, 7: 5, 9: 5, 42: 42, 100: 42}


def test_starred_empty_and_self_loop_edges(spark):
    e = _edges(spark, [(1, 1), (2, 2)])  # only self-loops: no real edges
    assert _canon(connected_components_starred(e)) == []
