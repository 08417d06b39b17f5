"""basket_triples' whale-basket cap (r9): the demo cap must actually
FIRE at test scale (capped results differ from uncapped) and a planted
whale basket must contribute nothing — the property the scale lane's
bound rides on."""

from __future__ import annotations

from data_lakehouse_platform_spark.queries_r8_ext import basket_triples
from data_lakehouse_platform_spark.queries_r9_ext import (
    _TRI_DEMO_CAP,
    basket_triples_capped,
)
from tests.conftest import SF_DIR


def test_demo_cap_fires(spark):
    # sf0.001 baskets reach 11 distinct parts, so cap=7 drops some —
    # the capped top-25 must differ from the uncapped one
    uncapped = [tuple(r) for r in basket_triples(spark, SF_DIR).collect()]
    capped = [
        tuple(r) for r in basket_triples_capped(spark, SF_DIR).collect()
    ]
    assert capped != uncapped


def test_whale_basket_contributes_nothing(spark, tmp_path):
    # one bot order with 500 distinct parts + a few real baskets: with
    # the cap, triples come ONLY from the small baskets (C(500,3) ~ 2e7
    # candidate triples never materialize)
    rows = [(999_999, p) for p in range(500)]
    rows += [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = basket_triples(spark, str(tmp_path)).collect()
    assert [(r.p1, r.p2, r.p3, r.support) for r in out] == [
        (10, 11, 12, 2)
    ]
    # and the capped variant agrees (both caps < 500)
    out2 = basket_triples_capped(spark, str(tmp_path)).collect()
    assert [(r.p1, r.p2, r.p3, r.support) for r in out2] == [
        (10, 11, 12, 2)
    ]
    assert _TRI_DEMO_CAP < 500
