"""The zero-shuffle MinHash variant must agree exactly with the
exploded/grouped form (MIN is duplicate-insensitive, so both compute
the same signatures)."""

from __future__ import annotations

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.operators import dedup as D
from data_lakehouse_platform_spark.operators import text as T
from tests.conftest import SF_DIR


def test_minhash_inline_matches_exploded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sh = T.explode_shingles(docs, "doc_id", "text", k=3)
    exploded = {tuple(r) for r in D.minhash_signatures(sh, n_hashes=8).collect()}
    inline = {
        tuple(r) for r in D.minhash_signatures_inline(docs, n_hashes=8).collect()
    }
    assert exploded == inline and exploded
