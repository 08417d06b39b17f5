"""Round-8 registry additions.

Registered AFTER every pre-existing module (see the import order note
in :func:`queries.all_queries`): the external driver grades the first
50 registry keys by registration order, so new entries only ever
append.

First batch: the scale-production twin of MinHash+LSH with the
hot-bucket cap actually firing (VERDICT r7 "Next round" #2) — the form
you'd run at 100 TB gets its own value-hashed correctness row instead
of resting on stress shape 2 alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.operators import dedup as D
from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import register
from data_lakehouse_platform_spark.queries_llm import _BANDS, _N_HASHES, _minhash_ctes


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Cap chosen to BIND at board scale: sf0.01's bucket-size histogram is
# {1: ~1.8k, 2: 80, 3: 3}, so cap=2 demonstrably drops the size-3
# buckets and the board hash-checks the dropped-bucket semantics —
# which bucket members lose their pairs and which pairs survive via
# OTHER (small) bands — against DuckDB.  The production cap (1000,
# queries_llm._LSH_MAX_BUCKET) never fires at driver SFs, so without
# this twin the gate's firing path would be stress-proven (stress.py
# shape 2: a 10k identical-doc crowd) but never value-checked.
_LSH_DEMO_CAP = 2


@register(
    "dedup_minhash_lsh_capped",
    f"""
WITH {_minhash_ctes(cap=_LSH_DEMO_CAP)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM banded a
JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    "The 100-TB form of MinHash+LSH with the hot-bucket cap actually "
    "FIRING: band buckets holding more than max_bucket docs are dropped "
    "from pair generation (their members are near-identical crowds that "
    "dedup_exact collapses first), bounding any single reducer's pair "
    "fan-out at cap^2/2. The cap here (2) is set to bind at board scale "
    "so the gate's semantics — not just its plan shape — carry a green "
    "correctness row; production uses 1000.",
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = T.explode_shingles(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, distinct=False
    )
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    return D.lsh_candidate_pairs(
        sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_DEMO_CAP
    )
