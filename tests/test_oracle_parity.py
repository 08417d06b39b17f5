"""Every oracle-able query in the registry must match DuckDB on the
same parquet — the exact check the driver runs (row-count + schema +
order-insensitive values)."""

from __future__ import annotations

import pytest

from data_lakehouse_platform_spark.queries import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

_QUERIES = all_queries()
_ORACLE_KEYS = sorted(name for name, q in _QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", _ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = _QUERIES[name]
    df = q.build(spark, SF_DIR)
    assert_matches_oracle(df, duck, q.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_registry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 16
