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


def test_oracle_fixed_point_scale_consistency():
    """Several oracle strings inline the fixed-point money fragment
    verbatim (readable SQL beats interpolation there); this guard
    makes that safe: if functions/money.SCALE ever changes, every
    inlined DECIMAL(28,0) fragment that silently kept the old scale
    fails here at test time instead of drifting from the Spark side."""
    import re

    from data_lakehouse_platform_spark.functions.money import SCALE

    pat = re.compile(r"FLOOR\((.+?)\*\s*(\d+)\)\s*AS\s+DECIMAL\(28,\s*0\)")
    checked = 0
    for name, q in _QUERIES.items():
        if not q.oracle:
            continue
        for m in pat.finditer(q.oracle):
            assert int(m.group(2)) == SCALE, (
                f"{name}: oracle fixed-point scale {m.group(2)} != "
                f"money.SCALE {SCALE}"
            )
            checked += 1
    assert checked > 50  # the guard actually sees the inlined copies
