from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_lakehouse_platform_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MED", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("dlp-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, *, float_tol: float = 0.0):
    """Replicate the driver's compare: row count, column-name set, and
    order-insensitive value comparison on name-sorted columns."""
    import math

    cols = sorted(spark_df.columns)
    spark_rows = [tuple(row[c] for c in cols) for row in spark_df.collect()]

    duck_res = duck_con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck_res.description]
    assert sorted(duck_cols) == cols, f"schema mismatch: spark={cols} duck={sorted(duck_cols)}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_res.fetchall()]

    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 9)
        return v

    s_sorted = sorted([tuple(norm(v) for v in r) for r in spark_rows], key=repr)
    d_sorted = sorted([tuple(norm(v) for v in r) for r in duck_rows], key=repr)

    def cell_eq(a, b):
        # with a nonzero tolerance, floats compare by |a-b| <= tol on
        # the sorted pairing (independent bucketing would both fail
        # in-tolerance near-ties and pass ~2x-tolerance differences)
        if float_tol > 0.0 and isinstance(a, float) and isinstance(b, float):
            return abs(a - b) <= float_tol
        return a == b

    mismatches = [
        (a, b)
        for a, b in zip(s_sorted, d_sorted)
        if not (len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b)))
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
