#!/usr/bin/env python
"""Single-query oracle parity check (optimization-round loop tool):
exactly the driver_sim compare (value + emitted order + Arrow dtype,
vanilla session) but only for the named queries, at one or more SFs.

Usage: python plans/r10/check_queries.py q1 q2 ...
       SFS=/root/testdata/sf0.001,/root/testdata/sf0.01 (default both)
"""
import math
import os
import sys
from collections import Counter

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/.claude/skills/verify")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "16g")
    .appName("check-queries")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402
from oracle_dtype_scan import normalize as _arrow_norm  # noqa: E402


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return repr(v)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: check_queries.py <query> [...]", file=sys.stderr)
        return 2
    sfs = os.environ.get(
        "SFS", "/root/testdata/sf0.001,/root/testdata/sf0.01"
    ).split(",")
    qs = e.queries()
    oracles = e.oracle_sql()
    bad = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            sdf = qs[name](spark, sf)
            sql = oracles[name]
            from pyspark.sql.pandas.types import to_arrow_schema

            spark_arrow = to_arrow_schema(sdf.schema)
            duck = con.execute(
                f"SELECT * FROM ({sql.rstrip().rstrip(';')}) _q LIMIT 0"
            ).fetch_arrow_table().schema
            duck_by = {f.name: f.type for f in duck}
            mism = [
                f"{f.name}: spark={_arrow_norm(f.type)} "
                f"oracle={_arrow_norm(duck_by[f.name])}"
                for f in spark_arrow
                if f.name in duck_by
                and _arrow_norm(f.type) != _arrow_norm(duck_by[f.name])
            ]
            if mism:
                print(f"FAIL {name} @ {sf}: ARROW DTYPE {mism}")
                bad += 1
                continue
            cols = sorted(sdf.columns)
            srows = [tuple(norm(r[c]) for c in cols) for r in sdf.collect()]
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            if sorted(dcols) != cols:
                print(f"FAIL {name} @ {sf}: schema {cols} vs {sorted(dcols)}")
                bad += 1
                continue
            idx = [dcols.index(c) for c in cols]
            drows = [tuple(norm(r[j]) for j in idx) for r in res.fetchall()]
            if srows != drows:
                s, d = Counter(srows), Counter(drows)
                if s == d:
                    print(f"FAIL {name} @ {sf}: ROW ORDER only")
                else:
                    diff = list((s - d).items())[:2] + list((d - s).items())[:2]
                    print(f"FAIL {name} @ {sf}: values {diff}")
                bad += 1
                continue
            print(f"OK {name} @ {sf} ({len(srows)} rows)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
