#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into
plans/r10/<name>_<tag>.txt  (tag = before/after).

Plan compilation only — nothing is executed (apart from any collect a
builder itself performs while constructing the plan).  AQE left ON so
the captured tree is the one the engine actually starts from; the
fingerprint lane in bench.py separately hashes the AQE-off canonical
tree.

Usage: python plans/r10/capture_explains.py <tag> [query ...]
  (no query args = all headline queries)
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402
from data_lakehouse_platform_spark.queries import all_queries  # noqa: E402
from data_lakehouse_platform_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dlp-explain")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if not names:
        names = [n for n in HEADLINE if n in registry]
    for name in names:
        q = registry[name]
        build = getattr(q.build, "__wrapped__", q.build)
        df = build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
