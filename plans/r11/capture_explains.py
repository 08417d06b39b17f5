#!/usr/bin/env python
"""Capture .explain('formatted') into plans/r11/<name>_<tag>.txt.
Same as r10's, but against the bench's fanned-out input layout.
Usage: python plans/r11/capture_explains.py <tag> <query> [...]"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/plans/r11")

from bench_env import setup  # noqa: E402

from data_lakehouse_platform_spark.queries import all_queries  # noqa: E402

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark, sf_dir = setup("dlp-explain-r11")
    registry = all_queries()
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
