#!/usr/bin/env python
"""Full-registry timing sweep: every queries() entry once warm, once
timed (noop sink, unwrapped builder, cache cleared between runs).
Triage tool for the optimization round — finds expensive queries the
43-query headline bench does not cover.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from data_lakehouse_platform_spark.catalog import TABLES, load_table  # noqa: E402
from data_lakehouse_platform_spark.queries import all_queries  # noqa: E402
from data_lakehouse_platform_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dlp-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    out = {}
    for i, (name, q) in enumerate(registry.items()):
        build = getattr(q.build, "__wrapped__", q.build)

        def _run():
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            spark.catalog.clearCache()
            return el

        try:
            _run()
            out[name] = round(_run(), 3)
        except Exception as ex:  # noqa: BLE001
            out[name] = f"ERR: {str(ex)[:120]}"
        print(f"[{i + 1}/{len(registry)}] {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
