"""Curation-extension operators: distributed prefix sum correctness
(vs a driver-side model) and packing/decontamination invariants.
Oracle parity for the three registered queries runs via
test_oracle_parity's registry sweep."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.packing import exclusive_prefix_sum
from data_lakehouse_platform_spark.queries import all_queries
from tests.conftest import SF_DIR


def test_exclusive_prefix_sum_matches_python_model(spark):
    rows = [(i, hashlib.md5(str(i).encode()).hexdigest(), (i * 7) % 13 + 1) for i in range(237)]
    df = spark.createDataFrame(rows, "id: long, okey: string, w: long")
    got = {
        r["id"]: r["off"]
        for r in exclusive_prefix_sum(df, "okey", "w", out_col="off").collect()
    }
    run, want = 0, {}
    for _, okey, w in sorted(rows, key=lambda r: r[1]):
        want[[r for r in rows if r[1] == okey][0][0]] = run
        run += w
    assert got == want
    # single-bucket degenerate case (bucket_chars longer than any split)
    one = exclusive_prefix_sum(df, "okey", "w", out_col="off", bucket_chars=32)
    assert {r["id"]: r["off"] for r in one.collect()} == want


def test_pack_sequences_invariants(spark):
    rows = all_queries()["pack_sequences"].build(spark, SF_DIR).collect()
    assert rows
    ordered = sorted(rows, key=lambda r: r["start_offset"])
    # offsets tile the token stream exactly: each doc starts where the
    # previous one ended, starting at 0
    assert ordered[0]["start_offset"] == 0
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur["start_offset"] == prev["start_offset"] + prev["n_tokens"]
        assert cur["bin_id"] == cur["start_offset"] // 512


def test_decontaminate_excludes_benchmark_docs(spark):
    df = all_queries()["decontaminate_ngram"].build(spark, SF_DIR)
    rows = df.collect()
    assert rows
    assert all(r["doc_id"] % 50 != 0 for r in rows)
    assert all((r["n_shared"] > 0) == bool(r["is_contaminated"]) for r in rows)
