"""Curation-extension operators: distributed prefix sum correctness
(vs a driver-side model) and packing/decontamination invariants.
Oracle parity for the three registered queries runs via
test_oracle_parity's registry sweep."""

from __future__ import annotations

import hashlib

import pytest
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


def test_lloyd_kmeans_matches_numpy_model(spark):
    """2-round distributed Lloyd vs an independent numpy model with the
    same fixed-point mean and tie rules — centroids AND assignments
    must agree exactly."""
    import math

    import numpy as np

    from data_lakehouse_platform_spark.catalog import load_table
    from data_lakehouse_platform_spark.operators.kmeans import lloyd_kmeans

    emb = load_table(spark, SF_DIR, "embeddings")
    got_df, got_cents = lloyd_kmeans(emb, k=4, rounds=2)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])

    def assign(cents):
        out = {}
        for i, v in zip(ids, X):
            best = max(
                cents,
                key=lambda c: (
                    float(np.dot(v, c[1]) / (math.sqrt(np.dot(v, v)) * math.sqrt(np.dot(c[1], c[1])))),
                    -c[0],
                ),
            )
            out[int(i)] = best[0]
        return out

    cents = [(int(i), X[j].tolist()) for j, i in enumerate(ids) if i < 4]
    for _ in range(2):
        a = assign(cents)
        new = []
        for cid in sorted({c for c in a.values()}):
            members = X[[int(i) in a and a[int(i)] == cid for i in ids]]
            fp = np.floor(members * 1e6).sum(axis=0)
            new.append((cid, (fp / (1e6 * len(members))).tolist()))
        cents = new
    assert [c for c, _ in got_cents] == [c for c, _ in cents]
    for (_, gv), (_, wv) in zip(got_cents, cents):
        assert gv == pytest.approx(wv, abs=0.0)  # bit-exact
    final = assign(cents)
    got_assign = {r["vec_id"]: r["cell_id"] for r in got_df.collect()}
    assert got_assign == final


def test_new_ops_plan_contracts(spark):
    """Scale contracts: packing never funnels through a single-partition
    exchange (the whole point of the two-pass prefix sum); the
    decontamination corpus side joins the benchmark only by broadcast;
    nothing runs row-at-a-time Python."""
    from data_lakehouse_platform_spark.plans import audit_plan

    qs = all_queries()
    pack = audit_plan(qs["pack_sequences"].build(spark, SF_DIR))
    assert pack.single_partition_exchanges == 0
    assert pack.python_free_hot_path

    dec = audit_plan(qs["decontaminate_ngram"].build(spark, SF_DIR))
    assert dec.broadcast_hash_joins >= 1
    assert dec.sort_merge_joins == 0 and dec.cartesian_products == 0
    assert dec.python_free_hot_path

    km = audit_plan(qs["kmeans_cells"].build(spark, SF_DIR))
    assert km.python_free_hot_path
    assert km.cartesian_products == 0


def test_udtf_chunker_windows_and_reconstruction(spark):
    """Python UDTF chunker: overlapping token windows with exact
    coverage (stitching non-overlap parts rebuilds the normalized
    text), lateral-join parallelism, and loud rejection of bad
    window specs."""
    import pytest as _pytest

    from data_lakehouse_platform_spark.operators.chunking import (
        _chunk_tokens,
        chunk_documents,
        reconstruct_from_chunks,
    )

    toks = [str(i) for i in range(10)]
    rows = list(_chunk_tokens(toks, 4, 1))
    assert rows[0] == (0, 0, 4, "0 1 2 3")
    assert [r[1] for r in rows] == [0, 3, 6]  # stride = size - overlap
    assert sum(r[2] - (1 if r[0] else 0) for r in rows) == len(toks)
    with _pytest.raises(ValueError, match="overlap"):
        list(_chunk_tokens(toks, 4, 4))

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    chunks = chunk_documents(docs, size=32, overlap=8)
    assert chunks.columns == ["doc_id", "chunk_id", "start_tok", "n_tokens", "chunk"]
    assert chunks.where(F.col("n_tokens") > 32).count() == 0
    per_doc = chunks.groupBy("doc_id").count()
    assert per_doc.where(F.col("count") < 1).count() == 0

    rebuilt = reconstruct_from_chunks(chunks, overlap=8)
    norm = docs.select(
        "doc_id", F.regexp_replace(F.trim("text"), r"\s+", " ").alias("norm")
    )
    assert (
        rebuilt.join(norm, "doc_id").where(F.col("rebuilt") != F.col("norm")).count()
        == 0
    )


def test_chunk_documents_interleaved_calls_do_not_clobber(spark):
    """Two chunk_documents calls whose execution interleaves (both
    built lazily, executed after both are constructed) must each read
    their OWN documents — a fixed temp-view name used to make the
    earlier DataFrame silently chunk the later call's input."""
    from data_lakehouse_platform_spark.operators.chunking import chunk_documents

    a = spark.createDataFrame([(1, "alpha " * 8)], "doc_id long, text string")
    b = spark.createDataFrame([(2, "beta " * 8)], "doc_id long, text string")
    ca = chunk_documents(a, size=4, overlap=0)  # lazy
    cb = chunk_documents(b, size=4, overlap=0)  # lazy — second view registered
    rows_a = ca.collect()  # executes AFTER cb's registration
    rows_b = cb.collect()
    assert {r.doc_id for r in rows_a} == {1}
    assert all("alpha" in r.chunk for r in rows_a)
    assert {r.doc_id for r in rows_b} == {2}
    assert all("beta" in r.chunk for r in rows_b)
