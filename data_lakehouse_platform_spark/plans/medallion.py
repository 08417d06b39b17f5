"""Medallion (bronze → silver → gold) pipeline assembly.

The reference runs its layers as per-table Airflow-scheduled scripts
(scripts/batch/bronze_dimension_fact_load.py → silver_*.py →
gold_*.py). Here the same flow is a library object over a base
directory, so a pipeline is declared once and each layer stays an
independent, idempotent, incrementally-loaded step:

    bronze: watermark-incremental ingest, y/m/d partitioned parquet
    silver: declarative cleaning transform, full or incremental
    gold:   SCD2 dims (scd2_merge) + star fact + DQ metrics

Every step is restart-safe (incremental steps no-op when there is
nothing new) and all heavy lifting stays in the writers/operators
modules — this file is orchestration shape only, so swapping the
storage layer (plain parquet here; Delta/Iceberg in production) does
not touch pipeline definitions.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_platform_spark.operators.quality import DQCheck, run_checks
from data_lakehouse_platform_spark.sources import writers


class MedallionPipeline:
    """Bronze/silver/gold layout under ``base_dir``."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir

    def path(self, layer: str, table: str) -> str:
        return os.path.join(self.base_dir, layer, table)

    def read(self, layer: str, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(layer, table))

    # -- bronze --------------------------------------------------------------

    def bronze_ingest(self, source: DataFrame, table: str, ts_col: str) -> int:
        """Watermark-incremental append of new source rows; returns the
        row count written (0 = nothing new; the step is a cheap no-op:
        one footer-stats max + one pushed-down filter scan)."""
        return writers.incremental_append(
            self.spark, self.path("bronze", table), source, ts_col
        )

    def bronze_ingest_partitioned(
        self, source: DataFrame, table: str, date_col: str
    ) -> None:
        """Full partitioned (y/m/d) bronze write — first-load path of
        the reference's bronze job (bronze_dimension_fact_load.py:95-99)."""
        writers.write_partitioned_by_date(source, self.path("bronze", table), date_col)

    # -- silver --------------------------------------------------------------

    def silver_transform(
        self, table: str, transform: Callable[[DataFrame], DataFrame]
    ) -> None:
        """Cleaning/conforming layer: a declarative DataFrame→DataFrame
        function over bronze, overwritten as the silver truth."""
        out = transform(self.read("bronze", table))
        out.write.mode("overwrite").parquet(self.path("silver", table))

    # -- gold ----------------------------------------------------------------

    def gold_scd2(
        self,
        table: str,
        key_col: str,
        tracked_cols: list[str],
        ts_col: str,
        source_table: str | None = None,
    ) -> None:
        """Effective-dated dimension (SCD Type 2) over the silver
        source table (defaults to the same name as the gold dim)."""
        writers.scd2_merge(
            self.spark,
            self.path("gold", table),
            self.read("silver", source_table or table),
            key_col=key_col,
            tracked_cols=tracked_cols,
            ts_col=ts_col,
        )

    def gold_fact(
        self, table: str, build: Callable[[SparkSession, "MedallionPipeline"], DataFrame]
    ) -> None:
        """Star-schema fact build: caller composes silver facts with
        gold dims (broadcast the dims — they are bounded)."""
        build(self.spark, self).write.mode("overwrite").parquet(self.path("gold", table))

    # -- similarity index ----------------------------------------------------

    def build_similarity_index(
        self,
        docs: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 3,
        n_hashes: int = 16,
    ) -> str:
        """Materialize the MinHash signature table ONCE under
        ``index/similarity_signatures``.

        Every LSH consumer in a curation run — near-dup candidate
        generation, Jaccard estimation, dedup clustering, per-source
        provenance overlap — needs the same (doc_id, h0..h{n-1})
        signatures, and shingling + hashing the corpus is the expensive
        part (full text scan; the banded index derives from signatures
        with a narrow map). Registry queries stay standalone by
        contract, but a PIPELINE should hash the corpus once and point
        all consumers here: read via :meth:`similarity_signatures`,
        then ``operators.dedup.lsh_candidate_pairs`` and the signature
        re-joins run off the stored artifact with zero re-shingling.

        Returns the artifact path. Deterministic md5-derived
        permutations (operators/dedup.py) make the artifact stable
        across rebuilds, so an overwrite is an idempotent refresh.
        """
        from data_lakehouse_platform_spark.operators import dedup as D
        from data_lakehouse_platform_spark.operators import text as T

        sh = T.explode_shingles(docs, id_col, text_col, k=k, distinct=False)
        sigs = D.minhash_signatures(sh, id_col=id_col, n_hashes=n_hashes)
        out = self.path("index", "similarity_signatures")
        sigs.write.mode("overwrite").parquet(out)
        return out

    def similarity_signatures(self) -> DataFrame:
        """The materialized MinHash signature artifact (build it first
        with :meth:`build_similarity_index`)."""
        return self.read("index", "similarity_signatures")

    # -- data quality --------------------------------------------------------

    def validate(self, layer: str, checks: list[DQCheck]) -> DataFrame:
        """One-scan-per-table DQ metrics for the given layer's tables."""
        tables = {c.table: self.read(layer, c.table) for c in checks}
        return run_checks(tables, checks)

    def build_uniques_sketch(
        self,
        df: DataFrame,
        group_cols: list[str],
        value_col: str,
        *,
        name: str = "uniques",
    ) -> str:
        """APPEND a batch's HLL register table under ``index/hll_<name>``.

        Sketch state — not raw ids — is what a daily job should
        persist: the artifact is |groups| x 64 narrow rows per batch,
        and any later rollup over any subset of batches/groups is a
        register-wise MAX over that tiny table, never a re-scan of the
        fact data (queries hll_distinct_users / hll_union_rollup show
        the same algebra inside one query; this is the cross-RUN form).
        Appends stay mergeable by construction because every batch
        shares the identical md5 hash/rho projection
        (operators/sketches.py) — :meth:`uniques_estimate` MAXes
        everything it finds, so re-running a day is idempotent for the
        estimate and a backfill is just another append.
        """
        from data_lakehouse_platform_spark.operators import sketches as SK

        regs = SK.hll_registers(df, group_cols, value_col)
        out = self.path("index", f"hll_{name}")
        regs.write.mode("append").parquet(out)
        return out

    def uniques_estimate(
        self, group_cols: list[str], *, name: str = "uniques"
    ) -> DataFrame:
        """Distinct-count estimates from the stored register artifact:
        merge (MAX per group+register) then the shared ordered-fold
        estimator — bit-identical to a sketch built directly over the
        union of every appended batch (tested)."""
        from pyspark.sql import functions as F

        from data_lakehouse_platform_spark.operators import sketches as SK

        merged = (
            self.read("index", f"hll_{name}")
            .groupBy(*group_cols, "reg")
            .agg(F.max("m").alias("m"))
        )
        return SK.hll_estimate(merged, group_cols)
