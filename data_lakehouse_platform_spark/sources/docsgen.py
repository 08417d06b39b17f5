"""A custom Python Data Source (Spark 4 `pyspark.sql.datasource` API):
deterministic synthetic-document generation as a first-class
`spark.read.format(...)` source.

Why this exists: corpus experiments constantly need a reproducible
N-document table (dedup thresholds, packing budgets, chunker configs)
WITHOUT materializing parquet first. Registering a generator as a data
source makes it a real scan node — partitioned, parallel, usable in
SQL — instead of a driver-side createDataFrame that collects N rows
into the driver (the anti-pattern this replaces; at 1e9 synthetic rows
a driver list is impossible, while this source streams each partition
on its executor).

Determinism: doc i's text derives from md5(i) alone — same rows for a
given (n_docs, n_partitions) on every engine, every run. Partition p
owns the contiguous id range [p*n/k, (p+1)*n/k).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

DOCSGEN_SCHEMA = "doc_id bigint, text string, lang string, n_chars int"

_LANGS = ("en", "de", "fr", "es")
_WORDS = (
    "data lake house spark shuffle broadcast partition column "
    "vector token corpus window stream batch merge commit"
).split()


def _doc_row(i: int) -> tuple:
    h = hashlib.md5(f"doc|{i}".encode()).hexdigest()
    # 8-24 words chosen by successive hex pairs — fully determined by i.
    n_words = 8 + int(h[:2], 16) % 17
    words = [
        _WORDS[int(h[2 * j % 30 : 2 * j % 30 + 2], 16) % len(_WORDS)]
        for j in range(n_words)
    ]
    text = " ".join(words)
    lang = _LANGS[int(h[30:32], 16) % len(_LANGS)]
    return (i, text, lang, len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class DocsGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("n_partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n_docs // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _doc_row(i)


class DocsGenDataSource(DataSource):
    """Usage:
        spark.dataSource.register(DocsGenDataSource)
        spark.read.format("docsgen").option("n_docs", 5000).load()
    """

    @classmethod
    def name(cls) -> str:
        return "docsgen"

    def schema(self) -> str:
        return DOCSGEN_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return DocsGenReader(self.options)
