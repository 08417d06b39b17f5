"""Document chunking as a Python UDTF (Spark 3.5+/4.x table
function) — the RAG/pretraining windowing step: one document row in,
one row per overlapping token-window chunk out.

Why a UDTF and not explode(expr): the chunker carries per-row state
(window start positions, tail handling) that is awkward as a single
array expression but trivial as a generator; the UDTF runs under the
LATERAL join operator, so Spark parallelizes it per input partition
exactly like any map stage — no driver involvement, no skew beyond
document length itself.

Python UDTFs are the slow path (per-row Python). This one is
Arrow-optimized (useArrow=True) to cut serialization; for hot paths
prefer the pure-expression token ops in operators/text.py, and treat
this as the template for chunkers that genuinely need imperative
logic (sentence boundaries, token budgets with lookahead, etc.).

Reference analog: none — the reference has no corpus-windowing stage;
this belongs to the LLM-pipeline surface (SURVEY §2 LLM ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SCHEMA = "chunk_id int, start_tok int, n_tokens int, chunk string"


def _chunk_tokens(tokens: list[str], size: int, overlap: int):
    """Yield (chunk_id, start, n, text) windows of `size` tokens
    advancing by `size - overlap`; the final partial window is kept
    (a truncated tail would silently drop corpus)."""
    if size <= 0 or not 0 <= overlap < size:
        raise ValueError(f"need size > 0 and 0 <= overlap < size, got {size=} {overlap=}")
    step = size - overlap
    cid = 0
    for start in range(0, max(len(tokens) - overlap, 1), step):
        window = tokens[start : start + size]
        if not window:
            break
        yield cid, start, len(window), " ".join(window)
        cid += 1
        if start + size >= len(tokens):
            break


def make_chunk_udtf():
    """Build the UDTF class lazily (udtf decorator imports at call
    time so environments without the API fail at use, not import)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=CHUNK_SCHEMA, useArrow=True)
    class ChunkText:
        def eval(self, text: str, size: int, overlap: int):
            if text is None:
                return
            toks = text.split()
            for row in _chunk_tokens(toks, size, overlap):
                yield row

    return ChunkText


def chunk_documents(
    docs: DataFrame, size: int = 64, overlap: int = 16, text_col: str = "text"
) -> DataFrame:
    """LATERAL-join every document against its chunk windows. Returns
    doc_id + CHUNK_SCHEMA columns; downstream stages treat chunks as
    first-class rows (dedup them, embed them, pack them).

    Built with the DataFrame ``lateralJoin`` API (Spark 4) and an
    ``.outer()`` column reference — no named temp view at all, so
    concurrent/interleaved calls can't collide and a long-lived
    session's catalog doesn't accumulate one view per call (the
    earlier SQL-text form needed a uuid-named view that then leaked)."""
    chunk_udtf = make_chunk_udtf()
    return docs.select("doc_id", F.col(text_col).alias("__text")).lateralJoin(
        chunk_udtf(
            F.col("__text").outer(), F.lit(int(size)), F.lit(int(overlap))
        )
    ).select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk")


def reconstruct_from_chunks(chunks: DataFrame, overlap: int) -> DataFrame:
    """Inverse check: drop each non-first chunk's leading `overlap`
    tokens and stitch per doc in chunk order — must equal the
    original whitespace-normalized text (tested)."""
    spark = chunks.sparkSession  # noqa: F841  (kept for API symmetry)
    tail = F.when(
        F.col("chunk_id") == 0, F.col("chunk")
    ).otherwise(
        F.array_join(
            F.slice(F.split(F.col("chunk"), " "), overlap + 1, 1_000_000), " "
        )
    )
    return (
        chunks.withColumn("__part", tail)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "__part"))
                    ),
                    lambda s: s["__part"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
