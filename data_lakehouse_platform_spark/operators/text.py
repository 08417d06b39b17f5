"""Text-analysis primitives for LLM-scale corpus processing.

Everything here is pure JVM expression work (regexp/split/transform)
— no Python UDFs — so it runs inside whole-stage codegen and scales
linearly over document shards. Token/shingle explosion is the only
row-multiplying step; downstream joins key on shingle/band values so
the shuffle width stays bounded by text size, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace-normalized view of a text column.


def normalize_ws(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), r"\s+", " ")


def ws_tokens(col: Column | str) -> Column:
    return F.split(normalize_ws(col), " ")


def shingle_expr(toks_col: str, k: int) -> Column:
    """Array of word k-shingles from a token-array column (JVM-side
    higher-order functions; empty array for short docs)."""
    terms = ", ".join(f"{toks_col}[i + {j}]" for j in range(k))
    return F.expr(
        f"CASE WHEN size({toks_col}) >= {k} "
        f"THEN transform(sequence(0, size({toks_col}) - {k}), i -> concat_ws(' ', {terms})) "
        f"ELSE array() END"
    )


def explode_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs, DISTINCT per document by default.

    Pass ``distinct=False`` when the consumer is duplicate-insensitive
    (MinHash takes a MIN per hash) — the distinct is a full shuffle of
    the exploded rows, the single most expensive step of the shingle
    pipeline, and skipping it changes nothing for such consumers.
    Set-semantics consumers (Jaccard counts intersections) need it.
    """
    exploded = df.select(id_col, ws_tokens(text_col).alias("__toks")).select(
        id_col, F.explode(shingle_expr("__toks", k)).alias("shingle")
    )
    return exploded.distinct() if distinct else exploded


# DuckDB oracle twins — keep in lockstep with the Column versions.


def sql_normalize_ws(expr: str) -> str:
    return f"regexp_replace(trim({expr}), '\\s+', ' ', 'g')"


def sql_shingles_cte(k: int = 3, text_expr: str = "text") -> str:
    """CTEs `norm_docs(doc_id, toks)` and `shingles(doc_id, shingle)`
    (distinct) over the documents view."""
    terms = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return f"""
norm_docs AS (
  SELECT doc_id, string_split({sql_normalize_ws(text_expr)}, ' ') AS toks
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= {k}
         THEN list_transform(range(1, len(toks) - {k - 2}), i -> {terms})
         ELSE [] END) AS shingle
  FROM norm_docs
)"""
