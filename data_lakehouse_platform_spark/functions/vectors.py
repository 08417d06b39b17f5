"""Vector math over ``array<float>`` embedding columns.

All pure JVM-side higher-order functions (``aggregate``/``zip_with``)
— no Python UDFs — so they run inside whole-stage codegen and scale
linearly with rows. Elements are cast to double and folded
left-to-right, which both Spark and DuckDB do sequentially, so results
are bit-comparable for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_with_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """Cosine with PRE-COMPUTED norms — bit-identical to
    :func:`cosine_similarity` (same dot, same ``na * nb`` product and
    division; the norm just evaluates once per VECTOR instead of once
    per PAIR).  The r10 plan audit found pair joins evaluating the
    full 3-HOF cosine up to 6x per candidate (the threshold filter is
    pushed into the join condition AND re-computed in the project);
    hoisting the norms onto the join sides cuts the per-pair work to
    one dot product."""
    return dot(a, b) / (_c(na) * _c(nb))


def py_l2_norm(vec) -> float:
    """Driver-side L2 norm with EXACTLY Spark's fold semantics: square
    and add left-to-right in IEEE double (same op sequence as
    :func:`l2_norm`'s aggregate over cast-to-double elements, and as
    DuckDB's sqrt(list_dot_product(v, v))), so baking the result in as
    a literal changes no emitted value.  For literal centroid vectors
    this removes one whole HOF evaluation per row per centroid."""
    import math

    acc = 0.0
    for x in vec:
        xx = float(x)
        acc += xx * xx
    return math.sqrt(acc)


def l2_normalize_arrow(df, vec_col: str = "embedding"):
    """L2-normalize embedding arrays via ``mapInArrow`` — the Arrow
    list's flat values buffer views into numpy (one vectorized
    square/sum/divide over the whole batch, no pandas materialization
    and no per-row Python on the fast path), the fastest Python-side
    route Spark offers when a kernel genuinely can't be a built-in
    expression. Ragged or null-bearing batches fall back to a per-row
    loop (correctness over speed for the odd batch). Kept here as the
    template for Arrow-native vector kernels; the pure-expression twin
    (aggregate/zip_with) remains the default for anything the JVM can
    express.
    """
    import math

    import numpy as np
    import pyarrow as pa

    schema = df.schema

    def _norm_fast(la: "pa.ListArray") -> "pa.Array | None":
        """Vectorized path: fixed-width, null-free list column."""
        lengths = np.diff(la.offsets.to_numpy(zero_copy_only=False))
        if (
            la.null_count
            or lengths.size == 0
            or lengths.min() != lengths.max()
            or lengths[0] == 0
        ):
            return None
        d = int(lengths[0])
        vals = la.values.to_numpy(zero_copy_only=False)
        m = vals.reshape(-1, d).astype(np.float64, copy=False)
        norms = np.sqrt((m * m).sum(axis=1))
        out = m / np.where(norms > 0, norms, 1.0)[:, None]
        return pa.ListArray.from_arrays(
            la.offsets, pa.array(out.ravel(), type=la.type.value_type)
        )

    def norm_batches(batches):
        for batch in batches:
            tbl = pa.table(batch)
            col = tbl.column(vec_col).combine_chunks()
            arr = _norm_fast(col)
            if arr is None:  # ragged/null batch: per-row fallback
                out_rows = []
                for lst in col.to_pylist():
                    if lst is None:
                        out_rows.append(None)
                        continue
                    n = math.sqrt(sum(x * x for x in lst))
                    out_rows.append([x / n for x in lst] if n > 0 else lst)
                arr = pa.array(out_rows, type=col.type)
            arrays = []
            for name in tbl.column_names:
                if name == vec_col:
                    arrays.append(arr)
                else:
                    arrays.append(tbl.column(name).combine_chunks())
            yield pa.RecordBatch.from_arrays(arrays, names=tbl.column_names)

    return df.mapInArrow(norm_batches, schema)
