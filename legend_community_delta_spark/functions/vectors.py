"""Vector math over ``array<float|double>`` columns — JVM-side expressions.

Dot products / cosine via ``zip_with`` + ``aggregate`` (higher-order
functions, codegen'd).  Elements are cast to double *before* multiply so
results are bit-identical across engines and summation runs left-to-right
deterministically — the property the duckdb-oracle correctness gate relies
on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm vectors (never NaN/div-by-zero)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def literal_vector(values: list[float]) -> Column:
    """A double-array literal column (e.g. an ANN query vector)."""
    return F.array(*[F.lit(float(v)) for v in values])


def cosine_pandas_udf(query_vec: list[float]):
    """Arrow-vectorized cosine against a fixed query vector.

    The Pandas-UDF alternative for WIDE embeddings (1k+ dims), where one
    numpy matmul per Arrow batch beats per-element Column expressions.
    NOTE: BLAS pairwise summation differs from ``aggregate``'s
    left-to-right order in the last ulp — use the Column version
    (:func:`cosine`) when bit-reproducibility against another engine
    matters; this one is for throughput.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def cos(batch):
        M = np.stack(batch.to_numpy()).astype(np.float64)
        dots = M @ q
        norms = np.linalg.norm(M, axis=1)
        denom = norms * qn
        out = np.where(denom > 0, dots / np.where(denom == 0, 1, denom), 0.0)
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints, which pyspark's hint resolver rejects
    cos.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    return pandas_udf("double")(cos)


def hyperplane_signature(vec: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bit signature (as a long).  *planes* are
    driver-side constants (deterministic seed), so the expression is pure
    Column algebra — no shuffle, no UDF; at scale this is a narrow map."""
    v = _c(vec)
    bits = []
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(v, literal_vector(plane),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")
