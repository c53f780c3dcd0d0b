"""JVM-side vector math over ARRAY<FLOAT/DOUBLE> embedding columns.

All higher-order-function expressions (zip_with/aggregate) — codegen'd, no
Python.  Elements are cast to DOUBLE before arithmetic so results agree
bitwise with the DuckDB oracle's ``::DOUBLE[]`` computations (both engines
then do the same left-to-right double summation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def quantize_int8(arr: Column | str) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` clamped to [-127, 127].

    Returns ``(scale, qvec)`` columns.  Pure higher-order-function
    expressions (transform/aggregate) — codegen'd, no Python, so it runs at
    scan speed over a 100 TB embedding column and cuts the stored bytes 4×
    (the standard pre-ANN compression step).
    """
    ad = as_double(arr)
    amax = F.aggregate(
        ad, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = amax / F.lit(127.0)
    q = F.transform(
        ad,
        lambda x: F.least(
            F.lit(127), F.greatest(F.lit(-127), F.round(x / scale).cast("int"))
        ),
    )
    return scale, q


def dequantize(scale: Column, qvec: Column) -> Column:
    return F.transform(qvec, lambda q: q.cast("double") * scale)
