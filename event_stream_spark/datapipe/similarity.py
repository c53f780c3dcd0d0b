"""Similarity search over the ``embeddings`` table (ARRAY<FLOAT>, 64-dim).

- ``ann_topk_brute``: exact top-k by cosine — one narrow scan + TakeOrdered
  (per-partition top-k, merge on driver).  The correctness baseline.
- ``ann_lsh_topk``: random-hyperplane LSH — 8-bit bucket signature from the
  signs of 8 pseudo-random projections (hyperplanes derived deterministically
  from md5, no RNG state).  At scale the table is pre-bucketed once
  (partitionBy(bucket)) and a query probes one bucket: the scan prunes to
  ~1/256 of the data.  Recall is tested against the brute-force baseline.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.vector import as_double, cosine, dot
from event_stream_spark.queries import t

N_PLANES = 8
DIM = 64


def _query_vector(spark: SparkSession, sf: str, vec_id: int = 0) -> list[float]:
    """The probe vector.  A real service receives this as a literal input;
    fetching one row here mirrors that (not a distributed collect)."""
    row = (
        t(spark, sf, "embeddings").filter(F.col("vec_id") == vec_id).head()
    )
    return [float(x) for x in row["embedding"]]


def ann_topk_brute(spark: SparkSession, sf: str, k: int = 10) -> DataFrame:
    q = _query_vector(spark, sf)
    qcol = F.array(*[F.lit(x).cast("double") for x in q])
    e = t(spark, sf, "embeddings")
    return (
        e.select("vec_id", F.round(cosine(F.col("embedding"), qcol), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(k)
    )


ANN_TOPK_SQL = """
    SELECT vec_id,
           round(list_cosine_similarity(
               embedding::DOUBLE[],
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS sim
    FROM embeddings
    ORDER BY sim DESC, vec_id
    LIMIT 10
"""


def _hyperplane(i: int) -> list[float]:
    """Deterministic pseudo-random hyperplane i: component j from md5(i|j),
    mapped to [-1, 1].  No RNG state → identical across engines/runs."""
    comps = []
    for j in range(DIM):
        h = int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8], 16)
        comps.append(h / float(1 << 31) - 1.0)
    return comps


def lsh_bucket_expr(vec: Column) -> Column:
    """8-bit bucket id: bit i = sign(dot(vec, hyperplane_i))."""
    v = as_double(vec)
    bits = []
    for i in range(N_PLANES):
        plane = F.array(*[F.lit(x).cast("double") for x in _hyperplane(i)])
        bits.append(F.when(dot(v, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(spark: SparkSession, sf: str, k: int = 10) -> DataFrame:
    """Top-k within the probe's LSH bucket — the pruned-scan path."""
    q = _query_vector(spark, sf)
    qcol = F.array(*[F.lit(x).cast("double") for x in q])
    e = t(spark, sf, "embeddings").withColumn(
        "bucket", lsh_bucket_expr(F.col("embedding"))
    )
    qbucket = (
        spark.range(1).select(lsh_bucket_expr(qcol).alias("b")).head()["b"]
    )
    return (
        e.filter(F.col("bucket") == qbucket)
        .select("vec_id", F.round(cosine(F.col("embedding"), qcol), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(k)
    )
