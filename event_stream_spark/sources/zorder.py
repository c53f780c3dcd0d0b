"""Z-order (Morton-curve) clustered lake layout — multi-dimensional
file/row-group pruning for the columns a single sort key cannot serve.

The other at-rest layouts each serve ONE dominant predicate: the block lake
buckets by height (``sources/blocks.py``), the event lake partitions by day
(``sources/eventlake.py``), the IVF lake partitions by list
(``datapipe/similarity.py``).  When two predicates matter equally (the
classic ``WHERE user_id = ? AND ts BETWEEN ? AND ?`` over a lake too
fine-grained to partition by both), linearising rows along a Z-curve makes
every written file cover a narrow range of EVERY clustered dimension
simultaneously, so parquet min/max footer statistics skip files/row-groups
for predicates on any of them — the layout Delta's ``OPTIMIZE ZORDER BY``
and ClickHouse/DuckDB space-filling-curve orderings implement.

Pipeline (all JVM-side, one pass + one range shuffle):

1. **Quantize** each dimension to ``2^bits_per_dim`` order-preserving
   buckets.  Rank quantization uses ``approxQuantile`` boundaries (one
   driver-side fetch of ≤ (2^bits − 1) doubles per column — skew-robust,
   the same scheme as Delta's range ids); the bucket index is a codegen
   fold over the literal boundary array.  ``quantizer="linear"`` swaps in
   min/max scaling for provably uniform keys (2 scalar aggregates, no
   fold).
2. **Interleave** the bucket bits into the Morton code with
   shift/mask/or expressions — pure whole-stage-codegen arithmetic,
   no UDF.
3. **Write** via ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``:
   contiguous Z-ranges land in the same file, giving each file a tight
   hyper-rectangle of clustered-column values (asserted on footer stats in
   tests/test_plans.py::test_zorder_lake_narrows_all_dimensions).

At 100 TB: the quantile fetch reads a sample (approxQuantile is a
single-pass Greenwald-Khanna per column), the only corpus-sized movement is
the one range exchange every clustered write needs anyway, and pruning
effectiveness per dimension degrades gracefully as ~(files)^(1/ndims) —
documented in SCALE.md alongside the other layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantile_buckets(
    df: DataFrame, col: str, bits: int, rel_err: float = 0.001
) -> list[float]:
    """Interior quantile boundaries (2^bits − 1 values) for rank
    quantization; single Greenwald-Khanna pass, driver gets a tiny list."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    return df.stat.approxQuantile(col, probs, rel_err)


def _bucket_expr(col: Column, boundaries: list[float]) -> Column:
    """#{boundaries ≤ value} via a codegen fold over the literal boundary
    array — order-preserving, null-safe (nulls land in bucket 0, sorting
    first like NULLS FIRST)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = col.cast("double")
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
    )


def _linear_bucket_expr(col: Column, mn: float, mx: float, bits: int) -> Column:
    n = 1 << bits
    v = col.cast("double")
    span = (mx - mn) or 1.0
    raw = F.floor((v - F.lit(mn)) / F.lit(span) * n).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def _interleave_bits(buckets: list[Column], bits_per_dim: int) -> Column:
    """Morton code: bit b of dimension i lands at position b*ndims + i —
    a flat OR of shift/mask terms, entirely inside whole-stage codegen."""
    ndims = len(buckets)
    z = F.lit(0).cast("long")
    for i, bk in enumerate(buckets):
        b64 = bk.cast("long")
        for b in range(bits_per_dim):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b64, b).bitwiseAND(F.lit(1)), b * ndims + i)
            )
    return z


def zorder_col(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 8,
    quantizer: str = "quantile",
) -> Column:
    """The Morton key for ``cols`` as a codegen column expression.

    Numeric and timestamp columns both work: timestamps quantize via their
    epoch value (order-preserving cast).
    """
    prepared = df
    casts = {}
    for c in cols:
        dt = dict(df.dtypes)[c]
        casts[c] = (
            F.unix_micros(F.col(c)).cast("double")
            if dt.startswith("timestamp")
            else F.col(c).cast("double")
        )
        prepared = prepared.withColumn(f"__z_{c}", casts[c])

    buckets = []
    if quantizer == "linear":
        aggs = prepared.agg(
            *[F.min(f"__z_{c}").alias(f"mn_{c}") for c in cols],
            *[F.max(f"__z_{c}").alias(f"mx_{c}") for c in cols],
        ).head()
        for c in cols:
            buckets.append(
                _linear_bucket_expr(
                    casts[c], aggs[f"mn_{c}"], aggs[f"mx_{c}"], bits_per_dim
                )
            )
    else:
        for c in cols:
            bounds = _quantile_buckets(prepared, f"__z_{c}", bits_per_dim)
            buckets.append(_bucket_expr(casts[c], bounds))
    return _interleave_bits(buckets, bits_per_dim)


def write_zorder_lake(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_dim: int = 8,
    quantizer: str = "quantile",
    num_files: int | None = None,
) -> None:
    """Cluster ``df`` along the Z-curve of ``cols`` and write parquet whose
    per-file footer stats are narrow in EVERY clustered dimension."""
    z = zorder_col(df, cols, bits_per_dim, quantizer).alias("__z")
    clustered = df.select("*", z)
    parts = num_files or clustered.sparkSession.sparkContext.defaultParallelism
    (
        clustered.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_fractions(path: str, cols: list[str]) -> dict[str, float]:
    """Mean per-file (max−min)/(global max−global min) from parquet footer
    statistics — the pruning-effectiveness metric the layout optimizes.
    1.0 means every file spans the whole domain (no pruning possible);
    a Z-ordered layout pushes every clustered dimension well below that."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    frags = list(ds.dataset(path, format="parquet").get_fragments())
    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for frag in frags:
        md = pq.ParquetFile(frag.path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or st.min is None:  # empty row group / no stats
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                spans[c].append((_as_float(lo), _as_float(hi)))
    out = {}
    for c, pairs in spans.items():
        glo = min(p[0] for p in pairs)
        ghi = max(p[1] for p in pairs)
        width = (ghi - glo) or 1.0
        out[c] = sum(hi - lo for lo, hi in pairs) / len(pairs) / width
    return out


def _as_float(v) -> float:
    import datetime as dt

    if isinstance(v, dt.datetime):
        return v.timestamp()
    return float(v)
