"""Z-order (Morton) data layout — multi-dimensional clustering so
parquet min/max row-group stats prune on EVERY layout column, not just
the leading sort key.

A linear sort on (a, b) prunes scans filtering on ``a`` but does nothing
for ``b``; interleaving the bit-planes of per-column rank buckets gives
a space-filling curve where rows close in ANY dimension land close in
the file order. At 100 TB this is the difference between reading the
whole table and reading the few row groups whose [min, max] envelope
intersects the predicate — the same technique Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``, built here from public DataFrame primitives:

1. **fit**: per column, rank-bucket boundaries from one exact
   ``percentile`` aggregation (a deliberate action — layout jobs are
   write jobs; rank buckets, not raw values, make the curve robust to
   skewed/heavy-tailed distributions);
2. **map**: bucket index per column via a broadcast boundary array
   (codegen'd predicate sums, no UDF), then bit interleave into the
   Morton code;
3. **layout**: ``repartitionByRange`` on the code + sort within
   partitions, so both file-level and row-group-level stats tighten.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def _bucket_expr(col: str, bounds: List[float]) -> Column:
    """0-based rank bucket of ``col`` against sorted boundaries: the
    number of boundaries <= value. NULLs land in bucket 0 (they sort
    first and carry no stats value either way)."""
    terms = " + ".join(
        f"(CASE WHEN {col} >= {b!r}D THEN 1 ELSE 0 END)" for b in bounds
    )
    return F.coalesce(
        F.expr(f"CAST(({terms}) AS BIGINT)"), F.lit(0)
    )


def _interleave(bucket_cols: Sequence[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position i*m + j."""
    m = len(bucket_cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        for i in range(bits):
            z = z + (
                F.shiftright(c, i).bitwiseAND(F.lit(1))
                * F.lit(1 << (i * m + j))
            )
    return z


def zorder_code(
    columns: Union[str, Sequence[str]],
    bits: int = 8,
    boundaries: dict | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Append ``_z``: the Morton interleave of each column's
    ``2^bits``-quantile rank bucket.

    ``boundaries`` (``{column: [floats]}``) makes the transform purely
    declarative — compute them once with :func:`fit_zorder_boundaries`
    and reuse across incremental layout jobs so file runs stay
    comparable. Without it, a fit runs at build time (legitimate for a
    one-shot layout job, which is an action anyway).
    """
    cols = list(ensure_iterable(columns))
    if not cols:
        raise ValueError("zorder_code requires at least one column")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    if len(cols) * bits > 62:
        raise ValueError("columns * bits must fit in a 63-bit code")

    def _transform(df: DataFrame) -> DataFrame:
        bnds = (
            boundaries
            if boundaries is not None
            else fit_zorder_boundaries(df, cols, bits)
        )
        buckets = [
            _bucket_expr(c, bnds[c]) for c in cols
        ]
        return df.withColumn("_z", _interleave(buckets, bits))

    _transform.__name__ = "zorder_code"
    return _transform


def fit_zorder_boundaries(
    df: DataFrame, columns: Sequence[str], bits: int = 8
) -> dict:
    """``2^bits - 1`` interior quantile boundaries per column from ONE
    exact ``percentile`` aggregation pass (rounded to 6 dp so refits on
    the same data reproduce bit-identically across engines)."""
    n = (1 << bits) - 1
    probs = [i / (n + 1) for i in range(1, n + 1)]
    prob_sql = "array(" + ",".join(f"{p!r}D" for p in probs) + ")"
    aggs = [
        F.expr(
            f"percentile(CAST({c} AS DOUBLE), {prob_sql})"
        ).alias(c)
        for c in columns
    ]
    row = df.agg(*aggs).first()
    return {
        c: [round(float(v), 6) for v in (row[c] or [])] for c in columns
    }


def zorder_layout(
    columns: Union[str, Sequence[str]],
    bits: int = 8,
    num_files: int | None = None,
    boundaries: dict | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Re-layout the DataFrame along the Z-order curve of ``columns``:
    range-partition on the Morton code (one skew-free exchange —
    ``repartitionByRange`` samples the code distribution) and sort
    within partitions, so a subsequent parquet write produces files AND
    row groups whose per-column min/max envelopes are tight on every
    layout column. Drops the internal ``_z``.
    """

    def _transform(df: DataFrame) -> DataFrame:
        coded = df.transform(
            zorder_code(columns, bits=bits, boundaries=boundaries)
        )
        parts = (
            [F.col("_z")]
            if num_files is None
            else [num_files, F.col("_z")]
        )
        return (
            coded.repartitionByRange(*parts)
            .sortWithinPartitions("_z")
            .drop("_z")
        )

    _transform.__name__ = "zorder_layout"
    return _transform
