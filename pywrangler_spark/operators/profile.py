"""One-pass column profiling (data-quality stats).

``column_profile`` computes per-column null counts, distinct counts and
min/max for many columns in a SINGLE aggregation over ONE scan, then
unpivots the one-row result to a (column_name, stats...) long table with
``stack`` — the wide->long step runs on ONE row, so it is free.

Scale notes (100 TB):
- ``exact=True`` uses ``count(DISTINCT col)`` per column; Catalyst's
  distinct rewrite expands the scan rows by the number of distinct
  aggregates (one Expand projection per column). Fine for a handful of
  columns; for wide profiling use ``exact=False`` —
  ``approx_count_distinct`` (HyperLogLog++) keeps the plan a plain
  two-phase agg with NO row expansion regardless of column count.
- The aggregate output is one row; nothing but partial-agg buffers ever
  reaches the exchange. This is strictly cheaper than per-column
  ``df.select(...).distinct().count()`` loops, which rescan the table
  once per column.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def column_profile(
    columns: Union[str, Sequence[str]],
    exact: bool = True,
    rsd: float = 0.05,
) -> Callable[[DataFrame], DataFrame]:
    """Profile numeric/comparable columns: one row per column with
    ``n_rows, n_nonnull, n_distinct, min_value, max_value`` (min/max as
    DOUBLE). One scan, one aggregation, wide->long on a single row.

    ``df.transform(column_profile(["l_quantity", "l_extendedprice"]))``
    """
    cols = list(ensure_iterable(columns))
    if not cols:
        raise ValueError("column_profile requires at least one column")

    def _distinct(c: str):
        if exact:
            return F.countDistinct(F.col(c))
        return F.approx_count_distinct(F.col(c), rsd)

    def _transform(df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs += [
                F.count(F.col(c)).alias(f"_nn_{c}"),
                _distinct(c).alias(f"_nd_{c}"),
                F.min(F.col(c)).cast("double").alias(f"_mn_{c}"),
                F.max(F.col(c)).cast("double").alias(f"_mx_{c}"),
            ]
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
        )
        stacked = wide.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS "
                "(column_name, n_nonnull, n_distinct, min_value, max_value)"
            ),
        )
        return stacked.select(
            "column_name", "n_rows", "n_nonnull", "n_distinct",
            "min_value", "max_value",
        )

    return _transform


def histogram(
    column: str,
    lo: float,
    hi: float,
    nbins: int,
) -> Callable[[DataFrame], DataFrame]:
    """Fixed-width histogram of a numeric column: rows inside [lo, hi]
    land in ``floor((x - lo) / width)`` (top edge clamped into the last
    bin); rows outside the range are dropped. Pure groupBy-count — the
    shuffle carries ``nbins`` partial rows per task, nothing else. The
    bin arithmetic is plain IEEE double ops, so any engine reproduces
    the exact same binning.

    Emits ``bin`` (0-based BIGINT), ``bin_lo``/``bin_hi`` (bin edges,
    DOUBLE) and ``n_rows``.
    """
    if nbins <= 0 or not lo < hi:
        raise ValueError("histogram requires nbins > 0 and lo < hi")
    width = (hi - lo) / nbins

    def _transform(df: DataFrame) -> DataFrame:
        x = F.col(column).cast("double")
        b = F.least(
            F.floor((x - F.lit(float(lo))) / F.lit(width)),
            F.lit(nbins - 1),
        ).cast("bigint")
        return (
            df.where((x >= lo) & (x <= hi))
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(
                "bin",
                (F.lit(float(lo)) + F.col("bin") * F.lit(width))
                .alias("bin_lo"),
                (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width))
                .alias("bin_hi"),
                "n_rows",
            )
        )

    return _transform


def profile_drift(
    reference: DataFrame,
    columns: Union[str, Sequence[str]],
    exact: bool = True,
) -> Callable[[DataFrame], DataFrame]:
    """Per-column drift between the input frame (current snapshot) and a
    ``reference`` frame: null-rate delta, distinct-count ratio and
    min/max range shifts — the ingest-monitoring check a production
    corpus pipeline runs on every new partition before accepting it.

    Both sides run :func:`column_profile` (one scan + one single-row
    aggregation each); the comparison joins two tiny long tables, so the
    whole operator adds O(columns) rows of work beyond the two scans.
    Rates round to 6 dp for reproducibility.
    """

    def _transform(df: DataFrame) -> DataFrame:
        cur = df.transform(column_profile(columns, exact))
        ref = reference.transform(column_profile(columns, exact))
        c = cur.select(
            "column_name",
            F.col("n_rows").alias("_cn"),
            F.col("n_nonnull").alias("_cnn"),
            F.col("n_distinct").alias("_cnd"),
            F.col("min_value").alias("_cmn"),
            F.col("max_value").alias("_cmx"),
        )
        r = ref.select(
            "column_name",
            F.col("n_rows").alias("_rn"),
            F.col("n_nonnull").alias("_rnn"),
            F.col("n_distinct").alias("_rnd"),
            F.col("min_value").alias("_rmn"),
            F.col("max_value").alias("_rmx"),
        )
        null_rate = lambda nn, n: 1.0 - F.col(nn) / F.col(n)  # noqa: E731
        return c.join(r, "column_name").select(
            "column_name",
            F.round(
                null_rate("_cnn", "_cn") - null_rate("_rnn", "_rn"), 6
            ).alias("null_rate_delta"),
            F.round(
                F.col("_cnd") / F.nullif(F.col("_rnd"), F.lit(0)), 6
            ).alias("distinct_ratio"),
            F.round(F.col("_cmn") - F.col("_rmn"), 6).alias("min_shift"),
            F.round(F.col("_cmx") - F.col("_rmx"), 6).alias("max_shift"),
        )

    return _transform


def correlation_matrix(
    columns: Union[str, Sequence[str]],
) -> Callable[[DataFrame], DataFrame]:
    """Pairwise Pearson correlations for the given numeric columns in
    ONE aggregation pass (``corr`` is algebraic: Spark keeps a constant
    per-pair state through the partial/final agg, so the scan count
    stays 1 regardless of pair count). Output: one row per unordered
    pair ``(col_a, col_b, corr)`` with ``col_a < col_b``, rounded to
    6 dp. O(k²) aggregate buffers — fine for profiling-sized k."""
    cols = list(ensure_iterable(columns))
    if len(cols) < 2:
        raise ValueError("correlation_matrix requires >= 2 columns")

    def _transform(df: DataFrame) -> DataFrame:
        pairs = [
            (a, b)
            for i, a in enumerate(cols)
            for b in cols[i + 1:]
        ]
        aggs = [
            F.round(
                F.corr(
                    F.col(a).cast("double"), F.col(b).cast("double")
                ),
                6,
            ).alias(f"_c_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{a}', '{b}', _c_{i}" for i, (a, b) in enumerate(pairs)
        )
        return wide.select(
            F.expr(
                f"stack({len(pairs)}, {stack_args})"
                " AS (col_a, col_b, corr)"
            )
        )

    return _transform
