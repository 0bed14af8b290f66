"""Column-cleaning wranglers: winsorization and group-wise imputation —
the classic whole-DataFrame transformers of the reference's wrangler
family, applied to numeric hygiene.

Both operators compute their statistics with ONE grouped aggregation
(exact ``percentile`` / ``avg`` / ``mode``), broadcast the tiny
per-group stats table back, and apply the edit as a scan-side
projection — the fit/apply split every sklearn-style transformer has,
expressed as two Spark stages with a broadcast join between them.
Cutoffs and imputed values are rounded to 6 dp so reruns and engines
agree (the same discipline as the percentile quality gate).
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def _nullsafe_left_broadcast(
    df: DataFrame, stats: DataFrame, groups: Sequence[str]
) -> DataFrame:
    """Left-join per-group stats with null-safe key equality so rows
    whose group key is NULL receive the NULL group's statistic — a
    plain name-list equi-join silently passes them through
    untransformed. Stats keys are renamed ``_g_<col>`` so the original
    columns stay unambiguous; callers' final ``select(df.columns)``
    drops them."""
    renamed = stats
    for g in groups:
        renamed = renamed.withColumnRenamed(g, f"_g_{g}")
    cond = None
    for g in groups:
        c = df[g].eqNullSafe(renamed[f"_g_{g}"])
        cond = c if cond is None else cond & c
    return df.join(F.broadcast(renamed), cond, "left")


def _nullsafe_outer_merge(
    a: DataFrame, b: DataFrame, groups: Sequence[str]
) -> DataFrame:
    """Full-outer merge of two per-group stats frames on null-safe key
    equality, coalescing the key columns — so the NULL group carries
    one combined row instead of two disjoint ones."""
    rb = b
    for g in groups:
        rb = rb.withColumnRenamed(g, f"_r_{g}")
    cond = None
    for g in groups:
        c = a[g].eqNullSafe(rb[f"_r_{g}"])
        cond = c if cond is None else cond & c
    joined = a.join(rb, cond, "full")
    sel = (
        [F.coalesce(a[g], rb[f"_r_{g}"]).alias(g) for g in groups]
        + [a[c] for c in a.columns if c not in groups]
        + [rb[c] for c in rb.columns if not c.startswith("_r_")]
    )
    return joined.select(*sel)


def winsorize(
    columns: Union[str, Sequence[str]],
    lower: float = 0.05,
    upper: float = 0.95,
    group_by: Union[str, Sequence[str], None] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Clip each column to its [lower, upper] exact percentile band,
    optionally per group. NULLs pass through unclipped; output schema =
    input schema (clipped columns become double)."""
    cols = list(ensure_iterable(columns))
    if not cols:
        raise ValueError("winsorize requires at least one column")
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower},{upper}")
    groups = list(ensure_iterable(group_by)) if group_by else []

    def _transform(df: DataFrame) -> DataFrame:
        aggs = []
        for c in cols:
            aggs.append(
                F.round(
                    F.expr(f"percentile(CAST({c} AS DOUBLE), {lower}D)"), 6
                ).alias(f"_lo_{c}")
            )
            aggs.append(
                F.round(
                    F.expr(f"percentile(CAST({c} AS DOUBLE), {upper}D)"), 6
                ).alias(f"_hi_{c}")
            )
        if groups:
            stats = df.groupBy(*groups).agg(*aggs)
            joined = _nullsafe_left_broadcast(df, stats, groups)
        else:
            stats = df.agg(*aggs)
            joined = df.crossJoin(F.broadcast(stats))
        out_cols = []
        for name in df.columns:
            if name in cols:
                v = F.col(name).cast("double")
                clipped = F.least(
                    F.greatest(v, F.col(f"_lo_{name}")),
                    F.col(f"_hi_{name}"),
                )
                out_cols.append(
                    F.when(v.isNull(), None).otherwise(clipped).alias(name)
                )
            else:
                out_cols.append(F.col(name))
        return joined.select(*out_cols)

    _transform.__name__ = "winsorize"
    return _transform


def impute(
    columns: Union[str, Sequence[str]],
    strategy: str = "median",
    group_by: Union[str, Sequence[str], None] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Fill NULLs in numeric columns with the group (or global)
    ``median`` / ``mean`` / ``mode``. Groups whose statistic is NULL
    (all-NULL group) stay NULL. Ties in ``mode`` break on the smaller
    value (deterministic)."""
    cols = list(ensure_iterable(columns))
    if not cols:
        raise ValueError("impute requires at least one column")
    if strategy not in ("median", "mean", "mode"):
        raise ValueError(f"unknown strategy {strategy!r}")
    groups = list(ensure_iterable(group_by)) if group_by else []

    def _stat(c: str):
        if strategy == "median":
            return F.round(
                F.expr(f"percentile(CAST({c} AS DOUBLE), 0.5D)"), 6
            )
        return F.round(F.avg(F.col(c).cast("double")), 6)  # mean

    def _transform(df: DataFrame) -> DataFrame:
        if strategy == "mode":
            # mode needs its own value-level aggregation per column
            fills = None
            for c in cols:
                counts = (
                    df.filter(F.col(c).isNotNull())
                    .groupBy(*groups, F.col(c).cast("double").alias("_v"))
                    .agg(F.count(F.lit(1)).alias("_n"))
                )
                best = counts.groupBy(*groups).agg(
                    F.expr(
                        "max_by(_v, named_struct('n', _n, 'v', -_v))"
                    ).alias(f"_fill_{c}")
                )
                fills = (
                    best
                    if fills is None
                    else (
                        _nullsafe_outer_merge(fills, best, groups)
                        if groups
                        else fills.crossJoin(best)
                    )
                )
        else:
            aggs = [_stat(c).alias(f"_fill_{c}") for c in cols]
            fills = (
                df.groupBy(*groups).agg(*aggs) if groups else df.agg(*aggs)
            )
        joined = (
            _nullsafe_left_broadcast(df, fills, groups)
            if groups
            else df.crossJoin(F.broadcast(fills))
        )
        out_cols = []
        for name in df.columns:
            if name in cols:
                out_cols.append(
                    F.coalesce(
                        F.col(name).cast("double"),
                        F.col(f"_fill_{name}"),
                    ).alias(name)
                )
            else:
                out_cols.append(F.col(name))
        return joined.select(*out_cols)

    _transform.__name__ = "impute"
    return _transform


def scale(
    columns: Union[str, Sequence[str]],
    method: str = "zscore",
    group_by: Union[str, Sequence[str], None] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Rescale numeric columns per group (or globally):

    - ``zscore``: (x - mean) / stddev_samp — constant columns (stddev 0
      or NULL) scale to 0.0;
    - ``minmax``: (x - min) / (max - min) — constant columns scale to
      0.0.

    NULLs stay NULL. Same fit/apply shape as :func:`winsorize`; stats
    round to 6 dp for cross-engine/rerun reproducibility.
    """
    cols = list(ensure_iterable(columns))
    if not cols:
        raise ValueError("scale requires at least one column")
    if method not in ("zscore", "minmax"):
        raise ValueError(f"unknown method {method!r}")
    groups = list(ensure_iterable(group_by)) if group_by else []

    def _transform(df: DataFrame) -> DataFrame:
        aggs = []
        for c in cols:
            v = F.col(c).cast("double")
            if method == "zscore":
                aggs.append(F.round(F.avg(v), 6).alias(f"_a_{c}"))
                aggs.append(F.round(F.stddev_samp(v), 6).alias(f"_b_{c}"))
            else:
                aggs.append(F.round(F.min(v), 6).alias(f"_a_{c}"))
                aggs.append(
                    F.round(F.max(v) - F.min(v), 6).alias(f"_b_{c}")
                )
        if groups:
            stats = df.groupBy(*groups).agg(*aggs)
            joined = _nullsafe_left_broadcast(df, stats, groups)
        else:
            joined = df.crossJoin(F.broadcast(df.agg(*aggs)))
        out_cols = []
        for name in df.columns:
            if name in cols:
                v = F.col(name).cast("double")
                denom = F.col(f"_b_{name}")
                scaled = F.when(
                    denom.isNull() | (denom == 0.0), F.lit(0.0)
                ).otherwise((v - F.col(f"_a_{name}")) / denom)
                out_cols.append(
                    F.when(v.isNull(), None)
                    .otherwise(F.round(scaled, 6))
                    .alias(name)
                )
            else:
                out_cols.append(F.col(name))
        return joined.select(*out_cols)

    _transform.__name__ = "scale"
    return _transform


def frequency_encode(
    columns: Union[str, Sequence[str]],
    relative: bool = True,
    suffix: str = "_freq",
) -> Callable[[DataFrame], DataFrame]:
    """Append, for each categorical column, its value frequency —
    ``count(value) / count(*)`` when ``relative`` (rounded to 6 dp),
    else the raw count. NULL categories encode as NULL. The frequency
    table per column is tiny (one row per distinct value) and
    broadcasts; the encode is a map-side join — the classic
    high-cardinality-safe categorical encoding for tree/linear models.
    """
    cols = list(ensure_iterable(columns))
    if not cols:
        raise ValueError("frequency_encode requires at least one column")

    def _transform(df: DataFrame) -> DataFrame:
        out = df
        # total rides the plan as a broadcast one-row aggregate folded
        # into each (tiny) frequency table — no driver-side count()
        # action at transform time (plan construction stays declarative)
        total_df = (
            df.agg(F.count(F.lit(1)).alias("_total")) if relative else None
        )
        for c in cols:
            freq = (
                df.filter(F.col(c).isNotNull())
                .groupBy(F.col(c).alias(f"_k_{c}"))
                .agg(F.count(F.lit(1)).alias("_n"))
            )
            if relative:
                freq = freq.crossJoin(F.broadcast(total_df))
                enc = F.round(
                    F.col("_n") / F.col("_total").cast("double"), 6
                )
            else:
                enc = F.col("_n").cast("long")
            freq = freq.select(f"_k_{c}", enc.alias(c + suffix))
            out = out.join(
                F.broadcast(freq),
                out[c] == freq[f"_k_{c}"],
                "left",
            ).drop(f"_k_{c}")
        return out

    _transform.__name__ = "frequency_encode"
    return _transform
