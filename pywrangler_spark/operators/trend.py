"""Per-group trend fitting — the grouped-UDF pattern done two ways.

``group_trend`` is JVM-native: Spark's built-in ``regr_slope`` /
``regr_intercept`` aggregates (partial + final, one shuffle carrying one
row per group, whole-stage codegen). This is the hot path and the
default — fitting y ~ x per key needs no Python.

``group_trend_pandas`` computes the same fit through
``applyInPandas`` — each group lands in one pandas DataFrame and numpy
does the regression. It exists as the TEMPLATE for per-group logic that
genuinely cannot be expressed as SQL aggregates (iterative solvers,
scipy optimizers, model scoring): swap the body, keep the shape. Tested
equal to the native path, which is exactly the point — prefer the
aggregate when one exists.

Scale note for the pandas path: one GROUP must fit in one executor's
memory (that is ``applyInPandas``'s contract), and a hot group is a hot
task — pre-aggregate or sample inside groups first if keys are skewed.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.temporal import epoch_micros
from pywrangler_spark.util import ensure_iterable


def group_trend(
    x_column: str,
    y_column: str,
    groupby_columns: Union[str, Sequence[str]],
    round_digits: Union[int, Sequence[int]] = 6,
) -> Callable[[DataFrame], DataFrame]:
    """OLS slope/intercept of ``y ~ x`` per group via JVM aggregates.

    Output: groups + (slope, intercept, n). Timestamps for ``x`` are
    converted to epoch seconds. Slope/intercept are rounded so the value
    is reproducible across engines (the underlying moment sums are
    float; rounding absorbs association noise).
    """
    groups = list(ensure_iterable(groupby_columns))
    if not groups:
        raise ValueError("group_trend requires groupby_columns")
    if isinstance(round_digits, int):
        slope_digits = intercept_digits = round_digits
    else:
        slope_digits, intercept_digits = round_digits

    def _transform(df: DataFrame) -> DataFrame:
        x = F.col(x_column)
        if "timestamp" in df.schema[x_column].dataType.simpleString():
            x = epoch_micros(x) / 1_000_000.0  # NTZ-safe
        y = F.col(y_column).cast("double")
        return df.groupBy(*groups).agg(
            F.round(F.regr_slope(y, x), slope_digits).alias("slope"),
            F.round(F.regr_intercept(y, x), intercept_digits).alias(
                "intercept"
            ),
            F.count(F.lit(1)).alias("n"),
        )

    _transform.__name__ = "group_trend"
    return _transform


def group_trend_pandas(
    x_column: str,
    y_column: str,
    groupby_columns: Union[str, Sequence[str]],
    round_digits: int = 6,
) -> Callable[[DataFrame], DataFrame]:
    """Same fit via ``applyInPandas`` — the grouped-UDF template."""
    import numpy as np
    import pandas as pd

    groups = list(ensure_iterable(groupby_columns))
    if not groups:
        raise ValueError("group_trend_pandas requires groupby_columns")

    def _transform(df: DataFrame) -> DataFrame:
        x = F.col(x_column)
        if "timestamp" in df.schema[x_column].dataType.simpleString():
            x = epoch_micros(x) / 1_000_000.0  # NTZ-safe
        prepared = df.select(
            *groups, x.alias("_x"), F.col(y_column).cast("double").alias("_y")
        )
        group_fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in prepared.schema
            if f.name in groups
        )
        schema = (
            f"{group_fields}, slope double, intercept double, n bigint"
        )

        def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
            xs, ys = pdf["_x"].to_numpy(), pdf["_y"].to_numpy()
            n = len(pdf)
            keys: List = [pdf[g].iloc[0] for g in groups]
            if n < 2 or np.ptp(xs) == 0.0:
                slope = intercept = None
            else:
                # same moment formulation as SQL REGR_*: covariance over
                # variance, means-based — not lstsq, so the two paths
                # agree to rounding
                mx, my = xs.mean(), ys.mean()
                var = ((xs - mx) ** 2).mean()
                cov = ((xs - mx) * (ys - my)).mean()
                slope = round(cov / var, round_digits)
                intercept = round(my - (cov / var) * mx, round_digits)
            return pd.DataFrame(
                [[*keys, slope, intercept, n]],
                columns=[*groups, "slope", "intercept", "n"],
            )

        return prepared.groupBy(*groups).applyInPandas(_fit, schema)

    _transform.__name__ = "group_trend_pandas"
    return _transform
