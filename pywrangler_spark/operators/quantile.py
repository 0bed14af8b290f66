"""Exact per-group quantiles without per-group value materialization.

Spark's exact ``percentile()`` collects EVERY raw value of a group into
one reducer's memory (ObjectHashAggregate buffer) — with a handful of
groups that is a full-table shuffle into a handful of tasks, measured
at 326 MB into 3 reducers at sf10 for ``quantiles_prices`` and
unbounded at 100 TB. This operator computes the identical linearly
interpolated order statistic (``quantile_cont`` / ``percentile()``
semantics) from the WEIGHTED distribution of distinct values instead:

1. pre-aggregate to distinct ``(group, value) -> count`` pairs — a
   map-side-combinable hash aggregate, so the shuffle carries each
   distinct value once with its count, never the raw rows;
2. one window pass per group over the distinct values for running
   coverage (the sort is over distinct values, orders of magnitude
   smaller than the rows);
3. for each probability ``q``, the two covering order statistics at
   1-based ranks ``floor(p)+1`` and ``floor(p)+2`` with
   ``p = (n-1)*q`` are picked by a conditional aggregate and linearly
   interpolated — bit-identical to ``percentile()`` output (verified
   to the 4th decimal against DuckDB's ``quantile_cont``).

First built for ``approx_quantiles_prices``'s exact gate (f6f4693);
factored here so every exact-quantile query shares it. Reference
parity: the reference has no quantile operator — this is part of the
analytics extension surface (SURVEY.md §2 item 18).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def group_quantiles(
    value_columns: Union[str, Sequence[str]],
    probabilities: Sequence[float],
    group_columns: Union[str, Sequence[str]],
    output_columns: Optional[Sequence[Sequence[str]]] = None,
    round_digits: Optional[int] = None,
) -> Callable[[DataFrame], DataFrame]:
    """One row per group with the exact interpolated quantile of each
    value column at each probability.

    ``output_columns``: per value column, one output name per
    probability; defaults to ``{value}_p{int(q*100)}``.

    ``df.transform(group_quantiles("price", [0.5, 0.9], "flag"))``
    """
    values = list(ensure_iterable(value_columns))
    groups = list(ensure_iterable(group_columns))
    probs = list(probabilities)
    if probs and isinstance(probs[0], (list, tuple)):
        per_value_probs = [list(p) for p in probs]
    else:
        per_value_probs = [probs] * len(values)
    if not values or not all(per_value_probs):
        raise ValueError("group_quantiles requires values + probabilities")
    if len(per_value_probs) != len(values):
        raise ValueError("per-value probabilities must match value columns")
    if not all(0.0 <= q <= 1.0 for ps in per_value_probs for q in ps):
        raise ValueError("probabilities must be within [0, 1]")
    if not groups:
        raise ValueError(
            "group_quantiles requires group columns (a global quantile "
            "serializes the distinct-value sort onto one task; group by "
            "a constant literal explicitly for small data)"
        )
    if output_columns is None:
        output_columns = [
            [f"{v}_p{int(round(q * 100))}" for q in ps]
            for v, ps in zip(values, per_value_probs)
        ]
    if len(output_columns) != len(values) or any(
        len(names) != len(ps)
        for names, ps in zip(output_columns, per_value_probs)
    ):
        raise ValueError("output_columns must be per-value, per-probability")

    def _one_value(
        df: DataFrame, value: str, probs: Sequence[float], names: Sequence[str]
    ) -> DataFrame:
        pairs = (
            df.select(*groups, value)
            .where(F.col(value).isNotNull())
            .groupBy(*groups, value)
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        word = (
            Window.partitionBy(*groups)
            .orderBy(value)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wall = Window.partitionBy(*groups)
        x = pairs.select(
            *groups,
            F.col(value).cast("double").alias("_v"),
            "_c",
            F.sum("_c").over(word).alias("_cum"),
            F.sum("_c").over(wall).alias("_n"),
        )

        def covers(i):
            return (F.col("_cum") >= i) & (F.col("_cum") - F.col("_c") < i)

        aggs = [F.min("_n").alias("_n2")]
        for j, q in enumerate(probs):
            p = (F.col("_n") - 1) * F.lit(float(q))
            i0, i1 = F.floor(p) + 1, F.floor(p) + 2
            aggs.append(F.max(F.when(covers(i0), F.col("_v"))).alias(f"_v0_{j}"))
            aggs.append(F.max(F.when(covers(i1), F.col("_v"))).alias(f"_v1_{j}"))
        picked = x.groupBy(*groups).agg(*aggs)

        cols = list(groups)
        for j, (q, name) in enumerate(zip(probs, names)):
            p2 = (F.col("_n2") - 1) * F.lit(float(q))
            fr = p2 - F.floor(p2)
            v0, v1 = F.col(f"_v0_{j}"), F.col(f"_v1_{j}")
            out = v0 + fr * (F.coalesce(v1, v0) - v0)
            if round_digits is not None:
                out = F.round(out, round_digits)
            cols.append(out.alias(name))
        return picked.select(*cols)

    def _transform(df: DataFrame) -> DataFrame:
        # percentile() keeps a group whose value column is entirely NULL
        # (its quantile is NULL); the isNotNull pre-filter in _one_value
        # drops such groups, and with multiple value columns an inner
        # join would drop a group from ALL outputs if it is missing for
        # any one column. Left-join every per-value result onto the
        # distinct-group spine so absent groups surface as NULL — the
        # spine is a map-side-combinable hash aggregate over the group
        # keys only, and each join is group-key to <=1 row per group.
        # Joins are null-safe (<=>): groupBy treats NULL as a group, and
        # EqualNullSafe is still an equi-join key for Spark's hash joins.
        result = df.select(*groups).distinct()
        renamed = {g: f"__gq_rg{i}" for i, g in enumerate(groups)}
        for value, probs, names in zip(
            values, per_value_probs, output_columns
        ):
            right = _one_value(df, value, probs, names).withColumnsRenamed(
                renamed
            )
            cond = None
            for g in groups:
                c = F.col(g).eqNullSafe(F.col(renamed[g]))
                cond = c if cond is None else cond & c
            result = result.join(right, cond, "left").drop(*renamed.values())
        return result

    return _transform
