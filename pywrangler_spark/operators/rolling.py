"""Trailing time-window aggregation in linear time — the scale-safe
replacement for bounded RANGE window frames.

``SUM(x) OVER (PARTITION BY k ORDER BY ts RANGE BETWEEN <T> PRECEDING
AND CURRENT ROW)`` is the natural spelling, but Spark's
SlidingWindowFunctionFrame re-aggregates the frame buffer as bounds
move (aggregates have no inverse), so per-partition cost is
O(rows x frame-density): measured 35.7x wall for 10x data on the
events table at the sf1->sf10 decade — quadratic in per-key density,
a scale-killer at 100 TB.

This operator computes the same answer as two prefix scans:

    trailing_sum(t) = prefix(<= t) - prefix(< t - T)

1. ``prefix(<= t)`` per row: a GROWING range frame
   (unboundedPreceding -> currentRow) — Spark's
   UnboundedPrecedingWindowFunctionFrame, a single O(n) pass that
   handles timestamp peers correctly (peers share the prefix).
2. ``prefix(< t - T)`` per row: an as-of lookup expressed with the
   in-repo union+window pattern (see ``operators.asof``): data rows
   ``(ts, prefix)`` and query rows ``(ts - T, payload)`` are unioned,
   sorted by ``(time, kind)`` with query rows FIRST at equal time
   (strict ``<`` — events exactly at ``t - T`` stay inside the
   trailing window, matching RANGE's inclusive lower bound), and
   ``last(prefix, ignorenulls=True)`` over a RUNNING rows frame
   carries the most recent data prefix to each query row — again one
   O(n) sorted pass, never a sliding buffer.

Cost: two key-wise exchanges over ~2n rows (the prefix window, then
the union window — the union discards the child partitioning) and two
linear sorts. Decade ratio is ~data growth by construction; the
sliding-frame version it replaces was ~density^2 per key.

Exactness: prefix sums subtract EXACTLY when the summed expression is
a decimal (Spark decimal arithmetic is exact, so
``prefix_a - prefix_b == direct frame sum`` bit-for-bit); pass e.g.
``F.col("value").cast("decimal(27,4)")`` and cast the output back to
double to match a SQL oracle. Float sums would differ by
associativity — prefer decimals here. NULL semantics match SQL: a
frame whose values are all NULL yields NULL (tracked with a per-agg
non-null prefix count), and ``count`` never returns NULL.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.functions.temporal import epoch_micros
from pywrangler_spark.util import ensure_iterable

_TIME = "__roll_time"
_KIND = "__roll_kind"


def trailing_window_agg(
    ts_column: str,
    trailing_seconds: Union[int, float],
    partition_by: Union[str, Sequence[str]],
    sums: Optional[Mapping[str, Column]] = None,
    count_alias: Optional[str] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Append trailing-window aggregates over ``[ts - T, ts]`` (both
    ends inclusive, identical to ``RANGE BETWEEN T PRECEDING AND
    CURRENT ROW``) to every input row.

    Parameters
    ----------
    ts_column : timestamp column ordering the window (micros
        resolution).
    trailing_seconds : window length T in seconds.
    partition_by : key column(s) — the PARTITION BY.
    sums : mapping ``output_name -> column expression`` to SUM over
        the trailing window. Use decimal-cast expressions for exact
        parity with a direct frame sum (see module docstring).
    count_alias : if given, also emit ``COUNT(*)`` over the trailing
        window under this name.

    ``df.transform(trailing_window_agg("ts", 7*86400, "user_id",
    sums={"value_7d": F.col("value").cast("decimal(27,4)")},
    count_alias="n_7d"))``
    """
    sums = dict(sums or {})
    if not sums and count_alias is None:
        raise ValueError("need at least one of sums / count_alias")
    keys = list(ensure_iterable(partition_by))
    if not keys:
        raise ValueError("partition_by must name at least one column")
    trailing = int(round(float(trailing_seconds) * 1_000_000))
    if trailing < 0:
        raise ValueError("trailing_seconds must be >= 0")

    def _transform(df: DataFrame) -> DataFrame:
        payload = df.columns
        for out in list(sums) + ([count_alias] if count_alias else []):
            if out in payload:
                raise ValueError(f"output column {out!r} already exists")

        wpref = (
            Window.partitionBy(*keys)
            .orderBy(_TIME)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pref_cols = []
        for i, expr in enumerate(sums.values()):
            pref_cols.append(F.sum(expr).over(wpref).alias(f"_ps{i}"))
            pref_cols.append(
                F.count(expr).over(wpref).alias(f"_pn{i}")
            )
        if count_alias:
            pref_cols.append(
                F.count(F.lit(1)).over(wpref).alias("_pc")
            )
        prefixed = df.withColumn(_TIME, epoch_micros(ts_column)).select(
            "*", *pref_cols
        )

        schema = {f.name: f.dataType for f in prefixed.schema.fields}
        pref_names = [
            f"_p{kind}{i}" for i in range(len(sums)) for kind in "sn"
        ] + (["_pc"] if count_alias else [])
        non_key = [c for c in payload if c not in keys]

        def _null(name):
            return F.lit(None).cast(schema[name]).alias(name)

        # data rows: kind=1 sorts AFTER a query row at the same time,
        # so the as-of fill sees strictly-earlier data only
        data = prefixed.select(
            *keys,
            F.col(_TIME),
            F.lit(1).alias(_KIND),
            *[_null(c) for c in non_key],
            *[F.col(p).alias(f"_d{p}") for p in pref_names],
            *[_null(p) for p in pref_names],
        )
        query = prefixed.select(
            *keys,
            (F.col(_TIME) - F.lit(trailing)).alias(_TIME),
            F.lit(0).alias(_KIND),
            *non_key,
            *[F.lit(None).cast(schema[p]).alias(f"_d{p}")
              for p in pref_names],
            *pref_names,
        )
        wfill = (
            Window.partitionBy(*keys)
            .orderBy(_TIME, _KIND)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = data.unionByName(query).select(
            "*",
            *[
                F.last(f"_d{p}", ignorenulls=True)
                .over(wfill)
                .alias(f"_b{p}")
                for p in pref_names
            ],
        )

        out_cols = []
        for i, out in enumerate(sums):
            in_frame = F.col(f"_pn{i}") - F.coalesce(
                F.col(f"_b_pn{i}"), F.lit(0)
            )
            diff = F.col(f"_ps{i}") - F.coalesce(
                F.col(f"_b_ps{i}"), F.lit(0).cast(schema[f"_ps{i}"])
            )
            out_cols.append(
                F.when(in_frame > 0, diff).alias(out)
            )
        if count_alias:
            out_cols.append(
                (
                    F.col("_pc")
                    - F.coalesce(F.col("_b_pc"), F.lit(0))
                ).alias(count_alias)
            )
        return filled.filter(F.col(_KIND) == 0).select(
            *payload, *out_cols
        )

    return _transform
