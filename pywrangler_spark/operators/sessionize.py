"""Gap-based sessionization — the time-window sibling of marker-based
interval identification.

A new session starts when the time since the previous event in the same
group exceeds ``gap``. Classic single-window formulation: boundary flag via
``lag``, running sum for the session id. One shuffle (by the group keys),
one sort, no UDFs; at scale the shuffle is bounded by group cardinality.

The batch analog of Spark's streaming ``session_window``; see
``pywrangler_spark.streaming`` for the incremental variant.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.functions.temporal import epoch_seconds
from pywrangler_spark.util import ensure_iterable


def sessionize_gap(
    ts_column: str,
    gap_seconds: float,
    groupby_columns: Union[str, Sequence[str]],
    target_column_name: str = "session_id",
) -> Callable[[DataFrame], DataFrame]:
    """Assign ``1..n`` session ids per group; sessions split on gaps larger
    than ``gap_seconds``. Use as ``df.transform(sessionize_gap(...))``."""
    groups = ensure_iterable(groupby_columns)
    if not groups:
        raise ValueError("sessionize_gap requires groupby_columns")

    def _transform(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*groups).orderBy(F.col(ts_column).asc())
        prev_ts = F.lag(ts_column, 1).over(w)
        # epoch_seconds, not cast("double"): NTZ-safe (see functions.temporal)
        gap = epoch_seconds(ts_column) - epoch_seconds(prev_ts)
        boundary = F.when(
            prev_ts.isNull() | (gap > F.lit(float(gap_seconds))), 1
        ).otherwise(0)
        s1 = df.select("*", boundary.cast("long").alias("_boundary"))
        sid = F.sum("_boundary").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return s1.select(*df.columns, sid.alias(target_column_name))

    _transform.__name__ = "sessionize_gap"
    return _transform


def session_stats(
    ts_column: str,
    gap_seconds: float,
    groupby_columns: Union[str, Sequence[str]],
    value_column: Optional[str] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Collapse sessions to one row each: start/end timestamps, event count,
    optional value sum. Shuffle-reuse: the groupBy keys extend the window
    partition keys, so AQE can often satisfy the aggregation from the same
    exchange."""
    groups = list(ensure_iterable(groupby_columns))

    def _transform(df: DataFrame) -> DataFrame:
        with_sid = df.transform(
            sessionize_gap(ts_column, gap_seconds, groups, "session_id")
        )
        aggs = [
            F.min(ts_column).alias("session_start"),
            F.max(ts_column).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        ]
        if value_column is not None:
            aggs.append(F.sum(value_column).alias("value_sum"))
        return with_sid.groupBy(*groups, "session_id").agg(*aggs)

    _transform.__name__ = "session_stats"
    return _transform


def session_features(
    ts_column: str,
    gap_seconds: float,
    groupby_columns: Union[str, Sequence[str]],
    order_tiebreak: Union[str, Sequence[str], None] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Row-level session features for ML feature prep: appends
    ``session_id``, ``event_idx`` (1-based position within the
    session) and ``secs_into_session`` (event time minus session
    start).

    All three come from windows over the SAME partition/order spec as
    the sessionization itself, so Catalyst fuses them into the single
    sessionize exchange + sort — feature extraction costs no extra
    shuffle (plan-asserted in tests). ``order_tiebreak`` columns make
    ``event_idx`` total when timestamps tie.
    """
    groups = list(ensure_iterable(groupby_columns))
    if not groups:
        raise ValueError("session_features requires groupby_columns")
    ties = list(ensure_iterable(order_tiebreak)) if order_tiebreak else []

    def _transform(df: DataFrame) -> DataFrame:
        with_sid = df.transform(
            sessionize_gap(ts_column, gap_seconds, groups)
        )
        order = [F.col(ts_column).asc()] + [F.col(c).asc() for c in ties]
        ws = Window.partitionBy(*groups, "session_id").orderBy(*order)
        start = F.first(ts_column).over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return with_sid.select(
            "*",
            F.row_number().over(ws).alias("event_idx"),
            (
                epoch_seconds(ts_column) - epoch_seconds(start)
            ).alias("secs_into_session"),
        )

    _transform.__name__ = "session_features"
    return _transform
