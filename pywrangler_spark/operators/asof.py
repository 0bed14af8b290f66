"""As-of (nearest-timestamp) join — a temporal operator Spark lacks as a
built-in, expressed as a single-shuffle union + window instead of a join.

For every left row, attach the one right row with the greatest
``right_ts <= left_ts`` (direction="backward") or the least
``right_ts >= left_ts`` ("forward") within the same equality keys —
pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, left-outer
(unmatched left rows keep NULL right columns).

Scale design (the reason this is NOT an inequality join):

- A naive ``left JOIN right ON keys AND right_ts <= left_ts`` + max-pick
  explodes to O(|left| x |matches|) pairs before pruning — a
  BroadcastNestedLoopJoin or huge SortMergeJoin at 100 TB.
- Here both sides are unioned, shuffled ONCE on the equality keys, sorted
  by (ts, side) inside each partition, and every left row picks up the
  most recent right payload via ``last(..., ignorenulls=True)`` over a
  running frame. Cost is a single Exchange + Sort over |left| + |right|
  rows — linear, skew-bounded by key cardinality, no join node in the
  plan at all.
- The right payload rides as ONE struct column so the window fill is
  atomic (all attached columns come from the same right row).

Reference parity: the reference engine has no temporal join; this extends
the interval/sessionization family (see ``pywrangler_spark.operators
.interval_identifier``) with the standard time-series primitive.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.functions.temporal import epoch_seconds
from pywrangler_spark.util import ensure_iterable

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_r"
_RTS_FIELD = "__rts"


def asof_join(
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    right_columns: Optional[Sequence[str]] = None,
    suffix: str = "_right",
) -> Callable[[DataFrame], DataFrame]:
    """Build a transform: ``left.transform(asof_join(right, ...))``.

    Parameters
    ----------
    right : the time-indexed lookup side.
    on : equality key column(s) present on both sides.
    left_ts / right_ts : timestamp (or any orderable) columns.
    direction : "backward" (greatest right_ts <= left_ts) or "forward"
        (least right_ts >= left_ts). Ties on the timestamp itself match
        (inclusive), as in pandas/DuckDB.
    tolerance_seconds : if set, matches farther than this are nulled out
        (timestamp columns only).
    right_columns : right payload columns to attach (default: all
        non-key columns). Each lands as ``<name><suffix>``.
    suffix : appended to every attached column name; the right timestamp
        itself is attached as ``<right_ts><suffix>``.
    """
    keys = list(ensure_iterable(on))
    if not keys:
        raise ValueError("asof_join requires at least one equality key")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    def _transform(left: DataFrame) -> DataFrame:
        rcols = (
            list(right_columns)
            if right_columns is not None
            else [c for c in right.columns if c not in keys and c != right_ts]
        )
        out_names = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in rcols]
        clash = [c for c in out_names if c in left.columns]
        if clash:
            raise ValueError(
                f"asof_join output columns collide with left: {clash}; "
                "pass a different suffix"
            )

        payload = F.struct(
            F.col(right_ts).alias(_RTS_FIELD),
            *[F.col(c) for c in rcols],
        )
        r = right.select(
            *keys,
            F.col(right_ts).alias(_TS),
            payload.alias(_PAYLOAD),
            F.lit(0).alias(_SIDE),
        )
        payload_type = r.schema[_PAYLOAD].dataType
        l = left.select(
            "*",
            F.col(left_ts).alias(_TS),
            F.lit(None).cast(payload_type).alias(_PAYLOAD),
            F.lit(1).alias(_SIDE),
        )
        u = l.unionByName(r, allowMissingColumns=True)

        if direction == "backward":
            # right (side 0) sorts before left at equal ts -> inclusive
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
        else:
            # left (side 1) sorts before right at equal ts -> inclusive.
            # Nearest-following payload = last() over the reversed-order
            # RUNNING frame: Spark's unbounded-FOLLOWING frame rescans
            # the rest of the partition per row (O(rows²) per key),
            # running frames accumulate incrementally.
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col(_TS).desc(), F.col(_SIDE).asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            matched = F.last(_PAYLOAD, ignorenulls=True).over(w)

        filled = u.select("*", matched.alias("__m")).where(F.col(_SIDE) == 1)

        m = F.col("__m")
        if tolerance_seconds is not None:
            # epoch_seconds, not cast("double"): NTZ-safe
            gap = epoch_seconds(left_ts) - epoch_seconds(m[_RTS_FIELD])
            if direction == "forward":
                gap = -gap
            m = F.when(gap <= F.lit(float(tolerance_seconds)), m)

        attached = [m[_RTS_FIELD].alias(out_names[0])] + [
            m[c].alias(n) for c, n in zip(rcols, out_names[1:])
        ]
        return filled.select(*left.columns, *attached)

    _transform.__name__ = "asof_join"
    return _transform


def time_bucket_rollup(
    ts_column: str,
    bucket: str,
    groupby_columns: Union[str, Sequence[str]] = (),
    aggs: Optional[Sequence] = None,
    slide: Optional[str] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Hypertable-style fixed-width time-bucket rollup: assign each row to
    a tumbling bucket (``F.window`` — JVM-side, codegen'd) and aggregate
    per (bucket, groups). One shuffle on (bucket, groups); partial
    aggregation is map-side so the exchange carries only group rows.

    ``bucket`` is a Spark interval string ("1 hour", "15 minutes").
    ``slide`` (optional, must divide ``bucket``) makes the windows
    HOPPING: each row lands in bucket/slide overlapping windows (Spark
    expands rows pre-aggregation — the fan-out is the window/slide
    ratio, so keep it small at scale; partial agg still collapses
    map-side before the shuffle).
    Emits ``bucket_start`` as the bucket label plus the aggregates.
    """
    groups = list(ensure_iterable(groupby_columns))

    def _transform(df: DataFrame) -> DataFrame:
        agg_list = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
        win = (F.window(F.col(ts_column), bucket, slide)
               if slide else F.window(F.col(ts_column), bucket))
        out = df.groupBy(win.alias("__b"), *groups).agg(*agg_list)
        return out.select(
            F.col("__b.start").alias("bucket_start"), *groups,
            *[c for c in out.columns if c != "__b" and c not in groups],
        )

    _transform.__name__ = "time_bucket_rollup"
    return _transform


def ohlc_bars(
    ts_column: str,
    value_column: str,
    bucket: str,
    groupby_columns: Union[str, Sequence[str]] = (),
    tiebreak_columns: Union[str, Sequence[str]] = (),
) -> Callable[[DataFrame], DataFrame]:
    """Open/high/low/close bars per time bucket (and optional groups):
    open = value at the bucket's earliest row, close at its latest
    (``min_by``/``max_by`` on a (ts, tiebreaks) struct — deterministic
    under equal timestamps), high/low = plain max/min. ONE aggregation,
    map-side partials — each shuffle row is a bucket's 4-number partial
    state, never the ticks. The window-rank formulation shuffles every
    tick and sorts per bucket; at 100 TB of market data that is the
    whole cost of the query.
    """
    groups = list(ensure_iterable(groupby_columns))
    ties = list(ensure_iterable(tiebreak_columns))

    def _transform(df: DataFrame) -> DataFrame:
        order = F.struct(F.col(ts_column),
                         *[F.col(c) for c in ties])
        v = F.col(value_column)
        out = df.groupBy(
            F.window(F.col(ts_column), bucket).alias("__b"), *groups
        ).agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        return out.select(
            F.col("__b.start").alias("bucket_start"), *groups,
            "open", "high", "low", "close", "n_ticks",
        )

    _transform.__name__ = "ohlc_bars"
    return _transform
