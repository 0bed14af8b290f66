"""Range joins — point-in-interval and interval-overlap joins that never
degrade to a nested-loop plan.

Spark's own planner turns a join whose condition is *only* inequalities
into ``BroadcastNestedLoopJoin`` (or a cartesian product): O(|L| x |R|)
comparisons, a non-starter at 100 TB. Even with an equality key, all
pairs *within* a key are still compared, which blows up on hot keys.

The classic fix (used by every warehouse range-join implementation, e.g.
the published Databricks range-join hint and Flink's interval join) is
**bucketing**: quantize the range dimension into fixed-width buckets,
explode each interval into the buckets it covers, tag each point with its
single bucket, and equi-join on ``(keys..., bucket)`` with the exact
range predicate as a residual filter. The plan is an ordinary shuffled
equi-join — hash-partitioned, AQE-skew-splittable, broadcast-able — and
each row is only compared against rows in the same bucket. Cost is
linear in rows x (interval_len / bucket_width), so pick
``bucket_seconds`` on the order of the typical interval length.

Pair uniqueness (no post-join dedup needed):

- point-in-interval: a point lies in exactly ONE bucket, so a (point,
  interval) pair meets in exactly one bucket.
- interval-overlap: both sides explode, so a pair meets once per shared
  bucket; the join keeps only the "responsible" bucket — the bucket of
  ``greatest(lower_a, lower_b)``, i.e. where the overlap starts — which
  exists iff the pair overlaps. One bucket per pair, no duplicates.

All bucket/range arithmetic happens on exact ``bigint`` microsecond
values computed once per side, so edge values bucket identically on both
sides and the residual comparison can never disagree with the bucketing.

Reference parity: the reference engine has no range join; this completes
the temporal-join family next to ``operators.asof`` (file: ``asof.py``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

from pywrangler_spark.functions.temporal import epoch_micros
from pywrangler_spark.util import ensure_iterable

_BUCKET = "__rj_bucket"
_PT = "__rj_pt"
_LO = "__rj_lo"
_HI = "__rj_hi"
_LLO = "__rj_llo"
_LHI = "__rj_lhi"


def _epoch_micros(df: DataFrame, column: str) -> Column:
    """Column as an exact ``bigint`` count of microseconds (timestamps) or
    micro-units (numerics) — integer bucket arithmetic, no float edges."""
    dtype = df.schema[column].dataType
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return epoch_micros(column)
    if isinstance(dtype, NumericType):
        return (F.col(column).cast("decimal(30,6)") * 1_000_000).cast("long")
    raise TypeError(
        f"range join column {column!r} must be timestamp or numeric, "
        f"got {dtype.simpleString()}"
    )


def _bucket_of(micros: Column, width_micros: int) -> Column:
    # floor division that is exact and floor-correct for negatives:
    # pmod is always non-negative, so (x - pmod(x, w)) is the largest
    # multiple of w <= x
    w = F.lit(width_micros)
    return ((micros - F.pmod(micros, w)) / w).cast("long")


def _width_micros(bucket_seconds: float) -> int:
    width = int(round(float(bucket_seconds) * 1_000_000))
    if width <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    return width


def _payload(
    right: DataFrame,
    keys: Sequence[str],
    right_columns: Optional[Sequence[str]],
    left_columns: Sequence[str],
    suffix: str,
):
    rcols = (
        list(right_columns)
        if right_columns is not None
        else [c for c in right.columns if c not in keys]
    )
    out = [c + suffix if c in left_columns else c for c in rcols]
    return rcols, out


def range_join(
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    on: Union[str, Sequence[str]] = (),
    *,
    bucket_seconds: float = 86400.0,
    how: str = "inner",
    right_columns: Optional[Sequence[str]] = None,
    suffix: str = "_right",
) -> Callable[[DataFrame], DataFrame]:
    """Point-in-interval join: attach to each left row every right row
    with ``lower <= point <= upper`` (bounds inclusive) and equal ``on``
    keys. Use as ``left.transform(range_join(right, ...))``.

    Parameters
    ----------
    right : interval side; ``lower``/``upper`` are its columns.
    point : left-side point column (timestamp or numeric).
    on : optional equality key column(s) present on both sides.
    bucket_seconds : bucket width; choose ~ the typical interval length
        (too small explodes intervals into many buckets, too large puts
        unrelated rows in the same bucket).
    how : "inner" or "left" (unmatched left rows keep NULL right columns).
    right_columns : right columns to attach (default: all of them except
        the ``on`` keys). A name already on the left gains ``suffix``.
    """
    keys = list(ensure_iterable(on))
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    width = _width_micros(bucket_seconds)

    def _transform(left: DataFrame) -> DataFrame:
        rcols, out_names = _payload(
            right, keys, right_columns, left.columns, suffix
        )
        pt = _epoch_micros(left, point)
        lo, hi = _epoch_micros(right, lower), _epoch_micros(right, upper)
        l = left.select(
            "*", pt.alias(_PT), _bucket_of(pt, width).alias(_BUCKET)
        )
        r = right.select(
            *keys,
            *[F.col(c).alias(n) for c, n in zip(rcols, out_names)],
            lo.alias(_LO),
            hi.alias(_HI),
            F.explode(
                F.sequence(_bucket_of(lo, width), _bucket_of(hi, width))
            ).alias(_BUCKET),
        )
        # explicit aliases: left/right often share lineage (self-joins on
        # one scan), where l[k] == r[k] can resolve to a trivially-true
        # predicate — qualified names are unambiguous
        l, r = l.alias("__rj_l"), r.alias("__rj_r")
        lc = lambda c: F.col(f"__rj_l.{c}")  # noqa: E731
        rc = lambda c: F.col(f"__rj_r.{c}")  # noqa: E731
        cond = (
            (lc(_BUCKET) == rc(_BUCKET))
            & (rc(_LO) <= lc(_PT))
            & (lc(_PT) <= rc(_HI))
        )
        for k in keys:
            cond = cond & (lc(k) == rc(k))
        joined = l.join(r, cond, how)
        return joined.select(
            *[lc(c) for c in left.columns], *[rc(n) for n in out_names]
        )

    _transform.__name__ = "range_join"
    return _transform


def interval_join(
    right: DataFrame,
    left_lower: str,
    left_upper: str,
    right_lower: str,
    right_upper: str,
    on: Union[str, Sequence[str]] = (),
    *,
    bucket_seconds: float = 86400.0,
    right_columns: Optional[Sequence[str]] = None,
    suffix: str = "_right",
) -> Callable[[DataFrame], DataFrame]:
    """Interval-overlap join (inner): pair rows whose closed intervals
    intersect (``l_lower <= r_upper AND r_lower <= l_upper``) with equal
    ``on`` keys. Both sides explode into buckets; a pair is emitted only
    in the bucket where its overlap starts, so each overlapping pair
    appears exactly once."""
    keys = list(ensure_iterable(on))
    width = _width_micros(bucket_seconds)

    def _transform(left: DataFrame) -> DataFrame:
        rcols, out_names = _payload(
            right, keys, right_columns, left.columns, suffix
        )
        llo = _epoch_micros(left, left_lower)
        lhi = _epoch_micros(left, left_upper)
        rlo = _epoch_micros(right, right_lower)
        rhi = _epoch_micros(right, right_upper)
        l = left.select(
            "*",
            llo.alias(_LLO),
            lhi.alias(_LHI),
            F.explode(
                F.sequence(_bucket_of(llo, width), _bucket_of(lhi, width))
            ).alias(_BUCKET),
        )
        r = right.select(
            *keys,
            *[F.col(c).alias(n) for c, n in zip(rcols, out_names)],
            rlo.alias(_LO),
            rhi.alias(_HI),
            F.explode(
                F.sequence(_bucket_of(rlo, width), _bucket_of(rhi, width))
            ).alias(_BUCKET),
        )
        l, r = l.alias("__rj_l"), r.alias("__rj_r")
        lc = lambda c: F.col(f"__rj_l.{c}")  # noqa: E731
        rc = lambda c: F.col(f"__rj_r.{c}")  # noqa: E731
        overlap = (lc(_LLO) <= rc(_HI)) & (rc(_LO) <= lc(_LHI))
        responsible = lc(_BUCKET) == _bucket_of(
            F.greatest(lc(_LLO), rc(_LO)), width
        )
        cond = (lc(_BUCKET) == rc(_BUCKET)) & overlap & responsible
        for k in keys:
            cond = cond & (lc(k) == rc(k))
        joined = l.join(r, cond, "inner")
        return joined.select(
            *[lc(c) for c in left.columns], *[rc(n) for n in out_names]
        )

    _transform.__name__ = "interval_join"
    return _transform
