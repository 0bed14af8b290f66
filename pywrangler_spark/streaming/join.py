"""Watermarked stream-stream interval join.

Structured Streaming buffers BOTH sides in state until the watermark
proves no more matches can arrive; without a time-range predicate the
state is unbounded, so this operator REQUIRES one: right events must
fall within ``[left_ts - before, left_ts + after]``. State per key is
then bounded by (watermark + before + after) of buffered input — the
canonical bounded-state stream-stream join setup. Inner joins emit as
matches arrive; the same transform applied to two batch DataFrames
produces the identical pair set (asserted in the test suite).
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def stream_interval_join(
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: str,
    before: str = "0 seconds",
    after: str = "1 hour",
    watermark: str = "1 hour",
) -> Callable[[DataFrame], DataFrame]:
    """Inner-join two streams on equality keys plus the time-range
    predicate ``right_ts BETWEEN left_ts - before AND left_ts + after``.
    ``left_ts``/``right_ts`` must be DISTINCT column names (rename one
    side first) — both survive into the output.

    ``clicks.transform(stream_interval_join(purchases, "user_id",
    "click_ts", "purchase_ts"))``
    """
    keys = list(ensure_iterable(on))
    if not keys:
        raise ValueError("stream_interval_join requires equality keys")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")

    def _transform(left: DataFrame) -> DataFrame:
        l = left.withWatermark(left_ts, watermark)
        r = right.withWatermark(right_ts, watermark)
        cond = None
        for k in keys:
            c = l[k] == r[k]
            cond = c if cond is None else cond & c
        rng = F.expr(
            f"{right_ts} >= {left_ts} - INTERVAL {before} AND "
            f"{right_ts} <= {left_ts} + INTERVAL {after}"
        )
        joined = l.join(r, cond & rng, "inner")
        # drop the duplicated key columns from the right side
        return joined.select(
            *[l[c] for c in left.columns],
            *[r[c] for c in right.columns if c not in keys],
        )

    return _transform
