"""Streaming time-bucket rollup — the incremental analog of
``operators.asof.time_bucket_rollup``.

Tumbling-window aggregation with a watermark: counts/sums per
(bucket, groups) emit once the watermark passes the bucket end (append
mode), so late rows inside the watermark still land in their bucket and
rows later than the watermark are dropped deterministically. State per
key is one window aggregate — bounded by (watermark / bucket) × group
cardinality, the canonical streaming-agg memory story.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def stream_time_bucket_rollup(
    ts_column: str,
    bucket: str,
    groupby_columns: Union[str, Sequence[str]] = (),
    aggs: Optional[Sequence] = None,
    watermark: str = "1 day",
    slide: Optional[str] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Tumbling-bucket aggregates over a streaming DataFrame; output
    schema matches the batch ``time_bucket_rollup`` (``bucket_start`` +
    groups + aggregates), so the two are interchangeable downstream —
    equivalence is asserted in the test suite. ``slide`` makes the
    windows hopping, exactly as in the batch operator; state grows by
    the window/slide ratio (each row lives in that many windows)."""
    groups = list(ensure_iterable(groupby_columns))

    def _transform(sdf: DataFrame) -> DataFrame:
        agg_list = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
        win = (F.window(F.col(ts_column), bucket, slide)
               if slide else F.window(F.col(ts_column), bucket))
        out = (
            sdf.withWatermark(ts_column, watermark)
            .groupBy(win.alias("__b"), *groups)
            .agg(*agg_list)
        )
        return out.select(
            F.col("__b.start").alias("bucket_start"), *groups,
            *[c for c in out.columns if c != "__b" and c not in groups],
        )

    return _transform
