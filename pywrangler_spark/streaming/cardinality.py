"""Streaming windowed cardinality — distinct keys per event-time window
with bounded state.

The dashboard staple ("unique users per hour") at stream scale. Exact
distinct counting in a stream needs per-window key sets in the state
store — state grows with cardinality, which is exactly what kills a
100 TB/day stream. Two tiers, mirroring the batch engine's
exact-vs-sketch split (``distinct_counts`` / ``approx_distinct_parts``):

- ``exact=False`` (default, the scale path): ``approx_count_distinct``
  keeps ONE fixed-size HLL buffer per open window in the state store —
  state is O(windows × 2^p), independent of key cardinality, and merges
  are associative so late micro-batches fold in correctly under the
  watermark.
- ``exact=True``: two stacked aggregations (dedup by (window, key),
  then count). State carries the key set — fine for bounded key
  domains, documented non-option for unbounded ones.

Both emit once per closed window (append mode under a watermark).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_window_cardinality(
    ts_column: str,
    key_column: str,
    window: str = "1 hour",
    watermark: str = "1 day",
    exact: bool = False,
    rsd: Optional[float] = 0.05,
) -> Callable[[DataFrame], DataFrame]:
    """Distinct ``key_column`` values per tumbling event-time window.

    Output: (window_start, window_end, n_distinct). Append mode; a
    window's row emits when the watermark passes its end.
    """

    def _transform(sdf: DataFrame) -> DataFrame:
        marked = sdf.withWatermark(ts_column, watermark)
        win = F.window(F.col(ts_column), window)
        if exact:
            # stacked aggregation: dedup carries (window, key) state,
            # count is per-window. Spark supports chained streaming
            # aggregations on the same event-time window (4.x).
            dedup = marked.groupBy(win.alias("w"), F.col(key_column)).agg(
                F.lit(1).alias("_one")
            )
            counted = dedup.groupBy("w").agg(
                F.count(F.lit(1)).alias("n_distinct")
            )
        else:
            counted = marked.groupBy(win.alias("w")).agg(
                F.approx_count_distinct(key_column, rsd).alias("n_distinct")
            )
        return counted.select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_distinct",
        )

    _transform.__name__ = "stream_window_cardinality"
    return _transform
