"""Streaming exact deduplication — the incremental analog of
``operators.dedup.dedup_exact``.

``dropDuplicatesWithinWatermark`` keeps one row per key and expires key
state once the watermark passes the key's first-seen event time, so
state is bounded by (keys arriving within one watermark window) instead
of growing forever — the difference between a demo and an operator that
survives a week-long stream. Duplicates separated by more than the
watermark are NOT collapsed (they can't be, with bounded state); choose
the watermark ≥ the real-world duplicate horizon (retry windows,
at-least-once redelivery).
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import DataFrame

from pywrangler_spark.util import ensure_iterable


def stream_dedup_exact(
    key_columns: Union[str, Sequence[str]],
    ts_column: str,
    watermark: str = "1 day",
) -> Callable[[DataFrame], DataFrame]:
    """First-writer-wins dedup on ``key_columns`` for a streaming
    DataFrame; emits each key's first row, suppresses replays arriving
    within ``watermark`` of it. Output schema = input schema.

    ``df.transform(stream_dedup_exact("event_id", "ts"))``
    """
    keys = list(ensure_iterable(key_columns))
    if not keys:
        raise ValueError("stream_dedup_exact requires at least one key")

    def _transform(sdf: DataFrame) -> DataFrame:
        return sdf.withWatermark(
            ts_column, watermark
        ).dropDuplicatesWithinWatermark(keys)

    return _transform
