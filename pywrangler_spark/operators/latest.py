"""Latest-record-per-key (SCD-style compaction / changelog dedup).

``max_by(struct(payload), struct(order, tiebreak...))`` — ONE shuffle
with map-side partial aggregation, each partition pre-reducing to one
candidate row per key before anything moves. The alternative
``row_number() = 1`` window moves EVERY row to the key's reducer and
sorts there; at 100 TB of changelog that is the difference between
shuffling the compacted keyspace and shuffling the full history.
Tiebreaks make the winner deterministic when order values repeat.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def latest_by_key(
    key_columns: Union[str, Sequence[str]],
    order_column: str,
    tiebreak_columns: Union[str, Sequence[str]] = (),
) -> Callable[[DataFrame], DataFrame]:
    """Keep each key's row with the greatest ``order_column`` (ties
    resolved by ``tiebreak_columns``, greatest wins). Output columns ==
    input columns (original order), one row per key.

    ``df.transform(latest_by_key("user_id", "ts", "event_id"))``
    """
    keys = list(ensure_iterable(key_columns))
    ties = list(ensure_iterable(tiebreak_columns))
    if not keys:
        raise ValueError("latest_by_key requires at least one key column")

    def _transform(df: DataFrame) -> DataFrame:
        payload = [c for c in df.columns if c not in keys]
        ordering = F.struct(F.col(order_column),
                            *[F.col(c) for c in ties])
        row = df.groupBy(*keys).agg(
            F.max_by(F.struct(*payload), ordering).alias("_row")
        )
        return row.select(
            *[c if c in keys else F.col(f"_row.{c}").alias(c)
              for c in df.columns]
        )

    return _transform
