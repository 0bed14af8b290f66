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


def scd2_from_changelog(
    key_columns: Union[str, Sequence[str]],
    order_column: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    tiebreak_columns: Union[str, Sequence[str]] = (),
) -> Callable[[DataFrame], DataFrame]:
    """Turn a changelog into SCD-type-2 validity intervals: each row
    becomes valid from its own ``order_column`` until the key's next
    change (NULL = still current). One window, one shuffle on the key —
    no self-join; at scale this is the cheapest possible formulation
    (the join-based one shuffles the table twice and skews on hot keys).

    ``df.transform(scd2_from_changelog("user_id", "ts"))``
    """
    from pyspark.sql import Window

    keys = list(ensure_iterable(key_columns))
    ties = list(ensure_iterable(tiebreak_columns))
    if not keys:
        raise ValueError("scd2_from_changelog requires at least one key column")

    def _transform(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(order_column, *ties)
        return df.withColumn(valid_from, F.col(order_column)).withColumn(
            valid_to, F.lead(order_column).over(w)
        )

    return _transform


def drop_unchanged(
    key_columns: Union[str, Sequence[str]],
    order_column: str,
    value_columns: Union[str, Sequence[str]],
) -> Callable[[DataFrame], DataFrame]:
    """Collapse runs of identical values per key (changelog compression):
    keep a row only when any ``value_columns`` entry differs (null-safely)
    from the key's previous row; each key's first row always survives.
    One window on (key, order) — the filter happens post-shuffle on the
    sorted partition, so nothing is re-shuffled and downstream consumers
    inherit the (key, order) clustering.

    ``df.transform(drop_unchanged("user_id", "ts", ["plan", "region"]))``
    """
    from pyspark.sql import Window

    keys = list(ensure_iterable(key_columns))
    vals = list(ensure_iterable(value_columns))
    if not keys or not vals:
        raise ValueError("drop_unchanged requires key and value columns")

    def _transform(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(order_column)
        changed = F.lit(False)
        for c in vals:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        first = F.row_number().over(w) == 1
        return (
            df.withColumn("_keep", first | changed)
            .where(F.col("_keep"))
            .drop("_keep")
        )

    return _transform


def apply_changelog(
    changes: DataFrame,
    key_columns: Union[str, Sequence[str]],
    order_column: str,
    tiebreak_columns: Union[str, Sequence[str]] = (),
    delete_column: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """CDC merge: apply a change batch onto a snapshot — per key the
    newest row (snapshot or change) wins, and if ``delete_column``
    names a boolean tombstone flag, keys whose WINNING row is a
    tombstone drop out entirely. ``snapshot.transform(apply_changelog(
    batch, "id", "version", delete_column="is_deleted"))``.

    Union + one ``latest_by_key`` shuffle — the merge never joins
    snapshot to batch (a join-based upsert shuffles both sides AND
    breaks on keys new to either side); the tombstone filter runs on
    the compacted one-row-per-key output, so it is free.
    """

    def _transform(snapshot: DataFrame) -> DataFrame:
        merged = snapshot.unionByName(changes)
        out = merged.transform(
            latest_by_key(key_columns, order_column, tiebreak_columns)
        )
        if delete_column is not None:
            out = out.where(
                ~F.coalesce(F.col(delete_column), F.lit(False))
            )
        return out

    return _transform
