"""Streaming sequence packing — the incremental analog of
``operators.pack.pack_sequences``.

Packing is a running-total computation per shard: ``pack_id =
floor(cum_tokens_before / budget)``. On a stream the running total must
survive across micro-batches, so each shard keeps ONE number of state
(the tokens consumed so far) in ``applyInPandasWithState`` — the same
bounded-state shape as ``streaming.caps``: O(shards), independent of
stream length, never expired (a pack layout is a whole-stream
contract; expiring a shard's counter would restart its packs at 0).

Within a micro-batch rows are ordered by ``order_columns`` (vectorized
cumsum in pandas); across batches arrival order governs, exactly like
the streaming cap. With a shard-ordered source the result equals the
batch operator on the same rows (equivalence-tested in
tests/test_streaming.py).

Like the batch twin, a shard key is REQUIRED: a global packing order
would serialize the stream through one state key.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence, Tuple, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from pywrangler_spark.util import ensure_iterable


def stream_pack_sequences(
    size_column: str,
    budget: int,
    order_columns: Union[str, Sequence[str]],
    partition_columns: Union[str, Sequence[str]],
) -> Callable[[DataFrame], DataFrame]:
    """Add ``pack_id`` / ``pack_offset`` (both BIGINT, per shard) to a
    streaming DataFrame, continuing each shard's running token total
    across micro-batches.

    ``sdf.transform(stream_pack_sequences("n_tokens", 4096,
    "doc_id", "shard"))``
    """
    order = list(ensure_iterable(order_columns))
    parts = list(ensure_iterable(partition_columns))
    if budget <= 0:
        raise ValueError("stream_pack_sequences requires a positive budget")
    if not order:
        raise ValueError("stream_pack_sequences requires order columns")
    if not parts:
        raise ValueError(
            "stream_pack_sequences requires a shard key: a global "
            "packing order serializes the stream through one state key"
        )

    def _transform(sdf: DataFrame) -> DataFrame:
        out_schema = StructType(
            list(sdf.schema.fields)
            + [
                StructField("pack_id", LongType()),
                StructField("pack_offset", LongType()),
            ]
        )

        def _pack(
            key: Tuple,
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            (consumed,) = state.get if state.exists else (0,)
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(order, kind="stable").reset_index(
                drop=True
            )
            sizes = batch[size_column].astype("int64")
            cum_before = consumed + sizes.cumsum() - sizes
            batch["pack_id"] = (cum_before // budget).astype("int64")
            batch["pack_offset"] = (
                cum_before - batch["pack_id"] * budget
            ).astype("int64")
            state.update((int(consumed + sizes.sum()),))
            yield batch

        return sdf.groupBy(*parts).applyInPandasWithState(
            _pack,
            outputStructType=out_schema,
            stateStructType="consumed long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    return _transform
