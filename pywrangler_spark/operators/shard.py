"""Deterministic global shuffle + shard assignment for training-data
writers.

Before a corpus is written as training shards, rows must be (a)
pseudo-randomly permuted — so each shard is an unbiased sample and
sequential readers see shuffled data — and (b) assigned a stable shard
id. ``rand()`` breaks both under retries and repartitioning; everything
here derives from the md5 hash family (``functions.hashing``), so the
same row lands in the same shard at the same position on any engine,
any cluster size, forever.

Plan shape: shard assignment is a pure projection (no shuffle); the
within-shard position is one ``row_number`` window partitioned by shard
and ordered by the hash — exactly one exchange, on the shard key. Shard
count should scale with data volume (thousands of shards at 100 TB), so
per-shard reducer state stays bounded; this is the same contract as a
parquet writer's ``repartition(shard).sortWithinPartitions(order)``.

Reference parity: the reference has no sharding operators; this covers
the shuffled-shard-writer slot of a training pipeline.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.functions.hashing import hash56


def shuffle_to_shards(
    id_column: str,
    num_shards: int,
    seed: Union[int, str] = 42,
    shard_column: str = "shard",
    position_column: str = "pos",
) -> Callable[[DataFrame], DataFrame]:
    """Assign each row a shard in ``[0, num_shards)`` and a 0-based
    position within its shard, both by md5-hash order.

    The hash doubles as the permutation key: ordering a shard's rows by
    ``pos`` yields a deterministic pseudo-random interleaving of the
    input. Ties (astronomically unlikely 56-bit collisions) break on the
    id so the output is still a total order.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")

    def _transform(df: DataFrame) -> DataFrame:
        clash = {shard_column, position_column, "__h"} & set(df.columns)
        if clash:
            raise ValueError(
                "shuffle_to_shards output/internal column(s) "
                f"{sorted(clash)} already exist in the input; rename them "
                "or pass different shard_column/position_column names"
            )
        h = hash56(
            F.concat_ws(
                ":", F.lit(str(seed)), F.col(id_column).cast("string")
            )
        )
        w = (
            Window.partitionBy(shard_column)
            .orderBy(F.col("__h").asc(), F.col(id_column).asc())
        )
        return (
            df.select(
                "*",
                F.pmod(h, F.lit(num_shards)).alias(shard_column),
                h.alias("__h"),
            )
            .select(
                *df.columns,
                shard_column,
                (F.row_number().over(w) - 1).alias(position_column),
            )
        )

    _transform.__name__ = "shuffle_to_shards"
    return _transform
