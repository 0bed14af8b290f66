"""Deterministic sequence packing — assign variable-length documents to
fixed token-budget packs (the LLM-training dataloader prep step).

Contiguous-fill rule: order documents deterministically, take the
running token total BEFORE each document, and
``pack_id = floor(cum_before / budget)``. A document whose size
straddles a budget boundary belongs to the pack its first token falls
in (packs can overflow by at most one document — the standard
contiguous-packing approximation; true bin-packing is sequential and
cannot be expressed as a scan).

Scale: one window per partition key — a single Exchange; the running
sum is one sorted pass. With no partition key supplied the operator
refuses (a global order would serialize onto one task) unless
``allow_single_partition=True`` — partition by a hash-derived shard
(e.g. ``hash_split``'s bucket) and pack within shards at 100 TB.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable


def pack_sequences(
    size_column: str,
    budget: int,
    order_columns: Union[str, Sequence[str]],
    partition_columns: Union[str, Sequence[str]] = (),
    allow_single_partition: bool = False,
) -> Callable[[DataFrame], DataFrame]:
    """Add ``pack_id`` (0-based BIGINT per partition key) and
    ``pack_offset`` (token offset of the document inside its pack).

    ``df.transform(pack_sequences("n_tokens", 4096, "doc_id", "shard"))``
    """
    order = list(ensure_iterable(order_columns))
    parts = list(ensure_iterable(partition_columns))
    if budget <= 0:
        raise ValueError("pack_sequences requires a positive budget")
    if not order:
        raise ValueError("pack_sequences requires order columns")
    if not parts and not allow_single_partition:
        raise ValueError(
            "no partition_columns: a global packing order serializes onto "
            "one task; pass a shard key, or allow_single_partition=True "
            "for small data"
        )

    def _transform(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*parts).orderBy(*order)
            if parts
            else Window.partitionBy().orderBy(*order)
        )
        cum_before = F.coalesce(
            F.sum(F.col(size_column)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        return df.withColumn(
            "pack_id", F.floor(cum_before / budget).cast("bigint")
        ).withColumn(
            "pack_offset",
            (cum_before - F.col("pack_id") * budget).cast("bigint"),
        )

    return _transform


def render_packs(
    text_column: str,
    size_column: str,
    order_columns: Union[str, Sequence[str]],
    partition_columns: Union[str, Sequence[str]],
    pack_column: str = "pack_id",
    offset_column: str = "pack_offset",
    joiner: str = " ",
) -> Callable[[DataFrame], DataFrame]:
    """Materialize the packs :func:`pack_sequences` assigned: one row
    per (shard..., pack) holding the documents concatenated in pack
    order plus the boundary offsets — the actual training-sequence
    artifact a dataloader consumes (text + "where does each document
    start" for attention masking / loss spans).

    Output: partition columns, ``pack_column``, ``n_docs``,
    ``n_tokens`` (sum of member sizes), ``boundaries``
    (array<bigint> of member token offsets in order) and
    ``packed_text``.

    Scale shape: one hash aggregation keyed by (shard, pack) — packs
    are budget-bounded (a handful of documents each), so the
    collect_list state per group is small by construction; the shuffle
    carries each document once. ``df.transform(render_packs("text",
    "n_tokens", "doc_id", "shard"))`` after ``pack_sequences``.
    """
    order = list(ensure_iterable(order_columns))
    parts = list(ensure_iterable(partition_columns))
    if not order:
        raise ValueError("render_packs requires order columns")
    if not parts:
        raise ValueError(
            "render_packs requires the shard key used for packing"
        )

    def _transform(df: DataFrame) -> DataFrame:
        member = F.struct(
            *order, offset_column, text_column, size_column
        )
        grouped = df.groupBy(*parts, pack_column).agg(
            F.array_sort(F.collect_list(member)).alias("_m"),
            F.sum(size_column).cast("bigint").alias("n_tokens"),
        )
        return grouped.select(
            *parts,
            pack_column,
            F.size("_m").cast("bigint").alias("n_docs"),
            "n_tokens",
            F.col("_m").getField(offset_column).alias("boundaries"),
            F.array_join(
                F.col("_m").getField(text_column), joiner
            ).alias("packed_text"),
        )

    return _transform
