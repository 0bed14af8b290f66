"""Funnel analysis: per key, the first time each stage happened AFTER
the previous stage (view -> click -> purchase, signup -> activate ->
pay, ...).

Formulation: stage N's timestamp is ``min(ts WHERE pred_N AND ts >
t_{N-1})`` over the key's events. Each stage is a window aggregate over
the SAME partition key, so Catalyst stacks the Window nodes on one
Exchange + one sort — no join-back of intermediate stage times (the
naive decorrelation joins the table to itself once per stage, N
shuffles of the full event log). The final per-key collapse reuses the
window partitioning, so it adds no exchange either.
"""

from __future__ import annotations

from typing import Callable, Mapping, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    key_column: str,
    ts_column: str,
    stages: Mapping[str, Column],
    strict: bool = True,
) -> Callable[[DataFrame], DataFrame]:
    """One row per key with a ``<stage>_ts`` column per stage: the
    earliest event satisfying that stage's predicate strictly after the
    previous stage's time (``strict=False`` allows ties). A NULL stage
    time means the key never completed that stage (and all later ones
    stay NULL by construction).

    ``df.transform(funnel("user_id", "ts", {
        "view": F.col("event_type") == "view",
        "click": F.col("event_type") == "click",
        "purchase": F.col("event_type") == "purchase"}))``
    """
    names = list(stages)
    if not names:
        raise ValueError("funnel requires at least one stage")

    def _transform(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(key_column)
        out = df
        prev: Column | None = None
        for name in names:
            pred = stages[name]
            if prev is not None:
                after = (F.col(ts_column) > prev if strict
                         else F.col(ts_column) >= prev)
                pred = pred & after
            col = F.min(F.when(pred, F.col(ts_column))).over(w)
            out = out.withColumn(f"{name}_ts", col)
            prev = F.col(f"{name}_ts")
        return out.groupBy(key_column).agg(
            *[F.min(f"{n}_ts").alias(f"{n}_ts") for n in names]
        )

    return _transform
