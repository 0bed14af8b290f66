"""Time-grid resampling — regularize irregular event streams onto a
fixed-width grid per key, with last-observation-carried-forward fill.

The missing piece between raw events and windowed analytics: rolling
aggregates, lag features and join-ready feature tables all want one row
per (key, bucket) even when nothing happened in a bucket.

Plan shape (scale-first):

1. per-key ``groupBy`` min/max timestamp — one shuffle carrying two
   values per key;
2. ``sequence(bucket(min), bucket(max), step)`` + ``explode`` builds the
   grid *from the aggregate*, so grid construction shuffles keys, never
   events, and the explode is computed where the key row lives;
3. events collapse to one row per non-empty (key, bucket) — same
   partitioning as the grid join key, so with AQE the join is a plain
   co-partitioned hash join;
4. LOCF fill is the classic ``last(value, ignorenulls=True)`` running
   window per key — one sort per key partition, already shuffled by key.

Total: 3 exchanges on the same key (the grid one is per-key-rows, tiny),
no driver actions, no UDFs. Grid density is the caller's contract:
``step_seconds`` × key span must be sane (a 10-year key at 1 s steps is
3×10⁸ rows — that is what the operator *should* produce if asked).

The reference has no resampling; pandas' ``resample().ffill()`` is the
semantic model (``pw/pandas`` engines rely on pandas natively for this).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.functions.temporal import epoch_micros
from pywrangler_spark.util import ensure_iterable


def resample_locf(
    ts_column: str,
    step_seconds: int,
    groupby_columns: Union[str, Sequence[str]],
    value_column: str,
    agg: str = "last",
    output: str = "dense",
) -> Callable[[DataFrame], DataFrame]:
    """One row per (group, bucket) from each group's first to last event
    bucket; buckets with no events carry the previous bucket's value
    forward (LOCF). Use as ``df.transform(resample_locf(...))``.

    Output (``output="dense"``): groups + ``bucket_start`` (timestamp),
    ``<value_column>`` (bucket aggregate, LOCF-filled), ``n_events``
    (0 for filled rows).

    ``output="runs"``: the same information run-length encoded — one
    row per NON-EMPTY bucket: groups + ``valid_from`` / ``valid_to``
    (inclusive bucket range over which the carried value holds),
    ``<value_column>``, ``n_events`` (the opening bucket's event
    count). The dense grid is a VIEW over this
    (:func:`runs_to_dense` expands it exactly), but the runs form is
    sized by the EVENTS, not by keys × grid density — the dense
    keys×buckets grid is the operator's one linear output floor
    (80 M rows at sf10 for the hourly gate), and every consumer that
    doesn't need the explicit grid (as-of joins, change feeds,
    interval analytics) should take runs. Plan: the grid explode, the
    grid join and one exchange disappear — two hash aggregates and one
    window, all on event-sized data.

    ``agg``: how concurrent events inside one bucket collapse before the
    fill — "last" (by timestamp, ties broken arbitrarily-but-
    deterministically by value max), "sum", "avg", "min", "max".
    """
    groups = list(ensure_iterable(groupby_columns))
    if not groups:
        raise ValueError("resample_locf requires groupby_columns")
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be > 0, got {step_seconds}")
    if agg not in ("last", "sum", "avg", "min", "max"):
        raise ValueError(f"unsupported agg {agg!r}")
    if output not in ("dense", "runs"):
        raise ValueError(f"output must be 'dense' or 'runs', got {output!r}")
    step_us = int(step_seconds) * 1_000_000

    def _transform(df: DataFrame) -> DataFrame:
        bucket_us = (
            epoch_micros(ts_column) - F.pmod(epoch_micros(ts_column), step_us)
        )
        ev = df.select(
            *groups,
            bucket_us.alias("_bucket_us"),
            F.col(value_column).alias("_v"),
            epoch_micros(ts_column).alias("_ts_us"),
        )

        # one row per non-empty (group, bucket)
        if agg == "last":
            # max_by is nondeterministic under timestamp ties, and the
            # deterministic max(struct(ts, v)) form plans as a
            # SortAggregate — TWO full sorts of the raw event stream
            # (struct-typed buffers are not HashAggregate-able). Same
            # answer in two HASH aggregates instead: collapse ties
            # first (max value per distinct (group, bucket, ts) — all
            # primitive buffers), then max_by over now-UNIQUE
            # timestamps is deterministic and keeps its primitive
            # buffer, so both stages stay HashAggregate.
            ties = ev.groupBy(*groups, "_bucket_us", "_ts_us").agg(
                F.max("_v").alias("_tv"),
                F.count(F.lit(1)).alias("_tc"),
            )
            collapsed = ties.groupBy(*groups, "_bucket_us").agg(
                F.max_by("_tv", "_ts_us").alias("_bv"),
                F.sum("_tc").alias("n_events"),
            )
        else:
            collapsed = ev.groupBy(*groups, "_bucket_us").agg(
                getattr(F, agg)("_v").alias("_bv"),
                F.count(F.lit(1)).alias("n_events"),
            )

        if output == "runs":
            # run-length form: each non-empty bucket opens a run that
            # holds until the bucket before the group's next non-empty
            # bucket (the last run closes on its own bucket — the dense
            # grid ends at the group's max event bucket). A bucket whose
            # aggregate is NULL (all-NULL values) does not reset the
            # carry in dense mode (last ignorenulls), so the run VALUE
            # is the running LOCF over collapsed buckets — lead and the
            # fill share one Window exec (same partitioning + ordering).
            wo = Window.partitionBy(*groups).orderBy("_bucket_us")
            wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
            nxt = F.lead("_bucket_us").over(wo)
            return collapsed.select(
                *groups,
                F.timestamp_micros(F.col("_bucket_us")).alias("valid_from"),
                F.timestamp_micros(
                    F.coalesce(nxt - step_us, F.col("_bucket_us"))
                ).alias("valid_to"),
                F.last("_bv", ignorenulls=True).over(wrun).alias(
                    value_column
                ),
                F.col("n_events"),
            )

        # grid built from the per-key span aggregate — sequences of LONG
        # bucket indexes (sequence over timestamps would need interval
        # literals; integer steps are exact)
        span = ev.groupBy(*groups).agg(
            F.min("_bucket_us").alias("_lo"), F.max("_bucket_us").alias("_hi")
        )
        # the span table is tiny (one row per key) and its agg exchange
        # is ENSURE_REQUIREMENTS, so AQE coalesces it by BYTES — to ONE
        # partition — and then the explode below builds the ENTIRE
        # keys x buckets grid, the broadcast join, the fill window AND
        # the sink in a single task (measured: one 5.4 s task was the
        # whole query at sf1). Two traps in the fix: a hash
        # repartition(N, keys) identical to the child's partitioning is
        # ELIDED by Catalyst as redundant, and ENSURE_REQUIREMENTS
        # exchanges are always coalescible — so pin parallelism with a
        # RANGE repartition (different partitioning -> survives;
        # REPARTITION_BY_NUM -> AQE never coalesces it). Range on the
        # keys still satisfies the fill window's clustering, so no
        # further exchange downstream.
        target = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        span = span.repartitionByRange(target, *groups)
        grid = span.select(
            *groups,
            F.explode(
                # integer `div`, not float `/` + cast: double division is
                # only exact while |epoch_us| < 2^53 (same hazard the
                # parquet source documents for its NTZ normalization)
                F.sequence(
                    F.expr(f"_lo div {step_us}L"),
                    F.expr(f"_hi div {step_us}L"),
                )
            ).alias("_bidx"),
        ).select(*groups, (F.col("_bidx") * step_us).alias("_bucket_us"))

        joined = grid.join(collapsed, [*groups, "_bucket_us"], "left")
        w = (
            Window.partitionBy(*groups)
            .orderBy("_bucket_us")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return joined.select(
            *groups,
            F.timestamp_micros(F.col("_bucket_us")).alias("bucket_start"),
            F.last("_bv", ignorenulls=True).over(w).alias(value_column),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        )

    _transform.__name__ = "resample_locf"
    return _transform


def runs_to_dense(
    step_seconds: int,
    groupby_columns: Union[str, Sequence[str]],
    value_column: str,
) -> Callable[[DataFrame], DataFrame]:
    """Expand a ``resample_locf(..., output="runs")`` result into the
    dense grid — exactly the rows ``output="dense"`` would produce
    (equivalence property-tested). The explode is computed where the
    run row lives (no shuffle added); ``n_events`` lands on each run's
    opening bucket and 0 elsewhere.

    This is the "dense grid as a view" direction: store/ship runs,
    expand only at the consumer that genuinely needs one row per
    (key, bucket)."""
    groups = list(ensure_iterable(groupby_columns))
    if not groups:
        raise ValueError("runs_to_dense requires groupby_columns")
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be > 0, got {step_seconds}")
    step_us = int(step_seconds) * 1_000_000

    def _transform(runs: DataFrame) -> DataFrame:
        lo = epoch_micros("valid_from")
        hi = epoch_micros("valid_to")
        expanded = runs.select(
            *groups,
            lo.alias("_lo_us"),
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(valid_from) div {step_us}L"),
                    F.expr(f"unix_micros(valid_to) div {step_us}L"),
                )
            ).alias("_bidx"),
            F.col(value_column).alias("_rv"),
            F.col("n_events").alias("_rn"),
        )
        bucket_us = F.col("_bidx") * step_us
        return expanded.select(
            *groups,
            F.timestamp_micros(bucket_us).alias("bucket_start"),
            F.col("_rv").alias(value_column),
            F.when(bucket_us == F.col("_lo_us"), F.col("_rn"))
            .otherwise(F.lit(0))
            .alias("n_events"),
        )

    _transform.__name__ = "runs_to_dense"
    return _transform
