"""Deterministic sampling & dataset splits — reproducible at any scale.

Training pipelines need sampling that is (a) stable across reruns,
cluster sizes, and engines, and (b) expressible as a filter so it
composes with pushdown. ``rand()`` is none of these (per-task RNG state,
changes under retries/repartition). Everything here derives from the
md5-based cross-engine hash family (``functions.hashing``):

- ``hash_split``: train/val/test assignment by hashed-id bucket — a per
  ROW map-side expression, no shuffle, no state. The same row lands in
  the same split on any engine, forever; changing ``seed`` re-rolls.
- ``stratified_exact_sample``: EXACTLY ceil(fraction x |stratum|) rows
  per stratum, chosen by hash order — one window per stratum (single
  shuffle on the strata keys). Exactness costs that shuffle; when
  approximate is fine, filter on the hash bucket instead (the
  ``hash_split`` pattern) and skip the window entirely.

Reference parity: the reference has no sampling operators; these cover
the reproducible-split/sample slots of a training-data pipeline.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.functions.hashing import hash56
from pywrangler_spark.util import ensure_iterable

_BUCKETS = 10_000


def _bucket(id_column: str, seed: Union[int, str]) -> Column:
    """Uniform bucket in [0, 10000): md5-derived, engine-identical.
    DuckDB: ``('0x' || substr(md5(<seed> || ':' || CAST(id AS VARCHAR)),
    1, 14))::BIGINT % 10000``."""
    key = F.concat_ws(
        ":", F.lit(str(seed)), F.col(id_column).cast("string")
    )
    return F.pmod(hash56(key), F.lit(_BUCKETS))


def hash_split(
    id_column: str,
    splits: Mapping[str, float],
    seed: Union[int, str] = 42,
    target_column_name: str = "split",
) -> Callable[[DataFrame], DataFrame]:
    """Assign each row a split label by hashed-id bucket.

    ``splits`` maps label -> fraction (must sum to ~1); thresholds are
    cumulative in insertion order, so ``{"train": .8, "val": .1,
    "test": .1}`` puts buckets [0,8000) in train, [8000,9000) in val,
    the rest in test. Pure projection: no shuffle, survives pushdown.
    """
    if not splits:
        raise ValueError("hash_split requires at least one split")
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")

    def _transform(df: DataFrame) -> DataFrame:
        b = _bucket(id_column, seed)
        labels = list(splits)
        expr = F.lit(labels[-1])
        acc = 0.0
        cuts = []
        for name, frac in list(splits.items())[:-1]:
            acc += frac
            cuts.append((name, int(round(acc * _BUCKETS))))
        for name, cut in reversed(cuts):
            expr = F.when(b < cut, F.lit(name)).otherwise(expr)
        return df.select("*", expr.alias(target_column_name))

    _transform.__name__ = "hash_split"
    return _transform


def stratified_exact_sample(
    strata_columns: Union[str, Sequence[str]],
    fraction: float,
    id_column: str,
    seed: Union[int, str] = 42,
) -> Callable[[DataFrame], DataFrame]:
    """Exactly ``ceil(fraction x |stratum|)`` rows per stratum, selected
    by md5-hash order (deterministic, engine-identical). One shuffle on
    the strata keys; rank-limit pushdown (WindowGroupLimit) keeps the
    sort partial."""
    strata = list(ensure_iterable(strata_columns))
    if not strata:
        raise ValueError("stratified_exact_sample requires strata columns")
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")

    def _transform(df: DataFrame) -> DataFrame:
        b = _bucket(id_column, seed)
        w = Window.partitionBy(*strata).orderBy(
            b.asc(), F.col(id_column).asc()
        )
        wn = Window.partitionBy(*strata)
        ranked = df.select(
            "*",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        kept = ranked.filter(
            F.col("__rn") <= F.ceil(F.lit(float(fraction)) * F.col("__n"))
        )
        return kept.select(*df.columns)

    _transform.__name__ = "stratified_exact_sample"
    return _transform


def cap_per_key(
    key_columns: Union[str, Sequence[str]],
    max_rows: int,
    id_column: str,
    seed: Union[int, str] = 42,
) -> Callable[[DataFrame], DataFrame]:
    """Keep at most ``max_rows`` rows per key, chosen by deterministic
    md5-hash order — the per-domain/per-source cap every web-scale
    corpus applies so one hot domain cannot dominate training data.

    Hash order (not "first N by id") makes the kept subset a uniform
    pseudo-random sample of each key's rows while staying reproducible
    across engines, reruns and cluster sizes.

    Plan: one shuffle on the key columns; the rank predicate is a
    constant, so Spark plans a WindowGroupLimit — each map task keeps a
    ``max_rows`` top-heap BEFORE the exchange and the shuffle carries at
    most ``max_rows`` rows per key per task, not the full hot key. That
    (plus AQE) is what makes the zipfian 100 TB case survivable; a plain
    ``row_number <= N`` over an un-limited sort would pull every hot-key
    row through one reducer first.
    """
    keys = list(ensure_iterable(key_columns))
    if not keys:
        raise ValueError("cap_per_key requires key columns")
    if max_rows <= 0:
        raise ValueError(f"max_rows must be > 0, got {max_rows}")

    def _transform(df: DataFrame) -> DataFrame:
        b = _bucket(id_column, seed)
        w = Window.partitionBy(*keys).orderBy(
            b.asc(), F.col(id_column).asc()
        )
        return (
            df.select("*", F.row_number().over(w).alias("__rn"))
            .filter(F.col("__rn") <= max_rows)
            .select(*df.columns)
        )

    _transform.__name__ = "cap_per_key"
    return _transform
