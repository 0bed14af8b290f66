"""Skew mitigation — salted joins and explicit hot-key isolation.

A shuffled equi-join hash-partitions both sides on the join keys; one hot
key means one straggler task holding the whole stage (and at 100 TB, an
executor OOM). Two standard remedies, composable with AQE:

- **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in this
  repo's sessions) splits oversized *sort-merge* partitions at runtime.
  It is the zero-effort path — but it only triggers for sort-merge
  joins, after a shuffle already wrote the skewed partition.
- **Salting** (this module) removes the skew *before* the shuffle: the
  large side gets a uniform random salt in ``[0, n_salts)``, the other
  side is replicated once per salt value, and the join runs on
  ``(keys..., salt)`` — the hot key's rows spread over ``n_salts``
  partitions. Cost: the replicated side's shuffle volume grows by
  ``n_salts``x, so salt the side whose *partner* is the smaller one, and
  keep ``n_salts`` near the cluster's task fan-out, not higher.

``salted_join`` salts every key uniformly (simple, predictable).
``hot_keys`` finds the keys that actually matter (approximate top-k by
frequency) so callers can split hot/cold and salt only the hot slice —
the cold slice joins normally with no replication cost.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.util import ensure_iterable

_SALT = "__salt"


def salted_join(
    right: DataFrame,
    on: Union[str, Sequence[str]],
    n_salts: int = 16,
    how: str = "inner",
    seed: Optional[int] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Equi-join on ``on`` with the LEFT side salted and the RIGHT side
    replicated ``n_salts``x. Semantically identical to
    ``left.join(right, on, how)`` for ``how`` in {inner, left}: each left
    row carries exactly one salt value and every right row exists for
    every salt, so each matching pair meets exactly once.

    Use when the left side has hot join keys and the right side is the
    (relatively) smaller one — but still too big to broadcast, which
    would otherwise be the answer.
    """
    keys = list(ensure_iterable(on))
    if not keys:
        raise ValueError("salted_join requires join keys")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")

    def _transform(left: DataFrame) -> DataFrame:
        rand = F.rand(seed) if seed is not None else F.rand()
        l = left.withColumn(
            _SALT, F.floor(rand * n_salts).cast("int")
        )
        r = right.withColumn(
            _SALT,
            F.explode(F.array(*[F.lit(s) for s in range(n_salts)])),
        )
        out = l.join(r, [*keys, _SALT], how)
        return out.drop(_SALT)

    _transform.__name__ = "salted_join"
    return _transform


def hot_keys(
    df: DataFrame,
    on: Union[str, Sequence[str]],
    top: int = 20,
    min_share: float = 0.001,
) -> List:
    """The join-key values carrying the most rows: exact count over a
    single aggregation (the agg output is |distinct keys| rows — if THAT
    is huge, no key is hot enough to matter). Returns key tuples whose
    row share exceeds ``min_share``, largest first, at most ``top``.

    Feed into a hot/cold split::

        hot = set(hot_keys(big, "k"))
        cold_part = big.filter(~F.col("k").isin(hot)).join(dim, "k")
        hot_part = big.filter(F.col("k").isin(hot)).transform(
            salted_join(dim.filter(F.col("k").isin(hot)), "k"))
        result = cold_part.unionByName(hot_part)
    """
    keys = list(ensure_iterable(on))
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), *keys)
        .limit(top)
        .collect()
    )
    cut = total * min_share
    out = []
    for r in rows:
        if r._n >= cut:
            vals = tuple(r[k] for k in keys)
            out.append(vals if len(keys) > 1 else vals[0])
    return out


def adaptive_salted_join(
    right: DataFrame,
    on: Union[str, Sequence[str]],
    n_salts: int = 16,
    how: str = "inner",
    top: int = 20,
    min_share: float = 0.001,
    seed: Optional[int] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Measure-then-salt: detect the left side's hot join keys
    (:func:`hot_keys` — two bounded fit-phase jobs: a count and a
    top-``top`` aggregation) and salt ONLY the hot slice; the cold
    slice joins plain, paying zero replication.

    This is the composition the module docstring prescribes, packaged:
    uniform salting replicates the entire right side ``n_salts``x
    through the shuffle *whether or not any key is hot* — measured at
    sf10, that turned a 6 s join into ~90 s with no skew to mitigate.
    Salting must be bought only where the skew is. With no hot keys
    this degrades to exactly ``left.join(right, on, how)``.

    Output == the plain join for ``how`` in {inner, left}, up to row
    order (hot and cold left slices are disjoint; each pair meets
    exactly once on its route).

    The detection phase re-executes the left lineage (two bounded
    jobs) before the hot/cold filters execute it again, so the left
    input must be DETERMINISTIC: a lineage containing ``rand()``,
    un-seeded sampling, or similar can disagree between the measured
    hot set and the later filters, splitting rows inconsistently (a
    row could route down both paths or neither). Cache / checkpoint
    such an input first — the operator cannot do it for you without
    pinning a 100 TB dataset. An expensive deterministic lineage is
    merely scanned twice more; cache it if that matters.
    """
    keys = list(ensure_iterable(on))
    if not keys:
        raise ValueError("adaptive_salted_join requires join keys")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    def _transform(left: DataFrame) -> DataFrame:
        hot = hot_keys(left, keys, top=top, min_share=min_share)
        if not hot:
            return left.join(right, keys, how)
        if len(keys) == 1:
            cond = F.col(keys[0]).isin(list(hot))
        else:
            cond = F.lit(False)
            for vals in hot:
                clause = F.lit(True)
                for k, v in zip(keys, vals):
                    clause = clause & F.col(k).eqNullSafe(F.lit(v))
                cond = cond | clause
        # null keys never match and isin(null) is NULL, not False —
        # coalesce routes them down the cold path (where a left join
        # still emits them, right columns null — plain-join semantics)
        cold = left.filter(F.coalesce(~cond, F.lit(True)))
        hot_left = left.filter(F.coalesce(cond, F.lit(False)))
        hot_right = right.filter(F.coalesce(cond, F.lit(False)))
        plain = cold.join(right, keys, how)
        salted = hot_left.transform(
            salted_join(hot_right, keys, n_salts=n_salts, how=how,
                        seed=seed)
        )
        return plain.unionByName(salted.select(plain.columns))

    _transform.__name__ = "adaptive_salted_join"
    return _transform


def left_join_null_bypass(
    right: DataFrame,
    on: Union[str, Sequence[str]],
) -> Callable[[DataFrame], DataFrame]:
    """LEFT equi-join that routes null-keyed left rows AROUND the
    shuffle. A null join key can never match, but a plain left join
    still hash-partitions those rows — and nulls all hash to the SAME
    partition, so a nullable key at 100 TB means one reducer holding
    every null row (the single worst skew key there is). Here the null
    slice short-circuits scan-side: it gets the right columns as typed
    NULLs and re-enters via union AFTER the join, never touching an
    exchange. Output == plain ``left.join(right, on, "left")`` up to
    row order.

    ``orders.transform(left_join_null_bypass(customer, "o_custkey"))``
    """
    keys = list(ensure_iterable(on))
    if not keys:
        raise ValueError("left_join_null_bypass requires join keys")

    def _transform(left: DataFrame) -> DataFrame:
        null_pred = F.lit(False)
        for k in keys:
            null_pred = null_pred | F.col(k).isNull()
        matched = left.where(~null_pred).join(right, keys, "left")
        bypass = left.where(null_pred)
        extra = [f for f in right.schema.fields if f.name not in left.columns]
        for f in extra:
            bypass = bypass.withColumn(
                f.name, F.lit(None).cast(f.dataType)
            )
        return matched.unionByName(bypass.select(matched.columns))

    return _transform
