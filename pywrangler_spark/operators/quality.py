"""Percentile-based quality gating — drop outlier rows by global
signal distribution.

The canonical corpus-cleaning step: compute quality signals (token
count, alpha ratio, ...), find global percentile cutoffs, keep rows
inside the band. Two scans of the signal frame (one tiny aggregate for
the cutoffs, broadcast back as a 1-row cross join; one filter pass) —
no window over the full corpus, no sort.

``exact=True`` uses ``F.percentile`` (single-group exact percentile:
one shuffle of the signal columns to one reducer per signal — fine to
~10⁸ rows, and required for oracle parity). At 100 TB use the default
``exact=False``: ``approx_percentile`` aggregates a bounded-memory
sketch map-side, no row movement at all.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def percentile_gate(
    bounds: Dict[str, Tuple[Optional[float], Optional[float]]],
    exact: bool = False,
    accuracy: int = 10000,
) -> Callable[[DataFrame], DataFrame]:
    """Keep rows where every listed column lies within its global
    [lower-percentile, upper-percentile] band (inclusive). ``None``
    disables that side.

    ``df.transform(percentile_gate({"n_tokens": (0.05, 0.95)}))``
    """
    if not bounds:
        raise ValueError("percentile_gate requires at least one column")
    for col, (lo, hi) in bounds.items():
        for p in (lo, hi):
            if p is not None and not 0.0 <= p <= 1.0:
                raise ValueError(f"percentile for {col!r} out of [0,1]: {p}")

    def _pct(col: str, p: float):
        if exact:
            return F.percentile(F.col(col), F.lit(p))
        return F.approx_percentile(F.col(col), F.lit(p), F.lit(accuracy))

    def _transform(df: DataFrame) -> DataFrame:
        aggs = []
        for col, (lo, hi) in bounds.items():
            if lo is not None:
                aggs.append(_pct(col, lo).alias(f"_lo_{col}"))
            if hi is not None:
                aggs.append(_pct(col, hi).alias(f"_hi_{col}"))
        cuts = df.agg(*aggs)
        out = df.crossJoin(F.broadcast(cuts))
        cond = F.lit(True)
        for col, (lo, hi) in bounds.items():
            if lo is not None:
                cond = cond & (F.col(col) >= F.col(f"_lo_{col}"))
            if hi is not None:
                cond = cond & (F.col(col) <= F.col(f"_hi_{col}"))
        return out.filter(cond).select(*df.columns)

    return _transform
