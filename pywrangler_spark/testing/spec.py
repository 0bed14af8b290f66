"""Pure-Python sequential reference implementations ("executable specs").

These run one group at a time, row by row, with none of the window-function
machinery of the Spark operators — a deliberately *different* algorithm so
that property-based tests comparing the two catch mistakes in either.
(Same role as the reference's pandas ``NaiveIterator``,
``pw/pandas/wranglers/interval_identifier.py:74-293``, fresh
implementation.)
"""

from __future__ import annotations

from typing import Any, List, Sequence

from pywrangler_spark.operators.interval_identifier import NO_END_MARKER, _NoEndMarker


def _safe_eq(a: Any, b: Any) -> bool:
    """Null-safe equality matching Spark's ``eqNullSafe`` for our purposes:
    None equals only None; NaN equals NaN."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float) and a != a and b != b:
        return True
    try:
        return bool(a == b)
    except TypeError:
        return False


def naive_interval_ids(
    markers: Sequence[Any],
    marker_start: Any,
    marker_end: Any = NO_END_MARKER,
    marker_start_use_first: bool = False,
    marker_end_use_first: bool = True,
    result_type: str = "enumerated",
) -> List[int]:
    """Interval ids for one ordered group, computed sequentially.

    Algorithm (independent of the Spark implementation): extract the marker
    subsequence, collapse runs of equal markers to their first/last element,
    pair alternating start→end markers into valid intervals, then label rows.
    """
    n = len(markers)
    identical = isinstance(marker_end, _NoEndMarker) or _safe_eq(
        marker_end, marker_start
    )

    if identical:
        ids, current = [], 0
        for v in markers:
            if _safe_eq(v, marker_start):
                current += 1
            ids.append(current)
        return ids

    # marker subsequence: (row index, is_start)
    seq = []
    for i, v in enumerate(markers):
        if _safe_eq(v, marker_start):
            seq.append((i, True))
        elif _safe_eq(v, marker_end):
            seq.append((i, False))

    # collapse runs of equal marker kind
    kept = []
    run: List[int] = []

    def _flush(is_start: bool) -> None:
        if not run:
            return
        use_first = marker_start_use_first if is_start else marker_end_use_first
        kept.append((run[0] if use_first else run[-1], is_start))

    prev_kind = None
    for i, is_start in seq:
        if prev_kind is not None and is_start != prev_kind:
            _flush(prev_kind)
            run = []
        run.append(i)
        prev_kind = is_start
    if prev_kind is not None:
        _flush(prev_kind)

    # pair start→end into valid intervals (kept strictly alternates)
    valid_spans = []
    open_start = None
    for i, is_start in kept:
        if is_start:
            open_start = i
        elif open_start is not None:
            valid_spans.append((open_start, i))
            open_start = None

    # raw ids: raw[i] = 1 + sum_{j<=i} kept_start[j] + sum_{j<i} kept_end[j]
    # (the first row behaves as if preceded by an interval close)
    bs = [0] * n
    be = [0] * n
    for i, is_start in kept:
        (bs if is_start else be)[i] = 1
    raw = []
    acc = 1
    for i in range(n):
        acc += bs[i] + (be[i - 1] if i > 0 else 0)
        raw.append(acc)

    in_valid = [0] * n
    for k, (s, e) in enumerate(valid_spans, start=1):
        for i in range(s, e + 1):
            in_valid[i] = k

    if result_type == "raw":
        return raw
    if result_type == "valid":
        return [raw[i] if in_valid[i] else 0 for i in range(n)]
    return in_valid  # enumerated


def naive_sessionize_gap(
    timestamps: Sequence[float], gap_seconds: float
) -> List[int]:
    """Gap sessionization for one ordered group (spec for sessionize_gap)."""
    ids, current, prev = [], 0, None
    for ts in timestamps:
        if prev is None or (ts - prev) > gap_seconds:
            current += 1
        ids.append(current)
        prev = ts
    return ids
