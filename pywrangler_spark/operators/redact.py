"""PII redaction — scrub emails, IPs, phone numbers, SSNs, and card
numbers from a text column before training-data release.

Scale shape: a chain of ``regexp_replace`` projections — JVM-side,
whole-stage-codegen'd, zero exchanges; the cost is one regex pass per
kind per row at scan time. Patterns are deliberately restricted to the
common subset of Java regex (Spark) and RE2 (DuckDB/Go): no lookarounds,
no backreferences — so the oracle replays the exact chain, and the same
patterns port to other engines.

Pattern notes (standard public recipes):

- ``email``: local@domain.tld with the usual local-part characters;
- ``ip``: dotted-quad IPv4 (word-bounded, no octet range check — a
  redactor favors recall over precision);
- ``ssn``: the 3-2-4 dashed US social security shape;
- ``card``: 13-16 digits, allowing single space/dash group separators
  (4-4-4-4 and friends);
- ``phone``: international-ish number — optional ``+``, then 7-14
  digits with optional single space/dash/dot/paren separators. Applied
  LAST so it cannot eat the more specific shapes above.

Kind order is fixed (most-specific first) regardless of the order the
caller lists kinds, so redaction output is deterministic.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern) in application order — most specific first.
# Patterns are valid in BOTH Java regex and RE2 (no lookaround).
_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("card", r"\b[0-9]{4}([ -]?[0-9]{4}){3}\b|\b[0-9]{13,16}\b"),
    ("ip", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"),
    ("phone", r"\+?\b[0-9]{1,4}([ .()-]?[0-9]{2,4}){2,4}\b"),
)
KINDS = tuple(k for k, _ in _PATTERNS)


def pii_pattern(kind: str) -> str:
    """The regex used for ``kind`` (shared with oracle construction)."""
    for k, p in _PATTERNS:
        if k == kind:
            return p
    raise ValueError(f"unknown PII kind {kind!r}; known: {KINDS}")


def redact_pii_expr(col: Column, kinds: Sequence[str] = KINDS) -> Column:
    """Column expression applying the redaction chain (fixed kind
    order). Each match becomes ``[KIND]``."""
    unknown = [k for k in kinds if k not in KINDS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; known: {KINDS}")
    out = col
    for k, pat in _PATTERNS:
        if k in kinds:
            out = F.regexp_replace(out, pat, f"[{k.upper()}]")
    return out


def redact_pii(
    text_column: str = "text",
    kinds: Sequence[str] = KINDS,
    output_column: Optional[str] = None,
    count_column: Optional[str] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Replace each PII match in ``text_column`` with ``[KIND]``.

    ``output_column`` defaults to in-place; ``count_column`` optionally
    appends the number of redacted spans (computed from the marker
    delta, still scan-side). NULL text stays NULL.
    """
    unknown = [k for k in kinds if k not in KINDS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; known: {KINDS}")
    out_col = output_column or text_column

    def _transform(df: DataFrame) -> DataFrame:
        red = redact_pii_expr(F.col(text_column), kinds)
        cols = [
            red.alias(out_col) if name == out_col else F.col(name)
            for name in df.columns
        ]
        if out_col not in df.columns:
            cols.append(red.alias(out_col))
        res = df.select(*cols)
        if count_column:
            # Count each "[KIND]" marker INDEPENDENTLY on the final
            # redacted string (length delta vs a copy with that one
            # marker removed). No marker is a substring of another, and
            # counting without successive stripping is exactly what the
            # SQL oracle does — successive stripping could splice
            # surrounding text into a later kind's marker on
            # pathological inputs and diverge. Literal "[KIND]" strings
            # already present in the source count as redactions; a
            # redaction-counter cannot distinguish them by design.
            total = F.lit(0)
            for k in KINDS:
                if k in kinds:
                    marker = f"[{k.upper()}]"
                    n = (
                        F.length(F.col(out_col))
                        - F.length(
                            F.replace(
                                F.col(out_col),
                                F.lit(marker),
                                F.lit(""),
                            )
                        )
                    ) / len(marker)
                    total = total + n
            res = res.withColumn(
                count_column,
                F.when(
                    F.col(out_col).isNull(), None
                ).otherwise(total.cast("int")),
            )
        return res

    _transform.__name__ = "redact_pii"
    return _transform
