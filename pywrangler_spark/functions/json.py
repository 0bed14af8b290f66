"""Semi-structured JSON column extraction.

Training-data tables carry metadata as JSON strings (``events.props``
here; crawl records, HTTP headers, EXIF blobs at production scale).
Two tiers, both JVM-side (no Python in the row path):

- ``extract_json``: ``from_json`` with an explicit DDL schema — the
  string is parsed ONCE per row no matter how many fields you pull out,
  and the parse sits inside whole-stage codegen. This is the scale path.
- ``json_field``: ``get_json_object`` for one ad-hoc path. Each call
  re-parses the string, so N fields cost N parses — fine for a single
  probe, wrong in a loop (use ``extract_json`` instead).

Schema-on-read note: malformed rows yield NULL fields (Spark's
``from_json`` PERMISSIVE default) — corrupt metadata never fails the
pipeline, it surfaces as NULLs you can quality-gate on.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_json(
    column: str,
    ddl_schema: str,
    prefix: str = "",
    drop: bool = False,
) -> Callable[[DataFrame], DataFrame]:
    """Parse a JSON-string column once and lift its fields to top-level
    columns (optionally ``prefix``-ed; ``drop=True`` removes the raw
    string — do this early at scale so the big blob never reaches a
    shuffle).

    ``df.transform(extract_json("props", "k INT", drop=True))``
    """

    def _transform(df: DataFrame) -> DataFrame:
        parsed = F.from_json(F.col(column), ddl_schema)
        tmp = "_json_parsed"
        out = df.withColumn(tmp, parsed)
        fields = out.schema[tmp].dataType.fieldNames()
        out = out.select(
            "*",
            *[F.col(f"{tmp}.{f}").alias(f"{prefix}{f}") for f in fields],
        ).drop(tmp)
        return out.drop(column) if drop else out

    return _transform


def json_field(column: str, path: str, cast: str | None = None) -> Column:
    """One ad-hoc JSON path probe: ``json_field("props", "$.k", "int")``.
    Re-parses the string per call — single probes only."""
    c = F.get_json_object(F.col(column), path)
    return c.cast(cast) if cast else c
