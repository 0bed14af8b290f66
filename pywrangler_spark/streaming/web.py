"""Streaming web hygiene — the incremental analog of ``functions.web``.

HTML-to-text extraction and URL canonicalization are pure scan-side
projections (step-table regexp chains, ``functions/web.py``): a
document's cleaning depends on nothing but the document, so the
streaming twins are STATELESS — no state store, no watermark, append
mode, chaining freely before stateful stages (dedup signatures, caps).
This is the cheapest class of streaming operator; the functions are
shared verbatim with the batch queries, so streamed-vs-batch
equivalence is structural, and pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.web import (
    canonicalize_url,
    registrable_domain,
    strip_html,
    url_host,
)


def stream_webclean(
    html_column: str,
    output_column: str = "clean_text",
) -> Callable[[DataFrame], DataFrame]:
    """Replace/add ``output_column`` with the plain text extracted from
    ``html_column`` (script/style/comment blocks and tags removed, the
    ubiquitous entities decoded, whitespace collapsed) on a streaming —
    or batch, the projection is engine-mode-agnostic — DataFrame.

    ``sdf.transform(stream_webclean("raw_html"))``
    """

    def _transform(sdf: DataFrame) -> DataFrame:
        return sdf.withColumn(
            output_column, strip_html(F.col(html_column))
        )

    _transform.__name__ = "stream_webclean"
    return _transform


def stream_url_canonicalize(
    url_column: str,
    canonical_column: str = "canonical_url",
    host_column: str = "host",
    domain_column: str = "domain",
) -> Callable[[DataFrame], DataFrame]:
    """Add canonical URL, host, and registrable domain columns — the
    provenance triple a crawl pipeline feeds into per-domain caps and
    mixing — to a streaming (or batch) DataFrame.

    ``sdf.transform(stream_url_canonicalize("url"))``
    """

    def _transform(sdf: DataFrame) -> DataFrame:
        out = sdf.withColumn(
            canonical_column, canonicalize_url(F.col(url_column))
        ).withColumn(host_column, url_host(F.col(canonical_column)))
        return out.withColumn(
            domain_column, registrable_domain(F.col(host_column))
        )

    _transform.__name__ = "stream_url_canonicalize"
    return _transform
