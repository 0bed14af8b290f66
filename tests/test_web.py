"""functions.web — HTML extraction and URL canonicalization edges,
plus Spark/DuckDB chain parity on adversarial strings."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.functions.web import (
    canonicalize_url,
    canonicalize_url_sql,
    registrable_domain,
    registrable_domain_sql,
    strip_html,
    strip_html_sql,
    url_host,
    url_scheme,
)


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r.o for r in df.select(col_fn(F.col("s")).alias("o")).collect()]


HTML_CASES = [
    (
        "<html><script>if (a < b) { x(); }</script><p>Hello"
        " <b>world</b></p></html>",
        "Hello world",
    ),
    ("<style>p > a {}</style>text", "text"),
    ("<!-- secret --><h1>Title</h1>", "Title"),
    ("a &amp;lt;tag&gt; b", "a &lt;tag> b"),  # &amp; decodes LAST
    ("x&nbsp;&quot;q&quot;&#39;s&#39;", 'x "q"\'s\''),
    ("no markup at all", "no markup at all"),
    ("<p>spread\n  over\t lines</p>", "spread over lines"),
    ("<SCRIPT>upper()</SCRIPT>ok", "ok"),  # (?i) on block patterns
]

URL_CASES = [
    (
        "HTTPS://WWW.Example.COM:443/a?utm_source=x&id=2&utm_medium=y",
        "https://www.example.com/a?id=2",
    ),
    ("http://Host.Net:80/", "http://host.net/"),
    ("http://host.net:8080/p#frag", "http://host.net:8080/p"),
    ("https://a.b.co.uk?gclid=z", "https://a.b.co.uk/"),
    ("  http://pad.org/x  ", "http://pad.org/x"),  # trimmed
    ("not a url", None),  # no scheme -> NULL
    ("http://x.org/?fbclid=1", "http://x.org/"),
    (
        "http://x.org/?utm_a=1&utm_b=2&keep=3",
        "http://x.org/?keep=3",
    ),
]

DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.news.co.uk", "news.co.uk"),
    ("sub.site.com.au", "site.com.au"),
    ("example.org", "example.org"),
    ("localhost", ""),
]


def test_strip_html_cases(spark):
    got = _run(spark, strip_html, [c[0] for c in HTML_CASES])
    assert got == [c[1] for c in HTML_CASES]


def test_canonicalize_url_cases(spark):
    got = _run(spark, canonicalize_url, [c[0] for c in URL_CASES])
    assert got == [c[1] for c in URL_CASES]


def test_registrable_domain_cases(spark):
    got = _run(
        spark, registrable_domain, [c[0] for c in DOMAIN_CASES]
    )
    assert got == [c[1] for c in DOMAIN_CASES]


def test_host_and_scheme(spark):
    urls = ["HTTPS://A.B.Org:8443/p?q=1", "ftp://files.net/x"]
    assert _run(spark, url_host, urls) == ["a.b.org", "files.net"]
    assert _run(spark, url_scheme, urls) == ["https", "ftp"]


def test_sql_twins_match_spark(spark):
    """The DuckDB renderings replay the identical chains."""
    con = duckdb.connect()

    def duck(sql_fn, values):
        out = []
        for v in values:
            lit = "'" + v.replace("'", "''") + "'"
            out.append(
                con.execute(f"SELECT {sql_fn(lit)}").fetchone()[0]
            )
        return out

    html_in = [c[0] for c in HTML_CASES]
    assert duck(strip_html_sql, html_in) == _run(
        spark, strip_html, html_in
    )
    url_in = [c[0] for c in URL_CASES]
    assert duck(canonicalize_url_sql, url_in) == _run(
        spark, canonicalize_url, url_in
    )
    dom_in = [c[0] for c in DOMAIN_CASES]
    assert duck(registrable_domain_sql, dom_in) == _run(
        spark, registrable_domain, dom_in
    )


def test_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",)], "s string")
    rows = df.select(
        strip_html(F.col("s")).alias("h"),
        canonicalize_url(F.col("s")).alias("u"),
    ).collect()
    assert rows[0].h is None and rows[0].u is None
    assert rows[1].h == "" and rows[1].u is None
