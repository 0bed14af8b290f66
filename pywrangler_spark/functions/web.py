"""Web-corpus hygiene: HTML-to-text extraction and URL canonicalization
— the provenance/cleaning steps every web-crawl training pipeline runs
before quality filtering and dedup.

Engine parity by construction (the ``operators.redact`` recipe): every
transformation is a STEP TABLE of (kind, pattern, replacement) entries
applied in a fixed order, rendered once as a Spark ``Column`` chain and
once as a DuckDB SQL expression string, so the oracle replays the
identical algorithm. All regexes stay inside the Java-regex/RE2 common
subset: no backreferences in patterns, no capture references except the
``{1}`` placeholder (rendered ``$1`` for Spark, ``\\1`` for DuckDB),
lazy quantifiers and inline ``(?is)`` flags only.

Everything here is a scan-side projection — zero shuffle, codegen
regexps — so the 100 TB cost is exactly one pass over the text column.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- HTML -> text ----------------------------------------------------------
# Order matters: kill non-content blocks first (script/style/comments),
# then all remaining tags, then decode the common entities (&amp; LAST,
# so "&amp;lt;" decodes to the literal "&lt;" and not "<"), then
# whitespace-collapse. kind: "re" = regex replace, "lit" = literal.

_HTML_STEPS: List[Tuple[str, str, str]] = [
    ("re", r"(?is)<script\b[^>]*>.*?</script>", " "),
    ("re", r"(?is)<style\b[^>]*>.*?</style>", " "),
    ("re", r"(?s)<!--.*?-->", " "),
    ("re", r"(?s)<[^>]*>", " "),
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&amp;", "&"),
    ("re", r"\s+", " "),
]


def strip_html(col: Column) -> Column:
    """Plain text from an HTML fragment: script/style/comment blocks and
    tags removed, the 6 ubiquitous entities decoded, whitespace
    collapsed and trimmed. Not a browser — malformed nesting degrades
    gracefully to tag-stripping, which is the right behavior for corpus
    cleaning (never drop content because markup is broken)."""
    out = col
    for kind, pat, rep in _HTML_STEPS:
        if kind == "re":
            out = F.regexp_replace(out, pat, rep)
        else:
            out = F.replace(out, F.lit(pat), F.lit(rep))
    return F.trim(out)


def strip_html_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL expression over ``expr``."""
    out = expr
    for kind, pat, rep in _HTML_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        if kind == "re":
            out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
        else:
            out = f"replace({out}, '{p}', '{r}')"
    return f"trim({out})"


# ---- URL canonicalization --------------------------------------------------
# Canonical form: lowercase scheme and host, default port stripped,
# fragment dropped, tracking parameters (utm_*, fbclid, gclid) removed,
# empty path -> "/". Userinfo (user:pass@) is not handled — crawl URLs
# do not carry it; document rather than guess.

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
# everything after hostport, fragment excluded
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

# tracking-parameter removal over the path?query part; {1} keeps the
# separator that introduced the parameter, then separator debris is
# repaired and a bare trailing ? or & dropped
_REST_STEPS: List[Tuple[str, str, str]] = [
    ("re", r"([?&])(?:utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "{1}"),
    ("re", r"&&+", "&"),  # collapse runs BEFORE ?& repair ("?&&k")
    ("re", r"\?&", "?"),
    ("re", r"[?&]+$", ""),
]

# registrable domain: 3 labels when the middle one is a well-known
# second-level registry under a 2-letter ccTLD (co.uk, com.au, ...),
# else the last 2 labels. A heuristic, not the Public Suffix List —
# the PSL is a data file, not an algorithm; swap it in where exactness
# matters. Matches itself (not a dotted prefix) are required via $.
_MULTI_TLD_RE = r"([^.]+\.(?:co|com|net|org|gov|ac|edu)\.[A-Za-z][A-Za-z])$"
_TWO_LABEL_RE = r"([^.]+\.[^.]+)$"


def url_scheme(col: Column) -> Column:
    """Lowercased scheme ('' when the value is not a URL)."""
    return F.lower(F.regexp_extract(col, _SCHEME_RE, 1))


def url_host(col: Column) -> Column:
    """Lowercased host with any port stripped ('' for non-URLs)."""
    hostport = F.lower(F.regexp_extract(col, _HOSTPORT_RE, 1))
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def registrable_domain(host: Column) -> Column:
    """Registrable domain of a lowercased host (heuristic, see module
    notes): 'a.b.co.uk' -> 'b.co.uk', 'x.example.com' -> 'example.com',
    bare 'localhost' -> ''."""
    multi = F.regexp_extract(host, _MULTI_TLD_RE, 1)
    two = F.regexp_extract(host, _TWO_LABEL_RE, 1)
    return F.when(multi != "", multi).otherwise(two)


def canonicalize_url(col: Column) -> Column:
    """Canonical URL (see module notes). Non-URL inputs (no scheme)
    canonicalize to NULL so they can be filtered or routed."""
    url = F.trim(col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    # default-port strip is scheme-conditional
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, r":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    rest = F.regexp_extract(url, _REST_RE, 1)
    for kind, pat, rep in _REST_STEPS:
        rest = F.regexp_replace(rest, pat, rep.replace("{1}", "$1"))
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), hostport, rest),
    )


def canonicalize_url_sql(expr: str) -> str:
    """The identical canonicalization as a DuckDB SQL expression."""
    url = f"trim({expr})"
    scheme = f"lower(regexp_extract({url}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({url}, '{_HOSTPORT_RE}', 1))"
    hostport = (
        f"CASE WHEN {scheme} = 'http' THEN "
        f"regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN "
        f"regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    rest = f"regexp_extract({url}, '{_REST_RE}', 1)"
    for kind, pat, rep in _REST_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("{1}", "\\1").replace("'", "''")
        rest = f"regexp_replace({rest}, '{p}', '{r}', 'g')"
    rest = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    return (
        f"CASE WHEN {scheme} != '' THEN "
        f"{scheme} || '://' || {hostport} || {rest} END"
    )


def url_host_sql(expr: str) -> str:
    hostport = f"lower(regexp_extract({expr}, '{_HOSTPORT_RE}', 1))"
    return f"regexp_replace({hostport}, ':[0-9]+$', '')"


def registrable_domain_sql(host_expr: str) -> str:
    multi = f"regexp_extract({host_expr}, '{_MULTI_TLD_RE}', 1)"
    two = f"regexp_extract({host_expr}, '{_TWO_LABEL_RE}', 1)"
    return f"CASE WHEN {multi} != '' THEN {multi} ELSE {two} END"
