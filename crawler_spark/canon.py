"""URL canonicalization — reference semantics, two aligned implementations.

Reference behavior (``dom.clj:358-369`` + link predicate ``dom.clj:315-345``):
resolve relative hrefs against the page URL, HTML-unescape, strip the
fragment, drop ``javascript:`` (and similarly non-fetchable) schemes.

Two implementations, locked together by ``tests/test_canon.py``:

* :func:`canonicalize_expr` — a pure Spark **Column expression** (regexp /
  string built-ins). Runs inside whole-stage codegen; zero Python on the
  hot path, which is what survives a 10^10-link epoch.
* :func:`canonicalize` — plain Python, used by the sequential oracle.

Both apply the identical step list, so crawl-order parity cannot drift on
canonicalization. A row-at-a-time ``urllib`` round-trip is deliberately NOT
used anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNESCAPES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]
_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*:"
_ABS_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
# scheme://authority, path — authority lowercased, default :80/:443 stripped
_URL_PARTS_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^#]*)$"

NON_FETCHABLE_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "ftp:")


def canonicalize_expr(href: Column, base_url: Column) -> Column:
    """JVM-side canonicalization; NULL for non-fetchable hrefs.

    Column-expression mirror of :func:`canonicalize` — keep the two in
    lockstep (tests assert equality on the fixture matrix).
    """
    h = href
    for src, dst in _UNESCAPES:
        h = F.replace(h, F.lit(src), F.lit(dst))
    h = F.regexp_replace(h, "#.*$", "")  # strip fragment

    lower_h = F.lower(h)
    non_fetchable = F.lit(False)
    for scheme in NON_FETCHABLE_SCHEMES:
        non_fetchable = non_fetchable | lower_h.startswith(scheme)

    origin = F.regexp_extract(base_url, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    base_dir = F.regexp_extract(base_url, "^(.*/)", 1)
    scheme_of_base = F.regexp_extract(base_url, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)

    absolute = (
        F.when(h.rlike(_ABS_RE), h)
        .when(h.startswith("//"), F.concat(scheme_of_base, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(base_dir, h))
    )

    scheme = F.lower(F.regexp_extract(absolute, _URL_PARTS_RE, 1))
    authority = F.lower(F.regexp_extract(absolute, _URL_PARTS_RE, 2))
    authority = F.regexp_replace(authority, ":(80|443)$", "")
    path = F.regexp_extract(absolute, _URL_PARTS_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    rebuilt = F.concat(scheme, F.lit("://"), authority, path)
    return (
        F.when(non_fetchable | (h == "") | h.isNull(), F.lit(None))
        .when(scheme == "", F.lit(None))  # unparseable after resolution
        .otherwise(rebuilt)
    )


def host_of_expr(url: Column) -> Column:
    """Authority component of a canonical URL (for same-host predicate P5,
    ``dom.clj:353``, and host-keyed politeness partitioning)."""
    return F.regexp_extract(url, _URL_PARTS_RE, 2)


def canonicalize(href: str | None, base_url: str) -> str | None:
    """Oracle-side canonicalization — same step list as the Column version."""
    import re

    if href is None:
        return None
    h = href
    for src, dst in _UNESCAPES:
        h = h.replace(src, dst)
    h = re.sub("#.*$", "", h)
    if h == "":
        return None
    lower_h = h.lower()
    if any(lower_h.startswith(s) for s in NON_FETCHABLE_SCHEMES):
        return None

    m = re.match("^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", base_url)
    origin = m.group(1) if m else ""
    m = re.match("^(.*/)", base_url)
    base_dir = m.group(1) if m else ""
    m = re.match("^([a-zA-Z][a-zA-Z0-9+.-]*):", base_url)
    scheme_of_base = m.group(1) if m else ""

    if re.match(_ABS_RE, h):
        absolute = h
    elif h.startswith("//"):
        absolute = scheme_of_base + ":" + h
    elif h.startswith("/"):
        absolute = origin + h
    else:
        absolute = base_dir + h

    m = re.match(_URL_PARTS_RE, absolute)
    if not m:
        return None
    scheme = m.group(1).lower()
    authority = re.sub(":(80|443)$", "", m.group(2).lower())
    path = m.group(3) or "/"
    if path == "":
        path = "/"
    return f"{scheme}://{authority}{path}"


def host_of(url: str) -> str:
    import re

    m = re.match(_URL_PARTS_RE, url)
    return m.group(2) if m else ""
