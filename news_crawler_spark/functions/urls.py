"""URL canonicalization — SURVEY.md §2.3 (U1-U6).

Reference semantics (file:line into /root/reference/):
  U1 javascript reject   Daum_crawler.py:89-90
  U2 relative→absolute   Naver_Crawler.py:117, FnNews_Crawler.py:60-61, ...
  U3 scheme completion   YNA_Crawler.py:90
  U4 query/fragment норm Nate_Crawler.py:85-86, YNA_Crawler.py:91-92
  U5 host normalize      Google_Crawler.py:191
  U6 img absolutize      FNToday_Crawler.py:92-93, Gukje_Crawler.py:80-81

Two implementations of the same canonical form (lowercase scheme+host,
trailing-dot host collapse, tracking-param strip, param sort, fragment
strip — the north rule's definition):

* ``canonicalize_expr`` — pure native Spark SQL (parse_url + higher-order
  functions). JVM-side, whole-stage-codegen-friendly; the pipeline's hot
  path. Caveat vs urllib: no percent-decoding and param sort compares
  the joined ``k=v`` string (identical whenever keys contain no char
  ordered between '=' and the key charset — true for this corpus; the
  agreement is asserted in tests over the full synth href distribution).
* ``canonicalize_udf_factory`` — vectorized Arrow/pandas UDF with exact
  urllib parse_qsl/urlencode semantics (the parity oracle's machinery).

Both are profile-parameterized by ``strip_query`` (only Nate/YNA strip
queries — Nate_Crawler.py:85-86) and per-site ``origin``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAMS = ("utm_", "ref")


def absolutize_expr(href: Column, origin: Column) -> Column:
    """U1-U3: reject javascript:/empty, complete scheme-relative and
    relative hrefs. Returns NULL for rejected hrefs."""
    return (
        F.when(href.isNull() | (href == "") | F.lower(href).contains("javascript"), F.lit(None))
        .when(href.startswith("//"), F.concat(F.lit("https:"), href))
        .when(~F.lower(href).startswith("http"), F.concat(origin, href))
        .otherwise(href)
    )


def _kept_params(query: Column) -> Column:
    """Split query, drop blanks + tracking params, normalize bare keys to
    ``k=`` (urlencode-of-parse_qsl equivalence), sort."""
    parts = F.filter(F.split(query, "&"), lambda x: x != "")
    kept = F.filter(
        parts,
        lambda x: ~(
            F.lower(F.substring_index(x, "=", 1)).startswith("utm_")
            | (F.lower(F.substring_index(x, "=", 1)) == "utm")
            | F.lower(F.substring_index(x, "=", 1)).startswith("ref")
        ),
    )
    normed = F.transform(kept, lambda x: F.when(x.contains("="), x).otherwise(F.concat(x, F.lit("="))))
    return F.array_sort(normed)


def canonicalize_expr(href: Column, origin: Column, strip_query: Column) -> Column:
    """Native canonicalizer: returns the canonical URL or NULL (rejected).

    ``strip_query`` is a boolean Column (per-site profile flag) so one
    expression serves every site in the same DataFrame.
    """
    url = absolutize_expr(href, origin)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    # java.net.URI (parse_url) rejects some hosts urllib tolerates (e.g.
    # consecutive trailing dots) — fall back to a netloc regex, matching
    # urllib's everything-up-to-/?# behavior
    netloc_fallback = F.nullif(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1), F.lit("")
    )
    host = F.lower(F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("HOST")), netloc_fallback, F.lit("")), r"\.+$", ""
    ))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    qraw = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    qkept = F.array_join(_kept_params(qraw), "&")
    query = F.when(strip_query, F.lit("")).otherwise(qkept)
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(url.isNull(), F.lit(None)).otherwise(out)


def canonicalize_udf_factory():
    """Arrow/pandas UDF with exact urllib semantics (U1-U5).

    Signature: (href, origin, strip_query) -> url_canon (NULL = reject).
    Used by parity tests as the independent cross-check of
    ``canonicalize_expr``; per-element Python runs inside Arrow batches
    (SURVEY §2.10 allows this for U4's param normalization).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def canonicalize_udf(href: pd.Series, origin: pd.Series, strip_query: pd.Series) -> pd.Series:
        from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

        def one(h, o, sq):
            if h is None or not h or "javascript" in h.lower():
                return None
            if h.startswith("//"):
                h = "https:" + h
            elif not h.lower().startswith("http"):
                h = o + h
            parts = urlsplit(h)
            scheme = parts.scheme.lower()
            host = parts.netloc.lower().rstrip(".")
            if sq:
                q = ""
            else:
                kept = [
                    (k, v)
                    for k, v in parse_qsl(parts.query, keep_blank_values=True)
                    if not any(
                        k.lower().startswith(t) or k.lower() == t.rstrip("_")
                        for t in TRACKING_PARAMS
                    )
                ]
                kept.sort()
                q = urlencode(kept)
            return urlunsplit((scheme, host, parts.path, q, ""))

        return pd.Series([one(h, o, s) for h, o, s in zip(href, origin, strip_query)], dtype=object)

    return canonicalize_udf
