"""HTML→columns parse operators — SURVEY.md §2.2 (P1-P3).

The reference parses row-at-a-time with BeautifulSoup per site selector
(P1 selectors, e.g. Naver_Crawler.py:109, Gukje_Crawler.py:103). Here a
page is one row of the replayed corpus and parsing is ``mapInPandas``:
Arrow batches in, vectorized pandas ``str.extractall`` over the decoded
markup, one output row per extracted item (a UDTF-shaped 1→N operator).
``dom_pos`` comes from the markup itself so downstream crawl order is
deterministic (SURVEY §3.4) — no dependence on task scheduling.

Charset handling is part of the data model (SkyDaily forces EUC-KR,
SkyDaily_Crawler.py:70,146): ``content`` is binary + ``charset`` column,
decode happens here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Matches the synthetic wire format (synth.listing_content). A real
# deployment swaps this for selectolax per site profile; the operator
# shape (mapInPandas, 1 page → N item rows) is the same.
LISTING_PAT = (
    r'<item pos="(?P<dom_pos>\d+)" href="(?P<href>[^"]*)" title="(?P<title>[^"]*)"'
    r' lead="(?P<lead>[^"]*)" time="(?P<time_str>[^"]*)" img="(?P<img>[^"]*)"/>'
)
ARTICLE_PAT = (
    r'<article title="(?P<d_title>[^"]*)" time="(?P<d_time_str>[^"]*)"'
    r' summary="(?P<d_summary>[^"]*)" img="(?P<d_img>[^"]*)"/>'
)

LISTING_OUT_SCHEMA = (
    "url_canon string, site string, seed_index int, page int, "
    "dom_pos int, href string, title string, lead string, time_str string, img string"
)
ARTICLE_OUT_SCHEMA = (
    "url_canon string, a_status int, d_title string, d_time_str string, "
    "d_summary string, d_img string"
)


def _decode(content: pd.Series, charset: pd.Series) -> pd.Series:
    # Two charsets in the corpus; decode per distinct charset (vector-ish:
    # one pass per charset value, not per row).
    out = pd.Series("", index=content.index, dtype=object)
    for cs in charset.dropna().unique():
        m = charset == cs
        out.loc[m] = content.loc[m].map(lambda b, _cs=cs: b.decode(_cs) if b is not None else "")
    return out


def parse_listing(pages: DataFrame) -> DataFrame:
    """P1/P2: corpus listing pages → one row per item element.

    Input columns: url_canon, site, seed_index, page, content, charset.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            text = _decode(pdf["content"], pdf["charset"])
            hits = text.str.extractall(LISTING_PAT)
            if hits.empty:
                continue
            hits = hits.reset_index(level=1, drop=True)
            meta = pdf[["url_canon", "site", "seed_index", "page"]]
            out = meta.join(hits, how="inner")
            out["dom_pos"] = out["dom_pos"].astype("int32")
            yield out.reset_index(drop=True)

    cols = ["url_canon", "site", "seed_index", "page", "content", "charset"]
    return pages.select(*cols).mapInPandas(gen, schema=LISTING_OUT_SCHEMA)


def parse_article(pages: DataFrame) -> DataFrame:
    """P3: corpus article pages → one detail row per page, carrying
    http_status so the caller needs a single join (C5 failure routing:
    non-200 pages keep NULL fields and are rejected downstream).

    Input columns: url_canon, http_status, content, charset.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ok = pdf["http_status"] == 200
            text = _decode(pdf.loc[ok, "content"], pdf.loc[ok, "charset"])
            hits = text.str.extract(ARTICLE_PAT) if ok.any() else pd.DataFrame()
            out = pdf[["url_canon", "http_status"]].rename(
                columns={"http_status": "a_status"}
            ).reset_index(drop=True)
            hits = hits.reindex(pdf.index).reset_index(drop=True)
            for c in ("d_title", "d_time_str", "d_summary", "d_img"):
                out[c] = hits[c] if c in hits else None
            # pages whose markup has no <article> element yield NULL fields
            yield out

    return pages.select("url_canon", "http_status", "content", "charset").mapInPandas(
        gen, schema=ARTICLE_OUT_SCHEMA
    )
