"""HTML→columns parse operators — SURVEY.md §2.2 (P1-P3).

The reference parses row-at-a-time with BeautifulSoup per site selector
(P1 selectors, e.g. Naver_Crawler.py:109, Gukje_Crawler.py:103). Here a
page is one row of the replayed corpus and parsing is ``mapInPandas``:
Arrow batches of pages in, a from-scratch selector engine
(``operators/htmlsel.py``) applies the site's extraction profile
(``selectors.py`` — container selector + per-field fallback chains),
one output row per extracted item (a UDTF-shaped 1→N operator).
``dom_pos`` is the document order of container matches, so downstream
crawl order is deterministic (SURVEY §3.4) — no dependence on task
scheduling.

HTML parsing is the sanctioned Python-in-UDF slot (SURVEY §2.10): the
work is inherently per-page tree construction, exactly what the
reference spends its time on — but batched through Arrow and spread
across executors, never on the driver.

Charset handling is part of the data model (SkyDaily forces EUC-KR,
SkyDaily_Crawler.py:70,146; Google sniffs ``apparent_encoding``,
Google_Crawler.py:155): ``content`` is binary + ``charset`` column;
decode happens here, with a declared-charset → UTF-8 → Latin-1 fallback
chain standing in for encoding sniffing on replayed bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..config import base_site
from ..selectors import extract_article_fields, extract_listing_items
from .htmlsel import parse_html

LISTING_OUT_SCHEMA = (
    "url_canon string, site string, seed_index int, page int, "
    "dom_pos int, href string, title string, lead string, time_str string, img string"
)
ARTICLE_OUT_SCHEMA = (
    "url_canon string, a_status int, d_title string, d_time_str string, "
    "d_summary string, d_img string"
)


def _decode(content: bytes | None, charset: str | None) -> str:
    """Declared charset first (the corpus carries it), then the sniffing
    fallbacks a real fetcher needs (Google_Crawler.py:155)."""
    if not content:
        return ""
    for cs in (charset or "utf-8", "utf-8", "latin-1"):
        try:
            return content.decode(cs)
        except (UnicodeDecodeError, LookupError):
            continue
    return ""


def parse_listing(pages: DataFrame) -> DataFrame:
    """P1/P2: corpus listing pages → one row per item element.

    Input columns: url_canon, site, seed_index, page, content, charset.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows: list[tuple] = []
            for url, site, seed_index, page, content, charset in zip(
                pdf["url_canon"], pdf["site"], pdf["seed_index"], pdf["page"],
                pdf["content"], pdf["charset"],
            ):
                root = parse_html(_decode(content, charset))
                for item in extract_listing_items(base_site(site), url, root):
                    rows.append(
                        (url, site, seed_index, page, item["dom_pos"], item["href"],
                         item["title"], item["lead"], item["time_str"], item["img"])
                    )
            out = pd.DataFrame(
                rows,
                columns=["url_canon", "site", "seed_index", "page", "dom_pos",
                         "href", "title", "lead", "time_str", "img"],
            )
            for c in ("seed_index", "page", "dom_pos"):
                out[c] = out[c].astype("int32")
            yield out

    cols = ["url_canon", "site", "seed_index", "page", "content", "charset"]
    return pages.select(*cols).mapInPandas(gen, schema=LISTING_OUT_SCHEMA)


def parse_article(pages: DataFrame) -> DataFrame:
    """P3: corpus article pages → one detail row per page, carrying
    http_status so the caller needs a single join (C5 failure routing:
    non-200 pages keep NULL fields and are rejected downstream).

    Input columns: url_canon, site, http_status, content, charset.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows: list[tuple] = []
            for url, site, status, content, charset in zip(
                pdf["url_canon"], pdf["site"], pdf["http_status"],
                pdf["content"], pdf["charset"],
            ):
                if status != 200:
                    rows.append((url, int(status), None, None, None, None))
                    continue
                f = extract_article_fields(base_site(site), parse_html(_decode(content, charset)))
                rows.append(
                    (url, int(status), f["d_title"], f["d_time_str"],
                     f["d_summary"], f["d_img"])
                )
            yield pd.DataFrame(
                rows,
                columns=["url_canon", "a_status", "d_title", "d_time_str",
                         "d_summary", "d_img"],
            )

    return pages.select("url_canon", "site", "http_status", "content", "charset").mapInPandas(
        gen, schema=ARTICLE_OUT_SCHEMA
    )
