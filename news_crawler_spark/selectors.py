"""Per-site HTML extraction profiles — SURVEY §2.2 P1/P2/P3 as config.

Each base site gets a :class:`ListingSpec` (container selector + field
rules) and an :class:`ArticleSpec`, mirroring the reference crawlers'
BeautifulSoup selector programs (citations are file:line into
/root/reference/):

* Daum picks the item selector **by category in the listing URL**
  (Daum_crawler.py:141-146) and falls back from inline anchor text to a
  URL-encoded ``data-title`` attribute (Daum_crawler.py:95-100).
* Google matches ``article`` elements with div-class fallbacks
  (Google_Crawler.py:163-166) and titles from ``h3`` → ``h4`` → anchor
  text (Google_Crawler.py:197-201).
* Gukje reads the timestamp from the third ``em`` of the byline
  (``span.byline em:nth-of-type(3)``, Gukje_Crawler.py:60-79).
* Naver article details come from attributes (``data-date-time`` on the
  datestamp span, ``data-src`` on ``img#img1``) and a ``<br>``-separated
  summary (Naver_Crawler.py:74-97).
* SkyDaily pages are EUC-KR (SkyDaily_Crawler.py:70,146) — decoding
  happens in the parse operator from the corpus ``charset`` column.

A field rule is a **fallback chain** (the reference's ``coalesce``
patterns): first step that yields a non-empty value wins.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import unquote

from .operators.htmlsel import Node, select_first


@dataclass(frozen=True)
class Step:
    """One fallback step: select ``sel`` under the item node and read
    either its normalized text (default) or attribute ``attr``;
    ``self_attr`` reads the attribute off the item node itself."""

    sel: str | None = None
    attr: str | None = None
    urldecode: bool = False

    def extract(self, item: Node) -> str | None:
        node = item if self.sel is None else select_first(item, self.sel)
        if node is None:
            return None
        val = node.attr(self.attr) if self.attr else node.text()
        if not val:
            return None
        return unquote(val) if self.urldecode else val


def first_of(item: Node, steps: tuple[Step, ...]) -> str:
    for s in steps:
        v = s.extract(item)
        if v:
            return v
    return ""


@dataclass(frozen=True)
class ListingSpec:
    """P1 container + P2 field projection for one site's listing pages.

    ``containers`` maps a URL-substring category key to the item
    selector; ``"" `` is the default (Daum_crawler.py:141-146 chooses by
    ``'breakingnews' in url``)."""

    containers: dict[str, str]
    href: tuple[Step, ...]
    title: tuple[Step, ...]
    time_str: tuple[Step, ...] = ()
    lead: tuple[Step, ...] = ()
    img: tuple[Step, ...] = ()

    def container_for(self, url: str) -> str:
        for key, sel in self.containers.items():
            if key and key in url:
                return sel
        return self.containers[""]


@dataclass(frozen=True)
class ArticleSpec:
    """P3 article-detail projection (title/time/summary/img chains)."""

    title: tuple[Step, ...] = ()
    time_str: tuple[Step, ...] = ()
    summary: tuple[Step, ...] = ()
    img: tuple[Step, ...] = ()


_A = Step  # brevity below


LISTING_SPECS: dict[str, ListingSpec] = {
    # Daum_crawler.py:141-146 (category-dependent selector),
    # :95-100 (data-title urldecode fallback)
    "daum": ListingSpec(
        containers={
            "/breaking/": "div.box_comp.box_news_headline2 div.item_newsheadline2",
            "": "ul.list_news2 li",
        },
        href=(_A("a.link_txt", attr="href"),),
        title=(_A("a.link_txt"), _A("a.link_txt", attr="data-title", urldecode=True)),
        time_str=(_A("span.txt_info"), _A("span.info_time")),
        img=(_A("img.thumb_g", attr="src"),),
    ),
    # Naver_Crawler.py:109,113-116
    "naver": ListingSpec(
        containers={"": "div.section_latest_article ul li"},
        href=(_A("a.sa_text_title", attr="href"),),
        title=(_A("a.sa_text_title"),),
        time_str=(_A("span.sa_time"),),
        img=(_A("img", attr="src"),),
    ),
    # Google_Crawler.py:163-166 (article + div fallbacks), :197-201 (h3/h4)
    "google": ListingSpec(
        containers={"": "article, div.XlKvRb, div.NiLAwe"},
        href=(_A("a", attr="href"),),
        title=(_A("h3"), _A("h4"), _A("a")),
        time_str=(_A("time", attr="datetime"),),
        img=(_A("figure img", attr="src"), _A("img", attr="src")),
    ),
    # FNToday_Crawler.py:114,68-93
    "fntoday": ListingSpec(
        containers={"": "div.list-block"},
        href=(_A("div.list-titles a", attr="href"),),
        title=(_A("div.list-titles a strong"), _A("div.list-titles a")),
        time_str=(_A("div.list-dated"),),
        img=(_A("img", attr="src"),),
    ),
    # FnNews_Crawler.py:100,50-79
    "fnnews": ListingSpec(
        containers={"": "div.wrap_txt"},
        href=(_A("strong.tit_thumb a", attr="href"),),
        title=(_A("strong.tit_thumb a"),),
        time_str=(_A("span.caption"),),
        img=(_A("img", attr="src"),),
    ),
    # Gukje_Crawler.py:103,60-81 (em:nth-of-type(3) byline timestamp)
    "gukje": ListingSpec(
        containers={"": "ul.type2 li"},
        href=(_A("h4.titles a", attr="href"),),
        title=(_A("h4.titles a"),),
        time_str=(_A("span.byline em:nth-of-type(3)"),),
        img=(_A("img", attr="src"),),
    ),
    # Nate_Crawler.py:141,73-121
    "nate": ListingSpec(
        containers={"": "div.mlt01"},
        href=(_A("a.lt1", attr="href"),),
        title=(_A("h2.tit"),),
        time_str=(_A("span.medium em"),),
        img=(_A("img", attr="src"),),
    ),
    # SkyDaily_Crawler.py:148,80-95 (EUC-KR handled by corpus charset)
    "skydaily": ListingSpec(
        containers={"": "div.picarticle"},
        href=(_A("a", attr="href"),),
        title=(_A("a"),),
        time_str=(_A("span.date"),),
        img=(_A("img", attr="src"),),
    ),
    # VOA_Crawler.py:129,76-109
    "voa": ListingSpec(
        containers={"": "div.media-block"},
        href=(_A("a", attr="href"),),
        title=(_A("h4.media-block__title"), _A("a")),
        time_str=(_A("span.date"),),
        img=(_A("div.thumb img", attr="src"), _A("img", attr="src")),
    ),
    # YNA_Crawler.py:142,79-120
    "yna": ListingSpec(
        containers={"": "ul.list01 li"},
        href=(_A("a.tit-news", attr="href"),),
        title=(_A("span.title01 a.tit-news"), _A("a.tit-news")),
        time_str=(_A("span.txt-time"),),
        lead=(_A("p.lead"),),
        img=(_A("img", attr="src"),),
    ),
}


ARTICLE_SPECS: dict[str, ArticleSpec] = {
    # Daum_crawler.py:61-68: summary_view + og:image → thumbnail img fallback
    "daum": ArticleSpec(
        title=(_A("h3.tit_view"),),
        time_str=(_A("span.num_date"),),
        summary=(_A("strong.summary_view"),),
        img=(_A('meta[property=og:image]', attr="content"), _A('img[alt=thumbnail]', attr="src")),
    ),
    # Naver_Crawler.py:74-97: data-date-time attr, <br>→\n summary, img#img1 data-src
    "naver": ArticleSpec(
        title=(_A("h2.media_end_head_headline"),),
        time_str=(_A("span._ARTICLE_DATE_TIME", attr="data-date-time"),),
        summary=(_A("div.media_end_summary"),),
        img=(_A("img#img1", attr="data-src"), _A("img#img1", attr="src")),
    ),
    # SkyDaily_Crawler.py:66-78,96-127
    "skydaily": ArticleSpec(
        title=(_A("h1.title"),),
        time_str=(_A("span.data01"),),
        summary=(_A("div.article_txt"),),
        img=(_A("img", attr="src"),),
    ),
    # VOA_Crawler.py:62-74 (p.perex)
    "voa": ArticleSpec(
        title=(_A("h1.pg-title"),),
        time_str=(_A("span.date"),),
        summary=(_A("p.perex"),),
        img=(_A("div.img img", attr="src"), _A("img", attr="src")),
    ),
}

# Sites whose details are never fetched (time_source='listing') share a
# generic article layout; the spec exists so the operator is total.
_GENERIC_ARTICLE = ArticleSpec(
    title=(_A("h1.art-title"),),
    time_str=(_A("span.art-time"),),
    summary=(_A("div.art-summary"),),
    img=(_A("img", attr="src"),),
)


def listing_spec(base: str) -> ListingSpec:
    return LISTING_SPECS[base]


def article_spec(base: str) -> ArticleSpec:
    return ARTICLE_SPECS.get(base, _GENERIC_ARTICLE)


_CAT_RE = re.compile(r"https?://[^/]+(/[^?]*)")


def extract_listing_items(base: str, url: str, root: Node) -> list[dict]:
    """Run one site's ListingSpec over a parsed listing page → ordered
    item dicts (dom_pos = document order of container matches)."""
    from .operators.htmlsel import select

    spec = listing_spec(base)
    items = []
    for pos, node in enumerate(select(root, spec.container_for(url))):
        items.append(
            {
                "dom_pos": pos,
                "href": first_of(node, spec.href),
                "title": first_of(node, spec.title),
                "lead": first_of(node, spec.lead) if spec.lead else "",
                "time_str": first_of(node, spec.time_str) if spec.time_str else "",
                "img": first_of(node, spec.img) if spec.img else "",
            }
        )
    return items


def extract_article_fields(base: str, root: Node) -> dict:
    spec = article_spec(base)
    return {
        "d_title": first_of(root, spec.title) if spec.title else "",
        "d_time_str": first_of(root, spec.time_str) if spec.time_str else "",
        "d_summary": first_of(root, spec.summary) if spec.summary else "",
        "d_img": first_of(root, spec.img) if spec.img else "",
    }
