"""Deterministic synthetic crawl world (FIXTURES.md §2-§7).

Everything is a pure function of stable md5 hashes — no ``random``, no
wall clock — so the same world can be built row-at-a-time in the pure
Python reference model AND distributively in Spark, and a replayed run
is bit-reproducible (SURVEY §7.3: determinism is the parity enabler).

The corpus substitutes for live HTTP (SURVEY §2.1 S2/S3): listing pages
embed item blocks ``(dom_pos, href, title, lead, time_str, img)``;
article pages embed ``(title, time_attr, summary, img)``. Hrefs are
deliberately messy (relative, scheme-relative, uppercase hosts,
tracking params, fragments, javascript: links, robots-disallowed
paths) to exercise U1-U6 + C7; titles are salted with include/exclude
keywords at hash-known rates so R1-R4 selectivity is verifiable;
time strings cover the T1-T5 format chains including planted
unparseable values (T8 drop path).
"""

from __future__ import annotations

import hashlib
import math
from html import escape as _esc
from urllib.parse import quote as _urlquote

from . import config
from .config import (
    PROFILES,
    SiteProfile,
    base_site,
    host_of,
    origin_of,
    profile_of,
    virtual_sites,
)

WORDS = [
    "seoul", "global", "report", "update", "analysis", "today", "briefing",
    "policy", "outlook", "review", "notes", "daily", "focus", "watch",
    # Korean vocabulary — the reference's actual data is Korean news; these
    # exercise Unicode tokenization (ADVICE: Java-regex \W is ASCII) and
    # EUC-KR encoding (SkyDaily_Crawler.py:70,146)
    "시장동향", "분석기사", "오늘의소식", "정책브리핑", "산업현장",
    # entity-escaping coverage: '&' must survive html.escape → unescape
    "r&d",
]
# Trap words: substring-match an include/exclude keyword without being a
# whole word — distinguishes R1 (substring) from R2 (word-set) semantics.
# Korean traps: '경제학자' contains keyword '경제', '광고주' contains '광고'
# — only substring-variant sites see them (word-set tokenizes them whole).
TRAP_INCLUDE = ["aikido", "trademarks", "exported", "경제학자", "반도체주"]
TRAP_EXCLUDE = ["advertising", "광고주"]

ITEMS_PER_PAGE = 10
DISALLOW_PREFIX = "/ad/"

BASE_EPOCH_MIN = 29163600  # minutes: 2025-06-14 10:00 UTC-ish anchor


def H(*parts) -> int:
    """Stable 63-bit hash of the parts."""
    s = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 1


def world_params(scale: float) -> dict[str, int]:
    """Articles per base site: Zipf over site rank → deliberate hot-host
    skew. Virtual sites ('daum#3') inherit their base's size."""
    base = max(40, int(240 * scale))
    return {
        p.site: max(12, int(base * 2 / (rank + 1)))
        for rank, p in enumerate(PROFILES)
    }


def n_articles(site: str, sizes: dict[str, int]) -> int:
    from .config import base_site

    return sizes[base_site(site)]


def pages_per_seed(site: str, n_art: int) -> int:
    prof = profile_of(site)
    return max(2, math.ceil(n_art / (prof.n_seeds * ITEMS_PER_PAGE)))


# ---------------------------------------------------------------- URLs

def canon_url(site: str, art_id: int) -> str:
    """Ground-truth canonical URL (north-rule canonical form)."""
    base = f"{origin_of(site)}/art/{art_id}"
    if not profile_of(site).strip_query and art_id % 3 == 0:
        base += "?a=1&b=2"
    return base


def raw_href(site: str, art_id: int, occ: int) -> str:
    """A messy raw href for one occurrence of an article link.

    Variant is hash-picked per occurrence; all variants of one article
    canonicalize to ``canon_url`` (U1-U5 coverage).
    """
    h = H("href", site, art_id, occ)
    host = host_of(site)
    path = f"/art/{art_id}"
    q_real = "a=1&b=2" if (not profile_of(site).strip_query and art_id % 3 == 0) else ""
    if h % 17 == 0:
        return f"{origin_of(site)}{DISALLOW_PREFIX}{art_id}"  # robots-disallowed
    if h % 13 == 0:
        return "javascript:void(0)"  # U1 reject
    v = h % 5
    if v == 0:  # relative (U2)
        return path + (f"?{q_real}" if q_real else "")
    if v == 1:  # scheme-relative (U3)
        return f"//{host}{path}" + (f"?{q_real}" if q_real else "")
    if v == 2:  # uppercase scheme+host, tracking params, fragment (U4/U5)
        q = ("b=2&a=1&" if q_real else "") + "utm_source=feed&ref=home"
        return f"HTTPS://{host.upper()}{path}?{q}#section-{h % 7}"
    if v == 3:  # trailing fragment only
        return f"{origin_of(site)}{path}" + (f"?{q_real}" if q_real else "") + "#top"
    # clean absolute, params permuted
    q = "b=2&a=1" if q_real else ""
    return f"{origin_of(site)}{path}" + (f"?{q}" if q else "")


def listing_url(site: str, seed_local: int, page: int) -> str:
    """Daum listing URLs carry the category in the path — the engine picks
    the item selector by category substring, Daum_crawler.py:141-146."""
    if base_site(site) == "daum":
        cat = "breaking" if seed_local % 2 == 0 else "ranking"
        return f"{origin_of(site)}/{cat}/{seed_local}?page={page}"
    return f"{origin_of(site)}/list/{seed_local}?page={page}"


def img_url(site: str, art_id: int) -> str | None:
    if H("imgq", site, art_id) % 4 == 0:
        return None
    return f"{origin_of(site)}/img/{art_id}.jpg"


def img_raw(site: str, art_id: int) -> str | None:
    """Raw img src as it appears in markup — sometimes relative (U6)."""
    u = img_url(site, art_id)
    if u is None:
        return None
    if H("imgrel", site, art_id) % 3 == 0:
        return f"/img/{art_id}.jpg"
    return u


# ---------------------------------------------------------------- text

def _pick(pool: list[str], h: int, n: int) -> list[str]:
    return [pool[(h + i * 7) % len(pool)] for i in range(n)]


def make_title(site: str, art_id: int) -> str:
    h = H("title", site, art_id)
    words = _pick(WORDS, h, 3)
    n_inc = h % 4  # 0..3 include keywords
    kws = [config.INCLUDE_KEYWORDS[(h // 7 + i * 3) % len(config.INCLUDE_KEYWORDS)] for i in range(n_inc)]
    toks = [words[0], *kws[:2], words[1], *kws[2:], words[2]]
    if h % 5 == 0:
        toks.insert(1, config.EXCLUDE_KEYWORDS[(h // 11) % len(config.EXCLUDE_KEYWORDS)])
    if h % 6 == 0:
        toks.append(TRAP_INCLUDE[(h // 13) % len(TRAP_INCLUDE)])
    if h % 9 == 0:
        toks.append(TRAP_EXCLUDE[0])
    return " ".join(toks)


def make_lead(site: str, art_id: int) -> str:
    h = H("lead", site, art_id)
    toks = _pick(WORDS, h, 4)
    if h % 3 == 0:
        toks.insert(2, config.INCLUDE_KEYWORDS[(h // 5) % len(config.INCLUDE_KEYWORDS)])
    return " ".join(toks)


def make_summary(site: str, art_id: int) -> str:
    h = H("summary", site, art_id)
    toks = _pick(WORDS, h, 6)
    n_inc = h % 3
    for i in range(n_inc):
        toks.insert(1 + i, config.INCLUDE_KEYWORDS[(h // 7 + i) % len(config.INCLUDE_KEYWORDS)])
    if h % 7 == 0:
        toks.append(config.EXCLUDE_KEYWORDS[(h // 9) % len(config.EXCLUDE_KEYWORDS)])
    return " ".join(toks)


# ---------------------------------------------------------------- time

KOR_DAYS = ["월요일", "화요일", "수요일", "목요일", "금요일", "토요일", "일요일"]


def article_dt_minutes(site: str, art_id: int) -> int:
    """Article age in minutes; skewed recent (1/3 within 2 days) so the
    T6 freshness watermark keeps a verifiable fraction."""
    h = H("dt", site, art_id)
    if h % 3 == 0:
        return h % (2 * 24 * 60)
    return h % (30 * 24 * 60)


def _dt_tuple(site: str, art_id: int) -> tuple[int, int, int, int, int]:
    """(Y, M, D, h, m) — derived backwards from a fixed anchor, no calendar lib
    needed for generation; the anchor keeps everything inside 2025-05/06."""
    import datetime as _dt

    anchor = _dt.datetime(2025, 6, 14, 10, 0)
    d = anchor - _dt.timedelta(minutes=article_dt_minutes(site, art_id))
    return d.year, d.month, d.day, d.hour, d.minute


def make_time_str(prof: SiteProfile, art_id: int) -> str:
    """Render the article timestamp in the profile's wire format,
    with hash-planted garbage (T8) and format-variant fallbacks."""
    site = prof.site
    h = H("tvar", site, art_id)
    y, mo, d, hh, mm = _dt_tuple(site, art_id)
    chain = prof.time_chain
    if h % 11 == 0 and chain in ("t2", "t2p", "t3"):
        return "soon"  # unparseable → T8 drop
    if chain == "t1":  # Daum: full / time-only (today) / garbage→batch_ts
        v = h % 3
        if v == 0:
            return f"{y:04d}.{mo:02d}.{d:02d}. {hh:02d}:{mm:02d}:00"
        if v == 1:
            return f"{hh:02d}:{mm:02d}"
        return "moments ago"
    if chain == "t2":
        return f"{y:04d}.{mo:02d}.{d:02d} {hh:02d}:{mm:02d}"
    if chain == "t2p":  # FNToday: 'Reporter Kim | 2025-06-01 09:30'
        return f"Reporter {WORDS[h % len(WORDS)]} | {y:04d}-{mo:02d}-{d:02d} {hh:02d}:{mm:02d}"
    if chain == "t3":  # Nate/YNA: 'MM-DD HH:MM' (year injected) or full
        if h % 2 == 0:
            return f"{mo:02d}-{d:02d} {hh:02d}:{mm:02d}"
        return f"{y:04d}.{mo:02d}.{d:02d} {hh:02d}:{mm:02d}"
    if chain == "t4":  # SkyDaily/VOA chain incl. Korean date
        v = h % 3
        if v == 0:
            return f"{y:04d}.{mo:02d}.{d:02d} {hh:02d}:{mm:02d}"
        if v == 1:
            return f"{y:04d}.{mo:02d}.{d:02d}"
        return f"{y:04d}년 {mo:02d}월 {d:02d}일"
    if chain == "t5":  # Google: ISO-8601 Z (UTC) → engine renders KST
        return f"{y:04d}-{mo:02d}-{d:02d}T{hh:02d}:{mm:02d}:00Z"
    raise ValueError(chain)


# ---------------------------------------------------------------- pages

def listing_items(site: str, seed_local: int, page: int, n_art: int) -> list[dict]:
    items = []
    for pos in range(ITEMS_PER_PAGE):
        art_id = H("art", site, seed_local, page, pos) % n_art
        occ = H("occ", site, seed_local, page, pos)
        prof = profile_of(site)
        items.append(
            {
                "dom_pos": pos,
                "href": raw_href(site, art_id, occ),
                "title": make_title(site, art_id),
                "lead": make_lead(site, art_id) if prof.match_input == "title_lead" else "",
                "time_str": make_time_str(prof, art_id),
                "img": img_raw(site, art_id) or "",
                "art_id": art_id,
            }
        )
    return items


# ------------------------------------------------------- HTML generation
#
# Real per-site markup mirroring the reference sites' DOM structure (the
# selector programs in selectors.py are written against the *reference's*
# selectors, e.g. Naver_Crawler.py:109, Gukje_Crawler.py:103; this
# generator produces messy-but-plausible pages those selectors extract
# from). Deliberate hazards: entity-escaped text (&amp;), hash-placed
# whitespace padding inside text nodes, optional fields omitted, decoy
# header blocks sharing tags/classes with the real containers, Daum's
# urlencoded data-title fallback, Google's h3/h4/div-fallback layouts,
# and EUC-KR byte encoding for skydaily pages.

def _pad(h: int, s: str) -> str:
    """Hash-deterministic whitespace padding around text content."""
    pre = ("", "\n  ", " ")[h % 3]
    post = ("", "\n ", "  ")[(h // 3) % 3]
    return f"{pre}{s}{post}"


def _img_tag(it: dict, fmt: str) -> str:
    return fmt.format(src=_esc(it["img"], quote=True)) if it["img"] else ""


_IMG = '<img src="{src}">'


def _e(s: str) -> str:
    return _esc(s, quote=True)


def _listing_daum(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    out = []
    breaking = seed_local % 2 == 0
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        # data-title is always present (urlencoded); inline anchor text is
        # sometimes empty → engine must fall back (Daum_crawler.py:95-100)
        inline = "" if h % 4 == 0 else _pad(h, _e(it["title"]))
        a = (f'<a class="link_txt" href="{_e(it["href"])}"'
             f' data-title="{_urlquote(it["title"], safe="")}">{inline}</a>')
        img = _img_tag(it, '<img class="thumb_g" src="{src}">')
        if breaking:
            out.append(f'<div class="item_newsheadline2">\n{a}\n'
                       f'<span class="txt_info">{_pad(h >> 2, _e(it["time_str"]))}</span>\n'
                       f'{img}</div>')
        else:
            out.append(f'<li class="item_news2">{a}'
                       f'<span class="info_time">{_e(it["time_str"])}</span>{img}</li>')
    if breaking:
        return ('<div class="box_comp box_news_headline2">\n'
                + "\n".join(out) + "\n</div>")
    return '<ul class="list_news2">\n' + "\n".join(out) + "\n</ul>"


def _listing_naver(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    lis = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        lis.append(
            f'<li class="sa_item">\n'
            f'<a class="sa_text_title" href="{_e(it["href"])}">{_pad(h, _e(it["title"]))}</a>\n'
            f'<span class="sa_time">{_e(it["time_str"])}</span>\n'
            f'{_img_tag(it, _IMG)}</li>'
        )
        # Naver_Crawler.py:109: div.section_latest_article ul li
    return ('<div class="section_latest_article _PERSIST">\n<ul>\n'
            + "\n".join(lis) + "\n</ul>\n</div>")


def _listing_google(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    # page-level fallback layout (Google_Crawler.py:163-166): some pages
    # render div.NiLAwe cards instead of <article> elements
    fallback = H("glayout", site, seed_local, page) % 5 == 0
    out = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        t = _pad(h, _e(it["title"]))
        tm = f'<time datetime="{_e(it["time_str"])}">{(h % 9)} hours ago</time>'
        img = _img_tag(it, '<figure><img src="{src}"></figure>')
        if fallback:
            out.append(f'<div class="NiLAwe"><a href="{_e(it["href"])}"><h4>{t}</h4></a>'
                       f'{tm}{img}</div>')
        elif h % 3 == 0:  # h4 variant (Google_Crawler.py:197-201)
            out.append(f'<article>\n<h4><a href="{_e(it["href"])}">{t}</a></h4>\n{tm}\n'
                       f'{img}</article>')
        elif h % 7 == 0:  # bare-anchor variant → third fallback step
            out.append(f'<article>\n<a href="{_e(it["href"])}">{t}</a>\n{tm}\n{img}</article>')
        else:
            out.append(f'<article>\n<h3><a href="{_e(it["href"])}">{t}</a></h3>\n{tm}\n'
                       f'{img}</article>')
    return "<main>\n" + "\n".join(out) + "\n</main>"


def _listing_fntoday(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    out = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        inner = (f"<strong>{_pad(h, _e(it['title']))}</strong>"
                 if h % 4 != 0 else _pad(h, _e(it["title"])))
        out.append(
            f'<div class="list-block">\n'
            f'<div class="list-titles"><a href="{_e(it["href"])}">{inner}</a></div>\n'
            f'<div class="list-dated">{_e(it["time_str"])}</div>\n'
            f'{_img_tag(it, _IMG)}</div>'
        )
    return "\n".join(out)


def _listing_fnnews(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    out = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        out.append(
            f'<div class="wrap_txt">\n'
            f'<strong class="tit_thumb"><a href="{_e(it["href"])}">'
            f'{_pad(h, _e(it["title"]))}</a></strong>\n'
            f'<span class="caption">{_e(it["time_str"])}</span>\n'
            f'{_img_tag(it, _IMG)}</div>'
        )
    return "\n".join(out)


def _listing_gukje(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    lis = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        writer = WORDS[h % len(WORDS)]
        lis.append(
            f'<li class="gk_item">\n'
            f'<h4 class="titles"><a href="{_e(it["href"])}">{_pad(h, _e(it["title"]))}</a></h4>\n'
            # timestamp is the THIRD em (span.byline em:nth-of-type(3),
            # Gukje_Crawler.py:60-79)
            f'<span class="byline"><em>{_e(writer)}</em><em>국제신문</em>'
            f'<em>{_e(it["time_str"])}</em></span>\n'
            f'{_img_tag(it, _IMG)}</li>'
        )
    return '<ul class="type2">\n' + "\n".join(lis) + "\n</ul>"


def _listing_nate(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    out = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        out.append(
            f'<div class="mlt01">\n'
            f'<a class="lt1" href="{_e(it["href"])}"><h2 class="tit">'
            f'{_pad(h, _e(it["title"]))}</h2></a>\n'
            f'<span class="medium"><em>{_e(it["time_str"])}</em></span>\n'
            f'{_img_tag(it, _IMG)}</div>'
        )
    return "\n".join(out)


def _listing_skydaily(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    out = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        out.append(
            f'<div class="picarticle">\n'
            f'<a href="{_e(it["href"])}">{_pad(h, _e(it["title"]))}</a>\n'
            f'<span class="date">{_e(it["time_str"])}</span>\n'
            f'{_img_tag(it, _IMG)}</div>'
        )
    return "\n".join(out)


def _listing_voa(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    out = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        out.append(
            f'<div class="media-block">\n'
            f'<a href="{_e(it["href"])}"><h4 class="media-block__title">'
            f'{_pad(h, _e(it["title"]))}</h4></a>\n'
            f'<span class="date">{_e(it["time_str"])}</span>\n'
            f'<div class="thumb">{_img_tag(it, _IMG)}</div></div>'
        )
    return "\n".join(out)


def _listing_yna(site: str, seed_local: int, page: int, items: list[dict]) -> str:
    lis = []
    for it in items:
        h = H("lay", site, seed_local, page, it["dom_pos"])
        lis.append(
            f'<li class="yna_item">\n'
            f'<span class="title01"><a class="tit-news" href="{_e(it["href"])}">'
            f'{_pad(h, _e(it["title"]))}</a></span>\n'
            f'<p class="lead">{_pad(h >> 2, _e(it["lead"]))}</p>\n'
            f'<span class="txt-time">{_e(it["time_str"])}</span>\n'
            f'{_img_tag(it, _IMG)}</li>'
        )
    return '<ul class="list01">\n' + "\n".join(lis) + "\n</ul>"


_LISTING_BUILDERS = {
    "daum": _listing_daum,
    "naver": _listing_naver,
    "google": _listing_google,
    "fntoday": _listing_fntoday,
    "fnnews": _listing_fnnews,
    "gukje": _listing_gukje,
    "nate": _listing_nate,
    "skydaily": _listing_skydaily,
    "voa": _listing_voa,
    "yna": _listing_yna,
}

# Decoy header region: shares tags and class *names* with real item
# containers but never the full container chain — a parser that matches
# on tag alone (or class alone) extracts garbage and fails parity.
_DECOY = (
    '<div class="gnb"><a href="/">home</a> <a href="/login">login</a></div>\n'
    '<div class="section_ranking"><div><a class="sa_text_title" href="/rank/1">'
    "인기 기사</a></div></div>\n"
    '<div class="box_comp"><div class="item_news_decoy">'
    '<a class="link_txt" href="/notice/1">notice</a></div></div>\n'
    "<!-- layout: generated -->"
)


def listing_content(site: str, seed_local: int, page: int, n_art: int) -> str:
    prof = profile_of(site)
    items = listing_items(site, seed_local, page, n_art)
    body = _LISTING_BUILDERS[base_site(site)](site, seed_local, page, items)
    return (
        f'<html><head><meta charset="{prof.charset}">'
        f"<title>{_e(site)} · p{page}</title></head>\n<body>\n{_DECOY}\n"
        f"{body}\n"
        f'<div class="footer">(c) {_e(site)}</div>\n</body></html>'
    )


def article_status(site: str, art_id: int) -> int:
    h = H("status", site, art_id)
    if h % 19 == 0:
        return 500
    if h % 23 == 0:
        return 404
    return 200


def _split_summary(summary: str, h: int) -> tuple[str, str | None]:
    """Optionally split the summary for <br>-separated rendering
    (Naver_Crawler.py:90-93: <br> → newline)."""
    toks = summary.split(" ")
    if h % 2 == 0 and len(toks) >= 4:
        mid = len(toks) // 2
        return " ".join(toks[:mid]), " ".join(toks[mid:])
    return summary, None


def article_content(site: str, art_id: int) -> str:
    prof = profile_of(site)
    base = base_site(site)
    h = H("alay", site, art_id)
    title = _e(make_title(site, art_id))
    tstr = _e(make_time_str(prof, art_id))
    summary = make_summary(site, art_id)
    img = img_raw(site, art_id) or ""
    head = f'<html><head><meta charset="{prof.charset}"><title>{title}</title></head>\n<body>\n'
    foot = '\n<div class="footer">links</div>\n</body></html>'
    if base == "daum":
        # og:image meta vs thumbnail-img fallback (Daum_crawler.py:61-68)
        if not img:
            imgel = ""
        elif h % 3 == 0:
            imgel = f'<img alt="thumbnail" src="{_e(img)}">'
        else:
            imgel = f'<meta property="og:image" content="{_e(img)}">'
        return (
            f'{head}<h3 class="tit_view">{_pad(h, title)}</h3>\n'
            f'<span class="num_date">{tstr}</span>\n'
            f'<strong class="summary_view">{_pad(h >> 2, _e(summary))}</strong>\n'
            f"{imgel}{foot}"
        )
    if base == "naver":
        s1, s2 = _split_summary(summary, h)
        sm = _e(s1) + (f"<br>{_e(s2)}" if s2 is not None else "")
        imgel = f'<img id="img1" data-src="{_e(img)}">' if img else ""
        return (
            f'{head}<h2 class="media_end_head_headline">{_pad(h, title)}</h2>\n'
            f'<span class="media_end_head_info_datestamp_time _ARTICLE_DATE_TIME"'
            f' data-date-time="{tstr}">기사입력</span>\n'
            f'<div class="media_end_summary">{sm}</div>\n{imgel}{foot}'
        )
    if base == "skydaily":
        imgel = f'<img src="{_e(img)}">' if img else ""
        return (
            f'{head}<h1 class="title">{_pad(h, title)}</h1>\n'
            f'<span class="data01">{tstr}</span>\n'
            f'<div class="article_txt">{_pad(h >> 2, _e(summary))}</div>\n{imgel}{foot}'
        )
    if base == "voa":
        imgel = f'<div class="img"><img src="{_e(img)}"></div>' if img else ""
        return (
            f'{head}<h1 class="pg-title">{_pad(h, title)}</h1>\n'
            f'<span class="date">{tstr}</span>\n'
            f'<p class="perex">{_pad(h >> 2, _e(summary))}</p>\n{imgel}{foot}'
        )
    imgel = f'<img src="{_e(img)}">' if img else ""
    return (
        f'{head}<h1 class="art-title">{_pad(h, title)}</h1>\n'
        f'<span class="art-time">{tstr}</span>\n'
        f'<div class="art-summary">{_pad(h >> 2, _e(summary))}</div>\n{imgel}{foot}'
    )


# ---------------------------------------------------------------- world

def build_world(scale: float = 1.0, site_mult: int = 1) -> dict[str, list[dict]]:
    """Materialize the full world as python rows (small scales / tests).

    Returns dict with keys: corpus, seeds, robots, keywords.
    ``site_mult`` > 1 adds virtual sites (frontier breadth — the knob a
    web-scale bench turns). For bench-scale corpora use
    ``build_corpus_spark`` instead.
    """
    sizes = world_params(scale)
    corpus: list[dict] = []
    seeds: list[dict] = []
    seed_index = 0
    for site in virtual_sites(site_mult):
        prof = profile_of(site)
        n_art = n_articles(site, sizes)
        npages = pages_per_seed(site, n_art)
        for s in range(prof.n_seeds):
            seeds.append(
                {
                    "seed_index": seed_index,
                    "site": site,
                    "url": listing_url(site, s, 1).split("?")[0],
                    "max_pages": prof.max_pages,
                }
            )
            seed_index += 1
            for page in range(1, npages + 1):
                corpus.append(
                    {
                        "url_canon": listing_url(site, s, page),
                        "page_kind": "listing",
                        "site": site,
                        "content": listing_content(site, s, page, n_art).encode(prof.charset),
                        "charset": prof.charset,
                        "http_status": 200,
                        "fetch_latency_ms": 20 + H("lat", site, s, page) % 400,
                        "page": page,
                    }
                )
        for art_id in range(n_art):
            corpus.append(
                {
                    "url_canon": canon_url(site, art_id),
                    "page_kind": "article",
                    "site": site,
                    "content": article_content(site, art_id).encode(prof.charset),
                    "charset": prof.charset,
                    "http_status": article_status(site, art_id),
                    "fetch_latency_ms": 20 + H("lat2", site, art_id) % 400,
                    "page": None,
                }
            )
    for site in virtual_sites(site_mult):
        corpus.append(
            {
                "url_canon": f"{origin_of(site)}/robots.txt",
                "page_kind": "robots",
                "site": site,
                "content": robots_txt_content(site).encode(profile_of(site).charset),
                "charset": profile_of(site).charset,
                "http_status": 200,
                "fetch_latency_ms": 10,
                "page": None,
            }
        )
    robots = [
        {
            "host": host_of(site),
            "crawl_delay_s": profile_of(site).crawl_delay_s,
            "disallow_prefixes": [DISALLOW_PREFIX],
        }
        for site in virtual_sites(site_mult)
    ]
    keywords = [
        {"kind": "include", "category": "core", "keyword": k} for k in config.INCLUDE_KEYWORDS
    ] + [{"kind": "exclude", "category": "noise", "keyword": k} for k in config.EXCLUDE_KEYWORDS]
    return {"corpus": corpus, "seeds": seeds, "robots": robots, "keywords": keywords}


def build_corpus_spark(spark, scale: float, site_mult: int = 1):
    """Distributed corpus build for bench scales: the same pure functions
    applied via mapInPandas over a task-id range — no driver-side loop."""
    import pandas as pd

    sizes = world_params(scale)
    tasks = []  # (site, kind, lo, hi) article-id / page ranges
    for site in virtual_sites(site_mult):
        prof = profile_of(site)
        n_art = n_articles(site, sizes)
        npages = pages_per_seed(site, n_art)
        tasks.append((site, "robots", 0, 0, 1))
        for s in range(prof.n_seeds):
            tasks.append((site, "listing", s, 1, npages + 1))
        step = 2000
        for lo in range(0, n_art, step):
            tasks.append((site, "article", 0, lo, min(lo + step, n_art)))
    tdf = spark.createDataFrame(
        tasks, "site string, kind string, seed int, lo int, hi int"
    ).repartition(max(32, len(tasks) // 4))

    sizes_b = sizes

    def gen(it):
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                prof = profile_of(r.site)
                n_art = n_articles(r.site, sizes_b)
                if r.kind == "robots":
                    out.append(
                        (
                            f"{origin_of(r.site)}/robots.txt",
                            "robots",
                            r.site,
                            robots_txt_content(r.site).encode(prof.charset),
                            prof.charset,
                            200,
                            10,
                            None,
                        )
                    )
                elif r.kind == "listing":
                    for page in range(r.lo, r.hi):
                        out.append(
                            (
                                listing_url(r.site, r.seed, page),
                                "listing",
                                r.site,
                                listing_content(r.site, r.seed, page, n_art).encode(prof.charset),
                                prof.charset,
                                200,
                                20 + H("lat", r.site, r.seed, page) % 400,
                                page,
                            )
                        )
                else:
                    for a in range(r.lo, r.hi):
                        out.append(
                            (
                                canon_url(r.site, a),
                                "article",
                                r.site,
                                article_content(r.site, a).encode(prof.charset),
                                prof.charset,
                                article_status(r.site, a),
                                20 + H("lat2", r.site, a) % 400,
                                None,
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "url_canon", "page_kind", "site", "content",
                    "charset", "http_status", "fetch_latency_ms", "page",
                ],
            )

    from .schemas import CORPUS

    return tdf.mapInPandas(gen, schema=CORPUS)


# ----------------------------------------------- keyword config (486/259)

# News_keyword.json shape: 7 include categories / 10 exclude categories
# of Korean terms (flattened by every crawler's load_keywords(),
# Daum_crawler.py:17-23). The generated config is synthetic — same
# shape and scale, deterministic, no reference data copied.
INCLUDE_CATEGORIES = ["거시경제", "산업", "기술", "정책", "무역", "금융", "에너지"]
EXCLUDE_CATEGORIES = [
    "연예", "스포츠", "광고", "운세", "날씨", "사건사고", "게임", "여행", "쇼핑", "커뮤니티",
]
_KW_SYLLABLES = [
    "가", "경", "공", "국", "금", "기", "남", "대", "동", "무", "물", "미", "반",
    "발", "보", "부", "산", "상", "생", "서", "선", "성", "세", "소", "수", "시",
    "신", "안", "업", "역", "연", "영", "예", "외", "용", "원", "위", "유", "은",
    "이", "인", "자", "장", "재", "전", "정", "제", "조", "주", "중", "지", "차",
    "천", "체", "출", "치", "탄", "터", "통", "투", "판", "품", "한", "항", "해",
    "혁", "협", "화", "환", "회",
]
_KW_EN = ["chip", "bond", "tariff", "fund", "grid", "rate", "index", "merger",
          "equity", "battery"]


def _kw_terms(kind: str, n: int) -> list[str]:
    """n unique deterministic terms; mostly Korean 2-3-syllable compounds,
    every 9th an English term (the real config mixes scripts)."""
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    while len(out) < n:
        h = H("kwterm", kind, i)
        if i % 9 == 8:
            t = f"{_KW_EN[h % len(_KW_EN)]}{i}"
        else:
            nsyl = 2 + h % 2
            t = "".join(
                _KW_SYLLABLES[(h // (7 + 13 * j)) % len(_KW_SYLLABLES)]
                for j in range(nsyl)
            )
        i += 1
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def make_keyword_config(n_include: int = 486, n_exclude: int = 259) -> dict:
    """Deterministic News_keyword.json-shaped config at reference scale
    (486 include / 259 exclude by default)."""
    inc = _kw_terms("inc", n_include)
    exc = _kw_terms("exc", n_exclude)
    cfg = {"keywords": [], "exclude_keywords": []}
    for ci, cat in enumerate(INCLUDE_CATEGORIES):
        cfg["keywords"].append(
            {"category": cat, "items": [t for i, t in enumerate(inc)
                                        if i % len(INCLUDE_CATEGORIES) == ci]}
        )
    for ci, cat in enumerate(EXCLUDE_CATEGORIES):
        cfg["exclude_keywords"].append(
            {"category": cat, "items": [t for i, t in enumerate(exc)
                                        if i % len(EXCLUDE_CATEGORIES) == ci]}
        )
    return cfg


# ----------------------------------------------------------- robots.txt

def robots_txt_content(site: str) -> str:
    """A realistic robots.txt for one (possibly virtual) site: the
    star-group carries the profile's crawl delay and the /ad/ disallow
    the scheduler must honor; other groups and comments are noise the
    parser must ignore (C7 — the reference has no robots handling at
    all; the engine fetches and parses these from the replayed corpus)."""
    prof = profile_of(site)
    h = H("robots", site)
    lines = [f"# robots for {host_of(site)}"]
    if h % 2 == 0:  # decoy group for a different UA
        lines += ["User-agent: OtherBot", "Disallow: /", ""]
    lines += [
        "User-agent: *",
        f"Crawl-delay: {prof.crawl_delay_s}",
        f"Disallow: {DISALLOW_PREFIX}",
    ]
    if h % 3 == 0:
        lines.append("Disallow:")  # empty = allow-all, must be dropped
    if h % 5 == 0:
        lines += ["", "User-agent: NoisyBot", "Crawl-delay: 99"]
    return "\n".join(lines) + "\n"
