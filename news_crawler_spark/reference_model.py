"""Pure-Python sequential reference model (the parity oracle).

Faithful re-expression of the reference crawlers' semantics
(SURVEY.md §2: P1-P4, U1-U6, D1-D4, R1-R4, T1-T8, A6) per site
profile, run over the replayed fetch corpus. Produces the golden
``(doc_id, spans)`` sequences, the golden crawl order, and the final
URL-seen set that the Spark engine must match exactly.

Global order definition (SURVEY §3.4): batch-major —
``(page, seed_index, dom_pos)``. Per site this projects to the
reference's submission order (page asc, dom asc); across sites the
interleave is our deterministic definition (the reference runs sites
as concurrent cron processes, C4, with no global order of its own).

Implementation notes: this module deliberately uses *different*
machinery from the Spark engine (urllib.parse, datetime.strptime,
row-at-a-time loops) so the parity tests compare two independent
implementations of the same semantics.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import re
from dataclasses import dataclass, field

from . import config
from .config import (
    BATCH_TS,
    SiteProfile,
    origin_of,
    profile_of,
)
from .synth import DISALLOW_PREFIX

TRACKING_PARAMS = ("utm_", "ref")
FUZZY_THRESHOLD = 35.0  # Google_Crawler.py:62 — fuzz.ratio >= 35


def _fuzz_ratio(a: str, b: str) -> float:
    """fuzz.ratio = normalized indel similarity (Google_Crawler.py:58-63
    gates with rapidfuzz/fuzzywuzzy ratio). Computed here as a direct
    insertion/deletion edit-distance DP — deliberately a different
    formulation from the engine's LCS-based one (operators/fuzzy.py) so
    the parity tests compare independent implementations."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    prev = list(range(lb + 1))  # dist(a[:0], b[:j]) = j inserts
    for i in range(1, la + 1):
        cur = [i]
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur.append(prev[j - 1])
            else:
                cur.append(1 + min(prev[j], cur[j - 1]))  # delete / insert
        prev = cur
    return 100.0 * (1.0 - prev[lb] / (la + lb))


def doc_id_of(url_canon: str) -> str:
    return hashlib.md5(url_canon.encode()).hexdigest()


# ------------------------------------------------------------- canonicalize

def canonicalize(href: str, site: str, strip_query: bool) -> str | None:
    """Reference semantics of U1-U5 (urllib-based; the engine's pandas-UDF
    canonicalizer must agree byte-for-byte)."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    if not href or "javascript" in href.lower():
        return None  # U1 (case-insensitive — a mixed-case javascript: link
        # would otherwise origin-prefix into an invalid-authority URL)
    if href.startswith("//"):
        href = "https:" + href  # U3
    elif not href.lower().startswith("http"):
        # case-insensitive: synth emits uppercase 'HTTPS://HOST' hrefs (U4
        # scheme-lowercasing coverage); they are absolute, not relative
        href = origin_of(site) + href  # U2
    parts = urlsplit(href)
    scheme = parts.scheme.lower()
    host = parts.netloc.lower().rstrip(".")  # U5 trailing-dot collapse
    if strip_query:
        query = ""
    else:
        kept = [
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not any(k.lower().startswith(t) or k.lower() == t.rstrip("_") for t in TRACKING_PARAMS)
        ]
        kept.sort()
        query = urlencode(kept)
    return urlunsplit((scheme, host, parts.path, query, ""))  # fragment stripped


# ------------------------------------------------------------- parsing
#
# Independent per-site extraction over the raw HTML: where the engine
# builds a DOM and runs CSS selectors (operators/htmlsel.py +
# selectors.py), the model splits pages on the item-container markup and
# regexes the fields out — different machinery, same semantics, so the
# parity tests compare two implementations of P1-P3, not one with
# itself. Patterns are locked to the synthetic templates (synth.py),
# which in turn mirror the reference sites' DOM.

import html as _htmlmod
from urllib.parse import unquote as _unquote

_WSRUN = re.compile(r"[ \t\r\f\v]+")
_NLTRIM = re.compile(r"[ \t]*\n[ \t]*")


def _norm(s: str) -> str:
    return _NLTRIM.sub("\n", _WSRUN.sub(" ", s)).strip()


def _clean(s: str | None) -> str:
    return _norm(_htmlmod.unescape(s)) if s is not None else ""


def _first(pat: str, text: str, g: int = 1) -> str | None:
    m = re.search(pat, text, re.S)
    return m.group(g) if m else None


def _fld(pat: str, piece: str) -> str:
    return _clean(_first(pat, piece))


def _listing_pieces(text: str, marker: str) -> list[str]:
    """Item blocks: everything after each container-open marker up to the
    next one. Decoy header markup lands in the discarded prefix."""
    return text.split(marker)[1:]


def _extract_daum(url: str, text: str) -> list[dict]:
    if "/breaking/" in url:
        pieces = _listing_pieces(text, '<div class="item_newsheadline2">')
        timepat = r'<span class="txt_info">([^<]*)</span>'
    else:
        pieces = _listing_pieces(text, '<li class="item_news2">')
        timepat = r'<span class="info_time">([^<]*)</span>'
    out = []
    for p in pieces:
        m = re.search(r'<a class="link_txt" href="([^"]*)" data-title="([^"]*)">([^<]*)</a>', p)
        if not m:
            continue
        # inline text, else urldecoded data-title (Daum_crawler.py:95-100)
        title = _clean(m.group(3)) or _unquote(m.group(2))
        out.append({
            "href": _htmlmod.unescape(m.group(1)), "title": title, "lead": "",
            "time_str": _fld(timepat, p),
            "img": _fld(r'<img class="thumb_g" src="([^"]*)">', p),
        })
    return out


def _extract_google(url: str, text: str) -> list[dict]:
    out = []
    if '<div class="NiLAwe">' in text:
        for p in _listing_pieces(text, '<div class="NiLAwe">'):
            m = re.search(r'<a href="([^"]*)"><h4>([^<]*)</h4></a>', p)
            if not m:
                continue
            out.append({
                "href": _htmlmod.unescape(m.group(1)), "title": _clean(m.group(2)),
                "lead": "", "time_str": _fld(r'<time datetime="([^"]*)"', p),
                "img": _fld(r'<img src="([^"]*)">', p),
            })
        return out
    for p in _listing_pieces(text, "<article>"):
        href = _first(r'<a href="([^"]*)">', p)
        if href is None:
            continue
        title = (
            _first(r"<h3><a[^>]*>([^<]*)</a></h3>", p)
            or _first(r"<h4><a[^>]*>([^<]*)</a></h4>", p)
            or _first(r"<a[^>]*>([^<]*)</a>", p)
        )
        out.append({
            "href": _htmlmod.unescape(href), "title": _clean(title), "lead": "",
            "time_str": _fld(r'<time datetime="([^"]*)"', p),
            "img": _fld(r'<img src="([^"]*)">', p),
        })
    return out


def _extract_fntoday(url: str, text: str) -> list[dict]:
    out = []
    for p in _listing_pieces(text, '<div class="list-block">'):
        m = re.search(r'<div class="list-titles"><a href="([^"]*)">(.*?)</a></div>', p, re.S)
        if not m:
            continue
        title = _clean(re.sub(r"</?strong>", "", m.group(2)))
        out.append({
            "href": _htmlmod.unescape(m.group(1)), "title": title, "lead": "",
            "time_str": _fld(r'<div class="list-dated">([^<]*)</div>', p),
            "img": _fld(r'<img src="([^"]*)">', p),
        })
    return out


def _extract_gukje(url: str, text: str) -> list[dict]:
    out = []
    for p in _listing_pieces(text, '<li class="gk_item">'):
        m = re.search(r'<h4 class="titles"><a href="([^"]*)">([^<]*)</a></h4>', p)
        if not m:
            continue
        ems = re.findall(r"<em>([^<]*)</em>", p)
        out.append({
            "href": _htmlmod.unescape(m.group(1)), "title": _clean(m.group(2)), "lead": "",
            # third em of the byline (Gukje_Crawler.py:60-79)
            "time_str": _clean(ems[2]) if len(ems) >= 3 else "",
            "img": _fld(r'<img src="([^"]*)">', p),
        })
    return out


_SIMPLE_LISTING = {
    "naver": ('<li class="sa_item">',
              r'<a class="sa_text_title" href="([^"]*)">([^<]*)</a>',
              r'<span class="sa_time">([^<]*)</span>', None),
    "fnnews": ('<div class="wrap_txt">',
               r'<strong class="tit_thumb"><a href="([^"]*)">([^<]*)</a></strong>',
               r'<span class="caption">([^<]*)</span>', None),
    "nate": ('<div class="mlt01">',
             r'<a class="lt1" href="([^"]*)"><h2 class="tit">([^<]*)</h2></a>',
             r'<span class="medium"><em>([^<]*)</em></span>', None),
    "skydaily": ('<div class="picarticle">',
                 r'<a href="([^"]*)">([^<]*)</a>',
                 r'<span class="date">([^<]*)</span>', None),
    "voa": ('<div class="media-block">',
            r'<a href="([^"]*)"><h4 class="media-block__title">([^<]*)</h4></a>',
            r'<span class="date">([^<]*)</span>', None),
    "yna": ('<li class="yna_item">',
            r'<span class="title01"><a class="tit-news" href="([^"]*)">([^<]*)</a></span>',
            r'<span class="txt-time">([^<]*)</span>',
            r'<p class="lead">([^<]*)</p>'),
}


def _extract_simple(site: str, text: str) -> list[dict]:
    marker, atpat, timepat, leadpat = _SIMPLE_LISTING[site]
    out = []
    for p in _listing_pieces(text, marker):
        m = re.search(atpat, p)
        if not m:
            continue
        out.append({
            "href": _htmlmod.unescape(m.group(1)), "title": _clean(m.group(2)),
            "lead": _fld(leadpat, p) if leadpat else "",
            "time_str": _fld(timepat, p),
            "img": _fld(r'<img src="([^"]*)">', p),
        })
    return out


def parse_listing(content: bytes, charset: str, site: str, url: str) -> list[dict]:
    from .config import base_site

    text = content.decode(charset)
    base = base_site(site)
    if base == "daum":
        items = _extract_daum(url, text)
    elif base == "google":
        items = _extract_google(url, text)
    elif base == "fntoday":
        items = _extract_fntoday(url, text)
    elif base == "gukje":
        items = _extract_gukje(url, text)
    else:
        items = _extract_simple(base, text)
    for pos, it in enumerate(items):
        it["dom_pos"] = pos
    return items


_ARTICLE_FIELDS = {
    "daum": (r'<h3 class="tit_view">([^<]*)</h3>', r'<span class="num_date">([^<]*)</span>',
             r'<strong class="summary_view">([^<]*)</strong>', None),
    "naver": (r'<h2 class="media_end_head_headline">([^<]*)</h2>',
              r'data-date-time="([^"]*)"',
              r'<div class="media_end_summary">(.*?)</div>',
              r'<img id="img1" data-src="([^"]*)">'),
    "skydaily": (r'<h1 class="title">([^<]*)</h1>', r'<span class="data01">([^<]*)</span>',
                 r'<div class="article_txt">([^<]*)</div>', None),
    "voa": (r'<h1 class="pg-title">([^<]*)</h1>', r'<span class="date">([^<]*)</span>',
            r'<p class="perex">([^<]*)</p>', r'<div class="img"><img src="([^"]*)">'),
}
_ARTICLE_GENERIC = (r'<h1 class="art-title">([^<]*)</h1>', r'<span class="art-time">([^<]*)</span>',
                    r'<div class="art-summary">([^<]*)</div>', None)


def parse_article(content: bytes, charset: str, site: str) -> dict:
    from .config import base_site

    text = content.decode(charset)
    base = base_site(site)
    tpat, tmpat, spat, ipat = _ARTICLE_FIELDS.get(base, _ARTICLE_GENERIC)
    summary_raw = _first(spat, text)
    if summary_raw is not None:
        summary = _clean(re.sub(r"<br\s*/?>", "\n", summary_raw))
    else:
        summary = ""
    if ipat is None:
        # og:image → thumbnail fallback (daum) / plain img (others)
        img = (_first(r'<meta property="og:image" content="([^"]*)">', text)
               or _first(r'<img alt="thumbnail" src="([^"]*)">', text)
               or _first(r'<img src="([^"]*)">', text))
    else:
        img = _first(ipat, text)
    return {
        "title": _fld(tpat, text),
        "time_str": _fld(tmpat, text),
        "summary": summary,
        "img": _htmlmod.unescape(img) if img else "",
    }


# ------------------------------------------------------------- relevance

_WORD_RE = re.compile(r"\b\w+\b")


def relevance(text: str, prof: SiteProfile) -> bool:
    """R1-R4 (SURVEY §2.5)."""
    low = text.lower()
    inc, exc = config.INCLUDE_KEYWORDS, config.EXCLUDE_KEYWORDS
    need = min(prof.min_include, len(inc)) if inc else 0
    if prof.relevance_variant == "substring":
        n = sum(1 for k in inc if k in low)
        excl_hit = any(k in low for k in exc)
    elif prof.relevance_variant == "wordset":
        words = set(_WORD_RE.findall(low))
        n = sum(1 for k in inc if k in words)
        excl_hit = any(k in words for k in exc)
    else:  # regex: substring include + word-set exclude
        n = sum(1 for k in inc if re.search(re.escape(k), low))
        words = set(_WORD_RE.findall(low))
        excl_hit = any(k in words for k in exc)
    if prof.use_exclude and excl_hit:
        return False
    return n >= need


# ------------------------------------------------------------- time chains

def parse_time(time_str: str, prof: SiteProfile, batch_ts: dt.datetime) -> dt.datetime | None:
    """T1-T5 fallback chains (SURVEY §2.6); None → T8 drop."""
    s = (time_str or "").strip()
    chain = prof.time_chain

    def try_fmt(v: str, fmt: str) -> dt.datetime | None:
        try:
            return dt.datetime.strptime(v, fmt)
        except ValueError:
            return None

    if chain == "t1":  # full → today+HH:MM → batch_ts
        t = try_fmt(s, "%Y.%m.%d. %H:%M:%S")
        if t is None:
            t2 = try_fmt(s, "%H:%M")
            if t2 is not None:
                t = batch_ts.replace(hour=t2.hour, minute=t2.minute, second=0, microsecond=0)
        return t if t is not None else batch_ts
    if chain == "t2":
        return try_fmt(s, "%Y.%m.%d %H:%M")
    if chain == "t2p":
        tail = s.split("|")[-1].strip()
        return try_fmt(tail, "%Y-%m-%d %H:%M")
    if chain == "t3":  # MM-DD HH:MM with year injection, else full
        if re.fullmatch(r"\d{2}-\d{2} \d{2}:\d{2}", s):
            return try_fmt(f"{batch_ts.year:04d}-{s}", "%Y-%m-%d %H:%M")
        return try_fmt(s, "%Y.%m.%d %H:%M")
    if chain == "t4":
        t = try_fmt(s, "%Y.%m.%d %H:%M") or try_fmt(s, "%Y.%m.%d")
        if t is None:
            m = re.fullmatch(r"(\d{4})년 (\d{2})월 (\d{2})일", s)
            if m:
                t = dt.datetime(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        return t
    if chain == "t5":  # ISO Z → KST (+9h), stored naive-KST
        t = try_fmt(s, "%Y-%m-%dT%H:%M:%SZ")
        return t + dt.timedelta(hours=9) if t is not None else None
    raise ValueError(chain)


# ------------------------------------------------------------- spans

def assemble_spans(title: str, summary: str, img_canon: str) -> list[tuple]:
    """P4 span assembly: ordered (kind, text, media_ref, offset)."""
    spans = [("title", title, "", 0)]
    off = 1
    if summary:
        spans.append(("summary", summary, "", off))
        off += 1
    if img_canon:
        spans.append(("image", "", img_canon, off))
    return spans


# ------------------------------------------------------------- the model

@dataclass
class GoldenRun:
    docs: dict[str, list[tuple]] = field(default_factory=dict)   # doc_id -> spans
    order: list[str] = field(default_factory=list)               # url_canon in crawl order
    seen: set[str] = field(default_factory=set)
    meta: dict[str, dict] = field(default_factory=dict)          # doc_id -> {site, ts, url}


def run_reference_model(world: dict, batch_ts_str: str = BATCH_TS) -> GoldenRun:
    corpus = {r["url_canon"]: r for r in world["corpus"]}
    batch_ts = dt.datetime.strptime(batch_ts_str, "%Y-%m-%d %H:%M:%S")
    g = GoldenRun()
    fuzzy_accepted: dict[str, list[str]] = {}  # site -> normalized accepted titles

    seeds = sorted(world["seeds"], key=lambda s: s["seed_index"])
    active = {s["seed_index"]: True for s in seeds}
    page = 0
    while any(active.values()):
        page += 1
        for seed in seeds:
            si = seed["seed_index"]
            if not active[si]:
                continue
            prof = profile_of(seed["site"])
            if prof.max_pages and page > prof.max_pages:
                active[si] = False
                continue
            listing_url = f"{seed['url']}?page={page}"
            listing = corpus.get(listing_url)
            items = (
                parse_listing(listing["content"], listing["charset"], seed["site"], listing_url)
                if listing and listing["http_status"] == 200
                else []
            )
            accepted = 0
            for it in sorted(items, key=lambda x: x["dom_pos"]):
                if _process_item(it, seed, prof, corpus, batch_ts, g, fuzzy_accepted):
                    accepted += 1
            if not items or (accepted == 0 and prof.stop_on_empty):
                active[si] = False
    return g


def _process_item(it, seed, prof: SiteProfile, corpus, batch_ts, g: GoldenRun, fuzzy_accepted) -> bool:
    site = seed["site"]
    url_c = canonicalize(it["href"], site, prof.strip_query)
    if url_c is None:
        return False
    from urllib.parse import urlsplit

    if urlsplit(url_c).path.startswith(DISALLOW_PREFIX):
        return False  # robots (C7; engine-added policy, part of the golden model)
    if url_c in g.seen:
        return False  # D1/D2

    detail: dict = {}
    if prof.detail_before_filter:
        page_row = corpus.get(url_c)
        if not page_row or page_row["http_status"] != 200:
            return False  # C5 failure → drop
        detail = parse_article(page_row["content"], page_row["charset"], site)

    match_text = it["title"]
    if prof.match_input == "title_lead":
        match_text = f"{it['title']} {it['lead']}"
    elif prof.match_input == "title_summary":
        match_text = f"{it['title']} {detail.get('summary', '')}"
    if not relevance(match_text, prof):
        return False

    if not prof.detail_before_filter and prof.time_source == "article":
        page_row = corpus.get(url_c)
        if not page_row or page_row["http_status"] != 200:
            return False
        detail = parse_article(page_row["content"], page_row["charset"], site)

    time_str = detail.get("time_str") if prof.time_source == "article" else it["time_str"]
    ts = parse_time(time_str or "", prof, batch_ts)
    if ts is None:
        return False  # T8
    if prof.freshness_days and ts < batch_ts - dt.timedelta(days=prof.freshness_days):
        return False  # T6

    if prof.fuzzy_dedup:  # D4: sequential, vs titles accepted this run
        norm = re.sub(r"\s+", "", it["title"].lower())
        acc = fuzzy_accepted.setdefault(site, [])
        for prev in acc:
            if _fuzz_ratio(norm, prev) >= FUZZY_THRESHOLD:
                return False
        acc.append(norm)

    summary = detail.get("summary", "") if detail else ""
    img_raw_v = (detail.get("img") or it["img"]) if detail else it["img"]
    img_canon = canonicalize(img_raw_v, site, False) if img_raw_v else ""
    spans = assemble_spans(it["title"], summary, img_canon or "")

    g.seen.add(url_c)
    g.order.append(url_c)
    did = doc_id_of(url_c)
    g.docs[did] = spans
    g.meta[did] = {"site": site, "ts": ts, "url_canon": url_c,
                   "original_url": it["href"]}
    return True


# --------------------------------------------------------------- archive render

_KOR_DAYS_MON0 = ["월요일", "화요일", "수요일", "목요일", "금요일", "토요일", "일요일"]


def render_archive_json(g) -> dict[str, str]:
    """Site → exact file content of the reference's nested news_json
    archive (``[{date, articles:[...]}]`` per site, json.dump
    ensure_ascii=False indent=2 — Naver_Crawler.py:137-157; record key
    order title/time/img/url/original_url/summary, Naver_Crawler.py:
    124-131). Rendered independently from the golden run (datetime +
    dict machinery, no Spark) for the byte-shape golden test."""
    import json

    order_of = {u: i for i, u in enumerate(g.order)}
    by_site: dict[str, list] = {}
    for did, spans in g.docs.items():
        meta = g.meta[did]
        title = next((s[1] for s in spans if s[0] == "title"), "")
        summary = next((s[1] for s in spans if s[0] == "summary"), "")
        img = next((s[2] for s in spans if s[0] == "image"), "")
        by_site.setdefault(meta["site"], []).append(
            (meta["ts"], order_of[meta["url_canon"]],
             {"title": title,
              "time": meta["ts"].strftime("%Y-%m-%d %H:%M:%S"),
              "img": img,
              "url": meta["url_canon"],
              "original_url": meta["original_url"],
              "summary": summary})
        )
    out: dict[str, str] = {}
    for site, rows in by_site.items():
        by_day: dict = {}
        for ts, orderi, rec in rows:
            by_day.setdefault(ts.date(), []).append((ts, orderi, rec))
        days = []
        for day in sorted(by_day):
            recs = sorted(by_day[day], key=lambda r: (-r[0].timestamp(), r[1]))
            any_ts = recs[0][0]
            key = (f"{any_ts:%Y}년 {any_ts:%m}월 {any_ts:%d}일 "
                   f"{_KOR_DAYS_MON0[any_ts.weekday()]}")
            days.append({"date": key, "articles": [r[2] for r in recs]})
        out[site] = json.dumps(days, ensure_ascii=False, indent=2)
    return out
