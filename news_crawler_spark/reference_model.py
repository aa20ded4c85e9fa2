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
import difflib
import hashlib
import re
from dataclasses import dataclass, field

from .config import (
    BATCH_TS,
    EXCLUDE_KEYWORDS,
    INCLUDE_KEYWORDS,
    SiteProfile,
    origin_of,
    profile_of,
)
from .synth import DISALLOW_PREFIX

TRACKING_PARAMS = ("utm_", "ref")
FUZZY_THRESHOLD = 60.0


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

ITEM_RE = re.compile(
    r'<item pos="(\d+)" href="([^"]*)" title="([^"]*)" lead="([^"]*)"'
    r' time="([^"]*)" img="([^"]*)"/>'
)
ARTICLE_RE = re.compile(
    r'<article title="([^"]*)" time="([^"]*)" summary="([^"]*)" img="([^"]*)"/>'
)


def parse_listing(content: bytes, charset: str) -> list[dict]:
    text = content.decode(charset)
    out = []
    for m in ITEM_RE.finditer(text):
        out.append(
            {
                "dom_pos": int(m.group(1)),
                "href": m.group(2),
                "title": m.group(3),
                "lead": m.group(4),
                "time_str": m.group(5),
                "img": m.group(6),
            }
        )
    return out


def parse_article(content: bytes, charset: str) -> dict:
    m = ARTICLE_RE.search(content.decode(charset))
    if not m:
        return {}
    return {
        "title": m.group(1),
        "time_str": m.group(2),
        "summary": m.group(3),
        "img": m.group(4),
    }


# ------------------------------------------------------------- relevance

_WORD_RE = re.compile(r"\b\w+\b")


def relevance(text: str, prof: SiteProfile) -> bool:
    """R1-R4 (SURVEY §2.5)."""
    low = text.lower()
    inc, exc = INCLUDE_KEYWORDS, EXCLUDE_KEYWORDS
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
            listing = corpus.get(f"{seed['url']}?page={page}")
            items = (
                parse_listing(listing["content"], listing["charset"])
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
        detail = parse_article(page_row["content"], page_row["charset"])

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
        detail = parse_article(page_row["content"], page_row["charset"])

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
            if difflib.SequenceMatcher(None, norm, prev).ratio() * 100 >= FUZZY_THRESHOLD:
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
    g.meta[did] = {"site": site, "ts": ts, "url_canon": url_c}
    return True
