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

from .config import (
    EXCLUDE_KEYWORDS,
    INCLUDE_KEYWORDS,
    PROFILES,
    SiteProfile,
    host_of,
    origin_of,
    profile_of,
    virtual_sites,
)

WORDS = [
    "seoul", "global", "report", "update", "analysis", "today", "briefing",
    "policy", "outlook", "review", "notes", "daily", "focus", "watch",
]
# Trap words: substring-match an include/exclude keyword without being a
# whole word — distinguishes R1 (substring) from R2 (word-set) semantics.
TRAP_INCLUDE = ["aikido", "trademarks", "exported"]   # contain ai / trade / export
TRAP_EXCLUDE = ["advertising"]                        # contains advert

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
    kws = [INCLUDE_KEYWORDS[(h // 7 + i * 3) % len(INCLUDE_KEYWORDS)] for i in range(n_inc)]
    toks = [words[0], *kws[:2], words[1], *kws[2:], words[2]]
    if h % 5 == 0:
        toks.insert(1, EXCLUDE_KEYWORDS[(h // 11) % len(EXCLUDE_KEYWORDS)])
    if h % 6 == 0:
        toks.append(TRAP_INCLUDE[(h // 13) % len(TRAP_INCLUDE)])
    if h % 9 == 0:
        toks.append(TRAP_EXCLUDE[0])
    return " ".join(toks)


def make_lead(site: str, art_id: int) -> str:
    h = H("lead", site, art_id)
    toks = _pick(WORDS, h, 4)
    if h % 3 == 0:
        toks.insert(2, INCLUDE_KEYWORDS[(h // 5) % len(INCLUDE_KEYWORDS)])
    return " ".join(toks)


def make_summary(site: str, art_id: int) -> str:
    h = H("summary", site, art_id)
    toks = _pick(WORDS, h, 6)
    n_inc = h % 3
    for i in range(n_inc):
        toks.insert(1 + i, INCLUDE_KEYWORDS[(h // 7 + i) % len(INCLUDE_KEYWORDS)])
    if h % 7 == 0:
        toks.append(EXCLUDE_KEYWORDS[(h // 9) % len(EXCLUDE_KEYWORDS)])
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


def listing_content(site: str, seed_local: int, page: int, n_art: int) -> str:
    rows = [f'<page site="{site}" seed="{seed_local}" page="{page}">']
    for it in listing_items(site, seed_local, page, n_art):
        rows.append(
            f'<item pos="{it["dom_pos"]}" href="{it["href"]}" title="{it["title"]}"'
            f' lead="{it["lead"]}" time="{it["time_str"]}" img="{it["img"]}"/>'
        )
    rows.append("</page>")
    return "\n".join(rows)


def article_status(site: str, art_id: int) -> int:
    h = H("status", site, art_id)
    if h % 19 == 0:
        return 500
    if h % 23 == 0:
        return 404
    return 200


def article_content(site: str, art_id: int) -> str:
    prof = profile_of(site)
    return (
        f'<article title="{make_title(site, art_id)}"'
        f' time="{make_time_str(prof, art_id)}"'
        f' summary="{make_summary(site, art_id)}"'
        f' img="{img_raw(site, art_id) or ""}"/>'
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
        {"kind": "include", "category": "core", "keyword": k} for k in INCLUDE_KEYWORDS
    ] + [{"kind": "exclude", "category": "noise", "keyword": k} for k in EXCLUDE_KEYWORDS]
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
                if r.kind == "listing":
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
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "url_canon", "page_kind", "site", "content",
                    "charset", "http_status", "fetch_latency_ms",
                ],
            )

    from .schemas import CORPUS

    return tdf.mapInPandas(gen, schema=CORPUS)
