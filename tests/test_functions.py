"""Operator-level agreement between the Spark expressions and the pure-
Python reference model (two independent implementations — SURVEY §5.2)."""

import datetime as dt

from pyspark.sql import functions as F

from news_crawler_spark import synth
from news_crawler_spark.config import (
    BATCH_TS,
    EXCLUDE_KEYWORDS,
    INCLUDE_KEYWORDS,
    PROFILE_BY_SITE,
    PROFILES,
    SITE_ORIGIN,
)
from news_crawler_spark.functions.relevance import keyword_arrays, relevance_expr, relevance_udf_factory
from news_crawler_spark.functions.timeparse import batch_ts_lit, korean_date_key_expr, parse_time_expr
from news_crawler_spark.functions.urls import canonicalize_expr, canonicalize_udf_factory
from news_crawler_spark.reference_model import canonicalize, parse_time, relevance


def test_canonicalize_native_and_udf_match_oracle(spark):
    rows = []
    for p in PROFILES:
        for art in range(40):
            for occ in range(4):
                rows.append((synth.raw_href(p.site, art, occ), SITE_ORIGIN[p.site],
                             p.strip_query, p.site))
            iraw = synth.img_raw(p.site, art)
            if iraw:
                rows.append((iraw, SITE_ORIGIN[p.site], False, p.site))
    df = spark.createDataFrame(rows, "href string, origin string, strip_query boolean, site string")
    udf = canonicalize_udf_factory()
    out = df.select(
        "href", "site", "strip_query",
        canonicalize_expr(F.col("href"), F.col("origin"), F.col("strip_query")).alias("native"),
        udf(F.col("href"), F.col("origin"), F.col("strip_query")).alias("viaudf"),
    ).collect()
    assert out
    for r in out:
        exp = canonicalize(r.href, r.site, r.strip_query)
        assert r.native == exp, (r.href, r.native, exp)
        assert r.viaudf == exp, (r.href, r.viaudf, exp)


def test_time_chains_match_oracle(spark):
    rows = [(synth.make_time_str(p, a), p.time_chain) for p in PROFILES for a in range(50)]
    rows += [("soon", "t2"), ("", "t2"), ("moments ago", "t1"), ("07:65", "t1"), ("13:07", "t1"),
             ("garbage", "t4"), ("2025년 06월 01일", "t4"), ("05-01 09:30", "t3")]
    df = spark.createDataFrame(rows, "s string, chain string")
    out = df.select("s", "chain",
                    parse_time_expr(F.col("s"), F.col("chain"), batch_ts_lit()).alias("ts")).collect()
    batch = dt.datetime.strptime(BATCH_TS, "%Y-%m-%d %H:%M:%S")

    class P:
        pass

    for r in out:
        prof = P()
        prof.time_chain = r.chain
        assert r.ts == parse_time(r.s, prof, batch), (r.s, r.chain, r.ts)


def test_relevance_native_and_udf_match_oracle(spark):
    rows = []
    for p in PROFILES:
        for a in range(60):
            t = synth.make_title(p.site, a)
            if p.match_input == "title_lead":
                t = f"{t} {synth.make_lead(p.site, a)}"
            elif p.match_input == "title_summary":
                t = f"{t} {synth.make_summary(p.site, a)}"
            rows.append((t, p.relevance_variant, p.use_exclude, p.min_include, p.site))
    df = spark.createDataFrame(
        rows, "text string, variant string, use_exclude boolean, min_include int, site string"
    )
    inc, exc = keyword_arrays(INCLUDE_KEYWORDS, EXCLUDE_KEYWORDS)
    udf = relevance_udf_factory(INCLUDE_KEYWORDS, EXCLUDE_KEYWORDS)
    out = df.select(
        "text", "site",
        relevance_expr(F.col("text"), F.col("variant"), F.col("use_exclude"),
                       inc, exc, F.col("min_include")).alias("native"),
        udf(F.col("text"), F.col("variant"), F.col("use_exclude"),
            F.col("min_include")).alias("viaudf"),
    ).collect()
    for r in out:
        exp = relevance(r.text, PROFILE_BY_SITE[r.site])
        assert bool(r.native) == exp, (r.text, r.site)
        assert bool(r.viaudf) == exp, (r.text, r.site)


def test_korean_date_key(spark):
    # T7: 2025-06-14 is a Saturday → 토요일 (reference day-name map,
    # Daum_crawler.py:24-32)
    df = spark.createDataFrame([("2025-06-14 10:00:00",)], "s string")
    out = df.select(korean_date_key_expr(F.col("s").cast("timestamp")).alias("k")).first()
    assert out.k == "2025년 06월 14일 토요일"


def test_canonicalize_edge_cases(spark):
    """Adversarial hrefs within the supported grammar (no ports/userinfo/
    percent-encoding — SURVEY U4 notes the profile-parameterized scope):
    both implementations must agree with the urllib oracle on each."""
    cases = [
        "",                                            # empty → reject
        "javascript:void(0)",                          # U1
        "JAVASCRIPT:alert(1)",                         # U1, case-insensitive
        "/a/b",                                        # relative
        "//H.EXample.COM/x",                           # scheme-relative, mixed case
        "HTTP://h.example.com./x?b=&a=1#f",            # blank value, trailing dot
        "https://h.example.com/x?a=1&a=2&b=3",         # duplicate keys
        "https://h.example.com/x?utm_source=a&utm=b&ref=c&refresh=d&a=9",
        "https://h.example.com/x?&&a=1&&",             # empty segments
        "https://h.example.com/x#only-fragment",
        "https://h.example.com/x?#",                   # empty query+fragment
        "https://h.example.com...../x",                # many trailing dots in host
        "https://h.example.com/x?A=1&a=1",             # case-distinct keys
    ]
    origin = "https://base.example.com"
    df = spark.createDataFrame([(c,) for c in cases], "href string")
    udf = canonicalize_udf_factory()
    out = df.select(
        "href",
        canonicalize_expr(F.col("href"), F.lit(origin), F.lit(False)).alias("native"),
        udf(F.col("href"), F.lit(origin), F.lit(False)).alias("viaudf"),
    ).collect()
    from news_crawler_spark.config import PROFILES

    site = PROFILES[0].site  # origin_of(site) differs from `origin`, so
    # compute the oracle with an explicit-origin variant:
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    def oracle(h):
        if not h or "javascript" in h.lower():
            return None
        if h.startswith("//"):
            h = "https:" + h
        elif not h.lower().startswith("http"):
            h = origin + h
        p = urlsplit(h)
        kept = [
            (k, v) for k, v in parse_qsl(p.query, keep_blank_values=True)
            if not any(k.lower().startswith(t) or k.lower() == t.rstrip("_")
                       for t in ("utm_", "ref"))
        ]
        kept.sort()
        return urlunsplit((p.scheme.lower(), p.netloc.lower().rstrip("."),
                           p.path, urlencode(kept), ""))

    for r in out:
        exp = oracle(r.href)
        assert r.native == exp, (r.href, r.native, exp)
        assert r.viaudf == exp, (r.href, r.viaudf, exp)


# ---------------------------------------------------------------- D4 fuzz.ratio

def test_indel_ratio_pins_fuzz_ratio_values():
    """Pin fuzz.ratio semantics (Google_Crawler.py:58-63): normalized
    indel similarity, NOT difflib.SequenceMatcher. Values verified
    against published rapidfuzz fuzz.ratio outputs."""
    from news_crawler_spark.operators.fuzzy import indel_ratio

    assert indel_ratio("abcd", "bcde") == 75.0           # LCS=3 → (8-2)/8
    assert indel_ratio("", "") == 100.0
    assert indel_ratio("abc", "") == 0.0
    assert indel_ratio("kitten", "kitten") == 100.0
    assert round(indel_ratio("this is a test", "this is a test!"), 2) == 96.55
    assert round(indel_ratio("hello world", "world hello"), 2) == 45.45  # LCS=5
    # SequenceMatcher would give a DIFFERENT number here (contiguous-block
    # recursion under-counts): the indel/LCS formulation is the pinned one
    assert round(indel_ratio("abcbdab", "bdcaba"), 4) == round(200 * 4 / 13, 4)


def test_engine_and_model_fuzz_ratio_agree():
    """Two independent implementations (LCS DP vs insert/delete DP) of
    the same public definition must agree exactly."""
    import random

    from news_crawler_spark.operators.fuzzy import indel_ratio
    from news_crawler_spark.reference_model import _fuzz_ratio

    rng = random.Random(7)
    alpha = "ab가나 x"
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        assert abs(indel_ratio(a, b) - _fuzz_ratio(a, b)) < 1e-9, (a, b)
