"""Keyword relevance predicate — SURVEY.md §2.5 (R1-R4), the reference's
core WHERE clause: ≥2 include-keyword matches AND no exclude match, with
three matching semantics reproduced per site profile.

Reference variants (file:line into /root/reference/):
  R1 substring        Daum_crawler.py:75-85, Google_Crawler.py:65-82
  R2 word-set         FNToday_Crawler.py:51-55, FnNews_Crawler.py:36-40,
                      Nate_Crawler.py:60-71
  R3 regex-include    Naver_Crawler.py:50-56, YNA_Crawler.py:60-68
     (re.escape'd search ≡ substring) + word-set exclude
  R4 exclude unused   Gukje_Crawler.py:45-49, SkyDaily_Crawler.py:49-55,
                      VOA_Crawler.py:45-51 (use_exclude=False profile flag)

Primary implementation is **native** higher-order functions (JVM-side:
``size(filter(kws, k -> contains(lower(text), k)))``) — with this
keyword-list size it beats any Python round-trip. A vectorized Arrow
UDF variant (pandas ``str`` ops, the Aho-Corasick slot for 10^3-keyword
configs) exists for the bench comparison; ``bench.py`` measures both.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _words_expr(low: Column) -> Column:
    r"""Tokenize like Python re.findall(r'\b\w+\b', low) — **Unicode**
    word semantics. Java-regex ``\W`` is ASCII-only, which silently
    tokenizes Hangul (the reference's actual data, FNToday_Crawler.py:
    51-55) to nothing; extracting runs of ``[\p{L}\p{N}_]`` matches
    Python's Unicode ``\w`` on the corpus vocabulary."""
    from .textstats import uwords_expr

    return F.array_distinct(uwords_expr(low))


def substring_count_expr(low: Column, kws: Column) -> Column:
    return F.size(F.filter(kws, lambda k: low.contains(k)))


def wordset_count_expr(low: Column, kws: Column) -> Column:
    return F.size(F.array_intersect(_words_expr(low), kws))


def relevance_expr(
    text: Column,
    variant: Column,
    use_exclude: Column,
    include_kws: Column,
    exclude_kws: Column,
    min_include: Column,
) -> Column:
    """Boolean accept column. All arguments are Columns so one expression
    serves every site profile in the same DataFrame; ``include_kws`` /
    ``exclude_kws`` are array<string> literals (broadcast-folded by
    Catalyst) of pre-lowercased keywords."""
    low = F.lower(text)
    words = _words_expr(low)
    n_inc = (
        F.when(variant == "wordset", F.size(F.array_intersect(words, include_kws)))
        # 'substring' and 'regex' includes are both substring semantics
        .otherwise(F.size(F.filter(include_kws, lambda k: low.contains(k))))
    )
    excl_hit = (
        F.when(variant == "substring", F.exists(exclude_kws, lambda k: low.contains(k)))
        # 'wordset' and 'regex' excludes are both word-set semantics
        .otherwise(F.arrays_overlap(words, exclude_kws))
    )
    need = F.least(min_include, F.size(include_kws))
    return (~(use_exclude & excl_hit)) & (n_inc >= need)


def keyword_arrays(include: list[str], exclude: list[str]) -> tuple[Column, Column]:
    """Pre-lowercased keyword array literals (constant-folded, effectively
    broadcast — SURVEY §4 'constant folding')."""
    inc = F.array(*[F.lit(k.lower()) for k in include])
    exc = F.array(*[F.lit(k.lower()) for k in exclude])
    return inc, exc


def relevance_udf_fast_factory(include: list[str], exclude: list[str]):
    r"""Combined-automaton Arrow UDF: ONE alternation regex per
    (list, semantics) instead of a scan per keyword — the Aho-Corasick
    slot for News_keyword.json-scale configs (486+259 terms). Exact when
    keywords don't overlap inside a match (regex findall is
    non-overlapping); the per-keyword ``relevance_udf_factory`` remains
    the reference-exact fallback. Signature: (text) -> bool with the
    variant/min baked in at build time (wordset, min_include=2)."""
    import re

    from pyspark.sql.functions import pandas_udf

    inc = sorted({k.lower() for k in include}, key=len, reverse=True)
    exc = sorted({k.lower() for k in exclude}, key=len, reverse=True)
    inc_re = re.compile(r"\b(" + "|".join(re.escape(k) for k in inc) + r")\b")
    exc_re = re.compile(r"\b(" + "|".join(re.escape(k) for k in exc) + r")\b")

    @pandas_udf("boolean")
    def relevance_fast(text: pd.Series) -> pd.Series:
        low = text.fillna("").str.lower()
        n_inc = low.str.findall(inc_re).map(lambda xs: len(set(xs)))
        has_exc = low.str.contains(exc_re)
        return (n_inc >= 2) & ~has_exc

    return relevance_fast


def relevance_profile_fast_factory(include: list[str], exclude: list[str]):
    r"""EXACT vectorized relevance for News_keyword.json-scale configs —
    the crawl's large-config path (auto-selected by run_crawl past
    ``relevance_udf_threshold`` keywords; tools/relevance_bench.py
    measures the native HOF losing ~2.5× at 486/259 terms).

    Exactness by construction (unlike a bare alternation regex, which
    undercounts when one keyword matches inside another's span at the
    same position):

    * word-set semantics: Python set intersection of Unicode word tokens
      (``\b\w+\b``) with the keyword set — exact and O(len(text)).
    * substring semantics: one longest-first alternation scan collects
      the unshadowed hits, then the (precomputed, usually tiny) set of
      keywords that occur INSIDE another keyword is re-checked with
      plain ``in`` — together exactly {k : k ⊆ text}.

    Signature matches relevance_udf_factory: (text, variant, use_exclude,
    min_include) -> bool. Site profiles mix variants per row.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    inc = [k.lower() for k in include]
    exc = [k.lower() for k in exclude]
    inc_set, exc_set = set(inc), set(exc)
    word_re = re.compile(r"\b\w+\b")

    def _alt(kws: list[str]):
        if not kws:
            return None, []
        by_len = sorted(set(kws), key=len, reverse=True)
        shadowed = [k for k in set(kws) if any(k != o and k in o for o in set(kws))]
        return re.compile("|".join(re.escape(k) for k in by_len)), shadowed

    inc_re, inc_shadowed = _alt(inc)
    exc_re, exc_shadowed = _alt(exc)
    n_inc_total, n_exc_total = len(inc_set), len(exc_set)

    def _substr_hits(low: str, rx, shadowed) -> set:
        if rx is None:
            return set()
        found = set(rx.findall(low))
        for k in shadowed:
            if k not in found and k in low:
                found.add(k)
        return found

    @pandas_udf("boolean")
    def relevance_fast(
        text: pd.Series, variant: pd.Series, use_exclude: pd.Series, min_include: pd.Series
    ) -> pd.Series:
        out = []
        for t, v, ue, mi in zip(text, variant, use_exclude, min_include):
            low = (t or "").lower()
            words = set(word_re.findall(low)) if v != "substring" else None
            if v == "wordset":
                n = len(words & inc_set) if n_inc_total else 0
            else:  # substring / regex includes are substring semantics
                n = len(_substr_hits(low, inc_re, inc_shadowed))
            if ue and n_exc_total:
                if v == "substring":
                    excl = bool(_substr_hits(low, exc_re, exc_shadowed))
                else:  # wordset + regex excludes are word-set semantics
                    if words is None:
                        words = set(word_re.findall(low))
                    excl = bool(words & exc_set)
                if excl:
                    out.append(False)
                    continue
            out.append(n >= min(int(mi), n_inc_total))
        return pd.Series(out)

    return relevance_fast


def relevance_udf_factory(include: list[str], exclude: list[str]):
    """Arrow/pandas UDF variant: vectorized pandas str.contains sweep with
    word-boundary regexes — the slot where an Aho-Corasick automaton goes
    when the keyword config reaches News_keyword.json scale (486+259).
    Signature: (text, variant, use_exclude, min_include) -> bool.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    inc = [k.lower() for k in include]
    exc = [k.lower() for k in exclude]
    inc_sub = [re.compile(re.escape(k)) for k in inc]
    exc_sub = [re.compile(re.escape(k)) for k in exc]
    inc_word = [re.compile(rf"\b{re.escape(k)}\b") for k in inc]
    exc_word = [re.compile(rf"\b{re.escape(k)}\b") for k in exc]

    @pandas_udf("boolean")
    def relevance_udf(
        text: pd.Series, variant: pd.Series, use_exclude: pd.Series, min_include: pd.Series
    ) -> pd.Series:
        low = text.fillna("").str.lower()
        is_word = variant == "wordset"
        n = pd.Series(0, index=low.index)
        for rs, rw in zip(inc_sub, inc_word):
            hit_s = low.str.contains(rs)
            hit_w = low.str.contains(rw)
            n += (is_word & hit_w) | (~is_word & hit_s)
        excl = pd.Series(False, index=low.index)
        is_substr = variant == "substring"
        for rs, rw in zip(exc_sub, exc_word):
            hit_s = low.str.contains(rs)
            hit_w = low.str.contains(rw)
            excl |= (is_substr & hit_s) | (~is_substr & hit_w)
        need = min_include.clip(upper=len(inc))
        return (~(use_exclude & excl)) & (n >= need)

    return relevance_udf
