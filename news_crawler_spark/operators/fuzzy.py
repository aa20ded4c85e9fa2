"""Sequential fuzzy-title dedup replay — SURVEY.md §2.4 D4.

Google_Crawler.py:59-63,231-238 rejects an article when its
whitespace-stripped lowercase title is ≥ threshold similar to any title
*already accepted this run* — an order-dependent, inherently sequential
gate. For parity the engine replays it exactly: one ``applyInPandas``
group per site (only fuzzy-profile sites reach this operator).

State shape (round-2 rework of round-1's unbounded driver dict): prior
accepted titles are NOT shipped in the UDF closure. They arrive as
``is_prior``-flagged rows unioned into the grouped input — the state
rides the shuffle, partitioned by site like the candidates, so the
closure is constant-size and the driver never materializes a title.
Prior rows carry their original acceptance ``order_key`` (monotone in
page), so one sort replays prior-then-candidates in exact order.

Scale note: this is the parity path. At 10^10 scale the same semantics
relax to MinHash-LSH similarity join (operators/textdedup.py) — SURVEY
§2.4 flags exactly this trade.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Google_Crawler.py:58-63 gates on fuzz.ratio >= 35 over squashed
# lowercase titles. fuzz.ratio is normalized INDEL similarity:
# 100 * (la + lb - indel_distance) / (la + lb), with
# indel_distance = la + lb - 2 * LCS(a, b) — NOT difflib's
# SequenceMatcher (whose junk heuristics and contiguous-block recursion
# under-count matches). Implemented from the public definition; no
# dependency needed.
FUZZY_THRESHOLD = 35.0  # Google_Crawler.py:62


def indel_ratio(a: str, b: str) -> float:
    """fuzz.ratio semantics: 100 * (1 - indel_dist / (len(a)+len(b))).

    LCS length via the standard two-row DP — titles are short (tens of
    chars), so O(la*lb) per pair is fine in the per-site replay loop.
    """
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    if la == 0 or lb == 0:
        return 0.0
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = [0] * (lb + 1)
    for ca in a:
        cur = [0]
        p0 = prev[0]
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur.append(prev[j - 1] + 1)
            else:
                pj = prev[j]
                c0 = cur[j - 1]
                cur.append(pj if pj >= c0 else c0)
        prev = cur
    lcs = prev[lb]
    return 100.0 * (2.0 * lcs) / (la + lb)

_GATE_SCHEMA = (
    "site string, order_key long, url_canon string, title string, "
    "is_prior boolean, fuzzy_ok boolean"
)


def _norm(title: str) -> str:
    return re.sub(r"\s+", "", (title or "").lower())


def fuzzy_gate(candidates: DataFrame, prior: DataFrame | None) -> DataFrame:
    """Adds ``fuzzy_ok`` (boolean) to candidates.

    candidates: rows with columns [site, order_key, url_canon, title] —
    only rows of fuzzy-dedup sites should be passed in. ``prior`` is the
    ``fuzzy_titles`` state table (site, norm_title, seq) of titles
    accepted in earlier batches; ``seq`` is the acceptance order_key, so
    prior rows sort strictly before the current window's candidates.
    """
    cand = candidates.select(
        "site", "order_key", "url_canon", "title", F.lit(False).alias("is_prior")
    )
    if prior is not None:
        cand = cand.unionByName(
            prior.select(
                "site",
                F.col("seq").alias("order_key"),
                F.lit(None).cast("string").alias("url_canon"),
                F.col("norm_title").alias("title"),
                F.lit(True).alias("is_prior"),
            )
        )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("order_key").copy()
        acc: list[str] = []
        ok: list[bool] = []
        for title, is_prior in zip(pdf["title"], pdf["is_prior"]):
            if is_prior:
                acc.append(title)  # stored pre-normalized
                ok.append(True)
                continue
            n = _norm(title)
            dup = any(indel_ratio(n, p) >= FUZZY_THRESHOLD for p in acc)
            ok.append(not dup)
            if not dup:
                acc.append(n)
        pdf["fuzzy_ok"] = ok
        return pdf[~pdf["is_prior"]]

    return (
        cand.groupBy("site")
        .applyInPandas(replay, schema=_GATE_SCHEMA)
        .filter(F.col("fuzzy_ok"))
    )
