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

import difflib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUZZY_THRESHOLD = 60.0  # reference_model.FUZZY_THRESHOLD (Google_Crawler.py:62 spirit)

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
            dup = any(
                difflib.SequenceMatcher(None, n, p).ratio() * 100 >= FUZZY_THRESHOLD
                for p in acc
            )
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
