"""Sequential fuzzy-title dedup replay — SURVEY.md §2.4 D4.

Google_Crawler.py:59-63,231-238 rejects an article when its
whitespace-stripped lowercase title is ≥ threshold similar to any title
*already accepted this run* — an order-dependent, inherently sequential
gate. For parity the engine replays it exactly: one ``applyInPandas``
group per site (only fuzzy-profile sites reach this operator; the group
is the site's candidate set for the micro-batch, sorted by order_key),
seeded with the accepted-title state from prior batches.

Scale note: this is the parity path. At 10^10 scale the same semantics
relax to MinHash-LSH similarity join (operators/textdedup.py) — SURVEY
§2.4 flags exactly this trade.
"""

from __future__ import annotations

import difflib
import re

import pandas as pd
from pyspark.sql import DataFrame

FUZZY_THRESHOLD = 60.0  # reference_model.FUZZY_THRESHOLD (Google_Crawler.py:62 spirit)


def _norm(title: str) -> str:
    return re.sub(r"\s+", "", (title or "").lower())


def fuzzy_gate(candidates: DataFrame, prior_titles: dict[str, list[str]]) -> DataFrame:
    """Adds ``fuzzy_ok`` (boolean) to candidates.

    candidates: rows with columns [site, order_key, title, ...] — only
    rows of fuzzy-dedup sites should be passed in. ``prior_titles`` maps
    site → normalized titles accepted in earlier batches, in acceptance
    order (small: one entry per accepted doc of that site; shipped in the
    UDF closure — the sequential-parity cost SURVEY accepts).
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(list(candidates.schema.fields) + [StructField("fuzzy_ok", BooleanType())])

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        site = pdf["site"].iloc[0]
        acc = list(prior_titles.get(site, []))
        pdf = pdf.sort_values("order_key").copy()
        ok = []
        for t in pdf["title"]:
            n = _norm(t)
            dup = any(
                difflib.SequenceMatcher(None, n, p).ratio() * 100 >= FUZZY_THRESHOLD
                for p in acc
            )
            ok.append(not dup)
            if not dup:
                acc.append(n)
        pdf["fuzzy_ok"] = ok
        return pdf

    return candidates.groupBy("site").applyInPandas(replay, schema=schema)
