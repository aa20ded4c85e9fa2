"""Timestamp normalization chains — SURVEY.md §2.6 (T1-T8).

Each reference crawler has a strptime fallback chain; here each chain is
one **native** Spark column expression built from ``try_to_timestamp``
coalescing (JVM-side, codegen; ``try_`` variants so ANSI mode never
throws — unparseable ⇒ NULL ⇒ the T8 drop filter, same semantics the
reference gets from catching ValueError).

Reference chains (file:line into /root/reference/):
  t1  Daum_crawler.py:114-127    full → today+HH:MM → batch_ts
  t2  FnNews_Crawler.py:71-76    '%Y.%m.%d %H:%M'
  t2p FNToday_Crawler.py:83-87   split '|' then '%Y-%m-%d %H:%M'
  t3  Nate_Crawler.py:108-118    'MM-DD HH:MM' + year injection, else full
  t4  SkyDaily_Crawler.py:99-115 full → date-only → '%Y년 %m월 %d일'
  t5  Google_Crawler.py:85-98    ISO-8601 Z → +9h KST
  t6  Google_Crawler.py:101-109  freshness watermark (≤ N days old)
  t7  Daum_crawler.py:24-32      Korean date-group key with weekday name
  t8  FnNews_Crawler.py:75-76    unparseable ⇒ drop (NULL filter)

Every wall-clock read in the reference (datetime.now() at
Daum_crawler.py:122,127, Nate_Crawler.py:112, YNA_Crawler.py:109) is
replaced by the deterministic ``batch_ts`` parameter (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import BATCH_TS


def batch_ts_lit(batch_ts: str = BATCH_TS) -> Column:
    return F.lit(batch_ts).cast("timestamp")


def _t(s: Column, fmt: str) -> Column:
    return F.try_to_timestamp(s, F.lit(fmt))


def t1_expr(s: Column, batch: Column) -> Column:
    """Daum: full ts → today+HH:MM → batch_ts (never NULL)."""
    hhmm = F.when(
        s.rlike(r"^\d{2}:\d{2}$"),
        _t(F.concat(F.date_format(batch, "yyyy-MM-dd "), s), "yyyy-MM-dd HH:mm"),
    )
    return F.coalesce(_t(s, "yyyy.MM.dd. HH:mm:ss"), hhmm, batch)


def t2_expr(s: Column) -> Column:
    return _t(s, "yyyy.MM.dd HH:mm")


def t2p_expr(s: Column) -> Column:
    """FNToday: 'Reporter Kim | 2025-06-01 09:30' → take tail after '|'."""
    tail = F.trim(F.substring_index(s, "|", -1))
    return _t(tail, "yyyy-MM-dd HH:mm")


def t3_expr(s: Column, batch: Column) -> Column:
    """Nate/YNA: 'MM-DD HH:MM' with batch-year injection, else full format."""
    return F.when(
        s.rlike(r"^\d{2}-\d{2} \d{2}:\d{2}$"),
        _t(F.concat(F.date_format(batch, "yyyy"), F.lit("-"), s), "yyyy-MM-dd HH:mm"),
    ).otherwise(_t(s, "yyyy.MM.dd HH:mm"))


def t4_expr(s: Column) -> Column:
    """SkyDaily/VOA: full → date-only → Korean '%Y년 %m월 %d일' (midnight)."""
    kor = F.when(
        s.rlike(r"^\d{4}년 \d{2}월 \d{2}일$"),
        F.make_timestamp(
            F.regexp_extract(s, r"^(\d{4})년", 1).cast("int"),
            F.regexp_extract(s, r"(\d{2})월", 1).cast("int"),
            F.regexp_extract(s, r"(\d{2})일", 1).cast("int"),
            F.lit(0), F.lit(0), F.lit(0),
        ),
    )
    return F.coalesce(_t(s, "yyyy.MM.dd HH:mm"), _t(s, "yyyy.MM.dd"), kor)


def t5_expr(s: Column) -> Column:
    """Google: ISO-8601 'Z' (UTC) → naive KST (+9h), the reference's
    storage convention (Google_Crawler.py:85-98)."""
    return _t(s, "yyyy-MM-dd'T'HH:mm:ss'Z'") + F.expr("INTERVAL 9 HOURS")


def parse_time_expr(s: Column, chain: Column, batch: Column) -> Column:
    """Dispatch on the per-site profile's chain name — one expression
    serves all sites in the same DataFrame (profiles are data, SURVEY §7.3)."""
    return (
        F.when(chain == "t1", t1_expr(s, batch))
        .when(chain == "t2", t2_expr(s))
        .when(chain == "t2p", t2p_expr(s))
        .when(chain == "t3", t3_expr(s, batch))
        .when(chain == "t4", t4_expr(s))
        .when(chain == "t5", t5_expr(s))
    )


def freshness_filter_expr(ts: Column, batch: Column, days: Column) -> Column:
    """T6 watermark: keep when no freshness window (days=0) or within it."""
    return (days == 0) | (ts >= batch - F.make_interval(days=days))


# T7: Korean date-group key. dayofweek(): 1=Sunday..7=Saturday.
_KOR_BY_DOW = ["일요일", "월요일", "화요일", "수요일", "목요일", "금요일", "토요일"]


def korean_date_key_expr(ts: Column) -> Column:
    """'%Y년 %m월 %d일 {요일}' — the reference's archive grouping key
    (duplicated header block in all 10 crawlers, e.g. Daum_crawler.py:24-32)."""
    day = F.element_at(F.array(*[F.lit(d) for d in _KOR_BY_DOW]), F.dayofweek(ts))
    return F.concat(
        F.date_format(ts, "yyyy"), F.lit("년 "),
        F.date_format(ts, "MM"), F.lit("월 "),
        F.date_format(ts, "dd"), F.lit("일 "),
        day,
    )
