"""Archive sinks — SURVEY.md §2.1 S6/S9, §2.7 A1-A4.

The reference's persisted shape is a per-site JSON archive of day groups
(``[{date: '2025년 04월 18일 금요일', articles: [...]}, ...]`` —
Daum_crawler.py:187-224, Naver_Crawler.py:137-160) plus a global
50-newest head list (utils.js:18-23). Here both are views over the
``documents`` table:

* ``day_grouped_archive`` — A1/A3/T7: group by the Korean date key,
  articles newest-first within each day (A2 ``sorted(reverse=True)``
  with nulls-last sentinel semantics, Daum_crawler.py:189), day groups
  ascending. Grouping is a presentation concern (SURVEY §2.7) — the
  engine stores flat, partition-pruned documents and materializes this
  nested shape on demand.
* ``head_list`` — A4 top-k: newest 50 overall, Catalyst's
  TakeOrderedAndProject (no full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeparse import korean_date_key_expr


def head_fields() -> list[F.Column]:
    """Columns of a head-list row (public: the crawl loop maintains the
    head list incrementally across windows)."""
    return _article_fields() + [F.col("site"), F.col("ts"), F.col("crawl_order")]


def article_scalar_fields() -> list[F.Column]:
    """The four spans-derived scalars of a head row (title, time, img,
    summary) WITHOUT the url/original_url/site/ts/crawl_order columns the
    crawl loop's fused stats collect already carries — lets small windows
    piggyback head maintenance on that one collect (driver-side top-50,
    LocalTable commit: no per-window head Spark job)."""
    return _article_fields()[:4]


def _article_fields() -> list[F.Column]:
    """The reference's flat record {title, time, img, summary, url}
    projected from spans (record constructors, e.g.
    SkyDaily_Crawler.py:131-138) — flat columns, single projection layer
    (struct-then-extract would defeat CollapseProject and with it the
    TakeOrderedAndProject fusion in head_list)."""
    summary_arr = F.filter(F.col("spans"), lambda s: s["kind"] == "summary")
    img_arr = F.filter(F.col("spans"), lambda s: s["kind"] == "image")
    return [
        F.element_at(F.filter(F.col("spans"), lambda s: s["kind"] == "title"), 1)["text"]
        .alias("title"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("time"),
        F.when(F.size(img_arr) > 0, F.element_at(img_arr, 1)["media_ref"])
        .otherwise(F.lit("")).alias("img"),
        F.when(F.size(summary_arr) > 0, F.element_at(summary_arr, 1)["text"])
        .otherwise(F.lit("")).alias("summary"),
        F.col("url_canon").alias("url"),
        # raw pre-canonical href, kept next to the canonical key
        # (Nate_Crawler.py:126-132, Google_Crawler.py:248-254)
        F.col("original_url"),
    ]


def _article_struct() -> F.Column:
    return F.struct(*_article_fields())


def day_grouped_archive(documents: DataFrame, site: str | None = None) -> DataFrame:
    """documents → one row per (site, day): Korean date key + the day's
    articles newest-first. ``sort_array`` on a (-epoch, article) struct
    keeps the whole operation native (no UDF, map-side combinable)."""
    df = documents if site is None else documents.filter(F.col("site") == site)
    keyed = df.select(
        "site",
        F.to_date("ts").alias("day"),
        korean_date_key_expr(F.col("ts")).alias("date_key"),
        F.struct(
            (-F.unix_timestamp("ts")).alias("neg_ts"),
            F.col("crawl_order").alias("tie"),
            _article_struct().alias("a"),
        ).alias("sortable"),
    )
    return (
        keyed.groupBy("site", "day", "date_key")
        .agg(F.transform(F.sort_array(F.collect_list("sortable")),
                         lambda s: s["a"]).alias("articles"))
        .orderBy("site", "day")
        .select("site", "date_key", "articles")
    )


def merge_head_list(existing: DataFrame, new: DataFrame, k: int = 50) -> DataFrame:
    """S9/D6: utils.js:18-28 — prepend new items not already present
    (``existingNews.some(item => item.link === link)`` ≡ left_anti on
    url), newest-first, truncate to k."""
    fresh = new.join(existing.select("url"), on="url", how="left_anti")
    return (
        fresh.unionByName(existing)
        .orderBy(F.desc("ts"), F.col("url"))
        .limit(k)
    )


def write_archive_json(archive: DataFrame, path: str, nested: bool = False) -> None:
    """S6 sink shape. ``nested=False``: one JSON line per day group —
    line-delimited for parallel IO, the engine's storage shape.

    ``nested=True``: the reference's BYTE shape — one ``{site}_News.json``
    file per site holding the single nested array ``[{date, articles:
    [...]}]``, rendered with ``json.dump(ensure_ascii=False, indent=2)``
    and the reference's record key order (Naver_Crawler.py:137-157,
    Nate_Crawler.py:126-132). A per-site file has a single writer by
    construction, so this presentation arm collects the day groups to
    the driver; it is for serving-layer export, not the 100 TB path
    (tests/test_archive.py pins byte equality vs the parity model's
    independent rendering)."""
    if not nested:
        archive.write.mode("overwrite").json(path)
        return
    import json
    import os

    by_site: dict[str, list] = {}
    for r in archive.collect():  # day_grouped_archive rows: days ascending
        by_site.setdefault(r.site, []).append(r)
    os.makedirs(path, exist_ok=True)
    for site, rs in by_site.items():
        out = [
            {
                "date": r.date_key,
                "articles": [
                    {"title": a.title, "time": a.time, "img": a.img,
                     "url": a.url, "original_url": a.original_url,
                     "summary": a.summary}
                    for a in r.articles
                ],
            }
            for r in rs
        ]
        with open(os.path.join(path, f"{site}_News.json"), "w", encoding="utf-8") as f:
            json.dump(out, f, ensure_ascii=False, indent=2)


def read_archive_json(spark, path: str) -> DataFrame:
    """S8: read a previously-written archive back (utils.js:7-15 reads the
    head list over HTTP; here any Hadoop-compatible path)."""
    return spark.read.json(path)


def head_list(documents: DataFrame, k: int = 50) -> DataFrame:
    """Global newest-k (utils.js:19 ``slice(0, 50)``): deterministic
    tie-break on crawl_order; Catalyst plans TakeOrderedAndProject —
    a per-partition top-k + single merge, never a global sort."""
    # one flat projection over the limit: Limit(Project(Sort)) fuses into
    # TakeOrderedAndProject (per-partition top-k + single merge); a second
    # projection layer blocks CollapseProject and degrades the plan to a
    # global range-partitioned sort
    top = documents.orderBy(F.desc("ts"), F.col("crawl_order")).limit(k)
    return top.select(*_article_fields(), "site", "ts")
