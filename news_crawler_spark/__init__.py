"""news_crawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the semantics of the WashingManager/News-Crawler reference
(per-site scrape scripts; see SURVEY.md) as a distributed URL-frontier +
fetch-scheduler pipeline: DataFrame-first, Arrow/pandas UDFs on the slow
path, snapshot-checkpointed state tables, deterministic replay.

Subpackages
-----------
functions/  scalar column functions (URL canonicalization, relevance,
            time parsing, text statistics)
operators/  relational + custom operators (parse, dedup, bloom,
            scheduler, similarity, multimodal)
sources/    replayed fetch corpus + snapshot-versioned state store
plans/      the micro-batch crawl pipeline driver and MERGE emulation
streaming/  Structured Streaming wrappers (foreachBatch micro-batches)
"""

__version__ = "0.1.0"
