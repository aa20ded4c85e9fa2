"""Explicit StructTypes for every engine table.

The reference is schemaless Python dicts (SURVEY.md §1.2); the engine
declares the effective schema. ``DOCUMENTS`` is the authoritative
output shape from BASELINE.json ``input_hint``:
``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>``.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # title|summary|image
        T.StructField("text", T.StringType(), False),       # '' for image spans
        T.StructField("media_ref", T.StringType(), False),  # '' for text spans
        T.StructField("offset", T.IntegerType(), False),    # 0..n-1 position
    ]
)

# BASELINE.json input_hint invariant columns + engine extras (nullable).
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN, False), False),
        T.StructField("url_canon", T.StringType(), True),
        T.StructField("site", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("crawl_order", T.LongType(), True),
        T.StructField("batch_id", T.IntegerType(), True),
    ]
)

# Replayed fetch corpus — substitute for live HTTP (SURVEY §2.1 S2/S3).
CORPUS = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("page_kind", T.StringType(), False),  # listing|article
        T.StructField("site", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("charset", T.StringType(), False),    # utf-8|euc-kr
        T.StructField("http_status", T.IntegerType(), False),
        T.StructField("fetch_latency_ms", T.IntegerType(), False),
        # listing page number (None for article/robots rows): the replay
        # corpus' micro-batch locality key — windows prune their fetch
        # scan to [p0, p1] (partition dirs on parquet, batch stats in the
        # in-memory cache) instead of re-scanning the whole corpus
        T.StructField("page", T.IntegerType(), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("seed_index", T.IntegerType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("max_pages", T.IntegerType(), False),  # 0 = until empty
    ]
)

# Realized as two tables in the snapshot store: ``frontier_pending``
# (overwrite: next window's due rows) and ``frontier_log`` (append:
# every dispatch with status fetched|failed|missing + politeness slot).
FRONTIER = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_salt", T.StringType(), True),
        T.StructField("status", T.StringType(), False),  # pending|in_flight|fetched|failed
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seed_index", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("dom_pos", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("next_fetch_after", T.TimestampType(), True),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("batch_id", T.IntegerType(), False),
    ]
)

SEEN = T.StructType([T.StructField("url_canon", T.StringType(), False)])

BLOOM_SHARDS = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("version", T.IntegerType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType(), False), False),
    ]
)

KEYWORDS = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # include|exclude
        T.StructField("category", T.StringType(), False),
        T.StructField("keyword", T.StringType(), False),
    ]
)

# Per-partition lineage + metrics, committed with each snapshot (north rule).
METRICS = T.StructType(
    [
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# Intermediate: one listing item per row after parse+explode (SURVEY P1/P2).
LISTING_ITEM = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("seed_index", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("dom_pos", T.IntegerType(), False),
        T.StructField("href", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("time_str", T.StringType(), True),
        T.StructField("img", T.StringType(), True),
        T.StructField("lead", T.StringType(), True),
    ]
)

# Intermediate: parsed article-detail page (SURVEY P3). a_status carries
# the fetch http_status so the pipeline needs a single join (C5).
ARTICLE_DETAIL = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("a_status", T.IntegerType(), True),
        T.StructField("d_title", T.StringType(), True),
        T.StructField("d_time_str", T.StringType(), True),
        T.StructField("d_summary", T.StringType(), True),
        T.StructField("d_img", T.StringType(), True),
    ]
)
