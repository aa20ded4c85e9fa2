"""Operator-level frontier throughput: push N synthetic messy URLs
through the engine's hot path — canonicalize (U1-U5) → keyword relevance
(R1-R4) → Bloom probe → exact dedup — as ONE job with no micro-batch
barriers. This is the per-executor shape of a 10^10-URL crawl on a real
cluster (window latency amortizes at that scale; the operators do not).

Usage: python tools/frontier_throughput.py <cores> <n_urls_millions>
Prints RESULT {...} json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from news_crawler_spark.config import EXCLUDE_KEYWORDS, INCLUDE_KEYWORDS  # noqa: E402
from news_crawler_spark.functions.relevance import keyword_arrays, relevance_expr  # noqa: E402
from news_crawler_spark.functions.urls import canonicalize_expr  # noqa: E402
from news_crawler_spark.operators import bloom  # noqa: E402
from news_crawler_spark.session import get_spark  # noqa: E402


def messy_urls(spark, n: int, cores: int):
    """Deterministic messy hrefs + keyword-salted titles from a range —
    the same variant mix the synth corpus plants (U1-U5 coverage)."""
    df = spark.range(0, n, 1, cores * 8)
    i = F.col("id")
    host = F.concat(F.lit("www.h"), F.pmod(i, F.lit(5000)), F.lit(".example.com"))
    path = F.concat(F.lit("/art/"), i % 1_000_000)
    v = i % 5
    href = (
        F.when(v == 0, F.concat(path, F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("//"), host, path))
        .when(v == 2, F.concat(F.lit("HTTPS://"), F.upper(host), path,
                               F.lit("?utm_source=feed&b=2&a=1#frag")))
        .when(v == 3, F.concat(F.lit("https://"), host, path, F.lit("#top")))
        .otherwise(F.concat(F.lit("https://"), host, path, F.lit("?b=2&a=1")))
    )
    title = F.concat(
        F.lit("daily "),
        F.when(i % 3 == 0, F.lit("economy market ")).otherwise(F.lit("report ")),
        F.when(i % 7 == 0, F.lit("gossip ")).otherwise(F.lit("")),
        F.lit("briefing "), (i % 97).cast("string"),
    )
    origin = F.concat(F.lit("https://"), host)
    return df.select(href.alias("href"), origin.alias("origin"), title.alias("title"))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(float(sys.argv[2] if len(sys.argv) > 2 else "4") * 1_000_000)
    spark = get_spark(cores=cores, shuffle_partitions=cores,
                      extra_conf={"spark.sql.ansi.enabled": "false"})

    # seen set: every 10th URL, with a bloom filter over it
    seen = messy_urls(spark, n // 10, cores).select(
        canonicalize_expr(F.col("href"), F.col("origin"), F.lit(False)).alias("url_canon")
    ).filter(F.col("url_canon").isNotNull()).distinct()
    shards = bloom.build_shards(seen, n_shards=64, n_bits=1 << 23, n_hashes=5)
    shard_rows = shards.collect()  # small enough to broadcast (64 MiB cap)

    inc_arr, exc_arr = keyword_arrays(INCLUDE_KEYWORDS, EXCLUDE_KEYWORDS)
    urls = messy_urls(spark, n, cores)
    pipeline = (
        urls.withColumn(
            "url_canon", canonicalize_expr(F.col("href"), F.col("origin"), F.lit(False))
        )
        .filter(F.col("url_canon").isNotNull())
        .filter(relevance_expr(F.col("title"), F.lit("substring"), F.lit(True),
                               inc_arr, exc_arr, F.lit(1)))
    )
    flagged = bloom.probe_broadcast(pipeline, shard_rows, 64)
    surviving = flagged.filter(~F.col("maybe_seen")).dropDuplicates(["url_canon"])

    t0 = time.time()
    out = surviving.count()
    wall = time.time() - t0
    print("RESULT " + json.dumps({
        "cores": cores, "n_urls": n, "survivors": out,
        "wall_s": round(wall, 2), "urls_per_sec": round(n / wall, 0),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
