"""Materialize the deterministic synth world as Spark DataFrames /
Parquet (the replayed fetch corpus that substitutes for live HTTP —
SURVEY §2.1 S2/S3)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import synth
from ..config import PROFILES, host_of, profile_of, virtual_sites
from ..schemas import CORPUS, KEYWORDS, ROBOTS, SEEDS


def world_dfs(spark: SparkSession, scale: float = 1.0, site_mult: int = 1) -> dict[str, DataFrame]:
    w = synth.build_world(scale, site_mult)
    return {
        "corpus": spark.createDataFrame(
            [tuple(r[c.name] for c in CORPUS) for r in w["corpus"]], CORPUS
        ),
        "seeds": spark.createDataFrame(
            [tuple(r[c.name] for c in SEEDS) for r in w["seeds"]], SEEDS
        ),
        "robots": spark.createDataFrame(
            [tuple(r[c.name] for c in ROBOTS) for r in w["robots"]], ROBOTS
        ),
        "keywords": spark.createDataFrame(
            [tuple(r[c.name] for c in KEYWORDS) for r in w["keywords"]], KEYWORDS
        ),
    }


def write_world(spark: SparkSession, out_dir: str, scale: float = 1.0,
                distributed: bool = False, site_mult: int = 1) -> dict[str, str]:
    """Persist the world as parquet; corpus built distributively at bench
    scales (synth.build_corpus_spark — no driver-side row loop)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    dfs = world_dfs(spark, scale if not distributed else 0.05,
                    site_mult if not distributed else 1)
    if distributed:
        dfs["corpus"] = synth.build_corpus_spark(spark, scale, site_mult)
        # seeds/robots/keywords are tiny at any scale; rebuild at true breadth
        w = synth.build_world(0.0, site_mult)  # sizes floor at small constants
        dfs["seeds"] = spark.createDataFrame(
            [tuple(r[c.name] for c in SEEDS) for r in w["seeds"]], SEEDS
        )
        dfs["robots"] = spark.createDataFrame(
            [tuple(r[c.name] for c in ROBOTS) for r in w["robots"]], ROBOTS
        )
    from pyspark.sql import functions as F

    for name, df in dfs.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        if name == "corpus":
            # page_kind + page partitioning: listing/article scans prune
            # to one branch each, and each crawl window's fetch join
            # prunes the listing branch to its [p0, p1] page band —
            # without it every window re-reads the whole listing corpus
            # (partition pruning, SURVEY §4; articles/robots land in the
            # null-page partition, untouched by the band filter).
            # Cluster rows to the partition layout BEFORE the write:
            # without it every build task emits a file into every page
            # dir (observed 257k files at mult=384 — file-listing alone
            # then dominates planning). Listings cluster whole-page-per
            # -partition (→ ~1 file/dir); the page-less article branch
            # spreads over a 64-way url hash so its single dir still
            # writes in parallel.
            wkey = F.coalesce(
                F.col("page"),
                F.pmod(F.xxhash64("url_canon"), F.lit(64)).cast("int"),
            )
            df = df.repartition(256, F.col("page_kind"), wkey)
            writer = df.write.mode("overwrite").partitionBy("page_kind", "page")
        else:
            writer = df.write.mode("overwrite")
        writer.parquet(p)
        paths[name] = p
    return paths


def read_world(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(out_dir, f"{name}.parquet"))
        for name in ("corpus", "seeds", "robots", "keywords")
    }


def profiles_df(spark: SparkSession, sites: list[str] | None = None) -> DataFrame:
    """Per-site semantic profile dimension (tiny, broadcast everywhere) —
    SURVEY §7.3 'profiles are config, not code forks'. ``sites`` lists the
    (possibly virtual) sites present in the world; default = base sites."""
    sites = sites if sites is not None else [p.site for p in PROFILES]
    rows = []
    for site in sites:
        p = profile_of(site)
        rows.append(
            (
                site, p.relevance_variant, p.use_exclude, p.match_input,
                p.detail_before_filter, p.strip_query, p.time_chain, p.time_source,
                p.max_pages, p.stop_on_empty, p.crawl_delay_s, p.fuzzy_dedup,
                p.freshness_days, p.min_include, host_of(site), f"https://{host_of(site)}",
            )
        )
    schema = (
        "site string, relevance_variant string, use_exclude boolean, match_input string, "
        "detail_before_filter boolean, strip_query boolean, time_chain string, "
        "time_source string, max_pages int, stop_on_empty boolean, crawl_delay_s double, "
        "fuzzy_dedup boolean, freshness_days int, min_include int, host string, origin string"
    )
    return spark.createDataFrame(rows, schema)
