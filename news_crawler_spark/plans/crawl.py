"""The micro-batch crawl pipeline — SURVEY.md §3.4, the engine's core.

One micro-batch = one page generation across all active seeds (the
deterministic projection of the reference's per-site pagination loops,
C3/C4: crawl order ≡ (page, seed_index, dom_pos)). Each batch is one
DataFrame plan:

  due listings → politeness schedule → corpus join (replayed S2)
    → mapInPandas parse (P1/P2) → canonicalize (U1-U5, native)
    → robots gate (C7) → in-batch first-occurrence dedup (D2)
    → Bloom-routed exact anti-join vs seen (D1)
    → article-detail corpus join + parse where the profile needs it
      (S3/P3; semi-join reduction — only candidate URLs are parsed)
    → relevance gate (R1-R4) → time normalize (T1-T8) → freshness (T6)
    → sequential fuzzy replay for fuzzy-profile sites (D4)
    → span assembly (P4) → atomic snapshot commit (C6)

Pagination state (A6: stop on empty page / page caps) is the driver
loop's only collect — a per-seed (n_items, n_accepted) aggregate of a
few dozen rows. Everything else stays distributed.

Shuffles per batch (annotated in SURVEY §3.4): corpus join on
url_canon, in-batch dedup window on url_canon, seen anti-join on
url_canon (Bloom-pruned), fuzzy applyInPandas on site. Listing/article
scans prune on the corpus's page_kind partition column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import BATCH_TS, EXCLUDE_KEYWORDS, INCLUDE_KEYWORDS
from ..functions.relevance import keyword_arrays, relevance_expr
from ..functions.timeparse import batch_ts_lit, freshness_filter_expr, parse_time_expr
from ..functions.urls import canonicalize_expr
from ..operators import bloom
from ..operators.fuzzy import fuzzy_gate
from ..operators.parse import parse_article, parse_listing
from ..operators.scheduler import order_key_col, schedule
from ..operators.spans import build_spans
from ..sources.store import SnapshotStore
from ..sources.world import profiles_df

SEED_STATE_SCHEMA = "seed_index int, site string, url string, max_pages int, active boolean"
FUZZY_SCHEMA = "site string, norm_title string, seq long"
METRICS_SCHEMA = (
    "batch_id int, stage string, partition_id int, rows_in long, rows_out long, wall_ms long"
)


@dataclass
class CrawlResult:
    batches: int = 0
    dispatched: int = 0
    items: int = 0
    accepted: int = 0
    per_batch: list = field(default_factory=list)


class InjectedFailure(RuntimeError):
    """Raised by the fault-injection hook in resume tests."""


def _init_seed_state(spark: SparkSession, seeds: DataFrame) -> list[dict]:
    return [
        {**r.asDict(), "active": True}
        for r in seeds.orderBy("seed_index").collect()
    ]


def run_crawl(
    spark: SparkSession,
    world: dict[str, DataFrame],
    store: SnapshotStore,
    batch_ts: str = BATCH_TS,
    use_bloom: bool = True,
    n_bloom_shards: int = bloom.DEFAULT_N_SHARDS,
    scheduler_window_s: float = 60.0,
    n_salts: int = 4,
    max_batches: int = 10_000,
    fail_after_batch: int | None = None,
) -> CrawlResult:
    """Run the crawl to frontier exhaustion (or ``max_batches``),
    committing one snapshot per micro-batch; resumes from the store's
    last committed batch if one exists."""
    corpus, seeds, robots = world["corpus"], world["seeds"], world["robots"]
    listings = corpus.filter(F.col("page_kind") == "listing")
    articles = corpus.filter(F.col("page_kind") == "article")
    profiles = profiles_df(spark)
    inc_arr, exc_arr = keyword_arrays(INCLUDE_KEYWORDS, EXCLUDE_KEYWORDS)
    bts = batch_ts_lit(batch_ts)
    res = CrawlResult()

    # ---- resume or init ------------------------------------------------
    if store.last_batch_id >= 0:
        seed_state = [r.asDict() for r in
                      store.read(spark, "seed_state").orderBy("seed_index").collect()]
        fuzzy_prior = _load_fuzzy(spark, store)
    else:
        seed_state = _init_seed_state(spark, seeds)
        fuzzy_prior = {}
        store.commit(
            0,
            overwrite={
                "seed_state": spark.createDataFrame(
                    [tuple(s[k] for k in ("seed_index", "site", "url", "max_pages", "active"))
                     for s in seed_state],
                    SEED_STATE_SCHEMA,
                )
            },
            meta={"note": "init"},
        )

    batch = store.last_batch_id
    while batch < max_batches:
        batch += 1
        page = batch
        # A6/page-cap deactivation happens at loop top (oracle order)
        for s in seed_state:
            if s["active"] and s["max_pages"] and page > s["max_pages"]:
                s["active"] = False
        active = [s for s in seed_state if s["active"]]
        if not active:
            break

        # ---- due frontier rows: page `page` of every active seed ------
        due = spark.createDataFrame(
            [
                (
                    f"{s['url']}?page={page}",
                    s["site"],
                    s["seed_index"],
                    page,
                    s["seed_index"],  # priority = seed order (C8)
                )
                for s in active
            ],
            "url_canon string, site string, seed_index int, page int, priority int",
        ).withColumn("host", F.parse_url(F.col("url_canon"), F.lit("HOST"))) \
         .withColumn("order_key", order_key_col(F.col("page"), F.col("seed_index"), F.lit(0)))

        dispatched = schedule(due, robots, bts, scheduler_window_s, n_salts=n_salts)

        # ---- fetch (replayed corpus join) + parse ----------------------
        fetched = dispatched.select("url_canon", "site", "seed_index", "page").join(
            listings.filter(F.col("http_status") == 200).select("url_canon", "content", "charset"),
            on="url_canon",
            how="inner",
        )
        items = parse_listing(fetched).withColumnRenamed("url_canon", "listing_url")

        # ---- gates ------------------------------------------------------
        cand = items.join(F.broadcast(profiles), on="site", how="inner")
        cand = cand.withColumn(
            "url_canon",
            canonicalize_expr(F.col("href"), F.col("origin"), F.col("strip_query")),
        ).filter(F.col("url_canon").isNotNull())
        # robots gate on discovered links (C7)
        path = F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit(""))
        link_host = F.parse_url(F.col("url_canon"), F.lit("HOST"))
        cand = (
            cand.withColumn("link_host", link_host)
            .join(F.broadcast(robots.withColumnRenamed("host", "link_host")
                              .select("link_host", "disallow_prefixes")),
                  on="link_host", how="left")
            .filter(
                F.col("disallow_prefixes").isNull()
                | ~F.exists(F.col("disallow_prefixes"), lambda p: path.startswith(p))
            )
            .drop("disallow_prefixes")
        )
        cand = cand.withColumn(
            "order_key", order_key_col(F.col("page"), F.col("seed_index"), F.col("dom_pos"))
        )
        # D2: in-batch first occurrence wins (acceptance attributed there)
        w = Window.partitionBy("url_canon").orderBy("order_key")
        cand = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")

        # D1: cross-batch seen (Bloom-routed exact anti-join)
        seen = store.read(spark, "seen")
        shards = store.read(spark, "bloom_shards") if use_bloom else None
        if seen is not None:
            cand = bloom.dedup_new(cand, seen, shards)

        # ---- article-detail join where the profile needs it (S3/P3) ----
        need_detail = F.col("time_source") == "article"  # detail_before_filter ⊆ this set
        cand_urls = cand.filter(need_detail).select("url_canon")
        detail_pages = articles.join(cand_urls, on="url_canon", how="left_semi")
        detail = parse_article(detail_pages.filter(F.col("http_status") == 200)).withColumnRenamed(
            "url_canon", "d_url"
        )
        art_status = articles.select(
            F.col("url_canon").alias("d_url"), F.col("http_status").alias("a_status")
        )
        cand = (
            cand.join(art_status, cand["url_canon"] == art_status["d_url"], "left").drop("d_url")
            .join(detail, cand["url_canon"] == detail["d_url"], "left").drop("d_url")
        )
        detail_ok = F.col("a_status").isNotNull() & (F.col("a_status") == 200)
        cand = cand.filter(~need_detail | detail_ok)

        # ---- relevance (R1-R4) -----------------------------------------
        match_text = (
            F.when(F.col("match_input") == "title_lead",
                   F.concat_ws(" ", F.col("title"), F.col("lead")))
            .when(F.col("match_input") == "title_summary",
                  F.concat_ws(" ", F.col("title"), F.coalesce(F.col("d_summary"), F.lit(""))))
            .otherwise(F.col("title"))
        )
        cand = cand.filter(
            relevance_expr(match_text, F.col("relevance_variant"), F.col("use_exclude"),
                           inc_arr, exc_arr, F.col("min_include"))
        )

        # ---- time normalize (T1-T5) + T8 drop + T6 freshness ------------
        time_str = F.when(F.col("time_source") == "article", F.col("d_time_str")).otherwise(
            F.col("time_str")
        )
        cand = cand.withColumn("ts", parse_time_expr(time_str, F.col("time_chain"), bts))
        cand = cand.filter(F.col("ts").isNotNull())
        cand = cand.filter(
            freshness_filter_expr(F.col("ts"), bts, F.col("freshness_days"))
        )

        # ---- fuzzy replay for fuzzy-profile sites (D4, last gate) -------
        fuzzy_cand = cand.filter(F.col("fuzzy_dedup"))
        plain = cand.filter(~F.col("fuzzy_dedup"))
        gated = fuzzy_gate(
            fuzzy_cand.select("site", "order_key", "url_canon", "title"), fuzzy_prior
        ).filter(F.col("fuzzy_ok")).select("url_canon")
        accepted = plain.unionByName(
            fuzzy_cand.join(gated, on="url_canon", how="left_semi"),
            allowMissingColumns=False,
        ).persist()

        # ---- document assembly (P4) --------------------------------------
        has_detail = need_detail  # detail dict non-empty iff fetched (oracle)
        summary = F.when(has_detail, F.coalesce(F.col("d_summary"), F.lit(""))).otherwise(F.lit(""))
        img_raw = F.when(
            has_detail,
            F.coalesce(F.nullif(F.col("d_img"), F.lit("")), F.col("img")),
        ).otherwise(F.col("img"))
        img_canon = F.when(
            img_raw.isNull() | (img_raw == ""), F.lit("")
        ).otherwise(
            F.coalesce(canonicalize_expr(img_raw, F.col("origin"), F.lit(False)), F.lit(""))
        )
        docs = accepted.select(
            F.md5(F.col("url_canon")).alias("doc_id"),
            build_spans(F.col("title"), summary, img_canon).alias("spans"),
            F.col("url_canon"),
            F.col("site"),
            F.col("ts"),
            F.col("order_key").alias("crawl_order"),
            F.lit(batch).alias("batch_id"),
            F.col("seed_index"),
            F.col("page"),
        ).persist()

        # ---- per-seed accept/item counts drive pagination (A6) ----------
        n_items = {r["seed_index"]: r["n"] for r in
                   items.groupBy("seed_index").agg(F.count("*").alias("n")).collect()}
        n_acc = {r["seed_index"]: r["n"] for r in
                 docs.groupBy("seed_index").agg(F.count("*").alias("n")).collect()}
        n_disp = dispatched.count()
        n_items_total = sum(n_items.values())
        n_accepted = docs.count()

        for s in active:
            si = s["seed_index"]
            if n_items.get(si, 0) == 0:
                s["active"] = False
            elif n_acc.get(si, 0) == 0 and _prof(profiles, s["site"], "stop_on_empty"):
                s["active"] = False

        # ---- fuzzy title state update ------------------------------------
        new_fuzzy = (
            accepted.filter(F.col("fuzzy_dedup"))
            .select(
                "site",
                F.regexp_replace(F.lower(F.col("title")), r"\s+", "").alias("norm_title"),
                F.col("order_key").alias("seq"),
            )
        )
        fuzzy_rows = new_fuzzy.orderBy("seq").collect()
        for r in fuzzy_rows:
            fuzzy_prior.setdefault(r["site"], []).append(r["norm_title"])

        # ---- per-partition lineage/metrics (north rule) ------------------
        part_metrics = docs.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count("*").alias("rows_out")
        ).select(
            F.lit(batch).cast("int").alias("batch_id"),
            F.lit("accept_partition").alias("stage"),
            F.col("partition_id").cast("int"),
            F.lit(n_items_total).cast("long").alias("rows_in"),
            F.col("rows_out").cast("long"),
            F.lit(0).cast("long").alias("wall_ms"),
        )
        stage_rows = [
            (batch, "dispatch", -1, len(active), n_disp, 0),
            (batch, "parse", -1, n_disp, n_items_total, 0),
            (batch, "accept", -1, n_items_total, n_accepted, 0),
        ]
        metrics = spark.createDataFrame(stage_rows, METRICS_SCHEMA).unionByName(part_metrics)

        # ---- frontier bookkeeping ----------------------------------------
        frontier_pending = spark.createDataFrame(
            [
                (f"{s['url']}?page={page + 1}", s["site"], s["seed_index"], page + 1, "pending")
                for s in seed_state
                if s["active"]
            ] or [("", "", -1, -1, "none")],
            "url_canon string, site string, seed_index int, page int, status string",
        ).filter(F.col("seed_index") >= 0)
        frontier_log = dispatched.select(
            "url_canon", "site", "seed_index", "page", "next_fetch_after"
        ).withColumn("status", F.lit("fetched")).withColumn("batch_id", F.lit(batch))

        # ---- atomic snapshot commit (C6) ----------------------------------
        seen_delta = docs.select("url_canon")
        overwrite = {
            "seed_state": spark.createDataFrame(
                [tuple(s[k] for k in ("seed_index", "site", "url", "max_pages", "active"))
                 for s in seed_state],
                SEED_STATE_SCHEMA,
            ),
            "frontier_pending": frontier_pending,
            "fuzzy_titles": spark.createDataFrame(
                [(site, t, i) for site, ts_ in fuzzy_prior.items() for i, t in enumerate(ts_)]
                or [("", "", -1)],
                FUZZY_SCHEMA,
            ),
        }
        if use_bloom:
            delta_shards = bloom.build_shards(seen_delta, n_shards=n_bloom_shards, version=batch)
            prev_shards = store.read(spark, "bloom_shards")
            overwrite["bloom_shards"] = (
                bloom.merge_shards(prev_shards, delta_shards) if prev_shards is not None
                else delta_shards
            )
        store.commit(
            batch,
            overwrite=overwrite,
            append={
                "documents": docs.drop("seed_index", "page"),
                "seen": seen_delta,
                "frontier_log": frontier_log,
                "metrics": metrics,
            },
            meta={"page": page, "active_seeds": sum(1 for s in seed_state if s["active"])},
        )
        docs.unpersist()
        accepted.unpersist()

        res.batches += 1
        res.dispatched += n_disp
        res.items += n_items_total
        res.accepted += n_accepted
        res.per_batch.append(
            {"batch": batch, "dispatched": n_disp, "items": n_items_total, "accepted": n_accepted}
        )
        if fail_after_batch is not None and batch >= fail_after_batch:
            raise InjectedFailure(f"injected failure after batch {batch}")
    return res


_PROF_CACHE: dict[str, dict] = {}


def _prof(profiles: DataFrame, site: str, fieldname: str):
    if not _PROF_CACHE:
        for r in profiles.collect():
            _PROF_CACHE[r["site"]] = r.asDict()
    return _PROF_CACHE[site][fieldname]


def _load_fuzzy(spark: SparkSession, store: SnapshotStore) -> dict[str, list[str]]:
    df = store.read(spark, "fuzzy_titles")
    out: dict[str, list[str]] = {}
    if df is None:
        return out
    for r in df.filter(F.col("seq") >= 0).orderBy("site", "seq").collect():
        out.setdefault(r["site"], []).append(r["norm_title"])
    return out
