"""The micro-batch crawl pipeline — SURVEY.md §3.4, the engine's core.

One micro-batch = a WINDOW of K page generations across all active seeds
(``pages_per_batch``). K=1 reproduces the reference's page-at-a-time
cadence; larger K amortizes per-batch scheduling/commit overhead K× —
the scale lever — while keeping parity EXACT:

* Crawl order is (page, seed_index, dom_pos) regardless of batching
  (SURVEY §3.4) — encoded in ``order_key``, never a global window.
* Every non-dedup gate (canonicalize, robots, detail-fetch status,
  relevance, time, freshness) is a pure per-row function → computed once
  per window as a ``row_ok`` column (``pregate``), independent of
  processing order.
* URL collisions never cross sites (hosts are per-site), and in-window
  dedup is keep-first-by-order_key — identical to the sequential seen-set
  behavior because all occurrences of a URL share the same gate outcome.
* The only inherently sequential decisions — A6 stop-on-empty pagination
  (Gukje/Nate/YNA/Daum) and D4 fuzzy-title replay (Google) — run on the
  tiny per-window slice they actually need: a driver-side replay of the
  stop rule over the stop-on-empty sites' window items (bounded by
  K × seeds × items/page, NOT by corpus size), and a per-site
  applyInPandas for the fuzzy gate.

Batch plan:

  due (K pages × active seeds) → politeness schedule → corpus join (S2)
    → mapInPandas parse (P1/P2) → canonicalize (U1-U5, native)
    → robots gate (C7) → exact anti-join vs seen, Bloom-routed (D1)
    → article-detail corpus join + parse where the profile needs it
      (S3/P3, semi-join reduced) → relevance (R1-R4) → time (T1-T8)
    → freshness (T6)  ⇒ pregate(row_ok)
  stop replay (driver, stop-on-empty sites only) ⇒ per-seed page limits
  mask ∧ first-occurrence dedup (D2) ∧ row_ok ∧ fuzzy (D4)
    → span assembly (P4) → atomic snapshot commit (C6)

Shuffles per window: corpus join on url_canon, dedup window on
url_canon, seen anti-join on url_canon (Bloom-pruned), fuzzy
applyInPandas on site. Listing/article scans prune on the corpus
page_kind partition column.
"""

from __future__ import annotations

import time
from collections import defaultdict

import pandas as pd
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import config
from ..config import BATCH_TS
from ..functions.relevance import keyword_arrays, relevance_expr
from ..functions.timeparse import batch_ts_lit, freshness_filter_expr, parse_time_expr
from ..functions.urls import canonicalize_expr
from ..operators import bloom, cuckoo
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
    prelude_s: float = 0.0
    batches: int = 0
    dispatched: int = 0
    items: int = 0
    accepted: int = 0
    frontier_rows: int = 0
    per_batch: list = field(default_factory=list)


class InjectedFailure(RuntimeError):
    """Raised by the fault-injection hook in resume tests."""


def run_crawl(
    spark: SparkSession,
    world: dict[str, DataFrame],
    store: SnapshotStore,
    batch_ts: str = BATCH_TS,
    use_bloom: bool = True,
    seen_filter: str | None = None,   # 'bloom' | 'cuckoo' | 'none'; None → from use_bloom
    n_bloom_shards: int = bloom.DEFAULT_N_SHARDS,
    n_salts: int = 4,
    pages_per_batch: int = 1,
    max_batches: int = 10_000,
    fail_after_batch: int | None = None,
    include_keywords: list[str] | None = None,
    exclude_keywords: list[str] | None = None,
) -> CrawlResult:
    """Run the crawl to frontier exhaustion (or ``max_batches`` windows),
    committing one snapshot per window; resumes from the store's last
    committed batch if one exists."""
    corpus, seeds, robots = world["corpus"], world["seeds"], world["robots"]
    listings = corpus.filter(F.col("page_kind") == "listing")
    articles = corpus.filter(F.col("page_kind") == "article")
    if include_keywords is None:
        include_keywords = config.INCLUDE_KEYWORDS
    if exclude_keywords is None:
        exclude_keywords = config.EXCLUDE_KEYWORDS
    inc_arr, exc_arr = keyword_arrays(include_keywords, exclude_keywords)
    bts = batch_ts_lit(batch_ts)
    K = pages_per_batch
    if seen_filter is None:
        seen_filter = "bloom" if use_bloom else "none"
    res = CrawlResult()
    _t_prelude = time.time()

    # ---- resume or init ------------------------------------------------
    if store.last_batch_id >= 0:
        ss = store.read(spark, "seed_state").toPandas().sort_values("seed_index")
        seed_state = ss.to_dict("records")
        fuzzy_prior = _load_fuzzy(spark, store)
    else:
        # no init snapshot: a crash before the first window's commit
        # re-initializes from the world's seed list — same state
        ss = seeds.toPandas().sort_values("seed_index")
        ss["active"] = True
        seed_state = ss.to_dict("records")
        fuzzy_prior = {}

    world_sites = sorted({s["site"] for s in seed_state})
    profiles = profiles_df(spark, world_sites)
    prof_map = {r.asDict()["site"]: r.asDict() for r in profiles.collect()}

    # politeness window must admit every due page of the window's hosts
    max_delay_seeds = max(p["crawl_delay_s"] * 4 for p in prof_map.values())
    window_s = max(60.0, max_delay_seeds * K * 2)

    # ---- loop-invariant column expressions (py4j expression building is
    # driver-serial — build the heavy trees once, reuse every window) ----
    url_canon_e = canonicalize_expr(F.col("href"), F.col("origin"), F.col("strip_query"))
    link_path_e = F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit(""))
    order_key_e = order_key_col(F.col("page"), F.col("seed_index"), F.col("dom_pos"))
    need_detail = F.col("time_source") == "article"  # detail_before_filter ⊆ this
    detail_ok = F.col("a_status").isNotNull() & (F.col("a_status") == 200)
    match_text = (
        F.when(F.col("match_input") == "title_lead",
               F.concat_ws(" ", F.col("title"), F.col("lead")))
        .when(F.col("match_input") == "title_summary",
              F.concat_ws(" ", F.col("title"), F.coalesce(F.col("d_summary"), F.lit(""))))
        .otherwise(F.col("title"))
    )
    rel_ok = relevance_expr(match_text, F.col("relevance_variant"), F.col("use_exclude"),
                            inc_arr, exc_arr, F.col("min_include"))
    time_str_e = F.when(F.col("time_source") == "article", F.col("d_time_str")).otherwise(
        F.col("time_str"))
    ts_e = parse_time_expr(time_str_e, F.col("time_chain"), bts)
    fresh_ok = freshness_filter_expr(F.col("ts"), bts, F.col("freshness_days"))
    row_ok_e = (~need_detail | detail_ok) & rel_ok & F.col("ts").isNotNull() & fresh_ok
    summary_e = F.when(need_detail, F.coalesce(F.col("d_summary"), F.lit(""))).otherwise(F.lit(""))
    img_raw_e = F.when(
        need_detail, F.coalesce(F.nullif(F.col("d_img"), F.lit("")), F.col("img"))
    ).otherwise(F.col("img"))
    img_canon_e = F.when(img_raw_e.isNull() | (img_raw_e == ""), F.lit("")).otherwise(
        F.coalesce(canonicalize_expr(img_raw_e, F.col("origin"), F.lit(False)), F.lit(""))
    )
    spans_e = build_spans(F.col("title"), summary_e, img_canon_e)
    w_dedup = Window.partitionBy("url_canon").orderBy("order_key")

    res.prelude_s = time.time() - _t_prelude
    batch = max(store.last_batch_id, 0)  # fresh store: no init snapshot
    while batch < max_batches:
        _t_win = time.time()
        batch += 1
        p0 = (batch - 1) * K + 1
        p1 = p0 + K - 1
        # page-cap deactivation at window start (oracle loop-top order)
        for s in seed_state:
            if s["active"] and s["max_pages"] and p0 > s["max_pages"]:
                s["active"] = False
        active = [s for s in seed_state if s["active"]]
        if not active:
            break

        # ---- due frontier rows: the window's pages per active seed -----
        due_rows = [
            (f"{s['url']}?page={p}", s["site"], s["seed_index"], p, s["seed_index"])
            for s in active
            for p in range(p0, p1 + 1)
            if not (s["max_pages"] and p > s["max_pages"])
        ]
        due_pdf = pd.DataFrame(
            due_rows, columns=["url_canon", "site", "seed_index", "page", "priority"]
        )
        due = spark.createDataFrame(  # Arrow path — no per-row driver serialization
            due_pdf, "url_canon string, site string, seed_index int, page int, priority int"
        ).withColumn("host", F.parse_url(F.col("url_canon"), F.lit("HOST"))) \
         .withColumn("order_key", order_key_col(F.col("page"), F.col("seed_index"), F.lit(0)))

        dispatched = schedule(due, robots, bts, window_s, n_salts=n_salts).persist()
        _stage_due = int((time.time() - _t_win) * 1000)

        # ---- fetch (replayed corpus join) + parse ----------------------
        fetched = dispatched.select("url_canon", "site", "seed_index", "page").join(
            listings.filter(F.col("http_status") == 200).select("url_canon", "content", "charset"),
            on="url_canon", how="inner",
        )
        items = parse_listing(fetched).withColumnRenamed("url_canon", "listing_url").persist()

        # ---- per-row gates (dedup-independent) → pregate ----------------
        cand = items.join(F.broadcast(profiles), on="site", how="inner")
        cand = cand.withColumn("url_canon", url_canon_e).filter(F.col("url_canon").isNotNull())
        cand = (
            cand.withColumn("link_host", F.parse_url(F.col("url_canon"), F.lit("HOST")))
            .join(F.broadcast(robots.withColumnRenamed("host", "link_host")
                              .select("link_host", "disallow_prefixes")),
                  on="link_host", how="left")
            .filter(F.col("disallow_prefixes").isNull()
                    | ~F.exists(F.col("disallow_prefixes"),
                                lambda p: link_path_e.startswith(p)))
            .drop("disallow_prefixes")
        )
        cand = cand.withColumn("order_key", order_key_e)

        # D1: cross-batch seen — seen rows can neither accept nor claim
        # first-occurrence, so dropping them entirely is exact. The
        # prefilter arm (bloom or cuckoo) only routes; the anti-join decides.
        seen = store.read(spark, "seen")
        if seen is not None:
            if seen_filter == "cuckoo":
                cshards = store.read(spark, "cuckoo_shards")
                cand = cuckoo.dedup_new(cand, seen, cshards, n_shards=n_bloom_shards)
            else:
                shards = store.read(spark, "bloom_shards") if seen_filter == "bloom" else None
                cand = bloom.dedup_new(cand, seen, shards, n_shards=n_bloom_shards)

        # S3/P3: article detail where the profile needs it (single join;
        # parse carries http_status — C5 failure routing)
        cand_urls = cand.filter(need_detail).select("url_canon")
        detail = parse_article(
            articles.join(cand_urls, on="url_canon", how="left_semi")
        ).withColumnRenamed("url_canon", "d_url")
        cand = cand.join(detail, cand["url_canon"] == detail["d_url"], "left").drop("d_url")

        # localCheckpoint (not persist): caches AND severs lineage, so the
        # analyzer stops re-walking the full gate tree on every downstream
        # transformation (driver-serial, ~3s/window on wide worlds)
        pregate = cand.withColumn("ts", ts_e).withColumn("row_ok", row_ok_e).localCheckpoint()

        stage_wall: dict[str, int] = {}

        def _clock(stage: str, t0: float) -> None:
            stage_wall[stage] = int((time.time() - t0) * 1000)

        # ---- per-(seed,page) item counts (A6 empty-page rule input) -----
        t0 = time.time()
        ic = items.groupBy("seed_index", "page").agg(F.count("*").alias("n")).toPandas()
        item_counts: dict[tuple[int, int], int] = {
            (int(s), int(p)): int(n)
            for s, p, n in zip(ic["seed_index"], ic["page"], ic["n"])
        }
        _clock("parse_items", t0)

        # ---- driver-side stop replay (exact A6 for stop_on_empty sites) -
        t0 = time.time()
        limits = _stop_replay(
            spark, pregate, active, prof_map, item_counts, p0, p1
        )
        _clock("pregate_stop_replay", t0)
        t0 = time.time()

        # ---- mask + in-window first-occurrence dedup (D2) ---------------
        limit_df = spark.createDataFrame(
            pd.DataFrame(
                [(s["seed_index"], limits[s["seed_index"]]) for s in active],
                columns=["seed_index", "page_limit"],
            ),
            "seed_index int, page_limit int",
        )
        masked = pregate.join(F.broadcast(limit_df), on="seed_index").filter(
            F.col("page") <= F.col("page_limit")
        )
        # first occurrence among ACCEPTABLE rows only — the oracle claims a
        # URL on accept; a rejected earlier occurrence never blocks
        first_occ = (
            masked.filter(F.col("row_ok"))
            .withColumn("rn", F.row_number().over(w_dedup))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

        # ---- fuzzy replay for fuzzy-profile sites (D4, last gate) -------
        fuzzy_cand = first_occ.filter(F.col("fuzzy_dedup"))
        plain = first_occ.filter(~F.col("fuzzy_dedup"))
        gated = fuzzy_gate(
            fuzzy_cand.select("site", "order_key", "url_canon", "title"), fuzzy_prior
        ).filter(F.col("fuzzy_ok")).select("url_canon")
        accepted = plain.unionByName(
            fuzzy_cand.join(gated, on="url_canon", how="left_semi")
        ).persist()

        # ---- document assembly (P4) --------------------------------------
        docs = accepted.select(
            F.md5(F.col("url_canon")).alias("doc_id"),
            spans_e.alias("spans"),
            F.col("url_canon"), F.col("site"), F.col("ts"),
            F.col("order_key").alias("crawl_order"),
            F.lit(batch).alias("batch_id"),
            F.col("seed_index"), F.col("page"),
        ).persist()

        # ---- pagination state for next window -----------------------------
        _clock("dag_build", t0)
        t0 = time.time()
        ac = docs.groupBy("seed_index", "page").agg(F.count("*").alias("n")).toPandas()
        acc_counts = {
            (int(s), int(p)): int(n)
            for s, p, n in zip(ac["seed_index"], ac["page"], ac["n"])
        }
        n_accepted = sum(acc_counts.values())
        n_items_total = sum(item_counts.values())
        _clock("accept_counts", t0)
        t0 = time.time()
        n_disp = dispatched.count()
        _clock("n_disp", t0)
        for s in active:
            si = s["seed_index"]
            last_due = min(p1, s["max_pages"]) if s["max_pages"] else p1
            if limits[si] < last_due:
                s["active"] = False  # stop rule fired inside the window
            elif item_counts.get((si, last_due), 0) == 0:
                s["active"] = False  # final window page was empty
            elif (prof_map[s["site"]]["stop_on_empty"]
                  and acc_counts.get((si, last_due), 0) == 0):
                s["active"] = False  # final page accepted nothing

        # ---- fuzzy title state update (driver sorts the tiny slice) ------
        t0 = time.time()
        fz = (
            accepted.filter(F.col("fuzzy_dedup"))
            .select("site",
                    F.regexp_replace(F.lower(F.col("title")), r"\s+", "").alias("norm_title"),
                    F.col("order_key").alias("seq"))
            .toPandas()
            .sort_values("seq")
        )
        for site, t in zip(fz["site"], fz["norm_title"]):
            fuzzy_prior.setdefault(site, []).append(t)
        _clock("fuzzy_collect", t0)
        t0 = time.time()

        # ---- per-partition lineage/metrics (north rule) -------------------
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
        metrics = spark.createDataFrame(
            [
                (batch, "dispatch", -1, len(due_rows), n_disp,
                 stage_wall.get("pregate_stop_replay", 0)),
                (batch, "parse", -1, n_disp, n_items_total, stage_wall.get("parse_items", 0)),
                (batch, "accept", -1, n_items_total, n_accepted,
                 stage_wall.get("accept_counts", 0)),
            ],
            METRICS_SCHEMA,
        ).unionByName(part_metrics)

        # ---- frontier bookkeeping ------------------------------------------
        frontier_pending = spark.createDataFrame(
            pd.DataFrame(
                [
                    (f"{s['url']}?page={p1 + 1}", s["site"], s["seed_index"], p1 + 1, "pending")
                    for s in seed_state if s["active"]
                ] or [("", "", -1, -1, "none")],
                columns=["url_canon", "site", "seed_index", "page", "status"],
            ),
            "url_canon string, site string, seed_index int, page int, status string",
        ).filter(F.col("seed_index") >= 0)
        # C5 failure routing: non-200 / missing listings are logged as
        # failed|missing rather than silently dropped (per-article
        # try/except → sentinel, Daum_crawler.py:71-73, Google_Crawler.py:259-267)
        frontier_log = (
            dispatched.select("url_canon", "site", "seed_index", "page", "next_fetch_after")
            .join(listings.select("url_canon", "http_status"), on="url_canon", how="left")
            .withColumn(
                "status",
                F.when(F.col("http_status") == 200, F.lit("fetched"))
                .when(F.col("http_status").isNotNull(), F.lit("failed"))
                .otherwise(F.lit("missing")),
            )
            .drop("http_status")
            .withColumn("depth", F.lit(0))
            .withColumn("batch_id", F.lit(batch))
        )
        # article-detail fetches are frontier rows too (depth 1): the
        # frontier log lists every URL the engine fetched this window
        article_log = docs.select(
            "url_canon", "site", "seed_index", "page",
            F.lit(None).cast("timestamp").alias("next_fetch_after"),
            F.lit("fetched").alias("status"),
            F.lit(1).alias("depth"),
            F.lit(batch).alias("batch_id"),
        )
        frontier_log = frontier_log.unionByName(article_log)

        # ---- atomic snapshot commit (C6) ------------------------------------
        seen_delta = docs.select("url_canon")
        overwrite = {
            "seed_state": _seed_state_df(spark, seed_state),
            "frontier_pending": frontier_pending,
            "fuzzy_titles": spark.createDataFrame(
                pd.DataFrame(
                    [(site, t, i) for site, ts_ in fuzzy_prior.items()
                     for i, t in enumerate(ts_)] or [("", "", -1)],
                    columns=["site", "norm_title", "seq"],
                ),
                FUZZY_SCHEMA,
            ),
        }
        if seen_filter == "bloom":
            delta_shards = bloom.build_shards(seen_delta, n_shards=n_bloom_shards, version=batch)
            prev_shards = store.read(spark, "bloom_shards")
            overwrite["bloom_shards"] = (
                bloom.merge_shards(prev_shards, delta_shards)
                if prev_shards is not None else delta_shards
            )
        elif seen_filter == "cuckoo":
            prev_c = store.read(spark, "cuckoo_shards")
            overwrite["cuckoo_shards"] = (
                cuckoo.insert_urls(prev_c, seen_delta, n_shards=n_bloom_shards)
                if prev_c is not None
                else cuckoo.build_shards(seen_delta, n_shards=n_bloom_shards, version=batch)
            )
        _clock("prep", t0)
        t0 = time.time()
        store.commit(
            batch,
            overwrite=overwrite,
            append={
                "documents": docs.drop("seed_index", "page"),
                "seen": seen_delta,
                "frontier_log": frontier_log,
                "metrics": metrics,
            },
            meta={"pages": [p0, p1], "active_seeds": sum(1 for s in seed_state if s["active"])},
        )
        _clock("commit", t0)
        for df in (docs, accepted, pregate, items, dispatched):
            df.unpersist()

        res.batches += 1
        res.dispatched += n_disp
        res.items += n_items_total
        res.accepted += n_accepted
        res.frontier_rows += n_disp + n_accepted + len(due_rows)
        stage_wall["due_build"] = _stage_due
        stage_wall["window_total"] = int((time.time() - _t_win) * 1000)
        res.per_batch.append(
            {"batch": batch, "pages": [p0, p1], "dispatched": n_disp,
             "items": n_items_total, "accepted": n_accepted, "wall_ms": stage_wall}
        )
        if fail_after_batch is not None and batch >= fail_after_batch:
            raise InjectedFailure(f"injected failure after batch {batch}")
    return res


# ---------------------------------------------------------------- helpers

def _seed_state_df(spark: SparkSession, seed_state: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        pd.DataFrame(
            [tuple(s[k] for k in ("seed_index", "site", "url", "max_pages", "active"))
             for s in seed_state],
            columns=["seed_index", "site", "url", "max_pages", "active"],
        ),
        SEED_STATE_SCHEMA,
    )


def _stop_replay(
    spark: SparkSession,
    pregate: DataFrame,
    active: list[dict],
    prof_map: dict[str, dict],
    item_counts: dict[tuple[int, int], int],
    p0: int,
    p1: int,
) -> dict[int, int]:
    """Exact per-seed page limits for this window.

    Non-stop-on-empty seeds stop only on an empty/missing page (or page
    cap). Stop-on-empty sites additionally stop on a page with items but
    zero accepts — acceptance depends on in-window URL claims, which
    never cross sites, so the sequential rule is replayed driver-side
    over ONLY those sites' window candidates: bounded by
    pages_per_batch × seeds × items/page, independent of corpus size
    (SURVEY §2.7 A6; Gukje_Crawler.py:149-151, Nate_Crawler.py:190-192).
    """
    limits: dict[int, int] = {}
    soe_sites = {s["site"] for s in active if prof_map[s["site"]]["stop_on_empty"]}
    by_site_seed: dict[str, list[dict]] = defaultdict(list)
    for s in active:
        by_site_seed[s["site"]].append(s)

    # empty-page limits apply to every seed
    for s in active:
        si = s["seed_index"]
        last = min(p1, s["max_pages"]) if s["max_pages"] else p1
        lim = last
        for p in range(p0, last + 1):
            if item_counts.get((si, p), 0) == 0:
                lim = p  # page p processed (empty) then stop
                break
        limits[si] = lim

    if not soe_sites:
        return limits

    # Only row_ok rows can claim a URL or count toward acceptance; rejected
    # rows are no-ops in the sequential rule (empty-page detection uses
    # item_counts, gathered separately) — so the collect is bounded by the
    # SOE sites' ACCEPTABLE rows, a small fraction of window items.
    rows = (
        pregate.filter(F.col("site").isin(list(soe_sites)) & F.col("row_ok"))
        .select("seed_index", "page", "dom_pos", "url_canon")
        .toPandas()
    )
    per_cell: dict[tuple[int, int], list] = defaultdict(list)
    for si, p, dp, u in zip(rows["seed_index"], rows["page"], rows["dom_pos"],
                            rows["url_canon"]):
        per_cell[(int(si), int(p))].append((int(dp), u))

    for site in sorted(soe_sites):
        site_seeds = sorted(by_site_seed[site], key=lambda s: s["seed_index"])
        claimed: set[str] = set()
        stopped: set[int] = set()
        for p in range(p0, p1 + 1):
            for s in site_seeds:
                si = s["seed_index"]
                if si in stopped or p > limits[si]:
                    continue
                if item_counts.get((si, p), 0) == 0:
                    stopped.add(si)  # limit already set by empty-page pass
                    continue
                acc = 0
                for _dp, u in sorted(per_cell.get((si, p), [])):
                    if u in claimed:
                        continue
                    claimed.add(u)
                    acc += 1
                if acc == 0:
                    limits[si] = min(limits[si], p)
                    stopped.add(si)
    return limits


def _load_fuzzy(spark: SparkSession, store: SnapshotStore) -> dict[str, list[str]]:
    df = store.read(spark, "fuzzy_titles")
    out: dict[str, list[str]] = {}
    if df is None:
        return out
    for r in df.filter(F.col("seq") >= 0).orderBy("site", "seq").collect():
        out.setdefault(r["site"], []).append(r["norm_title"])
    return out
